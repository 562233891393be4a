"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline ops: token counting, quality scoring,
language-ID heuristic, document fingerprinting. All are stateless
vectorized ``map_batches`` stages (reference-style per-record projections
M5-M8 widened to corpus analytics). Kernels shared with the DuckDB oracle
where SQL-expressible (see ``__ray_entry__``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.functions import text as T
from marc_data_migration_ray.functions.keys import mod_bucket
from marc_data_migration_ray.sources import readers


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace-token count per document."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": T.token_counts(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): GPT-2-style BPE pre-tokenizer count."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": T.bpe_token_counts(t["text"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens, n_stop, stop_ratio, is_quality)."""

    def _q(t: pa.Table) -> pa.Table:
        cols = T.quality_columns(t["text"])
        return pa.table({"doc_id": t["doc_id"], **cols})

    return _docs(sf_dir).map_batches(_q, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang_pred): stopword-marker language-ID heuristic."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "lang_pred": T.lang_id(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _batch_token_counts(t: pa.Table, cap: int | None = None) -> pa.Table:
    """Exact per-batch token counts (polars explode + group_by — vectorized,
    no Python loop over rows). With ``cap=m``, reduce to a Misra-Gries
    summary: subtract the (m+1)-th largest count and keep positives — a
    mergeable heavy-hitters summary with per-summary error ≤ batch_N/(m+1)
    (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
    Summaries", PODS 2012 — both public)."""
    import polars as pl

    df = pl.from_arrow(t.select(["text"]))
    out = (
        df.select(pl.col("text").str.extract_all(r"\S+").alias("token"))
        .explode("token")
        .drop_nulls()
        .group_by("token")
        .len(name="n")
    )
    if cap is not None and out.height > cap:
        out = out.sort(["n", "token"], descending=[True, False])
        thresh = out["n"][cap]  # (cap+1)-th largest
        out = out.head(cap).with_columns(pl.col("n") - thresh).filter(pl.col("n") > 0)
    a = out.to_arrow()
    return pa.table({"token": pc.cast(a["token"], pa.string()),
                     "n": pc.cast(a["n"], pa.int64())})


def _rank_table(pairs: list[tuple[str, int]], k: int) -> pa.Table:
    pairs = sorted(pairs, key=lambda x: (-x[1], x[0]))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(pairs) + 1), pa.int64()),
            "token": pa.array([t for t, _ in pairs], pa.string()),
            "n": pa.array([n for _, n in pairs], pa.int64()),
        }
    )


def token_topk(sf_dir: str, k: int = 20) -> pa.Table:
    """(rank, token, n): exact top-k most frequent whitespace tokens —
    vocabulary / heavy-hitters over the corpus.

    Canonical distributed wordcount shape: per-batch partial counts inside
    ``map_batches`` (pre-aggregation — raw tokens never shuffle), then ONE
    ``groupby(token).sum`` over distinct-token partials, then per-block
    partial top-k and a ≤ k×blocks driver merge (no full sort). Ties break
    by token asc for determinism."""
    partials = _docs(sf_dir, columns=("text",)).map_batches(
        _batch_token_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = partials.groupby("token").sum("n")

    def _local_topk(t: pa.Table) -> pa.Table:
        t = pa.table({"token": t["token"], "n": pc.cast(t["sum(n)"], pa.int64())})
        return t.sort_by([("n", "descending"), ("token", "ascending")]).slice(0, k)

    best: list[tuple[str, int]] = []
    tops = totals.map_batches(_local_topk, batch_format="pyarrow")
    for b in tops.iter_batches(batch_format="pyarrow"):
        best.extend(zip(b["token"].to_pylist(), b["n"].to_pylist()))
    return _rank_table(best, k)


def token_topk_sketch(sf_dir: str, k: int = 20, m: int = 1024) -> pa.Table:
    """(rank, token, n): top-k frequent tokens via a mergeable Misra-Gries
    sketch + exact recount — the 100-TB path when the vocabulary itself is
    too wide to shuffle comfortably.

    Pass 1: per-batch MG summaries of capacity ``m`` (error ≤ N/(m+1)
    after merging) → ``groupby(token).sum`` over ≤ m-entry summaries →
    driver-side re-cap gives ≤ m candidate tokens containing every token
    with true count > N/(m+1). Pass 2: exact recount of candidates only
    (broadcast candidate set; per-batch filtered counts; ≤ m×blocks driver
    sum). Result is exact whenever the true k-th count exceeds N/(m+1) —
    guaranteed on any skewed corpus with m ≫ k; verified against
    ``token_topk`` in pytest and the same SQL oracle."""
    sketches = _docs(sf_dir, columns=("text",)).map_batches(
        lambda t: _batch_token_counts(t, cap=m),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = sketches.groupby("token").sum("n")
    cand: dict[str, int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for tok, n in zip(b["token"].to_pylist(), b["sum(n)"].to_pylist()):
            cand[tok] = cand.get(tok, 0) + n
    if len(cand) > m:  # re-cap the merged summary (mergeable-summaries rule)
        thresh = sorted(cand.values(), reverse=True)[m]
        cand = {t: n - thresh for t, n in cand.items() if n - thresh > 0}
    cand_ref = ray.put(pa.array(sorted(cand), pa.string()))  # ≤ m tokens, broadcast once

    def _recount(t: pa.Table) -> pa.Table:
        import ray as _ray

        keep = _ray.get(cand_ref)
        c = _batch_token_counts(t)
        return c.filter(pc.is_in(c["token"], value_set=keep))

    exact: dict[str, int] = {}
    for b in _docs(sf_dir, columns=("text",)).map_batches(
        _recount, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for tok, n in zip(b["token"].to_pylist(), b["n"].to_pylist()):
            exact[tok] = exact.get(tok, 0) + n
    return _rank_table(list(exact.items()), k)


PACK_LEN = 2048  # tokens per training example (shared with the SQL oracle)
_PACK_BUCKET = 4096  # docs per prefix-sum bucket (driver holds one int per bucket)


def sequence_pack(sf_dir: str, pack_len: int = PACK_LEN) -> ray.data.Dataset:
    """(doc_id, n_tok, start_tok, first_pack, last_pack): GPT-style sequence
    packing — concatenate every document's tokens in doc_id order and cut
    the stream into fixed ``pack_len`` training examples; report where
    each document lands (it may straddle pack boundaries).

    The global token offset is a DISTRIBUTED PREFIX SUM, the shape that
    scales: (1) per-batch partial sums per doc_id bucket (one
    ``groupby(bucket).sum`` over ≤ #buckets rows), (2) a driver-side
    exclusive prefix over the tiny bucket table (one int per ~4k docs),
    broadcast via ``ray.put``, (3) one shuffle by bucket +
    ``map_groups`` computing the in-bucket cumulative sum vectorized.
    No stage ever sees more than a bucket of rows; nothing about the
    result depends on block layout."""
    ds = _docs(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pc.cast(T.token_counts(t["text"]), pa.int64()),
                "bucket": pc.cast(
                    pc.divide(t["doc_id"].combine_chunks()
                              if isinstance(t["doc_id"], pa.ChunkedArray)
                              else t["doc_id"], _PACK_BUCKET), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # two consumers below: materialize the (doc_id, n_tok, bucket) table —
    # three ints per doc, no text — so the scan+tokenize runs once
    ds = ds.materialize()
    bucket_sums = {}
    for b in ds.groupby("bucket").sum("n_tok").iter_batches(batch_format="pyarrow"):
        for k, v in zip(b["bucket"].to_pylist(), b["sum(n_tok)"].to_pylist()):
            bucket_sums[k] = v
    offsets, acc = {}, 0
    for k in sorted(bucket_sums):
        offsets[k] = acc
        acc += bucket_sums[k]
    off_ref = ray.put(offsets)

    def _assign(t: pa.Table) -> pa.Table:
        import numpy as np
        import polars as pl
        import ray as _ray

        df = pl.from_arrow(t).sort("doc_id")
        base = _ray.get(off_ref)[int(df["bucket"][0])]
        n = df["n_tok"].to_numpy()
        start = base + np.cumsum(n, dtype=np.int64) - n
        return (
            df.drop("bucket")
            .with_columns(
                pl.Series("start_tok", start),
                pl.Series("first_pack", start // pack_len),
                pl.Series("last_pack", np.maximum(start, start + n - 1) // pack_len),
            )
            .to_arrow()
        )

    return ds.groupby("bucket").map_groups(_assign, batch_format="pyarrow")


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fp): 64-bit FNV-1a content fingerprint (rows-only oracle —
    byte-level hashing is not SQL-expressible)."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "fp": T.fingerprints(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def token_doc_freq(sf_dir: str, k: int = 20) -> pa.Table:
    """(rank, token, df): top-k tokens by DOCUMENT frequency (the IDF
    denominator) — distinct-doc counts, not occurrence counts.

    Same wordcount shape as ``token_topk`` with one twist: each batch
    first reduces to DISTINCT (doc, token) pairs (polars unique — raw
    occurrences never leave the batch), so the shuffled partials are
    per-token *document* counts. Ties break by token asc."""
    import polars as pl

    def _batch_df(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("token"),
            )
            .explode("token")
            .drop_nulls()
            .unique(subset=["doc_id", "token"])
            .group_by("token")
            .len(name="n")
        )
        a = out.to_arrow()
        return pa.table({"token": pc.cast(a["token"], pa.string()),
                         "n": pc.cast(a["n"], pa.int64())})

    partials = _docs(sf_dir).map_batches(
        _batch_df, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = partials.groupby("token").sum("n")

    def _local_topk(t: pa.Table) -> pa.Table:
        t = pa.table({"token": t["token"], "n": pc.cast(t["sum(n)"], pa.int64())})
        return t.sort_by([("n", "descending"), ("token", "ascending")]).slice(0, k)

    best: list[tuple[str, int]] = []
    for b in totals.map_batches(_local_topk, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        best.extend(zip(b["token"].to_pylist(), b["n"].to_pylist()))
    out = _rank_table(best, k)
    return out.rename_columns(["rank", "token", "df"])


TFIDF_BUCKETS = 64


def tfidf_topk(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """(doc_id, rnk, token, tf, df, score): each document's top-k terms by
    TF-IDF — the classic per-document keyword/feature extraction.

    Log-free idf: ``score = tf * N / df`` as ONE IEEE-double division of
    exact integers (< 2^53, so the product is exact and the division is
    correctly rounded — bit-identical in DuckDB and polars, unlike
    ``ln()`` whose libm rounding differs across engines). Rank ties break
    by token asc.

    Distributed shape: (1) exact per-batch (doc_id, token, tf) triples —
    docs are whole rows, so a batch-local group_by is globally exact;
    (2) ONE coarse token-bucket shuffle; per bucket a vectorized
    ``len().over(token)`` window attaches df (triples are distinct per
    (doc, token), so the group size IS the document frequency — no
    ``Dataset.join``, and the tf pass runs once instead of feeding two
    consumers); (3) per-doc top-k via a coarse doc-bucket shuffle + one
    vectorized polars window per bucket (no per-doc Python). A
    stopword-hot token concentrates its rows in one token bucket — for
    stopword-heavy corpora split step 2 into per-batch partial counts
    for the top-V head and the windowed tail."""
    import polars as pl

    docs = _docs(sf_dir)
    # Parquet-footer row count — no data scan, no Ray task.
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows

    def _tf(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.select(
                pl.col("doc_id"),
                pl.col("text").str.extract_all(r"\S+").alias("token"),
            )
            .explode("token")
            .drop_nulls()
            .group_by(["doc_id", "token"])
            .len(name="tf")
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "token": pc.cast(a["token"], pa.string()),
                "tf": pc.cast(a["tf"], pa.int64()),
            }
        )

    tf_ds = docs.map_batches(_tf, batch_format="pyarrow", zero_copy_batch=True)

    def _tok_bucket(t: pa.Table) -> pa.Table:
        from marc_data_migration_ray.functions.keys import hash_partition

        return t.append_column(
            "tok_bucket",
            pc.cast(hash_partition(t["token"], TFIDF_BUCKETS), pa.int32()),
        )

    def _attach_df(g: pa.Table) -> pa.Table:
        d = pl.from_arrow(g.drop_columns(["tok_bucket"]))
        return (
            d.with_columns(pl.len().over("token").cast(pl.Int64).alias("df"))
            .to_arrow()
        )

    joined = (
        tf_ds.map_batches(_tok_bucket, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("tok_bucket")
        .map_groups(_attach_df, batch_format="pyarrow")
    )

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", mod_bucket(t["doc_id"], TFIDF_BUCKETS))

    def _rank(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = (
            df.with_columns(
                ((pl.col("tf") * n_docs).cast(pl.Float64) / pl.col("df")).alias("score")
            )
            .sort(["doc_id", "score", "token"], descending=[False, True, False])
            .with_columns(pl.col("tf").cum_count().over("doc_id").alias("rnk"))
            .filter(pl.col("rnk") <= k)
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "rnk": pc.cast(a["rnk"], pa.int64()),
                "token": pc.cast(a["token"], pa.string()),
                "tf": pc.cast(a["tf"], pa.int64()),
                "df": pc.cast(a["df"], pa.int64()),
                "score": pc.cast(a["score"], pa.float64()),
            }
        )

    bucketed = joined.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(_rank, batch_format="pyarrow")


_ROLLUP_SENTINEL = "\x00ALL\x00"  # cannot collide with real source/lang values


def source_lang_rollup(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical aggregate (SQL ``GROUP BY ROLLUP(source, lang)``):
    doc counts + char sums at (source, lang), (source) and grand-total
    levels in ONE pass.

    Each batch emits partial rows for all three levels (a per-batch
    ``group_by`` per level — bounded by distinct groups, not rows), so the
    shuffle moves only pre-aggregated partials; one distributed
    ``groupby.sum`` finishes. Rolled-up keys travel as a sentinel string
    (Ray hash-aggregate keys stay non-null) and are projected back to NULL
    at the end, matching the SQL ROLLUP output shape."""
    ds = readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "lang", "n_chars"],
    )

    def _partials(t: pa.Table) -> pa.Table:
        n = t.num_rows
        base = pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "one": pa.array([1] * n, pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )
        sent = pa.array([_ROLLUP_SENTINEL] * n, pa.string())
        levels = [
            base,
            base.set_column(1, "lang", sent),
            base.set_column(0, "source", sent).set_column(1, "lang", sent),
        ]
        return pa.concat_tables(
            lv.group_by(["source", "lang"]).aggregate(
                [("one", "sum"), ("n_chars", "sum")]
            )
            for lv in levels
        )

    partials = ds.map_batches(_partials, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    agg = partials.groupby(["source", "lang"]).aggregate(
        Sum("one_sum", alias_name="n_docs"), Sum("n_chars_sum", alias_name="chars_sum")
    )

    def _finish(t: pa.Table) -> pa.Table:
        def _null_sentinel(col):
            col = pc.cast(col, pa.string())
            return pc.if_else(
                pc.equal(col, _ROLLUP_SENTINEL), pa.nulls(len(col), pa.string()), col
            )

        return pa.table(
            {
                "source": _null_sentinel(t["source"]),
                "lang": _null_sentinel(t["lang"]),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "chars_sum": pc.cast(t["chars_sum"], pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def source_lang_rollup_sql() -> str:
    return (
        "SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS chars_sum "
        "FROM documents GROUP BY ROLLUP(source, lang)"
    )


def word_repetition(sf_dir: str) -> ray.data.Dataset:
    """Per-document word-repetition quality stats (Gopher-style filters):
    (doc_id, n_words, n_unique_words, top_word_count, dup_word_occurrences).

    Distinct-word ratio (n_unique/n_words) and top-word dominance
    (top_word_count/n_words) are the standard "repetitious document" signals
    for corpus filtering.  Documents are row-contained, so this is a pure
    per-batch vectorized polars aggregation — NO shuffle: split → explode →
    two group_bys inside the batch, counts only leave the task.  At 100 TB
    this scales embarrassingly; batch size bounds the explode footprint."""
    import polars as pl

    def _stats(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        wc = (
            df.with_columns(pl.col("text").str.split(" ").alias("w"))
            .drop("text")
            .explode("w")
            .group_by(["doc_id", "w"])
            .len(name="c")
        )
        out = (
            wc.group_by("doc_id")
            .agg(
                pl.col("c").sum().alias("n_words"),
                pl.len().alias("n_unique_words"),
                pl.col("c").max().alias("top_word_count"),
                pl.col("c").filter(pl.col("c") > 1).sum().alias("dup_word_occurrences"),
            )
            .with_columns(pl.col("dup_word_occurrences").fill_null(0))
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "n_words": pc.cast(a["n_words"], pa.int64()),
                "n_unique_words": pc.cast(a["n_unique_words"], pa.int64()),
                "top_word_count": pc.cast(a["top_word_count"], pa.int64()),
                "dup_word_occurrences": pc.cast(a["dup_word_occurrences"], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True
    )


def word_repetition_sql() -> str:
    return (
        "WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, "
        "CAST(count(*) AS BIGINT) AS n_unique_words, "
        "CAST(max(c) AS BIGINT) AS top_word_count, "
        "CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) "
        "AS dup_word_occurrences "
        "FROM wc GROUP BY doc_id ORDER BY doc_id"
    )


LM_TOP_BIGRAMS = 256  # corpus-LM model size (shared with the SQL mirror)


def _batch_bigram_frame(t: pa.Table):
    """polars frame of (doc_id, bigram) occurrences — explode words, pair
    each with its successor WITHIN the doc via ``shift(-1).over(doc_id)``
    (explode preserves row order, so the window sees words in document
    order). Fully vectorized; raw text never leaves the batch."""
    import polars as pl

    df = pl.from_arrow(t.select(["doc_id", "text"]))
    return (
        df.select("doc_id", pl.col("text").str.extract_all(r"\S+").alias("w"))
        .explode("w")
        .drop_nulls("w")
        .with_columns(nx=pl.col("w").shift(-1).over("doc_id"))
        .drop_nulls("nx")
        .select("doc_id", (pl.col("w") + " " + pl.col("nx")).alias("bigram"))
    )


def lm_familiarity(sf_dir: str, m: int = LM_TOP_BIGRAMS) -> ray.data.Dataset:
    """(doc_id, n_bigrams, n_hits, familiarity): corpus-LM quality score —
    the fraction of each document's bigram occurrences that land in the
    corpus's exact top-``m`` bigram list. A document full of common
    constructions scores high; boilerplate-free or garbled text scores
    low — the shape of n-gram-LM quality filtering (cf. CCNet/Gopher
    perplexity filters), made hash-exact by scoring with integer hit
    counts and ONE final division instead of a log-likelihood sum (float
    summation order would differ across engines; a single int/int
    division cannot).

    Two passes, both streaming:
    1. model build = distributed wordcount over bigrams (per-batch partial
       counts, one ``groupby(bigram).sum``, per-block top-m, tiny driver
       merge; ties n desc then bigram asc — the SQL ROW_NUMBER order).
    2. scoring = stateless ``map_batches``; the m-bigram model rides the
       closure (≤ a few KB; at model sizes that matter use ``ray.put`` +
       per-actor ``ray.get`` like ``tpch.nation_revenue``).
    """
    import polars as pl

    partials = _docs(sf_dir).map_batches(
        lambda t: _batch_bigram_frame(t)
        .group_by("bigram")
        .len(name="n")
        .to_arrow()
        .cast(pa.schema([("bigram", pa.string()), ("n", pa.int64())])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    totals = partials.groupby("bigram").sum("n")

    def _local_topm(t: pa.Table) -> pa.Table:
        t = pa.table({"bigram": t["bigram"], "n": pc.cast(t["sum(n)"], pa.int64())})
        return t.sort_by([("n", "descending"), ("bigram", "ascending")]).slice(0, m)

    best: list[tuple[str, int]] = []
    for b in totals.map_batches(_local_topm, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        best.extend(zip(b["bigram"].to_pylist(), b["n"].to_pylist()))
    best.sort(key=lambda x: (-x[1], x[0]))
    model = set(bg for bg, _ in best[:m])

    def _score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id"]))
        per = (
            _batch_bigram_frame(t)
            .with_columns(hit=pl.col("bigram").is_in(list(model)))
            .group_by("doc_id")
            .agg(n_bigrams=pl.len(), n_hits=pl.col("hit").sum())
        )
        out = (
            df.join(per, on="doc_id", how="left")
            .with_columns(
                pl.col("n_bigrams").fill_null(0).cast(pl.Int64),
                pl.col("n_hits").fill_null(0).cast(pl.Int64),
            )
            .with_columns(
                familiarity=pl.when(pl.col("n_bigrams") == 0)
                .then(pl.lit(0.0))
                .otherwise(pl.col("n_hits") / pl.col("n_bigrams"))
            )
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "n_bigrams": pc.cast(a["n_bigrams"], pa.int64()),
                "n_hits": pc.cast(a["n_hits"], pa.int64()),
                "familiarity": pc.cast(a["familiarity"], pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def lm_familiarity_sql(m: int = LM_TOP_BIGRAMS) -> str:
    return (
        r"WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') ws "
        "FROM documents), "
        "bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] "
        "for i in range(1, len(ws))]) AS b FROM w), "
        "cnt AS (SELECT b, count(*) AS n FROM bg GROUP BY b), "
        "top AS (SELECT b FROM (SELECT b, row_number() OVER "
        f"(ORDER BY n DESC, b) AS rn FROM cnt) WHERE rn <= {m}), "
        "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "CAST(sum(CASE WHEN b IN (SELECT b FROM top) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_hits FROM bg GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, "
        "coalesce(n_hits, 0) AS n_hits, "
        "CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0 "
        "ELSE CAST(n_hits AS DOUBLE) / n_bigrams END AS familiarity "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )


def token_concentration(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_words, simpson_x: Σc_i², simpson): token-concentration
    (Simpson/Herfindahl index) per document — Σ (c_i/n)² over word
    frequencies. High = a few words dominate (spam/boilerplate signal,
    the quantitative cousin of ``word_repetition``'s max-count stats).

    Row-contained and shuffle-free (one polars double group_by per
    batch). Hash-exact float: the index is emitted as the integer Σc²
    plus ONE division by n² — no per-term float accumulation whose
    ordering could diverge from the oracle."""
    import polars as pl

    def _stats(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.select("doc_id", pl.col("text").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .drop_nulls("w")
            .group_by(["doc_id", "w"])
            .len(name="c")
            .group_by("doc_id")
            .agg(
                n_words=pl.col("c").sum(),
                simpson_x=(pl.col("c") ** 2).sum(),
            )
        )
        base = df.select("doc_id").join(out, on="doc_id", how="left")
        base = base.with_columns(
            pl.col("n_words").fill_null(0).cast(pl.Int64),
            pl.col("simpson_x").fill_null(0).cast(pl.Int64),
        ).with_columns(
            simpson=pl.when(pl.col("n_words") == 0)
            .then(pl.lit(0.0))
            .otherwise(pl.col("simpson_x") / (pl.col("n_words") ** 2))
        )
        a = base.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "n_words": pc.cast(a["n_words"], pa.int64()),
                "simpson_x": pc.cast(a["simpson_x"], pa.int64()),
                "simpson": pc.cast(a["simpson"], pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True
    )


def token_concentration_sql() -> str:
    return (
        r"WITH words AS (SELECT doc_id, "
        r"unnest(regexp_extract_all(text, '\S+')) AS w FROM documents), "
        "wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2), "
        "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, "
        "CAST(sum(c * c) AS BIGINT) AS simpson_x FROM wc GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(n_words, 0) AS n_words, "
        "coalesce(simpson_x, 0) AS simpson_x, "
        "CASE WHEN coalesce(n_words, 0) = 0 THEN 0.0 "
        "ELSE CAST(simpson_x AS DOUBLE) / (n_words * n_words) END AS simpson "
        "FROM documents d LEFT JOIN agg USING (doc_id)"
    )


LIFT_VOCAB = 50  # co-occurrence over the top-V tokens (shared with SQL)


def token_lift(sf_dir: str, v: int = LIFT_VOCAB) -> pa.Table:
    """(token_a, token_b, n_both, lift): document-level co-occurrence
    association ("lift") between the corpus's top-``v`` tokens —
    lift = N·c_ab / (c_a·c_b) over distinct-per-doc occurrence counts,
    the classic market-basket association score (> 1 ⇒ the tokens
    attract, < 1 ⇒ they repel).

    All-pairs co-occurrence is quadratic in the vocabulary, so the
    vocabulary is the exact top-v heavy hitters (reusing ``token_topk``'s
    distributed wordcount). The co-occurrence matrix is then a per-batch
    boolean membership matmul ``Mᵀ·M`` (docs × v) — each batch reduces to
    ONE v×v integer matrix regardless of batch size — merged elementwise.
    Counts are exact integers; lift is one int/int division per pair, so
    the float column hash-matches the oracle."""
    import polars as pl

    top = [r["token"] for r in token_topk(sf_dir, k=v).to_pylist()]
    top_sorted = sorted(top)
    idx = {t: i for i, t in enumerate(top_sorted)}

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        dt = (
            df.select("doc_id", pl.col("text").str.extract_all(r"\S+").alias("w"))
            .explode("w")
            .filter(pl.col("w").is_in(top_sorted))
            .unique()
        )
        if dt.height == 0:
            m = np.zeros((len(top_sorted), len(top_sorted)), np.int64)
        else:
            docs = dt["doc_id"].to_numpy()
            toks = np.array([idx[w] for w in dt["w"].to_list()], np.int64)
            uniq, dinv = np.unique(docs, return_inverse=True)
            M = np.zeros((len(uniq), len(top_sorted)), np.int64)
            M[dinv, toks] = 1
            m = M.T @ M
        k = len(top_sorted)
        return pa.table(
            {
                "i": pa.array(np.repeat(np.arange(k, dtype=np.int64), k)),
                "j": pa.array(np.tile(np.arange(k, dtype=np.int64), k)),
                "c": pa.array(m.reshape(-1)),
            }
        )

    merged = (
        _docs(sf_dir)
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .sum("c")
    )
    k = len(top_sorted)
    C = np.zeros((k, k), np.int64)
    for b in merged.iter_batches(batch_format="pyarrow"):
        np.add.at(
            C,
            (b["i"].to_numpy(), b["j"].to_numpy()),
            b["sum(c)"].to_numpy(),
        )
    n_docs = int(_docs(sf_dir, ("doc_id",)).count())
    out_a, out_b, out_n, out_l = [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            if C[i, j] == 0:
                continue
            out_a.append(top_sorted[i])
            out_b.append(top_sorted[j])
            out_n.append(int(C[i, j]))
            out_l.append(float(n_docs * C[i, j]) / float(C[i, i] * C[j, j]))
    return pa.table(
        {
            "token_a": pa.array(out_a, pa.string()),
            "token_b": pa.array(out_b, pa.string()),
            "n_both": pa.array(out_n, pa.int64()),
            "lift": pa.array(out_l, pa.float64()),
        }
    )


def token_lift_sql(v: int = LIFT_VOCAB) -> str:
    return (
        r"WITH tok AS (SELECT doc_id, "
        r"unnest(regexp_extract_all(text, '\S+')) AS token FROM documents), "
        "cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token), "
        "top AS (SELECT token FROM (SELECT token, "
        f"row_number() OVER (ORDER BY n DESC, token) AS rn FROM cnt) "
        f"WHERE rn <= {v}), "
        "dt AS (SELECT DISTINCT doc_id, token FROM tok "
        "WHERE token IN (SELECT token FROM top)), "
        "per AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM dt "
        "GROUP BY token), "
        "pair AS (SELECT a.token AS token_a, b.token AS token_b, "
        "CAST(count(*) AS BIGINT) AS n_both FROM dt a "
        "JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token "
        "GROUP BY 1, 2), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents) "
        "SELECT token_a, token_b, n_both, "
        "CAST(n_docs * n_both AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS lift "
        "FROM pair JOIN per ca ON ca.token = pair.token_a "
        "JOIN per cb ON cb.token = pair.token_b, n"
    )


VOCAB_SIZE = 32    # tokenizer vocabulary (top-V corpus tokens; shared w/ SQL)
OOV_ID = 0         # out-of-vocabulary id; in-vocab ids are 1..V by rank


def tokenize_docs(sf_dir: str, v: int = VOCAB_SIZE) -> ray.data.Dataset:
    """(doc_id, n_tok, token_ids: list<int32>): tokenize the corpus into id
    sequences — THE producer of the engine's own input shape (the
    pre-tokenized ``tokens:array<int32>`` table the CDC replay ingests,
    BASELINE.json input_hint).

    Vocabulary = the exact corpus top-``v`` tokens (reusing ``token_topk``'s
    distributed wordcount; rank = id, ties token-asc), broadcast once as a
    tiny dict; encoding is a stateless vectorized pass — polars
    ``replace_strict`` maps every word to its id (OOV → 0) with no Python
    loop and no shuffle. At a real BPE vocab (~100k entries) the dict rides
    ``ray.put`` exactly the same way; only the model size changes."""
    import polars as pl

    top = token_topk(sf_dir, k=v).to_pylist()
    old = [r["token"] for r in top]
    new = [r["rank"] for r in top]  # rank is 1-based

    def _encode(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.with_columns(w=pl.col("text").str.extract_all(r"\S+"))
            .with_columns(
                token_ids=pl.col("w").list.eval(
                    pl.element().replace_strict(old, new, default=OOV_ID,
                                                return_dtype=pl.Int32)
                ),
                n_tok=pl.col("w").list.len().cast(pl.Int32),
            )
            .select("doc_id", "n_tok", "token_ids")
        )
        a = out.to_arrow()

        def _cc(c):
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        return pa.table(
            {
                "doc_id": pc.cast(_cc(a["doc_id"]), pa.int64()),
                "n_tok": pc.cast(_cc(a["n_tok"]), pa.int32()),
                "token_ids": pc.cast(_cc(a["token_ids"]), pa.list_(pa.int32())),
            }
        )

    return _docs(sf_dir).map_batches(
        _encode, batch_format="pyarrow", zero_copy_batch=True
    )


IDS_FP_B = 1000003           # Horner base (shared with the SQL oracle)
#: Mersenne-31 modulus: acc < 2^31 keeps acc*B + id inside int64, so the
#: per-position numpy pass never overflows (2^61-1 would need 81-bit mults)
IDS_FP_M = (1 << 31) - 1


def _ids_horner_fp(lists: pa.Array) -> np.ndarray:
    """Order-sensitive Horner hash of each int32 list:
    acc = (acc * B + id + 1) mod M — vectorized over rows per POSITION
    (one numpy pass per list position, same discipline as _fnv1a_numpy;
    cost is O(max_len) kernel launches per batch, not O(rows))."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = lists.values.to_numpy(zero_copy_only=False).astype(np.int64)
    starts, lens = offsets[:-1], np.diff(offsets)
    acc = np.zeros(len(lens), np.int64)
    for pos in range(int(lens.max(initial=0))):
        m = lens > pos
        acc[m] = (acc[m] * IDS_FP_B + values[starts[m] + pos] + 1) % IDS_FP_M
    return acc


def tokenize_docs_fp(sf_dir: str, v: int = VOCAB_SIZE) -> ray.data.Dataset:
    """Driver-facing tokenization check: (doc_id, n_tok, ids_fp) where
    ``ids_fp`` is the Horner hash of the full id SEQUENCE (order matters —
    any id or position mismatch vs the oracle breaks it). The list itself
    stays in ``tokenize_docs``; hash-compare layers need scalars."""

    def _fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": t["n_tok"],
                "ids_fp": pa.array(_ids_horner_fp(t["token_ids"]), pa.int64()),
            }
        )

    return tokenize_docs(sf_dir, v).map_batches(
        _fp, batch_format="pyarrow", zero_copy_batch=True
    )


def tokenize_docs_sql(v: int = VOCAB_SIZE) -> str:
    """Oracle: same top-v vocabulary (count desc, token asc) built as a
    CTE; words map through it positionally, re-aggregate IN ORDER, then
    fold the same Horner hash over HUGEINTs."""
    fold = (
        "CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        "list_transform(coalesce(m.ids, []), x -> CAST(x AS HUGEINT))), "
        f"(a, b) -> (a * {IDS_FP_B} + b + 1) % {IDS_FP_M}) AS BIGINT)"
    )
    return (
        r"WITH wc AS (SELECT w, count(*) AS n FROM (SELECT "
        r"unnest(regexp_extract_all(text, '\S+')) AS w FROM documents) "
        "GROUP BY w), "
        "vocab AS (SELECT w, CAST(rn AS INTEGER) AS id FROM ("
        "SELECT w, row_number() OVER (ORDER BY n DESC, w) AS rn FROM wc) "
        f"WHERE rn <= {v}), "
        r"words AS (SELECT doc_id, ws, UNNEST(range(1, len(ws) + 1)) AS pos "
        r"FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws "
        "FROM documents)), "
        "mapped AS (SELECT doc_id, pos, "
        f"COALESCE(vocab.id, {OOV_ID}) AS id "
        "FROM (SELECT doc_id, pos, ws[pos] AS w FROM words) t "
        "LEFT JOIN vocab USING (w)) "
        "SELECT d.doc_id, CAST(coalesce(len(m.ids), 0) AS INTEGER) AS n_tok, "
        f"{fold} AS ids_fp "
        "FROM documents d LEFT JOIN (SELECT doc_id, "
        "list(id ORDER BY pos) AS ids FROM mapped GROUP BY doc_id) m "
        "USING (doc_id)"
    )


def source_token_drift(sf_dir: str) -> ray.data.Dataset:
    """(source, n_tokens, drift_x, drift): per-source token-distribution
    drift vs the whole corpus — the data-mixing diagnostic that tells you
    which source's language diverges (domain shift, contamination, a bad
    scrape batch). ``drift`` is the L1 (total-variation×2) distance
    Σ_t |c_st/N_s − c_t/N|.

    Hash-exact by the integer trick the engine uses everywhere: the
    per-token term is computed as the exact integer |c_st·N − c_t·N_s|
    (order-free sum), divided ONCE by N_s·N at the end — no float
    accumulation whose ordering could diverge from SQL.

    Shape: per-batch (source, token) partial counts (pre-aggregated, raw
    tokens never shuffle) → ONE ``groupby(token)`` co-locates each
    token's per-source counts; the per-group kernel scores every source
    (including zero-count ones — absence IS drift) against the broadcast
    (N_s, N) totals; tiny per-token partial sums finish in a
    ``groupby(source).sum``."""
    import polars as pl

    def _src_counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["source", "text"]))
        out = (
            df.select("source", pl.col("text").str.extract_all(r"\S+").alias("token"))
            .explode("token")
            .drop_nulls("token")
            .group_by(["source", "token"])
            .len(name="n")
        )
        a = out.to_arrow()
        return pa.table(
            {
                "source": pc.cast(a["source"], pa.string()),
                "token": pc.cast(a["token"], pa.string()),
                "n": pc.cast(a["n"], pa.int64()),
            }
        )

    partials = _docs(sf_dir, columns=("source", "text")).map_batches(
        _src_counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers: totals + the per-token pass

    # per-source / corpus token totals (tiny: one row per source)
    totals: dict[str, int] = {}
    for b in partials.groupby("source").sum("n").iter_batches(batch_format="pyarrow"):
        for s, n in zip(b["source"].to_pylist(), b["sum(n)"].to_pylist()):
            totals[s] = totals.get(s, 0) + n
    sources = sorted(totals)
    ns = np.array([totals[s] for s in sources], np.int64)
    n_total = int(ns.sum())
    import ray as _ray

    ref = _ray.put((sources, ns, n_total))

    # Per-source drift splits algebraically into a PRESENT part (tokens the
    # source actually has: Σ |c_st·N − c_t·N_s|) and an ABSENT part that
    # needs no per-token enumeration: Σ_{t∉s} c_t·N_s = N_s·(N − Σ_{t∈s} c_t).
    # So one coarse token-hash-bucket shuffle co-locates each token's rows,
    # the bucket kernel is fully vectorized (window sum per token), and each
    # bucket emits per-source partial (present_x, covered_ct) pairs.
    def _bucket(t: pa.Table) -> pa.Table:
        from marc_data_migration_ray.functions.keys import hash_partition

        return t.append_column("bucket", hash_partition(t["token"], 64))

    def _per_bucket(g: pa.Table) -> pa.Table:
        srcs, ns_, N = _ray.get(ref)
        ns_map = dict(zip(srcs, ns_.tolist()))
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        # collapse per-batch partials to exact (source, token) counts FIRST
        df = df.group_by(["source", "token"]).agg(pl.col("n").sum())
        df = df.with_columns(ct=pl.col("n").sum().over("token"))
        df = df.with_columns(
            nsrc=pl.col("source").replace_strict(
                list(ns_map), [int(v) for v in ns_map.values()],
                return_dtype=pl.Int64),
        )
        out = (
            df.with_columns(
                x=(pl.col("n") * N - pl.col("ct") * pl.col("nsrc")).abs()
            )
            .group_by("source")
            .agg(present_x=pl.col("x").sum(), covered_ct=pl.col("ct").sum())
        )
        a = out.to_arrow()
        return pa.table(
            {
                "source": pc.cast(a["source"], pa.string()),
                "present_x": pc.cast(a["present_x"], pa.int64()),
                "covered_ct": pc.cast(a["covered_ct"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    per_src = (
        partials.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_per_bucket, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("present_x", alias_name="present_x"),
                   Sum("covered_ct", alias_name="covered_ct"))
    )

    def _combine(t: pa.Table) -> pa.Table:
        srcs, ns_, N = _ray.get(ref)
        ns_map = dict(zip(srcs, ns_.tolist()))
        s_col = t["source"].to_pylist()
        nsrc = np.array([ns_map[s] for s in s_col], np.int64)
        px = pc.cast(t["present_x"], pa.int64()).to_numpy()
        cov = pc.cast(t["covered_ct"], pa.int64()).to_numpy()
        dx = px + nsrc * (N - cov)
        return pa.table(
            {"source": pc.cast(t["source"], pa.string()),
             "drift_x": pa.array(dx, pa.int64())}
        )

    agg = per_src.map_batches(_combine, batch_format="pyarrow")

    def _finish(t: pa.Table) -> pa.Table:
        srcs, ns_, N = _ray.get(ref)
        ns_map = dict(zip(srcs, ns_.tolist()))
        s_col = t["source"].to_pylist()
        dx = pc.cast(t["drift_x"], pa.int64())
        n_tok = pa.array([ns_map[s] for s in s_col], pa.int64())
        drift = pc.divide(
            pc.cast(dx, pa.float64()),
            pc.cast(pc.multiply(n_tok, pa.scalar(N, pa.int64())), pa.float64()),
        )
        return pa.table(
            {
                "source": pc.cast(t["source"], pa.string()),
                "n_tokens": n_tok,
                "drift_x": dx,
                "drift": drift,
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def source_token_drift_sql() -> str:
    return (
        r"WITH wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n FROM "
        r"(SELECT source, unnest(regexp_extract_all(text, '\S+')) AS w "
        "FROM documents) GROUP BY source, w), "
        "tot AS (SELECT w, CAST(sum(n) AS BIGINT) AS ct FROM wc GROUP BY w), "
        "ns AS (SELECT source, CAST(sum(n) AS BIGINT) AS nsrc FROM wc "
        "GROUP BY source), "
        "nn AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM wc), "
        "grid AS (SELECT ns.source, tot.w, ns.nsrc, tot.ct, nn.ntot, "
        "COALESCE(wc.n, 0) AS cst FROM ns CROSS JOIN tot CROSS JOIN nn "
        "LEFT JOIN wc ON wc.source = ns.source AND wc.w = tot.w) "
        "SELECT source, CAST(any_value(nsrc) AS BIGINT) AS n_tokens, "
        "CAST(sum(abs(cst * ntot - ct * nsrc)) AS BIGINT) AS drift_x, "
        "CAST(sum(abs(cst * ntot - ct * nsrc)) AS DOUBLE) / "
        "(any_value(nsrc) * any_value(ntot)) AS drift "
        "FROM grid GROUP BY source"
    )


# --------------------------------------------------------------- BPE train --

BPE_MERGES = 20     # learned merge rules (shared with the pytest mirror)
BPE_WORD_V = 5000   # word-table cap: top-V words by (count desc, word asc)


def bpe_train(sf_dir: str, merges: int = BPE_MERGES,
              vocab_words: int = BPE_WORD_V) -> pa.Table:
    """(rank, left, right, pair_count): learn ``merges`` BPE merge rules
    over the corpus (Sennrich et al. 2016, "Neural Machine Translation of
    Rare Words with Subword Units" — the standard subword-tokenizer
    training loop). Deterministic tie-break: highest pair count, then
    lexicographically smallest (left, right).

    Scale shape — the industry-standard two-level split (HF ``tokenizers``
    trains the same way): the CORPUS pass is distributed (per-batch word-
    count partials inside ``map_batches``, one ``groupby(word).sum`` over
    distinct-word partials — raw text never shuffles), and the merge loop
    runs on the WORD TABLE, which is orders of magnitude smaller than the
    corpus (Heaps' law) and capped at the top ``vocab_words`` words by
    count (per-block partial top-V + ≤ V×blocks driver merge, no full
    sort; the cap is reported via the dropped-word count in the table
    metadata — no silent truncation). The driver loop is
    O(V · avg_word_len · merges), independent of corpus size."""
    partials = _docs(sf_dir, columns=("text",)).map_batches(
        _batch_token_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    totals = partials.groupby("token").sum("n")

    def _local_topv(t: pa.Table) -> pa.Table:
        t = pa.table({"token": t["token"], "n": pc.cast(t["sum(n)"], pa.int64())})
        return t.sort_by([("n", "descending"), ("token", "ascending")]).slice(
            0, vocab_words
        )

    cand: list[tuple[str, int]] = []
    for b in totals.map_batches(
        _local_topv, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        cand.extend(zip(b["token"].to_pylist(), b["n"].to_pylist()))
    cand.sort(key=lambda x: (-x[1], x[0]))
    kept = cand[:vocab_words]
    # NB: counts candidates seen beyond V (a lower bound on corpus vocab
    # minus V — the exact total would need a count() pass)
    dropped = max(0, len(cand) - len(kept))

    seqs: list[list[str]] = [list(w) for w, _ in kept]
    counts: list[int] = [c for _, c in kept]
    rules: list[tuple[str, str, int]] = []
    for _ in range(merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, cnt in zip(seqs, counts):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        left, right = min(p for p, c in pair_counts.items() if c == best_n)
        rules.append((left, right, best_n))
        merged = left + right
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
    out = pa.table(
        {
            "rank": pa.array(range(1, len(rules) + 1), pa.int64()),
            "left": pa.array([r[0] for r in rules], pa.string()),
            "right": pa.array([r[1] for r in rules], pa.string()),
            "pair_count": pa.array([r[2] for r in rules], pa.int64()),
        }
    )
    return out.replace_schema_metadata({b"bpe_words_dropped": str(dropped).encode()})


# ---------------------------------------------------- compression quality --

ZRATIO_LEVEL = 6          # zlib level (shared with the pytest mirror)
ZRATIO_MIN_MILLI = 300    # is_natural threshold: ratio >= 0.300


def compression_ratio(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, raw_len, comp_len, ratio_milli, is_natural): per-document
    zlib compressibility — the classic cheap quality signal (highly
    repetitive or degenerate text compresses far below natural prose;
    cf. the compression filters in RefinedWeb / Gopher-style curation).
    ``ratio_milli = comp_len*1000 // raw_len`` is integer (hash-stable);
    ``is_natural`` flags docs at or above ``ZRATIO_MIN_MILLI``.

    Scale shape: embarrassingly parallel ``map_batches``; one zlib C call
    per document (the loop body is compiled code over the doc's bytes,
    same cost model as the per-row hashlib in the KMV sketch) — no
    shuffle, text never leaves its block. Not SQL-expressible (DuckDB has
    no zlib), so correctness comes from the pytest scalar mirror."""
    import zlib

    def _z(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        raw = np.fromiter((len(s.encode()) for s in texts), np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress(s.encode(), ZRATIO_LEVEL)) for s in texts),
            np.int64,
            len(texts),
        )
        safe_raw = np.maximum(raw, 1)
        milli = comp * 1000 // safe_raw
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "raw_len": pa.array(raw),
                "comp_len": pa.array(comp),
                "ratio_milli": pa.array(milli),
                "is_natural": pa.array(milli >= ZRATIO_MIN_MILLI),
            }
        )

    return _docs(sf_dir).map_batches(_z, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ bigram topk --

NGRAM_TOPK = 20


def ngram_topk(sf_dir: str, k: int = NGRAM_TOPK) -> pa.Table:
    """(rank, bigram, n): exact top-k word bigrams corpus-wide — the
    n-gram heavy-hitters pass (contamination prep, boilerplate discovery,
    n-gram-LM vocab). Same canonical distributed-wordcount shape as
    ``token_topk``, over ``_batch_bigram_frame`` pairs: per-batch partial
    counts (raw text never shuffles), ONE ``groupby(bigram).sum`` over
    distinct-bigram partials, per-block partial top-k, ≤ k×blocks driver
    merge. Ties break bigram asc."""

    def _partial(t: pa.Table) -> pa.Table:
        import polars as pl

        out = (
            _batch_bigram_frame(t)
            .group_by("bigram")
            .len(name="n")
        )
        a = out.to_arrow()
        return pa.table({"bigram": pc.cast(a["bigram"], pa.string()),
                         "n": pc.cast(a["n"], pa.int64())})

    totals = _docs(sf_dir).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bigram").sum("n")

    def _local_topk(t: pa.Table) -> pa.Table:
        t = pa.table({"bigram": t["bigram"], "n": pc.cast(t["sum(n)"], pa.int64())})
        return t.sort_by([("n", "descending"), ("bigram", "ascending")]).slice(0, k)

    best: list[tuple[str, int]] = []
    for b in totals.map_batches(
        _local_topk, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        best.extend(zip(b["bigram"].to_pylist(), b["n"].to_pylist()))
    best.sort(key=lambda x: (-x[1], x[0]))
    best = best[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(best) + 1), pa.int64()),
            "bigram": pa.array([t for t, _ in best], pa.string()),
            "n": pa.array([n for _, n in best], pa.int64()),
        }
    )


def ngram_topk_sql(k: int = NGRAM_TOPK) -> str:
    return (
        r"WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') ws "
        "FROM documents), "
        "bg AS (SELECT unnest([ws[i] || ' ' || ws[i+1] "
        "for i in range(1, len(ws))]) AS bigram FROM w), "
        "cnt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg "
        "GROUP BY bigram) "
        "SELECT CAST(row_number() OVER (ORDER BY n DESC, bigram) AS BIGINT) "
        f"AS rank, bigram, n FROM cnt ORDER BY n DESC, bigram LIMIT {k}"
    )


OOV_VOCAB_K = 50   # top-V vocabulary size for the OOV-rate report


def oov_rate(sf_dir: str, vocab_k: int = OOV_VOCAB_K) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_oov, oov_permille): per-document
    out-of-vocabulary rate against the corpus top-``vocab_k`` token
    vocabulary — the tokenizer-coverage / vocabulary-pruning signal
    (what share of a doc would map to <unk> under a closed vocab).

    Two passes: pass 1 is the exact distributed wordcount of
    :func:`token_topk` reduced to a ≤ ``vocab_k``-entry vocabulary (tiny,
    driver-held by construction — it is the op's own output bound); pass 2
    re-scans documents with the vocabulary shipped in the task closure and
    counts member vs non-member token OCCURRENCES per doc (vectorized
    polars ``is_in`` — no Python over rows). All-integer output
    (permille = n_oov·1000 // n_tokens) ⇒ hash-exact vs SQL."""
    import polars as pl

    vocab = set(token_topk(sf_dir, k=vocab_k)["token"].to_pylist())

    def _rate(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.select("doc_id", pl.col("text").str.extract_all(r"\S+").alias("tok"))
            .explode("tok")
            .drop_nulls("tok")
            .group_by("doc_id", maintain_order=True)
            .agg(
                n_tokens=pl.len().cast(pl.Int64),
                n_oov=(~pl.col("tok").is_in(sorted(vocab))).sum().cast(pl.Int64),
            )
            .with_columns(
                oov_permille=(pl.col("n_oov") * 1000) // pl.col("n_tokens")
            )
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "n_tokens": pc.cast(a["n_tokens"], pa.int64()),
                "n_oov": pc.cast(a["n_oov"], pa.int64()),
                "oov_permille": pc.cast(a["oov_permille"], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(_rate, batch_format="pyarrow", zero_copy_batch=True)


def oov_rate_sql(vocab_k: int = OOV_VOCAB_K) -> str:
    """DuckDB oracle: same top-V vocabulary (count DESC, token ASC ties)
    and the same integer permille arithmetic."""
    return (
        r"WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) "
        "AS token FROM documents), "
        "cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token), "
        f"v AS (SELECT token FROM cnt ORDER BY n DESC, token LIMIT {vocab_k}) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END) "
        "AS BIGINT) AS n_oov, "
        "CAST(sum(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END) "
        "* 1000 // count(*) AS BIGINT) AS oov_permille "
        "FROM tok GROUP BY doc_id"
    )


# --------------------------------------------- cross-source contamination --
OVERLAP_BUCKETS = 64  # coarse routing buckets for the one shuffle


def source_overlap(sf_dir: str) -> pa.Table:
    """(source_a, source_b, shared_bigrams, jaccard_ppm): cross-source
    contamination matrix — for every source pair, how many DISTINCT word
    bigrams they share and the integer-ppm Jaccard of their bigram sets.
    The train/test-split leakage report: a domain split with a high
    off-diagonal entry is not a clean split.

    Shape (100 TB): per batch, polars reduces raw text to distinct
    (bigram, source) pairs — text never shuffles. ONE shuffle routes by a
    coarse hash bucket of the bigram (all copies of a bigram land in one
    bucket ⇒ in-bucket dedup IS global dedup), and each bucket expands
    source pairs VECTORIZED (self-join per bigram, bounded by the source
    count, ≤ |sources|² partial rows out per bucket). The driver merges
    buckets × ≤ |sources|² tiny partials. No per-bigram Python, no
    all-pairs doc comparison, no driver-side text."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "source", "text"]))
        bg = (
            df.select(
                "doc_id", "source",
                pl.col("text").str.extract_all(r"\S+").alias("w"),
            )
            .explode("w")
            .drop_nulls("w")
            .with_columns(nx=pl.col("w").shift(-1).over("doc_id"))
            .drop_nulls("nx")
            .select("source", (pl.col("w") + " " + pl.col("nx")).alias("bigram"))
            .unique()
            .with_columns(
                (pl.col("bigram").hash(seed=0) % OVERLAP_BUCKETS)
                .cast(pl.Int32).alias("bucket")
            )
        )
        return bg.to_arrow()

    def _bucket(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).select("bigram", "source").unique()
        tot = df.group_by("source").len().rename({"len": "n"})
        j = df.join(df, on="bigram")
        sh = (
            j.filter(pl.col("source") < pl.col("source_right"))
            .group_by(["source", "source_right"]).len().rename({"len": "n"})
        )
        out = pl.concat(
            [
                sh.select(
                    pl.col("source").alias("source_a"),
                    pl.col("source_right").alias("source_b"),
                    pl.col("n").cast(pl.Int64),
                ),
                tot.select(
                    pl.col("source").alias("source_a"),
                    pl.lit(None, pl.String).alias("source_b"),
                    pl.col("n").cast(pl.Int64),
                ),
            ]
        )
        return out.to_arrow()

    parts = (
        _docs(sf_dir, ("doc_id", "source", "text"))
        .map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_bucket, batch_format="pyarrow")
    )
    # driver merge: buckets × (≤|sources|² pairs + |sources| totals) rows
    batches = list(parts.iter_batches(batch_format="pyarrow"))
    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "shared_bigrams": pa.array([], pa.int64()),
            "jaccard_ppm": pa.array([], pa.int64()),
        }
    )
    if not batches:
        return empty
    df = pl.from_arrow(pa.concat_tables(batches, promote_options="default"))
    tot = {
        r[0]: r[1]
        for r in df.filter(pl.col("source_b").is_null())
        .group_by("source_a").agg(pl.col("n").sum()).iter_rows()
    }
    pairs = (
        df.filter(pl.col("source_b").is_not_null())
        .group_by(["source_a", "source_b"]).agg(pl.col("n").sum())
        .sort(["source_a", "source_b"])
    )
    rows = [
        (a, b, s, s * 1_000_000 // (tot[a] + tot[b] - s))
        for a, b, s in pairs.iter_rows()
    ]
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "shared_bigrams": pa.array([r[2] for r in rows], pa.int64()),
            "jaccard_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def source_overlap_sql() -> str:
    """DuckDB oracle: distinct (source, bigram) pairs, self-join on the
    bigram with source_a < source_b, identical integer-ppm Jaccard."""
    return (
        r"WITH w AS (SELECT doc_id, source, regexp_extract_all(text, '\S+') "
        "ws FROM documents), "
        "bg AS (SELECT DISTINCT source, b FROM (SELECT source, "
        "unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b "
        "FROM w)), "
        "tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM bg "
        "GROUP BY source), "
        "sh AS (SELECT a.source AS sa, b.source AS sb, "
        "CAST(count(*) AS BIGINT) AS shared FROM bg a "
        "JOIN bg b ON a.b = b.b AND a.source < b.source GROUP BY 1, 2) "
        "SELECT sa AS source_a, sb AS source_b, shared AS shared_bigrams, "
        "CAST(shared * 1000000 // (ta.n + tb.n - shared) AS BIGINT) "
        "AS jaccard_ppm "
        "FROM sh JOIN tot ta ON ta.source = sa JOIN tot tb ON tb.source = sb"
    )


# ------------------------------------------------- per-group value top-k --
BEST_PER_SOURCE_K = 5


def best_docs_per_source(sf_dir: str, k: int = BEST_PER_SOURCE_K) -> ray.data.Dataset:
    """(doc_id, source, n_tokens): keep each source's k docs with the MOST
    tokens (ties by doc_id) — the "keep the best N documents per domain"
    curation filter, by VALUE (cf. ``stratified_sample``, which is by
    hash: an unbiased sample, not a quality filter).

    Distributed per-group top-k without a full shuffle: every batch
    reduces to ≤ k rows per source it contains (vectorized polars
    sort+head — candidates only), then one ``groupby(source)`` over
    ≤ k×blocks candidate rows finishes. Text never shuffles; the wide
    data reduced per batch is exactly what the partial keeps."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "source", "text"]))
        out = (
            df.select(
                "doc_id", "source",
                pl.col("text").str.count_matches(r"\S+")
                .cast(pl.Int64).alias("n_tokens"),
            )
            .sort(["source", "n_tokens", "doc_id"],
                  descending=[False, True, False])
            .group_by("source", maintain_order=True)
            .head(k)
        )
        return out.to_arrow()

    def _final(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .sort(["n_tokens", "doc_id"], descending=[True, False])
            .head(k)
        )
        return df.select(["doc_id", "source", "n_tokens"]).to_arrow()

    return (
        _docs(sf_dir, ("doc_id", "source", "text"))
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(_final, batch_format="pyarrow")
    )


def best_docs_per_source_sql(k: int = BEST_PER_SOURCE_K) -> str:
    return (
        r"SELECT doc_id, source, n_tokens FROM ("
        r"SELECT doc_id, source, "
        r"CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens, "
        r"ROW_NUMBER() OVER (PARTITION BY source ORDER BY "
        r"length(regexp_extract_all(text, '\S+')) DESC, doc_id) AS rn "
        f"FROM documents) WHERE rn <= {k}"
    )
