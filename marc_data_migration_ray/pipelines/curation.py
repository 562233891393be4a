"""Corpus-curation operators: decontamination, PII redaction, global shuffle.

Three first-class training-data pipeline ops a 100-TB corpus build needs
beyond dedup/quality (all deterministic, all DuckDB-oracle-checked):

- ``decontaminate``: flag training documents sharing word n-grams with a
  held-out benchmark set (the standard eval-decontamination pass, cf.
  GPT-3 appendix C / "Documenting the English Colossal Clean Crawled
  Corpus" — public). Benchmark shingles are SMALL (benchmarks are MBs);
  they are collected once and broadcast via ``ray.put``, the train side
  streams through a stateless ``map_batches`` filter — no shuffle of the
  corpus. At a benchmark size that outgrows one object, the same op
  becomes a hash-partitioned semi-join on shingle hash (documented
  fallback, not needed here).
- ``pii_redact``: pseudonymize direct identifiers (keyed multiplicative
  hash of ``user_id`` — deterministic tokenization, no lookup table to
  ship), coarsen the timestamp quasi-identifier to the hour, and scrub
  digit runs from the free-form ``props`` JSON. Pure vectorized
  ``map_batches`` over zero-copy Arrow; embarrassingly parallel.
- ``corpus_shuffle``: deterministic global shuffle for training-example
  order — every row gets an explicit ``pos`` by salted-hash order. The
  rank is a DISTRIBUTED PREFIX SUM: hash-range buckets → per-bucket
  counts → tiny driver exclusive prefix (one int per bucket) → in-bucket
  vectorized sort+rank. No stage holds more than one bucket; the result
  is independent of block layout and cluster size (unlike
  ``Dataset.random_shuffle``, which is neither deterministic across
  layouts nor resumable).

Shingle definition shared with ``pipelines/dedup.shingle_set`` (one
definition for dedup signatures, decontamination, and the SQL mirrors).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from marc_data_migration_ray.pipelines.dedup import shingle_set
from marc_data_migration_ray.pipelines.sampling import (
    KNUTH,
    MOD,
    _T_TRAIN,
    _docs,
    _hash_u32,
)
from marc_data_migration_ray.sources import readers

DECON_K = 4        # words per shingle (benchmark-overlap n-gram)
BENCH_MOD = 97     # doc_id % BENCH_MOD == 0 -> held-out benchmark doc
_PII_SALT = 424243     # keyed-pseudonym salt (decorrelated from split/mix)
_SHUFFLE_SALT = 777317
_SHUFFLE_BUCKETS = 256  # hash-range buckets for the distributed rank


# ------------------------------------------------------- decontamination --


def decontaminate(sf_dir: str, k: int = DECON_K) -> ray.data.Dataset:
    """(doc_id, n_hits): training documents (``doc_id % 97 != 0``) that
    share >= 1 distinct k-word shingle with the benchmark partition
    (``doc_id % 97 == 0``), with the count of distinct overlapping
    shingles. Deterministic contamination report — rows here are what a
    curation pipeline would drop before training."""
    def _bench_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        mask = ids.to_numpy(zero_copy_only=False) % BENCH_MOD == 0
        return t.filter(pa.array(mask))

    bench_shingles: set[str] = set()
    bench = _docs(sf_dir).map_batches(
        _bench_only, batch_format="pyarrow", zero_copy_batch=True
    )
    for b in bench.iter_batches(batch_format="pyarrow"):
        for txt in b["text"].to_pylist():
            bench_shingles.update(shingle_set(txt, k))
    ref = ray.put(frozenset(bench_shingles))  # broadcast once, read per task

    def _hits(t: pa.Table) -> pa.Table:
        bset = ray.get(ref)
        ids = t["doc_id"].to_pylist()
        out_id, out_n = [], []
        for i, txt in zip(ids, t["text"].to_pylist()):
            if i % BENCH_MOD == 0:
                continue
            n = len(shingle_set(txt, k) & bset)
            if n:
                out_id.append(i)
                out_n.append(n)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "n_hits": pa.array(out_n, pa.int64())}
        )

    return _docs(sf_dir).map_batches(_hits, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_sql(k: int = DECON_K) -> str:
    """Exact mirror of ``shingle_set``: tokens are ``\\S+`` runs (ANY
    whitespace separates, matching ``str.split()``), empty text yields no
    shingles, <k words yield one whole-text shingle."""
    return (
        r"WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts "
        f"FROM documents), "
        f"sh AS (SELECT doc_id, unnest(CASE WHEN len(ts) < {k} "
        f"THEN [array_to_string(ts, ' ')] "
        f"ELSE list_transform(range(len(ts) - {k - 1}), "
        f"i -> array_to_string(ts[i + 1 : i + {k}], ' ')) END) AS shingle "
        f"FROM tok WHERE len(ts) > 0), "
        f"bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {BENCH_MOD} = 0) "
        f"SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_hits "
        f"FROM sh s JOIN bench b USING (shingle) "
        f"WHERE s.doc_id % {BENCH_MOD} <> 0 GROUP BY s.doc_id"
    )


# -------------------------------------------------------- PII redaction --


def pii_redact(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_token, ts_hour, event_type, props_redacted):
    privacy pass over the event stream — ``user_id`` replaced by a keyed
    pseudonym (stable across the corpus, so per-user analytics still
    join), ``ts`` coarsened to the hour, digit runs in the free-form
    ``props`` payload masked, and the raw ``value`` column dropped."""

    def _redact(t: pa.Table) -> pa.Table:
        token = _hash_u32(t["user_id"], salt=_PII_SALT)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_token": pa.array(token.astype(np.int64)),
                "ts_hour": pc.floor_temporal(t["ts"], unit="hour"),
                "event_type": t["event_type"],
                "props_redacted": pc.replace_substring_regex(
                    t["props"], r"\d+", "#"
                ),
            }
        )

    return readers.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).map_batches(_redact, batch_format="pyarrow", zero_copy_batch=True)


def pii_redact_sql() -> str:
    return (
        f"SELECT event_id, "
        f"CAST((user_id * {KNUTH} + {_PII_SALT}) % {MOD} AS BIGINT) AS user_token, "
        f"date_trunc('hour', ts) AS ts_hour, event_type, "
        f"regexp_replace(props, '\\d+', '#', 'g') AS props_redacted "
        f"FROM events"
    )


# ------------------------------------------------- deterministic shuffle --


def corpus_shuffle(sf_dir: str) -> ray.data.Dataset:
    """(pos, doc_id): deterministic global training order — documents
    ranked by salted multiplicative hash (ties by doc_id). Same shape as
    ``sequence_pack``'s distributed prefix sum, keyed by hash range
    instead of doc_id range."""

    def _key(t: pa.Table) -> pa.Table:
        h = _hash_u32(t["doc_id"], salt=_SHUFFLE_SALT)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h.astype(np.int64)),
                "bucket": pa.array(
                    (h // np.uint64(MOD // _SHUFFLE_BUCKETS)).astype(np.int64)
                ),
            }
        )

    ds = _docs(sf_dir, ("doc_id",)).map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers (counts + rank); 3 ints per doc

    counts: dict[int, int] = {}
    for b in ds.groupby("bucket").count().iter_batches(batch_format="pyarrow"):
        for k, v in zip(b["bucket"].to_pylist(), b["count()"].to_pylist()):
            counts[k] = v
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off_ref = ray.put(offsets)

    def _rank(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).sort(["h", "doc_id"])
        base = ray.get(off_ref)[int(df["bucket"][0])]
        return (
            df.with_columns(
                pl.Series("pos", base + np.arange(df.height, dtype=np.int64))
            )
            .select(["pos", "doc_id"])
            .to_arrow()
        )

    return ds.groupby("bucket").map_groups(_rank, batch_format="pyarrow")


def corpus_shuffle_sql() -> str:
    return (
        f"SELECT CAST(ROW_NUMBER() OVER (ORDER BY "
        f"(doc_id * {KNUTH} + {_SHUFFLE_SALT}) % {MOD}, doc_id) - 1 AS BIGINT) "
        f"AS pos, doc_id FROM documents"
    )


CHUNK_WINDOW = 128   # chars per chunk (shared with the SQL oracle)
CHUNK_STRIDE = 96    # overlap = WINDOW - STRIDE = 32 chars


def chunk_documents(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, chunk_idx, chunk): fixed-window overlapping character chunks —
    the standard pretraining / retrieval corpus-prep step (long documents cut
    into training-sized pieces with ``WINDOW - STRIDE`` chars of overlap).

    Documents are row-contained, so chunking is a pure per-batch vectorized
    explode (polars ``int_ranges`` → ``explode`` → expression-offset
    ``str.slice``) — NO shuffle, no Python loop; output size is bounded by
    ``batch_size`` × chunks-per-doc, which is how a 100-TB run bounds its
    memory: shrink the batch, not the operator."""
    import polars as pl

    def _chunks(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = (
            df.with_columns(
                ((pl.col("text").str.len_chars() + (CHUNK_STRIDE - 1)) // CHUNK_STRIDE)
                .alias("_n")
            )
            .with_columns(pl.int_ranges(0, pl.col("_n")).alias("chunk_idx"))
            .explode("chunk_idx")
            .filter(pl.col("chunk_idx").is_not_null())
            .with_columns(
                pl.col("text")
                .str.slice(pl.col("chunk_idx") * CHUNK_STRIDE, CHUNK_WINDOW)
                .alias("chunk")
            )
            .select("doc_id", "chunk_idx", "chunk")
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "chunk_idx": pc.cast(a["chunk_idx"], pa.int64()),
                "chunk": pc.cast(a["chunk"], pa.string()),
            }
        )

    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(_chunks, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents_sql() -> str:
    return (
        f"SELECT doc_id, i AS chunk_idx, "
        f"substr(text, i * {CHUNK_STRIDE} + 1, {CHUNK_WINDOW}) AS chunk "
        f"FROM documents, unnest(generate_series(0, "
        f"CAST(ceil(length(text) / {CHUNK_STRIDE}.0) AS BIGINT) - 1)) AS u(i) "
        f"ORDER BY doc_id, chunk_idx"
    )


def corpus_curation(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, reason, kept): the end-to-end curation decision every
    corpus build makes, composed from this engine's own kernels in ONE
    pipeline — exact-dup representative selection + quality gate + hash
    train-split — with an auditable per-document reason:

      duplicate > low_quality > holdout > kept   (first failing rule)

    Shape: pass 1 is stateless (fingerprint + quality flags + split hash;
    full text never leaves the batch); the only shuffle moves
    (doc_id, fp, 2 bools) routed by coarse fingerprint groups, where a
    vectorized ``min(doc_id).over(fp)`` window picks each text's
    representative (same fp-for-text precedent as ``dedup_exact``: the
    SQL oracle partitions by exact text; 64-bit FNV collisions are the
    accepted epsilon). Verdicts for ALL documents stream out — the kept
    corpus is a plain ``kept`` filter downstream."""
    import polars as pl

    from marc_data_migration_ray.functions.text import fingerprints, quality_columns

    def _flags(t: pa.Table) -> pa.Table:
        q = quality_columns(t["text"])
        h = _hash_u32(t["doc_id"])
        fp = fingerprints(t["text"])
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "fp": fp,
                "is_q": q["is_quality"],
                "is_train": pa.array(h < _T_TRAIN),
                "cg": pc.cast(pc.bit_wise_and(fp, 0x3FF), pa.int32()),
            }
        )

    def _verdict(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["cg"]))
        out = (
            df.with_columns(
                is_rep=pl.col("doc_id") == pl.col("doc_id").min().over("fp")
            )
            .with_columns(
                reason=pl.when(~pl.col("is_rep"))
                .then(pl.lit("duplicate"))
                .when(~pl.col("is_q"))
                .then(pl.lit("low_quality"))
                .when(~pl.col("is_train"))
                .then(pl.lit("holdout"))
                .otherwise(pl.lit("kept")),
            )
            .with_columns(kept=pl.col("reason") == "kept")
            .select(["doc_id", "reason", "kept"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [("doc_id", pa.int64()), ("reason", pa.string()),
                 ("kept", pa.bool_())]
            )
        )

    docs = readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return (
        docs.map_batches(_flags, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cg")
        .map_groups(_verdict, batch_format="pyarrow")
    )


def corpus_curation_sql() -> str:
    is_q = (
        r"length(regexp_extract_all(text, '\S+')) >= 5 AND "
        r"CAST(length(regexp_extract_all(text, '\b(the|of|a|an|p|n)\b')) "
        r"AS DOUBLE) / greatest(length(regexp_extract_all(text, '\S+')), 1) "
        "< 0.5"
    )
    return (
        f"WITH f AS (SELECT doc_id, ({is_q}) AS is_q, "
        "doc_id = min(doc_id) OVER (PARTITION BY text) AS is_rep, "
        f"(doc_id * {KNUTH}) % {MOD} < {_T_TRAIN} AS is_train "
        "FROM documents) "
        "SELECT doc_id, "
        "CASE WHEN NOT is_rep THEN 'duplicate' "
        "WHEN NOT is_q THEN 'low_quality' "
        "WHEN NOT is_train THEN 'holdout' ELSE 'kept' END AS reason, "
        "(is_rep AND is_q AND is_train) AS kept FROM f"
    )


#: multi-pattern blocklist (phrase scrubbing — the contract/boilerplate/
#: spam phrase filter step of corpus curation). Shared with the SQL oracle.
BLOCKLIST = ("batch batch", "slow small", "key order", "fast join")


def blocklist_filter(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_matched, flagged): substring multi-pattern blocklist
    screening per document — the phrase-level exclusion filter (spam
    phrases, contaminating boilerplate, site chrome) every curation
    pipeline runs before training.

    Shuffle-free and row-contained: one polars ``str.contains_any``
    (Aho-Corasick multi-pattern scan — ONE pass over the text regardless
    of pattern count) gives the flag; per-pattern ``contains`` columns
    (vectorized, |patterns| small) give the match count. At a large
    blocklist, the flag stays a single Aho-Corasick pass and the count is
    dropped or sketched — the scan cost is O(text), not O(text×patterns).
    """
    import polars as pl

    pats = list(BLOCKLIST)

    def _scan(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        out = df.select(
            "doc_id",
            n_matched=sum(
                pl.col("text").str.contains(p, literal=True).cast(pl.Int64)
                for p in pats
            ),
            flagged=pl.col("text").str.contains_any(pats),
        )
        a = out.to_arrow()
        return pa.table(
            {
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
                "n_matched": pc.cast(a["n_matched"], pa.int64()),
                "flagged": pc.cast(a["flagged"], pa.bool_()),
            }
        )

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        _scan, batch_format="pyarrow", zero_copy_batch=True
    )


def blocklist_filter_sql() -> str:
    n = " + ".join(
        f"CASE WHEN contains(text, '{p}') THEN 1 ELSE 0 END" for p in BLOCKLIST
    )
    anyp = " OR ".join(f"contains(text, '{p}')" for p in BLOCKLIST)
    return (
        f"SELECT doc_id, CAST({n} AS BIGINT) AS n_matched, "
        f"({anyp}) AS flagged FROM documents"
    )
