"""Deterministic sampling / split operators over the ``documents`` table.

Training-corpus plumbing: reproducible train/val/test splits and
per-source mixture downsampling (data mixing). Both key every decision
off a Knuth multiplicative hash of ``doc_id`` (public: Knuth TAOCP v3,
multiplicative hashing), so the same row lands in the same bucket on any
cluster size — no RNG state, no shuffle, embarrassingly parallel
``map_batches`` over zero-copy Arrow. All comparisons are on INTEGER
hash thresholds (never floats), so the DuckDB oracles built from the
same constants match bit-exactly.

The SQL mirror ``(doc_id * KNUTH) % 2^32`` is exact while
``doc_id * KNUTH`` fits in int64, i.e. doc_id < 2^63 / KNUTH ≈ 3.47e9;
the engine uses uint64 numpy arithmetic and has no such bound.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from marc_data_migration_ray.sources import readers

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth's multiplicative constant
MOD = 1 << 32

# train/val/test fractions → integer hash thresholds (shared with SQL)
SPLIT_FRACTIONS = (0.8, 0.1, 0.1)
_T_TRAIN = int(SPLIT_FRACTIONS[0] * MOD)
_T_VAL = int((SPLIT_FRACTIONS[0] + SPLIT_FRACTIONS[1]) * MOD)

# mixture keep-rates keyed by (numeric source suffix % 4): sources are
# downsampled at different rates, the classic data-mixing knob
MIX_RATES = (1.0, 0.5, 0.25, 0.1)
_MIX_THRESHOLDS = tuple(int(r * MOD) for r in MIX_RATES)
_MIX_SALT = 1234567  # decorrelates the mix hash from the split hash


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def _hash_u32(ids: pa.ChunkedArray | pa.Array, salt: int = 0) -> np.ndarray:
    a = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    v = a.to_numpy(zero_copy_only=False).astype(np.uint64)
    return ((v * np.uint64(KNUTH) + np.uint64(salt)) % np.uint64(MOD)).astype(np.uint64)


def dataset_split(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, split): deterministic 80/10/10 train/val/test assignment.

    Pure per-row hash decision — no sampling state, no shuffle; identical
    assignment regardless of block layout or cluster size (resumable and
    reproducible, unlike RNG-based ``Dataset.split_proportionately``)."""

    def _assign(t: pa.Table) -> pa.Table:
        h = _hash_u32(t["doc_id"])
        split = np.where(h < _T_TRAIN, "train", np.where(h < _T_VAL, "val", "test"))
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(split.tolist(), pa.string())}
        )

    return _docs(sf_dir, ("doc_id",)).map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True
    )


def source_mix_sample(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, source): mixture-weighted downsample — source ``srcN`` is
    kept at rate ``MIX_RATES[N % 4]`` by an independent (salted) hash of
    doc_id. Deterministic data mixing: the kept set is a function of the
    row alone, so reruns/retries produce the identical corpus."""

    def _sample(t: pa.Table) -> pa.Table:
        h = _hash_u32(t["doc_id"], salt=_MIX_SALT)
        suffix = pc.cast(
            pc.replace_substring_regex(t["source"], r"^\D+", ""), pa.int64()
        )
        idx = suffix.combine_chunks().to_numpy(zero_copy_only=False) % len(MIX_RATES)
        thresholds = np.asarray(_MIX_THRESHOLDS, dtype=np.uint64)[idx]
        return t.select(["doc_id", "source"]).filter(pa.array(h < thresholds))

    return _docs(sf_dir, ("doc_id", "source")).map_batches(
        _sample, batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------- SQL mirrors --


def split_sql() -> str:
    return (
        f"WITH h AS (SELECT doc_id, (doc_id * {KNUTH}) % {MOD} AS hv FROM documents) "
        f"SELECT doc_id, CASE WHEN hv < {_T_TRAIN} THEN 'train' "
        f"WHEN hv < {_T_VAL} THEN 'val' ELSE 'test' END AS split FROM h"
    )


def mix_sql() -> str:
    cases = " ".join(
        f"WHEN {i} THEN {t}" for i, t in enumerate(_MIX_THRESHOLDS)
    )
    return (
        f"WITH h AS (SELECT doc_id, source, "
        f"(doc_id * {KNUTH} + {_MIX_SALT}) % {MOD} AS hv, "
        f"CAST(regexp_replace(source, '^\\D+', '') AS BIGINT) % {len(MIX_RATES)} AS g "
        f"FROM documents) "
        f"SELECT doc_id, source FROM h WHERE hv < (CASE g {cases} END)"
    )


_STRAT_SALT = 98765431
STRAT_K = 20  # kept docs per source (shared with the SQL mirror)


def stratified_sample(sf_dir: str, k: int = STRAT_K) -> ray.data.Dataset:
    """(doc_id, source): deterministic per-source sample — each source
    keeps its k docs with the smallest salted hash (ties by doc_id).

    Distributed per-group top-k WITHOUT a full shuffle: every batch
    reduces to at most k rows per source it contains (vectorized polars
    sort+head), then one tiny ``groupby(source)`` over ≤ k×blocks rows
    finishes. The kept set is a pure function of the rows, so it is
    identical on any block layout / cluster size (reservoir sampling is
    not) and stable across reruns — stratified eval sets you can cache."""
    import polars as pl

    def _partial(t: pa.Table) -> pa.Table:
        h = _hash_u32(t["doc_id"], salt=_STRAT_SALT)
        df = pl.from_arrow(t.select(["doc_id", "source"])).with_columns(
            pl.Series("h", h.astype(np.int64))
        )
        out = (
            df.sort(["source", "h", "doc_id"])
            .group_by("source", maintain_order=True)
            .head(k)
        )
        return out.to_arrow()

    def _final(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["h", "doc_id"]).head(k)
        return df.select(["doc_id", "source"]).to_arrow()

    partials = _docs(sf_dir, ("doc_id", "source")).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("source").map_groups(_final, batch_format="pyarrow")


def stratified_sql(k: int = STRAT_K) -> str:
    return (
        f"SELECT doc_id, source FROM ("
        f"SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source "
        f"ORDER BY (doc_id * {KNUTH} + {_STRAT_SALT}) % {MOD}, doc_id) AS rn "
        f"FROM documents) WHERE rn <= {k}"
    )


_WSAMPLE_SALT = 5551212
_WSAMPLE_SCALE = 1_000_000  # priority quantization (hash*SCALE < 2^52, int64-safe)
WSAMPLE_K = 25  # sample size (shared with the SQL mirror)


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pa.Table:
    """(doc_id, weight): size-weighted sample — the k docs with the smallest
    integer priority ``hash(doc_id)*SCALE // weight`` (A-ES-style weighted
    reservoir sampling, Efraimidis & Spirakis 2006, with the u^(1/w) key
    replaced by an integer-division priority so the DuckDB mirror is
    bit-exact: no floats anywhere). Heavier docs (weight = char length)
    get proportionally smaller priorities, so the sample is biased toward
    long documents — the standard length-weighted corpus sample.

    Scale shape: per-batch partial top-k (each batch contributes ≤ k rows,
    vectorized arrow sort+slice) + tiny driver heap merge over ≤ k×blocks
    rows — same pattern as ``top_docs``; no shuffle, no full sort. The
    kept set is a pure function of the rows (deterministic on any block
    layout / cluster size)."""
    import heapq

    def _partial(t: pa.Table) -> pa.Table:
        h = _hash_u32(t["doc_id"], salt=_WSAMPLE_SALT).astype(np.int64)
        ln = pc.utf8_length(t["text"]).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        w = np.maximum(ln, 1)
        prio = (h * _WSAMPLE_SCALE) // w
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "weight": pa.array(w, pa.int64()),
                "prio": pa.array(prio, pa.int64()),
            }
        )
        return out.sort_by([("prio", "ascending"), ("doc_id", "ascending")]).slice(0, k)

    partials = _docs(sf_dir, ("doc_id", "text")).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    )
    best: list = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        for d, w, p in zip(
            b["doc_id"].to_pylist(), b["weight"].to_pylist(), b["prio"].to_pylist()
        ):
            heapq.heappush(best, (-p, -d, w))
            if len(best) > k:
                heapq.heappop(best)
    ranked = sorted((-p, -d, w) for p, d, w in best)
    return pa.table(
        {
            "doc_id": pa.array([d for _, d, _ in ranked], pa.int64()),
            "weight": pa.array([w for _, _, w in ranked], pa.int64()),
        }
    )


def weighted_sample_sql(k: int = WSAMPLE_K) -> str:
    # DuckDB `//` is integer division on BIGINT; greatest() mirrors the
    # w >= 1 guard; length() counts unicode chars == pc.utf8_length
    return (
        f"SELECT doc_id, weight FROM ("
        f"SELECT doc_id, greatest(length(text), 1) AS weight, "
        f"(((doc_id * {KNUTH} + {_WSAMPLE_SALT}) % {MOD}) * {_WSAMPLE_SCALE}) "
        f"// greatest(length(text), 1) AS prio FROM documents) "
        f"ORDER BY prio, doc_id LIMIT {k}"
    )


QUANTILES = (0.1, 0.5, 0.9, 0.99)  # shared with the SQL mirror


def token_quantiles(sf_dir: str) -> "pa.Table":
    """(q_pct, n_tok): EXACT token-length distribution quantiles via a
    mergeable value histogram — the length-distribution health check every
    corpus build runs.

    Scale shape: per-batch (n_tok -> count) histograms (token lengths are
    small integers, so the histogram is tiny regardless of corpus size) →
    one ``groupby(value).sum`` over distinct values → driver computes the
    quantiles from the cumulative counts. Quantile rule (shared with the
    SQL mirror): smallest v whose cumulative count >= ceil(q * N)."""
    import math

    from marc_data_migration_ray.functions.text import token_counts

    def _hist(t: pa.Table) -> pa.Table:
        counts = token_counts(t["text"])
        arr = counts.combine_chunks() if isinstance(counts, pa.ChunkedArray) else counts
        v, c = np.unique(arr.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"v": pa.array(v.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hist: dict[int, int] = {}
    merged = _docs(sf_dir, ("text",)).map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").sum("c")
    for b in merged.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b["v"].to_pylist(), b["sum(c)"].to_pylist()):
            hist[v] = hist.get(v, 0) + c
    N = sum(hist.values())
    out_q, out_v = [], []
    for q in QUANTILES:
        need = math.ceil(q * N)
        cum = 0
        for v in sorted(hist):
            cum += hist[v]
            if cum >= need:
                out_q.append(int(round(q * 100)))
                out_v.append(v)
                break
    return pa.table({"q_pct": pa.array(out_q, pa.int64()),
                     "n_tok": pa.array(out_v, pa.int64())})


PRICE_QUANTILES = (0.1, 0.5, 0.9, 0.99)  # shared with the SQL mirror
_PRICE_BINS = 4096  # pass-2 histogram resolution (driver holds one int per bin)


def price_quantiles(sf_dir: str) -> "pa.Table":
    """(q_pct, price_cents): EXACT quantiles of a CONTINUOUS column
    (``l_extendedprice``, as integer cents) — the companion to
    ``token_quantiles`` for value domains far too wide for a
    per-distinct-value histogram.

    Three streaming passes over one pruned column, no sort, no
    materialization (the classic distributed exact-selection shape —
    bin, locate, refine):

    1. min/max via ``Dataset.aggregate`` (tiny).
    2. per-batch counts into ``_PRICE_BINS`` fixed integer bins →
       ``groupby(bin).sum`` → driver cumulates 4096 ints and finds, for
       each target rank ``ceil(q*N)``, the bin holding it plus the
       remaining within-bin rank.
    3. one filtered re-scan keeps ONLY values in candidate bins (expected
       ~N/4096 rows per bin), merged on the driver. When the whole domain
       spans ≤ 4096 distinct cents (bin width 1 — constant/narrow columns),
       the histogram is exact and pass 3 is skipped entirely.

    Quantile rule (shared with the SQL mirror): smallest v with
    cumulative count >= ceil(q*N). All comparisons on integer cents —
    bit-exact vs DuckDB."""
    import math

    from ray.data.aggregate import Max, Min

    def _read():
        return readers.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=["l_extendedprice"]
        )

    def _cents(t: pa.Table) -> np.ndarray:
        v = t["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
        x = v * 100
        # half-AWAY-from-zero like SQL round() and every other cents kernel
        # in the repo (np.rint is half-to-even and diverges on half-cents)
        return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)

    mm = _read().map_batches(
        lambda t: pa.table({"c": pa.array(_cents(t))}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Min("c"), Max("c"))
    lo_v, hi_v = int(mm["min(c)"]), int(mm["max(c)"])
    span = hi_v - lo_v + 1
    width = max(1, -(-span // _PRICE_BINS))  # ceil; bins cover [lo_v, hi_v]

    def _hist(t: pa.Table) -> pa.Table:
        b = (_cents(t) - lo_v) // width
        v, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(v.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hist = np.zeros(_PRICE_BINS + 1, dtype=np.int64)
    merged = _read().map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("b").sum("c")
    for batch in merged.iter_batches(batch_format="pyarrow"):
        hist[batch["b"].to_numpy()] += batch["sum(c)"].to_numpy()
    cum = np.cumsum(hist)
    N = int(cum[-1])

    # locate each target rank's bin + within-bin residual rank
    targets = []  # (q, bin, rank_within_bin)
    for q in PRICE_QUANTILES:
        need = math.ceil(q * N)
        b = int(np.searchsorted(cum, need, side="left"))
        before = int(cum[b - 1]) if b > 0 else 0
        targets.append((q, b, need - before))

    if width == 1:
        # every bin holds exactly one cent value (narrow/constant domain —
        # the single-value-skew case): the histogram IS the answer, skip
        # pass 3 entirely
        return pa.table(
            {
                "q_pct": pa.array(
                    [int(round(q * 100)) for q, _, _ in targets], pa.int64()
                ),
                "price_cents": pa.array(
                    [lo_v + b for _, b, _ in targets], pa.int64()
                ),
            }
        )
    want_bins = sorted({b for _, b, _ in targets})

    # pass 3: exact values inside candidate bins only
    def _collect(t: pa.Table) -> pa.Table:
        c = _cents(t)
        b = (c - lo_v) // width
        keep = np.isin(b, want_bins)
        return pa.table({"b": pa.array(b[keep]), "c": pa.array(c[keep])})

    by_bin: dict[int, list[np.ndarray]] = {b: [] for b in want_bins}
    cand = _read().map_batches(_collect, batch_format="pyarrow", zero_copy_batch=True)
    for batch in cand.iter_batches(batch_format="pyarrow"):
        bb = batch["b"].to_numpy()
        cc = batch["c"].to_numpy()
        for b in want_bins:
            by_bin[b].append(cc[bb == b])
    sorted_bins = {
        b: np.sort(np.concatenate(v)) if v else np.array([], np.int64)
        for b, v in by_bin.items()
    }
    out_q, out_v = [], []
    for q, b, r in targets:
        out_q.append(int(round(q * 100)))
        out_v.append(int(sorted_bins[b][r - 1]))
    return pa.table({"q_pct": pa.array(out_q, pa.int64()),
                     "price_cents": pa.array(out_v, pa.int64())})


def price_quantiles_sql() -> str:
    qs = ", ".join(f"({int(round(q * 100))})" for q in PRICE_QUANTILES)
    return (
        "WITH t AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v "
        "FROM lineitem), "
        "c AS (SELECT v, count(*) AS n FROM t GROUP BY v), "
        "cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cn, "
        "(SELECT count(*) FROM t) AS N FROM c), "
        f"q(q_pct) AS (VALUES {qs}) "
        "SELECT q_pct, CAST(min(v) AS BIGINT) AS price_cents FROM cum, q "
        "WHERE cn >= ceil(q_pct * N / 100.0) GROUP BY q_pct"
    )


def quantiles_sql() -> str:
    qs = ", ".join(f"({int(round(q * 100))})" for q in QUANTILES)
    return (
        "WITH t AS (SELECT CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
        "AS v FROM documents), "
        "c AS (SELECT v, count(*) AS n FROM t GROUP BY v), "
        "cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cn, "
        "(SELECT count(*) FROM t) AS N FROM c), "
        f"q(q_pct) AS (VALUES {qs}) "
        "SELECT q_pct, CAST(min(v) AS BIGINT) AS n_tok FROM cum, q "
        "WHERE cn >= ceil(q_pct * N / 100.0) GROUP BY q_pct"
    )


def token_quantiles_by_source(sf_dir: str) -> ray.data.Dataset:
    """(source, q_pct, n_tok): per-GROUP exact token-length quantiles —
    ``token_quantiles`` generalized to grouped quantiles without any
    per-group driver work.

    Shape: per-batch (source, n_tok → count) histogram partials →
    ONE ``groupby(source, v).sum`` (tiny: sources × distinct lengths) →
    per-source finish inside ``groupby(source).map_groups`` with a
    vectorized cumsum + searchsorted (each group is a few hundred ints).
    Same rank rule as the global op: smallest v with cum >= ceil(q*N)."""
    import polars as pl

    from marc_data_migration_ray.functions.text import token_counts

    def _hist(t: pa.Table) -> pa.Table:
        counts = token_counts(t["text"])
        df = pl.DataFrame(
            {
                "source": pl.Series(t["source"].to_pylist()),
                "v": pl.Series(
                    (counts.combine_chunks()
                     if isinstance(counts, pa.ChunkedArray) else counts)
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        out = df.group_by(["source", "v"]).len(name="c").to_arrow()
        return pa.table({"source": pc.cast(out["source"], pa.string()),
                         "v": pc.cast(out["v"], pa.int64()),
                         "c": pc.cast(out["c"], pa.int64())})

    merged = (
        _docs(sf_dir, ("text", "source"))
        .map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "v"])
        .sum("c")
    )

    def _finish(g: pa.Table) -> pa.Table:
        import math

        v = g["v"].to_numpy(zero_copy_only=False)
        c = g["sum(c)"].to_numpy(zero_copy_only=False)
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        qs, out = [], []
        for q in QUANTILES:
            need = math.ceil(q * n)
            qs.append(int(round(q * 100)))
            out.append(int(v[np.searchsorted(cum, need, side="left")]))
        src = g["source"][0].as_py()
        return pa.table({"source": pa.array([src] * len(qs), pa.string()),
                         "q_pct": pa.array(qs, pa.int64()),
                         "n_tok": pa.array(out, pa.int64())})

    return merged.groupby("source").map_groups(_finish, batch_format="pyarrow")


def token_quantiles_by_source_sql() -> str:
    qs = ", ".join(f"({int(round(q * 100))})" for q in QUANTILES)
    return (
        "WITH t AS (SELECT source, "
        "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS v "
        "FROM documents), "
        "c AS (SELECT source, v, count(*) AS n FROM t GROUP BY source, v), "
        "cum AS (SELECT source, v, "
        "sum(n) OVER (PARTITION BY source ORDER BY v) AS cn, "
        "sum(n) OVER (PARTITION BY source) AS N FROM c), "
        f"q(q_pct) AS (VALUES {qs}) "
        "SELECT source, q_pct, CAST(min(v) AS BIGINT) AS n_tok "
        "FROM cum, q WHERE cn >= ceil(q_pct * N / 100.0) "
        "GROUP BY source, q_pct"
    )


def token_length_percentile(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tok, pct_rank): CDF transform — each document's
    token-length percentile rank, ``count(rows with v' <= v) / N``
    (SQL ``cume_dist``). The length-filtering knob expressed as a rank
    so thresholds transfer across corpora.

    Shape: the distributed value histogram (distinct token lengths —
    tiny) collapses to a sorted (values, cumcounts) pair broadcast in the
    scoring closure; the second pass is stateless ``map_batches`` with a
    vectorized searchsorted lookup and ONE int/int division per row
    (bit-stable vs the oracle's cume_dist)."""
    from marc_data_migration_ray.functions.text import token_counts

    def _vals(t: pa.Table) -> np.ndarray:
        counts = token_counts(t["text"])
        a = counts.combine_chunks() if isinstance(counts, pa.ChunkedArray) else counts
        return a.to_numpy(zero_copy_only=False).astype(np.int64)

    def _hist(t: pa.Table) -> pa.Table:
        v, c = np.unique(_vals(t), return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    hist: dict[int, int] = {}
    merged = _docs(sf_dir, ("text",)).map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("v").sum("c")
    for b in merged.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b["v"].to_pylist(), b["sum(c)"].to_pylist()):
            hist[v] = hist.get(v, 0) + c
    values = np.array(sorted(hist), dtype=np.int64)
    cum = np.cumsum(np.array([hist[v] for v in values], dtype=np.int64))
    n_total = int(cum[-1]) if len(cum) else 0

    def _score(t: pa.Table) -> pa.Table:
        v = _vals(t)
        le = cum[np.searchsorted(values, v, side="left")]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pa.array(v),
                "pct_rank": pa.array(le / n_total, pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    )


def token_length_percentile_sql() -> str:
    return (
        "SELECT doc_id, "
        "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok, "
        "cume_dist() OVER (ORDER BY "
        "length(regexp_extract_all(text, '\\S+'))) AS pct_rank "
        "FROM documents"
    )


N_RANGES = 8           # equal-count ranges the partitioner produces
_RP_CHAR_BUCKET = 16   # coarse value-range bucket width (routing only)


def range_partition(
    sf_dir: str, k: int = N_RANGES, with_key_bounds: bool = False
) -> ray.data.Dataset:
    """Exact equal-count range partitioning of the corpus by
    ``(n_chars, doc_id)`` — the boundary-planning primitive behind every
    distributed sort / range-partitioned write (Spark's RangePartitioner,
    DuckDB's NTILE). Returns one row per range:
    (range_id 1..k, n_docs, chars_min, chars_max, doc_min, doc_max).

    Unlike sample-based partitioners (approximate boundaries), this is
    EXACT NTILE semantics, still without a global sort:

    1. route rows into coarse VALUE-RANGE buckets (``n_chars // width`` —
       bucket order == sort order, so ranks compose);
    2. per-bucket counts → driver prefix sum (tiny: one int per bucket)
       → each bucket knows its global rank offset;
    3. per-bucket local sort + offset = exact global rank, mapped to its
       NTILE range (first N%k ranges get ⌈N/k⌉ rows); per-bucket PARTIAL
       per-range aggregates (≤ k tiny rows each) feed one final
       ``groupby(range_id)`` reduce.

    Only (doc_id, n_chars) pairs ever move; the heavy value column stays
    in place. Skewed value buckets bound the local sort: at 100 TB, pick
    the bucket width from a quantile sketch of the key instead of a fixed
    constant (the composition is unchanged)."""
    import polars as pl

    ds = readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "bucket": pc.cast(
                    pc.divide(pc.cast(t["n_chars"], pa.int64()), _RP_CHAR_BUCKET),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # two consumers: bucket counts + rank pass

    counts: dict[int, int] = {}
    for b in ds.groupby("bucket").count().iter_batches(batch_format="pyarrow"):
        for kk, v in zip(b["bucket"].to_pylist(), b["count()"].to_pylist()):
            counts[kk] = v
    offsets, acc = {}, 0
    for kk in sorted(counts):
        offsets[kk] = acc
        acc += counts[kk]
    n_total = acc
    big = n_total % k          # first `big` ranges hold q+1 rows (NTILE)
    q = n_total // k
    cut = big * (q + 1)        # rank0 below this → a big range
    off_ref = ray.put(offsets)

    def _partials(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort(["n_chars", "doc_id"])
        base = ray.get(off_ref)[df["bucket"][0]]
        rank0 = base + np.arange(df.height, dtype=np.int64)
        rid = np.where(
            rank0 < cut,
            rank0 // max(q + 1, 1),
            big + (rank0 - cut) // max(q, 1),
        ) + 1
        out = (
            df.with_columns(range_id=pl.Series(rid))
            .group_by("range_id")
            .agg(
                n_docs=pl.len(),
                chars_min=pl.col("n_chars").min(),
                chars_max=pl.col("n_chars").max(),
                doc_min=pl.col("doc_id").min(),
                doc_max=pl.col("doc_id").max(),
                # the range's true LAST sort key, packed — (chars_max,
                # doc_max) alone are independent maxima and NOT a valid
                # split boundary (write path only; see range_partition_write)
                key_max=(
                    (pl.col("n_chars") * (1 << _RP_PACK_BITS)) + pl.col("doc_id")
                ).max(),
            )
        )
        if not with_key_bounds:
            out = out.drop("key_max")
        a = out.to_arrow()
        return pa.table({c: pc.cast(a[c], pa.int64()) for c in a.column_names})

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.groupby("bucket")
        .map_groups(_partials, batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("chars_min", alias_name="chars_min"),
            Max("chars_max", alias_name="chars_max"),
            Min("doc_min", alias_name="doc_min"),
            Max("doc_max", alias_name="doc_max"),
            *([Max("key_max", alias_name="key_max")] if with_key_bounds else []),
        )
        .map_batches(
            lambda t: pa.table(
                {c: pc.cast(t[c], pa.int64()) for c in t.column_names}
            ),
            batch_format="pyarrow",
        )
    )


def range_partition_sql(k: int = N_RANGES) -> str:
    return (
        f"WITH r AS (SELECT doc_id, n_chars, NTILE({k}) OVER "
        "(ORDER BY n_chars, doc_id) AS range_id FROM documents) "
        "SELECT CAST(range_id AS BIGINT) AS range_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(n_chars) AS BIGINT) AS chars_min, "
        "CAST(max(n_chars) AS BIGINT) AS chars_max, "
        "CAST(min(doc_id) AS BIGINT) AS doc_min, "
        "CAST(max(doc_id) AS BIGINT) AS doc_max "
        "FROM r GROUP BY range_id"
    )


_RP_PACK_BITS = 33  # packed sort key: n_chars * 2^33 + doc_id


def range_partition_write(sf_dir: str, dest: str, k: int = N_RANGES) -> dict:
    """Write the corpus as a RANGE-PARTITIONED parquet lake:
    ``dest/range_id=<r>/*.parquet`` with globally disjoint, contiguous
    ``(n_chars, doc_id)`` key ranges — the sorted-lake layout a downstream
    reader consumes in key order without re-sorting (and the write side of
    ``range_partition``'s boundary planning).

    Two stages: (1) ``range_partition`` computes the EXACT equal-count
    boundaries (k tiny rows to the driver); (2) one stateless
    ``map_batches`` assigns each row's range by searchsorted over the
    packed boundary keys and a partitioned ``write_parquet`` lands it —
    the full rows stream straight from source to sink, only the k-row
    boundary table ever leaves the plan. Returns the boundary stats."""
    stats = sorted(range_partition(sf_dir, k, with_key_bounds=True).take_all(),
                   key=lambda r: r["range_id"])
    bounds = np.array([r["key_max"] for r in stats], dtype=np.int64)

    def _assign(t: pa.Table) -> pa.Table:
        n_chars = pc.cast(t["n_chars"], pa.int64()).to_numpy()
        doc_id = pc.cast(t["doc_id"], pa.int64()).to_numpy()
        assert n_chars.max(initial=0) < (1 << (63 - _RP_PACK_BITS))
        assert doc_id.max(initial=0) < (1 << _RP_PACK_BITS)
        packed = (n_chars << _RP_PACK_BITS) | doc_id
        rid = np.searchsorted(bounds, packed, side="left") + 1
        return t.append_column("range_id", pa.array(rid, pa.int64()))

    readers.read_parquet(os.path.join(sf_dir, "documents.parquet")).map_batches(
        _assign, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(dest, partition_cols=["range_id"])
    return {"k": k, "ranges": stats}


# --------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — hashed n-gram features,
# bag-of-ngrams bucket counts, log importance weight toward a target
# domain). PAPERS.md-class public method; no reference analog (the
# training-data-ops mandate).

DSIR_BUCKETS = 128
DSIR_TARGET_SOURCE = "src0"
DSIR_TOPK = 50


def _md5_bucket_map(words, B: int) -> dict:
    """word → md5-derived bucket, the PORTABLE hash shared with DuckDB:
    ``md5_number_lower(w) % B`` == little-endian int of digest bytes 8:16.
    Python-loops only over the batch's UNIQUE feature strings (vocab-
    bounded, not corpus-bounded)."""
    import hashlib

    return {
        w: int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little") % B
        for w in words
    }


def _dsir_features(t: pa.Table, B: int):
    """Batch → (row_index, bucket) int arrays over hashed unigram + word-
    bigram features (the DSIR feature space), fully inside the batch."""
    import polars as pl

    df = pl.from_arrow(t.select(["text"])).with_row_index("rid").with_columns(
        pl.col("text").str.extract_all(r"\S+").alias("ws")
    )
    uni = df.select("rid", pl.col("ws").alias("f")).explode("f").drop_nulls("f")
    long = uni.with_columns(pl.col("f").shift(-1).over("rid").alias("f2"))
    bi = long.filter(pl.col("f2").is_not_null()).select(
        "rid", (pl.col("f") + " " + pl.col("f2")).alias("f")
    )
    feats = pl.concat([uni, bi], how="vertical")
    if feats.height == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    fmap = _md5_bucket_map(feats["f"].unique().to_list(), B)
    b = feats.select(
        pl.col("f").replace_strict(fmap, return_dtype=pl.Int64).alias("b")
    )["b"].to_numpy()
    return feats["rid"].to_numpy().astype(np.int64), b.astype(np.int64)


def dsir_weights(
    sf_dir: str,
    target_source: str = DSIR_TARGET_SOURCE,
    B: int = DSIR_BUCKETS,
    k: int = DSIR_TOPK,
) -> pa.Table:
    """Top-k documents by DSIR log importance weight toward
    ``target_source``: ``logw(x) = Σ_b c_b(x) · λ_b`` with
    ``λ_b = ln((tgt_b+1)/(tgt_tot+B)) − ln((all_b+1)/(all_tot+B))``
    (add-one-smoothed bucket log-ratios, λ frozen to int64 micros so the
    per-document reduction is ORDER-FREE integer arithmetic — bit-exact
    against the DuckDB oracle regardless of block order).

    Scale shape — two streaming passes, zero shuffle: pass 1 reduces
    per-batch (bucket, all_count, target_count) partials (≤ B rows per
    block) on the driver; pass 2 ships the B-entry λ table in the task
    closure, scores each batch via one ``np.bincount`` and keeps its local
    top-k; the driver merges ≤ k×#blocks candidates."""
    ds = readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )

    def _stats(t: pa.Table, B=B, tgt=target_source) -> pa.Table:
        rid, b = _dsir_features(t, B)
        is_tgt = pc.equal(t["source"], tgt).to_numpy(zero_copy_only=False)
        all_c = np.bincount(b, minlength=B)
        tgt_c = np.bincount(b[is_tgt[rid]], minlength=B)
        return pa.table({
            "b": pa.array(np.arange(B, dtype=np.int64)),
            "all_c": pa.array(all_c.astype(np.int64)),
            "tgt_c": pa.array(tgt_c.astype(np.int64)),
        })

    parts = ds.map_batches(_stats, batch_format="pyarrow", zero_copy_batch=True).take_all()
    all_c = np.zeros(B, np.int64)
    tgt_c = np.zeros(B, np.int64)
    for r in parts:
        all_c[r["b"]] += r["all_c"]
        tgt_c[r["b"]] += r["tgt_c"]
    all_tot, tgt_tot = int(all_c.sum()), int(tgt_c.sum())
    import math

    def _round_half_away(x: float) -> int:
        # DuckDB round(): half away from zero (Python round() is banker's)
        return int(math.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)

    lam_e6 = np.array(
        [
            _round_half_away(
                math.log((int(tgt_c[i]) + 1.0) / (tgt_tot + float(B)))
                - math.log((int(all_c[i]) + 1.0) / (all_tot + float(B)))
            )
            for i in range(B)
        ],
        np.int64,
    )

    def _score(t: pa.Table, B=B, lam=lam_e6, k=k) -> pa.Table:
        rid, b = _dsir_features(t, B)
        if len(rid) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "logw_e6": pa.array([], pa.int64())})
        w = np.bincount(rid, weights=lam[b].astype(np.float64),
                        minlength=t.num_rows)
        has = np.bincount(rid, minlength=t.num_rows) > 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[has]
        wv = np.rint(w[has]).astype(np.int64)  # float64 exact below 2^53
        if len(wv) > k:
            idx = np.lexsort((ids, -wv))[:k]
            ids, wv = ids[idx], wv[idx]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "logw_e6": pa.array(wv, pa.int64())})

    cand = ds.map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    cand.sort(key=lambda r: (-r["logw_e6"], r["doc_id"]))
    top = cand[:k]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
        "logw_e6": pa.array([r["logw_e6"] for r in top], pa.int64()),
    })


def dsir_weights_sql(
    target_source: str = DSIR_TARGET_SOURCE,
    B: int = DSIR_BUCKETS,
    k: int = DSIR_TOPK,
) -> str:
    """DuckDB oracle for :func:`dsir_weights` — same features (unigrams +
    word bigrams), same md5 bucket hash, same frozen-λ integer reduce."""
    return (
        r"WITH toks AS (SELECT doc_id, source, "
        r"regexp_extract_all(text, '\S+') AS ws FROM documents), "
        "feats AS ("
        "SELECT doc_id, source, unnest(ws) AS f FROM toks "
        "UNION ALL "
        "SELECT doc_id, source, unnest(list_transform(range(1, len(ws)), "
        "i -> list_extract(ws, i) || ' ' || list_extract(ws, i + 1))) AS f "
        "FROM toks), "
        f"fb AS (SELECT doc_id, source, "
        f"CAST(md5_number_lower(f) % {B} AS BIGINT) AS b FROM feats), "
        "stats AS (SELECT b, count(*) AS all_c, "
        f"sum(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) AS tgt_c "
        "FROM fb GROUP BY b), "
        "tot AS (SELECT sum(all_c) AS all_tot, sum(tgt_c) AS tgt_tot FROM stats), "
        "lam AS (SELECT b, CAST(round((ln((tgt_c + 1.0) / (tgt_tot + "
        f"{float(B)})) - ln((all_c + 1.0) / (all_tot + {float(B)}))) "
        "* 1000000.0) AS BIGINT) AS lam_e6 FROM stats, tot), "
        "doc_b AS (SELECT doc_id, b, count(*) AS c FROM fb GROUP BY doc_id, b) "
        "SELECT doc_id, CAST(sum(c * lam_e6) AS BIGINT) AS logw_e6 "
        "FROM doc_b JOIN lam USING (b) GROUP BY doc_id "
        f"ORDER BY logw_e6 DESC, doc_id LIMIT {k}"
    )
