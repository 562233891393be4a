"""Inverted index + boolean retrieval over the ``documents`` table.

The classic serving-side text structure a training-data lake still needs
(term→postings for corpus introspection: "which documents mention X and
Y"). Reference parallel: the point-lookup/report style of
processors/reporting/reports.py:27-107 generalized to full-text terms.

Two operators, two scale shapes:

- ``boolean_search`` — scan-side retrieval: the (tiny) query termset rides
  the task closure; each batch tokenizes once and answers ALL queries
  vectorized (polars ``list.contains`` per term). Zero shuffle, pure
  streaming — the right shape when queries are few and ad-hoc.
- ``inverted_postings`` — build-side: explode per-document DISTINCT
  (term, doc_id) pairs inside the batch (documents are row-contained, so
  batch-local per-doc distinct IS globally distinct — no dedup shuffle),
  then ONE all-to-all ``groupby(term)`` co-locates each term's postings.
  That groupby is the index build; document frequency falls out as the
  group size. The driver query prunes to a fixed termset BEFORE the
  shuffle to keep output bounded — the build path is identical without
  the filter.

Tokenizer is the corpus-wide ``\\S+`` whitespace rule, shared VERBATIM
with the DuckDB oracle (``regexp_extract_all(text, '\\S+')``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.sources import readers

#: (query_id, AND-terms) — fixed driver queries over the synthetic corpus
BOOL_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("hash", "join")),
    (2, ("sort", "merge", "window")),
    (3, ("stream", "customer")),
)

#: termset the driver's postings query reports (build path is term-agnostic)
INDEX_TERMS: tuple[str, ...] = ("hash", "join", "window", "stream")


def _docs(sf_dir: str) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def boolean_search(
    sf_dir: str, queries: tuple[tuple[int, tuple[str, ...]], ...] = BOOL_QUERIES
) -> ray.data.Dataset:
    """(query_id, doc_id): documents containing ALL of each query's terms.

    One tokenize per batch answers every query; terms are exact whitespace
    tokens (no substring matches — 'stream' does not hit 'streams')."""
    import polars as pl

    def _scan(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"])).with_columns(
            pl.col("text").str.extract_all(r"\S+").alias("_ws")
        )
        outs = []
        for qid, terms in queries:
            hit = pl.lit(True)
            for term in terms:
                hit = hit & pl.col("_ws").list.contains(term)
            outs.append(
                df.filter(hit).select(
                    pl.lit(qid, dtype=pl.Int64).alias("query_id"), "doc_id"
                )
            )
        a = pl.concat(outs, how="vertical").to_arrow()
        return pa.table(
            {
                "query_id": pc.cast(a["query_id"], pa.int64()),
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(
        _scan, batch_format="pyarrow", zero_copy_batch=True
    )


def boolean_search_sql(
    queries: tuple[tuple[int, tuple[str, ...]], ...] = BOOL_QUERIES,
) -> str:
    parts = []
    for qid, terms in queries:
        conds = " AND ".join(
            f"list_contains(regexp_extract_all(text, '\\S+'), '{t}')"
            for t in terms
        )
        parts.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, doc_id "
            f"FROM documents WHERE {conds}"
        )
    return " UNION ALL ".join(parts)


def term_doc_pairs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Map side of the index build: per-document DISTINCT (term, doc_id)
    pairs. Documents are row-contained ⇒ batch-local distinct is globally
    distinct; the explode footprint is bounded by batch size."""
    import polars as pl

    def _pairs(t: pa.Table) -> pa.Table:
        a = (
            pl.from_arrow(t.select(["doc_id", "text"]))
            .select("doc_id", pl.col("text").str.extract_all(r"\S+").alias("term"))
            .explode("term")
            .drop_nulls("term")
            .unique()
            .to_arrow()
        )
        return pa.table(
            {
                "term": pc.cast(a["term"], pa.string()),
                "doc_id": pc.cast(a["doc_id"], pa.int64()),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True)


def build_postings(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Shuffle side: ``groupby(term)`` co-locates each term's postings —
    rows come out as (term, doc_id, df) with df = the term's document
    frequency (the group size). At 100 TB this is the ONE all-to-all the
    op needs; skewed stopword terms are bounded by the per-doc distinct
    (a term appears once per doc, so a group ≤ corpus doc count)."""

    def _post(g: pa.Table) -> pa.Table:
        df = pa.array([g.num_rows] * g.num_rows, pa.int64())
        return g.select(["term", "doc_id"]).append_column("df", df)

    return term_doc_pairs(ds).groupby("term").map_groups(
        _post, batch_format="pyarrow"
    )


def inverted_postings(
    sf_dir: str, terms: tuple[str, ...] = INDEX_TERMS
) -> ray.data.Dataset:
    """(term, doc_id, df) for a fixed termset — the index build pruned to
    the reported terms before the shuffle (same path as the full build)."""
    want = pa.array(list(terms), pa.string())
    pruned = term_doc_pairs(_docs(sf_dir)).map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=want)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _post(g: pa.Table) -> pa.Table:
        df = pa.array([g.num_rows] * g.num_rows, pa.int64())
        return g.select(["term", "doc_id"]).append_column("df", df)

    return pruned.groupby("term").map_groups(_post, batch_format="pyarrow")


def bm25_topk(
    sf_dir: str,
    terms: tuple[str, ...] = INDEX_TERMS,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """BM25 ranked retrieval (Robertson/Lucene idf) for a fixed termset:
    top-k documents by ``sum_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``.

    Scale shape — two streaming passes, ZERO shuffle:

    1. corpus stats: each batch emits one tiny partial row (doc count,
       total length, per-term document frequency); the driver reduces
       #blocks rows into (N, avgdl, df_t) — a partial-agg, not a groupby.
    2. scoring scan: the (tiny) stats ride the task closure; each batch
       tokenizes once, counts term frequencies vectorized (polars
       ``list.count_matches``), scores in float64 with the SAME operation
       order as the SQL oracle, and keeps its local top-k. The driver
       merges ≤ k×#blocks candidates.

    Scores are emitted as ``score_e9`` (round(score×1e9) as int64) so the
    driver's value-hash compares integers, not float formatting. Ties
    break by doc_id on both sides.
    """
    import math

    import numpy as np
    import polars as pl

    ds = _docs(sf_dir)

    def _stats(t: pa.Table, terms=terms) -> pa.Table:
        ws = pl.from_arrow(t.select(["text"])).select(
            pl.col("text").str.extract_all(r"\S+").alias("ws")
        )
        row = {
            "n_docs": [t.num_rows],
            "total_len": [int(ws.select(pl.col("ws").list.len().sum()).item() or 0)],
        }
        for i, term in enumerate(terms):
            row[f"df_{i}"] = [
                int(ws.select(pl.col("ws").list.contains(term).sum()).item() or 0)
            ]
        return pa.table(row)

    partials = ds.map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    N = sum(p["n_docs"] for p in partials)
    total_len = sum(p["total_len"] for p in partials)
    if N == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score_e9": pa.array([], pa.int64())})
    avgdl = total_len / N
    dfs = [sum(p[f"df_{i}"] for p in partials) for i in range(len(terms))]
    idf = [math.log(1.0 + (N - d + 0.5) / (d + 0.5)) for d in dfs]

    def _score(t: pa.Table, terms=terms, idf=tuple(idf), avgdl=avgdl,
               k1=k1, b=b, k=k) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"])).with_columns(
            pl.col("text").str.extract_all(r"\S+").alias("_ws")
        )
        dl = df.select(pl.col("_ws").list.len().alias("x"))["x"].to_numpy().astype(np.float64)
        tfs = [
            df.select(pl.col("_ws").list.count_matches(term).alias("x"))["x"]
            .to_numpy().astype(np.float64)
            for term in terms
        ]
        # identical operation order to bm25_topk_sql: K first, then the
        # per-term contributions summed left to right
        K = k1 * ((1.0 - b) + b * dl / avgdl)
        score = np.zeros(len(dl), np.float64)
        for i in range(len(terms)):
            score = score + idf[i] * (tfs[i] * (k1 + 1.0)) / (tfs[i] + K)
        keep = score > 0.0
        ids = df["doc_id"].to_numpy()[keep]
        sc = score[keep]
        e9 = np.floor(sc * 1e9 + 0.5).astype(np.int64)  # round half up (>0)
        if len(e9) > k:
            # local top-k candidates; exact order resolved at the merge
            idx = np.lexsort((ids, -e9))[:k]
            ids, e9 = ids[idx], e9[idx]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "score_e9": pa.array(e9, pa.int64())})

    cand = ds.map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # ≤ k × #blocks rows
    cand.sort(key=lambda r: (-r["score_e9"], r["doc_id"]))
    top = cand[:k]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
        "score_e9": pa.array([r["score_e9"] for r in top], pa.int64()),
    })


def bm25_topk_sql(
    terms: tuple[str, ...] = INDEX_TERMS,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle for :func:`bm25_topk` — same formula, same operation
    order, integer-scaled score."""
    tf_cols = ", ".join(
        f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    term_exprs = " + ".join(
        f"ln(1.0 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5)) * "
        f"(d.tf{i} * {k1 + 1.0}) / "
        f"(d.tf{i} + {k1} * ((1.0 - {b}) + {b} * d.dl / s.avgdl))"
        for i in range(len(terms))
    )
    return (
        r"WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws "
        "FROM documents), "
        f"d AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, {tf_cols} FROM toks), "
        f"s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        f"CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl, "
        f"{df_cols} FROM d), "
        f"sc AS (SELECT d.doc_id, {term_exprs} AS score FROM d, s) "
        "SELECT doc_id, CAST(round(score * 1000000000.0) AS BIGINT) AS score_e9 "
        f"FROM sc WHERE score > 0 ORDER BY score_e9 DESC, doc_id LIMIT {k}"
    )


def inverted_postings_sql(terms: tuple[str, ...] = INDEX_TERMS) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return (
        r"WITH pairs AS (SELECT DISTINCT doc_id, "
        r"unnest(regexp_extract_all(text, '\S+')) AS term FROM documents) "
        f"SELECT term, doc_id, "
        "CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df "
        f"FROM pairs WHERE term IN ({tlist})"
    )


RRF_C = 60     # Cormack et al. 2009 constant (shared with the SQL oracle)
RRF_K = 20     # depth of each source ranking


def rrf_fusion(sf_dir: str, k: int = RRF_K, c: int = RRF_C) -> pa.Table:
    """Hybrid retrieval: BM25 lexical ranking fused with dense cosine
    ranking by Reciprocal Rank Fusion — score(d) = 1/(c+r_bm25) +
    1/(c+r_cos), a missing rank contributing 0. The union of the two
    top-k lists, ordered by fused score.

    The heavy work is the two DISTRIBUTED scans inside the source
    retrievers (bm25_topk: two shuffle-free streaming passes; ann_topk:
    broadcast-query matmul + local top-k); the fusion itself touches
    ≤ 2k rows on the driver. Both 1/(c+r) terms are exact divisions of
    small ints added in a fixed order, so the double is bit-identical to
    the SQL oracle's same expression."""
    from marc_data_migration_ray.pipelines.similarity import ann_topk

    bm = bm25_topk(sf_dir, k=k)                      # sorted desc already
    ann = ann_topk(sf_dir, query_ids=(0,), k=k)      # (query_id, rank, vec_id)
    bm_rank = {d: i + 1 for i, d in enumerate(bm["doc_id"].to_pylist())}
    cos_rank = dict(zip(ann["vec_id"].to_pylist(), ann["rank"].to_pylist()))
    rows = []
    for d in sorted(set(bm_rank) | set(cos_rank)):
        rb, rc = bm_rank.get(d), cos_rank.get(d)
        s = (1.0 / (c + rb) if rb else 0.0) + (1.0 / (c + rc) if rc else 0.0)
        rows.append((d, rb, rc, s))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "bm25_rank": pa.array([r[1] for r in rows], pa.int64()),
        "cos_rank": pa.array([r[2] for r in rows], pa.int64()),
        "rrf": pa.array([r[3] for r in rows], pa.float64()),
    })


def rrf_fusion_sql(k: int = RRF_K, c: int = RRF_C) -> str:
    return f"""
WITH bm AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY score_e9 DESC, doc_id)
                 AS BIGINT) AS bm25_rank
  FROM ({bm25_topk_sql(k=k)})
),
co AS (
  SELECT vec_id AS doc_id, CAST(rn AS BIGINT) AS cos_rank
  FROM (SELECT e.vec_id,
               row_number() OVER (ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]),
                 CAST((SELECT embedding FROM embeddings WHERE vec_id = 0)
                      AS DOUBLE[])) DESC, e.vec_id) AS rn
        FROM embeddings e WHERE e.vec_id <> 0)
  WHERE rn <= {k}
)
SELECT doc_id, bm25_rank, cos_rank,
       COALESCE(1.0 / ({c} + bm25_rank), 0.0)
         + COALESCE(1.0 / ({c} + cos_rank), 0.0) AS rrf
FROM bm FULL OUTER JOIN co USING (doc_id)
ORDER BY rrf DESC, doc_id
"""
