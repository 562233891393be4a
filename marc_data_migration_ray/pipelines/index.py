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


def inverted_postings_sql(terms: tuple[str, ...] = INDEX_TERMS) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return (
        r"WITH pairs AS (SELECT DISTINCT doc_id, "
        r"unnest(regexp_extract_all(text, '\S+')) AS term FROM documents) "
        f"SELECT term, doc_id, "
        "CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df "
        f"FROM pairs WHERE term IN ({tlist})"
    )
