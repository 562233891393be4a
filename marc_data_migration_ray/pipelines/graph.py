"""Iterative graph analytics over the ``events`` table: weighted PageRank
on the event-type TRANSITION graph (node = event_type, edge src→dst = a
user performing dst immediately after src, weight = transition count).

The shape is the canonical distributed power iteration:

- **edge extraction** is the heavy, distributed part: users are hashed
  into coarse buckets, ONE shuffle co-locates each user's events, each
  bucket computes every user's transitions vectorized (sort + polars
  ``shift(-1).over(user)``) and pre-aggregates (src, dst) partial counts;
  a final ``groupby(src, dst).sum`` yields the weighted edge list.
- **power iterations** run over the aggregated edge table — tiny here
  (|event_type|² edges), so they run on the driver; with a large node
  set (page/doc graphs) each iteration is the same contribution
  ``groupby(dst).sum`` re-expressed as a Dataset op (the rank vector
  rides as a broadcast dict; the edge list never moves again), exactly
  like ``dedup_clusters``' per-round min-label shuffle.

Hash-exactness: ranks are FIXED-POINT int64 (``PR_SCALE``) and every
update uses only integer multiply / floor-divide, so the DuckDB oracle —
the same iterations unrolled as chained CTEs with BIGINT ``//`` — matches
bit-for-bit (same trick as ``label_similarity`` / the k-means oracle;
float summation order can never diverge). The single ``rank`` double is
one final division. Dangling nodes (no out-transitions) let their mass
evaporate — standard simplified PageRank, mirrored in the oracle.

Reference parallel: the reference has no graph op; this extends the
engine's analytics family (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.functions.keys import mod_bucket
from marc_data_migration_ray.sources import readers

PR_ITERS = 3
PR_SCALE = 10**12
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an integer ratio
_PR_BUCKETS = 32


def _events(sf_dir: str, columns) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=list(columns)
    )


def transition_edges(sf_dir: str) -> ray.data.Dataset:
    """(src, dst, w): weighted event-type transition edges — per-user
    consecutive pairs ordered by (ts, event_id)."""
    import polars as pl

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", mod_bucket(t["user_id"], _PR_BUCKETS))

    def _edges(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = (
            df.sort(["user_id", "ts", "event_id"])
            .with_columns(dst=pl.col("event_type").shift(-1).over("user_id"))
            .drop_nulls("dst")
            .group_by([pl.col("event_type").alias("src"), "dst"])
            .len(name="w")
        )
        a = out.to_arrow()
        return pa.table(
            {
                "src": pc.cast(a["src"], pa.string()),
                "dst": pc.cast(a["dst"], pa.string()),
                "w": pc.cast(a["w"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        _bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").map_groups(_edges, batch_format="pyarrow")
    return partials.groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w"))


def event_pagerank(sf_dir: str, iters: int = PR_ITERS) -> pa.Table:
    """(node, rank_fp, rank): fixed-point weighted PageRank after ``iters``
    power iterations over the transition graph. ``rank_fp`` is the exact
    int64 the oracle reproduces; ``rank = rank_fp / PR_SCALE``."""
    edges = [
        (r["src"], r["dst"], r["w"])
        for b in transition_edges(sf_dir).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    nodes = sorted(
        set(
            v
            for b in _events(sf_dir, ["event_type"])
            .groupby("event_type")
            .count()
            .iter_batches(batch_format="pyarrow")
            for v in b["event_type"].to_pylist()
        )
    )
    n = len(nodes)
    outw: dict[str, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    rank = {v: PR_SCALE // n for v in nodes}
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN // n
    for _ in range(iters):
        incoming = {v: 0 for v in nodes}
        for s, d, w in edges:
            incoming[d] += (rank[s] * w) // outw[s]
        rank = {v: base + (PR_D_NUM * incoming[v]) // PR_D_DEN for v in nodes}
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "rank_fp": pa.array([rank[v] for v in nodes], pa.int64()),
            "rank": pa.array([rank[v] / PR_SCALE for v in nodes], pa.float64()),
        }
    )


def event_pagerank_sql(iters: int = PR_ITERS) -> str:
    """The SAME fixed-point iterations unrolled as chained CTEs."""
    s, dn, dd = PR_SCALE, PR_D_NUM, PR_D_DEN
    parts = [
        "WITH tr AS (SELECT event_type AS src, LEAD(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), ",
        "e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr "
        "WHERE dst IS NOT NULL GROUP BY src, dst), ",
        "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src), ",
        "nodes AS (SELECT DISTINCT event_type AS node FROM events), ",
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes), ",
        f"r0 AS (SELECT node, {s} // cnt AS r FROM nodes, nn), ",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, "
            f"CAST(sum((r{i}.r * e.w) // ow.ow) AS BIGINT) AS c "
            f"FROM e JOIN r{i} ON e.src = r{i}.node "
            "JOIN ow ON e.src = ow.src GROUP BY e.dst), "
        )
        parts.append(
            f"r{i + 1} AS (SELECT nodes.node, "
            f"({s} * {dd - dn}) // {dd} // cnt "
            f"+ ({dn} * COALESCE(c{i}.c, 0)) // {dd} AS r "
            f"FROM nodes LEFT JOIN c{i} USING (node), nn), "
        )
    last = f"r{iters}"
    parts.append(
        f"fin AS (SELECT node, r FROM {last}) "
        f"SELECT node, r AS rank_fp, CAST(r AS DOUBLE) / {s} AS rank "
        "FROM fin ORDER BY node"
    )
    return "".join(parts)


def event_markov(sf_dir: str) -> pa.Table:
    """(src, dst, w, out_w, p): the maximum-likelihood Markov transition
    matrix of the event-type chain — p(dst|src) = w/out_w over the same
    distributed edge extraction as ``event_pagerank`` (user-bucket
    shuffle + vectorized consecutive pairs). Counts are exact integers;
    the probability is ONE division per edge, so the oracle hash-matches.
    The per-src totals are |event_type|-sized — a driver dict, broadcast
    territory at web-scale node counts."""
    edges = sorted(
        (
            (r["src"], r["dst"], r["w"])
            for b in transition_edges(sf_dir).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        )
    )
    outw: dict[str, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.string()),
            "dst": pa.array([e[1] for e in edges], pa.string()),
            "w": pa.array([e[2] for e in edges], pa.int64()),
            "out_w": pa.array([outw[e[0]] for e in edges], pa.int64()),
            "p": pa.array([e[2] / outw[e[0]] for e in edges], pa.float64()),
        }
    )


def event_markov_sql() -> str:
    return (
        "WITH tr AS (SELECT event_type AS src, LEAD(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), "
        "e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr "
        "WHERE dst IS NOT NULL GROUP BY src, dst), "
        "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e "
        "GROUP BY src) "
        "SELECT e.src, e.dst, e.w, ow.out_w, "
        "CAST(e.w AS DOUBLE) / ow.out_w AS p "
        "FROM e JOIN ow ON e.src = ow.src"
    )
