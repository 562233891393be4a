"""Distributed spherical k-means vs a single-process numpy mirror, and
assignment-margin sanity (the DuckDB hash oracles in
test_queries_vs_duckdb are only trustworthy if no point sits on a
floating-point knife edge between two clusters)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.functions.vectors import emb_matrix, normalized
from marc_data_migration_ray.pipelines import clustering as cl

SF = "/root/testdata/sf0.001"


def _all_normalized():
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(t["vec_id"]))
    return normalized(emb_matrix(t["embedding"]))[order]


def _numpy_kmeans(x, k, iters):
    """Whole-array mirror of kmeans_fit: same init, same update rule,
    different summation order (full-array sum vs per-batch partials)."""
    C = x[:k].copy()
    for _ in range(iters):
        a = np.argmax(x @ C.T, axis=1)
        for j in range(k):
            if (a == j).any():
                C[j] = x[a == j].mean(0)
        C = normalized(C)
    return C, np.argmax(x @ C.T, axis=1)


@pytest.mark.parametrize("k,iters", [(8, 3), (4, 5)])
def test_distributed_kmeans_matches_numpy_mirror(ray_session, k, iters):
    x = _all_normalized()
    C_want, a_want = _numpy_kmeans(x, k, iters)
    C_got = cl.kmeans_fit(SF, k=k, iters=iters)
    assert np.allclose(C_got, C_want, atol=1e-9)
    got = {
        r["cluster_id"]: r["n_vectors"]
        for r in cl.semantic_clusters(SF, k=k, iters=iters).to_pylist()
    }
    want = {int(j): int(n) for j, n in zip(*np.unique(a_want, return_counts=True))}
    assert got == want
    assert sum(got.values()) == len(x)


def test_assignment_margins_are_not_knife_edge(ray_session):
    """Best-vs-second cosine margins stay far above fp noise for both the
    fixed-centroid assignment and the final k-means assignment — the
    hash-exact DuckDB comparison cannot flip on summation order."""
    x = _all_normalized()
    for C in (
        normalized(cl._point_vectors(SF, tuple(sorted(cl.DEFAULT_CENTROID_IDS)))),
        cl.kmeans_fit(SF, k=8, iters=3),
    ):
        sims = np.sort(x @ C.T, axis=1)
        margin = (sims[:, -1] - sims[:, -2]).min()
        assert margin > 1e-6, margin
