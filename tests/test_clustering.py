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


def test_semdedup_planted_within_and_cross_cluster(ray_session, tmp_path):
    """Near-identical vectors in the SAME cluster: only the lowest id is
    kept. A near-dup that lands in a DIFFERENT cluster is untouched —
    the defining (documented) blind spot of cluster-scoped dedup."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_data_migration_ray.pipelines import clustering

    rng = np.random.default_rng(3)
    d = 64
    a = rng.normal(size=d); a /= np.linalg.norm(a)
    b = -a                                   # opposite cluster anchor
    eps = rng.normal(size=d) * 1e-3
    vecs = {
        0: a,                                # centroid candidate / keeper
        1: b,                                # second centroid
        2: a + eps,                          # near-dup of 0, same cluster
        3: a + 2 * eps,                      # another near-dup, same cluster
        4: b + eps,                          # near-dup of 1 in the OTHER cluster
        5: rng.normal(size=d),               # random
    }
    pq.write_table(
        pa.table({
            "vec_id": pa.array(sorted(vecs), pa.int64()),
            "embedding": pa.array(
                [list(map(float, vecs[k])) for k in sorted(vecs)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(vecs), pa.int64()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = {r["vec_id"]: r for r in
            clustering.semdedup(str(tmp_path), centroid_ids=(0, 1)).take_all()}
    assert len(rows) == 6                      # every vector gets a verdict
    assert rows[0]["kept"] is True             # first occurrence kept
    assert rows[2]["kept"] is False            # same-cluster near-dups dropped
    assert rows[3]["kept"] is False
    assert rows[1]["kept"] is True             # other cluster's anchor kept
    assert rows[4]["kept"] is False            # near-dup of 1, same cluster 1
    assert rows[0]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"]
    assert rows[1]["cluster_id"] == rows[4]["cluster_id"]


def test_semantic_clusters_counts_survive_multi_batch_merge(ray_session, tmp_path):
    """Regression: the driver merge of per-batch (cluster, n, sum) partials
    must use np.add.at — iter_batches coalesces several k-row partial
    blocks into one batch with REPEATED cluster ids, and fancy-index '+='
    silently drops the duplicates. >8192 rows forces multiple map
    batches; the cluster counts must sum to the row count exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_data_migration_ray.pipelines import clustering

    rng = np.random.default_rng(9)
    n, d = 9000, 64
    emb = rng.normal(size=(n, d)).astype(np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int64()),
        }),
        str(tmp_path / "embeddings.parquet"),
    )
    out = clustering.semantic_clusters(str(tmp_path), k=4, iters=1).to_pylist()
    assert sum(r["n_vectors"] for r in out) == n


def test_embedding_pca_matches_scalar_mirror_and_eigh(ray_session):
    """Projection scores equal a scalar mirror (same frozen-eigenvector
    integer dot), and the power-iterated direction agrees with numpy's
    exact eigendecomposition of the same Gram matrix."""
    import numpy as np
    import pyarrow.parquet as pq

    from marc_data_migration_ray.pipelines import clustering as cl

    sf = "/root/testdata/sf0.001"
    got = {r["vec_id"]: r["pc1_q"] for r in cl.embedding_pca(sf).take_all()}

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    X = np.array([list(e) for e in t["embedding"].to_pylist()], np.float32)
    q = np.floor(X.astype(np.float64) * cl.GRAM_SCALE).astype(np.int64)
    G = (q.T @ q).astype(np.float64)
    v = np.ones(G.shape[0]) / np.sqrt(G.shape[0])
    for _ in range(cl.PCA_ITERS):
        v = G @ v
        v /= np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    vq = np.floor(v * cl.PCA_VEC_SCALE).astype(np.int64)
    exp = q @ vq
    ids = t["vec_id"].to_pylist()
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == exp[i], vid

    # the power direction is the true top eigenvector
    w, V = np.linalg.eigh(G)
    top = V[:, -1]
    assert abs(float(top @ v)) > 0.999
