"""Embedding clustering over the ``embeddings`` table.

Two operators for corpus curation (SemDeDup-style cluster-then-sample
pipelines cluster document embeddings before per-cluster dedup/sampling):

* ``embedding_assign`` — one spherical assignment step against FIXED
  deterministic centroids (the embedding rows of ``centroid_ids``):
  ``cluster_id = argmax_c cos(e, c)``. Exactly SQL-expressible, so the
  driver checks it hash-exact against DuckDB ``list_cosine_similarity``.
* ``semantic_clusters`` — full distributed spherical k-means (Lloyd's):
  each iteration is one ``map_batches`` pass emitting per-batch partial
  ``(cluster, count, sum-vector)`` summaries (k×d doubles per batch —
  tiny), merged on the driver into the next k×d centroid matrix. The
  data never moves: per-iteration traffic is O(batches · k · d), not
  O(rows). The SQL oracle UNROLLS the same fixed number of Lloyd
  iterations as chained CTEs over the exploded (vec_id, dim, val)
  normalized table — cosine's scale-invariance lets the SQL skip
  centroid re-normalization by dividing each dot product by the
  centroid norm — so even this iterative algorithm is hash-checked
  against DuckDB (``semantic_clusters_sql``).

Scale notes (100 TB): the centroid state is k×d floats — broadcast via
``ray.put`` once per iteration; assignment is one batched matmul per
block; the per-iteration reduce is k rows per batch. Each iteration
re-reads the pruned (vec_id, embedding) columns rather than pinning the
dataset in the object store — at cluster scale the read is the cheaper
resource; callers with spare object-store memory can pass a
materialized Dataset instead. Determinism: init centroids are the k
smallest ``vec_id`` rows, argmax ties break toward the smaller cluster
id (numpy first-max == SQL ``ORDER BY sim DESC, cluster_id``).

Reference: this generalizes the broadcast-dict lookup shape of
``/root/reference/processors/plugins/pnca/location_mapper.py:9-108``
(small immutable state shipped once, vectorized per-batch application)
to iterative numeric state.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from marc_data_migration_ray.functions.vectors import emb_matrix, ids_array, normalized
from marc_data_migration_ray.sources import readers

DEFAULT_CENTROID_IDS = (0, 60, 120, 180, 240, 300, 360, 420)


def _emb_ds(sf_dir: str) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _point_vectors(sf_dir: str, ids: tuple[int, ...]) -> np.ndarray:
    """Row-group-pruned read of just the requested rows, returned in the
    order of ``ids`` (no full-table driver read)."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", list(ids))],
    )
    got = ids_array(t["vec_id"])
    emb = emb_matrix(t["embedding"])
    order = [int(np.nonzero(got == q)[0][0]) for q in ids]
    return emb[order]


def _assign_fn(c_ref, cluster_ids):
    """Stateless assignment task: the (k, d) centroid matrix is a zero-copy
    shared-memory ``ray.get`` per task (tiny state → a task pool beats an
    actor pool, whose per-run startup dominates at small scale); per batch
    one matmul + argmax (ties → first index = smallest cluster id)."""
    cids = np.asarray(cluster_ids, np.int64)

    def _fn(t: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        ids = ids_array(t["vec_id"])
        emb = normalized(emb_matrix(t["embedding"]))
        a = np.argmax(emb @ C.T, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cids[a], pa.int64()),
            }
        )

    return _fn


def embedding_assign(
    sf_dir: str, centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS
) -> ray.data.Dataset:
    """Assign every vector to its nearest-by-cosine FIXED centroid (the
    embedding rows of ``centroid_ids``, ascending). Returns a streaming
    Dataset of (vec_id, cluster_id) — no shuffle, one matmul per batch."""
    cids = tuple(sorted(centroid_ids))
    C = normalized(_point_vectors(sf_dir, cids))
    ref = ray.put(C)
    return _emb_ds(sf_dir).map_batches(
        _assign_fn(ref, cids),
        batch_format="pyarrow",
        batch_size=8192,
    )


def embedding_assign_sql(centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS) -> str:
    ids = ", ".join(str(i) for i in sorted(centroid_ids))
    return f"""
WITH c AS (
  SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id IN ({ids})
),
s AS (
  SELECT e.vec_id, c.cluster_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce) AS sim
  FROM embeddings e, c
)
SELECT vec_id, cluster_id
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cluster_id) rn
      FROM s)
WHERE rn = 1
"""


def _partial_sums_fn(c_ref):
    """Per-batch Lloyd partials: (cluster, n, sum-vector) — k rows per
    batch regardless of batch size.  Stateless task; the centroid matrix
    ``ray.get`` is a zero-copy shared-memory read per task."""

    def _fn(t: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        emb = normalized(emb_matrix(t["embedding"]))
        k, d = C.shape
        a = np.argmax(emb @ C.T, axis=1)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, a, emb)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(counts),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    return _fn


def kmeans_fit(sf_dir: str, k: int = 8, iters: int = 3) -> np.ndarray:
    """Distributed spherical k-means: ``iters`` Lloyd update rounds, each
    one streaming map_batches pass + a tiny driver merge of per-batch
    (k, d) partial sums. Init = normalized rows of the k smallest
    vec_ids. Empty clusters keep their previous centroid. Returns the
    final normalized (k, d) centroid matrix."""
    C = normalized(_point_vectors(sf_dir, tuple(range(k))))
    for _ in range(iters):
        ref = ray.put(C)
        partials = _emb_ds(sf_dir).map_batches(
            _partial_sums_fn(ref),
            batch_format="pyarrow",
            batch_size=8192,
        )
        counts = np.zeros(k, np.int64)
        sums = np.zeros_like(C)
        for b in partials.iter_batches(batch_format="pyarrow"):
            # np.add.at, NOT fancy-index +=: iter_batches coalesces several
            # k-row partial blocks into one batch, so cluster ids REPEAT
            # within a batch and += would silently drop the duplicates
            cl = ids_array(b["cluster"])
            np.add.at(counts, cl, ids_array(b["n"]))
            np.add.at(
                sums, cl,
                np.stack([np.asarray(v, np.float64) for v in b["vsum"].to_pylist()]),
            )
        nz = counts > 0
        C = C.copy()
        C[nz] = normalized(sums[nz] / counts[nz, None])
    return C


def semantic_clusters(sf_dir: str, k: int = 8, iters: int = 3) -> pa.Table:
    """Distributed k-means cluster sizes: fit ``iters`` rounds, then one
    final assignment pass reduced to per-cluster counts (k-row output).
    Returns (cluster_id, n_vectors) for non-empty clusters."""
    C = kmeans_fit(sf_dir, k=k, iters=iters)
    ref = ray.put(C)
    partials = _emb_ds(sf_dir).map_batches(
        _partial_sums_fn(ref),
        batch_format="pyarrow",
        batch_size=8192,
    )
    counts = np.zeros(k, np.int64)
    for b in partials.iter_batches(batch_format="pyarrow"):
        # np.add.at: coalesced batches repeat cluster ids (see kmeans_fit)
        np.add.at(counts, ids_array(b["cluster"]), ids_array(b["n"]))
    nz = np.nonzero(counts)[0]
    return pa.table(
        {
            "cluster_id": pa.array(nz.astype(np.int64)),
            "n_vectors": pa.array(counts[nz]),
        }
    )


def semantic_clusters_sql(k: int = 8, iters: int = 3) -> str:
    """The SAME fixed-iteration Lloyd run, unrolled as chained CTEs.

    ``en`` is the exploded normalized table (vec_id, dim, val). Each
    round: assignment = argmax over ``Σ val·cval / |c|`` (cosine — the
    centroid-norm division replaces re-normalization), update = per-dim
    AVG of assigned normalized vectors with empty clusters COALESCEd to
    the previous centroid. Final SELECT counts the last assignment."""

    def assign(tag: str, c: str) -> str:
        return f"""
{tag} AS (
  SELECT vec_id, cluster_id FROM (
    SELECT s.vec_id, s.cluster_id,
           row_number() OVER (
             PARTITION BY s.vec_id ORDER BY s.sim / cn.nrm DESC, s.cluster_id) rn
    FROM (SELECT en.vec_id, c.cluster_id, sum(en.val * c.cval) AS sim
          FROM en, {c} c WHERE en.dim = c.dim
          GROUP BY en.vec_id, c.cluster_id) s
    JOIN (SELECT cluster_id, sqrt(sum(cval * cval)) AS nrm
          FROM {c} GROUP BY cluster_id) cn USING (cluster_id)
  ) WHERE rn = 1
)"""

    ctes = [
        """en AS (
  SELECT vec_id, dim, val / nrm AS val FROM (
    SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS val,
           unnest(range(len(embedding))) AS dim,
           sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
    FROM embeddings)
)""",
        f"""c0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cluster_id, dim, val AS cval
  FROM en WHERE vec_id < {k}
)""",
    ]
    for t in range(iters):
        ctes.append(assign(f"a{t}", f"c{t}").strip())
        ctes.append(
            f"""c{t + 1} AS (
  SELECT prev.cluster_id, prev.dim, COALESCE(n.cval, prev.cval) AS cval
  FROM c{t} prev LEFT JOIN (
    SELECT a.cluster_id, en.dim, avg(en.val) AS cval
    FROM a{t} a JOIN en USING (vec_id) GROUP BY a.cluster_id, en.dim
  ) n ON prev.cluster_id = n.cluster_id AND prev.dim = n.dim
)"""
        )
    ctes.append(assign("afinal", f"c{iters}").strip())
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        "SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_vectors\n"
        "FROM afinal GROUP BY cluster_id"
    )


LABEL_QUANT = 1_000_000  # fixed-point scale for order-free integer sums
EMB_DIM = 64             # embeddings table vector width (TESTDATA.md)


def label_similarity(sf_dir: str) -> pa.Table:
    """(label_a, label_b, cosine): pairwise cosine similarity between the
    per-label CENTROIDS of the embedding table — the "domain similarity
    matrix" used to pick mixing weights / spot near-duplicate sources.

    Float sums are summation-order-dependent, so a naive mean-vector
    pipeline can never hash-match an oracle. The trick: quantize each
    component to fixed-point ints (``round(e * 1e6)``) FIRST — integer
    sums are exact and order-free — and exploit cosine's scale invariance
    (cos(mean_a, mean_b) == cos(sum_a, sum_b)) so no division happens
    until the final scalar expression, which both engines evaluate
    identically: ``CAST(dot AS DOUBLE) / sqrt(CAST(aa*bb AS DOUBLE))``.

    Scale shape: per-batch ``np.add.at`` partial sum-vectors per label →
    one ``groupby(label, pos).sum`` over labels×64 ints → the k×k pair
    loop runs on the driver over k vectors (k = #labels, tiny by
    definition of the op). Python bigints make dot/aa/bb exact at any
    magnitude."""
    import math

    from marc_data_migration_ray.functions.vectors import emb_matrix

    ds = readers.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["label", "embedding"]
    )

    def _partial(t: pa.Table) -> pa.Table:
        x = emb_matrix(t["embedding"]) * LABEL_QUANT
        # width must match the SQL mirror's range(1, EMB_DIM+1) — detect a
        # different embedding table rather than silently truncating
        assert x.shape[1] == EMB_DIM, x.shape
        # half-AWAY-from-zero, matching SQL round() (np.rint is half-to-even)
        q = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        labels = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), np.int64)
        np.add.at(sums, inv, q)
        k, d = sums.shape
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "pos": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "s": pa.array(sums.reshape(-1)),
            }
        )

    merged = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby(["label", "pos"]).sum("s")

    vecs: dict[int, dict[int, int]] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        for lab, pos, s in zip(
            b["label"].to_pylist(), b["pos"].to_pylist(), b["sum(s)"].to_pylist()
        ):
            vecs.setdefault(lab, {})[pos] = s
    labels = sorted(vecs)
    dense = {
        lab: [vecs[lab].get(p, 0) for p in range(EMB_DIM)] for lab in labels
    }
    norms = {lab: sum(x * x for x in v) for lab, v in dense.items()}
    out_a, out_b, out_c = [], [], []
    for i, a in enumerate(labels):
        for bl in labels[i + 1:]:
            dot = sum(x * y for x, y in zip(dense[a], dense[bl]))
            out_a.append(a)
            out_b.append(bl)
            out_c.append(float(dot) / math.sqrt(float(norms[a] * norms[bl])))
    return pa.table(
        {
            "label_a": pa.array(out_a, pa.int64()),
            "label_b": pa.array(out_b, pa.int64()),
            "cosine": pa.array(out_c, pa.float64()),
        }
    )


def label_similarity_sql() -> str:
    return (
        f"WITH q AS (SELECT label, i AS pos, "
        # CAST to DOUBLE first: the column is float32 and FLOAT*INT would
        # multiply in single precision, diverging from the engine's f64
        f"CAST(round(CAST(embedding[i] AS DOUBLE) * {LABEL_QUANT}) AS HUGEINT) AS v "
        f"FROM embeddings, range(1, {EMB_DIM + 1}) t(i)), "
        "s AS (SELECT label, pos, SUM(v) AS s FROM q GROUP BY 1, 2), "
        "p AS (SELECT a.label AS label_a, b.label AS label_b, "
        "SUM(a.s * b.s) AS dot FROM s a JOIN s b "
        "ON a.pos = b.pos AND a.label < b.label GROUP BY 1, 2), "
        "n AS (SELECT label, SUM(s * s) AS nn FROM s GROUP BY 1) "
        "SELECT CAST(label_a AS BIGINT) AS label_a, "
        "CAST(label_b AS BIGINT) AS label_b, "
        "CAST(dot AS DOUBLE) / sqrt(CAST(na.nn * nb.nn AS DOUBLE)) AS cosine "
        "FROM p JOIN n na ON na.label = p.label_a "
        "JOIN n nb ON nb.label = p.label_b"
    )


SEMDEDUP_TH = 0.45  # within-cluster cosine threshold (shared with SQL)


def semdedup(
    sf_dir: str, centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS
) -> ray.data.Dataset:
    """(vec_id, cluster_id, kept): SemDeDup (Abbas et al. 2023) — cluster
    embeddings, then WITHIN each cluster drop every vector that has
    cosine >= ``SEMDEDUP_TH`` with a lower-id vector (greedy keep-first,
    deterministic). Semantic near-duplicates cost training compute
    without adding information; clustering bounds the O(n²) pair scan to
    cluster-sized blocks.

    Shape (the scale path, unlike ``embedding_near_dup``'s broadcast
    all-pairs): assignment is a per-batch matmul against the broadcast
    centroids, then ONE shuffle co-locates each cluster and the per-group
    kernel is a single E·Eᵀ + strict-lower-triangle any() — vectorized,
    no per-vector Python. Per-task memory is the largest cluster
    (centroid count is the knob); output keeps EVERY vector with its
    verdict, so downstream filtering is a plain predicate.

    The kept flag compares float cosines against the threshold; like
    ``embedding_near_dup`` the emitted columns are integers/booleans, so
    the SQL oracle matches exactly whenever no pair sits within float
    epsilon of the threshold (planted-epsilon data would need a fuzz
    band)."""
    cids = tuple(sorted(centroid_ids))
    C = normalized(_point_vectors(sf_dir, cids))
    ref = ray.put(C)
    cluster_ids = np.asarray(cids, np.int64)

    def _assign_carry(t: pa.Table) -> pa.Table:
        # stateless task: per-task zero-copy ray.get of the centroid matrix
        C_b = ray.get(ref)
        emb = normalized(emb_matrix(t["embedding"]))
        a = np.argmax(emb @ C_b.T, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids_array(t["vec_id"]), pa.int64()),
                "cluster_id": pa.array(cluster_ids[a], pa.int64()),
                "emb": pa.array(list(emb.astype(np.float64)),
                                pa.list_(pa.float64())),
            }
        )

    assigned = _emb_ds(sf_dir).map_batches(
        _assign_carry,
        batch_format="pyarrow",
        batch_size=8192,
    )

    def _dedup_cluster(g: pa.Table) -> pa.Table:
        ids = ids_array(g["vec_id"])
        order = np.argsort(ids)
        ids = ids[order]
        E = emb_matrix(g["emb"])[order]  # zero-copy, no per-row Python
        S = E @ E.T
        dropped = (np.tril(S, -1) >= SEMDEDUP_TH).any(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(
                    np.full(len(ids), int(g["cluster_id"][0].as_py()), np.int64)
                ),
                "kept": pa.array(~dropped),
            }
        )

    return assigned.groupby("cluster_id").map_groups(
        _dedup_cluster, batch_format="pyarrow"
    )


def semdedup_sql(centroid_ids: tuple[int, ...] = DEFAULT_CENTROID_IDS) -> str:
    ids = ", ".join(str(i) for i in sorted(centroid_ids))
    return f"""
WITH c AS (
  SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS ce
  FROM embeddings WHERE vec_id IN ({ids})
),
s AS (
  SELECT e.vec_id, c.cluster_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.ce) AS sim
  FROM embeddings e, c
),
a AS (
  SELECT vec_id, cluster_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cluster_id) rn
        FROM s)
  WHERE rn = 1
)
SELECT a1.vec_id, a1.cluster_id,
       NOT EXISTS (
         SELECT 1 FROM a a2
         JOIN embeddings e1 ON e1.vec_id = a1.vec_id
         JOIN embeddings e2 ON e2.vec_id = a2.vec_id
         WHERE a2.cluster_id = a1.cluster_id AND a2.vec_id < a1.vec_id
           AND list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                      CAST(e2.embedding AS DOUBLE[])) >= {SEMDEDUP_TH}
       ) AS kept
FROM a a1
"""


GRAM_SCALE = 1024   # fixed-point quantization (2^10: float32·2^10 is exact)
GRAM_DIMS = 8       # reported sub-block (full-d is the same op, more rows)


def embedding_gram(sf_dir: str, dims: int = GRAM_DIMS) -> ray.data.Dataset:
    """(i, j, gram_x): the Gram / scatter matrix Σ x xᵀ over the embedding
    corpus (first ``dims`` dimensions) — the one-pass building block of
    PCA, whitening and covariance-based pruning at corpus scale.

    Canonical mergeable-partial linear algebra: every batch computes its
    quantized XᵀX (one numpy matmul, dims² ints), and the merge is an
    elementwise integer sum (``groupby(i, j).sum`` over dims²-row
    partials) — vectors never shuffle, the reduce moves dims² numbers per
    batch. Fixed point via floor(x·2¹⁰) (floor, not round: SQL round()
    is half-away, numpy rint is half-even) keeps every product an exact
    int64, so float summation order cannot diverge from the oracle."""
    import os

    from marc_data_migration_ray.functions.vectors import emb_matrix
    from marc_data_migration_ray.sources import readers

    def _partial(t: pa.Table) -> pa.Table:
        x = emb_matrix(t["embedding"])[:, :dims]
        q = np.floor(x * GRAM_SCALE).astype(np.int64)
        g = q.T @ q
        ii, jj = np.meshgrid(np.arange(dims), np.arange(dims), indexing="ij")
        return pa.table(
            {
                "i": pa.array(ii.ravel(), pa.int64()),
                "j": pa.array(jj.ravel(), pa.int64()),
                "gram_x": pa.array(g.ravel(), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    ds = readers.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("gram_x", alias_name="gram_x"))
        .map_batches(
            lambda t: pa.table({c: pc.cast(t[c], pa.int64())
                                for c in ("i", "j", "gram_x")}),
            batch_format="pyarrow",
        )
    )


def embedding_gram_sql(dims: int = GRAM_DIMS) -> str:
    s = GRAM_SCALE
    return (
        f"SELECT i, j, CAST(SUM("
        f"CAST(floor(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) * {s}) AS BIGINT) * "
        f"CAST(floor(CAST(embedding[CAST(j AS INTEGER) + 1] AS DOUBLE) * {s}) AS BIGINT)"
        f") AS BIGINT) AS gram_x "
        f"FROM embeddings, range(0, {dims}) t1(i), range(0, {dims}) t2(j) "
        "GROUP BY i, j"
    )


PCA_ITERS = 300         # fixed power-iteration count (deterministic;
                        # d×d on the driver, so generous convergence is free)
PCA_VEC_SCALE = 1 << 20  # frozen-eigenvector quantization


def embedding_pca(sf_dir: str, iters: int = PCA_ITERS) -> ray.data.Dataset:
    """(vec_id, pc1_q): every vector's projection onto the corpus's top
    principal direction — the classic embedding-space triage axis
    (curriculum ordering, outlier pruning, coarse 1-D bucketing).

    Shape (100 TB): pass 1 is the mergeable Gram partial from
    ``embedding_gram`` over ALL dims (each batch → one d×d int matmul,
    vectors never shuffle; the driver sums d² ints per batch). The power
    iteration runs on the DRIVER over the d×d matrix — O(d²·iters), free
    and corpus-size-independent. The eigenvector is then FROZEN to
    integers (floor(v·2²⁰)) and pass 2 scores every vector with one
    int64 dot — exact, order-free, hash-stable (floats never summed
    across workers). Verified in pytest against a scalar mirror plus a
    numpy ``eigh`` direction check (iterative ⇒ no SQL oracle)."""
    import os

    from marc_data_migration_ray.functions.vectors import emb_matrix
    from marc_data_migration_ray.sources import readers

    ds = readers.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def _gram(t: pa.Table) -> pa.Table:
        q = np.floor(emb_matrix(t["embedding"]) * GRAM_SCALE).astype(np.int64)
        g = q.T @ q
        return pa.table({"idx": pa.array(np.arange(g.size, dtype=np.int64)),
                         "g": pa.array(g.ravel(), pa.int64())})

    # driver reduce: d² (idx, value) ints per batch, summed positionally
    # (batches may concatenate several partials — idx keys the position)
    total = np.zeros(0, np.int64)
    for b in ds.map_batches(_gram, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        idx = np.asarray(b["idx"].to_numpy(zero_copy_only=False), np.int64)
        g = np.asarray(b["g"].to_numpy(zero_copy_only=False), np.int64)
        size = int(idx.max()) + 1
        if total.size < size:
            total = np.concatenate(
                [total, np.zeros(size - total.size, np.int64)])
        np.add.at(total, idx, g)
    n = int(np.sqrt(total.size))
    G = total.astype(np.float64).reshape(n, n)

    v = np.ones(n) / np.sqrt(n)
    for _ in range(iters):
        v = G @ v
        v /= np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:  # canonical sign
        v = -v
    vq = np.floor(v * PCA_VEC_SCALE).astype(np.int64)
    vq_t = tuple(int(x) for x in vq)

    def _score(t: pa.Table, vq=vq_t) -> pa.Table:
        q = np.floor(emb_matrix(t["embedding"]) * GRAM_SCALE).astype(np.int64)
        s = q @ np.asarray(vq, np.int64)
        return pa.table(
            {"vec_id": pc.cast(t["vec_id"], pa.int64()),
             "pc1_q": pa.array(s, pa.int64())}
        )

    return ds.map_batches(_score, batch_format="pyarrow", zero_copy_batch=True)
