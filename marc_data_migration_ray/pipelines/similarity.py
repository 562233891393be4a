"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the baseline (batch matmul against a broadcast
query matrix — ``ray.put`` once, read per actor), and an LSH-bucketed
variant as the scale path. Results are (query_id, rank, vec_id) so the
DuckDB oracle (``list_cosine_similarity`` + window) can hash-match without
float-representation hazards.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

_SEED = 0x5EED


def _emb_ds(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _query_matrix(sf_dir: str, query_ids: tuple[int, ...]) -> np.ndarray:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    emb = t["embedding"].to_pylist()
    rows = []
    for q in query_ids:
        idx = int(np.nonzero(ids == q)[0][0])
        rows.append(np.asarray(emb[idx], dtype=np.float64))
    return np.stack(rows)


def ann_topk(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5) -> pa.Table:
    """Exact cosine top-k: (query_id, rank, vec_id), self excluded.

    Per-batch: normalize, matmul against the broadcast query matrix, local
    top-k per query (argpartition); driver merges the tiny partials with a
    heap. Ties break by vec_id ascending (deterministic, mirrors the SQL
    window ``ORDER BY sim DESC, vec_id``).
    """
    Q = _query_matrix(sf_dir, query_ids)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    q_ref = ray.put(Qn)

    class LocalTopK:
        def __init__(self, q_ref, query_ids, k):
            self.Q = ray.get(q_ref)
            self.query_ids = query_ids
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            emb = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            sims = (emb / norms[:, None]) @ self.Q.T  # (n, q)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                col = sims[:, qi]
                keep = ids != qid
                cids, csims = ids[keep], col[keep]
                if len(cids) > self.k:
                    part = np.argpartition(-csims, self.k)[: self.k]
                    cids, csims = cids[part], csims[part]
                out_q += [qid] * len(cids)
                out_v += cids.tolist()
                out_s += csims.tolist()
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partials = _emb_ds(sf_dir).map_batches(
        LocalTopK,
        fn_constructor_args=(q_ref, tuple(query_ids), k),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
    )
    # driver-side merge: ≤ k rows per query per batch — tiny
    best: dict[int, list] = {q: [] for q in query_ids}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for q, v, s in zip(b["query_id"].to_pylist(), b["vec_id"].to_pylist(), b["sim"].to_pylist()):
            # heap on (sim, -vec_id) so ties prefer the SMALLER vec_id
            heapq.heappush(best[q], (s, -v))
            if len(best[q]) > k:
                heapq.heappop(best[q])
    qs, rs, vs = [], [], []
    for q in query_ids:
        ranked = sorted(best[q], key=lambda t: (-t[0], -t[1]))
        for r, (s, negv) in enumerate(ranked, start=1):
            qs.append(q)
            rs.append(r)
            vs.append(-negv)
    return pa.table(
        {
            "query_id": pa.array(qs, pa.int64()),
            "rank": pa.array(rs, pa.int64()),
            "vec_id": pa.array(vs, pa.int64()),
        }
    )


def ann_topk_lsh(sf_dir: str, query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5,
                 n_planes: int = 6) -> pa.Table:
    """Scale-path ANN: random-hyperplane LSH — only batches are scanned in
    full, but each batch prunes to vectors whose bucket is within Hamming
    ≤ 1 of a query bucket before the exact matmul (approximate recall)."""
    Q = _query_matrix(sf_dir, query_ids)
    rng = np.random.default_rng(_SEED)
    planes = rng.standard_normal((Q.shape[1], n_planes))
    qbits = (Q @ planes > 0).astype(np.uint32)
    qbuckets = (qbits << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    ok = set()
    for qb in qbuckets.tolist():
        ok.add(qb)
        for i in range(n_planes):
            ok.add(qb ^ (1 << i))
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    q_ref = ray.put((Qn, planes, np.array(sorted(ok), dtype=np.uint32)))

    class PrunedTopK:
        def __init__(self, q_ref, query_ids, k):
            self.Q, self.planes, self.ok = ray.get(q_ref)
            self.query_ids = query_ids
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
            emb = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
            bits = (emb @ self.planes > 0).astype(np.uint32)
            buckets = (bits << np.arange(self.planes.shape[1], dtype=np.uint32)).sum(axis=1)
            keep = np.isin(buckets, self.ok)
            ids, emb = ids[keep], emb[keep]
            if len(ids) == 0:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "sim": pa.array([], pa.float64())}
                )
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            sims = (emb / norms[:, None]) @ self.Q.T
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                col = sims[:, qi]
                m = ids != qid
                cids, csims = ids[m], col[m]
                if len(cids) > self.k:
                    part = np.argpartition(-csims, self.k)[: self.k]
                    cids, csims = cids[part], csims[part]
                out_q += [qid] * len(cids)
                out_v += cids.tolist()
                out_s += csims.tolist()
            return pa.table(
                {"query_id": pa.array(out_q, pa.int64()), "vec_id": pa.array(out_v, pa.int64()),
                 "sim": pa.array(out_s, pa.float64())}
            )

    partials = _emb_ds(sf_dir).map_batches(
        PrunedTopK, fn_constructor_args=(q_ref, tuple(query_ids), k),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 4),
    )
    best: dict[int, list] = {q: [] for q in query_ids}
    for b in partials.iter_batches(batch_format="pyarrow"):
        for q, v, s in zip(b["query_id"].to_pylist(), b["vec_id"].to_pylist(), b["sim"].to_pylist()):
            heapq.heappush(best[q], (s, -v))
            if len(best[q]) > k:
                heapq.heappop(best[q])
    qs, rs, vs = [], [], []
    for q in query_ids:
        for r, (s, negv) in enumerate(sorted(best[q], key=lambda t: (-t[0], -t[1])), start=1):
            qs.append(q)
            rs.append(r)
            vs.append(-negv)
    return pa.table(
        {"query_id": pa.array(qs, pa.int64()), "rank": pa.array(rs, pa.int64()),
         "vec_id": pa.array(vs, pa.int64())}
    )


def closest_pairs(sf_dir: str, max_id: int = 300, k: int = 10) -> pa.Table:
    """Top-k most-similar vector pairs among vec_id < max_id:
    (rank, vec_a, vec_b). Broadcast the candidate matrix once (ray.put),
    score per batch, heap-merge the tiny local top-k partials on the driver.
    Ids-only output so the DuckDB oracle hash-matches exactly."""
    import heapq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    keep = np.asarray(t["vec_id"].to_pylist()) < max_id
    ids_all = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)[keep]
    emb_all = np.stack(
        [np.asarray(e, dtype=np.float64) for f, e in zip(keep, t["embedding"].to_pylist()) if f]
    )
    norms = np.linalg.norm(emb_all, axis=1)
    norms[norms == 0] = 1.0
    emb_n = emb_all / norms[:, None]
    ref = ray.put((ids_all, emb_n))

    class PairTopK:
        def __init__(self, ref, max_id, k):
            self.ids_all, self.emb_n = ray.get(ref)
            self.max_id = max_id
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            keep = ids < self.max_id
            ids = ids[keep]
            if len(ids) == 0:
                return pa.table({"vec_a": pa.array([], pa.int64()),
                                 "vec_b": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            emb = np.stack([np.asarray(e, dtype=np.float64)
                            for f, e in zip(keep, batch["embedding"].to_pylist()) if f])
            n = np.linalg.norm(emb, axis=1)
            n[n == 0] = 1.0
            sims = (emb / n[:, None]) @ self.emb_n.T  # (b, A)
            # pairs with batch id < broadcast id only (dedupe a<b globally)
            mask = ids[:, None] < self.ids_all[None, :]
            flat = sims[mask]
            ai = np.repeat(ids, mask.sum(axis=1))
            bi = np.broadcast_to(self.ids_all, mask.shape)[mask]
            if len(flat) > self.k:
                part = np.argpartition(-flat, self.k)[: self.k]
                flat, ai, bi = flat[part], ai[part], bi[part]
            return pa.table({"vec_a": pa.array(ai, pa.int64()),
                             "vec_b": pa.array(bi, pa.int64()),
                             "sim": pa.array(flat, pa.float64())})

    partials = _emb_ds(sf_dir).map_batches(
        PairTopK, fn_constructor_args=(ref, max_id, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )
    best: list = []
    for b in partials.iter_batches(batch_format="pyarrow"):
        for a_, b_, s_ in zip(b["vec_a"].to_pylist(), b["vec_b"].to_pylist(), b["sim"].to_pylist()):
            heapq.heappush(best, (s_, -a_, -b_))
            if len(best) > k:
                heapq.heappop(best)
    ranked = sorted(best, key=lambda x: (-x[0], -x[1], -x[2]))
    return pa.table({
        "rank": pa.array(range(1, len(ranked) + 1), pa.int64()),
        "vec_a": pa.array([-a for _, a, _ in ranked], pa.int64()),
        "vec_b": pa.array([-b for _, _, b in ranked], pa.int64()),
    })
