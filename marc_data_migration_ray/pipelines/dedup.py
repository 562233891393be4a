"""Deduplication operators over the ``documents`` table.

The scale-critical training-data ops: exact dedup (hash-partition +
per-group representative — the distributed form of reference R1/J2
duplicate detection), MinHash+LSH near-dup, SimHash near-dup, n-gram
Jaccard verification, and embedding-cosine near-dup.

Scale pattern (ray_guide §Aggregation): content-hash in a vectorized
``map_batches`` → ``groupby(hash)`` shuffle over the *hash column only*
path, never shuffling full texts for grouping decisions; near-dup uses
banded LSH so the shuffle key is (band, bucket) with candidate
verification afterwards.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from marc_data_migration_ray.functions.text import fingerprints

_SEED = 0x5EED


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


# --------------------------------------------------------------------- #
# exact dedup
# --------------------------------------------------------------------- #
def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """One representative per distinct text: (doc_id = min id, group_size).

    map_batches adds a 64-bit content fingerprint, then a single
    ``groupby(fp).aggregate(Min, Count)`` — the canonical exact-dedup
    shuffle; only (fp, doc_id) move, not the texts.
    """
    with_fp = _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "fp": fingerprints(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = with_fp.groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="group_size")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()),
             "group_size": pc.cast(t["group_size"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------- #
# MinHash + LSH near-dup
# --------------------------------------------------------------------- #
def _word_hashes(texts: pa.ChunkedArray | pa.Array):
    """Vectorized per-word 64-bit hashes + doc offsets.

    Splits on whitespace with Arrow, hashes the FLAT word values through the
    Arrow string buffer (``_fnv1a_numpy`` — no per-word Python), and returns
    (word_hashes uint64[W], doc_offsets int64[D+1]).
    """
    from marc_data_migration_ray.functions.keys import _fnv1a_numpy

    words = pc.split_pattern_regex(pc.cast(texts, pa.string()), r"\s+")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = np.asarray(words.offsets).astype(np.int64)
    vals = words.values
    wh = _fnv1a_numpy(vals) if len(vals) else np.empty(0, np.uint64)
    return wh, offsets


class MinHasher:
    """Actor-pool stage: seeded permutations built once per actor.

    Fully vectorized: Arrow-buffer word hashing → rolling 3-word shingle
    hashes (multiply-xor combine) → 64 minhash permutations via
    ``np.minimum.reduceat`` over per-doc shingle segments → banded FNV
    bucket keys. Emits one row per (doc_id, band, bucket); no per-row
    Python in the hot path.
    """

    _C = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier

    def __init__(self, num_perm: int = 64, n_bands: int = 8, shingle: int = 3):
        rng = np.random.default_rng(_SEED)
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.rows_per_band = num_perm // n_bands
        self.shingle = shingle
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    def _shingle_hashes(self, wh: np.ndarray, offsets: np.ndarray):
        """Rolling k-word shingle hashes per doc → (sh, doc_starts)."""
        k = self.shingle
        n_docs = len(offsets) - 1
        lens = offsets[1:] - offsets[:-1]
        with np.errstate(over="ignore"):
            # rolling combine over the flat word array; entries crossing doc
            # boundaries are invalidated below
            rolled = np.full(max(len(wh) - k + 1, 0), 0, np.uint64)
            for j in range(k):
                rolled = rolled ^ (wh[j : len(wh) - k + 1 + j] * (self._C + np.uint64(2 * j)))
        sh_parts, starts = [], np.zeros(n_docs + 1, np.int64)
        with np.errstate(over="ignore"):
            for d in range(n_docs):
                lo, hi = offsets[d], offsets[d + 1]
                if lens[d] >= k:
                    seg = rolled[lo : hi - k + 1]
                else:
                    # short doc: one shingle = multiply-xor of all its words
                    acc = np.uint64(0xCBF29CE484222325)
                    for v in wh[lo:hi]:
                        acc = (acc ^ v) * self._C
                    seg = np.array([acc], np.uint64)
                sh_parts.append(seg)
                starts[d + 1] = starts[d] + len(seg)
        sh = np.concatenate(sh_parts) if sh_parts else np.empty(0, np.uint64)
        return sh, starts

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        wh, offsets = _word_hashes(t["text"])
        sh, starts = self._shingle_hashes(wh, offsets)
        n_docs = len(ids)
        if n_docs == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "band": pa.array([], pa.int32()),
                 "bucket": pa.array([], pa.int64())}
            )
        sig = np.empty((n_docs, self.num_perm), np.uint64)
        seg_starts = starts[:-1]
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, 16):  # bound transient memory
                chunk = sh[:, None] * self.a[None, p0 : p0 + 16] + self.b[None, p0 : p0 + 16]
                sig[:, p0 : p0 + 16] = np.minimum.reduceat(chunk, seg_starts, axis=0)
        # banded FNV over each band's rows (vectorized across docs)
        out_ids = np.repeat(ids, self.n_bands)
        out_bands = np.tile(np.arange(self.n_bands, dtype=np.int32), n_docs)
        buckets = np.empty((n_docs, self.n_bands), np.uint64)
        prime = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for b in range(self.n_bands):
                h = np.full(n_docs, 0xCBF29CE484222325, np.uint64)
                for r in range(self.rows_per_band):
                    h = (h ^ sig[:, b * self.rows_per_band + r]) * prime
                buckets[:, b] = h & np.uint64(0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "band": pa.array(out_bands, pa.int32()),
                "bucket": pa.array(buckets.reshape(-1).view(np.int64), pa.int64()),
            }
        )


def hash_str64(s: str) -> int:
    """Stable 64-bit FNV-1a of a string (no process-salted ``hash()``)."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def dedup_minhash(sf_dir: str, jaccard_threshold: float = 0.8) -> ray.data.Dataset:
    """Near-dup pairs via MinHash-LSH banding (+ exact shingle-Jaccard verify).

    shingle→minhash→band→``groupby(band,bucket)``→candidate pairs→verify.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, deduplicated.
    """
    sigs = _docs(sf_dir).map_batches(
        MinHasher, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4)
    )

    def _pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g["doc_id"].to_pylist()))
        out_a, out_b = [], []
        if len(ids) > 1:
            cap = min(len(ids), 50)  # bound mega-buckets; log-worthy at scale
            for i in range(cap):
                for j in range(i + 1, cap):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())}
        )

    cand = sigs.groupby(["band", "bucket"]).map_groups(_pairs, batch_format="pyarrow")
    cand = cand.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="nb"))
    cand = cand.map_batches(
        lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
    )

    docs = _load_doc_texts(sf_dir)

    class Verifier:
        def __init__(self, docs_ref, shingle=3):
            import ray as _ray

            self.texts = _ray.get(docs_ref)
            self.shingle = shingle

        def _set(self, doc_id):
            words = self.texts[doc_id].split()
            k = self.shingle
            if len(words) < k:
                return {" ".join(words)} if words else set()
            return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}

        def __call__(self, t: pa.Table) -> pa.Table:
            ja = []
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
                sa, sb = self._set(a), self._set(b)
                u = sa | sb
                ja.append(len(sa & sb) / len(u) if u else 0.0)
            return t.append_column("jaccard", pa.array(ja, pa.float64()))

    verified = cand.map_batches(
        Verifier,
        fn_constructor_args=(docs,),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return verified.filter(expr=f"jaccard >= {jaccard_threshold}")


def _load_doc_texts(sf_dir: str):
    """Broadcast doc_id→text dict via ray.put (small side; at 100 TB the
    verify stage would instead join texts by candidate semi-join)."""
    import pyarrow.parquet as pq
    import ray as _ray

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return _ray.put(dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))


# --------------------------------------------------------------------- #
# SimHash near-dup
# --------------------------------------------------------------------- #
def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, simhash, b0..b3): 64-bit SimHash + 4×16-bit blocking keys.

    Pairs within Hamming distance ≤ 3 share at least one of the 4 blocks
    (pigeonhole), so near-dup candidates come from 4 cheap groupbys.
    """

    def _sim(t: pa.Table) -> pa.Table:
        # vectorized: Arrow-buffer word hashes → per-bit counts via
        # np.add.reduceat over per-doc word segments → sign-packed simhash
        wh, offsets = _word_hashes(t["text"])
        n_docs = len(offsets) - 1
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        if len(wh):
            bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            # reduceat needs nonempty segments: clamp empty-doc starts, zero after
            starts = np.minimum(offsets[:-1], max(len(wh) - 1, 0))
            counts = np.add.reduceat(bits, starts, axis=0)
            counts[lens == 0] = 0
        else:
            counts = np.zeros((n_docs, 64), np.int32)
        v = counts * 2 - lens[:, None]
        sim = ((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        sim[lens == 0] = 0
        sim = sim.astype(np.uint64)
        out = {"doc_id": t["doc_id"], "simhash": pa.array(sim.view(np.int64), pa.int64())}
        for k in range(4):
            out[f"b{k}"] = pa.array(((sim >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int32), pa.int32())
        return pa.table(out)

    return _docs(sf_dir).map_batches(_sim, batch_format="pyarrow", batch_size=2048)


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs by SimHash block-LSH + exact Hamming verification."""
    sigs = simhash_signatures(sf_dir)

    def _explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for k in range(4):
            parts.append(
                pa.table(
                    {
                        "block": pa.array(np.full(n, k, np.int32)),
                        "bkey": t[f"b{k}"],
                        "doc_id": t["doc_id"],
                        "simhash": t["simhash"],
                    }
                )
            )
        return pa.concat_tables(parts)

    exploded = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_pylist()
        sh = np.array(g["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        order = np.argsort(ids)
        out_a, out_b, ham = [], [], []
        cap = min(len(ids), 64)
        for i in range(cap):
            for j in range(i + 1, cap):
                a, b = order[i], order[j]
                if ids[a] == ids[b]:
                    continue
                d = int(bin(int(sh[a]) ^ int(sh[b])).count("1"))
                if d <= max_hamming:
                    out_a.append(ids[a])
                    out_b.append(ids[b])
                    ham.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(ham, pa.int32()),
            }
        )

    pairs = exploded.groupby(["block", "bkey"]).map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# --------------------------------------------------------------------- #
# embedding-cosine near-dup (LSH-bucketed)
# --------------------------------------------------------------------- #
def embedding_near_dup(sf_dir: str, threshold: float = 0.9, n_planes: int = 8) -> ray.data.Dataset:
    """Near-dup vector pairs: random-hyperplane LSH buckets → within-bucket
    exact cosine (vectorized matmul per bucket)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def _bucket(t: pa.Table) -> pa.Table:
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()])
        rng = np.random.default_rng(_SEED)
        planes = rng.standard_normal((emb.shape[1], n_planes))
        sig = (emb @ planes > 0).astype(np.uint32)
        bucket = (sig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1).astype(np.int32)
        return pa.table(
            {"vec_id": t["vec_id"], "bucket": pa.array(bucket, pa.int32()), "embedding": t["embedding"]}
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", batch_size=4096)

    def _pairs(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        emb = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"].to_pylist()])
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        sim = (emb @ emb.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "cosine": pa.array(sim[iu][mask], pa.float64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
