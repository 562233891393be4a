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


def _docs(sf_dir: str, columns) -> ray.data.Dataset:
    return ray.data.read_parquet(
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
