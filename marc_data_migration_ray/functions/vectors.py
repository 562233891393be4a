"""Zero-copy vector-column helpers.

The ``embeddings.parquet`` column is ``list<float>`` with a fixed row
length; these helpers view the flat Arrow values buffer as a numpy matrix
without per-row Python (replaces the
``np.stack([np.asarray(e) for e in col.to_pylist()])`` anti-pattern —
VERDICT r1 finding #9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix view of a list<float> column (copy only on cast)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype)
    offsets = np.asarray(col.offsets)
    lens = offsets[1:] - offsets[:-1]
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("embedding column is ragged; expected fixed dim")
    flat = np.asarray(col.values)[offsets[0] : offsets[-1]]
    return flat.reshape(n, dim).astype(dtype, copy=False)


def ids_array(col) -> np.ndarray:
    """int64 view of an integer id column (zero-copy when possible)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def normalized(emb: np.ndarray) -> np.ndarray:
    """L2-normalize rows (zero rows pass through unscaled)."""
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    return emb / norms[:, None]
