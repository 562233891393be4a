"""Vectorized exact shingle-Jaccard kernels (VERDICT r4 item 3).

One shared implementation for every verify stage that compares candidate
pairs by distinct rolling 3-shingles — the CDC near-dup queries
(``derived._verify_shingle_jaccard``, int64 token lists) and the
text-dedup verifiers (``dedup``'s attach/broadcast paths, word strings).
The per-pair Python loop (``to_pylist()`` + set ops) is replaced with
offset arithmetic over the flat Arrow buffers — the same pattern as
``derived._truncate_last_token``.

EXACTNESS: no hashing is involved. Shingles are compared as
``(length, w0, w1, w2)`` integer 4-tuples; text words are integer-coded
with ``np.unique`` over the batch's combined a-side+b-side vocabulary,
so code-tuple equality is string-shingle equality (words contain no
whitespace, so ``" ".join`` is injective per length class). Results are
bit-identical to the scalar ``set`` kernels — pinned by an equivalence
test sweeping lengths 0/1/2/3+ and null rows.

Shingle semantics (shared with the DuckDB oracles): empty sequence → ∅;
< 3 items → one whole-sequence shingle; else distinct rolling 3-tuples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_buffers(col: pa.Array | pa.ChunkedArray, cast_to=None):
    """(values int64[], offsets int64[n+1]) with null rows as empty."""
    if cast_to is not None:
        col = pc.cast(col, cast_to)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = (np.asarray(col.values).astype(np.int64)
            if len(col.values) else np.empty(0, np.int64))
    lens = off[1:] - off[:-1]
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    starts = off[:-1].copy()
    lens = np.where(valid, lens, 0)
    return vals, starts, lens


def _emit_shingles(vals: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray):
    """All shingles of a list column as parallel arrays
    ``(row, l, s0, s1, s2)`` — rolling 3-windows for rows with ≥3 items,
    one whole-sequence shingle (zero-padded, length-tagged) for shorter
    non-empty rows."""
    n = len(lens)
    cnt3 = np.where(lens >= 3, lens - 2, 0).astype(np.int64)
    tot3 = int(cnt3.sum())
    pre = np.zeros(n + 1, np.int64)
    np.cumsum(cnt3, out=pre[1:])
    row3 = np.repeat(np.arange(n, dtype=np.int64), cnt3)
    pos = (np.repeat(starts, cnt3)
           + (np.arange(tot3, dtype=np.int64) - np.repeat(pre[:-1], cnt3)))
    s0, s1, s2 = vals[pos], vals[pos + 1], vals[pos + 2]
    l3 = np.full(tot3, 3, np.int64)

    short = np.nonzero((lens > 0) & (lens < 3))[0]
    ls = lens[short]
    o = starts[short]
    v0 = vals[o] if len(short) else np.empty(0, np.int64)
    v1 = np.zeros(len(short), np.int64)
    two = ls >= 2
    v1[two] = vals[o[two] + 1]
    vz = np.zeros(len(short), np.int64)

    return (np.concatenate([row3, short]),
            np.concatenate([l3, ls]),
            np.concatenate([s0, v0]),
            np.concatenate([s1, v1]),
            np.concatenate([s2, vz]))


def pair_jaccards_from_buffers(va, sa, la, vb, sb, lb,
                               n: int) -> np.ndarray:
    """Per-row exact Jaccard between the distinct shingle sets of the
    a-side and b-side list columns (flat-buffer form). One lexsort-dedup
    per side folded into a single sort over ``(row, side, shingle)``,
    then a second sort over ``(row, shingle)`` counts cross-side
    duplicates = intersection members."""
    ra, laa, a0, a1, a2 = _emit_shingles(va, sa, la)
    rb, lbb, b0, b1, b2 = _emit_shingles(vb, sb, lb)
    row = np.concatenate([ra, rb])
    side = np.concatenate([np.zeros(len(ra), np.int8),
                           np.ones(len(rb), np.int8)])
    L = np.concatenate([laa, lbb])
    x = np.concatenate([a0, b0])
    y = np.concatenate([a1, b1])
    z = np.concatenate([a2, b2])
    if len(row) == 0:
        return np.zeros(n, np.float64)
    # distinct per (row, side): sort, drop consecutive duplicates
    order = np.lexsort((z, y, x, L, side, row))
    row, side, L, x, y, z = (a[order] for a in (row, side, L, x, y, z))
    dup = np.zeros(len(row), bool)
    dup[1:] = ((row[1:] == row[:-1]) & (side[1:] == side[:-1])
               & (L[1:] == L[:-1]) & (x[1:] == x[:-1])
               & (y[1:] == y[:-1]) & (z[1:] == z[:-1]))
    row, side, L, x, y, z = (a[~dup] for a in (row, side, L, x, y, z))
    # already sorted by (row, shingle) *within* side groups; re-sort
    # ignoring side so cross-side equal shingles become adjacent
    order = np.lexsort((z, y, x, L, row))
    row, L, x, y, z = (a[order] for a in (row, L, x, y, z))
    inter_mask = np.zeros(len(row), bool)
    inter_mask[1:] = ((row[1:] == row[:-1]) & (L[1:] == L[:-1])
                      & (x[1:] == x[:-1]) & (y[1:] == y[:-1])
                      & (z[1:] == z[:-1]))
    inter = np.bincount(row[inter_mask], minlength=n).astype(np.float64)
    union = (np.bincount(row, minlength=n).astype(np.float64) - inter)
    out = np.zeros(n, np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out


def token_pair_jaccards(tok_a, tok_b) -> np.ndarray:
    """Exact shingle Jaccard per row between two ``list<int64>`` token
    columns — the vectorized twin of
    ``derived._token_shingles`` + set algebra."""
    t = pa.list_(pa.int64())
    va, sa, la = _list_buffers(tok_a, t)
    vb, sb, lb = _list_buffers(tok_b, t)
    return pair_jaccards_from_buffers(va, sa, la, vb, sb, lb, len(la))


#: the EXACT character class Python's ``str.split()`` (no argument)
#: splits on — every code point where ``str.isspace()`` is true. RE2's
#: ``\s`` covers only ASCII whitespace, and Arrow's utf8 whitespace is
#: the Unicode White_Space set; both differ from Python on the
#: information separators \x1c-\x1f (and \x85/NBSP for RE2), so a
#: ``\s+`` split silently diverges from the scalar ``shingle_set`` on
#:  such text. Built once, lazily (scanning the code space is ~200 ms).
_PY_WHITESPACE_CLASS: list[str] = []


def _py_split_pattern() -> str:
    if not _PY_WHITESPACE_CLASS:
        chars = "".join(
            chr(c) for c in range(0x110000) if chr(c).isspace())
        _PY_WHITESPACE_CLASS.append("[" + chars + "]+")
    return _PY_WHITESPACE_CLASS[0]


def _word_code_buffers(text_a, text_b):
    """Whitespace-split both text columns and integer-code the words
    over ONE shared batch vocabulary (``np.unique`` — exact, not a
    hash). Empty words from leading/trailing/duplicate whitespace are
    dropped to match ``str.split()``."""

    def _split(col):
        words = pc.split_pattern_regex(
            pc.cast(col, pa.string()), _py_split_pattern())
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = off[1:] - off[:-1]
        valid = pc.is_valid(words).to_numpy(zero_copy_only=False)
        lens = np.where(valid, lens, 0)
        vals = words.values
        wlen = (pc.binary_length(vals).to_numpy(zero_copy_only=False)
                if len(vals) else np.empty(0, np.int64))
        keep = wlen > 0
        kept_before = np.zeros(len(keep) + 1, np.int64)
        np.cumsum(keep, out=kept_before[1:])
        starts = kept_before[off[:-1]]
        lens = kept_before[off[:-1] + lens] - starts
        flat = (vals.to_numpy(zero_copy_only=False)[keep]
                if len(vals) else np.empty(0, object))
        return flat, starts, lens

    fa, sa, la = _split(text_a)
    fb, sb, lb = _split(text_b)
    both = np.concatenate([fa, fb]) if len(fa) + len(fb) else \
        np.empty(0, object)
    codes = (np.unique(both, return_inverse=True)[1].astype(np.int64)
             if len(both) else np.empty(0, np.int64))
    return codes[:len(fa)], sa, la, codes[len(fa):], sb, lb


def text_pair_jaccards(text_a, text_b) -> np.ndarray:
    """Exact word-3-shingle Jaccard per row between two string columns —
    the vectorized twin of ``dedup.exact_jaccard``."""
    va, sa, la, vb, sb, lb = _word_code_buffers(text_a, text_b)
    return pair_jaccards_from_buffers(va, sa, la, vb, sb, lb, len(la))
