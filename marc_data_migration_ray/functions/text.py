"""Vectorized text kernels: title normalization, token counting, quality
scoring, language-ID heuristic, fingerprinting.

Title normalization reproduces reference ``__normalize_title``
(``utils.py:155-173``): punctuation → space, collapse whitespace, trim.
Stop-word removal reproduces ``__remove_stop_words`` (``utils.py:176-178``).

Every regex here is RE2-compatible and shared verbatim with the DuckDB
oracle SQL in ``__ray_entry__`` (DuckDB also uses RE2), so Ray and oracle
compute byte-identical results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: reference punctuation class (``utils.py:160``), RE2-safe.
PUNCT_RE = r"[.,/#!$%^&*;:{}\[\]=\-_`~()]"
#: whitespace-token pattern for token counting.
TOKEN_RE = r"\S+"
#: GPT-2-style BPE pre-tokenization pattern (contractions, letter runs,
#: number runs, punctuation runs) — RE2-compatible, shared with the DuckDB
#: oracle verbatim.
BPE_TOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+"
#: reference stop-word list for Jaccard (``utils.py:176-178``).
STOPWORDS = ("the", "of", "a", "an", "p", "n")
STOPWORD_RE = r"\b(the|of|a|an|p|n)\b"

#: language marker lexicons for the n-gram/stopword language-ID heuristic.
#: Order matters: ties break to the earlier language.
LANG_MARKERS = (
    ("en", r"\b(the|and|of|to|in|is)\b"),
    ("es", r"\b(el|los|las|una|que|de)\b"),
    ("fr", r"\b(le|les|des|une|est|et)\b"),
    ("de", r"\b(der|die|das|und|ist|ein)\b"),
)


def normalize_titles(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Reference M7: punctuation→space, collapse spaces, trim."""
    s = pc.cast(texts, pa.string())
    s = pc.replace_substring_regex(s, PUNCT_RE, " ")
    s = pc.replace_substring_regex(s, r"\s+", " ")
    return pc.utf8_trim_whitespace(s)


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per string (int64)."""
    return pc.count_substring_regex(pc.cast(texts, pa.string()), TOKEN_RE)


def bpe_token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish pre-tokenizer token count per string (int64)."""
    return pc.count_substring_regex(pc.cast(texts, pa.string()), BPE_TOKEN_RE)


def stopword_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Count of reference stop-word tokens per string (int64)."""
    return pc.count_substring_regex(pc.cast(texts, pa.string()), STOPWORD_RE)


def quality_columns(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Quality-scoring columns for a text column.

    Returns ``n_chars``, ``n_tokens``, ``n_stop``, ``stop_ratio``
    (n_stop/n_tokens, 0.0 when empty), ``is_quality``
    (n_tokens >= 5 AND stop_ratio < 0.5). All SQL-expressible.
    """
    s = pc.cast(texts, pa.string())
    n_chars = pc.utf8_length(s)
    n_tokens = pc.count_substring_regex(s, TOKEN_RE)
    n_stop = pc.count_substring_regex(s, STOPWORD_RE)
    denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom, pa.float64()))
    is_quality = pc.and_(
        pc.greater_equal(n_tokens, 5), pc.less(stop_ratio, 0.5)
    )
    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": n_tokens,
        "n_stop": n_stop,
        "stop_ratio": stop_ratio,
        "is_quality": is_quality,
    }


def lang_id(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Stopword-marker language-ID heuristic.

    For each language in ``LANG_MARKERS`` count marker-token hits; the
    argmax wins (earlier language wins ties); all-zero → ``'und'``.
    """
    s = pc.cast(texts, pa.string())
    counts = np.stack(
        [
            pc.count_substring_regex(s, rx).to_numpy(zero_copy_only=False)
            for _, rx in LANG_MARKERS
        ]
    )  # shape (L, n)
    best = counts.argmax(axis=0)  # first max wins ties (np argmax semantics)
    langs = np.array([lang for lang, _ in LANG_MARKERS], dtype=object)
    out = langs[best]
    out[counts.max(axis=0) == 0] = "und"
    return pa.array(out, pa.string())


def fingerprints(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """64-bit FNV-1a content fingerprint of each string (uint64→int64 view).

    Deterministic document fingerprint for exact-dup detection and lineage;
    computed vectorized over the Arrow UTF-8 buffer (no per-row Python).
    """
    from marc_data_migration_ray.functions.keys import _fnv1a_numpy

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    h = _fnv1a_numpy(pc.cast(texts, pa.string()))
    return pa.array(h.view(np.int64), pa.int64())
