"""Fuzzy title matching + Jaccard similarity (reference M13/M15).

The reference gates field replacement on ``fuzz.token_sort_ratio`` between the
incoming record's title and the authority title (``fuzzy_match.py:50-52``,
``utils.py:238-241``) and logs a word-set Jaccard alongside
(``utils.py:244-254``). We reproduce both:

- ``token_sort_ratio``: normalize (reference M7) → split → sort tokens →
  SequenceMatcher ratio × 100, rounded to int (fuzzywuzzy's pure-Python
  fallback behavior; deterministic, no external deps).
- ``jaccard``: stop-word-stripped word sets, |A∩B| / |A∪B| (0.0 on empty
  union).

These run in the audit path and the fixture generator (content-driven
scores at tiny scale); the hot replay path consumes precomputed
``match_score`` columns and never calls per-row Python.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_PUNCT = re.compile(r"[.,/#!$%^&*;:{}\[\]=\-_`~()]")
_WS = re.compile(r"\s+")
_STOP = frozenset({"the", "of", "a", "an", "p", "n"})


def normalize_title(s: str) -> str:
    """Scalar twin of ``functions.text.normalize_titles`` (reference M7)."""
    return _WS.sub(" ", _PUNCT.sub(" ", s)).strip()


def token_sort_ratio(a: str, b: str) -> int:
    """0-100 similarity after token sorting (reference M13)."""
    ta = " ".join(sorted(normalize_title(a).lower().split()))
    tb = " ".join(sorted(normalize_title(b).lower().split()))
    if not ta and not tb:
        return 100
    return int(round(100 * SequenceMatcher(None, ta, tb).ratio()))


def jaccard(a: str, b: str) -> float:
    """Stop-word-stripped word-set Jaccard (reference M15, ``utils.py:244-254``)."""
    wa = {w for w in normalize_title(a).lower().split() if w not in _STOP}
    wb = {w for w in normalize_title(b).lower().split() if w not in _STOP}
    union = wa | wb
    if not union:
        return 0.0
    return len(wa & wb) / len(union)
