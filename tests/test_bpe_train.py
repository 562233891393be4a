"""bpe_train vs an independent scalar mirror.

The distributed path (per-batch word-count partials → groupby sum →
per-block top-V → driver merge loop) must produce exactly the merge
rules a single-process reference BPE trainer learns from the same text:
same pairs, same order, same counts (Sennrich et al. 2016 semantics,
tie-break = highest count then lexicographically smallest pair).
"""

import re
from collections import Counter

import pyarrow.parquet as pq

from marc_data_migration_ray.pipelines import text_analysis

SF_DIR = "/root/testdata/sf0.001"


def _scalar_bpe(texts, merges, vocab_words):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"\S+", t))
    kept = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_words]
    seqs = {w: list(w) for w, _ in kept}
    rules = []
    for _ in range(merges):
        pairs = Counter()
        for w, c in kept:
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        left, right = min(p for p, c in pairs.items() if c == best_n)
        rules.append((left, right, best_n))
        for w, _ in kept:
            s, i = seqs[w], 0
            while i < len(s) - 1:
                if s[i] == left and s[i + 1] == right:
                    s[i : i + 2] = [left + right]
                else:
                    i += 1
    return rules


def test_bpe_train_matches_scalar_mirror(ray_session):
    got = text_analysis.bpe_train(SF_DIR).to_pylist()
    texts = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    want = _scalar_bpe(
        texts, text_analysis.BPE_MERGES, text_analysis.BPE_WORD_V
    )
    assert len(got) == len(want) > 0
    for r, (left, right, n) in zip(got, want):
        assert (r["left"], r["right"], r["pair_count"]) == (left, right, n), r


def test_bpe_train_rules_are_usable(ray_session):
    """Rule-structure sanity: ranks are 1..k and every pair count is
    positive. (Counts need not be monotonically non-increasing — a merge
    creates new pairs that can outnumber later originals.)"""
    t = text_analysis.bpe_train(SF_DIR)
    ranks = t["rank"].to_pylist()
    assert ranks == list(range(1, len(ranks) + 1))
    assert all(c > 0 for c in t["pair_count"].to_pylist())
