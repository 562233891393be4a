"""Unit tests for the vectorized kernels (SURVEY §5 plan items 2)."""

import numpy as np
import pyarrow as pa

from marc_data_migration_ray import oracle
from marc_data_migration_ray.functions import fuzzy, keys, text


class TestNormalizeKeys:
    CASES = [
        ("12345", "12345"),
        ("(OCoLC)12345", "12345"),
        ("(ocolc)ocm12345", "12345"),
        ("(OCOLC)OCN12345", "12345"),
        ("ocn12345", "12345"),
        ("ocm777", "777"),
        ("ON888", "888"),
        ("  (OCoLC)on999  ", "999"),
        ("12345 99", "12345"),          # trailing \W+\d+ junk stripped (M3)
        ("12345-67", "12345"),
        ("badkey42x", None),            # not a digit string
        ("", None),
        ("ocnx12", None),               # prefix strip leaves non-digits
        (None, None),
    ]

    def test_vectorized_matches_spec(self):
        raw = pa.array([c[0] for c in self.CASES], pa.string())
        out = keys.normalize_keys(raw).to_pylist()
        assert out == [c[1] for c in self.CASES]

    def test_oracle_scalar_twin_agrees(self):
        for raw, want in self.CASES:
            assert oracle.normalize_key(raw) == want, raw


class TestHashPartition:
    def test_matches_pure_python_fnv(self):
        vals = ["1000001", "999", "LOCAL-0003-101", "x" * 50, ""]
        arr = pa.array(vals, pa.string())
        got = keys.hash_partition(arr, 32).to_pylist()
        want = [oracle.fnv1a64(v) % 32 for v in vals]
        assert got == want

    def test_null_goes_to_partition_zero(self):
        arr = pa.array([None, "abc"], pa.string())
        assert keys.hash_partition(arr, 8)[0].as_py() == 0

    def test_spread(self):
        arr = pa.array([str(i) for i in range(10_000)], pa.string())
        parts = np.array(keys.hash_partition(arr, 32).to_pylist())
        counts = np.bincount(parts, minlength=32)
        assert counts.min() > 200  # roughly uniform


class TestTextKernels:
    def test_normalize_titles(self):
        arr = pa.array(["A.,title-with_punct!  and   spaces ", "plain"], pa.string())
        out = text.normalize_titles(arr).to_pylist()
        assert out == ["A title with punct and spaces", "plain"]

    def test_token_and_stopword_counts(self):
        arr = pa.array(["the cat of a hat", "", "one two"], pa.string())
        assert text.token_counts(arr).to_pylist() == [5, 0, 2]
        assert text.stopword_counts(arr).to_pylist() == [3, 0, 0]

    def test_quality_columns(self):
        cols = text.quality_columns(pa.array(["the of a an p n", "good long document text here"]))
        assert cols["is_quality"].to_pylist() == [False, True]

    def test_lang_id(self):
        arr = pa.array(["the cat and the dog", "el que de los", "xyz qqq", "der und das ist"])
        assert text.lang_id(arr).to_pylist() == ["en", "es", "und", "de"]

    def test_fingerprints_match_scalar_fnv(self):
        vals = ["doc one", "doc two", ""]
        got = text.fingerprints(pa.array(vals)).to_pylist()
        want = [np.uint64(oracle.fnv1a64(v)).astype(np.int64) for v in vals]
        assert got == [int(w) for w in want]


class TestFuzzy:
    def test_token_sort_ratio_perfect(self):
        assert fuzzy.token_sort_ratio("The Great Title", "great the title") == 100

    def test_token_sort_ratio_orders(self):
        a = fuzzy.token_sort_ratio("alpha beta", "alpha beta gamma")
        b = fuzzy.token_sort_ratio("alpha beta", "completely different")
        assert 0 <= b < a < 100

    def test_jaccard(self):
        assert fuzzy.jaccard("the cat hat", "cat hat") == 1.0  # 'the' is a stop word
        assert fuzzy.jaccard("cat", "dog") == 0.0
        assert fuzzy.jaccard("", "") == 0.0


def test_fuzzy_001_gate_truth_table():
    """Reference do_fuzzy_001_test branch (record_update.py:395-410):
    unprefixed+below-threshold rejected; prefixed applied even below."""
    import numpy as np
    import pyarrow as pa

    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.stages.parse import ParseRoute

    cfg = ReplayConfig(num_partitions=4, fuzzy_threshold=50, fuzzy_001_test=True)
    n = 5
    batch = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "epoch": pa.array([0] * n, pa.int32()),
            "op": pa.array(["update"] * n, pa.string()),
            # prefixed: ocm/label forms; unprefixed: bare digits
            "doc_id": pa.array(["ocm11", "(OCoLC)12", "13", "14", "ocn15"]),
            "tokens": pa.array([[1]] * n, pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["s"] * n, pa.string()),
            "column_mask": pa.array([[]] * n, pa.list_(pa.string())),
            #           prefixed-low  prefixed-high  bare-low  bare-high  prefixed-perfect
            "match_score": pa.array([30, 80, 30, 80, 100], pa.int32()),
        }
    )
    out = ParseRoute(cfg)(batch)
    assert out["route"].to_pylist() == ["fuzzy", "fuzzy", "rejected", "fuzzy", "applied"]
    assert out["status"].to_pylist() == [
        "fuzzy-match-failed", "fuzzy-match-passed", "fuzzy-match-failed",
        "fuzzy-match-passed", "perfect",
    ]


def test_kmv_merge_is_split_invariant():
    """KMV partial-merge property: the k smallest distinct hashes computed
    from any batch split equal the single-pass result, and the estimator
    lands within the ~2/sqrt(k) relative-error band on a known cardinality."""
    import numpy as np

    from marc_data_migration_ray.pipelines.tpch import KMV_K, KMV_MOD, _kmv_partial_fn

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5000, size=20000)  # ~4930 distinct
    t = pa.table({"l_orderkey": pa.array(keys, pa.int64())})

    one = _kmv_partial_fn("l_orderkey")(t)["hv"].to_pylist()

    merged: set = set()
    p = _kmv_partial_fn("l_orderkey")
    for lo in range(0, t.num_rows, 777):
        merged.update(p(t.slice(lo, 777))["hv"].to_pylist())
    merged_lo = sorted(merged)[:KMV_K]
    assert merged_lo == sorted(one)[:KMV_K]

    exact = len(np.unique(keys))
    est = (KMV_K - 1) * float(KMV_MOD) / merged_lo[-1]
    assert abs(est - exact) / exact < 2.5 / (KMV_K ** 0.5)
