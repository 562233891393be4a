"""Fold (vectorized, no Ray) vs pure-Python oracle across configurations.

The invariant per BASELINE.json input_hint: exact per-row token-array
equality between engine and oracle final states.
"""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.stages.fold import fold_bucket
from marc_data_migration_ray.stages.parse import ParseRoute, PrepBase


def run_engine(base: pa.Table, binlog: pa.Table, cfg: ReplayConfig):
    parsed = pa.concat_tables([PrepBase(cfg)(base), ParseRoute(cfg)(binlog)])
    out = fold_bucket(parsed, cfg)
    rows = out.filter(pc.equal(out["_kind"], "row")).select(
        ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status", "candidate_key"]
    )
    metrics = [
        json.loads(s)
        for s in out.filter(pc.equal(out["_kind"], "metrics"))["metrics_json"].to_pylist()
    ]
    return rows, metrics


def assert_equal_states(rows: pa.Table, ofinal: list[dict]):
    eng = sorted(rows.to_pylist(), key=lambda r: r["doc_id"])
    assert len(eng) == len(ofinal)
    for a, b in zip(eng, ofinal):
        assert a["doc_id"] == b["doc_id"]
        ta = list(a["tokens"]) if a["tokens"] is not None else None
        tb = list(b["tokens"]) if b["tokens"] is not None else None
        assert ta == tb, a["doc_id"]  # the token-equality invariant
        for k in ("n_tok", "source", "last_lsn", "status", "candidate_key"):
            assert a[k] == b[k], (a["doc_id"], k)


CONFIGS = [
    ReplayConfig(num_partitions=8),
    ReplayConfig(num_partitions=8, require_perfect=True),
    ReplayConfig(num_partitions=8, strategy="replace_only"),
    ReplayConfig(num_partitions=8, fuzzy_threshold=80),
    ReplayConfig(num_partitions=1),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"p{c.num_partitions}-{c.strategy}-perf{c.require_perfect}-t{c.fuzzy_threshold}")
def test_fold_matches_oracle(cfg):
    base = fixtures.make_base_table(n_rows=250, seed=3)
    binlog = fixtures.make_binlog(
        n_events=1500, n_base_rows=250, seed=5, schema_change_frac=0.0
    )
    o = oracle.replay(base.to_pylist(), binlog.to_pylist(), cfg)
    rows, metrics = run_engine(base, binlog, cfg)
    assert_equal_states(rows, o["final"])
    agg = {
        "noop": sum(m["noop"] for m in metrics),
        "tombstoned": sum(m["tombstoned"] for m in metrics),
        "local": sum(m["local"] for m in metrics),
    }
    assert agg["noop"] == o["metrics"].get("noop", 0)
    assert agg["tombstoned"] == o["metrics"]["tombstoned"]
    assert agg["local"] == o["metrics"].get("local", 0)
    col = {}
    for m in metrics:
        for c, v in m["col_replacements"].items():
            col[c] = col.get(c, 0) + v
    assert col == dict(o["metrics"]["col_replacements"])


def test_fold_with_heavy_skew_and_dups():
    """Hot keys + duplicate base keys (reference R1/J2 exact-dedup analog)."""
    cfg = ReplayConfig(num_partitions=4)
    base = fixtures.make_base_table(n_rows=100, seed=9, dup_frac=0.2)
    binlog = fixtures.make_binlog(
        n_events=2000, n_base_rows=100, seed=13, hot_keys=2, hot_frac=0.6,
        schema_change_frac=0.0,
    )
    o = oracle.replay(base.to_pylist(), binlog.to_pylist(), cfg)
    rows, _ = run_engine(base, binlog, cfg)
    assert_equal_states(rows, o["final"])


def test_fold_empty_binlog():
    cfg = ReplayConfig(num_partitions=4)
    base = fixtures.make_base_table(n_rows=50, seed=1, dup_frac=0.0, noise_frac=0.0)
    binlog = fixtures.make_binlog(n_events=0, n_base_rows=50, seed=2)
    rows, _ = run_engine(base, binlog, cfg)
    assert rows.num_rows == 50
    assert set(rows["status"].to_pylist()) == {"base"}


def test_processed_invariant():
    """processed == sum of all route counts (reference record_update.py:262-268)."""
    cfg = ReplayConfig(num_partitions=8)
    base = fixtures.make_base_table(n_rows=250, seed=3)
    binlog = fixtures.make_binlog(n_events=1500, n_base_rows=250, seed=5)
    o = oracle.replay(base.to_pylist(), binlog.to_pylist(), cfg)
    m = o["metrics"]
    routes = [
        m.get(r, 0)
        for r in ("applied", "fuzzy", "rejected", "local", "noop", "deadletter", "schema")
    ]
    assert m["processed"] == sum(routes) == 1500


def test_fold_auto_split_bit_identical(ray_session, tmp_path):
    """A fat-bucket fold auto-splits by key hash inside the task
    (cfg.fold_split_bytes) with BIT-IDENTICAL results — state rows,
    local-id allocation (keyless rows all hash to sub-group 0) and
    summed fold metrics all match the unsplit fold."""
    import os

    from marc_data_migration_ray.pipelines.replay import Replayer

    root = str(tmp_path / "fx")
    fixtures.write_fixture(root, n_rows=300, n_events=2000, n_epochs=2,
                           seed=9)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(root, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(root, "binlog", f"epoch={e}"))
    plain = sorted(rp.read_state().take_all(),
                   key=lambda r: r["doc_id"])
    m_plain = rp.fold_metrics()

    # same table, split forced for every bucket (threshold 1 byte)
    rp_s = Replayer(str(tmp_path / "t"),
                    ReplayConfig(num_partitions=4, fold_split_bytes=1))
    split = sorted(rp_s.read_state().take_all(),
                   key=lambda r: r["doc_id"])
    m_split = rp_s.fold_metrics()
    assert split == plain
    # fold_splits is the engaged-split evidence marker (VERDICT r4 item
    # 7) — by design it differs: every bucket split under the 1-byte
    # threshold, none split on the plain config
    assert m_split.pop("fold_splits") == 4
    assert m_plain.pop("fold_splits") == 0
    assert m_split == m_plain
    # keyless allocation must have produced identical LOCAL- ids
    assert [r["doc_id"] for r in plain
            if r["doc_id"].startswith("LOCAL-")] == \
           [r["doc_id"] for r in split
            if r["doc_id"].startswith("LOCAL-")]


def test_fold_splits_counter_survives_compaction(ray_session, tmp_path):
    """Code-review r5: the cumulative metrics snapshot dropped
    fold_splits at every compaction, resetting the whole-run counter."""
    import os

    from marc_data_migration_ray.pipelines.replay import Replayer

    root = str(tmp_path / "fx")
    fixtures.write_fixture(root, n_rows=100, n_events=600, n_epochs=2,
                           seed=23)
    rp = Replayer(str(tmp_path / "t2"),
                  ReplayConfig(num_partitions=4, fold_split_bytes=1),
                  base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, os.path.join(root, "binlog", "epoch=0"))
    pre = rp.fold_metrics()["fold_splits"]
    assert pre == 4  # every bucket split under the 1-byte threshold
    rp.compact()
    rp.apply_epoch(1, os.path.join(root, "binlog", "epoch=1"))
    post = rp.fold_metrics()["fold_splits"]
    assert post >= pre, (pre, post)  # cumulative, not reset


def test_vacuum_reclaims_orphan_repart_snapshot(ray_session, tmp_path):
    """Code-review r5: vacuum's orphan sweep only matched base-compact-*
    — a crashed repartition's base-repart-* snapshot leaked forever."""
    import os

    from marc_data_migration_ray.pipelines.replay import Replayer

    root = str(tmp_path / "fx")
    fixtures.write_fixture(root, n_rows=60, n_events=200, n_epochs=1,
                           seed=3)
    rp = Replayer(str(tmp_path / "t"), ReplayConfig(num_partitions=2),
                  base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, os.path.join(root, "binlog", "epoch=0"))
    rp.compact()  # vacuum's snapshot sweep requires a compacted table
    orphan = os.path.join(rp.root, "base-repart-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("x")
    rp.vacuum()
    assert not os.path.exists(orphan)
