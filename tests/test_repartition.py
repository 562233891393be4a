"""Partition evolution: ``Replayer.repartition`` (see SEMANTICS.md).

The new layout must be invisible to semantics: state identical across
the rewrite, post-repartition epochs fold to the same final state as an
un-repartitioned full replay (oracle-checked), local ids stay
addressable (embedded partition mod new count), metrics and allocator
offsets carry forward, fsck stays green.
"""

import os

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("repart_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=900, n_epochs=N_EPOCHS,
                           seed=31, invalid_key_frac=0.06)
    return root


def _oracle_final(fixture_dir, cfg, n_epochs=N_EPOCHS):
    base = pq.read_table(os.path.join(fixture_dir, "base")).to_pylist()
    events = []
    for e in range(n_epochs):
        d = os.path.join(fixture_dir, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            events += pq.read_table(os.path.join(d, f)).to_pylist()
    return oracle.replay(base, events, cfg)


def _rows(rp):
    return sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])


def _assert_same(eng, oracle_rows):
    """Same comparison as test_replay_e2e.rows_equal."""
    oracle_rows = sorted(oracle_rows, key=lambda r: r["doc_id"])
    assert len(eng) == len(oracle_rows)
    for a, b in zip(eng, oracle_rows):
        for k in set(a) | set(b):
            va, vb = a.get(k), b.get(k)
            if k == "tokens":
                va = list(va) if va is not None else None
                vb = list(vb) if vb is not None else None
            assert va == vb, (a.get("doc_id"), k)


def test_repartition_preserves_state_and_metrics(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "t")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    before = _rows(rp)
    m_before = rp.fold_metrics()

    rp.repartition(16)
    assert rp.cfg.num_partitions == 16
    after = _rows(rp)
    assert [r["doc_id"] for r in before] == [r["doc_id"] for r in after]
    for a, b in zip(before, after):
        for k in set(a) | set(b):
            va, vb = a.get(k), b.get(k)
            if k == "tokens":
                va = list(va) if va is not None else None
                vb = list(vb) if vb is not None else None
            assert va == vb, (a["doc_id"], k)
    m_after = rp.fold_metrics()
    assert m_after["routes"] == m_before["routes"]
    assert m_after["col_replacements"] == m_before["col_replacements"]
    assert rp.fsck()["ok"], rp.fsck()["problems"]

    # shrink below embedded local partitions: ids stay addressable
    rp.repartition(3)
    shrunk = _rows(rp)
    assert [r["doc_id"] for r in shrunk] == [r["doc_id"] for r in before]
    lids = [r["doc_id"] for r in shrunk if r["doc_id"].startswith("LOCAL-")]
    if lids:
        got = rp.lookup(lids).take_all()
        assert {r["doc_id"] for r in got} == set(lids)
    assert rp.fsck()["ok"]


@pytest.fixture(scope="module")
def nolocal_fixture(tmp_path_factory):
    """No keyless inserts: local-id allocation is partition-dependent by
    design (ids embed the allocating partition), so the one-shot oracle at
    the ORIGINAL partition count is only comparable without allocations.
    Allocator behavior across a repartition is covered separately below."""
    root = str(tmp_path_factory.mktemp("repart_nolocal"))
    fixtures.write_fixture(root, n_rows=150, n_events=900, n_epochs=N_EPOCHS,
                           seed=32, invalid_key_frac=0.0)
    return root


def test_epochs_after_repartition_match_oracle(ray_session, nolocal_fixture, tmp_path):
    """Replay epochs 0-1 at P=8, repartition to P=16 (and a salted variant),
    replay epoch 2 at the new layout → final state == one-shot oracle."""
    for new_layout in [(16, None), (4, 2)]:
        cfg = ReplayConfig(num_partitions=8)
        root = str(tmp_path / f"t{new_layout[0]}_{new_layout[1]}")
        rp = Replayer(root, cfg, base_path=os.path.join(nolocal_fixture, "base"))
        for e in range(2):
            rp.apply_epoch(e, os.path.join(nolocal_fixture, "binlog", f"epoch={e}"))
        rp.repartition(*new_layout)
        rp.apply_epoch(2, os.path.join(nolocal_fixture, "binlog", "epoch=2"))
        o = _oracle_final(nolocal_fixture, cfg)
        _assert_same(_rows(rp), o["final"])


def test_allocator_continuity_across_repartition(ray_session, tmp_path):
    """Keyless inserts after a repartition must never re-issue an existing
    local id (offsets carry forward BY PART NUMBER)."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    def _epoch(root, epoch, events):
        from tests.test_local_addressing import _events_table

        d = os.path.join(root, "binlog", f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        pq2.write_table(_events_table(events), os.path.join(d, "f.parquet"))
        return d

    def _keyless(n, epoch, lsn0, tag):
        return [
            {"lsn": lsn0 + i, "epoch": epoch, "op": "insert",
             "doc_id": f"junk-{tag}-{i}", "tokens": [i], "n_tok": 1,
             "source": tag, "match_score": 0}
            for i in range(n)
        ]

    base_root = str(tmp_path / "b")
    os.makedirs(base_root)
    pq2.write_table(fixtures.make_base_table(n_rows=20, seed=9),
                    os.path.join(base_root, "base.parquet"))
    root = str(tmp_path / "t")
    rp = Replayer(root, ReplayConfig(num_partitions=8), base_path=base_root)
    rp.apply_epoch(0, _epoch(root, 0, _keyless(10, 0, 1, "a")))
    rp.repartition(4)
    rp.apply_epoch(1, _epoch(root, 1, _keyless(10, 1, 100, "b")))
    ids = [r["doc_id"] for r in _rows(rp) if r["doc_id"].startswith("LOCAL-")]
    assert len(ids) == 20
    assert len(set(ids)) == 20  # no re-issued id
    # and every one of them is addressable at the new layout
    got = rp.lookup(ids).take_all()
    assert {r["doc_id"] for r in got} == set(ids)


def test_open_adopts_committed_layout(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "t")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    rp.repartition(12)
    # cfg-less open adopts the evolved layout
    rp2 = Replayer(root)
    assert rp2.cfg.num_partitions == 12
    # an explicit stale layout still refuses (immutability guard intact)
    with pytest.raises(ValueError, match="immutable"):
        Replayer(root, ReplayConfig(num_partitions=8))


def test_repartition_refuses_concurrent_epoch(ray_session, fixture_dir, tmp_path):
    """An epoch committed (by 'another writer') between the fold and the
    layout flip must fail the commit, not strand old-layout deltas."""
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "t")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    # simulate the race at the manifest layer: the fold ran through epoch
    # 0 but epoch 1 lands before record_repartition
    rp.apply_epoch(1, os.path.join(fixture_dir, "binlog", "epoch=1"))
    with pytest.raises(ValueError, match="committed since"):
        rp.manifest.record_repartition(
            0, str(tmp_path / "phantom"), {}, None, -1, 16, 1
        )
