"""Epoch rollback (log truncation): drop committed epochs above a
boundary, heal the delta dirs, guard the compaction floor / delta
segments, and let re-applied epochs carry NEW data (no resurrection)."""

import os

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.pipelines.views import SourceCountsView
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rb_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=1200, n_epochs=N_EPOCHS,
                           seed=31, schema_change_frac=0.02)
    return root


def _replay(root, fixture_dir, cfg, epochs=N_EPOCHS):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(epochs):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _norm(rows):
    return sorted(
        (
            {k: (list(v) if k == "tokens" and v is not None else v)
             for k, v in r.items()}
            for r in rows
        ),
        key=lambda r: r["doc_id"],
    )


def test_rollback_truncates_state_and_schema(ray_session, tmp_path, fixture_dir):
    """After rollback(to_epoch=0): state, schema and metrics equal a fresh
    replay of epoch 0 alone; the dropped delta dirs are gone."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "full"), fixture_dir, cfg)
    want_rp = _replay(str(tmp_path / "e0only"), fixture_dir, cfg, epochs=1)

    res = rp.rollback(0)
    assert res["dropped_epochs"] == [1, 2]
    for e in (1, 2):
        assert not os.path.exists(
            os.path.join(str(tmp_path / "full"), "deltas", f"epoch={e}")
        )
    assert rp.manifest.committed_epochs() == [0]
    assert rp.manifest.rollback_pending() == []
    got = _norm(rp.read_state().take_all())
    want = _norm(want_rp.read_state().take_all())
    assert rp.read_state().schema().names == want_rp.read_state().schema().names
    assert got == want
    # dropped epochs' DDL is gone from the manifest
    ops = rp.manifest.state["schema_ops"]
    assert all(o["epoch"] == 0 for o in ops)


def test_reapplied_epoch_carries_new_data(ray_session, tmp_path, fixture_dir):
    """Re-applying a rolled-back epoch number with DIFFERENT binlog data
    must reflect the new data — never resurrect the dropped files."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=2)
    before = _norm(rp.read_state(up_to_epoch=0).take_all())
    rp.rollback(0)

    # a replacement epoch 1: re-use epoch 2's binlog files as "fixed" data
    alt = os.path.join(fixture_dir, "binlog", "epoch=2")
    rp2 = Replayer(str(tmp_path / "t"), cfg)
    rp2.apply_epoch(1, alt)
    # equal to an independent table built from epoch0 + alt data as epoch 1
    want_rp = Replayer(str(tmp_path / "w"), cfg,
                       base_path=os.path.join(fixture_dir, "base"))
    want_rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    want_rp.apply_epoch(1, alt)
    got = _norm(rp2.read_state().take_all())
    want = _norm(want_rp.read_state().take_all())
    assert got == want
    assert got != before  # the new epoch actually changed something


def test_rollback_guards(ray_session, tmp_path, fixture_dir):
    """Below the compaction floor or across a straddling delta segment the
    rollback refuses; at a segment edge it succeeds."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    rp.compact(up_to_epoch=0)
    with pytest.raises(ValueError, match="compacted"):
        rp.rollback(-1)
    rp.compact_deltas(1, 2)
    with pytest.raises(ValueError, match="segment"):
        rp.rollback(1)
    res = rp.rollback(2)  # segment edge: no-op truncation, nothing above 2
    assert res["dropped_epochs"] == []
    # dropping the WHOLE segment is allowed
    rp2 = _replay(str(tmp_path / "s"), fixture_dir, cfg)
    rp2.compact_deltas(1, 2)
    seg_dir = rp2.manifest.delta_segments()[0]["dir"]
    res = rp2.rollback(0)
    assert res["dropped_epochs"] == [1, 2]
    assert rp2.manifest.delta_segments() == []
    assert not os.path.exists(seg_dir)
    got = _norm(rp2.read_state().take_all())
    want_rp = _replay(str(tmp_path / "w"), fixture_dir, cfg, epochs=1)
    assert got == _norm(want_rp.read_state().take_all())


def test_view_full_rebuild_after_rollback(ray_session, tmp_path, fixture_dir):
    """A view based above the new head detects its vanished base epoch and
    falls back to a FULL rebuild matching a from-scratch aggregate."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    view = SourceCountsView(str(tmp_path / "view"), rp)
    view.refresh()
    assert view.last_epoch() == N_EPOCHS - 1
    rp.rollback(0)
    res = view.refresh()
    assert res["mode"] == "full" and res["epoch"] == 0
    fresh = SourceCountsView(str(tmp_path / "view2"), rp)
    fresh.refresh()
    assert view.read().equals(fresh.read())


def test_fsck_detects_missing_and_tampered_files(ray_session, tmp_path, fixture_dir):
    """fsck: clean table passes; a deleted delta file and a truncated
    lineage count are both reported; vacuumed below-floor dirs are NOT
    false positives."""
    import glob
    import shutil

    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    res = rp.fsck()
    assert res["ok"], res["problems"]
    assert res["checks"] > 0
    res_deep = rp.fsck(deep=True)
    assert res_deep["ok"], res_deep["problems"]

    # legitimate vacuum must not trip it
    rp.compact(up_to_epoch=0)
    rp.vacuum(retain_audit=False)
    res = rp.fsck()
    assert res["ok"], res["problems"]

    # delete one delta file of a live epoch → reported
    victim = sorted(glob.glob(os.path.join(
        str(tmp_path / "t"), "deltas", "epoch=2", "**", "*.parquet"),
        recursive=True))[0]
    os.unlink(victim)
    res = rp.fsck()
    assert not res["ok"]
    assert any("rows on disk" in p or "files missing" in p
               for p in res["problems"]), res["problems"]

    # missing whole epoch dir → reported
    shutil.rmtree(os.path.join(str(tmp_path / "t"), "deltas", "epoch=1"))
    res = rp.fsck()
    assert any("delta dir missing" in p or "files missing" in p
               for p in res["problems"]), res["problems"]
