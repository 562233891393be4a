"""Zero-copy table clone: hardlinked data + rewritten manifest.

Contract under test (replay.py Replayer.clone):
- clone state == source state (rows, tokens, schema) at clone time;
- divergent writes: an epoch applied to the clone never shows in the
  source and vice versa;
- independence: vacuum / rollback on the source cannot invalidate the
  clone (hardlinks keep inodes alive);
- guards: non-empty destination, destination inside source refused;
- CLI `clone` round-trips.
"""

import json
import os
import subprocess
import sys

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clone_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=1200, n_epochs=N_EPOCHS,
                           seed=47, schema_change_frac=0.02)
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


def test_clone_state_equal_and_divergent_writes(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = _replay(str(tmp_path / "src"), fixture_dir, cfg, epochs=2)
    info = src.clone(str(tmp_path / "dst"))
    assert info["files_linked"] > 0
    assert info["epochs"] == [0, 1]

    dst = Replayer(str(tmp_path / "dst"))  # adopts the cloned layout
    assert dst.cfg.num_partitions == 4
    want = _norm(src.read_state().take_all())
    got = _norm(dst.read_state().take_all())
    assert got == want

    # divergence: epoch 2 applied to the clone only
    dst.apply_epoch(2, os.path.join(fixture_dir, "binlog", "epoch=2"))
    assert src.manifest.committed_epochs() == [0, 1]
    assert dst.manifest.committed_epochs() == [0, 1, 2]
    # source state unchanged; clone now equals a fresh 3-epoch replay
    assert _norm(src.read_state().take_all()) == want
    ref3 = _replay(str(tmp_path / "ref3"), fixture_dir, cfg, epochs=3)
    assert _norm(dst.read_state().take_all()) == _norm(ref3.read_state().take_all())
    # and the reverse direction: source appends don't show in the clone
    src.apply_epoch(2, os.path.join(fixture_dir, "binlog", "epoch=2"))
    assert dst.manifest.committed_epochs() == [0, 1, 2]


def test_clone_survives_source_vacuum_and_rollback(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = _replay(str(tmp_path / "src"), fixture_dir, cfg)
    want = _norm(src.read_state().take_all())
    src.clone(str(tmp_path / "dst"))

    # mutilate the source: drop its newest epochs, then compact + vacuum
    # what's left — the clone's hardlinked files must keep every byte alive
    src.rollback(0)
    src.compact(up_to_epoch=0)
    src.vacuum(retain_audit=False)

    dst = Replayer(str(tmp_path / "dst"))
    assert _norm(dst.read_state().take_all()) == want
    fsck = dst.fsck()
    assert fsck["ok"], fsck["problems"]


def test_clone_of_compacted_table(ray_session, tmp_path, fixture_dir):
    """Clone after compaction + vacuum: the rewritten base-snapshot path
    (an under-root compaction artifact) must resolve inside the clone."""
    cfg = ReplayConfig(num_partitions=4)
    src = _replay(str(tmp_path / "src"), fixture_dir, cfg)
    src.compact(up_to_epoch=N_EPOCHS - 1)
    src.vacuum(retain_audit=False)
    want = _norm(src.read_state().take_all())

    src.clone(str(tmp_path / "dst"))
    dst = Replayer(str(tmp_path / "dst"))
    assert _norm(dst.read_state().take_all()) == want
    assert dst.fsck()["ok"]


def test_clone_guards(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = _replay(str(tmp_path / "src"), fixture_dir, cfg, epochs=1)
    # destination inside the source root
    with pytest.raises(ValueError, match="outside the source root"):
        src.clone(os.path.join(str(tmp_path / "src"), "sub"))
    # non-empty destination
    busy = tmp_path / "busy"
    busy.mkdir()
    (busy / "x").write_text("occupied")
    with pytest.raises(ValueError, match="not empty"):
        src.clone(str(busy))


def test_clone_cli(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = _replay(str(tmp_path / "src"), fixture_dir, cfg, epochs=1)
    want = _norm(src.read_state().take_all())
    out = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "clone",
         "--table", str(tmp_path / "src"), "--dest", str(tmp_path / "dst")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["files_linked"] > 0
    dst = Replayer(str(tmp_path / "dst"))
    assert _norm(dst.read_state().take_all()) == want


def test_orphans_report(ray_session, tmp_path, fixture_dir):
    """orphans(): a healthy table reports none; planted junk (a stray
    file, a fake CAS-loser snapshot, a staged-uncommitted epoch dir) is
    classified and sized; referenced state is never listed."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=2)
    rep = rp.orphans()
    assert rep["orphans"] == [] and rep["staged_epochs"] == []

    root = str(tmp_path / "t")
    # stray top-level file + unreferenced snapshot dir + staged epoch dir
    with open(os.path.join(root, "junk.bin"), "wb") as f:
        f.write(b"x" * 100)
    os.makedirs(os.path.join(root, "base-compact-deadbeef"))
    with open(os.path.join(root, "base-compact-deadbeef", "p.parquet"), "wb") as f:
        f.write(b"y" * 50)
    os.makedirs(os.path.join(root, "deltas", "epoch=9"))

    rep = rp.orphans()
    assert "junk.bin" in rep["orphans"]
    assert "base-compact-deadbeef" in rep["orphans"]
    assert rep["staged_epochs"] == [os.path.join("deltas", "epoch=9")]
    assert rep["bytes"] == 150
    # committed epoch dirs are referenced, never orphans
    assert not any("epoch=0" in o or "epoch=1" in o for o in rep["orphans"])
    # orphans are informational: fsck stays green
    assert rp.fsck()["ok"]
