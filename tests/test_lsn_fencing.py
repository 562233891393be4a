"""LSN-monotone fencing across compactions.

A compacted snapshot row keeps only its ``last_lsn``, so an event at or
below the compaction ceiling cannot be LWW-ordered against absorbed writes
(a sub-ceiling update with a disjoint column mask would silently lose where
a full replay applies it).  Real WAL/binlog tails are LSN-monotone; the
engine enforces that contract at apply time instead of diverging silently.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures


def _fixture(tmp_path, n_rows=120, n_events=600, n_epochs=3, seed=23):
    root = str(tmp_path / "in")
    fixtures.write_fixture(
        root, n_rows=n_rows, n_events=n_events, n_epochs=n_epochs, seed=seed
    )
    return root


def _epoch_dir(root, e):
    return os.path.join(root, "binlog", f"epoch={e}")


def _lower_one_lsn(src_dir: str, dst_dir: str, new_lsn: int) -> None:
    """Copy an epoch's binlog, rewriting the first event's lsn to new_lsn."""
    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(src_dir) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        t = pq.read_table(os.path.join(src_dir, f))
        if i == 0:
            lsns = t["lsn"].to_pylist()
            lsns[0] = new_lsn
            t = t.set_column(
                t.schema.get_field_index("lsn"), "lsn", pa.array(lsns, pa.int64())
            )
        pq.write_table(t, os.path.join(dst_dir, f))


def test_late_event_below_ceiling_rejected(ray_session, tmp_path):
    root = _fixture(tmp_path)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(root, "base"))
    e0 = rp.apply_epoch(0, _epoch_dir(root, 0))
    rp.compact(up_to_epoch=0)
    assert rp.manifest.ceiling_lsn() == e0["max_lsn"]

    late_dir = str(tmp_path / "late_epoch1")
    _lower_one_lsn(_epoch_dir(root, 1), late_dir, new_lsn=1)
    with pytest.raises(ValueError, match="compaction ceiling"):
        rp.apply_epoch(1, late_dir)
    # the rejected epoch must not have been committed
    assert rp.manifest.committed_epochs() == [0]


def test_monotone_epoch_after_compaction_accepted(ray_session, tmp_path):
    root = _fixture(tmp_path)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, _epoch_dir(root, 0))
    rp.compact(up_to_epoch=0)
    entry = rp.apply_epoch(1, _epoch_dir(root, 1))
    assert entry["min_lsn"] > rp.manifest.ceiling_lsn() or entry["rows"] == 0
    # state still readable and epoch committed
    assert rp.manifest.committed_epochs() == [0, 1]
    assert rp.read_state().count() > 0


def test_reapply_committed_epoch_after_compaction_is_fenced_noop(
    ray_session, tmp_path
):
    """Re-delivering an ALREADY-COMMITTED epoch whose lsns sit below the
    ceiling must stay an idempotent no-op (epoch fencing short-circuits
    before the monotonicity guard)."""
    root = _fixture(tmp_path)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, _epoch_dir(root, 0))
    rp.apply_epoch(1, _epoch_dir(root, 1))
    rp.compact(up_to_epoch=1)
    again = rp.apply_epoch(0, _epoch_dir(root, 0))  # no raise
    assert again == rp.manifest.epoch_entry(0)


def test_interleaved_lsns_fine_without_compaction(ray_session, tmp_path):
    """Before any compaction, merge-on-read folds ALL deltas sorted by lsn —
    out-of-order epoch application (lsn ranges interleaved across epochs)
    must produce the same state as in-order application."""
    root = _fixture(tmp_path)
    cfg = ReplayConfig(num_partitions=4)

    a = Replayer(str(tmp_path / "ta"), cfg, base_path=os.path.join(root, "base"))
    a.apply_epoch(0, _epoch_dir(root, 0))
    a.apply_epoch(1, _epoch_dir(root, 1))

    b = Replayer(str(tmp_path / "tb"), cfg, base_path=os.path.join(root, "base"))
    b.apply_epoch(1, _epoch_dir(root, 1))  # later lsns first
    b.apply_epoch(0, _epoch_dir(root, 0))

    sa = sorted(a.read_state().take_all(), key=lambda r: r["doc_id"])
    sb = sorted(b.read_state().take_all(), key=lambda r: r["doc_id"])
    assert len(sa) == len(sb)
    for x, y in zip(sa, sb):
        assert x["doc_id"] == y["doc_id"]
        assert list(x["tokens"] or []) == list(y["tokens"] or [])
        assert x["last_lsn"] == y["last_lsn"]


def test_ceiling_advances_across_compactions(ray_session, tmp_path):
    root = _fixture(tmp_path)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(root, "base"))
    e0 = rp.apply_epoch(0, _epoch_dir(root, 0))
    rp.compact(up_to_epoch=0)
    c0 = rp.manifest.ceiling_lsn()
    e1 = rp.apply_epoch(1, _epoch_dir(root, 1))
    rp.compact(up_to_epoch=1)
    c1 = rp.manifest.ceiling_lsn()
    assert c0 == e0["max_lsn"]
    assert c1 == max(e0["max_lsn"], e1["max_lsn"])
    assert c1 >= c0
