"""Predicate deletes through the replay path (``Replayer.delete_where``).

Tombstones are emitted as a real fenced epoch, so they carry audit /
metrics / change-feed lineage; unmaterialized local-id rows are skipped
and counted (a tombstone addressing them would fold to nothing)."""

import os

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

from tests.test_local_addressing import _events_table, _write_epoch, _keyless_inserts


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delw_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=600, n_epochs=2, seed=41,
                           schema_change_frac=0.0)
    return root


def _rows(rp):
    return sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])


def test_delete_where_sql_predicate(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    before = _rows(rp)
    victims = {r["doc_id"] for r in before if r["source"] == "web"}
    assert victims  # fixture always has some
    m_before = rp.fold_metrics()

    res = rp.delete_where("source = 'web'", epoch=2)
    assert res["delete_events"] == len(victims)
    after = _rows(rp)
    assert {r["doc_id"] for r in after} == {r["doc_id"] for r in before} - victims
    # survivors untouched (exact token-array equality)
    surv = {r["doc_id"]: r for r in before if r["doc_id"] not in victims}
    for r in after:
        b = surv[r["doc_id"]]
        assert list(r["tokens"] or []) == list(b["tokens"] or [])
        assert (r["n_tok"], r["source"], r["status"]) == (b["n_tok"], b["source"], b["status"])
    # tombstone lineage shows up in run metrics
    m_after = rp.fold_metrics()
    assert m_after["tombstoned"] == m_before["tombstoned"] + len(victims)
    # exactly-once: re-running the same epoch is a no-op
    again = rp.delete_where("source = 'web'", epoch=2)
    assert rp.manifest.committed_epochs().count(2) == 1
    assert {r["doc_id"] for r in _rows(rp)} == {r["doc_id"] for r in after}
    # audit rows exist for the tombstone epoch
    audit = rp.audit_dataset(2).take_all()
    assert len(audit) == len(victims)
    assert all(a["status"] == "tombstone" for a in audit)


def test_delete_where_callable_predicate(ray_session, fixture_dir, tmp_path):
    import pyarrow.compute as pc

    cfg = ReplayConfig(num_partitions=8)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    before = _rows(rp)
    small = {r["doc_id"] for r in before
             if r["n_tok"] is not None and r["n_tok"] < 40}
    res = rp.delete_where(
        lambda t: pc.less(pc.fill_null(t["n_tok"], 10 ** 9), 40), epoch=1
    )
    assert res["delete_events"] == len(small)
    assert {r["doc_id"] for r in _rows(rp)} == {r["doc_id"] for r in before} - small


def test_delete_where_skips_unmaterialized_locals(ray_session, tmp_path):
    base_dir = str(tmp_path / "b")
    os.makedirs(base_dir)
    pq.write_table(fixtures.make_base_table(n_rows=10, seed=2),
                   os.path.join(base_dir, "base.parquet"))
    root = str(tmp_path / "t")
    rp = Replayer(root, ReplayConfig(num_partitions=4), base_path=base_dir)
    rp.apply_epoch(0, _write_epoch(root, 0, _keyless_inserts(5, 0, 1)))

    res = rp.delete_where("source = 'src-local'", epoch=1)
    assert res["delete_events"] == 0
    assert res["delete_skipped_unmaterialized"] == 5
    locals_ = [r for r in _rows(rp) if r["doc_id"].startswith("LOCAL-")]
    assert len(locals_) == 5  # survived: not yet addressable

    rp.compact()  # materialize
    res2 = rp.delete_where("source = 'src-local'", epoch=2)
    assert res2["delete_events"] == 5
    assert res2["delete_skipped_unmaterialized"] == 0
    assert not [r for r in _rows(rp) if r["doc_id"].startswith("LOCAL-")]


def test_delete_where_no_matches(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    before = _rows(rp)
    res = rp.delete_where("source = 'no-such-source'", epoch=1)
    assert res["delete_events"] == 0
    assert {r["doc_id"] for r in _rows(rp)} == {r["doc_id"] for r in before}
    assert rp.fsck()["ok"]


def test_delete_where_sparse_buckets_unique_lsns(ray_session, tmp_path):
    """Regression: with far more partitions than occupied hash buckets the
    tombstone lsn stride must be the LOGICAL partition count — a stride of
    len(refs) lets two partitions mint the same lsn, and the fold's
    duplicate-delivery absorption then silently drops one delete."""
    import pyarrow as pa

    base_dir = str(tmp_path / "b")
    os.makedirs(base_dir)
    n = 40
    pq.write_table(
        pa.table({
            "doc_id": pa.array([str(i + 1) for i in range(n)], pa.string()),
            "tokens": pa.array([[i] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["s"] * n, pa.string()),
        }),
        os.path.join(base_dir, "base.parquet"),
    )
    rp = Replayer(str(tmp_path / "t"), ReplayConfig(num_partitions=64),
                  base_path=base_dir)
    res = rp.delete_where(lambda t: [True] * t.num_rows, epoch=0)
    assert res["delete_events"] == n
    assert rp.read_state().count() == 0
    # every tombstone carried a distinct lsn
    import glob
    lsns = []
    for f in glob.glob(str(tmp_path / "t") + "/deltas/epoch=0/**/*.parquet",
                       recursive=True):
        lsns += pq.read_table(f, columns=["lsn"])["lsn"].to_pylist()
    assert len(lsns) == n and len(set(lsns)) == n
