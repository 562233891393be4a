"""Replication loop: snapshot export → restore → payload change feed →
apply_change_feed brings the replica to the source's state.

This is the Delta-CDF → MERGE downstream-sync pattern, closed end-to-end
inside the engine: the replica runs at a DIFFERENT partition layout and
never sees the source's binlog — only the export artifacts.
"""

import os

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("repl_fixture"))
    fixtures.write_fixture(root, n_rows=130, n_events=1000, n_epochs=N_EPOCHS,
                           seed=61, invalid_key_frac=0.0,
                           schema_change_frac=0.0)
    return root


def _payload_rows(rp, **kw):
    rows = rp.read_state(**kw).take_all()
    return sorted(
        (
            (r["doc_id"], list(r["tokens"] or []), r["n_tok"], r["source"])
            for r in rows
        ),
    )


def test_feed_payload_schema(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    feed = src.changes_between(0, 1, with_payload=True)
    names = feed.schema().names
    assert "tokens_after" in names
    rows = feed.take_all()
    assert rows
    for r in rows:
        if r["change"] == "delete":
            assert r["tokens_after"] is None
        else:
            assert r["tokens_after"] is not None
            assert len(r["tokens_after"]) == r["n_tok_after"]
    # the default feed stays token-free
    assert "tokens_after" not in src.changes_between(0, 1).schema().names


def test_export_restore_feed_apply_round_trip(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        src.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))

    # replica: restored from the epoch-0 snapshot, different layout
    exp = str(tmp_path / "exp0")
    src.export_snapshot(exp, up_to_epoch=0)
    rep = Replayer(str(tmp_path / "replica"), ReplayConfig(num_partitions=7),
                   base_path=exp)
    assert _payload_rows(rep) == _payload_rows(src, up_to_epoch=0)

    # CDC egress with payload, shipped as files (the only artifact the
    # replica consumes), then applied
    feed_dir = str(tmp_path / "feed")
    info = src.export_changes(feed_dir, 0, N_EPOCHS - 1, with_payload=True)
    assert info["n_changes"] > 0
    res = rep.apply_change_feed(feed_dir, epoch=0)
    assert res["epochs"] == [0, 1]

    assert _payload_rows(rep) == _payload_rows(src)


def test_apply_change_feed_requires_payload(ray_session, tmp_path, fixture_dir):
    cfg = ReplayConfig(num_partitions=4)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    scalar_feed = src.changes_between(0, 1)  # no payload
    rep = Replayer(str(tmp_path / "replica"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    with pytest.raises(ValueError, match="tokens_after"):
        rep.apply_change_feed(scalar_feed, epoch=50)


def test_apply_change_feed_idempotent(ray_session, tmp_path, fixture_dir):
    """Re-applying the same feed at the same epochs is a no-op (merge
    rides apply_epoch's exactly-once fencing)."""
    cfg = ReplayConfig(num_partitions=4)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    exp = str(tmp_path / "exp0")
    src.export_snapshot(exp, up_to_epoch=0)
    rep = Replayer(str(tmp_path / "replica"), ReplayConfig(num_partitions=3),
                   base_path=exp)
    feed = src.changes_between(0, 1, with_payload=True).take_all()
    import pyarrow as pa

    tbl = pa.Table.from_pylist(feed, schema=pa.schema([
        ("doc_id", pa.string()), ("change", pa.string()),
        ("last_lsn_before", pa.int64()), ("last_lsn_after", pa.int64()),
        ("n_tok_before", pa.int64()), ("source_before", pa.string()),
        ("status_before", pa.string()), ("n_tok_after", pa.int64()),
        ("source_after", pa.string()), ("status_after", pa.string()),
        ("tokens_after", pa.list_(pa.int32())),
    ]))
    rep.apply_change_feed(tbl, epoch=0)
    want = _payload_rows(rep)
    rep.apply_change_feed(tbl, epoch=0)  # identical second apply
    assert _payload_rows(rep) == want
    assert _payload_rows(rep) == _payload_rows(src, up_to_epoch=1)


def test_export_changes_flavor_guard(ray_session, tmp_path, fixture_dir):
    """A dest holding a scalar feed refuses a --with-payload re-export
    (the marker records the flavor), instead of silently returning the
    payload-less artifact."""
    cfg = ReplayConfig(num_partitions=4)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    dest = str(tmp_path / "feed")
    info = src.export_changes(dest, 0, 1)  # scalar
    assert info["with_payload"] is False
    # same flavor: idempotent no-op
    assert src.export_changes(dest, 0, 1) == info
    with pytest.raises(ValueError, match="scalar"):
        src.export_changes(dest, 0, 1, with_payload=True)
