"""MERGE INTO through the replay path (``Replayer.merge``).

The lakehouse upsert-from-table (Delta/Iceberg ``MERGE``): source rows
whose key exists live in the target become updates (or tombstones with
``when_matched='delete'``), unmatched rows become inserts — compiled into
a real fenced binlog epoch so merges inherit exactly-once commits, audit
rows, metrics, the change feed and time travel."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

from tests.test_local_addressing import _write_epoch, _keyless_inserts


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("merge_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=600, n_epochs=2, seed=43,
                           schema_change_frac=0.0)
    return root


def _rows(rp, **kw):
    return sorted(rp.read_state(**kw).take_all(), key=lambda r: r["doc_id"])


def _source_table(matched_ids, new_ids, tok0=5000):
    ids = list(matched_ids) + list(new_ids)
    return pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "tokens": pa.array([[tok0 + i, tok0 + i + 1] for i in range(len(ids))],
                           pa.list_(pa.int32())),
        "n_tok": pa.array([2] * len(ids), pa.int32()),
        "source": pa.array(["merge-src"] * len(ids), pa.string()),
    })


def _replayer(fixture_dir, tmp_path, n_epochs=2):
    rp = Replayer(str(tmp_path / "t"), ReplayConfig(num_partitions=8),
                  base_path=os.path.join(fixture_dir, "base"))
    for e in range(n_epochs):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def test_merge_update_insert(ray_session, fixture_dir, tmp_path):
    rp = _replayer(fixture_dir, tmp_path)
    before = _rows(rp)
    matched = [r["doc_id"] for r in before[:10]]
    new = [str(9_000_000 + i) for i in range(5)]
    src = _source_table(matched, new)

    res = rp.merge(src, epoch=2)
    assert res["merge_updated"] == 10
    assert res["merge_inserted"] == 5
    assert res["merge_deleted"] == 0
    assert res["merge_skipped_local"] == 0

    after = {r["doc_id"]: r for r in _rows(rp)}
    assert set(after) == {r["doc_id"] for r in before} | set(new)
    for i, d in enumerate(matched + new):
        assert list(after[d]["tokens"]) == [5000 + i, 5000 + i + 1]
        assert after[d]["source"] == "merge-src"
        assert after[d]["n_tok"] == 2
    # untouched rows keep exact payloads
    keep = {r["doc_id"]: r for r in before if r["doc_id"] not in matched}
    for d, b in keep.items():
        assert list(after[d]["tokens"] or []) == list(b["tokens"] or [])

    # exactly-once: re-running the committed epoch is a fenced no-op
    again = rp.merge(src, epoch=2)
    assert rp.manifest.committed_epochs().count(2) == 1
    assert {r["doc_id"] for r in _rows(rp)} == set(after)
    # merge rides the normal epoch machinery: audit + time travel + fsck
    assert rp.read_state(up_to_epoch=1).count() == len(before)
    assert rp.fsck()["ok"]


def test_merge_when_matched_delete(ray_session, fixture_dir, tmp_path):
    rp = _replayer(fixture_dir, tmp_path)
    before = _rows(rp)
    victims = [r["doc_id"] for r in before[:7]]
    new = ["9100001", "9100002"]
    res = rp.merge(_source_table(victims, new), epoch=2,
                   when_matched="delete")
    assert res["merge_deleted"] == 7
    assert res["merge_inserted"] == 2
    after_ids = {r["doc_id"] for r in _rows(rp)}
    assert after_ids == ({r["doc_id"] for r in before} - set(victims)) | set(new)


def test_merge_column_mask(ray_session, fixture_dir, tmp_path):
    rp = _replayer(fixture_dir, tmp_path, n_epochs=1)
    before = _rows(rp)
    matched = [r["doc_id"] for r in before[:6]]
    res = rp.merge(_source_table(matched, []), epoch=1,
                   column_mask=["source"], when_not_matched=None)
    assert res["merge_updated"] == 6
    after = {r["doc_id"]: r for r in _rows(rp)}
    lookup = {r["doc_id"]: r for r in before}
    for d in matched:
        assert after[d]["source"] == "merge-src"          # masked in
        assert list(after[d]["tokens"] or []) == list(lookup[d]["tokens"] or [])
        assert after[d]["n_tok"] == lookup[d]["n_tok"]    # masked out


def test_merge_duplicate_source_keys_raise(ray_session, fixture_dir, tmp_path):
    rp = _replayer(fixture_dir, tmp_path, n_epochs=1)
    d = _rows(rp)[0]["doc_id"]
    src = _source_table([d, d], [])
    with pytest.raises(Exception, match="duplicate doc_id"):
        rp.merge(src, epoch=1)
    # failed merge left no committed epoch
    assert 1 not in rp.manifest.committed_epochs()


def test_merge_from_parquet_and_dataset(ray_session, fixture_dir, tmp_path):
    import ray

    rp = _replayer(fixture_dir, tmp_path, n_epochs=1)
    before = _rows(rp)
    matched = [r["doc_id"] for r in before[:3]]
    src = _source_table(matched, ["9200001"])
    p = str(tmp_path / "src.parquet")
    pq.write_table(src, p)
    res = rp.merge(p, epoch=1)
    assert (res["merge_updated"], res["merge_inserted"]) == (3, 1)

    res2 = rp.merge(ray.data.from_arrow(_source_table([], ["9200002"])),
                    epoch=2)
    assert (res2["merge_updated"], res2["merge_inserted"]) == (0, 1)
    ids = {r["doc_id"] for r in _rows(rp)}
    assert {"9200001", "9200002"} <= ids


def test_merge_skips_local_id_keys(ray_session, tmp_path):
    """Local-id-format source keys: matched-but-unmaterialized and
    unmatched ones are skipped + counted (an update addressing an
    un-compacted local row folds to nothing; an unmatched one would squat
    the allocator's namespace). After a compaction materializes the rows,
    the same merge applies."""
    base_dir = str(tmp_path / "b")
    os.makedirs(base_dir)
    pq.write_table(fixtures.make_base_table(n_rows=10, seed=5),
                   os.path.join(base_dir, "base.parquet"))
    root = str(tmp_path / "t")
    rp = Replayer(root, ReplayConfig(num_partitions=4), base_path=base_dir)
    rp.apply_epoch(0, _write_epoch(root, 0, _keyless_inserts(4, 0, 1)))
    locals_ = sorted(r["doc_id"] for r in _rows(rp)
                     if r["doc_id"].startswith("LOCAL-"))
    assert len(locals_) == 4

    src = _source_table(locals_[:2], ["LOCAL-0003-9999"])
    res = rp.merge(src, epoch=1)
    assert res["merge_skipped_local"] == 3
    assert res["merge_updated"] == 0 and res["merge_inserted"] == 0

    rp.compact()  # materialize the allocated rows as anchors
    res2 = rp.merge(_source_table(locals_[:2], []), epoch=2)
    assert res2["merge_updated"] == 2
    assert res2["merge_skipped_local"] == 0
    after = {r["doc_id"]: r for r in _rows(rp)}
    for d in locals_[:2]:
        assert after[d]["source"] == "merge-src"


def test_merge_cli(fixture_dir, tmp_path):
    """Drive ``merge`` as a user would (subprocess owns its Ray session)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    table = str(tmp_path / "clitable")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "marc_data_migration_ray", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=240,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    run("apply", "--table", table, "--epoch", "0",
        "--binlog", os.path.join(fixture_dir, "binlog", "epoch=0"),
        "--base", os.path.join(fixture_dir, "base"), "--num-partitions", "4")
    src = _source_table(["1000000"], ["9300001"])
    p = str(tmp_path / "cli_src.parquet")
    pq.write_table(src, p)
    out = run("merge", "--table", table, "--source", p, "--epoch", "1",
              "--column-mask", "tokens,n_tok")
    res = json.loads(out.splitlines()[-1])
    # "1000000" updates if live after epoch 0, else inserts; "9300001"
    # always inserts — either way both source rows become events
    assert res["merge_updated"] + res["merge_inserted"] == 2


def test_merge_unnormalizable_keys_get_local_ids(ray_session, fixture_dir,
                                                 tmp_path):
    """Source keys that don't normalize flow through as keyless inserts and
    get an allocator-assigned local id — exactly like an upstream event
    with an invalid key (the reference P6 ``set_local_id`` analog)."""
    rp = _replayer(fixture_dir, tmp_path, n_epochs=1)
    before_ids = {r["doc_id"] for r in _rows(rp)}
    res = rp.merge(_source_table([], ["not a key!!"]), epoch=1)
    assert res["merge_inserted"] == 1
    after = {r["doc_id"]: r for r in _rows(rp)}
    new = set(after) - before_ids
    assert len(new) == 1
    row = after[new.pop()]
    assert row["doc_id"].startswith("LOCAL-")
    assert row["status"] == "local"
    assert row["source"] == "merge-src"
