"""LSN-level time travel: ``read_state(up_to_lsn=L)`` returns the state
as of an exact log position (mid-epoch point-in-time read)."""

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
    root = str(tmp_path_factory.mktemp("tt_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=900, n_epochs=N_EPOCHS, seed=51)
    return root


def _events(fixture_dir):
    evs = []
    for e in range(N_EPOCHS):
        d = os.path.join(fixture_dir, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            evs += pq.read_table(os.path.join(d, f)).to_pylist()
    return evs


def _base(fixture_dir):
    return pq.read_table(os.path.join(fixture_dir, "base")).to_pylist()


def _rows_equal(eng, oracle_rows):
    oracle_rows = sorted(oracle_rows, key=lambda r: r["doc_id"])
    eng = sorted(eng, key=lambda r: r["doc_id"])
    assert len(eng) == len(oracle_rows)
    for a, b in zip(eng, oracle_rows):
        for k in set(a) | set(b):
            va, vb = a.get(k), b.get(k)
            if k == "tokens":
                va = list(va) if va is not None else None
                vb = list(vb) if vb is not None else None
            assert va == vb, (a.get("doc_id"), k)


@pytest.mark.parametrize("salts", [1, 2])
def test_read_state_at_lsn_cuts(ray_session, fixture_dir, tmp_path, salts):
    cfg = ReplayConfig(num_partitions=8, num_salts=salts)
    root = str(tmp_path / f"t{salts}")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    evs = _events(fixture_dir)
    base = _base(fixture_dir)
    max_lsn = max(e["lsn"] for e in evs)
    for cut in [max_lsn // 5, max_lsn // 2, max_lsn - 7, max_lsn]:
        eng = rp.read_state(up_to_lsn=cut).take_all()
        o = oracle.replay([dict(r) for r in base],
                          [dict(e) for e in evs if e["lsn"] <= cut], cfg)
        _rows_equal(eng, o["final"])


def test_lsn_cut_composes_with_epoch_cut(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "t")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    evs = _events(fixture_dir)
    e1_max = rp.manifest.epoch_entry(1)["max_lsn"]
    cut = e1_max + 10 ** 9  # lsn cut above epoch 1; epoch cut should bind
    eng = rp.read_state(up_to_epoch=1, up_to_lsn=cut).take_all()
    o = oracle.replay(_base(fixture_dir),
                      [dict(e) for e in evs if e["lsn"] <= e1_max], cfg)
    _rows_equal(eng, o["final"])


def test_lsn_below_compaction_ceiling_raises(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "t")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    rp.apply_epoch(1, os.path.join(fixture_dir, "binlog", "epoch=1"))
    rp.compact()
    ceiling = rp.manifest.ceiling_lsn()
    with pytest.raises(ValueError, match="ceiling"):
        rp.read_state(up_to_lsn=ceiling - 1).take_all()
    # at the ceiling is fine (state == full state so far)
    eng = rp.read_state(up_to_lsn=ceiling).take_all()
    evs = [e for e in _events(fixture_dir) if e["lsn"] <= ceiling]
    o = oracle.replay(_base(fixture_dir), evs, cfg)
    _rows_equal(eng, o["final"])


def test_tags_name_epoch_cuts(ray_session, fixture_dir, tmp_path):
    """Tags are names for epoch-level time travel: read_state(tag=) ==
    read_state(up_to_epoch=); duplicate names refuse without replace;
    compaction past a tag makes it unreadable; rollback drops it."""
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "tagged")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    rp.apply_epoch(0, os.path.join(fixture_dir, "binlog", "epoch=0"))
    assert rp.tag("v1") == 0                      # defaults to latest epoch
    rp.apply_epoch(1, os.path.join(fixture_dir, "binlog", "epoch=1"))
    rp.apply_epoch(2, os.path.join(fixture_dir, "binlog", "epoch=2"))
    rp.tag("v2", epoch=1)
    assert rp.tags() == {"v1": 0, "v2": 1}

    tagged = sorted(rp.read_state(tag="v2").take_all(),
                    key=lambda r: r["doc_id"])
    direct = sorted(rp.read_state(up_to_epoch=1).take_all(),
                    key=lambda r: r["doc_id"])
    assert tagged == direct

    with pytest.raises(ValueError):
        rp.tag("v2", epoch=2)                     # exists, no replace
    assert rp.tag("v2", epoch=2, replace=True) == 2
    with pytest.raises(ValueError):
        rp.tag("v9", epoch=77)                    # not committed
    with pytest.raises(ValueError):
        rp.read_state(tag="v1", up_to_epoch=1)    # exclusive params
    with pytest.raises(KeyError):
        rp.read_state(tag="missing")

    # a second Replayer over the same root sees the tags (manifest-backed)
    rp2 = Replayer(root, cfg)
    assert rp2.tags()["v1"] == 0

    # compaction past the tagged epoch: the tag's read now raises (a tag
    # is a name, not a retention pin)
    rp.compact()
    with pytest.raises(ValueError):
        rp.read_state(tag="v1").take_all()

    rp.delete_tag("v1")
    assert "v1" not in rp.tags()


def test_rollback_drops_dangling_tags(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "rb")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    rp.tag("keep", epoch=0)
    rp.tag("gone", epoch=2)
    rp.rollback(to_epoch=0)
    assert rp.tags() == {"keep": 0}


def test_respect_tags_compaction_and_fsck(ray_session, fixture_dir, tmp_path):
    """compact(respect_tags=True) never passes a tag; fsck flags a tag
    stranded below the floor and in-doubt txn intents."""
    cfg = ReplayConfig(num_partitions=8)
    root = str(tmp_path / "pin")
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    rp.tag("pin", epoch=1)

    rp.compact(respect_tags=True)          # capped at epoch 1
    assert rp.manifest.last_compacted_epoch() == 1
    assert rp.read_state(tag="pin").count() > 0   # still readable
    assert rp.fsck()["ok"]

    rp.compact()                            # default: tags are NOT pins
    assert rp.manifest.last_compacted_epoch() == N_EPOCHS - 1
    bad = rp.fsck()
    assert not bad["ok"]
    assert any("tag 'pin'" in p for p in bad["problems"])
    rp.delete_tag("pin")
    assert rp.fsck()["ok"]

    # an in-doubt txn intent is surfaced too
    os.makedirs(os.path.join(root, "_txn"), exist_ok=True)
    with open(os.path.join(root, "_txn", "abc.json"), "w") as f:
        f.write("{}")
    probs = rp.fsck()["problems"]
    assert any("in-doubt txn intent" in p for p in probs)


def test_lookup_projection_resolves_as_of_cut(ray_session, tmp_path):
    """Code-review r5: lookup(up_to_lsn=L, columns=[...]) must validate
    the projection against the AS-OF schema, not head — a pre-rename
    display name is valid at a pre-rename cut."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.pipelines.replay import Replayer

    base = pa.table({
        "doc_id": pa.array(["1000001", "1000002"]),
        "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1], pa.int32()),
        "source": pa.array(["web", "books"]),
    })
    bdir = str(tmp_path / "base")
    os.makedirs(bdir)
    pq.write_table(base, os.path.join(bdir, "part-0.parquet"))
    ev = pa.table({
        "lsn": pa.array([5, 10], pa.int64()),
        "epoch": pa.array([0, 0], pa.int32()),
        "op": pa.array(["update", "schema_change"]),
        "doc_id": pa.array(["1000001", None]),
        "tokens": pa.array([[7, 7], None], pa.list_(pa.int32())),
        "n_tok": pa.array([2, None], pa.int32()),
        "source": pa.array(["web", None]),
        "column_mask": pa.array([[], None], pa.list_(pa.string())),
        "match_score": pa.array([100, None], pa.int32()),
        "title": pa.array([None, None], pa.string()),
        "match_title": pa.array([None, None], pa.string()),
        "extra_json": pa.array([None, None], pa.string()),
        "schema_kind": pa.array([None, "rename_column"]),
        "schema_name": pa.array([None, "source"]),
        "schema_new_name": pa.array([None, "origin"]),
    })
    edir = str(tmp_path / "binlog")
    os.makedirs(edir)
    pq.write_table(ev, os.path.join(edir, "part-0.parquet"))
    rp = Replayer(str(tmp_path / "t"), ReplayConfig(num_partitions=2),
                  base_path=bdir)
    rp.apply_epoch(0, edir)
    # head schema: 'source' is renamed to 'origin'
    head = rp.lookup(["1000001"], columns=["doc_id", "origin"]).take_all()
    assert head and head[0]["origin"] == "web"
    # pre-rename cut: the OLD display name must resolve
    got = rp.lookup(["1000001"], up_to_lsn=9,
                    columns=["doc_id", "source"]).take_all()
    assert got and got[0]["source"] == "web"
