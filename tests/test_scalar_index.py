"""ScalarIndexView: incrementally-maintained secondary index on a scalar
state column, maintained from the TOKEN-FREE change feed.

Invariants:
* full build == (value, doc_id) pairs recomputed from ``read_state``;
* incremental refresh (insert/update/delete mix) == a fresh full rebuild
  at the same epoch, bit-for-bit — int (range-binned) and string
  (hash-bucketed) columns;
* ``docs_in_range`` / ``docs_where_eq`` == scalar filters over the state,
  and range reads touch only the overlapping bins;
* a compaction below the view's base epoch forces a full rebuild;
* meta (column / bin_width) is sticky across reopen; bad columns raise.
"""

import os

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.pipelines.views import ScalarIndexView
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    # no DDL: the index binds to the PHYSICAL feed column names
    # (source/n_tok/...); a rename changes the PUBLIC state name only, so
    # comparing against read_state needs the un-renamed schema
    root = str(tmp_path_factory.mktemp("si_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=900, n_epochs=N_EPOCHS,
                           seed=61, schema_change_frac=0.0)
    return root


def _replay(root, fixture_dir, cfg, epochs=N_EPOCHS):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(epochs):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _expected_pairs(rp, column, up_to_epoch=None):
    out = []
    for r in rp.read_state(up_to_epoch=up_to_epoch).take_all():
        if r[column] is not None:
            out.append((r[column], r["doc_id"]))
    return sorted(out)


def _view_pairs(v):
    t = v.read()
    return sorted(zip(t["value"].to_pylist(), t["doc_id"].to_pylist()))


def test_full_build_int(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = ScalarIndexView(str(tmp_path / "v"), rp, column="n_tok", bin_width=8)
    assert v.refresh(to_epoch=0)["mode"] == "full"
    assert _view_pairs(v) == _expected_pairs(rp, "n_tok", up_to_epoch=0)


@pytest.mark.parametrize("column", ["n_tok", "source"])
def test_incremental_equals_full(ray_session, fixture_dir, tmp_path, column):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    v = ScalarIndexView(str(tmp_path / "v"), rp, column=column, bin_width=8)
    assert v.refresh(to_epoch=0)["mode"] == "full"
    for e in range(1, N_EPOCHS):
        assert v.refresh(to_epoch=e)["mode"] == "incremental"
        fresh = ScalarIndexView(str(tmp_path / f"f{e}"), rp, column=column,
                                bin_width=8)
        fresh.refresh(to_epoch=e)
        assert _view_pairs(v) == _view_pairs(fresh)
        assert _view_pairs(v) == _expected_pairs(rp, column, up_to_epoch=e)
    # the feed must exercise updates AND deletes, not just inserts
    kinds = {r["change"]
             for r in rp.changes_between(0, N_EPOCHS - 1).take_all()}
    assert {"update", "delete"} <= kinds
    assert v.refresh(to_epoch=N_EPOCHS - 1)["mode"] == "noop"


def test_range_and_eq_queries(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    v = ScalarIndexView(str(tmp_path / "v"), rp, column="n_tok", bin_width=8)
    v.refresh()
    state = [(r["n_tok"], r["doc_id"])
             for r in rp.read_state().take_all() if r["n_tok"] is not None]
    vals = sorted(x for x, _ in state)
    lo, hi = vals[len(vals) // 4], vals[3 * len(vals) // 4]
    want = sorted((x, d) for x, d in state if lo <= x <= hi)
    assert v.docs_in_range(lo, hi) == want
    assert v.docs_in_range(hi, lo - 1) == []  # empty range
    some_val = vals[len(vals) // 2]
    assert v.docs_where_eq(some_val) == sorted(
        d for x, d in state if x == some_val)
    assert v.docs_where_eq(max(vals) + 999) == []
    # string index equality
    vs = ScalarIndexView(str(tmp_path / "vs"), rp, column="source")
    vs.refresh()
    srcs = [(r["source"], r["doc_id"]) for r in rp.read_state().take_all()
            if r["source"] is not None]
    a_src = srcs[0][0]
    assert vs.docs_where_eq(a_src) == sorted(
        d for s, d in srcs if s == a_src)
    with pytest.raises(ValueError, match="integer"):
        vs.docs_in_range(0, 1)


def test_compaction_forces_full_rebuild(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg)
    v = ScalarIndexView(str(tmp_path / "v"), rp, column="n_tok", bin_width=8)
    v.refresh(to_epoch=0)
    rp.compact(up_to_epoch=1)
    r = v.refresh(to_epoch=N_EPOCHS - 1)
    assert r["mode"] == "full"
    assert _view_pairs(v) == _expected_pairs(rp, "n_tok")


def test_meta_sticky_and_validation(ray_session, fixture_dir, tmp_path):
    """Omitted args adopt the stored META; an explicit mismatch raises
    (e.g. --column source against an n_tok index must not silently
    refresh/query the n_tok index); an explicit match reopens fine."""
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = ScalarIndexView(str(tmp_path / "v"), rp, column="n_tok", bin_width=4)
    v.refresh(to_epoch=0)
    reopened = ScalarIndexView(str(tmp_path / "v"), rp)  # omitted → stored
    assert reopened.column == "n_tok" and reopened.bin_width == 4
    assert _view_pairs(reopened) == _expected_pairs(rp, "n_tok", up_to_epoch=0)
    same = ScalarIndexView(str(tmp_path / "v"), rp, column="n_tok",
                           bin_width=4)
    assert same.bin_width == 4
    with pytest.raises(ValueError, match="built with column='n_tok'"):
        ScalarIndexView(str(tmp_path / "v"), rp, column="source")
    with pytest.raises(ValueError, match="built with bin_width=4"):
        ScalarIndexView(str(tmp_path / "v"), rp, bin_width=99)
    with pytest.raises(ValueError, match="not indexable"):
        ScalarIndexView(str(tmp_path / "bad"), rp, column="tokens")
