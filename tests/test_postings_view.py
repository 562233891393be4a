"""PostingsView: incrementally-maintained inverted token index over a
Replayer table (set-valued view maintenance from the payload change feed —
+after-image tokens, -before-image tokens).

Invariants:
* full build == postings recomputed from ``read_state`` token arrays;
* incremental refresh (insert/update/delete mix) == a fresh full rebuild
  at the same epoch, bit-for-bit;
* ``docs_for_tokens`` AND/OR == scalar set algebra over the state;
* a compaction below the view's base epoch forces a full rebuild;
* ``n_buckets`` is sticky across reopen.
"""

import os

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.pipelines.views import PostingsView
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pv_fixture"))
    fixtures.write_fixture(root, n_rows=150, n_events=900, n_epochs=N_EPOCHS, seed=31)
    return root


def _replay(root, fixture_dir, cfg, epochs):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(epochs):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _expected_pairs(rp, up_to_epoch=None):
    """Recompute postings from the state: distinct (token, doc_id)."""
    out = set()
    for r in rp.read_state(up_to_epoch=up_to_epoch).take_all():
        for tok in set(r["tokens"] or []):
            out.add((int(tok), r["doc_id"]))
    return sorted(out)


def _view_pairs(v):
    t = v.read()
    return sorted(zip(t["token"].to_pylist(), t["doc_id"].to_pylist()))


def test_full_build_matches_state(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=8)
    r = v.refresh(to_epoch=0)
    assert r["mode"] == "full"
    assert _view_pairs(v) == _expected_pairs(rp, up_to_epoch=0)


def test_incremental_equals_full_rebuild(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=8)
    assert v.refresh(to_epoch=0)["mode"] == "full"
    for e in range(1, N_EPOCHS):
        assert v.refresh(to_epoch=e)["mode"] == "incremental"
        fresh = PostingsView(str(tmp_path / f"fresh{e}"), rp, n_buckets=8)
        fresh.refresh(to_epoch=e)
        assert _view_pairs(v) == _view_pairs(fresh)
        assert _view_pairs(v) == _expected_pairs(rp, up_to_epoch=e)
    # the mix must actually exercise deletes and updates, not just inserts
    feed = rp.changes_between(0, N_EPOCHS - 1).take_all()
    kinds = {r["change"] for r in feed}
    assert {"update", "delete"} <= kinds
    # noop re-refresh
    assert v.refresh(to_epoch=N_EPOCHS - 1)["mode"] == "noop"


def test_docs_for_tokens(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    docs = {
        r["doc_id"]: set(int(t) for t in (r["tokens"] or []))
        for r in rp.read_state().take_all()
    }
    # pick two tokens that co-occur somewhere and one absent token
    pairs = _expected_pairs(rp)
    t1 = pairs[0][0]
    t2 = next(tok for tok, d in pairs if tok != t1 and t1 in docs[d])
    missing_tok = max(tok for tok, _ in pairs) + 1
    want_and = sorted(d for d, ts in docs.items() if t1 in ts and t2 in ts)
    want_or = sorted(d for d, ts in docs.items() if t1 in ts or t2 in ts)
    assert v.docs_for_tokens([t1, t2], mode="and") == want_and
    assert v.docs_for_tokens([t1, t2], mode="or") == want_or
    assert v.docs_for_tokens([t1, missing_tok], mode="and") == []
    assert v.docs_for_tokens([], mode="or") == []
    with pytest.raises(ValueError, match="and.*or|mode"):
        v.docs_for_tokens([t1], mode="xor")


def test_compaction_forces_full_rebuild(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=4)
    v.refresh(to_epoch=0)
    rp.compact(up_to_epoch=1)  # floor rises above the view's base epoch
    r = v.refresh(to_epoch=N_EPOCHS - 1)
    assert r["mode"] == "full"
    assert _view_pairs(v) == _expected_pairs(rp)


def test_n_buckets_sticky(ray_session, fixture_dir, tmp_path):
    """Omitted args adopt the stored META; an explicit mismatch raises
    (silently maintaining a different index is a correctness trap);
    an explicit match reopens fine."""
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=4)
    v.refresh(to_epoch=0)
    reopened = PostingsView(str(tmp_path / "v"), rp)  # omitted → stored
    assert reopened.n_buckets == 4
    assert _view_pairs(reopened) == _expected_pairs(rp, up_to_epoch=0)
    same = PostingsView(str(tmp_path / "v"), rp, n_buckets=4)
    assert same.n_buckets == 4
    with pytest.raises(ValueError, match="built with n_buckets=4"):
        PostingsView(str(tmp_path / "v"), rp, n_buckets=32)


def test_vacuum_versions_and_stale_reader(ray_session, fixture_dir, tmp_path):
    """Every refresh leaves a version dir; vacuum keeps CURRENT (+retain)
    and clears crashed-refresh tmp dirs; hardlinked-forward bucket files
    survive removal of the version dir they were first written into."""
    import os
    import shutil

    from marc_data_migration_ray.pipelines.views import vacuum_view_versions

    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = PostingsView(str(tmp_path / "v"), rp, n_buckets=8)
    for e in range(N_EPOCHS):
        v.refresh(to_epoch=e)
    # crashed-refresh leftover
    os.makedirs(os.path.join(str(tmp_path / "v"), "_tmp_v99"))
    before = _view_pairs(v)
    rep = vacuum_view_versions(str(tmp_path / "v"), retain=0)
    assert rep["removed"] == N_EPOCHS - 1 and rep["tmp_removed"] == 1
    dirs = {d for d in os.listdir(str(tmp_path / "v")) if d.startswith("v")}
    assert dirs == {f"v{N_EPOCHS - 1}"}
    # the current version still reads fully (hardlinks keep shared files
    # alive even though their original version dirs are gone)
    assert _view_pairs(v) == before
    assert v.vacuum_versions()["removed"] == 0  # idempotent
