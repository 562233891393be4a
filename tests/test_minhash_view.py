"""MinHashIndexView: incrementally-maintained LSH near-dup index over a
Replayer table's token payloads.

Invariants:
* incremental refresh (signed deltas from the payload change feed) equals
  a fresh full rebuild at the same epoch, bit-for-bit, across epochs with
  inserts/updates/deletes;
* the stored signature entries equal a brute-force recompute from the
  current state's token arrays (so candidate generation loses nothing);
* a planted near-dup pair (one doc's tokens copied onto another) becomes
  a candidate pair after the epoch that creates it, and a tombstone
  retracts the dropped doc's entries;
* point probes (candidates_for_tokens) return exactly the docs sharing a
  signature with the probe.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.pipelines.views import MinHashIndexView
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mhv_fixture"))
    fixtures.write_fixture(root, n_rows=100, n_events=600, n_epochs=N_EPOCHS,
                           seed=71)
    return root


def _replay(root, fixture_dir, cfg, epochs):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(epochs):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _brute_sigs(rp, view) -> set:
    """(sig, doc_id) set recomputed from the CURRENT state payloads."""
    out = set()
    for b in rp.read_state().iter_batches(batch_format="pyarrow"):
        idx, sig = view._token_sigs(b["tokens"])
        ids = b["doc_id"].to_pylist()
        for i, s in zip(idx.tolist(), sig.tolist()):
            out.add((s, ids[i]))
    return out


def _stored_sigs(view) -> set:
    t = view.read()
    return set(zip(t["sig"].to_pylist(), t["doc_id"].to_pylist()))


def test_incremental_equals_rebuild(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fixture_dir, "base"))
    inc = MinHashIndexView(str(tmp_path / "inc"), rp, n_buckets=8)
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
        inc.refresh()
        full = MinHashIndexView(str(tmp_path / f"full{e}"), rp, n_buckets=8)
        full.refresh()
        assert _stored_sigs(inc) == _stored_sigs(full), f"epoch {e}"
        assert _stored_sigs(inc) == _brute_sigs(rp, inc), f"epoch {e}"


def test_planted_dup_and_tombstone(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    # two live docs with >= 3 tokens each
    state = {r["doc_id"]: list(r["tokens"] or [])
             for r in rp.read_state().take_all()}
    busy = [d for d, tk in sorted(state.items()) if len(tk) >= 3]
    a, b = busy[0], busy[1]
    # epoch 1: copy a's tokens onto b (plants an exact near-dup), then
    # epoch 2: tombstone b (must retract every entry)
    ref_schema = pq.read_schema(os.path.join(
        fixture_dir, "binlog", "epoch=0",
        sorted(os.listdir(os.path.join(fixture_dir, "binlog", "epoch=0")))[0]))

    def _ev_table(lsn, epoch, op, doc, tokens):
        n = len(tokens) if tokens is not None else 0
        row = {
            "lsn": lsn, "epoch": epoch, "op": op, "doc_id": doc,
            "tokens": tokens, "n_tok": (n if op != "delete" else None),
            "source": ("planted" if op != "delete" else None),
            "column_mask": [], "match_score": 100,
            "title": None, "match_title": None, "extra_json": None,
            "schema_kind": None, "schema_name": None,
            "schema_new_name": None,
        }
        return pa.Table.from_pylist(
            [{k: row.get(k) for k in ref_schema.names}], schema=ref_schema)

    base_lsn = 10_000
    d1 = str(tmp_path / "ep1")
    os.makedirs(d1)
    pq.write_table(_ev_table(base_lsn, 1, "update", b, state[a]),
                   os.path.join(d1, "part-0.parquet"))
    rp.apply_epoch(1, d1)
    v.refresh()
    pairs, dropped = v.candidate_pairs()
    lo, hi = min(a, b), max(a, b)
    assert (lo, hi) in pairs, "planted identical pair must be a candidate"
    assert _stored_sigs(v) == _brute_sigs(rp, v)

    d2 = str(tmp_path / "ep2")
    os.makedirs(d2)
    pq.write_table(_ev_table(base_lsn + 1, 2, "delete", b, None),
                   os.path.join(d2, "part-0.parquet"))
    rp.apply_epoch(2, d2)
    rep = v.refresh()
    assert rep["mode"] == "incremental"
    stored = _stored_sigs(v)
    assert not any(d == b for _, d in stored), "tombstone must retract"
    assert stored == _brute_sigs(rp, v)


def _plant_dup(rp, fixture_dir, tmp_path, epoch, a, b, state):
    """Apply an epoch copying a's tokens onto b (plants an exact dup)."""
    ref_schema = pq.read_schema(os.path.join(
        fixture_dir, "binlog", "epoch=0",
        sorted(os.listdir(os.path.join(fixture_dir, "binlog", "epoch=0")))[0]))
    row = {
        "lsn": 10_000, "epoch": epoch, "op": "update", "doc_id": b,
        "tokens": state[a], "n_tok": len(state[a]), "source": "planted",
        "column_mask": [], "match_score": 100,
        "title": None, "match_title": None, "extra_json": None,
        "schema_kind": None, "schema_name": None, "schema_new_name": None,
    }
    d = str(tmp_path / f"plant{epoch}")
    os.makedirs(d)
    pq.write_table(
        pa.Table.from_pylist([{k: row.get(k) for k in ref_schema.names}],
                             schema=ref_schema),
        os.path.join(d, "part-0.parquet"))
    rp.apply_epoch(epoch, d)


def test_candidate_pairs_ds_matches_set(ray_session, fixture_dir, tmp_path):
    """The distributed per-bucket-file pair read (candidate_pairs_ds)
    equals the driver-merged set variant, deduplicated across bands."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    state = {r["doc_id"]: list(r["tokens"] or [])
             for r in rp.read_state().take_all()}
    busy = [d for d, tk in sorted(state.items()) if len(tk) >= 3]
    _plant_dup(rp, fixture_dir, tmp_path, 1, busy[0], busy[1], state)
    v.refresh()
    want, dropped = v.candidate_pairs()
    assert dropped == 0 and want
    got_rows = v.candidate_pairs_ds().take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got), "ds variant must be deduplicated"


def test_candidate_pairs_ds_raises_on_cap(ray_session, fixture_dir, tmp_path):
    """ADVICE r3: a capped sig group must FAIL LOUDLY, not warn — a
    silent drop would surface downstream as a generic oracle mismatch."""
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    state = {r["doc_id"]: list(r["tokens"] or [])
             for r in rp.read_state().take_all()}
    busy = [d for d, tk in sorted(state.items()) if len(tk) >= 3]
    _plant_dup(rp, fixture_dir, tmp_path, 1, busy[0], busy[1], state)
    v.refresh()
    with pytest.raises(Exception, match="over cap"):
        v.candidate_pairs_ds(cap=1).materialize()


def test_probe_candidates_ds_matches_point(ray_session, fixture_dir,
                                           tmp_path):
    """The distributed batch prober returns exactly the point-probe
    candidates, per probe id."""
    import ray.data

    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    rows = rp.read_state().take_all()[:10]
    probes = [list(r["tokens"] or []) for r in rows]
    want = v.candidates_for_tokens(probes)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "tokens": pa.array(probes, pa.list_(pa.int64()))}))
    got: dict = {}
    for r in v.probe_candidates_ds(ds).take_all():
        got.setdefault(r["probe_id"], set()).add(r["match_id"])
    for r, w in zip(rows, want):
        assert got.get(r["doc_id"], set()) == w


def test_probe_matches_index(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=N_EPOCHS)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    rows = rp.read_state().take_all()
    probes = [list(r["tokens"] or []) for r in rows[:10]]
    got = v.candidates_for_tokens(probes)
    stored = _stored_sigs(v)
    sig_to_docs: dict = {}
    for s, d in stored:
        sig_to_docs.setdefault(s, set()).add(d)
    for i, toks in enumerate(probes):
        idx, sig = v._token_sigs(
            pa.array([toks], pa.list_(pa.int64())))
        want = set()
        for s in sig.tolist():
            want |= sig_to_docs.get(s, set())
        assert got[i] == want, i
        if toks:  # a live doc's own tokens must at least find itself
            assert rows[i]["doc_id"] in got[i]


def test_empty_docs_emit_no_entries(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
    v.refresh()
    empties = {r["doc_id"] for r in rp.read_state().take_all()
               if not (r["tokens"] or [])}
    if empties:
        assert not {d for _, d in _stored_sigs(v)} & empties


def test_open_view_roundtrip(ray_session, fixture_dir, tmp_path):
    from marc_data_migration_ray.pipelines.views import open_view

    cfg = ReplayConfig(num_partitions=4)
    rp = _replay(str(tmp_path / "t"), fixture_dir, cfg, epochs=1)
    v = MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=4)
    v.refresh()
    re = open_view(str(tmp_path / "v"), rp)
    assert isinstance(re, MinHashIndexView)
    assert re.n_buckets == 4
    assert _stored_sigs(re) == _stored_sigs(v)
    with pytest.raises(ValueError):
        MinHashIndexView(str(tmp_path / "v"), rp, n_buckets=8)
