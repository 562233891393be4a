"""Atomic multi-table transactions (state/txn.py): 2PC with presumed
abort + durable roll-forward over the Replayer prepare/finalize split.

Crash injection walks every window of the protocol: before the decision
record (→ recovery aborts, neither table commits), after the decision but
before any/every finalize (→ recovery rolls forward, both commit), and
double recovery (idempotent)."""

import json
import os

import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.state.txn import MultiTableTxn


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("txn_fixture"))
    fixtures.write_fixture(root, n_rows=120, n_events=600, n_epochs=2, seed=31)
    return root


def _tables(tmp_path, fixture_dir, names=("a", "b")):
    cfg = ReplayConfig(num_partitions=4)
    out = []
    for n in names:
        rp = Replayer(str(tmp_path / n), cfg,
                      base_path=os.path.join(fixture_dir, "base"))
        out.append(rp)
    return out


def _binlog(fixture_dir, e):
    return os.path.join(fixture_dir, "binlog", f"epoch={e}")


def _state(rp):
    return sorted(
        ((r["doc_id"], r["last_lsn"]) for r in rp.read_state().take_all())
    )


def test_txn_commit_both_tables(ray_session, fixture_dir, tmp_path):
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    res = txn.commit([(a, 0, _binlog(fixture_dir, 0)),
                      (b, 0, _binlog(fixture_dir, 0))])
    assert set(res["entries"]) == {a.root, b.root}
    assert a.manifest.is_committed(0) and b.manifest.is_committed(0)
    # no leftover intents
    assert not os.listdir(os.path.join(a.root, "_txn"))

    # result identical to a plain apply on a fresh table
    ref = Replayer(str(tmp_path / "ref"), ReplayConfig(num_partitions=4),
                   base_path=os.path.join(fixture_dir, "base"))
    ref.apply_epoch(0, _binlog(fixture_dir, 0))
    assert _state(a) == _state(ref) == _state(b)


def _prepare_and_intents(txn, parts):
    """Reproduce commit()'s phase 1 exactly (prepare + intents), returning
    what commit() would hold right before the decision point."""
    txn_id = "deadbeefcafe0000"
    prepared = []
    for rp, epoch, binlog in parts:
        prep = rp.prepare_epoch(epoch, binlog)
        idir = txn._intent_dir(rp)
        os.makedirs(idir, exist_ok=True)
        ipath = os.path.join(idir, f"{txn_id}.json")
        txn._write_json_atomic(ipath, {
            "txn_id": txn_id, "txn_root": os.path.abspath(txn.root),
            "prepared": prep,
        })
        prepared.append((rp, prep, ipath))
    return txn_id, prepared


def test_crash_before_decision_aborts(ray_session, fixture_dir, tmp_path):
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    _txn_id, prepared = _prepare_and_intents(
        txn, [(a, 0, _binlog(fixture_dir, 0)), (b, 0, _binlog(fixture_dir, 0))]
    )
    # staged but undecided: invisible to readers
    assert not a.manifest.is_committed(0) and not b.manifest.is_committed(0)
    staged = [p["entry"]["dir"] for _, p, _ in prepared]
    assert all(os.path.isdir(d) for d in staged)

    rec = txn.recover([a, b])
    assert len(rec["aborted"]) == 2 and not rec["rolled_forward"]
    assert not a.manifest.is_committed(0) and not b.manifest.is_committed(0)
    assert not any(os.path.exists(d) for d in staged)  # staging reclaimed

    # the tables remain fully usable afterwards
    a.apply_epoch(0, _binlog(fixture_dir, 0))
    assert a.manifest.is_committed(0)


def test_crash_after_decision_rolls_forward(ray_session, fixture_dir, tmp_path):
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    txn_id, prepared = _prepare_and_intents(
        txn, [(a, 0, _binlog(fixture_dir, 0)), (b, 0, _binlog(fixture_dir, 0))]
    )
    # decision lands, then the coordinator dies before ANY finalize
    with open(txn._decision_path(txn_id), "w") as f:
        json.dump({"txn_id": txn_id}, f)

    rec = txn.recover([a, b])
    assert len(rec["rolled_forward"]) == 2 and not rec["aborted"]
    assert a.manifest.is_committed(0) and b.manifest.is_committed(0)

    ref = Replayer(str(tmp_path / "ref"), ReplayConfig(num_partitions=4),
                   base_path=os.path.join(fixture_dir, "base"))
    ref.apply_epoch(0, _binlog(fixture_dir, 0))
    assert _state(a) == _state(ref) == _state(b)

    # double recovery is a no-op
    rec2 = txn.recover([a, b])
    assert rec2 == {"rolled_forward": [], "aborted": [], "in_doubt": []}


def test_crash_mid_finalize_completes_the_rest(ray_session, fixture_dir, tmp_path):
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    txn_id, prepared = _prepare_and_intents(
        txn, [(a, 0, _binlog(fixture_dir, 0)), (b, 0, _binlog(fixture_dir, 0))]
    )
    with open(txn._decision_path(txn_id), "w") as f:
        json.dump({"txn_id": txn_id}, f)
    # table a finalized, coordinator dies before b
    rp, prep, ipath = prepared[0]
    rp.finalize_epoch(prep)
    os.remove(ipath)
    assert a.manifest.is_committed(0) and not b.manifest.is_committed(0)

    rec = txn.recover([a, b])
    assert rec["rolled_forward"] == [(b.root, txn_id)]
    assert b.manifest.is_committed(0)
    assert _state(a) == _state(b)


def test_prepare_failure_aborts_cleanly(ray_session, fixture_dir, tmp_path):
    """Second table's prepare violates the LSN fence → commit() raises and
    the FIRST table's staging+intent are rolled back."""
    a, b = _tables(tmp_path, fixture_dir)
    # drive b past a compaction so a re-sent old epoch trips its fence
    b.apply_epoch(0, _binlog(fixture_dir, 0))
    b.apply_epoch(1, _binlog(fixture_dir, 1))
    b.compact()

    txn = MultiTableTxn(str(tmp_path / "txn"))
    with pytest.raises(ValueError, match="compaction"):
        txn.commit([(a, 1, _binlog(fixture_dir, 1)),
                    (b, 2, _binlog(fixture_dir, 0))])  # lsns below ceiling
    assert not a.manifest.is_committed(1)
    assert not os.path.isdir(os.path.join(a.root, "deltas", "epoch=1")) or \
        not os.listdir(os.path.join(a.root, "_txn"))
    assert not os.listdir(os.path.join(a.root, "_txn"))


def test_txn_state_matches_oracle(ray_session, fixture_dir, tmp_path):
    """Both epochs committed through transactions == oracle replay."""
    import pyarrow.parquet as pq

    (a,) = _tables(tmp_path, fixture_dir, names=("solo",))
    txn = MultiTableTxn(str(tmp_path / "txn"))
    for e in range(2):
        txn.commit([(a, e, _binlog(fixture_dir, e))])

    base = pq.read_table(os.path.join(fixture_dir, "base")).to_pylist()
    evs = []
    for e in range(2):
        d = _binlog(fixture_dir, e)
        for f in sorted(os.listdir(d)):
            evs += pq.read_table(os.path.join(d, f)).to_pylist()
    o = oracle.replay(base, evs, ReplayConfig(num_partitions=4))
    eng = sorted(a.read_state().take_all(), key=lambda r: r["doc_id"])
    assert len(eng) == len(o["final"])
    for x, y in zip(eng, o["final"]):
        assert x["doc_id"] == y["doc_id"]
        assert (list(x["tokens"]) if x["tokens"] is not None else None) == \
            (list(y["tokens"]) if y["tokens"] is not None else None)


def test_write_audit_publish(ray_session, fixture_dir, tmp_path):
    """WAP: the audit sees staged-but-invisible data; a veto discards the
    staging, a pass publishes exactly what a plain apply would."""
    (a,) = _tables(tmp_path, fixture_dir, names=("wap",))

    seen = {}

    def _too_strict(staged, entry):
        seen["rows"] = staged.count()
        seen["entry_rows"] = entry["rows"]
        return False  # veto

    with pytest.raises(ValueError, match="audit vetoed"):
        a.apply_epoch_audited(0, _binlog(fixture_dir, 0), _too_strict)
    assert seen["rows"] == seen["entry_rows"] > 0
    assert not a.manifest.is_committed(0)
    assert not os.path.isdir(os.path.join(a.root, "deltas", "epoch=0"))

    def _deadletter_budget(staged, entry):
        bad = staged.filter(expr="route == 'deadletter'").count()
        return bad <= entry["processed"] * 0.05

    got = a.apply_epoch_audited(0, _binlog(fixture_dir, 0), _deadletter_budget)
    assert a.manifest.is_committed(0)

    ref = Replayer(str(tmp_path / "wap_ref"), ReplayConfig(num_partitions=4),
                   base_path=os.path.join(fixture_dir, "base"))
    ref.apply_epoch(0, _binlog(fixture_dir, 0))
    assert _state(a) == _state(ref)
    assert got["routes"] == ref.manifest.epoch_entry(0)["routes"]

    # idempotent on an already-committed epoch (audit not consulted)
    again = a.apply_epoch_audited(
        0, _binlog(fixture_dir, 0),
        lambda *_: (_ for _ in ()).throw(AssertionError("must not run")),
    )
    assert again["routes"] == got["routes"]


def test_recover_honors_intents_recorded_txn_root(ray_session, fixture_dir,
                                                  tmp_path):
    """Code-review r5: a DECIDED txn must roll forward even when recover
    runs from a different coordinator root — the decision lookup uses
    the txn_root recorded in each intent, not the recoverer's own."""
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    txn_id, prepared = _prepare_and_intents(
        txn, [(a, 0, _binlog(fixture_dir, 0)),
              (b, 0, _binlog(fixture_dir, 0))])
    # decision lands in txn's root (crash right after the decision)
    txn._write_json_atomic(txn._decision_path(txn_id), {"txn_id": txn_id})
    other = MultiTableTxn(str(tmp_path / "other_root"))
    rec = other.recover([a, b])
    assert len(rec["rolled_forward"]) == 2 and not rec["aborted"]
    assert a.manifest.is_committed(0) and b.manifest.is_committed(0)


def test_recover_leaves_corrupt_intent_in_doubt(ray_session, fixture_dir,
                                                tmp_path):
    """A truncated intent (crash between rename and data reaching disk on
    a non-fsync filesystem) must be reported in_doubt and left in place —
    not presumed aborted with its staging destroyed."""
    a, = _tables(tmp_path, fixture_dir, names=("a",))
    prep = a.prepare_epoch(0, _binlog(fixture_dir, 0))
    idir = os.path.join(a.root, "_txn")
    os.makedirs(idir, exist_ok=True)
    bad = os.path.join(idir, "0123456789abcdef.json")
    open(bad, "w").close()  # zero-length
    txn = MultiTableTxn(str(tmp_path / "txn"))
    rec = txn.recover([a])
    assert rec["in_doubt"] == [(a.root, "0123456789abcdef.json")]
    assert not rec["aborted"] and os.path.exists(bad)
    assert os.path.isdir(prep["entry"]["dir"])  # staging untouched


def test_commit_removes_decision_file(ray_session, fixture_dir, tmp_path):
    a, b = _tables(tmp_path, fixture_dir)
    txn = MultiTableTxn(str(tmp_path / "txn"))
    res = txn.commit([(a, 0, _binlog(fixture_dir, 0)),
                      (b, 0, _binlog(fixture_dir, 0))])
    assert not os.path.exists(txn._decision_path(res["txn_id"]))


def test_abort_spares_staging_shared_with_live_intent(ray_session,
                                                      fixture_dir, tmp_path):
    """Two txns share one (table, epoch) staging dir (prepare adopts an
    existing deltas/epoch=N). Aborting one must NOT delete the dir while
    the other's intent still references it."""
    a, = _tables(tmp_path, fixture_dir, names=("a",))
    txn = MultiTableTxn(str(tmp_path / "txn"))
    # T1 stages (creates the dir) and records its intent
    t1_id, t1_prep = _prepare_and_intents(
        txn, [(a, 0, _binlog(fixture_dir, 0))])
    d = t1_prep[0][1]["entry"]["dir"]
    assert os.path.isdir(d)
    # T2 prepares the SAME epoch (adopts the dir) with its own intent
    prep2 = a.prepare_epoch(0, _binlog(fixture_dir, 0))
    assert not prep2.get("staged_here")
    ip2 = os.path.join(a.root, "_txn", "feedfacefeedface.json")
    txn._write_json_atomic(ip2, {
        "txn_id": "feedfacefeedface",
        "txn_root": os.path.abspath(txn.root), "prepared": prep2})
    # abort T1 (undecided): the dir must survive because T2 references it
    MultiTableTxn._abort_one(a, t1_prep[0][1], t1_prep[0][2])
    assert os.path.isdir(d)
    # T2's own abort WOULD not delete either (it did not stage) — the
    # dir is finally reclaimed only when the LAST intent that staged it
    # aborts with no other referents
    MultiTableTxn._abort_one(a, prep2, ip2)
    assert os.path.isdir(d)
