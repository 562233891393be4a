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
    assert rec2 == {"rolled_forward": [], "aborted": []}


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
