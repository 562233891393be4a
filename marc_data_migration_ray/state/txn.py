"""Atomic multi-table commit: two-phase commit across Replayer tables.

The reference is single-store (one Postgres cache, reference
``add_response_to_database.py``); a fleet of CDC tables needs the next
step up: apply epoch E_a to table A and epoch E_b to table B so that a
reader either sees BOTH or NEITHER — e.g. a fact table and its
dimension, or a corpus table and its postings side-table.

Protocol (2PC with presumed abort + durable roll-forward):

1. PREPARE: each table stages its epoch (``Replayer.prepare_epoch`` —
   partitioned delta dir written, commit entry computed, LSN fence
   checked) and an INTENT file lands in ``<table>/_txn/<txn_id>.json``
   (tmp + rename). Staged data is invisible: every read is
   manifest-driven.
2. DECIDE: ONE decision file is created atomically
   (``open(..., O_EXCL)``) in the coordinator root. This is the commit
   point — the only single-point atomic step, exactly like the manifest's
   CAS hardlink.
3. FINALIZE: each table's manifest commits via its normal idempotent
   epoch-fenced CAS; intents are removed.

Crash recovery (``MultiTableTxn.recover``): an intent WITH a decision
file rolls FORWARD (re-finalize — idempotent); an intent WITHOUT one is
presumed aborted and its staging is discarded unless the epoch was
meanwhile committed through another path. A crash between any two steps
therefore never yields a half-visible transaction: visibility flips per
table only at step 3, and step 3 is replayable from durable state.

Liveness note: recovery is explicit (call ``recover`` on the coordinator
before new work) — an in-doubt transaction blocks nothing because
uncommitted staging is invisible; it only holds disk.
Same single-coordinator assumption as Delta's OCC log store: many
writers, one decision record per txn id.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def _fsync_dir(path: str) -> None:
    """Journal a directory entry (the rename/link itself) — file fsync
    alone does not make the new NAME durable on ext4/XFS."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class MultiTableTxn:
    """Coordinator for atomic epoch commits across multiple tables."""

    def __init__(self, txn_root: str):
        self.root = txn_root
        os.makedirs(txn_root, exist_ok=True)

    # ------------------------------------------------------------ helpers --
    def _decision_path(self, txn_id: str) -> str:
        return os.path.join(self.root, f"txn-{txn_id}.json")

    def _decided(self, txn_id: str) -> bool:
        return os.path.exists(self._decision_path(txn_id))

    @staticmethod
    def _intent_dir(rp) -> str:
        return os.path.join(rp.root, "_txn")

    @staticmethod
    def _write_json_atomic(path: str, payload: dict) -> None:
        # fsync before the rename (and the dir entry after): a crash
        # must never leave a zero-length intent/decision file behind a
        # published name — recover() treats file EXISTENCE as meaning
        tmp = path + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        _fsync_dir(os.path.dirname(path))

    # ------------------------------------------------------------- commit --
    def commit(self, parts: list[tuple]) -> dict:
        """``parts``: [(replayer, epoch, binlog_path), ...]. Returns
        {"txn_id", "entries": {table_root: entry}}. Raises with nothing
        committed if any PREPARE fails (fence, malformed paths, ...)."""
        txn_id = uuid.uuid4().hex[:16]
        prepared: list[tuple] = []  # (rp, prep, intent_path)
        try:
            for rp, epoch, binlog in parts:
                prep = rp.prepare_epoch(epoch, binlog)
                idir = self._intent_dir(rp)
                os.makedirs(idir, exist_ok=True)
                ipath = os.path.join(idir, f"{txn_id}.json")
                self._write_json_atomic(ipath, {
                    "txn_id": txn_id,
                    "txn_root": os.path.abspath(self.root),
                    "prepared": prep,
                })
                prepared.append((rp, prep, ipath))
        except Exception:
            # presumed abort: nothing was decided, discard our staging
            for rp, prep, ipath in prepared:
                self._abort_one(rp, prep, ipath)
            raise

        # the commit point: one atomic file creation (fsync'd — the
        # decision's EXISTENCE is the commit fact recovery reads)
        dpath = self._decision_path(txn_id)
        fd = os.open(dpath + ".tmp", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump({
                "txn_id": txn_id,
                "tables": [os.path.abspath(rp.root) for rp, _, _ in prepared],
                "epochs": [p["epoch"] for _, p, _ in prepared],
            }, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(dpath + ".tmp", dpath)
        _fsync_dir(self.root)

        entries = {}
        for rp, prep, ipath in prepared:
            entries[rp.root] = rp.finalize_epoch(prep)
            os.remove(ipath)
        # every intent is gone — nothing can ever be in doubt for this
        # txn again, so the decision record is dead weight (one file per
        # txn otherwise accumulates forever in the coordinator root)
        os.remove(dpath)
        return {"txn_id": txn_id, "entries": entries}

    # ----------------------------------------------------------- recovery --
    @staticmethod
    def _abort_one(rp, prep, ipath: str) -> None:
        epoch = prep["epoch"]
        rp.manifest.reload()  # don't discard a dir another path committed
        if (prep.get("staged_here")
                and not prep.get("already")
                and not rp.manifest.is_committed(epoch)
                and not MultiTableTxn._other_intents_reference(
                    rp, epoch, ipath)):
            # delete the staging only if WE created it, no other live
            # intent shares this (table, epoch), and it never committed
            # — prepare_epoch adopts an existing deltas/epoch=N dir, so
            # an unconditional rmtree could yank a concurrent txn's
            # staged data out from under its decision
            d = prep["entry"].get("dir")
            if d:
                shutil.rmtree(d, ignore_errors=True)
        if os.path.exists(ipath):
            os.remove(ipath)

    @staticmethod
    def _other_intents_reference(rp, epoch: int, ipath: str) -> bool:
        idir = MultiTableTxn._intent_dir(rp)
        if not os.path.isdir(idir):
            return False
        for fn in os.listdir(idir):
            p = os.path.join(idir, fn)
            if p == ipath or not fn.endswith(".json"):
                continue
            try:
                with open(p) as f:
                    other = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # unreadable intent: counted in-doubt elsewhere
            if other.get("prepared", {}).get("epoch") == epoch:
                return True
        return False

    def recover(self, tables: list) -> dict:
        """Resolve in-doubt transactions on ``tables``: roll forward
        decided ones (idempotent finalize), discard undecided staging.
        Safe to run any number of times, and concurrently with readers.

        The decision lookup honors the COORDINATOR ROOT recorded in each
        intent (a txn decided from a different root must roll forward,
        not be presumed aborted); intents without the field fall back to
        this coordinator's root. An unreadable/truncated intent is left
        IN PLACE and reported under ``in_doubt`` — deleting it would
        presume abort on a txn whose decision we cannot identify."""
        forward, aborted, in_doubt = [], [], []
        for rp in tables:
            idir = self._intent_dir(rp)
            if not os.path.isdir(idir):
                continue
            for fn in sorted(os.listdir(idir)):
                if not fn.endswith(".json"):
                    continue
                ipath = os.path.join(idir, fn)
                try:
                    with open(ipath) as f:
                        intent = json.load(f)
                except (OSError, json.JSONDecodeError):
                    in_doubt.append((rp.root, fn))
                    continue
                troot = intent.get("txn_root") or self.root
                dpath = os.path.join(
                    troot, f"txn-{intent['txn_id']}.json")
                if os.path.exists(dpath):
                    rp.finalize_epoch(intent["prepared"])
                    os.remove(ipath)
                    forward.append((rp.root, intent["txn_id"]))
                else:
                    self._abort_one(rp, intent["prepared"], ipath)
                    aborted.append((rp.root, intent["txn_id"]))
        return {"rolled_forward": forward, "aborted": aborted,
                "in_doubt": in_doubt}
