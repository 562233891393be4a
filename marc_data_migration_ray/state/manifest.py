"""Epoch-fenced JSON transaction log (the exactly-once commit protocol).

Replaces the reference's purge-then-reload Postgres cache
(``record_update.py:170-173``, per-row commits ``reports.py:104-107``) with a
Delta-Lake-style manifest (PAPERS.md: Delta Lake, VLDB 2020): data files are
written to a temp dir, atomically renamed into place, then the manifest is
committed via a **versioned CAS**: each save hard-links a new
``versions/v<N>.json`` (``os.link`` is atomic-exclusive — exactly one
writer can create version N; on object storage this maps to a conditional
put) and then swaps the ``manifest.json`` convenience pointer. A losing
concurrent writer gets :class:`ManifestConflict`, reloads the winner's
state, re-applies its idempotent mutation and retries — so multiple
drivers can commit concurrently without lost updates. Re-committing a
committed epoch is a no-op (fencing); a crash between the version link and
the pointer swap is healed at load time (the highest version wins).

The manifest is the single source of truth for: committed epochs (the
checkpoint), schema-evolution ops, per-partition local-id allocator offsets,
compactions, delta segments, and per-epoch metrics/lineage.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile


def _fsync_dir(path: str) -> None:
    """Journal a directory entry (a just-created link/rename name) —
    fsync of the file alone does not make the NAME durable on ext4/XFS,
    and the CAS link is the commit point callers get acked on."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class ManifestConflict(RuntimeError):
    """Another writer committed this manifest version first (CAS loss)."""


class Manifest:
    FILENAME = "manifest.json"

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        self.path = os.path.join(self.dir, self.FILENAME)
        self.versions_dir = os.path.join(self.dir, "versions")
        self.state: dict = self._empty_state()
        self.reload()

    @staticmethod
    def _empty_state() -> dict:
        return {
            "version": 0,
            "base_path": None,
            "base_normalized": False,
            "epochs": {},
            "schema_ops": [],
            "local_id_offsets": {},
            "compactions": [],
            "delta_segments": [],
        }

    # -- persistence -------------------------------------------------------
    def _latest_version_file(self) -> tuple[int, str | None]:
        best_v, best_f = -1, None
        for f in glob.glob(os.path.join(self.versions_dir, "v*.json")):
            try:
                v = int(os.path.basename(f)[1:-5])
            except ValueError:
                continue
            if v > best_v:
                best_v, best_f = v, f
        return best_v, best_f

    def reload(self) -> None:
        """Load the newest committed state (version files beat the pointer:
        a crash between CAS-link and pointer swap must not lose a commit)."""
        state = None
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
        v, vf = self._latest_version_file()
        if vf is not None and (state is None or v > state.get("version", -1)):
            with open(vf) as f:
                state = json.load(f)
        self.state = state if state is not None else self._empty_state()

    def save(self) -> None:
        """CAS commit of ``self.state`` as version current+1.

        Raises :class:`ManifestConflict` if another writer created that
        version first; the caller must ``reload()`` and re-apply."""
        os.makedirs(self.versions_dir, exist_ok=True)
        next_v = self.state["version"] + 1
        self.state["version"] = next_v
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self.state, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            # a pruned version number must never be re-creatable: a writer
            # stale by more than the retention window would otherwise
            # "win" a CAS on a recycled number and silently lose its write
            if next_v <= self._version_floor():
                self.state["version"] = next_v - 1
                raise ManifestConflict(
                    f"manifest version {next_v} is below the prune floor"
                )
            target = os.path.join(self.versions_dir, f"v{next_v:012d}.json")
            try:
                os.link(tmp, target)  # atomic-exclusive: the CAS
            except FileExistsError:
                self.state["version"] = next_v - 1
                raise ManifestConflict(f"manifest version {next_v} already committed")
            # re-check the floor AFTER the link (code-review r5): a
            # pruner running between the pre-check and the link may have
            # raised the floor past next_v and unlinked it — the link
            # then "succeeds" onto a recycled number that reload() will
            # never pick, silently losing the write. Post-link the
            # number is visible, so a floor at or above it proves the
            # race fired; undo and conflict so the caller re-applies.
            if next_v <= self._version_floor():
                try:
                    os.unlink(target)
                except FileNotFoundError:
                    pass
                self.state["version"] = next_v - 1
                raise ManifestConflict(
                    f"manifest version {next_v} was pruned mid-commit")
            _fsync_dir(self.versions_dir)  # make the link durable
            os.replace(tmp, self.path)  # convenience pointer (best-effort)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _version_floor(self) -> int:
        p = os.path.join(self.versions_dir, "FLOOR")
        try:
            with open(p) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def prune_versions(self, keep: int = 64) -> list[str]:
        """Transaction-log checkpointing (Delta-Lake-style): drop version
        files older than the newest ``keep`` — the versions dir otherwise
        grows one file per commit forever under streaming ingest. The
        retention FLOOR lands first (atomic replace), so a writer stale by
        more than the window gets :class:`ManifestConflict` instead of
        silently recycling a pruned version number; the newest version
        file (the crash-heal source) is always retained."""
        latest, _ = self._latest_version_file()
        floor = latest - max(keep, 1)
        # the FLOOR update is serialized under an flock'd lock file
        # (code-review r5): two unserialized pruners could interleave
        # check-then-replace and REGRESS the floor, re-opening the
        # recycled-version-number hole save() relies on it to close.
        # Readers (save's floor checks) never take the lock.
        import fcntl

        lock_path = os.path.join(self.versions_dir, "FLOOR.lock")
        lk = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if floor <= self._version_floor():
                return []
            fd, tmp = tempfile.mkstemp(dir=self.versions_dir,
                                       prefix=".floor-")
            with os.fdopen(fd, "w") as f:
                f.write(str(floor))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(self.versions_dir, "FLOOR"))
            _fsync_dir(self.versions_dir)
        finally:
            os.close(lk)  # releases the flock
        removed = []
        for f in glob.glob(os.path.join(self.versions_dir, "v*.json")):
            try:
                v = int(os.path.basename(f)[1:-5])
            except ValueError:
                continue
            if v <= floor:
                try:
                    os.unlink(f)
                    removed.append(f)
                except FileNotFoundError:
                    pass  # concurrent pruner
        return removed

    def _cas_update(self, mutate) -> None:
        """Apply an IDEMPOTENT mutation under CAS-retry."""
        while True:
            mutate(self.state)
            try:
                self.save()
                return
            except ManifestConflict:
                self.reload()

    # -- epochs ------------------------------------------------------------
    def is_committed(self, epoch: int) -> bool:
        return str(epoch) in self.state["epochs"]

    def committed_epochs(self) -> list[int]:
        return sorted(int(e) for e in self.state["epochs"])

    def commit_epoch(self, epoch: int, entry: dict,
                     schema_ops: list[dict] | None = None) -> bool:
        """Returns False (no-op) if already committed — the epoch fence.
        ``schema_ops`` are recorded atomically WITH the epoch entry (a CAS
        retry re-applies both; record_schema_ops dedupes on lsn)."""
        while True:
            if self.is_committed(epoch):
                return False
            if schema_ops:
                # epoch tag lets rollback() drop exactly this epoch's DDL
                self.record_schema_ops(
                    [{**o, "epoch": epoch} for o in schema_ops]
                )
            self.state["epochs"][str(epoch)] = entry
            try:
                self.save()
                return True
            except ManifestConflict:
                self.reload()

    def epoch_entry(self, epoch: int) -> dict:
        return self.state["epochs"][str(epoch)]

    # -- schema evolution --------------------------------------------------
    def record_schema_ops(self, ops: list[dict]) -> None:
        """Append schema ops (each {"lsn","kind","name","new_name"}), kept
        globally sorted by lsn and deduplicated on lsn."""
        seen = {o["lsn"] for o in self.state["schema_ops"]}
        new = [o for o in ops if o["lsn"] not in seen]
        if new:
            self.state["schema_ops"] = sorted(
                self.state["schema_ops"] + new, key=lambda o: o["lsn"]
            )

    def resolve_schema(
        self, base_columns: list[str], ops: list[dict] | None = None
    ) -> tuple[list[str], dict[str, str], list[str]]:
        """Simulate schema ops over ``base_columns`` (SEMANTICS §schema).

        Returns (final_schema, rename_map canonical→final, added_columns).
        ``ops`` overrides the manifest's full op list (epoch-ranged reads).
        Delegates to the shared ``resolve_schema_ops`` (one definition for
        manifest, oracle and tests).
        """
        from marc_data_migration_ray.state.schema_timeline import resolve_schema_ops

        return resolve_schema_ops(
            base_columns, self.state["schema_ops"] if ops is None else ops
        )

    # -- compaction / allocator -------------------------------------------
    def last_compacted_epoch(self) -> int:
        cs = self.state["compactions"]
        return cs[-1]["up_to"] if cs else -1

    def active_epochs(self) -> list[int]:
        floor = self.last_compacted_epoch()
        return [e for e in self.committed_epochs() if e > floor]

    def ceiling_lsn(self) -> int:
        """Highest lsn folded into any base snapshot. Events at or below it
        can no longer participate in LWW ordering (the snapshot row carries
        only its last_lsn), so new epochs must stay strictly above — see
        SEMANTICS §late events. -1 when never compacted."""
        best = -1
        for c in self.state["compactions"]:
            v = c.get("ceiling_lsn")
            if v is None:  # legacy record: derive from the absorbed entries
                v = max(
                    (e.get("max_lsn", -1) for k, e in self.state["epochs"].items()
                     if int(k) <= c["up_to"]),
                    default=-1,
                )
            best = max(best, v)
        return best

    def head_lsn(self) -> int:
        """Highest lsn recorded by any committed epoch (-1 when empty) —
        a cheap upper bound for 'read everything' key-filtered scans."""
        return max(
            (e.get("max_lsn", -1) for e in self.state["epochs"].values()),
            default=-1,
        )

    def record_compaction(self, up_to: int, base_path: str, local_counts: dict[int, int],
                          metrics_snapshot: dict | None = None,
                          ceiling_lsn: int = -1) -> None:
        def _mut(st: dict) -> None:
            if any(c["base_path"] == base_path for c in st["compactions"]):
                return  # retry after our own landed commit: idempotent
            for p, c in local_counts.items():
                k = str(p)
                st["local_id_offsets"][k] = st["local_id_offsets"].get(k, 0) + c
            st["compactions"].append({"up_to": up_to, "base_path": base_path,
                                      "metrics_snapshot": metrics_snapshot,
                                      "ceiling_lsn": ceiling_lsn})
            st["base_path"] = base_path
            st["base_normalized"] = True
            st["base_is_final_schema"] = True
            st["base_bucketized_path"] = base_path

        self._cas_update(_mut)

    def record_repartition(self, up_to: int, base_path: str,
                           local_counts: dict[int, int],
                           metrics_snapshot: dict | None,
                           ceiling_lsn: int,
                           num_partitions: int, num_salts: int) -> None:
        """Partition evolution: commit a repartitioned base snapshot.

        Identical to :meth:`record_compaction` (the new snapshot absorbs
        epochs <= ``up_to`` and rides the compactions list so the floor /
        ceiling / vacuum / fsck machinery applies unchanged) plus an
        atomic switch of the table's partition layout. Local-id allocator
        offsets carry forward BY PART NUMBER: an id embeds the partition
        that allocated it, so keeping each counter's high-water mark under
        its original number is what guarantees no id is ever re-issued,
        whatever the new partition count."""
        def _mut(st: dict) -> None:
            if any(c["base_path"] == base_path for c in st["compactions"]):
                return  # idempotent retry after our own landed commit
            newer = [int(e) for e in st["epochs"] if int(e) > up_to]
            if newer:
                # a concurrent writer landed an epoch at the OLD layout after
                # our fold; flipping the layout would strand its deltas
                raise ValueError(
                    f"repartition folded through epoch {up_to} but epochs "
                    f"{sorted(newer)} committed since — re-run repartition"
                )
            for p, c in local_counts.items():
                k = str(p)
                st["local_id_offsets"][k] = st["local_id_offsets"].get(k, 0) + c
            st["compactions"].append({
                "up_to": up_to, "base_path": base_path,
                "metrics_snapshot": metrics_snapshot,
                "ceiling_lsn": ceiling_lsn,
                "repartition": {"from": [st["num_partitions"],
                                         st.get("num_salts", 1)],
                                "to": [num_partitions, num_salts]},
            })
            st["num_partitions"] = num_partitions
            st["num_salts"] = num_salts
            st["base_path"] = base_path
            st["base_normalized"] = True
            st["base_is_final_schema"] = True
            st["base_bucketized_path"] = base_path

        self._cas_update(_mut)

    def metrics_snapshot(self) -> dict:
        """Cumulative fold metrics for epochs <= the compaction floor.

        A compaction absorbs delta events into the base snapshot, so a later
        refold can no longer observe their noop/tombstone/replacement
        outcomes; the snapshot (stored with the compaction record) carries
        the run-level counters across the floor so ``fold_metrics`` stays a
        whole-run counter (reference A1 semantics, processor.py:129-150).
        Rows is intentionally absent: row count is current state, not a
        cumulative counter."""
        cs = self.state["compactions"]
        snap = cs[-1].get("metrics_snapshot") if cs else None
        return snap or {"noop": 0, "tombstoned": 0, "local": 0,
                        "col_replacements": {}, "local_by_part": {},
                        "noop_by_route": {}}

    def local_id_offsets(self) -> dict[int, int]:
        return {int(k): v for k, v in self.state["local_id_offsets"].items()}

    # -- delta segments (LSM level-1 file compaction) ----------------------
    def record_delta_segment(self, from_epoch: int, to_epoch: int, dir_: str) -> None:
        def _mut(st: dict) -> None:
            segs = st.setdefault("delta_segments", [])
            if any(s["dir"] == dir_ for s in segs):
                return
            segs.append({"from": from_epoch, "to": to_epoch, "dir": dir_})

        self._cas_update(_mut)

    def delta_segments(self) -> list[dict]:
        return list(self.state.get("delta_segments", []))

    # -- tags (named snapshots) ----------------------------------------------
    def set_tag(self, name: str, epoch: int, replace: bool = False) -> None:
        """Name an epoch cut (Delta/Iceberg tag analog). A tag is a NAME for
        a time-travel read (``read_state(tag=...)`` == ``up_to_epoch``),
        not a retention pin: compacting past the tagged epoch makes the
        tag unreadable (the inherited floor guard raises), and rollback
        below it drops it. CAS-committed like every manifest mutation."""
        def _mut(st: dict) -> None:
            tags = st.setdefault("tags", {})
            if not replace and name in tags and tags[name] != epoch:
                raise ValueError(
                    f"tag {name!r} already points at epoch {tags[name]}"
                )
            tags[name] = epoch

        self._cas_update(_mut)

    def delete_tag(self, name: str) -> None:
        def _mut(st: dict) -> None:
            st.setdefault("tags", {}).pop(name, None)

        self._cas_update(_mut)

    def tags(self) -> dict[str, int]:
        return dict(self.state.get("tags", {}))

    def resolve_tag(self, name: str) -> int:
        tags = self.state.get("tags", {})
        if name not in tags:
            raise KeyError(f"unknown tag {name!r}; have {sorted(tags)}")
        return tags[name]

    # -- generated (virtual) columns ----------------------------------------
    def set_virtual_column(self, name: str, expr: str,
                           inputs: list[str]) -> None:
        """Register a GENERATED column (Delta generated-column analog):
        ``expr`` is a polars-SQL scalar expression over display columns,
        ``inputs`` the display columns it reads (declared explicitly so a
        projected read can keep exactly those inputs in the fold). Virtual
        columns are TABLE PROPERTIES applied at read time — not versioned
        by epoch, like policy plugins. CAS-committed."""
        def _mut(st: dict) -> None:
            vcs = st.setdefault("virtual_columns", [])
            if any(v["name"] == name for v in vcs):
                raise ValueError(f"virtual column {name!r} already defined")
            vcs.append({"name": name, "expr": expr,
                        "inputs": list(inputs)})

        self._cas_update(_mut)

    def drop_virtual_column(self, name: str) -> None:
        def _mut(st: dict) -> None:
            st["virtual_columns"] = [
                v for v in st.get("virtual_columns", [])
                if v["name"] != name
            ]

        self._cas_update(_mut)

    def virtual_columns(self) -> list[dict]:
        return [dict(v) for v in self.state.get("virtual_columns", [])]

    # -- rollback (log truncation) ------------------------------------------
    def record_rollback(self, to_epoch: int) -> list[str]:
        """Truncate the log: drop committed epochs > ``to_epoch``, their
        schema ops and any delta segments lying fully above the boundary.
        The dropped data DIRS are queued in ``rollback_pending`` (cleanup
        is best-effort after the CAS lands; ``apply_epoch`` also clears a
        pending dir before adopting it, so a crash between the CAS and the
        rmtree can never resurrect rolled-back data). Returns the list of
        dirs to clean. Callers guard the compaction floor / straddling
        segments (Replayer.rollback)."""
        dropped_dirs: list[str] = []

        def _mut(st: dict) -> None:
            dropped_dirs.clear()
            # re-validate against the CURRENT state on every CAS attempt
            # (code-review r5): a retry after a conflicting writer may
            # see a floor or segment that did not exist when the
            # caller's pre-checks ran — dropping a straddling segment
            # here would destroy below-boundary delta data it absorbs
            cs = st.get("compactions", [])
            floor_now = cs[-1]["up_to"] if cs else -1
            if to_epoch < floor_now:
                raise ValueError(
                    f"cannot roll back to epoch {to_epoch}: epochs <= "
                    f"{floor_now} are compacted into the base snapshot")
            for s in st.get("delta_segments", []):
                if s["from"] <= to_epoch < s["to"]:
                    raise ValueError(
                        f"rollback to {to_epoch} would split delta "
                        f"segment [{s['from']}..{s['to']}]; roll back to "
                        "a segment edge or vacuum the segment first")
            for k in [k for k in st["epochs"] if int(k) > to_epoch]:
                d = st["epochs"].pop(k).get("dir")
                if d:
                    dropped_dirs.append(d)
            cutoff = max(
                (e.get("max_lsn", -1) for e in st["epochs"].values()), default=-1
            )
            st["schema_ops"] = [
                o for o in st["schema_ops"]
                if (o.get("epoch") is not None and o["epoch"] <= to_epoch)
                or (o.get("epoch") is None and o["lsn"] <= cutoff)
            ]
            keep_segs, drop_segs = [], []
            for s in st.get("delta_segments", []):
                (keep_segs if s["to"] <= to_epoch else drop_segs).append(s)
            st["delta_segments"] = keep_segs
            dropped_dirs.extend(s["dir"] for s in drop_segs)
            pend = st.setdefault("rollback_pending", [])
            for d in dropped_dirs:
                if d not in pend:
                    pend.append(d)
            # tags pointing above the truncation dangle — drop them
            st["tags"] = {
                n: e for n, e in st.get("tags", {}).items() if e <= to_epoch
            }

        self._cas_update(_mut)
        return dropped_dirs

    def rollback_pending(self) -> list[str]:
        return list(self.state.get("rollback_pending", []))

    def clear_rollback_pending(self, dirs: list[str]) -> None:
        if not dirs:
            return

        def _mut(st: dict) -> None:
            st["rollback_pending"] = [
                d for d in st.get("rollback_pending", []) if d not in dirs
            ]

        self._cas_update(_mut)

    def segment_covering(self, epoch: int) -> dict | None:
        for seg in self.state.get("delta_segments", []):
            if seg["from"] <= epoch <= seg["to"]:
                return seg
        return None
