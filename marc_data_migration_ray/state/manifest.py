"""Epoch-fenced JSON transaction log (the exactly-once commit protocol).

Replaces the reference's purge-then-reload Postgres cache
(``record_update.py:170-173``, per-row commits ``reports.py:104-107``) with a
Delta-Lake-style manifest (PAPERS.md: Delta Lake, VLDB 2020): data files are
written to a temp dir, atomically renamed into place, then the manifest is
swapped via write-temp + ``os.replace`` (atomic on POSIX). Re-committing a
committed epoch is a no-op (fencing); a crash between data rename and
manifest swap is healed by recommitting the manifest entry from the data
files (idempotent).

The manifest is the single source of truth for: committed epochs (the
checkpoint), schema-evolution ops, per-partition local-id allocator offsets,
compactions, and per-epoch metrics/lineage.
"""

from __future__ import annotations

import json
import os
import tempfile


class Manifest:
    FILENAME = "manifest.json"

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "_manifest")
        self.path = os.path.join(self.dir, self.FILENAME)
        self.state: dict = {
            "version": 0,
            "base_path": None,
            "base_normalized": False,
            "epochs": {},
            "schema_ops": [],
            "local_id_offsets": {},
            "compactions": [],
            "delta_segments": [],
        }
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    # -- persistence -------------------------------------------------------
    def save(self) -> None:
        os.makedirs(self.dir, exist_ok=True)
        self.state["version"] += 1
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=".manifest-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self.state, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)  # atomic swap
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    # -- epochs ------------------------------------------------------------
    def is_committed(self, epoch: int) -> bool:
        return str(epoch) in self.state["epochs"]

    def committed_epochs(self) -> list[int]:
        return sorted(int(e) for e in self.state["epochs"])

    def commit_epoch(self, epoch: int, entry: dict) -> bool:
        """Returns False (no-op) if already committed — the epoch fence."""
        if self.is_committed(epoch):
            return False
        self.state["epochs"][str(epoch)] = entry
        self.save()
        return True

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
        """
        schema = list(base_columns)
        renames: dict[str, str] = {}
        added: list[str] = []
        for op in (self.state["schema_ops"] if ops is None else ops):
            kind, name, new = op["kind"], op["name"], op.get("new_name")
            if kind == "add_column" and name not in schema:
                schema.append(name)
                added.append(name)
            elif kind == "rename_column" and name in schema and new not in schema:
                schema[schema.index(name)] = new
                # chase chains: if name was itself a rename target, rewrite
                canon = name
                for c, r in renames.items():
                    if r == name:
                        canon = c
                        break
                renames[canon] = new
        return schema, renames, added

    # -- compaction / allocator -------------------------------------------
    def last_compacted_epoch(self) -> int:
        cs = self.state["compactions"]
        return cs[-1]["up_to"] if cs else -1

    def active_epochs(self) -> list[int]:
        floor = self.last_compacted_epoch()
        return [e for e in self.committed_epochs() if e > floor]

    def record_compaction(self, up_to: int, base_path: str, local_counts: dict[int, int]) -> None:
        for p, c in local_counts.items():
            k = str(p)
            self.state["local_id_offsets"][k] = self.state["local_id_offsets"].get(k, 0) + c
        self.state["compactions"].append({"up_to": up_to, "base_path": base_path})
        self.state["base_path"] = base_path
        self.state["base_normalized"] = True
        self.save()

    def local_id_offsets(self) -> dict[int, int]:
        return {int(k): v for k, v in self.state["local_id_offsets"].items()}

    # -- delta segments (LSM level-1 file compaction) ----------------------
    def record_delta_segment(self, from_epoch: int, to_epoch: int, dir_: str) -> None:
        self.state.setdefault("delta_segments", []).append(
            {"from": from_epoch, "to": to_epoch, "dir": dir_}
        )
        self.save()

    def delta_segments(self) -> list[dict]:
        return list(self.state.get("delta_segments", []))

    def segment_covering(self, epoch: int) -> dict | None:
        for seg in self.state.get("delta_segments", []):
            if seg["from"] <= epoch <= seg["to"]:
                return seg
        return None
