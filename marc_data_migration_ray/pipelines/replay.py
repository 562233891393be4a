"""End-to-end CDC replay pipeline (the flagship).

Physical plan (SURVEY §4.2), all Ray Data, streaming, zero-copy Arrow:

    binlog epoch  ──read_parquet──►  ParseRoute (actor pool, map_batches,
                                     pyarrow batches: normalize keys M1-M3,
                                     gate M13-M14, route, part_id)
                  ──write_parquet(partition_cols=[route, part])──►
                     deltas/epoch=N/...      (single pass; the parquet IS
                                              the audit + dead-letter sink)
                  ──manifest.commit_epoch──►  exactly-once, epoch-fenced

    state = fold( base ∪ committed deltas )
          = union ──groupby(part_id).map_groups(fold_bucket)──► final rows
            (vectorized polars LWW fold per hash partition; SEMANTICS.md)
          ──schema-op projection (manifest renames/adds)──► current table

    compact() materializes the fold into a new base snapshot and advances
    the local-id allocator offsets — an LSM merge of the sorted runs.

Scale notes (100 TB design): the only all-to-all exchange is the
``groupby(part_id)`` fold; everything upstream is embarrassingly parallel
map+write. ``num_partitions`` is the commit/fold granularity — size it so a
partition's live rows fit a worker (thousands at cluster scale). Hot *keys*
are collapsed inside their bucket vectorized (no per-key Python), so skew
cost is bounded by bucket imbalance, which the fnv1a hash keeps small.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.stages.fold import make_fold_fn
from marc_data_migration_ray.stages.parse import PARSED_SCHEMA, ParseRoute, PrepBase
from marc_data_migration_ray.state.manifest import Manifest

_ROW_COLS = ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status", "candidate_key"]
DELTA_ROUTES = ("applied", "fuzzy", "local")


class Replayer:
    """Replays a binlog onto a lake table under exactly-once manifest commits."""

    def __init__(self, root: str, cfg: ReplayConfig | None = None, base_path: str | None = None):
        self.root = root
        self.cfg = cfg or ReplayConfig()
        self.manifest = Manifest(root)
        if base_path is not None and self.manifest.state["base_path"] is None:
            self.manifest.state["base_path"] = base_path
            self.manifest.save()

    # ------------------------------------------------------------------ #
    # ingest
    # ------------------------------------------------------------------ #
    def apply_epoch(self, epoch: int, binlog_path: str | list[str]) -> dict:
        """Parse+gate+route one binlog epoch and commit it. Idempotent:
        re-applying a committed epoch returns the stored entry untouched."""
        if self.manifest.is_committed(epoch):
            return self.manifest.epoch_entry(epoch)

        final_dir = os.path.join(self.root, "deltas", f"epoch={epoch}")
        if not os.path.exists(final_dir):
            tmp_dir = os.path.join(self.root, "_tmp", f"epoch-{epoch}-{uuid.uuid4().hex[:8]}")
            ds = ray.data.read_parquet(binlog_path)
            parsed = ds.map_batches(
                ParseRoute,
                fn_constructor_args=(self.cfg,),
                batch_format="pyarrow",
                batch_size=self.cfg.batch_size,
                zero_copy_batch=True,
                concurrency=(1, 8),
            )
            # duplicate routing cols so data files stay self-contained
            parsed = parsed.map_batches(
                lambda t: t.append_column("route_p", t["route"]).append_column(
                    "part_p", t["part_id"]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            parsed.write_parquet(tmp_dir, partition_cols=["route_p", "part_p"])
            os.makedirs(os.path.dirname(final_dir), exist_ok=True)
            os.rename(tmp_dir, final_dir)  # atomic publish of the epoch's data

        entry = self._epoch_entry_from_files(epoch, final_dir)
        self.manifest.record_schema_ops(entry.pop("_schema_ops"))
        self.manifest.commit_epoch(epoch, entry)
        return entry

    def _epoch_entry_from_files(self, epoch: int, final_dir: str) -> dict:
        """Build the manifest entry (metrics + lineage) from committed files —
        driver-side, metadata-only except the tiny schema route."""
        route_counts: dict[str, int] = {}
        max_lsn = -1
        files = sorted(glob.glob(os.path.join(final_dir, "route_p=*", "**", "*.parquet"), recursive=True))
        for f in files:
            route = f.split("route_p=")[1].split(os.sep)[0]
            md = pq.read_metadata(f)
            route_counts[route] = route_counts.get(route, 0) + md.num_rows
            lsn_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}.get("lsn")
            if lsn_idx is None:
                continue
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(lsn_idx)
                if col.statistics and col.statistics.has_min_max:
                    max_lsn = max(max_lsn, col.statistics.max)
        schema_ops = []
        sfiles = [f for f in files if f"route_p=schema{os.sep}" in f]
        if sfiles:
            t = pa.concat_tables([pq.read_table(f) for f in sfiles])
            for r in t.sort_by("lsn").to_pylist():
                schema_ops.append(
                    {
                        "lsn": r["lsn"],
                        "kind": r.get("schema_kind"),
                        "name": r.get("schema_name"),
                        "new_name": r.get("schema_new_name"),
                    }
                )
        processed = sum(route_counts.values())
        return {
            "rows": processed,
            "processed": processed,
            "routes": route_counts,
            "max_lsn": max_lsn,
            "dir": final_dir,
            "_schema_ops": schema_ops,
        }

    # ------------------------------------------------------------------ #
    # state (merge-on-read fold)
    # ------------------------------------------------------------------ #
    def _base_dataset(self):
        base_path = self.manifest.state["base_path"]
        if base_path is None:
            return None
        ds = ray.data.read_parquet(base_path)
        return ds.map_batches(
            PrepBase,
            fn_constructor_args=(self.cfg, self.manifest.state["base_normalized"]),
            batch_format="pyarrow",
            batch_size=self.cfg.batch_size,
            zero_copy_batch=True,
            concurrency=(1, 8),
        )

    def _delta_dataset(self, up_to_epoch: int | None = None):
        files = []
        for e in self.manifest.active_epochs():
            if up_to_epoch is not None and e > up_to_epoch:
                continue
            for route in DELTA_ROUTES:
                d = os.path.join(self.root, "deltas", f"epoch={e}", f"route_p={route}")
                if os.path.isdir(d):
                    files.extend(
                        sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
                    )
        if not files:
            return None
        cols = [n for n in PARSED_SCHEMA.names]
        return ray.data.read_parquet(files, columns=cols)

    def fold_output(self, up_to_epoch: int | None = None):
        """Raw fold dataset: _kind ∈ {row, noop, metrics} (FOLD_SCHEMA)."""
        parts = [d for d in (self._base_dataset(), self._delta_dataset(up_to_epoch)) if d is not None]
        if not parts:
            raise ValueError("nothing to fold: no base and no committed deltas")
        ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        fold = make_fold_fn(self.cfg, self.manifest.local_id_offsets())
        return ds.groupby("part_id").map_groups(
            fold, batch_format="pyarrow", num_cpus=1
        )

    def read_state(self, up_to_epoch: int | None = None):
        """Current table state as a Ray Dataset (schema ops applied)."""
        rows = self.fold_output(up_to_epoch).filter(
            expr="_kind == 'row'"
        )
        rows = rows.map_batches(
            lambda t: t.select(_ROW_COLS), batch_format="pyarrow", zero_copy_batch=True
        )
        final_schema, _renames, added = self.manifest.resolve_schema(_ROW_COLS)
        if added or _renames:
            # canonical order = _ROW_COLS + added (resolve_schema appends adds
            # and renames in place) → rename positionally to the final schema.
            def _evolve(t: pa.Table, added=tuple(added), names=tuple(final_schema)) -> pa.Table:
                for name in added:
                    t = t.append_column(name, pa.nulls(t.num_rows, pa.string()))
                return t.rename_columns(list(names))

            rows = rows.map_batches(_evolve, batch_format="pyarrow", zero_copy_batch=True)
        return rows

    def fold_metrics(self, up_to_epoch: int | None = None) -> dict:
        """Fold-time metrics (noop/tombstoned/col_replacements/local/rows),
        aggregated across buckets, plus pre-fold route counts from the
        manifest. Invariant: processed == sum(all routes)."""
        mrows = self.fold_output(up_to_epoch).filter(expr="_kind == 'metrics'")
        agg = {"noop": 0, "tombstoned": 0, "local": 0, "rows": 0,
               "col_replacements": {}, "local_by_part": {}}
        for b in mrows.iter_batches(batch_format="pyarrow"):
            for s in b["metrics_json"].to_pylist():
                m = json.loads(s)
                agg["noop"] += m["noop"]
                agg["tombstoned"] += m["tombstoned"]
                agg["local"] += m["local"]
                agg["rows"] += m["rows"]
                for c, v in m["col_replacements"].items():
                    agg["col_replacements"][c] = agg["col_replacements"].get(c, 0) + v
                if m["local"] and m["part_ids"]:
                    for p in m["part_ids"]:
                        agg["local_by_part"][p] = agg["local_by_part"].get(p, 0) + m["local"]
        routes = {}
        for e in self.manifest.active_epochs():
            if up_to_epoch is not None and e > up_to_epoch:
                continue
            for r, c in self.manifest.epoch_entry(e)["routes"].items():
                routes[r] = routes.get(r, 0) + c
        # fold refines applied/fuzzy → noop
        refined = dict(routes)
        if agg["noop"]:
            # noops come out of applied+fuzzy; exact split not tracked — report
            # combined per SEMANTICS invariant
            refined["noop"] = agg["noop"]
        agg["routes_prefold"] = routes
        agg["routes"] = refined
        return agg

    # ------------------------------------------------------------------ #
    # compaction (LSM merge)
    # ------------------------------------------------------------------ #
    def compact(self, up_to_epoch: int | None = None) -> str:
        """Fold base ∪ deltas into a new base snapshot; advance allocator."""
        up_to = up_to_epoch if up_to_epoch is not None else (
            self.manifest.committed_epochs()[-1] if self.manifest.committed_epochs() else -1
        )
        out = self.fold_output(up_to)
        new_base = os.path.join(self.root, f"base-compact-{uuid.uuid4().hex[:8]}")
        tmp = new_base + ".tmp"
        rows = out.filter(expr="_kind == 'row'").map_batches(
            lambda t: t.select(_ROW_COLS), batch_format="pyarrow", zero_copy_batch=True
        )
        rows.write_parquet(tmp)
        # gather local-id allocations per partition before swapping state
        local_counts: dict[int, int] = {}
        for b in out.filter(expr="_kind == 'metrics'").iter_batches(batch_format="pyarrow"):
            for s in b["metrics_json"].to_pylist():
                m = json.loads(s)
                if m["local"]:
                    for p in m["part_ids"]:
                        local_counts[p] = local_counts.get(p, 0) + m["local"]
        os.rename(tmp, new_base)
        self.manifest.record_compaction(up_to, new_base, local_counts)
        return new_base

    # ------------------------------------------------------------------ #
    def audit_dataset(self, epoch: int):
        """Full routed-event audit for an epoch (reference S11 audit logs)."""
        d = os.path.join(self.root, "deltas", f"epoch={epoch}")
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        return ray.data.read_parquet(
            files, columns=["lsn", "doc_id_raw", "key", "op", "route", "status", "match_score"]
        )

    def deadletter_dataset(self, epoch: int):
        """Dead-letter rows for an epoch (reference S7 bad-records sink)."""
        d = os.path.join(self.root, "deltas", f"epoch={epoch}", "route_p=deadletter")
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        if not files:
            return None
        return ray.data.read_parquet(files)

    def cleanup_tmp(self) -> None:
        t = os.path.join(self.root, "_tmp")
        if os.path.isdir(t):
            shutil.rmtree(t)
