"""Incrementally-maintained materialized aggregate view over a Replayer
table, driven by the change-data feed.

The view is the per-``source`` aggregate of the CURRENT state:
``(source, n_rows, n_tok_sum)``. After the first build it is maintained
from ``changes_between`` alone — the base table is never re-folded:

* full build (first refresh, or when compaction swallowed the last
  refreshed epoch): distributed per-batch partial aggregation over
  ``read_state`` → one tiny ``groupby(source).sum``;
* incremental refresh: each change row contributes SIGNED deltas —
  ``+after`` for inserts, ``-before`` for deletes, both for updates (so
  a source-changing update moves the row between groups) — aggregated
  per batch, then merged with the stored aggregate. Work is O(changes),
  not O(table): the scale property that makes a 100-TB view cheap to
  keep fresh under a trickle of updates.

Null ``n_tok`` contributes 0 to ``n_tok_sum`` on both paths (sum skips
nulls on the full path; explicit fill on the incremental path), so the
two paths are exactly equivalent — asserted in tests.

Commit protocol: the aggregate parquet lands in ``v{epoch}/`` and a JSON
``CURRENT`` marker is swapped in via tmp-file + ``os.replace`` (atomic
on POSIX) — same crash discipline as the table manifest; a torn refresh
leaves the previous version current. Single-writer by design (views are
derived data; rebuild is always safe).
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Sum

VIEW_SCHEMA = pa.schema(
    [("source", pa.string()), ("n_rows", pa.int64()), ("n_tok_sum", pa.int64())]
)


def _partial(t: pa.Table) -> pa.Table:
    g = pa.table(
        {
            "source": t["source"],
            "one": pa.array([1] * t.num_rows, pa.int64()),
            "tok": pc.fill_null(pc.cast(t["n_tok"], pa.int64()), 0),
        }
    )
    return g.group_by("source").aggregate([("one", "sum"), ("tok", "sum")])


def _delta_partial(t: pa.Table) -> pa.Table:
    """Signed per-change deltas: -before for delete/update, +after for
    insert/update (vectorized: one concat of the two signed halves)."""
    has_after = pc.is_in(t["change"], value_set=pa.array(["insert", "update"]))
    has_before = pc.is_in(t["change"], value_set=pa.array(["delete", "update"]))
    after = t.filter(has_after)
    before = t.filter(has_before)
    parts = pa.concat_tables(
        [
            pa.table(
                {
                    "source": after["source_after"],
                    "one": pa.array([1] * after.num_rows, pa.int64()),
                    "tok": pc.fill_null(pc.cast(after["n_tok_after"], pa.int64()), 0),
                }
            ),
            pa.table(
                {
                    "source": before["source_before"],
                    "one": pa.array([-1] * before.num_rows, pa.int64()),
                    "tok": pc.multiply(
                        pc.fill_null(pc.cast(before["n_tok_before"], pa.int64()), 0),
                        pa.scalar(-1, pa.int64()),
                    ),
                }
            ),
        ]
    )
    return parts.group_by("source").aggregate([("one", "sum"), ("tok", "sum")])


def _finish(partials: ray.data.Dataset) -> pa.Table:
    final = partials.groupby("source").aggregate(
        Sum("one_sum", alias_name="n_rows"), Sum("tok_sum", alias_name="n_tok_sum")
    )
    t = pa.concat_tables(final.iter_batches(batch_format="pyarrow"))
    t = pa.table(
        {
            "source": pc.cast(t["source"], pa.string()),
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
            "n_tok_sum": pc.cast(t["n_tok_sum"], pa.int64()),
        }
    )
    return t.sort_by([("source", "ascending")])


class SourceCountsView:
    """Materialized (source, n_rows, n_tok_sum) view of a Replayer table."""

    def __init__(self, root: str, replayer):
        self.root = root
        self.rp = replayer
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- state --
    def _current(self) -> dict | None:
        p = os.path.join(self.root, "CURRENT")
        if not os.path.exists(p):
            return None
        return json.loads(open(p).read())

    def last_epoch(self) -> int | None:
        cur = self._current()
        return None if cur is None else cur["epoch"]

    def read(self) -> pa.Table:
        cur = self._current()
        if cur is None:
            raise ValueError("view was never refreshed")
        return pq.read_table(os.path.join(self.root, cur["dir"], "agg.parquet"))

    # ----------------------------------------------------------- refresh --
    def refresh(self, to_epoch: int | None = None) -> dict:
        committed = self.rp.manifest.committed_epochs()
        if not committed:
            raise ValueError("table has no committed epochs")
        if to_epoch is None:
            to_epoch = max(committed)
        if not self.rp.manifest.is_committed(to_epoch):
            raise ValueError(f"epoch {to_epoch} is not committed")
        last = self.last_epoch()
        if last is not None and not self.rp.manifest.is_committed(last):
            # the view's base epoch was rolled back: the stored aggregate
            # reflects data that no longer exists — full rebuild
            last = None
        if last is not None and to_epoch < last:
            raise ValueError(f"view is already at epoch {last} > {to_epoch}")
        if last == to_epoch:
            return {"epoch": to_epoch, "mode": "noop", "rows": len(self.read())}

        floor = self.rp.manifest.last_compacted_epoch()
        if last is None or last < floor:
            # full build (first refresh, or the incremental base epoch was
            # compacted away and can no longer be folded). Reads the raw
            # fold output — CANONICAL column names, pre-policy — because
            # that is exactly what the change feed carries; building from
            # read_state would bake policy/rename transforms into the full
            # path that incremental refreshes could never reproduce.
            rows = self.rp.fold_output(up_to_epoch=to_epoch).filter(
                expr="_kind == 'row'"
            )
            partials = rows.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            )
            agg = _finish(partials)
            mode = "full"
        else:
            deltas = self.rp.changes_between(last, to_epoch).map_batches(
                _delta_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            merged = _finish(deltas)
            stored = self.read()
            both = pa.concat_tables([stored, merged]).group_by("source").aggregate(
                [("n_rows", "sum"), ("n_tok_sum", "sum")]
            )
            both = both.filter(pc.not_equal(both["n_rows_sum"], 0))
            agg = pa.table(
                {
                    "source": pc.cast(both["source"], pa.string()),
                    "n_rows": pc.cast(both["n_rows_sum"], pa.int64()),
                    "n_tok_sum": pc.cast(both["n_tok_sum_sum"], pa.int64()),
                }
            ).sort_by([("source", "ascending")])
            mode = "incremental"

        vdir = f"v{to_epoch}"
        tmp = os.path.join(self.root, f"_tmp_{vdir}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(agg.cast(VIEW_SCHEMA), os.path.join(tmp, "agg.parquet"))
        final = os.path.join(self.root, vdir)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        marker_tmp = os.path.join(self.root, "_CURRENT.tmp")
        with open(marker_tmp, "w") as f:
            f.write(json.dumps({"epoch": to_epoch, "dir": vdir}))
        os.replace(marker_tmp, os.path.join(self.root, "CURRENT"))
        return {"epoch": to_epoch, "mode": mode, "rows": len(agg)}
