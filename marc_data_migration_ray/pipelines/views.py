"""Incrementally-maintained materialized aggregate views over a Replayer
table, driven by the change-data feed.

``AggView(root, rp, keys, sums)`` materializes
``GROUP BY keys → (n_rows, <col>_sum ...)`` over the CURRENT state for any
key/sum columns the change feed carries (``source``, ``status`` /
``n_tok``, ``last_lsn``). After the first build it is maintained from
``changes_between`` alone — the base table is never re-folded:

* full build (first refresh, or when compaction swallowed the last
  refreshed epoch): distributed per-batch partial aggregation over the
  fold output → one tiny ``groupby(keys).sum``;
* incremental refresh: each change row contributes SIGNED deltas —
  ``+after`` for inserts, ``-before`` for deletes, both for updates (so
  a key-changing update moves the row between groups) — aggregated per
  batch, then merged with the stored aggregate. Work is O(changes),
  not O(table): the scale property that makes a 100-TB view cheap to
  keep fresh under a trickle of updates.

Only count/sum aggregates are supported — they are the self-maintainable
ones (a min/max view cannot be maintained under deletes without
re-reading the group; that is a rebuild, not a view refresh).

Null sum values contribute 0 on both paths (sum skips nulls on the full
path; explicit fill on the incremental path), so the two paths are
exactly equivalent — asserted in tests.

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

#: columns the change feed carries before/after images for (replay._diff_bucket_task)
FEED_KEY_COLS = ("source", "status")
FEED_SUM_COLS = ("n_tok", "last_lsn")


class AggView:
    """Materialized ``GROUP BY keys → (n_rows, <sum>_sum...)`` view."""

    def __init__(self, root: str, replayer, keys=("source",), sums=("n_tok",)):
        for k in keys:
            if k not in FEED_KEY_COLS:
                raise ValueError(f"key {k!r} not in change feed {FEED_KEY_COLS}")
        for s in sums:
            if s not in FEED_SUM_COLS:
                raise ValueError(f"sum {s!r} not in change feed {FEED_SUM_COLS}")
        if not keys:
            raise ValueError("need at least one key column")
        self.root = root
        self.rp = replayer
        self.keys = tuple(keys)
        self.sums = tuple(sums)
        self.out_cols = [f"{s}_sum" for s in self.sums]
        self.schema = pa.schema(
            [(k, pa.string()) for k in self.keys]
            + [("n_rows", pa.int64())]
            + [(c, pa.int64()) for c in self.out_cols]
        )
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ kernels --
    def _partial(self, t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in self.keys}
        cols["one"] = pa.array([1] * t.num_rows, pa.int64())
        for s in self.sums:
            cols[s] = pc.fill_null(pc.cast(t[s], pa.int64()), 0)
        aggs = [("one", "sum")] + [(s, "sum") for s in self.sums]
        return pa.table(cols).group_by(list(self.keys)).aggregate(aggs)

    def _delta_partial(self, t: pa.Table) -> pa.Table:
        """Signed per-change deltas: -before for delete/update, +after for
        insert/update (vectorized: one concat of the two signed halves)."""
        has_after = pc.is_in(t["change"], value_set=pa.array(["insert", "update"]))
        has_before = pc.is_in(t["change"], value_set=pa.array(["delete", "update"]))

        def _half(rows: pa.Table, suffix: str, sign: int) -> pa.Table:
            cols = {k: rows[f"{k}{suffix}"] for k in self.keys}
            cols["one"] = pa.array([sign] * rows.num_rows, pa.int64())
            for s in self.sums:
                v = pc.fill_null(pc.cast(rows[f"{s}{suffix}"], pa.int64()), 0)
                cols[s] = v if sign > 0 else pc.multiply(v, pa.scalar(-1, pa.int64()))
            return pa.table(cols)

        parts = pa.concat_tables(
            [
                _half(t.filter(has_after), "_after", 1),
                _half(t.filter(has_before), "_before", -1),
            ]
        )
        aggs = [("one", "sum")] + [(s, "sum") for s in self.sums]
        return parts.group_by(list(self.keys)).aggregate(aggs)

    def _finish(self, partials: ray.data.Dataset) -> pa.Table:
        final = partials.groupby(list(self.keys)).aggregate(
            Sum("one_sum", alias_name="n_rows"),
            *[Sum(f"{s}_sum", alias_name=c)
              for s, c in zip(self.sums, self.out_cols)],
        )
        t = pa.concat_tables(final.iter_batches(batch_format="pyarrow"))
        cols = {k: pc.cast(t[k], pa.string()) for k in self.keys}
        cols["n_rows"] = pc.cast(t["n_rows"], pa.int64())
        for c in self.out_cols:
            cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols).sort_by([(k, "ascending") for k in self.keys])

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
                self._partial, batch_format="pyarrow", zero_copy_batch=True
            )
            agg = self._finish(partials)
            mode = "full"
        else:
            deltas = self.rp.changes_between(last, to_epoch).map_batches(
                self._delta_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            merged = self._finish(deltas)
            stored = self.read()
            sum_cols = ["n_rows"] + self.out_cols
            both = pa.concat_tables([stored, merged]).group_by(
                list(self.keys)
            ).aggregate([(c, "sum") for c in sum_cols])
            both = both.filter(pc.not_equal(both["n_rows_sum"], 0))
            cols = {k: pc.cast(both[k], pa.string()) for k in self.keys}
            for c in sum_cols:
                cols[c] = pc.cast(both[f"{c}_sum"], pa.int64())
            agg = pa.table(cols).sort_by(
                [(k, "ascending") for k in self.keys]
            )
            mode = "incremental"

        vdir = f"v{to_epoch}"
        tmp = os.path.join(self.root, f"_tmp_{vdir}")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(agg.cast(self.schema), os.path.join(tmp, "agg.parquet"))
        final = os.path.join(self.root, vdir)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        marker_tmp = os.path.join(self.root, "_CURRENT.tmp")
        with open(marker_tmp, "w") as f:
            f.write(json.dumps({"epoch": to_epoch, "dir": vdir}))
        os.replace(marker_tmp, os.path.join(self.root, "CURRENT"))
        return {"epoch": to_epoch, "mode": mode, "rows": len(agg)}


#: backward-compatible (source, n_rows, n_tok_sum) view
class SourceCountsView(AggView):
    """Materialized (source, n_rows, n_tok_sum) view of a Replayer table."""

    def __init__(self, root: str, replayer):
        super().__init__(root, replayer, keys=("source",), sums=("n_tok",))


VIEW_SCHEMA = pa.schema(
    [("source", pa.string()), ("n_rows", pa.int64()), ("n_tok_sum", pa.int64())]
)
