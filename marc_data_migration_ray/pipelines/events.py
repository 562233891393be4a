"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows/watermarks (ray_guide §Streaming-shaped
workloads); windows are expressed as key-partitioned ordered computation:
tumbling windows via derived window keys + grouped aggregation, session
windows via ``groupby(key).map_groups`` over ts-sorted groups. Ordering
assumption: per-key total order by (ts, event_id) — event_id breaks ts
ties, mirroring the SQL oracle's window ORDER BY.

Money/value sums use integer cents (round-half-away ×100) so Ray and the
DuckDB oracle agree exactly (no float accumulation-order hazards).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

SESSION_GAP_MIN = 30


def _events(sf_dir: str, columns) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=list(columns)
    )


def user_daily_value(sf_dir: str) -> pa.Table:
    """Tumbling daily window per user: (user_id, day, value_cents, n_events).

    Per-batch partial aggregation (group_by inside map_batches) → tiny
    driver-side final reduce — no full shuffle.
    """
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def _partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        g = pa.table({"user_id": t["user_id"], "day": day, "cents": cents})
        return g.group_by(["user_id", "day"]).aggregate([("cents", "sum"), ("cents", "count")])

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    final = tbl.group_by(["user_id", "day"]).aggregate(
        [("cents_sum", "sum"), ("cents_count", "sum")]
    )
    return pa.table(
        {
            "user_id": final["user_id"],
            "day": final["day"],
            "value_cents": pc.cast(final["cents_sum_sum"], pa.int64()),
            "n_events": pc.cast(final["cents_count_sum"], pa.int64()),
        }
    ).sort_by([("user_id", "ascending"), ("day", "ascending")])


def session_count(sf_dir: str) -> ray.data.Dataset:
    """Session windows (gap > 30 min) per user: (user_id, n_sessions).

    ``groupby(user_id).map_groups`` over the ts-sorted group — the
    key-partitioned ordered-state pattern; per-group pandas is fine because
    groups are per-user event streams (bounded), and the shuffle key is the
    session key itself.
    """
    ds = _events(sf_dir, ["user_id", "ts", "event_id"])

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        n = int(1 + gaps.sum()) if len(g) else 0
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "n_sessions": [n]})

    out = ds.groupby("user_id").map_groups(_sessions, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def event_type_users(sf_dir: str) -> pa.Table:
    """Distinct users + event counts per type: (event_type, n_users, n_events).

    Partial per-batch distinct (event_type, user_id) pairs + counts →
    driver-side merge (the distinct-count pre-aggregation pattern; at 100 TB
    the partial-distinct set per batch is the mergeable sketch).
    """
    ds = _events(sf_dir, ["event_type", "user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        pairs = pa.table({"event_type": t["event_type"], "user_id": t["user_id"]})
        distinct = pairs.group_by(["event_type", "user_id"]).aggregate([])
        counts = pairs.group_by("event_type").aggregate([("user_id", "count")])
        n = distinct.num_rows
        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [distinct["event_type"].combine_chunks(), counts["event_type"].combine_chunks()]
                ),
                "user_id": pa.concat_arrays(
                    [
                        pc.cast(distinct["user_id"], pa.int64()).combine_chunks(),
                        pa.nulls(counts.num_rows, pa.int64()),
                    ]
                ),
                "cnt": pa.concat_arrays(
                    [
                        pa.nulls(n, pa.int64()),
                        pc.cast(counts["user_id_count"], pa.int64()).combine_chunks(),
                    ]
                ),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    pairs = tbl.filter(pc.is_valid(tbl["user_id"]))
    distinct = pairs.group_by(["event_type", "user_id"]).aggregate([])
    n_users = distinct.group_by("event_type").aggregate([("user_id", "count")])
    counts = tbl.filter(pc.is_valid(tbl["cnt"]))
    n_events = counts.group_by("event_type").aggregate([("cnt", "sum")])
    merged = n_users.join(n_events, keys="event_type")
    return pa.table(
        {
            "event_type": merged["event_type"],
            "n_users": pc.cast(merged["user_id_count"], pa.int64()),
            "n_events": pc.cast(merged["cnt_sum"], pa.int64()),
        }
    ).sort_by([("event_type", "ascending")])


def key_diff_report(sf_dir: str) -> ray.data.Dataset:
    """Reference J3 analog: rows whose raw key ≠ normalized key (the
    'compare_oclc_numbers' diff report), over the synthesized noisy keys."""
    from marc_data_migration_ray.pipelines.reports import key_normalize

    ds = key_normalize(sf_dir)

    def _diff(t: pa.Table) -> pa.Table:
        differs = pc.fill_null(pc.not_equal(t["raw_key"], t["norm_key"]), False)
        return t.filter(pc.or_(differs, pc.invert(t["is_valid"])))

    return ds.map_batches(_diff, batch_format="pyarrow", zero_copy_batch=True)
