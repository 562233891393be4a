"""Temporal (as-of) joins over the ``events`` stream.

Ray Data has no native as-of join; the scalable recast is the same
co-partitioning move the CDC fold uses: hash BOTH sides on the equality
key (``user_id``) into coarse buckets, shuffle once, and run ONE
vectorized polars ``join_asof`` per bucket — no per-key Python, no
all-pairs time join. Partitioning assumption (documented per the custom-
operator rule): each bucket holds every event of its users, so the
per-bucket join is exact; bucket count bounds per-task memory the same
way ``SESSION_BUCKETS`` does for session windows.

Determinism: the right side is deduplicated per (user_id, ts) BEFORE the
join (keep max event_id for backward joins, min for forward joins), so
tie-breaking matches the SQL oracle's ``ROW_NUMBER`` order exactly even
if a fixture ever produced duplicate timestamps. All emitted times are
truncated epoch SECONDS (int64) — the lag comparison happens at that
resolution on both the engine and oracle sides, so there is no float or
interval-boundary ambiguity.

Scale note (100 TB): both sides move exactly once (one shuffle keyed on
user); the per-bucket polars join is O(n log n) in the bucket's rows.
A pathologically hot user concentrates in one bucket — the standard
mitigation is more buckets (the knob below) since a single user's events
must be co-located for as-of semantics regardless of engine.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from marc_data_migration_ray.functions.keys import mod_bucket
from marc_data_migration_ray.sources import readers

ASOF_BUCKETS = 64
FOLLOWUP_WINDOW_SEC = 3600


def _typed_events(sf_dir: str, types: tuple[str, ...]) -> ray.data.Dataset:
    """One pruned read feeds both join sides (columns= + row filter at the
    read, never a full-table load)."""
    import pyarrow.dataset as pads

    return readers.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=pads.field("event_type").isin(list(types)),
    )


def _bucketed(ds: ray.data.Dataset) -> ray.data.Dataset:
    def _b(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", mod_bucket(t["user_id"], ASOF_BUCKETS))

    return ds.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


def _asof_bucket(
    g: pa.Table,
    left_type: str,
    right_type: str,
    strategy: str,
    out_names: tuple[str, str, str],
):
    """polars join_asof for one user bucket. Returns (left_id, user_id,
    left_ts_sec, right_id, right_ts_sec, lag_sec) with lag/right columns
    null when no match."""
    import polars as pl

    df = pl.from_arrow(g.drop_columns(["bucket"]))
    left = df.filter(pl.col("event_type") == left_type).sort(["ts", "event_id"])
    right = (
        df.filter(pl.col("event_type") == right_type)
        .sort(["user_id", "ts", "event_id"])
        .unique(
            subset=["user_id", "ts"],
            keep="last" if strategy == "backward" else "first",
            maintain_order=True,
        )
        .sort(["ts", "event_id"])
        .select(
            "user_id",
            "ts",
            pl.col("event_id").alias("r_id"),
            pl.col("ts").alias("r_ts"),
        )
    )
    # both frames ARE sorted by ts above; polars warns unconditionally that
    # it can't VERIFY sortedness when `by` groups are present — suppress
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="Sortedness of columns cannot be checked"
        )
        j = left.join_asof(right, on="ts", by="user_id", strategy=strategy)
    lname, rname, lagname = out_names
    out = j.select(
        pl.col("event_id").alias(lname),
        pl.col("user_id"),
        (pl.col("ts").dt.epoch("us") // 1_000_000).alias(f"{lname[:-3]}_ts_sec"),
        pl.col("r_id").alias(rname),
        (pl.col("r_ts").dt.epoch("us") // 1_000_000).alias(f"{rname[:-3]}_ts_sec"),
        pl.lit(None, pl.Int64).alias(lagname),
    ).with_columns(
        (
            (pl.col(f"{lname[:-3]}_ts_sec") - pl.col(f"{rname[:-3]}_ts_sec")).abs()
        ).alias(lagname)
    )
    t = out.to_arrow()
    return pa.Table.from_arrays(
        [
            pc.cast(t.column(i).combine_chunks(), typ)
            for i, typ in enumerate(
                [pa.int64(), pa.int64(), pa.int64(), pa.int64(), pa.int64(), pa.int64()]
            )
        ],
        names=list(t.column_names),
    )


def purchase_attribution(sf_dir: str) -> ray.data.Dataset:
    """Backward as-of join (attribution): each ``purchase`` event joined to
    the same user's most recent ``view`` at or before it.

    (purchase_id, user_id, purchase_ts_sec, view_id, view_ts_sec, lag_sec);
    view columns null when the user never viewed before buying."""
    ds = _bucketed(_typed_events(sf_dir, ("purchase", "view")))
    return ds.groupby("bucket").map_groups(
        lambda g: _asof_bucket(
            g, "purchase", "view", "backward",
            ("purchase_id", "view_id", "lag_sec"),
        ),
        batch_format="pyarrow",
    )


WINDOW_JOIN_SEC = 1800  # attribution window (shared with the SQL oracle)


def purchase_views_window(sf_dir: str) -> ray.data.Dataset:
    """Interval (range) join: each ``purchase`` joined to ALL of the same
    user's ``view`` events within the preceding ``WINDOW_JOIN_SEC``
    (``view_ts_sec`` in ``(purchase_ts_sec - W, purchase_ts_sec]``) —
    the one-to-MANY sibling of the as-of join (multi-touch attribution,
    where as-of is last-touch).

    Ray Data has no range join; the recast is the same co-partitioning as
    ``purchase_attribution`` — hash both sides on ``user_id`` into coarse
    buckets, shuffle once — but the per-bucket kernel is a packed-key
    ``np.searchsorted`` range expansion instead of ``join_asof``: sort the
    view side once by (user, ts), pack ``(user_id << 32) | ts_sec`` into
    one sortable uint64 (bounds asserted: user_id < 2^32, ts_sec < 2^32 —
    i.e. timestamps before 2106; at larger key domains pack to uint128 via
    two lexsorted arrays), locate each purchase's ``[lo, hi)`` view range
    with two vectorized searchsorted calls, and expand with
    ``np.repeat`` + cumsum arithmetic. No per-row Python, no all-pairs
    blowup: output size is exactly the number of matches.

    Scale note (100 TB): both sides move exactly once (one shuffle keyed
    on user); per-bucket work is O(n log n) sort + O(matches) expansion.
    Output cardinality is data-dependent (a user who views constantly
    before every purchase multiplies rows) — the window bound W is the
    explicit knob that caps it.

    Columns: (purchase_id, user_id, purchase_ts_sec, view_id,
    view_ts_sec, lag_sec), one row per (purchase, in-window view),
    lag_sec in [0, W).
    """
    import numpy as np

    ds = _bucketed(_typed_events(sf_dir, ("purchase", "view")))

    def _range_join(g: pa.Table) -> pa.Table:
        typ = g["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        users = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        sec = (
            g["ts"].combine_chunks().cast(pa.int64()).to_numpy() // 1_000_000
        )
        assert users.max(initial=0) < (1 << 32) and sec.max(initial=0) < (1 << 32)
        assert sec.min(initial=0) >= 0  # pre-1970 ts would wrap the packed key

        def _side(mask):
            u, t, i = users[mask], sec[mask], ids[mask]
            order = np.lexsort((i, t, u))
            return u[order], t[order], i[order]

        pu, pt, pid = _side(typ == "purchase")
        vu, vt, vid = _side(typ == "view")
        vkey = (vu.astype(np.uint64) << np.uint64(32)) | vt.astype(np.uint64)
        base = pu.astype(np.uint64) << np.uint64(32)
        # clamp at 0: a purchase in the first W seconds after epoch would
        # otherwise underflow and wrap to ~2^64, corrupting the packed key
        lo_t = np.maximum(pt - WINDOW_JOIN_SEC + 1, 0)
        lo = np.searchsorted(vkey, base | lo_t.astype(np.uint64), side="left")
        hi = np.searchsorted(vkey, base | pt.astype(np.uint64), side="right")
        counts = hi - lo
        out_p = np.repeat(np.arange(len(pu)), counts)
        starts = np.repeat(lo, counts)
        ends = np.cumsum(counts)
        offset = np.arange(int(counts.sum())) - np.repeat(ends - counts, counts)
        vidx = starts + offset
        return pa.table(
            {
                "purchase_id": pa.array(pid[out_p], pa.int64()),
                "user_id": pa.array(pu[out_p], pa.int64()),
                "purchase_ts_sec": pa.array(pt[out_p], pa.int64()),
                "view_id": pa.array(vid[vidx], pa.int64()),
                "view_ts_sec": pa.array(vt[vidx], pa.int64()),
                "lag_sec": pa.array(pt[out_p] - vt[vidx], pa.int64()),
            }
        )

    return ds.groupby("bucket").map_groups(_range_join, batch_format="pyarrow")


def purchase_followup(sf_dir: str) -> ray.data.Dataset:
    """Forward as-of join with a window: each ``purchase`` joined to the
    same user's FIRST ``error`` event after it, kept only when the lag is
    within ``FOLLOWUP_WINDOW_SEC`` (truncated-second resolution).

    Tolerance is applied as an integer-second filter AFTER the forward
    join (equivalent to join_asof tolerance — the nearest forward match
    beyond the window means NO match — but with exactly the oracle's
    comparison semantics, no interval-boundary ambiguity).

    (purchase_id, user_id, purchase_ts_sec, error_id, error_ts_sec,
    lag_sec); error columns null when no error within the hour."""
    import polars as pl

    ds = _bucketed(_typed_events(sf_dir, ("purchase", "error")))

    def _fold(g: pa.Table) -> pa.Table:
        t = _asof_bucket(
            g, "purchase", "error", "forward",
            ("purchase_id", "error_id", "lag_sec"),
        )
        df = pl.from_arrow(t)
        within = pl.col("lag_sec") <= FOLLOWUP_WINDOW_SEC
        out = df.with_columns(
            pl.when(within).then(pl.col("error_id")).alias("error_id"),
            pl.when(within).then(pl.col("error_ts_sec")).alias("error_ts_sec"),
            pl.when(within).then(pl.col("lag_sec")).alias("lag_sec"),
        )
        a = out.to_arrow()
        return pa.Table.from_arrays(
            [pc.cast(a.column(i).combine_chunks(), pa.int64()) for i in range(6)],
            names=list(a.column_names),
        )

    return ds.groupby("bucket").map_groups(_fold, batch_format="pyarrow")


FUNNEL_STAGES = ("signup", "view_after_signup", "purchase_after_view")


def funnel_conversion(sf_dir: str) -> ray.data.Dataset:
    """(stage, n_users): sequential-pattern (funnel) analysis — how many
    users completed signup, then viewed AT OR AFTER their first signup,
    then purchased at or after that first qualifying view.

    The stage chain is per-user min-timestamp anchoring (first signup →
    first view ≥ it → first purchase ≥ that), so each stage is a filter +
    ``min`` — no per-user Python, no sequence scan: per bucket it is three
    vectorized polars join+filter+group_by steps. Comparisons are exact
    epoch-µs integers (no truncation, no float time math).

    Scale shape: same single user-bucket shuffle as the as-of joins; each
    bucket emits THREE count rows, the global finish is a
    ``groupby(stage).sum`` over 3×buckets tiny partials."""
    import polars as pl

    ds = _bucketed(_typed_events(sf_dir, ("signup", "view", "purchase")))

    def _funnel_bucket(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"])).with_columns(
            us=pl.col("ts").dt.epoch("us")
        )
        s = (
            df.filter(pl.col("event_type") == "signup")
            .group_by("user_id")
            .agg(s=pl.col("us").min())
        )
        v = (
            df.filter(pl.col("event_type") == "view")
            .join(s, on="user_id")
            .filter(pl.col("us") >= pl.col("s"))
            .group_by("user_id")
            .agg(v=pl.col("us").min())
        )
        p = (
            df.filter(pl.col("event_type") == "purchase")
            .join(v, on="user_id")
            .filter(pl.col("us") >= pl.col("v"))
            .group_by("user_id")
            .agg(p=pl.col("us").min())
        )
        return pa.table(
            {
                "stage": pa.array(list(FUNNEL_STAGES), pa.string()),
                "n": pa.array([s.height, v.height, p.height], pa.int64()),
            }
        )

    partials = ds.groupby("bucket").map_groups(
        _funnel_bucket, batch_format="pyarrow"
    )
    final = partials.groupby("stage").sum("n")
    return final.map_batches(
        lambda t: pa.table(
            {"stage": t["stage"], "n_users": pc.cast(t["sum(n)"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def funnel_conversion_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), "
        "s AS (SELECT user_id, min(us) AS s FROM e "
        "WHERE event_type = 'signup' GROUP BY 1), "
        "v AS (SELECT e.user_id, min(us) AS v FROM e JOIN s USING (user_id) "
        "WHERE event_type = 'view' AND us >= s.s GROUP BY 1), "
        "p AS (SELECT e.user_id, min(us) AS p FROM e JOIN v USING (user_id) "
        "WHERE event_type = 'purchase' AND us >= v.v GROUP BY 1) "
        "SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s "
        "UNION ALL SELECT 'view_after_signup', CAST(count(*) AS BIGINT) FROM v "
        "UNION ALL SELECT 'purchase_after_view', CAST(count(*) AS BIGINT) FROM p"
    )
