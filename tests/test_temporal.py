"""As-of join edge cases the sf fixtures can't produce: duplicate
(user, ts) rows on the right side (tie-break determinism), no-match
lefts, and a lag exactly at the followup window boundary."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.pipelines import temporal

T0 = dt.datetime(2024, 1, 1)


def _write_events(path, rows):
    """rows: (event_id, sec_offset, user_id, event_type)"""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "events.parquet"))


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("asof"))
    _write_events(
        d,
        [
            # user 1: two views at the SAME ts before the purchase — the
            # backward tie must pick max event_id (=11)
            (10, 100, 1, "view"),
            (11, 100, 1, "view"),
            (20, 200, 1, "purchase"),
            # user 2: purchase with NO prior view (view after) → null attr
            (30, 500, 2, "purchase"),
            (31, 600, 2, "view"),
            # user 2: errors straddle the followup window: 3600s lag is IN
            # (inclusive), 3601 would be out; two errors at the same ts
            # after → forward tie picks min event_id (=40)
            (40, 4100, 2, "error"),
            (41, 4100, 2, "error"),
            # user 3 (different bucket b/c 3 % 64): boundary exactly 3600
            (50, 0, 3, "purchase"),
            (51, 3600, 3, "error"),
            # user 4: nearest forward error beyond window → NO match (the
            # as-of takes the nearest, then the window filter nulls it)
            (60, 0, 4, "purchase"),
            (61, 4000, 4, "error"),
        ],
    )
    return d


def _rows(ds):
    return {r["purchase_id"]: r for r in ds.take_all()}


def test_attribution_ties_and_no_match(ray_session, edge_dir):
    out = _rows(temporal.purchase_attribution(edge_dir))
    assert set(out) == {20, 30, 50, 60}
    assert out[20]["view_id"] == 11  # max event_id among equal-ts views
    assert out[20]["lag_sec"] == 100
    assert out[30]["view_id"] is None  # view came after the purchase
    assert out[50]["view_id"] is None and out[60]["view_id"] is None


def test_followup_window_boundary(ray_session, edge_dir):
    out = _rows(temporal.purchase_followup(edge_dir))
    assert set(out) == {20, 30, 50, 60}
    assert out[30]["error_id"] == 40  # min event_id among equal-ts errors
    assert out[30]["lag_sec"] == 3600
    assert out[50]["error_id"] == 51  # lag exactly 3600 is inclusive
    assert out[50]["lag_sec"] == 3600
    assert out[60]["error_id"] is None  # nearest forward error at 4000s
    assert out[20]["error_id"] is None  # user 1 never errors


@pytest.fixture(scope="module")
def window_dir(tmp_path_factory):
    """Interval-join boundary fixture: views at exactly -W (excluded),
    -W+1 (included), 0 (included), +1 (excluded, after purchase)."""
    d = str(tmp_path_factory.mktemp("ivjoin"))
    W = temporal.WINDOW_JOIN_SEC
    _write_events(
        d,
        [
            # user 1: one purchase at t=W, four views straddling the window
            (10, 0, 1, "view"),          # lag == W -> excluded (open bound)
            (11, 1, 1, "view"),          # lag == W-1 -> included
            (12, W, 1, "view"),          # lag == 0 (same second) -> included
            (13, W + 1, 1, "view"),      # after the purchase -> excluded
            (20, W, 1, "purchase"),
            # user 1: a SECOND purchase later; view 13 is in ITS window
            (21, W + 100, 1, "purchase"),
            # user 2: purchase with no views at all -> no rows (inner join)
            (30, 50, 2, "purchase"),
            # user 3: view-only user -> no rows
            (40, 50, 3, "view"),
        ],
    )
    return d


def test_interval_join_window_bounds_and_multiplicity(ray_session, window_dir):
    W = temporal.WINDOW_JOIN_SEC
    rows = temporal.purchase_views_window(window_dir).take_all()
    got = sorted((r["purchase_id"], r["view_id"], r["lag_sec"]) for r in rows)
    assert got == [
        (20, 11, W - 1),   # -W excluded (open bound), -(W-1) included
        (20, 12, 0),       # same-second view included (closed bound)
        (21, 12, 100),     # earlier view reused by the later purchase
        (21, 13, 99),      # view after purchase 20 but inside 21's window
    ]


def test_peak_concurrency_cross_bucket_carry(ray_session, tmp_path):
    """The sweep's peak can only be correct if per-day local maxima get
    the carried prefix offset: 3 sessions opened near the end of day 0
    stay open into day 1, where 2 more open — the true peak (5) exists
    only as day-1 local max (2) + day-0 carry (3)."""
    from marc_data_migration_ray.pipelines import events as ev

    day = 86400
    w = ev.CONCURRENCY_WINDOW_SEC
    rows = []
    # 3 events in the last 10 minutes of day 0 (windows cross midnight)
    for i, off in enumerate((day - 600, day - 500, day - 400)):
        rows.append((100 + i, off, 1, "view"))
    # 2 events early in day 1, inside those still-open windows
    rows.append((200, day + 100, 2, "view"))
    rows.append((201, day + 150, 3, "view"))
    _write_events(str(tmp_path), rows)
    out = ev.peak_concurrency(str(tmp_path)).to_pylist()[0]
    assert out["peak"] == 5
    # earliest second reaching 5 = the last opener
    t0 = int(T0.timestamp())
    assert out["at_sec"] == t0 + day + 150
    # and the SQL mirror agrees on the same fixture
    import duckdb
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    odf = con.execute(entry_mod.oracle_sql()["peak_concurrency"]).fetchdf()
    assert int(odf.peak[0]) == 5 and int(odf.at_sec[0]) == out["at_sec"]


def test_interval_join_matches_bruteforce_random(ray_session, tmp_path):
    """Randomized cross-check: the packed-key searchsorted expansion must
    reproduce the naive O(n²) double loop on an adversarial mix of
    duplicate timestamps, same-second purchase+view, and multi-user
    interleaving."""
    import numpy as np

    from marc_data_migration_ray.pipelines import temporal as tp

    rng = np.random.default_rng(11)
    n = 400
    rows = []
    for eid in range(n):
        user = int(rng.integers(1, 6))
        off = int(rng.integers(0, 3 * tp.WINDOW_JOIN_SEC))
        typ = "purchase" if rng.random() < 0.4 else "view"
        rows.append((eid, off, user, typ))
    d = str(tmp_path)
    _write_events(d, rows)
    got = sorted(
        (r["purchase_id"], r["view_id"]) for r in
        tp.purchase_views_window(d).take_all()
    )
    t0 = int(T0.timestamp())
    want = []
    for pe, po, pu, pt in rows:
        if pt != "purchase":
            continue
        psec = t0 + po
        for ve, vo, vu, vt in rows:
            if vt != "view" or vu != pu:
                continue
            vsec = t0 + vo
            if psec - tp.WINDOW_JOIN_SEC < vsec <= psec:
                want.append((pe, ve))
    assert got == sorted(want)
