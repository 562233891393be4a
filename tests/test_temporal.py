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
