"""`follow --refresh-view`: heterogeneous materialized views (agg /
postings / scalar-index) kept fresh during streaming ingest — type is
read from each view's META.json `kind` (views.open_view), first refresh
is a full build, later epochs refresh incrementally, and final contents
equal fresh rebuilds at the head epoch.
"""

import json
import os
import subprocess
import sys

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.pipelines.views import (
    AggView,
    MinHashIndexView,
    PostingsView,
    ScalarIndexView,
    open_view,
)
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 3


def test_follow_refresh_views(ray_session, tmp_path):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    fix = str(tmp_path / "fix")
    # no DDL so the scalar index's physical column stays the public name
    fixtures.write_fixture(fix, n_rows=80, n_events=500, n_epochs=N_EPOCHS,
                           seed=23, schema_change_frac=0.0)
    table = str(tmp_path / "t")
    cfg = ReplayConfig(num_partitions=4)

    # register the three views (META only — no refresh yet); the follow
    # subprocess reconstructs each from its kind tag
    rp0 = Replayer(table, cfg, base_path=os.path.join(fix, "base"))
    roots = {
        "agg": str(tmp_path / "v_agg"),
        "postings": str(tmp_path / "v_post"),
        "sidx": str(tmp_path / "v_sidx"),
        "mh": str(tmp_path / "v_mh"),
    }
    AggView(roots["agg"], rp0, keys=("source",), sums=("n_tok",))
    PostingsView(roots["postings"], rp0, n_buckets=8)
    ScalarIndexView(roots["sidx"], rp0, column="n_tok", bin_width=8)
    MinHashIndexView(roots["mh"], rp0, n_buckets=8)

    r = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", os.path.join(fix, "binlog"),
         "--base", os.path.join(fix, "base"), "--num-partitions", "4",
         "--until-epoch", str(N_EPOCHS - 1), "--poll", "0.1",
         "--refresh-view", roots["agg"],
         "--refresh-view", roots["postings"],
         "--refresh-view", roots["sidx"],
         "--refresh-view", roots["mh"]],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    applied = [x for x in lines if "applied_epoch" in x]
    assert [x["applied_epoch"] for x in applied] == list(range(N_EPOCHS))
    for i, x in enumerate(applied):
        modes = {root: x["views"][root]["mode"] for root in roots.values()}
        want = "full" if i == 0 else "incremental"
        assert set(modes.values()) == {want}, (i, modes)

    # final view contents == fresh rebuilds at the head epoch
    rp = Replayer(table, cfg)
    for name, root in roots.items():
        v = open_view(root, rp)
        assert v.last_epoch() == N_EPOCHS - 1
        fresh = {
            "agg": lambda: AggView(str(tmp_path / "f_agg"), rp,
                                   keys=("source",), sums=("n_tok",)),
            "postings": lambda: PostingsView(str(tmp_path / "f_post"), rp,
                                             n_buckets=8),
            "sidx": lambda: ScalarIndexView(str(tmp_path / "f_sidx"), rp,
                                            column="n_tok", bin_width=8),
            "mh": lambda: MinHashIndexView(str(tmp_path / "f_mh"), rp,
                                           n_buckets=8),
        }[name]()
        fresh.refresh()
        assert v.read().equals(fresh.read()), name


def test_open_view_errors(ray_session, tmp_path):
    fix = str(tmp_path / "fix")
    fixtures.write_fixture(fix, n_rows=30, n_events=60, n_epochs=1, seed=3)
    rp = Replayer(str(tmp_path / "t"), ReplayConfig(num_partitions=2),
                  base_path=os.path.join(fix, "base"))
    with pytest.raises(ValueError, match="META"):
        open_view(str(tmp_path / "nope"), rp)
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "META.json"), "w") as f:
        f.write(json.dumps({"kind": "wat"}))
    with pytest.raises(ValueError, match="unknown view kind"):
        open_view(bad, rp)
    # agg stickiness: reopen with omitted args adopts the stored META;
    # explicit mismatched args raise
    a = AggView(str(tmp_path / "va"), rp, keys=("status",), sums=("last_lsn",))
    re = AggView(str(tmp_path / "va"), rp)  # omitted → META wins
    assert re.keys == ("status",) and re.sums == ("last_lsn",)
    with pytest.raises(ValueError, match="built with keys"):
        AggView(str(tmp_path / "va"), rp, keys=("source",))
    assert isinstance(open_view(str(tmp_path / "va"), rp), AggView)


def test_follow_dedup_gate(ray_session, tmp_path):
    """`follow --dedup-gate-view`: before each epoch applies, its
    insert/update payloads are probed against the MinHash index over
    CURRENT state and verified near-dups are reported — a planted
    epoch-1 update copying doc A's tokens onto doc B must surface
    (B, A, 1.0) in the gate report BEFORE the epoch lands."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    fix = str(tmp_path / "fix")
    fixtures.write_fixture(fix, n_rows=80, n_events=400, n_epochs=1,
                           seed=29, schema_change_frac=0.0)
    table = str(tmp_path / "t")
    cfg = ReplayConfig(num_partitions=4)
    mh_root = str(tmp_path / "v_mh")
    rp0 = Replayer(table, cfg, base_path=os.path.join(fix, "base"))
    MinHashIndexView(mh_root, rp0, n_buckets=8)

    # learn post-epoch-0 state on a SCRATCH table to pick the plant pair
    scratch = Replayer(str(tmp_path / "scratch"), cfg,
                       base_path=os.path.join(fix, "base"))
    scratch.apply_epoch(0, os.path.join(fix, "binlog", "epoch=0"))
    state = {r["doc_id"]: list(r["tokens"] or [])
             for r in scratch.read_state().take_all()}
    busy = [d for d, tk in sorted(state.items()) if len(tk) >= 3]
    a, b = busy[0], busy[1]

    ep0 = os.path.join(fix, "binlog", "epoch=0")
    ref_schema = pq.read_schema(
        os.path.join(ep0, sorted(os.listdir(ep0))[0]))
    row = {
        "lsn": 10_000, "epoch": 1, "op": "update", "doc_id": b,
        "tokens": state[a], "n_tok": len(state[a]), "source": "planted",
        "column_mask": [], "match_score": 100,
        "title": None, "match_title": None, "extra_json": None,
        "schema_kind": None, "schema_name": None, "schema_new_name": None,
    }
    d1 = os.path.join(fix, "binlog", "epoch=1")
    os.makedirs(d1)
    pq.write_table(
        pa.Table.from_pylist([{k: row.get(k) for k in ref_schema.names}],
                             schema=ref_schema),
        os.path.join(d1, "part-0.parquet"))

    rep = str(tmp_path / "gate_report")
    r = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", os.path.join(fix, "binlog"),
         "--base", os.path.join(fix, "base"), "--num-partitions", "4",
         "--until-epoch", "1", "--poll", "0.1",
         "--refresh-view", mh_root,
         "--dedup-gate-view", mh_root,
         "--dedup-gate-report", rep],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    applied = {x["applied_epoch"]: x for x in lines if "applied_epoch" in x}
    assert set(applied) == {0, 1}
    assert "dedup_gate" not in applied[0]  # view unrefreshed before ep 0
    assert applied[1]["dedup_gate"]["pairs"] >= 1
    got = pq.read_table(os.path.join(rep, "epoch=1.parquet")).to_pylist()
    pairs = {(x["incoming_id"], x["dup_of"]): x["jaccard"] for x in got}
    assert pairs.get((b, a)) == 1.0, pairs
