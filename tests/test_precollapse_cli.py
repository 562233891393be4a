"""Pre-collapse state-equality (skew mitigation) + CLI smoke tests."""

import json
import os
import subprocess
import sys

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pc_fixture"))
    # heavy skew: 2 hot keys receive 60% of events
    fixtures.write_fixture(
        root, n_rows=150, n_events=2000, n_epochs=2, seed=55,
        hot_keys=2, hot_frac=0.6, schema_change_frac=0.0,
    )
    return root


def _final_state(root, fixture_dir, cfg):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    rows = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
    return [
        {k: (list(v) if k == "tokens" and v is not None else v) for k, v in r.items()}
        for r in rows
    ], rp


def _routes(rp, n_epochs=2):
    out = {}
    for e in range(n_epochs):
        for k, v in rp.manifest.epoch_entry(e)["routes"].items():
            out[k] = out.get(k, 0) + v
    return out


def test_precollapse_state_identical(ray_session, fixture_dir, tmp_path):
    """precollapse_updates strips superseded hot-key update payloads at
    ingest (kept-but-stripped): folded STATE, route counts AND audit rows
    must all be identical to an uncollapsed run."""
    import glob

    import pyarrow.parquet as pq

    plain, rp_plain = _final_state(
        str(tmp_path / "plain"), fixture_dir, ReplayConfig(num_partitions=8)
    )
    coll, rp = _final_state(
        str(tmp_path / "coll"), fixture_dir,
        ReplayConfig(num_partitions=8, precollapse_updates=True),
    )
    assert plain == coll
    # kept-but-stripped: no event disappears from counts or audit
    assert _routes(rp) == _routes(rp_plain)
    assert sum(_routes(rp).values()) == 2000
    assert rp.audit_dataset(0).count() == rp_plain.audit_dataset(0).count()
    # superseded hot-key updates are present, flagged, and payload-free
    deltas = glob.glob(os.path.join(str(tmp_path / "coll"), "**", "*.parquet"),
                       recursive=True)
    n_collapsed = n_collapsed_tok = 0
    for f in deltas:
        t = pq.read_table(f, columns=["collapsed", "tokens"])
        mask = t["collapsed"].combine_chunks().to_numpy(zero_copy_only=False)
        n_collapsed += int(mask.sum())
        n_collapsed_tok += t.filter(mask)["tokens"].null_count
    # hot-key fixture produces superseded updates in every batch; the exact
    # count scales with ingest batch size (ingest splits by cluster CPU
    # count), so assert presence, not a layout-dependent magnitude
    assert n_collapsed > 20
    assert n_collapsed_tok == n_collapsed  # every flagged row is stripped


def test_cli_end_to_end(ray_session, tmp_path):
    """Drive the CLI as a user would (fresh subprocesses own their Ray)."""
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    root = str(tmp_path / "clifix")
    table = str(tmp_path / "clitable")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "marc_data_migration_ray", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r.stdout

    out = run("gen-fixture", "--root", root, "--rows", "80", "--events", "300",
              "--epochs", "2", "--seed", "3")
    assert json.loads(out.splitlines()[-1])["binlog_rows"] == 300

    out = run("apply", "--table", table, "--epoch", "0",
              "--binlog", os.path.join(root, "binlog", "epoch=0"),
              "--base", os.path.join(root, "base"), "--num-partitions", "4")
    entry = json.loads(out.splitlines()[-1])
    assert entry["processed"] == 150

    out = run("apply", "--table", table, "--epoch", "1",
              "--binlog", os.path.join(root, "binlog", "epoch=1"),
              "--num-partitions", "4")
    out = run("state", "--table", table, "--limit", "3", "--num-partitions", "4")
    lines = [json.loads(x) for x in out.strip().splitlines()]
    assert lines[-1]["total_rows"] > 0

    out = run("metrics", "--table", table, "--num-partitions", "4")
    m = json.loads(out.splitlines()[-1])
    assert "routes" in m and m["rows"] == lines[-1]["total_rows"]

    out = run("compact", "--table", table, "--num-partitions", "4")
    assert "compacted_to" in json.loads(out.splitlines()[-1])

    # reference §3.3 report utilities
    out = run("report", "routes", "--binlog", os.path.join(root, "binlog", "epoch=0"),
              "--num-partitions", "4")
    r = json.loads(out.splitlines()[-1])
    assert r["processed"] == 150

    out = run("report", "dup-keys", "--binlog", os.path.join(root, "binlog", "epoch=0"),
              "--num-partitions", "4", "--limit", "5")
    assert json.loads(out.splitlines()[-1])["dup_keys_shown"] >= 1

    # reference §3.2 plugin-only transform (--modify-recs analog)
    state_dir = str(tmp_path / "state_out")
    run("state", "--table", table, "--out", state_dir, "--num-partitions", "4")
    mod_dir = str(tmp_path / "modified")
    out = run("modify", "--input", state_dir, "--out", mod_dir,
              "--policy", "marc_data_migration_ray.plugins.sample_policy",
              "--num-partitions", "4")
    assert json.loads(out.splitlines()[-1])["rows"] > 0
    assert any(d.startswith("online_p=") for d in os.listdir(mod_dir))


def test_cli_salted_fuzzy001_roundtrip(fixture_dir, tmp_path):
    """CLI flags --num-salts / --fuzzy-001-test round-trip through
    apply → state → metrics in subprocesses (fresh Ray sessions)."""
    table = str(tmp_path / "t")
    env = dict(os.environ)
    base_args = ["--num-partitions", "4", "--num-salts", "2", "--fuzzy-001-test"]
    for e in range(2):
        out = subprocess.run(
            [sys.executable, "-m", "marc_data_migration_ray", "apply",
             "--table", table, "--epoch", str(e),
             "--binlog", os.path.join(fixture_dir, "binlog", f"epoch={e}"),
             "--base", os.path.join(fixture_dir, "base"), *base_args],
            capture_output=True, text=True, env=env,
        )
        assert out.returncode == 0, out.stderr[-800:]
        entry = json.loads(out.stdout.strip().splitlines()[-1])
        assert entry["processed"] > 0
    out = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "metrics",
         "--table", table, *base_args],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0, out.stderr[-800:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["rows"] > 0 and sum(m["routes"].values()) > 0
    # mismatching salt layout via CLI is refused
    out = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "metrics",
         "--table", table, "--num-partitions", "4", "--num-salts", "3"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode != 0 and "salt layout" in out.stderr


def test_cli_follow_and_auto_compact(ray_session, tmp_path):
    """`follow` tails the binlog root and applies epochs in order with
    exactly-once resume; auto_compact_epochs keeps merge-on-read bounded
    while state stays oracle-equal."""
    import json

    import pyarrow.parquet as pq

    from marc_data_migration_ray import oracle
    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.pipelines.replay import Replayer
    from marc_data_migration_ray.sources import fixtures

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    root = str(tmp_path / "fix")
    fixtures.write_fixture(root, n_rows=60, n_events=400, n_epochs=3, seed=11)
    table = str(tmp_path / "ftable")

    r = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", os.path.join(root, "binlog"),
         "--base", os.path.join(root, "base"), "--num-partitions", "4",
         "--until-epoch", "1", "--poll", "0.1"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert [x.get("applied_epoch") for x in lines[:-1]] == [0, 1]
    # resume: a second follow starts AFTER the committed epochs
    r2 = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", os.path.join(root, "binlog"),
         "--num-partitions", "4", "--until-epoch", "2", "--poll", "0.1"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines2 = [json.loads(x) for x in r2.stdout.strip().splitlines()]
    assert [x.get("applied_epoch") for x in lines2[:-1]] == [2]
    # resume where until_epoch is ALREADY committed: exit at once, apply
    # nothing (regression: used to poll forever / over-apply)
    r3 = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", os.path.join(root, "binlog"),
         "--num-partitions", "4", "--until-epoch", "1", "--poll", "0.1"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    done = json.loads(r3.stdout.strip().splitlines()[-1])
    assert done["followed"] == [] and done["next_epoch"] == 3

    # auto_compact_epochs=2: same fixture through the library path
    cfg = ReplayConfig(num_partitions=4, auto_compact_epochs=2)
    rp = Replayer(str(tmp_path / "atable"), cfg,
                  base_path=os.path.join(root, "base"))
    for e in range(3):
        rp.apply_epoch(e, os.path.join(root, "binlog", f"epoch={e}"))
    assert rp.manifest.last_compacted_epoch() >= 1  # compaction auto-ran
    base = pq.read_table(os.path.join(root, "base")).to_pylist()
    evs = []
    for e in range(3):
        d = os.path.join(root, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            evs += pq.read_table(os.path.join(d, f)).to_pylist()
    o = oracle.replay(base, evs, cfg)
    eng = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
    assert len(eng) == len(o["final"])
    for a, b in zip(eng, o["final"]):
        assert a["last_lsn"] == b["last_lsn"] and a["n_tok"] == b["n_tok"]


def test_two_process_concurrent_apply(ray_session, tmp_path):
    """Two OS processes apply different epochs to the SAME table at the
    same time: both CAS-commit, final state equals the oracle."""
    import json

    import pyarrow.parquet as pq

    from marc_data_migration_ray import oracle
    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.pipelines.replay import Replayer
    from marc_data_migration_ray.sources import fixtures

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    root = str(tmp_path / "fix")
    fixtures.write_fixture(root, n_rows=60, n_events=400, n_epochs=2, seed=13)
    table = str(tmp_path / "ctable")
    # create the table (manifest) first so both writers share one layout
    cfg = ReplayConfig(num_partitions=4)
    Replayer(table, cfg, base_path=os.path.join(root, "base"))

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "marc_data_migration_ray", "apply",
             "--table", table, "--epoch", str(e),
             "--binlog", os.path.join(root, "binlog", f"epoch={e}"),
             "--num-partitions", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo",
        )
        for e in (0, 1)
    ]
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-2000:]
        json.loads(out.strip().splitlines()[-1])  # valid commit entry

    rp = Replayer(table, cfg)
    assert rp.manifest.committed_epochs() == [0, 1]
    base = pq.read_table(os.path.join(root, "base")).to_pylist()
    evs = []
    for e in range(2):
        d = os.path.join(root, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            evs += pq.read_table(os.path.join(d, f)).to_pylist()
    o = oracle.replay(base, evs, cfg)
    eng = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
    assert len(eng) == len(o["final"])
    for a, b in zip(eng, o["final"]):
        assert a["last_lsn"] == b["last_lsn"] and list(a["tokens"] or []) == list(b["tokens"] or [])


def test_lsn_cut_over_stripped_rows_refuses(ray_session, fixture_dir,
                                            tmp_path):
    """Code-review r5 (reproduced): a mid-epoch lsn cut between a
    precollapsed (stripped) update and its within-batch winner would let
    the stripped row win with tokens=NULL — the payload is gone from
    disk, so the engine must REFUSE such cuts loudly. Cuts at or above
    the winner stay exact; an uncollapsed table serves every cut."""
    import glob

    import pyarrow.parquet as pq
    import pytest as _pytest

    coll_rows, rp = _final_state(
        str(tmp_path / "c"), fixture_dir,
        ReplayConfig(num_partitions=8, precollapse_updates=True))
    plain_rows, rp_plain = _final_state(
        str(tmp_path / "p"), fixture_dir, ReplayConfig(num_partitions=8))
    # find a stripped row and its within-batch winner from the deltas
    stripped = None
    for f in sorted(glob.glob(os.path.join(
            rp.root, "deltas", "**", "*.parquet"), recursive=True)):
        t = pq.read_table(f, columns=["key", "lsn", "collapsed"])
        for k, l, c in zip(t["key"].to_pylist(), t["lsn"].to_pylist(),
                           t["collapsed"].to_pylist()):
            if c:
                stripped = (k, l)
                break
        if stripped:
            break
    assert stripped is not None, "fixture must strip at least one row"
    key, lsn = stripped
    # cut AT the stripped row's lsn: the winner is filtered -> refuse
    with _pytest.raises(ValueError, match="precollapse"):
        rp.lookup([key], up_to_lsn=lsn).take_all()
    # the uncollapsed table serves the same cut fine
    ok = rp_plain.lookup([key], up_to_lsn=lsn).take_all()
    assert isinstance(ok, list)
    # per-event lineage refuses too (every event lsn is a cut)
    with _pytest.raises(Exception, match="precollapse"):
        rp.doc_history(key, with_payload=True, with_versions=True)
    # full-state reads (no cut) stay exact — pinned above already
    assert coll_rows == plain_rows
