"""Rate-limited external-enrichment stage (stages/enrich.py — the
reference's throttled 3-try authority lookup, record_update.py:777-809,
as an actor-pool stage).

Invariants:
* token bucket: under a fake clock, N acquires at rate r with burst b
  sleep exactly (N - b) / r seconds total — the quota a real external
  API enforces;
* retries: a transient key is attempted twice and succeeds; a permanent
  key exhausts the full try budget (the reference's 3) and DEAD-LETTERS
  in-band (status='failed', null value) — never dropped;
* the driver query through the REAL actor pool equals the DuckDB oracle
  arithmetic (portable md5 convention).
"""

import pyarrow as pa
import pytest

from marc_data_migration_ray.stages.enrich import (EnrichStage,
                                                   FixtureEnrichService,
                                                   TokenBucket, md5_number)

SF = "/root/testdata/sf0.001"


class FakeClock:
    def __init__(self):
        self.now = 0.0
        self.slept = 0.0

    def time(self):
        return self.now

    def sleep(self, s):
        assert s >= 0
        self.slept += s
        self.now += s


def test_token_bucket_enforces_rate():
    clk = FakeClock()
    b = TokenBucket(rate_per_sec=10, burst=2,
                    time_fn=clk.time, sleep_fn=clk.sleep)
    for _ in range(12):
        b.acquire()
    # 2 from the burst, 10 refilled over exactly 1.0 fake seconds
    assert clk.slept == pytest.approx(1.0, abs=1e-6)


def test_token_bucket_refills_while_idle():
    clk = FakeClock()
    b = TokenBucket(rate_per_sec=5, burst=1,
                    time_fn=clk.time, sleep_fn=clk.sleep)
    b.acquire()          # burst token
    clk.now += 10.0      # long idle: refills to cap (1), not 50
    b.acquire()          # free (capped refill)
    b.acquire()          # must wait 1/5 s
    assert clk.slept == pytest.approx(0.2, abs=1e-6)


def _keys_by_kind(n=400, fail_mod=17, transient_mod=5):
    ok, transient, fail = [], [], []
    for i in range(n):
        k = str(i)
        m = md5_number(k)
        if m % fail_mod == 0:
            fail.append(k)
        elif m % transient_mod == 0:
            transient.append(k)
        else:
            ok.append(k)
    return ok, transient, fail


def test_retry_and_deadletter_routing():
    ok, transient, fail = _keys_by_kind()
    assert transient and fail  # the arithmetic must exercise both paths
    clk = FakeClock()
    stage = EnrichStage(key_col="k", max_retries=3, backoff_s=0.5,
                        time_fn=clk.time, sleep_fn=clk.sleep)
    t = stage(pa.table({"k": pa.array(ok + transient + fail, pa.string())}))
    rows = {r["k"]: r for r in t.to_pylist()}
    for k in ok:
        assert rows[k]["enrich_status"] == "ok"
        assert rows[k]["enrich_attempts"] == 1
        assert rows[k]["authority"] == f"auth-{md5_number(k) % 100000}"
    for k in transient:
        assert rows[k]["enrich_status"] == "ok"
        assert rows[k]["enrich_attempts"] == 2  # failed once, retried
    for k in fail:
        assert rows[k]["enrich_status"] == "failed"
        assert rows[k]["enrich_attempts"] == 3  # the reference's budget
        assert rows[k]["authority"] is None
    # per-key attempts recorded by the service agree with the row counts
    for k, n in stage.service.attempts.items():
        assert n == rows[k]["enrich_attempts"]
    # linear backoff between failed tries: transient pays 1×0.5s,
    # permanent pays 0.5 + 1.0 (no sleep after the final try)
    want = 0.5 * len(transient) + 1.5 * len(fail)
    assert clk.slept == pytest.approx(want, abs=1e-6)


def test_enrich_authority_matches_oracle(ray_session):
    import duckdb

    from marc_data_migration_ray.pipelines.enrichment import (
        ENRICH_AUTHORITY_SQL, enrich_authority)

    got = sorted(
        (r["doc_id"], r["authority"], r["enrich_status"],
         r["enrich_attempts"])
        for r in enrich_authority(SF).take_all())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF}/documents.parquet'")
    want = [tuple(r) for r in con.execute(ENRICH_AUTHORITY_SQL).fetchall()]
    con.close()
    assert got == sorted(want)
    assert any(r[2] == "failed" for r in got)  # deadletter path exercised


def test_enrich_policy_plugin_in_replay_path(ray_session, tmp_path):
    """The enrichment stage composes into the replay read path via the
    P13 policy surface: every folded state row leaves read_state()
    already stamped with authority/enrich_status per the deterministic
    service arithmetic — including dead-lettered failures."""
    import os

    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.pipelines.replay import Replayer
    from marc_data_migration_ray.sources import fixtures

    root = str(tmp_path / "fx")
    fixtures.write_fixture(root, n_rows=120, n_events=500, n_epochs=1,
                           seed=21)
    cfg = ReplayConfig(
        num_partitions=4,
        policy_plugins=("marc_data_migration_ray.plugins.enrich_policy",))
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, os.path.join(root, "binlog", "epoch=0"))
    rows = rp.read_state().take_all()
    assert rows
    seen_failed = False
    for r in rows:
        n = md5_number(r["doc_id"])
        if n % 17 == 0:
            assert r["enrich_status"] == "failed"
            assert r["authority"] is None
            assert r["enrich_attempts"] == 3
            seen_failed = True
        else:
            assert r["enrich_status"] == "ok"
            assert r["authority"] == f"auth-{n % 100000}"
    assert seen_failed or len(rows) < 17 * 3  # fixture large enough
    # the point-lookup path applies the same chain
    k = rows[0]["doc_id"]
    got = rp.lookup([k]).take_all()
    assert got and got[0]["authority"] == rows[0]["authority"]


def test_null_key_dead_letters_without_service_call():
    """Code-review r5: a null key must dead-letter in-band (failed, 0
    attempts, no service/budget use) instead of crashing the task."""
    import pyarrow as pa

    from marc_data_migration_ray.stages.enrich import EnrichStage

    calls = []

    class _Svc:
        def lookup(self, k):
            calls.append(k)
            return "v"

    st = EnrichStage.__new__(EnrichStage)
    st.service = _Svc()
    st.key_col = "doc_id"
    st.out_col = "auth"
    st.max_retries = 3
    st.backoff_s = 0.0
    st.sleep_fn = lambda s: None
    st.bucket = None
    out = st(pa.table({"doc_id": pa.array(["a", None, "b"], pa.string())}))
    assert out["enrich_status"].to_pylist() == ["ok", "failed", "ok"]
    assert out["enrich_attempts"].to_pylist() == [1, 0, 1]
    assert out["auth"].to_pylist()[1] is None
    assert calls == ["a", "b"]


def test_constraint_on_absent_column_routes_not_crashes():
    """Code-review r5: a check constraint naming a column absent from a
    batch must evaluate (absent == all-null), not raise KeyError."""
    import numpy as np
    import pyarrow as pa

    from marc_data_migration_ray.stages.parse import _constraint_masks

    t = pa.table({"n_tok": pa.array([1, 2], pa.int32())})
    fail, status = _constraint_masks(
        t, 2, [("t", "title", "not_null", None)])
    assert fail.all() and set(status) == {"check-failed:t"}
    # bounded ops on an absent column pass (cannot violate a bound)
    fail2, status2 = _constraint_masks(
        t, 2, [("g", "match_score", "ge", 10)])
    assert not fail2.any() and set(status2) == {None}
