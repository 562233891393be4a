"""Randomized property tests: for many seeds × configs, the vectorized fold
must equal the pure-Python oracle exactly (no Ray — fold called directly).
"""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.stages.fold import fold_bucket
from marc_data_migration_ray.stages.parse import ParseRoute, PrepBase
from marc_data_migration_ray.stages.precollapse import precollapse_batch


def _engine_rows(base, binlog, cfg, precollapse=False):
    ev = ParseRoute(cfg)(binlog)
    if precollapse:
        ev = precollapse_batch(ev)
    parsed = pa.concat_tables([PrepBase(cfg)(base), ev])
    out = fold_bucket(parsed, cfg)
    rows = out.filter(pc.equal(out["_kind"], "row"))
    return sorted(
        rows.select(
            ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status", "candidate_key"]
        ).to_pylist(),
        key=lambda r: r["doc_id"],
    )


def _norm(rows):
    return [
        {k: (list(v) if k == "tokens" and v is not None else v) for k, v in r.items()}
        for r in rows
    ]


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606, 707, 808])
def test_random_seed_replay(seed):
    cfg = ReplayConfig(
        num_partitions=1 + seed % 16,
        fuzzy_threshold=(seed * 7) % 101,
        require_perfect=bool(seed % 3 == 0),
        fuzzy_001_test=bool(seed % 4 == 0),
        strategy="replace_only" if seed % 2 else "replace_and_add",
        check_constraints=(
            (("band", "n_tok", "between", (seed % 40, 90 + seed % 60)),)
            if seed % 5 == 0 else ()
        ),
    )
    base = fixtures.make_base_table(
        n_rows=50 + seed % 100, seed=seed,
        noise_frac=(seed % 5) / 5.0, dup_frac=(seed % 4) / 10.0,
    )
    binlog = fixtures.make_binlog(
        n_events=300 + seed % 500, n_base_rows=base.num_rows, seed=seed + 1,
        hot_keys=1 + seed % 5, hot_frac=(seed % 8) / 10.0,
        malformed_frac=(seed % 3) / 50.0, invalid_key_frac=(seed % 4) / 20.0,
        schema_change_frac=0.0,
    )
    o = oracle.replay(base.to_pylist(), binlog.to_pylist(), cfg)
    got = _norm(_engine_rows(base, binlog, cfg))
    want = _norm(
        [
            {k: v for k, v in r.items()}
            for r in o["final"]
        ]
    )
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", [111, 222, 333])
def test_random_seed_precollapse_state_preserving(seed):
    cfg = ReplayConfig(num_partitions=4)
    base = fixtures.make_base_table(n_rows=60, seed=seed)
    binlog = fixtures.make_binlog(
        n_events=800, n_base_rows=60, seed=seed + 9,
        hot_keys=2, hot_frac=0.5, schema_change_frac=0.0,
    )
    plain = _norm(_engine_rows(base, binlog, cfg))
    coll = _norm(_engine_rows(base, binlog, cfg, precollapse=True))
    assert plain == coll
