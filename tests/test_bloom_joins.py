"""Bloom-filter join primitives: no false negatives (ever), useful
selectivity, and the end-to-end ops' bloom-bypass accounting.

The DuckDB value parity of `urgent_lineitem_flags` and
`customers_without_urgent_orders` is covered by test_queries_vs_duckdb; these
tests pin the properties the SQL comparison can't see — that the bitmap never
drops a true match (exactness argument) and that the prefilter actually
prunes (scale argument).
"""

import numpy as np
import pyarrow as pa
import pytest

from marc_data_migration_ray.pipelines import joins

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=20_000, dtype=np.int64)
    bitmap = np.zeros(joins.BLOOM_BITS // 8, dtype=np.uint8)
    joins._bloom_add(bitmap, keys)
    assert joins._bloom_test(bitmap, keys).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    bitmap = np.zeros(joins.BLOOM_BITS // 8, dtype=np.uint8)
    joins._bloom_add(bitmap, members)
    # disjoint probe set (shift into the negative range)
    probes = -rng.integers(1, 2**62, size=50_000, dtype=np.int64)
    fp = joins._bloom_test(bitmap, probes).mean()
    # m/n ≈ 21 bits/key, k=4 → theoretical fp ≈ 0.24%; allow 4x slack
    assert fp < 0.01, fp


def test_bloom_merge_is_union():
    a = np.zeros(joins.BLOOM_BITS // 8, dtype=np.uint8)
    b = np.zeros(joins.BLOOM_BITS // 8, dtype=np.uint8)
    k1 = np.arange(1000, dtype=np.int64)
    k2 = np.arange(1000, 2000, dtype=np.int64)
    joins._bloom_add(a, k1)
    joins._bloom_add(b, k2)
    merged = np.bitwise_or(a, b)
    assert joins._bloom_test(merged, k1).all()
    assert joins._bloom_test(merged, k2).all()


def test_distributed_bloom_build_matches_local(ray_session):
    import pyarrow.dataset as pads

    from marc_data_migration_ray.sources import readers

    ds = readers.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == pads.scalar("1-URGENT"),
    )
    distributed = joins.build_key_bloom(ds, "o_orderkey")

    import pyarrow.parquet as pq

    t = pq.read_table(SF_DIR + "/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    keys = t.filter(pa.compute.equal(t["o_orderpriority"], "1-URGENT"))[
        "o_orderkey"
    ].to_numpy(zero_copy_only=False)
    local = joins._bloom_add(np.zeros(joins.BLOOM_BITS // 8, dtype=np.uint8), keys)
    assert np.array_equal(distributed, local)


def test_bloom_prefilter_prunes_probe_side(ray_session):
    """The semi-join's bloom stage must pass (all true matches) and prune
    (strictly fewer rows than the full probe side) — the scale argument."""
    import duckdb
    import ray

    from marc_data_migration_ray.sources import readers

    urgent = readers.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).filter(lambda r: r["o_orderpriority"] == "1-URGENT")
    bloom_ref = ray.put(joins.build_key_bloom(urgent, "o_orderkey"))
    items = readers.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    total = items.count()
    kept = items.map_batches(
        joins.BloomKeep,
        fn_constructor_args=(bloom_ref, "l_orderkey"),
        batch_format="pyarrow",
        concurrency=(1, 2),
    ).count()
    true_matches = duckdb.sql(
        f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet' WHERE l_orderkey IN "
        f"(SELECT o_orderkey FROM '{SF_DIR}/orders.parquet' "
        f"WHERE o_orderpriority = '1-URGENT')"
    ).fetchone()[0]
    assert kept >= true_matches          # no false negatives end-to-end
    assert kept < total                  # and it actually pruned
    # prune factor should be roughly the urgent-order share (~20%), not ~100%
    assert kept / total < 0.5, (kept, total)


def test_salted_join_matches_unsalted_under_skew(ray_session):
    """One hot key holding 50% of the left side: the salted join must
    produce exactly the multiset of the plain inner join (no dup/drop at
    salt boundaries), including multi-row right sides (row multiplication
    across every salt)."""
    import numpy as np
    import pyarrow as pa
    import polars as pl
    import ray.data

    from marc_data_migration_ray.pipelines.joins import salted_inner_join

    rng = np.random.default_rng(7)
    n = 4000
    hot = np.full(n // 2, 42, dtype=np.int64)
    cold = rng.integers(0, 500, n // 2)
    lkey = np.concatenate([hot, cold])
    left = pa.table({"k": pa.array(lkey), "lv": pa.array(np.arange(n, dtype=np.int64))})
    # right: every key 0..499 once, key 42 has THREE rows (1:N fan-out)
    rk = np.concatenate([np.arange(500, dtype=np.int64), [42, 42]])
    right = pa.table({"rk": pa.array(rk), "rv": pa.array(rk * 10)})

    got = salted_inner_join(
        ray.data.from_arrow(left).repartition(8),
        ray.data.from_arrow(right).repartition(4),
        "k", "rk", num_salts=4,
    ).take_all()
    want = (
        pl.from_arrow(left)
        .join(pl.from_arrow(right), left_on="k", right_on="rk", how="inner")
        .to_dicts()
    )
    got_s = sorted(((r["k"], r["lv"], r["rv"]) for r in got))
    want_s = sorted(((r["k"], r["lv"], r["rv"]) for r in want))
    assert got_s == want_s
    # the hot key's 1:3 fan-out must survive salting exactly
    assert sum(1 for r in got_s if r[0] == 42) == int((lkey == 42).sum()) * 3
