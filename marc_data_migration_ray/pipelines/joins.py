"""Bloom-filter-accelerated distributed joins.

The reference joins every input record against an authority table one point
lookup at a time (reference `record_update.py:539-557`, J1 in SURVEY.md §2.5)
and runs its duplicate semi-join through Postgres (`check_duplicates.py:19-57`,
J2).  At 100 TB the naive recast — shuffle both sides into a hash join — moves
every probe-side block through an all-to-all exchange even though most rows
join to nothing.  The scale pattern here is the classic Bloom-filter join
(see e.g. "Access Path Selection in a Relational Database" lineage /
`PAPERS.md` distributed-join sections):

1. build a small mergeable Bloom bitmap over the build side's keys with a
   distributed tree aggregate (`ds.aggregate(AggregateFn)` — per-block
   partial bitmaps OR-merged, never concentrated on the driver as rows);
2. broadcast the bitmap once via ``ray.put`` and filter the probe side in an
   actor-pool ``map_batches`` stage (bitmap fetched once per actor in
   ``__init__``, membership test fully vectorized in numpy);
3. finish with Ray Data's native shuffle join (``left_semi`` / ``left_anti``)
   on the *survivors only* — the bloom has no false negatives, so
   semi-join survivors ⊇ true matches and anti-join "definite miss" rows can
   bypass the shuffle entirely; only bloom-positive rows (true matches plus
   an ε false-positive tail) pay for the exchange.

Both queries are exact: the bloom only prunes, the native join resolves
false positives.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
import ray.data
from ray.data.aggregate import AggregateFn

from marc_data_migration_ray.sources import readers

BLOOM_BITS = 1 << 20          # 128 KiB bitmap — fits any broadcast budget
BLOOM_K = 4                   # double-hashing probes
JOIN_PARTITIONS = 8

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wrapping arithmetic)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _MIX1
    x ^= x >> np.uint64(33)
    x *= _MIX2
    x ^= x >> np.uint64(33)
    return x


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(len(keys), BLOOM_K) bit positions via double hashing."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _mix64(u)
    h2 = _mix64(u + _GOLDEN) | np.uint64(1)
    probes = np.arange(BLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + probes * h2[:, None]) % np.uint64(BLOOM_BITS)).astype(
        np.int64
    )


def _bloom_add(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    pos = _bloom_positions(keys).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.left_shift(1, pos & 7).astype(np.uint8))
    return bitmap


def _bloom_test(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where ALL k bits are set (maybe-present)."""
    pos = _bloom_positions(keys)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def build_key_bloom(ds: "ray.data.Dataset", col: str) -> np.ndarray:
    """Distributed Bloom build: per-block partial bitmaps, tree-OR-merged.

    The aggregate moves only 128 KiB bitmaps between tasks — the build side's
    key column itself never leaves its block.
    """

    def _acc(bitmap: np.ndarray, block: pa.Table) -> np.ndarray:
        keys = block[col].to_numpy(zero_copy_only=False)
        return _bloom_add(bitmap, keys)

    agg = AggregateFn(
        init=lambda k: np.zeros(BLOOM_BITS // 8, dtype=np.uint8),
        accumulate_block=_acc,
        merge=lambda a, b: np.bitwise_or(a, b),
        name="bloom",
    )
    return ds.aggregate(agg)["bloom"]


class BloomKeep:
    """Actor-pool stage: keep rows whose key is (maybe / definitely-not) in
    the broadcast bloom.  ``ray.get`` of the bitmap happens once per actor.
    Prefer :func:`bloom_keep_fn` (task form) unless the stage has other
    expensive per-actor setup — the bitmap itself is cheap to re-get."""

    def __init__(self, bitmap_ref, col: str, keep_hits: bool = True):
        self._bitmap = ray.get(bitmap_ref)
        self._col = col
        self._keep_hits = keep_hits

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t[self._col].to_numpy(zero_copy_only=False)
        mask = _bloom_test(self._bitmap, keys)
        if not self._keep_hits:
            mask = ~mask
        return t.filter(pa.array(mask))


def bloom_keep_fn(bitmap_ref, col: str, keep_hits: bool = True):
    """Task form of :class:`BloomKeep`: the per-task ``ray.get`` of the
    128 KiB bitmap is a zero-copy shared-memory read, so a plain task pool
    (no actor startup) filters just as fast."""

    def _fn(t: pa.Table) -> pa.Table:
        bitmap = ray.get(bitmap_ref)
        keys = t[col].to_numpy(zero_copy_only=False)
        mask = _bloom_test(bitmap, keys)
        if not keep_hits:
            mask = ~mask
        return t.filter(pa.array(mask))

    return _fn


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(
        pc.round(pc.multiply(col, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def urgent_lineitem_flags(sf_dir: str) -> pa.Table:
    """Bloom semi-join: lineitems of 1-URGENT orders, aggregated per returnflag.

    (l_returnflag, n_items, revenue_cents).  The bloom prunes ~80% of
    lineitem before the semi-join shuffle (only ~20% of orders are urgent);
    the native ``left_semi`` join on the survivors resolves bloom false
    positives exactly.  The final aggregate is bounded (3 flags), so the
    reduce is a per-batch partial + tiny driver merge.
    """
    urgent = readers.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == pads.scalar("1-URGENT"),
    )
    bloom_ref = ray.put(build_key_bloom(urgent, "o_orderkey"))

    items = readers.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"],
    )
    survivors = items.map_batches(
        bloom_keep_fn(bloom_ref, "l_orderkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    exact = survivors.join(
        urgent,
        join_type="left_semi",
        num_partitions=JOIN_PARTITIONS,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"l_returnflag": t["l_returnflag"], "cents": _cents(t["l_extendedprice"])}
        )
        return g.group_by("l_returnflag").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    partials = exact.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    final = tbl.group_by("l_returnflag").aggregate(
        [("cents_sum", "sum"), ("cents_count", "sum")]
    )
    return pa.table(
        {
            "l_returnflag": final["l_returnflag"],
            "n_items": pc.cast(final["cents_count_sum"], pa.int64()),
            "revenue_cents": pc.cast(final["cents_sum_sum"], pa.int64()),
        }
    ).sort_by([("l_returnflag", "ascending")])


def urgent_lineitem_flags_sql() -> str:
    return (
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


def customers_without_urgent_orders(sf_dir: str) -> "ray.data.Dataset":
    """Bloom anti-join: customers that never placed a 1-URGENT order.

    (c_custkey, c_name, acct_cents).  Bloom "definite miss" customers are
    *final* results without touching the join shuffle (no false negatives);
    only bloom-positive customers — true urgent purchasers plus the ε
    false-positive tail — go through the native ``left_anti`` join, whose
    right side is per-batch-deduped custkeys.
    """
    okeys = readers.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == pads.scalar("1-URGENT"),
    ).map_batches(
        # per-batch dedup: shrinks the anti-join's right side before the
        # shuffle (orders repeat custkeys ~10x)
        lambda t: pa.table({"o_custkey": pc.unique(t["o_custkey"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bloom_ref = ray.put(build_key_bloom(okeys, "o_custkey"))

    def _cust():
        return readers.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_acctbal"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "c_name": t["c_name"],
                    "acct_cents": _cents(t["c_acctbal"]),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    definite = _cust().map_batches(
        bloom_keep_fn(bloom_ref, "c_custkey", keep_hits=False),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    candidates = _cust().map_batches(
        bloom_keep_fn(bloom_ref, "c_custkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    fp_tail = candidates.join(
        okeys,
        join_type="left_anti",
        num_partitions=JOIN_PARTITIONS,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return definite.union(fp_tail).sort("c_custkey")


JOIN_SALTS = 4  # default sub-partitions per hot key (keep small; see NOTES)


def salted_inner_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    num_salts: int = JOIN_SALTS,
    num_partitions: int = JOIN_PARTITIONS,
) -> "ray.data.Dataset":
    """Skew-salted inner equi-join: the hot-key mitigation for
    ``Dataset.join`` (north-star "salted sub-partitions", applied to joins
    the way ``stages/fold.py`` applies it to the LWW fold).

    A native hash join sends EVERY row of a pathological key to one
    partition — one task's memory holds the key's whole payload. Salting
    splits it: each LEFT row gets a salt in ``[0, S)`` (round-robin within
    the batch — correctness needs no particular assignment, only that each
    left row carries exactly one salt), the RIGHT side is replicated S×
    (one copy per salt), and the join runs on ``(key, salt)`` — so a hot
    key's left rows land in S different partitions, each joining against
    its own copy of the key's right rows.

    Cost model (when to use): right side pays S× shuffle volume; the hot
    key's per-task payload drops to ~1/S. Worth it when the LEFT side is
    skewed and the RIGHT side is the small/bounded one (dimension tables,
    per-key metadata); useless for balanced keys — hence opt-in, not the
    ``Dataset.join`` default.
    """

    def _salt_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__salt", pa.array(np.arange(t.num_rows, dtype=np.int64) % num_salts)
        )

    def _replicate_right(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            t.append_column(
                "__salt", pa.array(np.full(t.num_rows, s, dtype=np.int64))
            )
            for s in range(num_salts)
        )

    lsalted = left.map_batches(_salt_left, batch_format="pyarrow", zero_copy_batch=True)
    rsalted = right.map_batches(
        _replicate_right, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = lsalted.join(
        rsalted,
        join_type="inner",
        num_partitions=num_partitions,
        on=(left_key, "__salt"),
        right_on=(right_key, "__salt"),
    )
    return joined.drop_columns(["__salt"])


def priority_revenue_salted(sf_dir: str) -> pa.Table:
    """(o_orderpriority, n_items, revenue_cents): lineitem ⋈ orders through
    the skew-salted join, aggregated per priority.

    Exercises ``salted_inner_join`` end-to-end against a SQL oracle: the
    salt must not duplicate or drop a single row or the integer revenue
    sums diverge. The final aggregate is bounded (5 priorities) — partial
    per batch, tiny driver merge."""
    items = readers.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice"],
    )
    orders = readers.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    joined = salted_inner_join(items, orders, "l_orderkey", "o_orderkey")

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _cents(t["l_extendedprice"]),
            }
        )
        return g.group_by("o_orderpriority").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    partials = joined.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    final = tbl.group_by("o_orderpriority").aggregate(
        [("cents_sum", "sum"), ("cents_count", "sum")]
    )
    return pa.table(
        {
            "o_orderpriority": final["o_orderpriority"],
            "n_items": pc.cast(final["cents_count_sum"], pa.int64()),
            "revenue_cents": pc.cast(final["cents_sum_sum"], pa.int64()),
        }
    ).sort_by([("o_orderpriority", "ascending")])


def priority_revenue_salted_sql() -> str:
    return (
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


def customers_without_urgent_orders_sql() -> str:
    return (
        "SELECT c_custkey, c_name, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents "
        "FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT') "
        "ORDER BY c_custkey"
    )
