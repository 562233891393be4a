"""End-to-end CDC replay pipeline (the flagship).

Physical plan (SURVEY §4.2) — co-partitioned, shuffle-free merge-on-read:

    binlog epoch ──read_parquet──► ParseRoute (actor pool, map_batches,
                                   zero-copy Arrow: key normalize M1-M3,
                                   gate M13-M14, route, part_id)
                 ──write_parquet(partition_cols=[part_p])──►
                    deltas/epoch=N/part_p=P/...   (hash-partitioned ON DISK;
                                                   the parquet IS the audit +
                                                   dead-letter sink too)
                 ──manifest.commit_epoch──►  exactly-once, epoch-fenced

    state: base is bucketized once into the same part_p layout; thereafter
    every read_state/compact is P INDEPENDENT per-bucket fold tasks
    (vectorized polars LWW fold, SEMANTICS.md) — no all-to-all exchange,
    ever. The partitioning key is chosen once (fnv1a64(doc_id) %
    num_partitions) and reused by every stage (ray_guide: "pick ONE
    partitioning key and reuse it across stages").

    compact() materializes the fold into a new bucketized base snapshot
    (LSM merge of the sorted runs) and advances local-id allocator offsets.

Scale notes (100 TB): the per-bucket fold is the unit of memory — size
``num_partitions`` so one bucket's live rows fit a worker (thousands of
partitions at cluster scale). Epoch ingest is embarrassingly parallel
map+write; fold is embarrassingly parallel per bucket; the only global
coordination is the manifest append. Hot *keys* are folded vectorized
inside their bucket (no per-key Python), so skew cost is bounded by bucket
imbalance, which the fnv1a hash keeps small. Raw ``@ray.remote`` tasks are
used for the per-bucket fold because the Dataset API cannot express
"coalesce pre-partitioned files into per-partition groups without a
shuffle" (a bare ``groupby(part_id).map_groups`` re-shuffles data that is
already partitioned on disk — measured 4-10× slower); everything else is
Dataset-native, and the fold results re-enter the Dataset world via
``ray.data.from_arrow_refs``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from marc_data_migration_ray.config import PAYLOAD_COLUMNS, ReplayConfig
from marc_data_migration_ray.stages.fold import FOLD_SCHEMA, fold_bucket
from marc_data_migration_ray.stages.parse import PARSED_SCHEMA, ParseRoute, PrepBase
from marc_data_migration_ray.sources.pwrite import write_parquet_partitioned
from marc_data_migration_ray.state.manifest import Manifest

#: display columns of the final table (pre-DDL); extra_json is the internal
#: carrier for DDL-added column values, materialized at read time.
_DISPLAY_COLS = ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status", "candidate_key"]
_ROW_COLS = _DISPLAY_COLS + ["extra_json"]

#: one row group per written file: Ray's parquet sink otherwise emits one
#: row group PER INCOMING BLOCK SLICE — with 64 partition dirs a 8192-row
#: batch leaves ~128-row row groups, and a bucket fold then decodes ~700
#: thrift-heavy micro-groups where ~50 would do (measured 2x fold read
#: cost). Any value above rows-per-file collapses each file to one group;
#: the writer's buffering is bounded by the task's own block size.
_ROW_GROUP_SIZE = 1 << 20
DELTA_ROUTES = ("applied", "fuzzy", "local")


@ray.remote(num_cpus=1)
def _part_stats_task(files: list[str]) -> tuple:
    """Route counts + min/max lsn + schema rows for one partition's files."""
    route_counts: dict[str, int] = {}
    max_lsn = -1
    min_lsn = None
    schema_tables = []
    for f in files:
        t = pq.read_table(f, columns=["lsn", "route"])
        file_schema_rows = 0
        for item in pc.value_counts(t["route"]).to_pylist():
            route_counts[item["values"]] = route_counts.get(item["values"], 0) + item["counts"]
            if item["values"] == "schema":
                file_schema_rows = item["counts"]
        if t.num_rows:
            m = pc.max(t["lsn"]).as_py()
            if m is not None:
                max_lsn = max(max_lsn, m)
            mn = pc.min(t["lsn"]).as_py()
            if mn is not None:
                min_lsn = mn if min_lsn is None else min(min_lsn, mn)
        # THIS file's schema count, not the cumulative total — one early
        # schema event used to force the 5-column re-read on every later
        # schema-free file in the partition (code-review r5)
        if file_schema_rows:
            st = pq.read_table(
                f, columns=["lsn", "route", "schema_kind", "schema_name", "schema_new_name"]
            )
            st = st.filter(pc.equal(st["route"], "schema"))
            if st.num_rows:
                schema_tables.append(st)
    srows = pa.concat_tables(schema_tables) if schema_tables else None
    return route_counts, max_lsn, min_lsn, srows



#: target parsed-block size for the ingest write. Fewer, larger blocks keep
#: the partitioned write from exploding into blocks x partitions tiny files
#: (measured 12,800 ~57KB files -> 1,024 at 8 cpus, 3.2x faster ingest);
#: bytes-bounded at scale so a 10^10-event epoch still streams in ~128 MiB
#: blocks instead of 2xCPU giant ones.
INGEST_BLOCK_BYTES = 128 << 20


def _ingest_num_blocks(input_bytes: int) -> int:
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    by_bytes = input_bytes // INGEST_BLOCK_BYTES + 1
    return int(max(by_bytes, 2 * ncpu))


def _paths_bytes(paths) -> int:
    paths = paths if isinstance(paths, list) else [paths]
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True):
                total += os.path.getsize(f)
        elif os.path.isfile(p):
            total += os.path.getsize(p)
    return total


#: file-skipping key index sidecar (Delta/Iceberg bloom-filter-index
#: analog): <delta file>.keybloom = 8-byte header (magic 'KBL1',
#: keyless-flag byte, 3 reserved) + uint32 m_bits + a bitmap RIGHT-SIZED
#: to the file's key count (~16 bits/key, 4 probes → fp ≈ 0.04%) —
#: a 1k-row delta file gets a 4 KiB sidecar, not a fixed 128 KiB one,
#: so a lookup's sidecar scan stays tiny even over hundreds of files.
_KEYBLOOM_SUFFIX = ".keybloom"
_KEYBLOOM_MAGIC = b"KBL1"
_KEYBLOOM_K = 4
_KEYBLOOM_MIN_BITS = 1 << 15  # 4 KiB floor


def _keybloom_u64(keys: pa.Array) -> "np.ndarray":
    from marc_data_migration_ray.functions.keys import _fnv1a_numpy

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return _fnv1a_numpy(keys)


def _kb_positions(u64: "np.ndarray", m_bits: int) -> "np.ndarray":
    from marc_data_migration_ray.pipelines.joins import _GOLDEN, _mix64

    h1 = _mix64(u64)
    h2 = _mix64(u64 + _GOLDEN) | np.uint64(1)
    probes = np.arange(_KEYBLOOM_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + probes * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _prune_by_keybloom(delta_files: list[str], keys: pa.Array,
                       keep_keyless: bool) -> list[str]:
    """Drop delta files whose bloom sidecar PROVES none of the wanted keys
    is present. No false negatives by construction: a file without a
    sidecar, with a malformed one, with any bloom hit — or (when
    ``keep_keyless``) one holding keyless rows, which positional local-id
    allocation must always see — is kept."""
    want = None
    out = []
    for f in delta_files:
        sc = f + _KEYBLOOM_SUFFIX
        if not os.path.exists(sc):
            out.append(f)
            continue
        raw = np.fromfile(sc, dtype=np.uint8)
        if raw.size < 12 or bytes(raw[:4]) != _KEYBLOOM_MAGIC:
            out.append(f)  # torn/foreign sidecar: never prune on it
            continue
        if keep_keyless and raw[4]:
            out.append(f)
            continue
        m_bits = int(raw[8:12].view(np.uint32)[0])
        bm = raw[12:]
        if m_bits <= 0 or bm.size != m_bits // 8:
            out.append(f)
            continue
        if want is None:
            want = _keybloom_u64(keys)
        pos = _kb_positions(want, m_bits)
        hit = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        if hit.any():
            out.append(f)
    return out


@ray.remote(num_cpus=1)
def _build_keybloom_task(files: list[str]) -> int:
    """Build missing ``.keybloom`` sidecars: one pruned ``key``-column
    read per file, right-sized bitmap + keyless flag, atomic publish."""
    built = 0
    for f in files:
        sc = f + _KEYBLOOM_SUFFIX
        if os.path.exists(sc):
            continue
        keys = pq.read_table(f, columns=["key"])["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        valid = keys.drop_null()
        m_bits = _KEYBLOOM_MIN_BITS
        while m_bits < 16 * max(1, len(valid)):
            m_bits <<= 1
        bm = np.zeros(m_bits // 8, np.uint8)
        if len(valid):
            pos = _kb_positions(_keybloom_u64(valid), m_bits).ravel()
            np.bitwise_or.at(bm, pos >> 3,
                             np.left_shift(1, pos & 7).astype(np.uint8))
        hdr = np.zeros(12, np.uint8)
        hdr[:4] = np.frombuffer(_KEYBLOOM_MAGIC, np.uint8)
        hdr[4] = 1 if keys.null_count else 0
        hdr[8:12] = np.frombuffer(
            np.uint32(m_bits).tobytes(), np.uint8)
        tmp = f"{sc}.{os.getpid()}.tmp"
        np.concatenate([hdr, bm]).tofile(tmp)
        os.replace(tmp, sc)
        built += 1
    return built


def _read_bucket_tables(base_files, delta_files, cfg, base_is_final_schema,
                        max_lsn=None, key_filter=None, payload_cols=None):
    from marc_data_migration_ray.stages.fold import fold_input_columns

    # PARSED minus the audit-only titles, minus projection-pruned payload
    fold_cols = fold_input_columns(payload_cols)
    keys = pa.array(sorted(key_filter), pa.string()) if key_filter else None
    if keys is not None and delta_files:
        # file-skipping index: sidecar blooms drop delta files that cannot
        # contain the wanted keys (keyless-row files stay — allocation)
        delta_files = _prune_by_keybloom(delta_files, keys, keep_keyless=True)
    tables = []
    for f in base_files:
        base_cols = None
        if payload_cols is not None:
            # projection pushdown on the base scan: only the requested
            # payload columns (plus key/lineage) leave the parquet footer.
            # Intersect with the file's actual schema — compacted snapshots
            # carry final-schema names, older ones may lack lineage columns.
            want = set(fold_cols) | {
                "doc_id", "n_tok", "last_lsn", "status", "candidate_key",
                "part_id",
            }
            base_cols = [c for c in pq.read_schema(f).names if c in want]
        if keys is not None:
            # point-lookup pushdown: row-group stats prune the base read
            # (one row per key lives here; parquet min/max stats skip
            # whole row groups) — base rows are all keyed, so dropping
            # non-requested keys cannot affect the fold of requested ones.
            # A compacted (final-schema) snapshot carries the key as
            # `doc_id`; the raw bucketized base as `key`.
            kcol = "doc_id" if base_is_final_schema else "key"
            t = pq.read_table(f, columns=base_cols,
                              filters=pc.field(kcol).isin(keys))
        else:
            t = pq.read_table(f, columns=base_cols)
        if base_is_final_schema:
            t = PrepBase(cfg, assume_normalized=True)(t)
        tables.append(t.select([c for c in fold_cols if c in t.column_names]))
    for f in delta_files:
        # column-pruned read: the titles stay on disk for audit_dataset;
        # full-row (vs route-filtered) read is still right — rejected rows
        # carry no token payload after ParseRoute, so extra bytes are tiny
        t = pq.read_table(f, columns=fold_cols)
        if max_lsn is not None:
            # LSN-level time travel: events after the cut never happened
            t = t.filter(pc.less_equal(t["lsn"], max_lsn))
        if keys is not None:
            # keep requested keys AND every keyless row: local-id
            # allocation is positional within the partition, so the
            # allocator must see the same keyless inserts it always does
            t = t.filter(pc.or_kleene(
                pc.is_null(t["key"]),
                pc.is_in(t["key"], value_set=keys),
            ))
        tables.append(t)
    if not tables:
        return None
    # contiguous buffers: one ~file-count-chunked table makes every polars
    # pass in the fold measurably slower (0.42s -> 0.32s per 90k-row bucket)
    # and its from_arrow conversion 4x slower; one combine pays for itself
    allr = pa.concat_tables(
        tables, promote_options="default").combine_chunks()
    if max_lsn is not None and "collapsed" in allr.column_names:
        _check_collapsed_cut(allr, cfg)
    return allr


def _check_collapsed_cut(allr: pa.Table, cfg) -> None:
    """Refuse an lsn cut that would let a PRECOLLAPSED row win.

    ``precollapse_updates`` strips a superseded full-row update's tokens
    at ingest on the argument that its within-batch winner always
    outranks it in any fold input — which an arbitrary ``up_to_lsn``
    cut can violate by filtering the winner away (code-review r5,
    reproduced: the stripped row then wins with tokens=NULL). The
    payload is gone from disk, so the only correct behavior is a loud
    error: a surviving collapsed row is safe iff a surviving LATER
    full-row applied update of the same key still covers it; otherwise
    the requested cut cannot be reconstructed from precollapsed deltas.
    Salted layouts spread a key's events over sub-buckets, so the
    winner may legitimately live elsewhere — there any surviving
    collapsed row under a cut is refused outright."""
    coll = pc.fill_null(allr["collapsed"], False)
    if not pc.any(coll).as_py():
        return
    if cfg.num_salts > 1:
        raise ValueError(
            "lsn-cut read over precollapsed deltas on a salted table: "
            "superseded payloads were stripped at ingest and the "
            "within-batch winner may live in another sub-bucket; "
            "re-ingest with precollapse_updates=False for lsn-level "
            "time travel")
    import polars as pl

    df = pl.from_arrow(allr.select(
        ["key", "lsn", "op", "route", "column_mask", "collapsed"]))
    full = df.filter(
        pl.col("route").is_in(["applied", "fuzzy"])
        & (pl.col("op") == "update")
        & (pl.col("column_mask").list.len().fill_null(0) == 0)
        & ~pl.col("collapsed").fill_null(False))
    wmax = full.group_by("key").agg(pl.col("lsn").max().alias("_wl"))
    bad = (df.filter(pl.col("collapsed").fill_null(False))
           .join(wmax, on="key", how="left")
           .filter(pl.col("_wl").is_null()
                   | (pl.col("_wl") < pl.col("lsn"))))
    if bad.height:
        k = bad["key"][0]
        raise ValueError(
            f"lsn cut excludes the within-batch winner of a "
            f"precollapsed update (key {k!r}): the superseded payload "
            "was stripped at ingest and this cut cannot be "
            "reconstructed; re-ingest with precollapse_updates=False "
            "for lsn-level time travel")


def _merge_counts(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    return {k: v for k, v in out.items() if v}


def _empty_fold() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.nulls(0, f.type) for f in FOLD_SCHEMA], schema=FOLD_SCHEMA
    )


@ray.remote(num_cpus=1)
def _merge_delta_files_task(files: list[str], out_file: str) -> int:
    """LSM level-1 file merge for one physical partition: concat → sort by
    lsn → drop duplicate lsns (bit-identical redeliveries) → one file.
    Events are preserved exactly; only the FILE layout changes."""
    import polars as pl

    tables = [pq.read_table(f, columns=list(PARSED_SCHEMA.names)) for f in files]
    t = pa.concat_tables(tables, promote_options="default")
    df = pl.from_arrow(t).sort("lsn").unique(subset=["lsn"], keep="first",
                                             maintain_order=True)
    out = df.to_arrow()
    cols = []
    for name, typ in zip(PARSED_SCHEMA.names, PARSED_SCHEMA.types):
        c = out.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(pc.cast(c, typ))
    merged = pa.Table.from_arrays(cols, schema=PARSED_SCHEMA)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    pq.write_table(merged, out_file)
    return merged.num_rows


@ray.remote(num_cpus=1)
def _fold_bucket_task(
    base_files: list[str],
    delta_files: list[str],
    cfg: ReplayConfig,
    local_id_offsets: dict[int, int],
    base_is_final_schema: bool,
    schema_ops: list[dict] | None = None,
    max_lsn: int | None = None,
    key_filter: list[str] | None = None,
    payload_cols: tuple[str, ...] | None = None,
) -> pa.Table:
    """Fold one hash partition: read its co-partitioned base + delta files,
    run the vectorized LWW fold, return the FOLD_SCHEMA table."""
    allr = _read_bucket_tables(base_files, delta_files, cfg, base_is_final_schema,
                               max_lsn, key_filter, payload_cols)
    if allr is None:
        return _empty_fold()
    return _fold_maybe_split(allr, cfg, local_id_offsets, schema_ops,
                             payload_cols)


def _fold_maybe_split(allr: pa.Table, cfg: ReplayConfig,
                      local_id_offsets: dict[int, int],
                      schema_ops: list[dict] | None,
                      payload_cols: tuple[str, ...] | None) -> pa.Table:
    """Fold a bucket, auto-splitting a FAT one (VERDICT r3 item 6): when
    the read rows exceed ~2× ``cfg.fold_split_bytes``, split by key hash
    and fold the sub-groups SEQUENTIALLY in this task — peak polars
    working set stays O(fold_split_bytes) however fat the partition,
    replacing the 'repartition so a partition fits a worker's heap'
    runbook knob. Exactness: keys are disjoint across sub-groups (fold is
    per-key independent), keyless rows all hash to sub-group 0 so
    local-id allocation ranks exactly as unsplit, and metrics rows sum
    downstream (``_aggregate_metrics_rows`` already merges per-bucket
    rows). Bit-equality vs the unsplit fold is pytest-pinned."""
    from marc_data_migration_ray.functions.keys import hash_partition
    from marc_data_migration_ray.stages.fold import fold_bucket

    target = int(getattr(cfg, "fold_split_bytes", 0) or 0)
    if not target or allr.nbytes <= 2 * target:
        return fold_bucket(allr, cfg, local_id_offsets, schema_ops,
                           payload_cols=payload_cols)
    n_sub = min(64, -(-allr.nbytes // target))
    sub = hash_partition(pc.cast(allr["key"], pa.string()), n_sub)
    sub_np = np.asarray(sub)
    out: list[pa.Table] = []
    for s in range(n_sub):
        part = allr.filter(pa.array(sub_np == s))
        if part.num_rows:
            out.append(fold_bucket(part, cfg, local_id_offsets,
                                   schema_ops, payload_cols=payload_cols))
    if not out:
        return _empty_fold()
    # engaged-split evidence (VERDICT r4 item 7): one extra zero-count
    # metrics row records that this bucket split and into how many
    # sub-groups — _aggregate_metrics_rows sums it like any counter
    marker = {"noop": 0, "tombstoned": 0, "local": 0, "rows": 0,
              "col_replacements": {}, "fold_splits": 1,
              "fold_split_subgroups": n_sub}
    mark = pa.Table.from_arrays(
        [pa.array(["metrics"], pa.string())
         if f.name == "_kind" else
         (pa.array([json.dumps(marker)], pa.string())
          if f.name == "metrics_json" else pa.nulls(1, f.type))
         for f in FOLD_SCHEMA],
        schema=FOLD_SCHEMA)
    return pa.concat_tables(out + [mark])


@ray.remote(num_cpus=1)
def _fold_salted_stage1_task(
    base_files: list[str],
    delta_files: list[str],
    cfg: ReplayConfig,
    base_is_final_schema: bool,
    schema_ops: list[dict] | None = None,
    max_lsn: int | None = None,
    key_filter: list[str] | None = None,
    payload_cols: tuple[str, ...] | None = None,
) -> pa.Table | None:
    """Stage 1 of the salted fold: one physical SUB-bucket → summary."""
    from marc_data_migration_ray.stages.fold import fold_salted_stage1

    allr = _read_bucket_tables(base_files, delta_files, cfg, base_is_final_schema,
                               max_lsn, key_filter, payload_cols)
    if allr is None:
        return None
    return fold_salted_stage1(allr, cfg, schema_ops, payload_cols)


@ray.remote(num_cpus=1)
def _fold_salted_merge_task(
    cfg: ReplayConfig,
    local_id_offsets: dict[int, int],
    schema_ops: list[dict] | None,
    payload_cols: tuple[str, ...] | None,
    *summaries: pa.Table | None,
) -> pa.Table:
    """Stage 2: merge one logical partition's sub-bucket summaries."""
    from marc_data_migration_ray.stages.fold import fold_salted_merge

    parts = [s for s in summaries if s is not None and s.num_rows]
    if not parts:
        return _empty_fold()
    return fold_salted_merge(pa.concat_tables(parts), cfg, local_id_offsets,
                             schema_ops, payload_cols)


@ray.remote(num_cpus=1)
def _scan_key_history_task(items: list, keys: list[str], columns: list[str],
                           key_col: str = "key") -> pa.Table | None:
    """Read files filtered to a KEY SET (``doc_history`` unit). ``items``
    is ``[(path, epochs-or-None), ...]``: files served from a merged
    segment carry the committed epochs they stand in for (the segment may
    physically hold more — e.g. epochs later truncated by rollback).
    Delta files are first pruned by their ``.keybloom`` sidecars against
    the WHOLE key set — one sidecar read decides the file for every
    requested key at once. Output carries the matched key as
    ``_hist_key``. Returns None when nothing matched (caller supplies the
    schema)."""
    out = []
    keys = sorted(set(keys))
    want = pa.array(keys, pa.string())
    for path, epochs in items:
        if key_col == "key" and not _prune_by_keybloom(
                [path], want, keep_keyless=False):
            continue  # sidecar proves every requested key is absent
        flt = [(key_col, "in", keys)]
        if epochs is not None:
            flt.append(("epoch", "in", sorted(epochs)))
        t = pq.read_table(path, columns=columns + [key_col], filters=flt)
        if t.num_rows:
            out.append(t.rename_columns(columns + ["_hist_key"]))
    return pa.concat_tables(out) if out else None


@ray.remote(num_cpus=1)
def _read_key_rows_task(
    base_files: list[str],
    delta_files: list[str],
    cfg: ReplayConfig,
    base_is_final_schema: bool,
    max_lsn: int,
    keys: list[str],
    payload_cols: tuple[str, ...] | None,
) -> pa.Table | None:
    """ONE key-filtered read of a partition's base+delta files — the
    shared input every as-of fold shard of that partition consumes from
    the object store (read once, fold many)."""
    return _read_bucket_tables(base_files, delta_files, cfg,
                               base_is_final_schema, max_lsn, keys,
                               payload_cols)


def _asof_sweep(allr: pa.Table, cfg: ReplayConfig,
                cuts: list[tuple[int, list | None]], keys: list[str],
                payload_cols: tuple[str, ...] | None) -> pa.Table:
    """O(key-events + cuts) as-of reconstruction: ONE LSN-ordered sweep
    per key over the partition's already-read rows, emitting EVERY cut's
    state from searchsorted timelines instead of one fold per cut
    (VERDICT r3 item 3 — the per-cut fold pays ~6 ms of fixed
    vectorized-fold cost per cut, which dominates a many-thousand-cut
    lineage).

    Semantics mirror ``fold_bucket`` rule-for-rule, sharing its mask and
    extra-value resolvers (``_writes_expr`` / ``_extra_value_expr``) so
    the two paths cannot drift:

    * base dedup: greatest ``doc_id_raw`` then ``n_tok`` (same sort);
    * event dedup: first row per lsn (duplicate-delivery absorption);
    * anchor at cut L = max-lsn among base ∪ applied insert/delete
      events ≤ L (lsn tie → event wins, matching the concat order);
      a delete anchor means no row;
    * per-column winner at L = last gate-passed masked update ≤ L with
      lsn > anchor lsn (``replace_only`` additionally requires the
      anchor to CARRY the column); anchor's own value as fallback;
    * lineage = max-lsn among qualified updates ∪ the insert anchor,
      falling back to the (base) anchor's stored last_lsn/status;
    * candidate_key / part_id come from the anchor.

    Mid-stream DDL rides the sweep too: mask / extra-value resolution is
    TIMELINE-STABLE (an event's visible-name segment depends only on ops
    at or before its lsn — later ops append segments, never rewrite
    them), so the write/value vectors are evaluated ONCE under the LAST
    cut's timeline and hold for every earlier cut. The per-cut added-
    column set is the add-order prefix with ``add_lsn ≤ cut``
    (searchsorted), packed into ``extra_json`` exactly when non-empty —
    the fold's ``added_sel`` rule; otherwise the anchor's raw
    ``extra_json`` passes through, also the fold's rule.

    Equality against the fold path is pinned by test_doc_history (oracle
    prefix replays), test_ddl_ordering and the as-of property
    gauntlet."""
    import polars as pl

    from marc_data_migration_ray.stages.fold import (FOLD_FIELDS,
                                                     FOLD_SCHEMA,
                                                     _extra_value_expr,
                                                     _writes_expr)
    from marc_data_migration_ray.state.schema_timeline import Timeline

    if "collapsed" in allr.column_names and pc.any(
            pc.fill_null(allr["collapsed"], False)).as_py():
        # a collapsed row is WRONG at its own-lsn cut (its stripped
        # payload would win there) and as-of cuts include every event
        # lsn — refuse rather than reconstruct corrupt states
        raise ValueError(
            "as-of reconstruction over precollapsed deltas: superseded "
            "payloads were stripped at ingest; re-ingest with "
            "precollapse_updates=False for per-event lineage")
    cuts_sorted = sorted({int(L): ops for L, ops in cuts}.items())
    cut_arr = np.asarray([L for L, _ in cuts_sorted], np.int64)
    tl = Timeline(cuts_sorted[-1][1])
    pay = [c for c in PAYLOAD_COLUMNS
           if payload_cols is None or c in payload_cols]
    added_full = [c for c in tl.added
                  if payload_cols is None or c in payload_cols]
    add_lsns = np.asarray([tl.segments[c][0][0] for c in added_full],
                          np.int64)

    df = pl.from_arrow(allr)
    base = df.filter(pl.col("is_base"))
    if base.height:
        base = base.sort(["key", "doc_id_raw", "n_tok"]).unique(
            subset=["key"], keep="last", maintain_order=True)
    ev = df.filter(~pl.col("is_base")).unique(
        subset=["lsn"], keep="first", maintain_order=True)
    applied = ev.filter(
        pl.col("route").is_in(["applied", "fuzzy"])).sort("lsn")
    has_extra = "extra_json" in applied.columns
    pay_in = [c for c in pay if c in applied.columns]
    added_in = added_full if has_extra else []
    val_cols = pay_in + added_in
    writes = {c: applied.select(_writes_expr(tl, c).alias("w"))["w"]
              .fill_null(False).to_numpy().astype(bool)
              for c in val_cols} if applied.height else {
                  c: np.empty(0, bool) for c in val_cols}
    a_lsn_all = applied["lsn"].to_numpy().astype(np.int64) \
        if applied.height else np.empty(0, np.int64)
    a_op = np.asarray(applied["op"].to_list(), dtype=object)
    a_key = np.asarray(applied["key"].to_list(), dtype=object)
    vals = {c: applied[c].to_list() for c in pay_in}
    for c in added_in:  # event-side values for DDL-added columns
        vals[c] = applied.select(
            _extra_value_expr(tl, c).alias("v"))["v"].to_list() \
            if applied.height else []
    status_l = applied["status"].to_list()
    cand_l = applied["candidate_key"].to_list()
    part_l = applied["part_id"].to_list()
    extra_l = applied["extra_json"].to_list() if has_extra \
        else [None] * applied.height
    # base-side values for added columns (anchor fallback / replace_only)
    base_aex: dict[str, list] = {}
    if base.height and added_in and "extra_json" in base.columns:
        for c in added_in:
            base_aex[c] = base.select(
                _extra_value_expr(tl, c).alias("v"))["v"].to_list()
    base_keys = base["key"].to_list() if base.height else []
    base_row_idx = {k: i for i, k in enumerate(base_keys)}
    repl_only = cfg.strategy == "replace_only"

    out_cols: dict[str, list] = {name: [] for name, _ in FOLD_FIELDS}
    out_asof: list[int] = []

    for k in dict.fromkeys(keys):
        sel = np.flatnonzero(a_key == k) if applied.height \
            else np.empty(0, np.int64)
        kb = None
        kb_i = base_row_idx.get(k)
        if kb_i is not None:
            kb = base.row(kb_i, named=True)
        if sel.size == 0 and kb is None:
            continue
        lsn_k = a_lsn_all[sel]
        op_k = a_op[sel]
        is_anchor = (op_k == "insert") | (op_k == "delete")
        is_upd = op_k == "update"
        A = sel[is_anchor]
        A_lsn = lsn_k[is_anchor]
        A_del = op_k[is_anchor] == "delete"
        U = sel[is_upd]
        U_lsn = lsn_k[is_upd]
        nc = len(cut_arr)
        ai = np.searchsorted(A_lsn, cut_arr, side="right") - 1
        aic = np.clip(ai, 0, None)
        b_lsn = int(kb["lsn"]) if kb is not None else None
        if kb is not None:
            use_event = (ai >= 0) & (
                (A_lsn[aic] >= b_lsn) if len(A_lsn) else False)
            has_anchor = np.ones(nc, bool)
        else:
            use_event = ai >= 0
            has_anchor = use_event
        alsn = np.where(
            use_event,
            A_lsn[aic] if len(A_lsn) else np.full(nc, -1, np.int64),
            b_lsn if kb is not None else -1)
        dead = use_event & (A_del[aic] if len(A_del) else False)
        live = has_anchor & ~dead
        li = np.searchsorted(U_lsn, cut_arr, side="right") - 1
        lic = np.clip(li, 0, None)
        q_u = live & (li >= 0) & ((U_lsn[lic] > alsn) if len(U_lsn)
                                  else False)
        per_col = {}
        for c in val_cols:
            w_k = writes[c][sel][is_upd]
            Uc = U[w_k]
            Uc_lsn = U_lsn[w_k]
            lc = np.searchsorted(Uc_lsn, cut_arr, side="right") - 1
            lcc = np.clip(lc, 0, None)
            q_c = live & (lc >= 0) & ((Uc_lsn[lcc] > alsn) if len(Uc_lsn)
                                      else False)
            per_col[c] = (Uc, lcc, q_c)
        n_add = np.searchsorted(add_lsns, cut_arr, side="right") \
            if len(add_lsns) else np.zeros(nc, np.int64)
        for i in np.flatnonzero(live):
            ev_anchor = bool(use_event[i])
            aidx = int(A[ai[i]]) if ev_anchor else None

            def _anchor_val(c):
                if ev_anchor:
                    return vals[c][aidx]
                if c in pay_in:
                    return kb.get(c)
                return base_aex.get(c, [None] * (kb_i + 1))[kb_i] \
                    if kb is not None else None

            def _col_val(c):
                Uc, lcc, q_c = per_col[c]
                av = _anchor_val(c)
                ok = bool(q_c[i])
                if ok and repl_only and av is None:
                    ok = False
                return vals[c][int(Uc[lcc[i]])] if ok else av

            row = {c: _col_val(c) for c in pay_in}
            na = int(n_add[i])
            if na:
                packed = {c: _col_val(c) for c in added_in[:na]}
                # ensure_ascii=False: polars json_encode on the fold
                # path emits raw UTF-8 — escaping here as \uXXXX would
                # break sweep==fold bit-equality for non-ASCII values
                # (ADVICE r4 item 4)
                row["extra_json"] = json.dumps(
                    packed, separators=(",", ":"), ensure_ascii=False)
            else:
                row["extra_json"] = (extra_l[aidx] if ev_anchor
                                     else (kb.get("extra_json")
                                           if kb is not None else None))
            cands = []
            if bool(q_u[i]):
                uidx = int(U[li[i]])
                cands.append((int(U_lsn[li[i]]), status_l[uidx]))
            if ev_anchor and not bool(A_del[ai[i]]):
                cands.append((int(A_lsn[ai[i]]), status_l[aidx]))
            if cands:
                row["last_lsn"], row["status"] = max(cands)
            else:
                row["last_lsn"] = b_lsn
                row["status"] = kb.get("status")
            row["candidate_key"] = (cand_l[aidx] if ev_anchor
                                    else kb.get("candidate_key"))
            row["part_id"] = (part_l[aidx] if ev_anchor
                              else kb.get("part_id"))
            # fold rows never carry the event-side lsn column
            row["lsn"] = None
            out_cols["_kind"].append("row")
            out_cols["doc_id"].append(k)
            for name, _ in FOLD_FIELDS[2:]:
                out_cols[name].append(row.get(name))
            out_asof.append(int(cut_arr[i]))

    arrays = [pa.array(out_cols[name], typ) for name, typ in FOLD_FIELDS]
    return pa.Table.from_arrays(arrays, schema=FOLD_SCHEMA).append_column(
        "_asof_lsn", pa.array(out_asof, pa.int64()))


@ray.remote(num_cpus=1)
def _asof_sweep_task(allr: pa.Table | None, cfg: ReplayConfig,
                     cuts: list[tuple[int, list | None]], keys: list[str],
                     payload_cols: tuple[str, ...] | None) -> pa.Table:
    if allr is None:
        return _empty_fold().append_column(
            "_asof_lsn", pa.array([], pa.int64()))
    return _asof_sweep(allr, cfg, cuts, keys, payload_cols)


def _ops_prefix_fn(all_ops: list):
    """``ops_for(L)`` over a SORTED (lsn-nondecreasing) append-only DDL
    log: bisect the prefix boundary and share prefix list objects.
    Inclusive ``lsn <= L`` — the exact ``_schema_ops_up_to`` filter.
    ONE implementation for the driver resolver and the worker-side
    self-cutting sweep so the two can never drift."""
    import bisect

    op_lsns = [o["lsn"] for o in all_ops]
    prefixes: dict[int, list] = {}

    def ops_for(L: int) -> list:
        n = bisect.bisect_right(op_lsns, L)
        pref = prefixes.get(n)
        if pref is None:
            pref = prefixes[n] = list(all_ops[:n])
        return pref

    return ops_for


@ray.remote(num_cpus=1)
def _concat_rows_task(*tables) -> pa.Table | None:
    """Combine sharded ``_read_key_rows_task`` results (file order is
    preserved by the caller's chunking, so the row sequence equals the
    unsharded read's)."""
    tabs = [t for t in tables if t is not None]
    if not tabs:
        return None
    return pa.concat_tables(
        tabs, promote_options="default").combine_chunks()


@ray.remote(num_cpus=1)
def _asof_sweep_auto_task(
    cfg: ReplayConfig, all_ops: list, ceiling: int, keys: list[str],
    payload_cols: tuple[str, ...] | None, *allrs,
) -> tuple[pa.Table, list[int]]:
    """Self-cutting sweep: derive the cut list from the partition's OWN
    key-filtered rows (every distinct event lsn ≥ ceiling) instead of
    waiting for the driver's event-log scan — this breaks the
    scan→sweep serialization in doc_history(with_versions) so both run
    concurrently (r5 profiling: the two were the whole warm cost).
    Returns (sweep_table, emitted_cut_lsns); the caller verifies its
    wanted cuts ⊆ emitted and falls back to the explicit-cut path if
    the sets ever diverge (they come from the same manifest files)."""
    tabs = [t for t in allrs if t is not None]
    allr = (pa.concat_tables(tabs, promote_options="default")
            .combine_chunks() if tabs else None)
    if allr is None:
        return (_empty_fold().append_column(
            "_asof_lsn", pa.array([], pa.int64())), [])
    ev = allr.filter(pc.invert(allr["is_base"]))
    lv = pc.drop_null(ev["lsn"])
    arr = (np.unique(lv.to_numpy(zero_copy_only=False).astype(np.int64))
           if len(lv) else np.empty(0, np.int64))
    arr = arr[arr >= ceiling]
    if not len(arr):
        return (_empty_fold().append_column(
            "_asof_lsn", pa.array([], pa.int64())), [])
    _pref = _ops_prefix_fn(all_ops)
    cuts = [(int(L), _pref(int(L))) for L in arr.tolist()]
    return (_asof_sweep(allr, cfg, cuts, keys, payload_cols),
            [int(L) for L in arr.tolist()])


@ray.remote(num_cpus=1)
def _asof_key_states_task(
    allr: pa.Table | None,
    cfg: ReplayConfig,
    local_id_offsets: dict[int, int],
    cuts: list[tuple[int, list | None]],
    keys: list[str],
    payload_cols: tuple[str, ...] | None,
) -> pa.Table:
    """Batched as-of reconstruction (``doc_history(with_versions=True)``
    unit) over the partition's ALREADY-READ key-filtered rows (``allr``
    arrives as a shared object-store ref — the read happened exactly once
    per partition). Cuts arrive LSN-ASCENDING and fold INCREMENTALLY
    (VERDICT r3 item 3): the first cut one-shot-folds its full prefix;
    each later cut folds the PREVIOUS cut's state — re-read as a
    compacted-snapshot base through the exact ``PrepBase`` path epoch
    folds use — plus only the events in ``(prev_cut, cut]``. Total work
    is O(key-events + cuts), not O(cuts × key-events); equality with the
    per-cut one-shot fold is the COMPACTION invariant
    (fold(fold(A) ∪ B) == fold(A ∪ B), SEMANTICS §anchor), which the
    property gauntlet pins. Two bookkeeping rules keep the composition
    exact: keyless-row allocation offsets accumulate across increments
    (each fold's ``local_by_part`` metrics feed the next fold's offsets,
    exactly like successive epochs), and composition RESTARTS with a
    one-shot prefix fold whenever a cut's schema-op signature differs
    from the previous cut's (mid-stream DDL re-resolves masks over raw
    events, not composed state). Returns FOLD_SCHEMA 'row' rows filtered
    to ``keys``, tagged with an ``_asof_lsn`` column."""
    if allr is not None and "collapsed" in allr.column_names and pc.any(
            pc.fill_null(allr["collapsed"], False)).as_py():
        raise ValueError(
            "as-of reconstruction over precollapsed deltas: superseded "
            "payloads were stripped at ingest; re-ingest with "
            "precollapse_updates=False for per-event lineage")
    from marc_data_migration_ray.stages.fold import (fold_bucket,
                                                     fold_input_columns)
    from marc_data_migration_ray.stages.parse import PrepBase

    if allr is None:
        return _empty_fold().append_column(
            "_asof_lsn", pa.array([], pa.int64()))
    want = pa.array(sorted(keys), pa.string())
    fold_cols = fold_input_columns(payload_cols)
    events = allr.filter(pc.invert(allr["is_base"]))
    prep = PrepBase(cfg, assume_normalized=True)
    out: list[pa.Table] = []
    state: pa.Table | None = None
    prev_sig: str | None = None
    prev_cut = 0
    alloc: dict[int, int] = {}  # keyless rows allocated <= prev_cut, per part
    for lsn_cut, schema_ops in cuts:
        sig = repr(schema_ops)
        if state is None or sig != prev_sig or lsn_cut < prev_cut:
            sub = allr.filter(pc.or_kleene(
                allr["is_base"], pc.less_equal(allr["lsn"], lsn_cut)))
            offs = dict(local_id_offsets or {})
            alloc = {}
        else:
            inc = events.filter(pc.and_(
                pc.greater(events["lsn"], prev_cut),
                pc.less_equal(events["lsn"], lsn_cut)))
            offs = dict(local_id_offsets or {})
            for p, n in alloc.items():
                offs[p] = offs.get(p, 0) + n
            comp = prep(state.drop_columns(["_kind", "lsn", "metrics_json"]))
            comp = comp.select(
                [c for c in fold_cols if c in comp.column_names])
            sub = pa.concat_tables([comp, inc], promote_options="default")
        r = fold_bucket(sub, cfg, offs, schema_ops,
                        payload_cols=payload_cols)
        for mj in r.filter(
                pc.equal(r["_kind"], "metrics"))["metrics_json"].to_pylist():
            for p, n in (json.loads(mj).get("local_by_part") or {}).items():
                alloc[int(p)] = alloc.get(int(p), 0) + int(n)
        state = r.filter(pc.equal(r["_kind"], "row"))
        prev_sig, prev_cut = sig, lsn_cut
        keep = state.filter(pc.is_in(state["doc_id"], value_set=want))
        if keep.num_rows:
            out.append(keep.append_column(
                "_asof_lsn", pa.array([lsn_cut] * keep.num_rows, pa.int64())))
    if not out:
        return _empty_fold().append_column(
            "_asof_lsn", pa.array([], pa.int64()))
    return pa.concat_tables(out)


@ray.remote(num_cpus=1)
def _diff_bucket_task(ta: pa.Table, tb: pa.Table,
                      payload: bool = False,
                      before_payload: bool = False) -> pa.Table:
    """Diff two same-bucket fold outputs (change-data feed unit): vectorized
    polars full join on doc_id; ``update`` = last_lsn moved. With
    ``payload=True`` the after-image additionally carries ``tokens_after``
    (the full token array), making the feed sufficient for downstream
    REPLICATION (``apply_change_feed``), not just aggregate maintenance —
    the scalar-only default keeps ordinary feeds token-free and cheap.
    ``before_payload=True`` adds ``tokens_before`` (the token array the
    change superseded) — what SET-valued incremental maintenance needs to
    retract old entries (``pipelines/views.PostingsView``)."""
    import polars as pl

    def _rows(t: pa.Table, suffix: str, with_tokens: bool) -> "pl.DataFrame":
        r = t.filter(pc.equal(t["_kind"], "row"))
        cols = ["doc_id", "last_lsn"] + [
            c for c in ("n_tok", "source", "status") if c in r.column_names
        ]
        if with_tokens and "tokens" in r.column_names:
            cols.append("tokens")
        df = pl.from_arrow(r.select(cols))
        return df.rename({c: f"{c}{suffix}" for c in cols if c != "doc_id"})

    # before- AND after-image scalars, both keeping CANONICAL payload names
    # (fold output is pre-schema-materialization, so DDL renames never
    # change the feed's column names — a stable contract for consumers);
    # before-images make the feed sufficient for incremental aggregate
    # maintenance (subtract before, add after — see pipelines/views.py)
    da = _rows(ta, "_before", before_payload)
    db = _rows(tb, "_after", payload)
    j = db.join(da, on="doc_id", how="full", coalesce=True)
    j = j.with_columns(
        pl.when(pl.col("last_lsn_before").is_null())
        .then(pl.lit("insert"))
        .when(pl.col("last_lsn_after").is_null())
        .then(pl.lit("delete"))
        .when(pl.col("last_lsn_before") != pl.col("last_lsn_after"))
        .then(pl.lit("update"))
        .otherwise(pl.lit(None))
        .alias("change")
    ).filter(pl.col("change").is_not_null())
    sel = [
        pl.col("doc_id"),
        pl.col("change"),
        pl.col("last_lsn_before").cast(pl.Int64),
        pl.col("last_lsn_after").cast(pl.Int64),
        pl.col("n_tok_before").cast(pl.Int64),
        pl.col("source_before").cast(pl.Utf8),
        pl.col("status_before").cast(pl.Utf8),
        pl.col("n_tok_after").cast(pl.Int64),
        pl.col("source_after").cast(pl.Utf8),
        pl.col("status_after").cast(pl.Utf8),
    ]
    fields = [
        ("doc_id", pa.string()),
        ("change", pa.string()),
        ("last_lsn_before", pa.int64()),
        ("last_lsn_after", pa.int64()),
        ("n_tok_before", pa.int64()),
        ("source_before", pa.string()),
        ("status_before", pa.string()),
        ("n_tok_after", pa.int64()),
        ("source_after", pa.string()),
        ("status_after", pa.string()),
    ]
    if payload:
        if "tokens_after" not in j.columns:
            j = j.with_columns(
                pl.lit(None, dtype=pl.List(pl.Int32)).alias("tokens_after")
            )
        sel.append(pl.col("tokens_after"))
        fields.append(("tokens_after", pa.list_(pa.int32())))
    if before_payload:
        if "tokens_before" not in j.columns:
            j = j.with_columns(
                pl.lit(None, dtype=pl.List(pl.Int32)).alias("tokens_before")
            )
        sel.append(pl.col("tokens_before"))
        fields.append(("tokens_before", pa.list_(pa.int32())))
    out = j.select(sel).to_arrow()
    return out.cast(pa.schema(fields))


@ray.remote(num_cpus=1)
def _backfill_part_task(
    t: pa.Table, transform, part: int, P: int, base_lsn: int, epoch: int,
    out_file: str,
) -> tuple[int, int]:
    """Generate one partition's backfill update events (see
    Replayer.backfill): live canonical-keyed rows → transform → one
    perfect-score full-row update event each, lsn = base + i*P + part
    (globally unique, above the fence). Returns (n_events, n_skipped)."""
    from marc_data_migration_ray.functions.keys import normalize_keys

    import numpy as np

    rows = t.filter(pc.equal(t["_kind"], "row"))
    rows = rows.select(["doc_id", "tokens", "n_tok", "source"])
    canon = pc.equal(
        pc.fill_null(normalize_keys(rows["doc_id"]), ""), rows["doc_id"]
    )
    eligible = rows.filter(canon)
    n_skipped = rows.num_rows - eligible.num_rows
    new = transform(eligible)
    if new.num_rows != eligible.num_rows or "doc_id" not in new.column_names:
        raise ValueError("backfill transform must return one row per input "
                         "row and keep doc_id")
    n = new.num_rows
    lsn = pa.array(base_lsn + np.arange(n, dtype=np.int64) * P + part)

    def _col(name, typ):
        if name in new.column_names:
            return pc.cast(new[name], typ)
        return pc.cast(eligible[name], typ)

    events = pa.table(
        {
            "lsn": lsn,
            "epoch": pa.array([epoch] * n, pa.int32()),
            "op": pa.array(["update"] * n, pa.string()),
            "doc_id": pc.cast(new["doc_id"], pa.string()),
            "tokens": _col("tokens", pa.list_(pa.int32())),
            "n_tok": _col("n_tok", pa.int32()),
            "source": _col("source", pa.string()),
            "column_mask": pa.array([[]] * n, pa.list_(pa.string())),
            "match_score": pa.array([100] * n, pa.int32()),
            "title": pa.nulls(n, pa.string()),
            "match_title": pa.nulls(n, pa.string()),
            "extra_json": pa.nulls(n, pa.string()),
            "schema_kind": pa.nulls(n, pa.string()),
            "schema_name": pa.nulls(n, pa.string()),
            "schema_new_name": pa.nulls(n, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    pq.write_table(events, out_file)
    return n, n_skipped


@ray.remote(num_cpus=1)
def _delete_where_part_task(
    t: pa.Table, predicate, part: int, P: int, base_lsn: int, epoch: int,
    ceiling_lsn: int, local_prefix: str, out_file: str,
) -> tuple[int, int]:
    """Generate one partition's predicate-delete tombstone events (see
    Replayer.delete_where). lsn = base + i*P + part (globally unique,
    above the fence). Returns (n_events, n_skipped_unmaterialized)."""
    from marc_data_migration_ray.functions.keys import local_id_parts

    import numpy as np

    rows = t.filter(pc.equal(t["_kind"], "row")).select(_ROW_COLS)
    sel = predicate(rows)
    if isinstance(sel, pa.ChunkedArray):
        sel = sel.combine_chunks()
    if not isinstance(sel, (pa.Array, pa.ChunkedArray)):
        sel = pa.array(sel, pa.bool_())
    if len(sel) != rows.num_rows:
        raise ValueError("delete_where predicate must return one boolean "
                         "per input row")
    matched = rows.filter(pc.fill_null(sel, False))
    # a status='local' row whose lineage lsn is above the compaction
    # ceiling was allocated after the floor: its id is not yet
    # materialized as an anchor, so a tombstone addressing it would fold
    # to nothing — skip and count (SEMANTICS "Local-id addressability")
    lk, _ = local_id_parts(matched["doc_id"], local_prefix, max(P, 1))
    unmat = pc.and_(
        pc.is_valid(lk),
        pc.greater(pc.fill_null(matched["last_lsn"], -1), ceiling_lsn),
    )
    emit = matched.filter(pc.invert(unmat))
    n_skipped = matched.num_rows - emit.num_rows
    n = emit.num_rows
    lsn = pa.array(base_lsn + np.arange(n, dtype=np.int64) * P + part)
    events = pa.table(
        {
            "lsn": lsn,
            "epoch": pa.array([epoch] * n, pa.int32()),
            "op": pa.array(["delete"] * n, pa.string()),
            "doc_id": pc.cast(emit["doc_id"], pa.string()),
            "tokens": pa.nulls(n, pa.list_(pa.int32())),
            "n_tok": pa.nulls(n, pa.int32()),
            "source": pa.nulls(n, pa.string()),
            "column_mask": pa.nulls(n, pa.list_(pa.string())),
            "match_score": pa.array([0] * n, pa.int32()),
            "title": pa.nulls(n, pa.string()),
            "match_title": pa.nulls(n, pa.string()),
            "extra_json": pa.nulls(n, pa.string()),
            "schema_kind": pa.nulls(n, pa.string()),
            "schema_name": pa.nulls(n, pa.string()),
            "schema_new_name": pa.nulls(n, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    pq.write_table(events, out_file)
    return n, n_skipped


@ray.remote(num_cpus=1)
def _merge_source_part_task(
    t: pa.Table, src_files: list[str], part: int, P: int, base_lsn: int,
    epoch: int, ceiling_lsn: int, local_prefix: str,
    when_matched: str | None, when_not_matched: str | None,
    column_mask: list[str] | None, out_file: str,
) -> tuple[int, int, int, int]:
    """Generate one partition's MERGE events (see ``Replayer.merge``):
    source rows whose key exists live in this partition's folded state
    become updates (or tombstones), the rest become inserts. lsn =
    base + i*P + part (globally unique, above the fence). Returns
    (n_updated, n_deleted, n_inserted, n_skipped_local)."""
    from marc_data_migration_ray.functions.keys import local_id_parts

    import numpy as np

    src = pa.concat_tables(
        [pq.read_table(f, columns=["doc_id", "tokens", "n_tok", "source"])
         for f in src_files]
    ).combine_chunks()
    n_src = src.num_rows
    n_keys = pc.count_distinct(src["doc_id"]).as_py()
    if n_keys != n_src:
        raise ValueError(
            f"merge source has {n_src - n_keys} duplicate doc_id(s) in "
            f"partition {part}: each target row may be matched by at most "
            "one source row"
        )
    live = t.filter(pc.equal(t["_kind"], "row"))
    live_ids = live["doc_id"].combine_chunks()
    pos = pc.index_in(src["doc_id"], value_set=live_ids)
    matched = pc.is_valid(pos)
    # local-id-format keys: a matched row above the compaction ceiling is
    # not yet materialized as an anchor (an update/delete addressing it
    # folds to nothing), and an unmatched one would squat the allocator's
    # namespace — skip and count both (SEMANTICS "Local-id addressability")
    lk, _ = local_id_parts(src["doc_id"], local_prefix, max(P, 1))
    if live.num_rows:
        taken_lsn = pc.take(live["last_lsn"].combine_chunks(), pc.fill_null(pos, 0))
    else:
        taken_lsn = pa.nulls(n_src, pa.int64())
    unmat = pc.if_else(
        matched,
        pc.greater(pc.fill_null(taken_lsn, -1), ceiling_lsn),
        pa.scalar(True),
    )
    skip = pc.and_(pc.is_valid(lk), unmat)
    keep = pc.invert(pc.fill_null(skip, False))
    n_skipped = n_src - pc.sum(pc.cast(keep, pa.int8())).as_py()

    def _seg(rows: pa.Table, op: str) -> pa.Table:
        n = rows.num_rows
        payload = op != "delete"
        if op == "update":
            mask = pa.array([column_mask or []] * n, pa.list_(pa.string()))
        else:
            mask = pa.nulls(n, pa.list_(pa.string()))
        return pa.table(
            {
                "op": pa.array([op] * n, pa.string()),
                "doc_id": pc.cast(rows["doc_id"], pa.string()),
                "tokens": pc.cast(rows["tokens"], pa.list_(pa.int32()))
                if payload else pa.nulls(n, pa.list_(pa.int32())),
                "n_tok": pc.cast(rows["n_tok"], pa.int32())
                if payload else pa.nulls(n, pa.int32()),
                "source": pc.cast(rows["source"], pa.string())
                if payload else pa.nulls(n, pa.string()),
                "column_mask": mask,
            }
        )

    segs = []
    hit = src.filter(pc.and_(matched, keep))
    miss = src.filter(pc.and_(pc.invert(matched), keep))
    n_upd = n_del = n_ins = 0
    if when_matched == "update" and hit.num_rows:
        segs.append(_seg(hit, "update"))
        n_upd = hit.num_rows
    elif when_matched == "delete" and hit.num_rows:
        segs.append(_seg(hit, "delete"))
        n_del = hit.num_rows
    if when_not_matched == "insert" and miss.num_rows:
        segs.append(_seg(miss, "insert"))
        n_ins = miss.num_rows
    body = pa.concat_tables(segs) if segs else _seg(src.slice(0, 0), "update")
    n = body.num_rows
    lsn = pa.array(base_lsn + np.arange(n, dtype=np.int64) * P + part)
    events = pa.table(
        {
            "lsn": lsn,
            "epoch": pa.array([epoch] * n, pa.int32()),
            "op": body["op"],
            "doc_id": body["doc_id"],
            "tokens": body["tokens"],
            "n_tok": body["n_tok"],
            "source": body["source"],
            "column_mask": body["column_mask"],
            "match_score": pa.array([100] * n, pa.int32()),
            "title": pa.nulls(n, pa.string()),
            "match_title": pa.nulls(n, pa.string()),
            "extra_json": pa.nulls(n, pa.string()),
            "schema_kind": pa.nulls(n, pa.string()),
            "schema_name": pa.nulls(n, pa.string()),
            "schema_new_name": pa.nulls(n, pa.string()),
        }
    )
    if n:
        os.makedirs(os.path.dirname(out_file), exist_ok=True)
        pq.write_table(events, out_file)
    return n_upd, n_del, n_ins, n_skipped


class Replayer:
    """Replays a binlog onto a lake table under exactly-once manifest commits."""

    def __init__(self, root: str, cfg: ReplayConfig | None = None, base_path: str | None = None):
        self.root = root
        self.cfg = cfg or ReplayConfig()
        self.manifest = Manifest(root)
        st = self.manifest.state
        if cfg is None and st.get("num_partitions") is not None:
            # opening an existing table with no explicit config adopts the
            # manifest's committed layout (which a repartition may have
            # evolved past the dataclass defaults)
            import dataclasses

            self.cfg = dataclasses.replace(
                self.cfg,
                num_partitions=st["num_partitions"],
                num_salts=st.get("num_salts", 1),
            )
        cfg = self.cfg
        if st.get("num_partitions") is None:
            def _create(s: dict) -> None:
                if s.get("num_partitions") is None:
                    s["num_partitions"] = cfg.num_partitions
                    s["num_salts"] = cfg.num_salts
                    if base_path is not None and s["base_path"] is None:
                        s["base_path"] = base_path

            self.manifest._cas_update(_create)
            st = self.manifest.state
        if st["num_partitions"] != self.cfg.num_partitions:
            raise ValueError(
                f"table was created with num_partitions={st['num_partitions']}, "
                f"config says {self.cfg.num_partitions} — partition layout is immutable"
            )
        if st.get("num_salts", 1) != self.cfg.num_salts:
            raise ValueError(
                f"table was created with num_salts={st.get('num_salts', 1)}, "
                f"config says {self.cfg.num_salts} — salt layout is immutable"
            )
        if base_path is not None and st["base_path"] != base_path:
            # an existing manifest owns the base: adopt a late-supplied
            # base_path if none was recorded, refuse a conflicting one
            # (silently dropping it would replay base-less, ADVICE r1)
            if st["base_path"] is None and not st.get("compactions"):
                def _adopt(s: dict) -> None:
                    if s["base_path"] is None and not s.get("compactions"):
                        s["base_path"] = base_path

                self.manifest._cas_update(_adopt)
                if self.manifest.state["base_path"] != base_path:
                    raise ValueError(
                        f"table already has base_path={self.manifest.state['base_path']!r}; "
                        f"conflicting base_path={base_path!r} refused"
                    )
            else:
                raise ValueError(
                    f"table already has base_path={st['base_path']!r}; "
                    f"conflicting base_path={base_path!r} refused"
                )

    # ------------------------------------------------------------------ #
    # ingest
    # ------------------------------------------------------------------ #
    def apply_epoch(self, epoch: int, binlog_path: str | list[str],
                    source_format: str = "parquet") -> dict:
        """Parse+gate+route one binlog epoch and commit it. Idempotent:
        re-applying a committed epoch returns the stored entry untouched.
        ``source_format``: "parquet" (default), "jsonl" or "jsonl-lenient"
        (Debezium-flavor
        envelopes, see sources/jsonl.py) — everything past the read is
        format-agnostic."""
        return self.finalize_epoch(
            self.prepare_epoch(epoch, binlog_path, source_format=source_format)
        )

    def prepare_epoch(self, epoch: int, binlog_path: str | list[str],
                      source_format: str = "parquet") -> dict:
        """Phase 1 of the commit: stage the epoch's partitioned delta dir
        and compute its commit entry WITHOUT touching the manifest. The
        staged data is invisible to every reader (reads are manifest-
        driven) until ``finalize_epoch``. Used directly by the multi-table
        transaction coordinator (state/txn.py); ``apply_epoch`` is
        prepare+finalize fused. The LSN-monotone fence fires here — fail
        before any commit decision, not after."""
        if self.manifest.is_committed(epoch):
            return {"epoch": epoch, "entry": self.manifest.epoch_entry(epoch),
                    "already": True}

        staged_here = False
        final_dir = os.path.join(self.root, "deltas", f"epoch={epoch}")
        if final_dir in self.manifest.rollback_pending():
            # leftovers of a rolled-back epoch that crashed mid-cleanup:
            # clear them rather than adopting stale data as this epoch's
            shutil.rmtree(final_dir, ignore_errors=True)
            self.manifest.clear_rollback_pending([final_dir])
        if not os.path.exists(final_dir):
            # empty epoch (no binlog files) commits an empty entry — real
            # change streams have quiet periods and the checkpoint must
            # still advance
            ext = ("*.jsonl" if source_format.startswith("jsonl")
                   else "*.parquet")
            paths = binlog_path if isinstance(binlog_path, list) else [binlog_path]
            has_files = any(
                (os.path.isdir(p) and glob.glob(os.path.join(p, "**", ext), recursive=True))
                or (os.path.isfile(p))
                for p in paths
            )
            if not has_files:
                # empty epoch: nothing staged, entry commits at finalize
                entry = {"rows": 0, "processed": 0, "routes": {}, "max_lsn": -1,
                         "dir": None, "_schema_ops": []}
                return {"epoch": epoch, "entry": entry, "already": False}
            tmp_dir = os.path.join(self.root, "_tmp", f"epoch-{epoch}-{uuid.uuid4().hex[:8]}")
            if source_format.startswith("jsonl"):
                from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

                # "jsonl-lenient": unparseable lines become deadletter
                # events instead of failing the epoch (salvage mode)
                ds = read_jsonl_binlog(
                    binlog_path, epoch,
                    strict=(source_format != "jsonl-lenient"))
            else:
                ds = ray.data.read_parquet(
                    binlog_path,
                    override_num_blocks=_ingest_num_blocks(_paths_bytes(binlog_path)),
                )
            # ParseRoute passed as an INSTANCE → stateless task pool (elastic,
            # no actor cold-start; the stage holds no real per-actor state)
            parsed = ds.map_batches(
                ParseRoute(self.cfg),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            if self.cfg.precollapse_updates:
                from marc_data_migration_ray.stages.precollapse import precollapse_batch

                parsed = parsed.map_batches(
                    precollapse_batch, batch_format="pyarrow", zero_copy_batch=True
                )
            # hash-partitioned on disk: one dir per part_p — the layout every
            # later fold reuses (co-partitioning instead of shuffling). With
            # num_salts > 1 the physical key is part_id*S + lsn%S: a hot
            # key's events spread over S sub-buckets (salted sub-partitions)
            S = self.cfg.num_salts
            if S > 1:
                def _phys(t: pa.Table, S=S) -> pa.Table:
                    pid = pc.cast(t["part_id"], pa.int64())
                    lsn = t["lsn"]
                    salt = pc.subtract(lsn, pc.multiply(pc.divide(lsn, S), S))
                    part_p = pc.cast(pc.add(pc.multiply(pid, S), salt), pa.int32())
                    return t.append_column("part_p", part_p)

                parsed = parsed.map_batches(_phys, batch_format="pyarrow", zero_copy_batch=True)
            else:
                parsed = parsed.map_batches(
                    lambda t: t.append_column("part_p", t["part_id"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            write_parquet_partitioned(
                parsed, tmp_dir, ["part_p"],
                row_group_size=_ROW_GROUP_SIZE,
                expected_partitions=self.cfg.num_partitions * self.cfg.num_salts)
            # zero-ROW binlog files: write_parquet creates nothing, but the
            # epoch must still publish (and later compact) as empty
            os.makedirs(tmp_dir, exist_ok=True)
            os.makedirs(os.path.dirname(final_dir), exist_ok=True)
            try:
                os.rename(tmp_dir, final_dir)  # atomic publish of the epoch's data
                staged_here = True
            except OSError:
                # a concurrent writer published this epoch first — its data
                # is equivalent (same input, deterministic parse); ours is
                # discarded and the commit below fences as usual
                if not os.path.exists(final_dir):
                    raise
                shutil.rmtree(tmp_dir, ignore_errors=True)

        entry = self._epoch_entry_from_files(epoch, final_dir)
        # LSN-monotone fence: a compacted snapshot row keeps only its
        # last_lsn, so an event at or below the compaction ceiling can no
        # longer be ordered correctly against absorbed writes (a sub-ceiling
        # update with a disjoint column mask would silently lose, where a
        # full replay would apply it). Real WAL/binlog tails are
        # LSN-monotone; enforce that contract instead of diverging silently.
        ceiling = self.manifest.ceiling_lsn()
        mn = entry.get("min_lsn")
        if mn is not None and mn <= ceiling:
            raise ValueError(
                f"epoch {epoch} contains lsn {mn} at or below the compaction "
                f"ceiling {ceiling}; events below the ceiling were already "
                f"folded into the base snapshot and cannot participate in "
                f"LWW ordering (SEMANTICS: late events / LSN monotonicity)"
            )
        return {"epoch": epoch, "entry": entry, "already": False,
                "staged_here": staged_here}

    def apply_epoch_audited(self, epoch: int, binlog_path, audit,
                            source_format: str = "parquet") -> dict:
        """Write-audit-publish (Iceberg WAP / Delta staging pattern):
        stage the epoch, run ``audit(staged_dataset, entry)`` over the
        parsed+routed rows while they are still INVISIBLE to readers,
        and only then commit. ``audit`` raises (or returns False) to veto
        — the staging is discarded and nothing is published. Typical
        audits: deadletter-rate ceilings, constraint-violation budgets,
        row-count reconciliation against the upstream extract."""
        prep = self.prepare_epoch(epoch, binlog_path, source_format=source_format)
        if prep.get("already"):
            return dict(prep["entry"])
        entry = prep["entry"]
        d = entry.get("dir")
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                                 recursive=True)) if d else []
        staged = ray.data.read_parquet(files) if files \
            else ray.data.from_arrow(PARSED_SCHEMA.empty_table())
        try:
            ok = audit(staged, dict(entry))
        except Exception:
            if d:
                shutil.rmtree(d, ignore_errors=True)
            raise
        if ok is False:
            if d:
                shutil.rmtree(d, ignore_errors=True)
            raise ValueError(f"epoch {epoch}: audit vetoed the publish")
        return self.finalize_epoch(prep)

    def finalize_epoch(self, prepared: dict) -> dict:
        """Phase 2: commit a prepared epoch to the manifest (idempotent
        CAS — safe to replay during transaction roll-forward) and run
        auto-maintenance. ``prepared`` round-trips through JSON (the txn
        intent file), so it must stay JSON-plain."""
        entry = dict(prepared["entry"])
        if prepared.get("already"):
            return entry
        epoch = prepared["epoch"]
        self.manifest.commit_epoch(
            epoch, entry, schema_ops=entry.pop("_schema_ops", [])
        )
        if self.cfg.auto_segment_epochs > 0:
            self._maybe_auto_segment()
        if self.cfg.auto_compact_epochs > 0:
            floor = self.manifest.last_compacted_epoch()
            pending = [e for e in self.manifest.committed_epochs() if e > floor]
            if len(pending) >= self.cfg.auto_compact_epochs:
                self.compact(up_to_epoch=max(pending))
        return entry

    def _maybe_auto_segment(self) -> None:
        """Level-1 auto-compaction: merge the oldest K contiguous
        unsegmented epochs whenever K have accumulated."""
        K = self.cfg.auto_segment_epochs
        floor = self.manifest.last_compacted_epoch()
        segged: set[int] = set()
        for seg in self.manifest.delta_segments():
            segged.update(range(seg["from"], seg["to"] + 1))
        pending = [e for e in self.manifest.committed_epochs()
                   if e > floor and e not in segged]
        run: list[int] = []
        for e in pending:
            if run and e != run[-1] + 1:
                break  # only the oldest contiguous run
            run.append(e)
            if len(run) == K:
                self.compact_deltas(run[0], run[-1])
                return

    def _epoch_entry_from_files(self, epoch: int, final_dir: str) -> dict:
        """Manifest entry (route counts, max lsn, schema ops, PER-PARTITION
        applied-lsn lineage) from committed files — one parallel stats task
        per partition dir, columnar reads of the tiny route/lsn/schema
        columns only."""
        part_files = self._files_by_part(final_dir)
        parts = sorted(part_files)
        refs = [_part_stats_task.remote(part_files[p]) for p in parts]
        route_counts: dict[str, int] = {}
        max_lsn = -1
        schema_rows = []
        part_lineage: dict[str, dict] = {}
        min_lsn = None
        for p, (rc, ml, mn, srows) in zip(parts, ray.get(refs)):
            for k, v in rc.items():
                route_counts[k] = route_counts.get(k, 0) + v
            max_lsn = max(max_lsn, ml)
            if mn is not None:
                min_lsn = mn if min_lsn is None else min(min_lsn, mn)
            # per-partition checkpoint: rows + highest applied lsn (the
            # north-star "per-partition lineage + applied-LSN metrics")
            part_lineage[str(p)] = {"rows": sum(rc.values()), "max_lsn": ml}
            if srows is not None:
                schema_rows.append(srows)
        schema_ops = []
        if schema_rows:
            t = pa.concat_tables(schema_rows)
            seen = set()
            for r in t.sort_by("lsn").to_pylist():
                if r["lsn"] in seen:
                    continue
                seen.add(r["lsn"])
                schema_ops.append(
                    {
                        "lsn": r["lsn"],
                        "kind": r.get("schema_kind"),
                        "name": r.get("schema_name"),
                        "new_name": r.get("schema_new_name"),
                    }
                )
        processed = sum(route_counts.values())
        return {
            "rows": processed,
            "processed": processed,
            "routes": route_counts,
            "max_lsn": max_lsn,
            "min_lsn": min_lsn,
            "parts": part_lineage,
            "dir": final_dir,
            "_schema_ops": schema_ops,
        }

    # ------------------------------------------------------------------ #
    # base bucketization (one-time layout alignment)
    # ------------------------------------------------------------------ #
    def _ensure_bucketized_base(self) -> str | None:
        """Bucketize the initial base snapshot into the part_p layout
        (parse once, write once — paid a single time per table)."""
        st = self.manifest.state
        if st.get("base_bucketized_path"):
            return st["base_bucketized_path"]
        if st["base_path"] is None:
            return None
        final_dir = os.path.join(self.root, "base_bucketized")
        if not os.path.exists(final_dir):
            tmp = final_dir + ".tmp-" + uuid.uuid4().hex[:8]
            ds = ray.data.read_parquet(
                st["base_path"],
                override_num_blocks=_ingest_num_blocks(_paths_bytes(st["base_path"])),
            )
            S = self.cfg.num_salts
            prepped = ds.map_batches(
                PrepBase(self.cfg, st["base_normalized"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).map_batches(
                # base rows always land in salt 0 of their logical partition
                lambda t, S=S: t.append_column(
                    "part_p", pc.cast(pc.multiply(pc.cast(t["part_id"], pa.int64()), S), pa.int32())
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            write_parquet_partitioned(
                prepped, tmp, ["part_p"],
                row_group_size=_ROW_GROUP_SIZE,
                expected_partitions=self.cfg.num_partitions * self.cfg.num_salts)
            try:
                os.rename(tmp, final_dir)
            except OSError:
                # concurrent bucketizer won the rename; its output is
                # equivalent (deterministic prep of the same base) — discard
                # ours (mirrors apply_epoch's publish race handling)
                if not os.path.exists(final_dir):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
        def _record(s: dict) -> None:
            if not s.get("base_bucketized_path"):
                s["base_bucketized_path"] = final_dir

        self.manifest._cas_update(_record)
        return final_dir

    def _files_by_part(self, root_dir: str) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for d in glob.glob(os.path.join(root_dir, "part_p=*")):
            p = int(d.rsplit("part_p=", 1)[1])
            fs = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if fs:
                out.setdefault(p, []).extend(fs)
        return out

    # ------------------------------------------------------------------ #
    # state (merge-on-read fold — per-bucket tasks, no shuffle)
    # ------------------------------------------------------------------ #
    def fold_output(self, up_to_epoch: int | None = None,
                    up_to_lsn: int | None = None,
                    payload_cols: tuple[str, ...] | None = None):
        """Raw fold dataset: _kind ∈ {row, noop, metrics} (FOLD_SCHEMA).

        One Ray task per hash partition, each reading only its own
        co-partitioned base + delta files. ``up_to_lsn`` is LSN-level time
        travel (mid-epoch point-in-time read): delta events above the cut
        never happened; must be at or above the compaction ceiling.
        ``payload_cols`` prunes the fold (projection pushdown) — pruned
        folds serve reads; metrics rows of a pruned fold cover only the
        folded columns."""
        refs = self._fold_part_refs(up_to_epoch, up_to_lsn=up_to_lsn,
                                    payload_cols=payload_cols)
        return ray.data.from_arrow_refs(list(refs.values()))

    def _fold_layout(
        self, up_to_epoch: int | None = None, up_to_lsn: int | None = None,
    ) -> tuple[bool, dict[int, list[str]], dict[int, list[str]]]:
        """Enumerate the fold's input files per PHYSICAL partition:
        (base_is_final_schema, base_by_part, delta_by_part). Validates the
        read cut against the compaction floor/ceiling and prefers level-1
        merged segments when they fully fit the range (shared by
        ``_fold_part_refs`` and the batched as-of path)."""
        st = self.manifest.state
        floor = self.manifest.last_compacted_epoch()
        if up_to_lsn is not None and up_to_lsn < self.manifest.ceiling_lsn():
            raise ValueError(
                f"up_to_lsn={up_to_lsn} is below the compaction ceiling "
                f"({self.manifest.ceiling_lsn()}): those events were folded "
                "into the compacted base and cannot be rolled back"
            )
        if up_to_epoch is not None and up_to_epoch < floor:
            raise ValueError(
                f"up_to_epoch={up_to_epoch} is below the compaction floor "
                f"({floor}): epochs <= {floor} were folded into the compacted "
                "base and cannot be rolled back"
            )
        base_is_final = bool(st.get("base_is_final_schema"))
        base_dir = self._ensure_bucketized_base()
        base_by_part = self._files_by_part(base_dir) if base_dir else {}
        delta_by_part: dict[int, list[str]] = {}
        segs_added: set[str] = set()
        for e in self.manifest.active_epochs():
            if up_to_epoch is not None and e > up_to_epoch:
                continue
            # prefer a level-1 merged segment when it fully fits the read
            # range: a segment reaching past up_to would leak newer events,
            # and one reaching below the compaction floor would RE-APPLY
            # events already folded into the base (duplicate local-id
            # allocation) — both fall back to per-epoch dirs
            seg = self.manifest.segment_covering(e)
            if seg and seg["from"] > floor and (
                up_to_epoch is None or seg["to"] <= up_to_epoch
            ):
                if seg["dir"] not in segs_added:
                    segs_added.add(seg["dir"])
                    for p, fs in self._files_by_part(seg["dir"]).items():
                        delta_by_part.setdefault(p, []).extend(fs)
                continue
            d = os.path.join(self.root, "deltas", f"epoch={e}")
            if not os.path.isdir(d):
                if seg:
                    raise ValueError(
                        f"epoch {e} was vacuumed into segment "
                        f"[{seg['from']},{seg['to']}]; read with "
                        f"up_to_epoch >= {seg['to']} (or None)"
                    )
                continue  # empty epoch: committed, no data dir
            for p, fs in self._files_by_part(d).items():
                delta_by_part.setdefault(p, []).extend(fs)
        return base_is_final, base_by_part, delta_by_part

    def _fold_part_refs(
        self,
        up_to_epoch: int | None = None,
        only_parts: set[int] | None = None,
        up_to_lsn: int | None = None,
        key_filter: list[str] | None = None,
        payload_cols: tuple[str, ...] | None = None,
    ) -> dict[int, "ray.ObjectRef"]:
        """One fold ObjectRef per LOGICAL partition (keyed by partition id) —
        the co-partitioned unit ``changes_between`` diffs pairwise.
        ``only_parts`` restricts the fold to those logical partitions
        (point lookups: touch only the buckets that can hold the keys).
        ``payload_cols`` prunes the fold to the requested payload / added
        columns (projection pushdown — see ``fold_bucket``)."""
        base_is_final, base_by_part, delta_by_part = self._fold_layout(
            up_to_epoch, up_to_lsn)
        parts = sorted(set(base_by_part) | set(delta_by_part))
        if not parts:
            raise ValueError("nothing to fold: no base and no committed deltas")
        if only_parts is not None:
            S_ = self.cfg.num_salts
            parts = [p for p in parts if (p // S_ if S_ > 1 else p) in only_parts]
            if not parts:
                return {}
        offsets = self.manifest.local_id_offsets()
        schema_ops = self._schema_ops_up_to(up_to_epoch, up_to_lsn)
        S = self.cfg.num_salts
        if S == 1:
            return {
                p: _fold_bucket_task.remote(
                    base_by_part.get(p, []),
                    delta_by_part.get(p, []),
                    self.cfg,
                    offsets,
                    base_is_final,
                    schema_ops,
                    up_to_lsn,
                    key_filter,
                    payload_cols,
                )
                for p in parts
            }
        # salted two-stage fold: `parts` here are PHYSICAL sub-buckets;
        # group them by logical partition (phys // S), run one stage-1
        # summary task per sub-bucket, one merge task per logical partition
        logical: dict[int, list[int]] = {}
        for p in parts:
            logical.setdefault(p // S, []).append(p)
        merge_refs: dict[int, "ray.ObjectRef"] = {}
        for lp, phys in sorted(logical.items()):
            s1 = [
                _fold_salted_stage1_task.remote(
                    base_by_part.get(p, []),
                    delta_by_part.get(p, []),
                    self.cfg,
                    base_is_final,
                    schema_ops,
                    up_to_lsn,
                    key_filter,
                    payload_cols,
                )
                for p in phys
            ]
            merge_refs[lp] = _fold_salted_merge_task.remote(
                self.cfg, offsets, schema_ops, payload_cols, *s1
            )
        return merge_refs

    def changes_between(self, from_epoch: int, to_epoch: int,
                        with_payload: bool = False,
                        with_before_payload: bool = False):
        """Change-data feed (Delta-CDF analog): per-row diff of the table
        state at ``to_epoch`` vs ``from_epoch`` — (doc_id, change ∈
        {insert, update, delete}, last_lsn_before/after, n_tok_before/
        after, source_before/after).

        Both states fold from the SAME co-partitioned layout, so the diff
        is one task per partition joining two same-bucket tables — no
        shuffle, no full-table materialization on the driver. ``update``
        is detected by ``last_lsn`` movement (any applied event advances
        it). Before- AND after-image columns carry the CANONICAL payload
        names regardless of DDL renames — the fold output the diff reads
        is pre-schema-materialization. Before-images make the feed
        sufficient for incremental aggregate maintenance (subtract
        before, add after — ``pipelines/views.py``). Epochs must be
        committed and at/above the compaction floor (same rule as
        ``read_state(up_to_epoch=...)``).

        ``with_payload=True`` adds ``tokens_after`` (the full token-array
        after-image) — the replication-grade feed ``apply_change_feed``
        consumes; ``with_before_payload=True`` additionally adds
        ``tokens_before`` (what set-valued incremental view maintenance
        retracts — ``PostingsView``); default feeds stay token-free."""
        if not (self.manifest.is_committed(from_epoch)
                and self.manifest.is_committed(to_epoch)):
            raise ValueError("both epochs must be committed")
        if from_epoch >= to_epoch:
            raise ValueError("from_epoch must be < to_epoch")
        refs_a = self._fold_part_refs(from_epoch)
        refs_b = self._fold_part_refs(to_epoch)
        empty = ray.put(_empty_fold())
        parts = sorted(set(refs_a) | set(refs_b))
        out = [
            _diff_bucket_task.remote(refs_a.get(p, empty), refs_b.get(p, empty),
                                     with_payload, with_before_payload)
            for p in parts
        ]
        return ray.data.from_arrow_refs(out)

    def apply_change_feed(self, feed, epoch: int,
                          feed_format: str = "parquet") -> dict:
        """Downstream replication: apply a PAYLOAD change feed (the
        ``changes_between(..., with_payload=True)`` schema — from this
        engine or any producer of that shape) onto THIS table, bringing a
        replica restored from an older snapshot up to the feed's
        ``to_epoch`` state. The Delta-CDF → MERGE pattern, closed-loop:
        inserts/updates become a full-row upsert ``merge`` at ``epoch``,
        deletes a tombstone ``merge`` at ``epoch + 1`` — both real fenced
        epochs with audit/metrics/time-travel like any upstream write.
        The two arms never share a key (a doc is upserted or deleted, not
        both), so arm order is immaterial.

        ``feed`` is a ``ray.data.Dataset``, ``pa.Table`` or parquet path
        (e.g. an ``export_changes(..., with_payload=True)`` directory).
        Returns ``{"upsert": entry, "delete": entry, "epochs": [e, e+1]}``."""
        from marc_data_migration_ray.sources import readers

        if isinstance(feed, str):
            if feed_format == "jsonl":
                from marc_data_migration_ray.sources.jsonl import read_jsonl_feed

                # a scalar jsonl feed still parses with a (null) tokens
                # field, so the missing-column guard below can't see the
                # flavor — the export marker carries it instead
                mk = os.path.join(feed, "_EXPORT.json")
                if os.path.isfile(mk):
                    with open(mk) as f:
                        if not json.load(f).get("with_payload"):
                            raise ValueError(
                                "feed has no tokens_after payload — produce "
                                "it with export_changes(..., with_payload=True)"
                            )
                ds = read_jsonl_feed(feed)
            else:
                ds = readers.read_parquet(feed)
        elif isinstance(feed, pa.Table):
            ds = ray.data.from_arrow(feed)
        else:
            ds = feed
        if "tokens_after" not in ds.schema().names:
            raise ValueError(
                "feed has no tokens_after payload — produce it with "
                "changes_between(..., with_payload=True)"
            )

        def _upserts(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t["change"],
                                  value_set=pa.array(["insert", "update"])))
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "tokens": t["tokens_after"],
                    "n_tok": t["n_tok_after"],
                    "source": t["source_after"],
                }
            )

        def _deletes(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["change"], "delete"))
            n = t.num_rows
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "tokens": pa.nulls(n, pa.list_(pa.int32())),
                    "n_tok": pa.nulls(n, pa.int64()),
                    "source": pa.nulls(n, pa.string()),
                }
            )

        up = self.merge(
            ds.map_batches(_upserts, batch_format="pyarrow", zero_copy_batch=True),
            epoch, when_matched="update", when_not_matched="insert",
        )
        dl = self.merge(
            ds.map_batches(_deletes, batch_format="pyarrow", zero_copy_batch=True),
            epoch + 1, when_matched="delete", when_not_matched=None,
        )
        return {"upsert": up, "delete": dl, "epochs": [epoch, epoch + 1]}

    def _schema_ops_up_to(self, up_to_epoch: int | None,
                          up_to_lsn: int | None = None) -> list[dict]:
        """Manifest DDL ops limited to the lsn range of the folded epochs."""
        ops = list(self.manifest.state["schema_ops"])
        if up_to_lsn is not None:
            ops = [o for o in ops if o["lsn"] <= up_to_lsn]
        if up_to_epoch is None:
            return ops
        cutoff = -1
        for e in self.manifest.committed_epochs():
            if e <= up_to_epoch:
                cutoff = max(cutoff, self.manifest.epoch_entry(e).get("max_lsn", -1))
        return [o for o in ops if o["lsn"] <= cutoff]

    def read_state(self, up_to_epoch: int | None = None,
                   up_to_lsn: int | None = None, tag: str | None = None,
                   columns: list[str] | None = None):
        """Current table state as a Ray Dataset (schema ops applied:
        renames as display names, DDL-added columns MATERIALIZED from the
        rows' canonical ``extra_json`` carrier). ``up_to_lsn`` reads the
        state as of an exact log position (mid-epoch time travel);
        ``tag`` reads as of a named snapshot (``Replayer.tag``).

        ``columns`` (display names) projects the read: the token payload
        and any other unrequested payload column are pruned at the parquet
        scan AND skipped by the per-bucket fold — a
        ``read_state(columns=["doc_id", "source"])`` over a 100 TB table
        never decodes a token list. Row membership (tombstones, local-id
        allocation, lineage) is payload-independent, so the projected rows
        are bit-identical to ``read_state().select(columns)``. With policy
        plugins configured the projection is applied AFTER the policies
        (no pushdown — a plugin may read any column); ``doc_id`` need not
        be requested."""
        if tag is not None:
            if up_to_epoch is not None or up_to_lsn is not None:
                raise ValueError("tag is exclusive with up_to_epoch/up_to_lsn")
            up_to_epoch = self.manifest.resolve_tag(tag)
        payload_cols = self._resolve_projection(columns, up_to_epoch, up_to_lsn)
        rows = self.fold_output(up_to_epoch, up_to_lsn, payload_cols).filter(
            expr="_kind == 'row'")
        return self._postprocess_rows(rows, up_to_epoch, up_to_lsn,
                                      columns=columns)

    def _resolve_projection(
        self, columns: list[str] | None,
        up_to_epoch: int | None, up_to_lsn: int | None = None,
    ) -> tuple[str, ...] | None:
        """Display-name projection → canonical payload/added column subset
        for the fold pushdown (None = no pushdown). Validates the names
        against the as-of display schema; plugins disable the pushdown
        (the projection still applies post-policy)."""
        if columns is None:
            return None
        if len(set(columns)) != len(columns):
            raise ValueError(f"duplicate columns in projection: {columns}")
        if self.cfg.policy_plugins:
            # a plugin may read any column (fold everything) and may ADD or
            # MOVE columns — the projection is validated at execution time
            # against the post-policy schema instead
            return None
        ops = self._schema_ops_up_to(up_to_epoch, up_to_lsn)
        final_schema, _renames, added = self.manifest.resolve_schema(
            _DISPLAY_COLS, ops)
        canon = dict(zip(final_schema, _DISPLAY_COLS + list(added)))
        vcs = {v["name"]: v["inputs"] for v in self.manifest.virtual_columns()}
        unknown = [c for c in columns if c not in canon and c not in vcs]
        if unknown:
            raise ValueError(
                f"unknown columns {unknown}; state schema is "
                f"{final_schema + sorted(vcs)}")
        prunable = set(PAYLOAD_COLUMNS) | set(added)
        # a requested generated column pulls its declared inputs into the fold
        wanted = list(columns) + [
            i for c in columns if c in vcs for i in vcs[c]]
        return tuple(sorted(
            {canon[c] for c in wanted if c in canon and canon[c] in prunable}))

    def tag(self, name: str, epoch: int | None = None,
            replace: bool = False) -> int:
        """Name a committed epoch cut (Delta/Iceberg tag analog); defaults
        to the latest committed epoch. Returns the tagged epoch. A tag is
        a stable NAME for time travel, not a retention pin — compaction
        past it makes reads of it raise, rollback below it drops it."""
        epochs = self.manifest.committed_epochs()
        if epoch is None:
            if not epochs:
                raise ValueError("nothing committed to tag")
            epoch = epochs[-1]
        elif epoch not in epochs:
            raise ValueError(f"epoch {epoch} is not committed")
        self.manifest.set_tag(name, epoch, replace=replace)
        return epoch

    def tags(self) -> dict[str, int]:
        return self.manifest.tags()

    def delete_tag(self, name: str) -> None:
        self.manifest.delete_tag(name)

    def set_virtual_column(self, name: str, expr: str,
                           inputs: list[str]) -> None:
        """Register a GENERATED column: a polars-SQL scalar expression over
        display columns, materialized at every state read (``read_state``
        / ``lookup`` — a table property like policy plugins, not epoch
        data). ``inputs`` declares the display columns the expression
        reads, so a projected read keeps exactly those in the fold.
        Validated against the CURRENT display schema."""
        ops = self._schema_ops_up_to(None, None)
        final_schema, _r, _a = self.manifest.resolve_schema(_DISPLAY_COLS, ops)
        taken = set(final_schema) | {
            v["name"] for v in self.manifest.virtual_columns()}
        if name in taken:
            raise ValueError(f"column {name!r} already exists")
        missing = [c for c in inputs if c not in final_schema]
        if missing:
            raise ValueError(
                f"virtual column inputs {missing} not in schema {final_schema}")
        self.manifest.set_virtual_column(name, expr, inputs)

    def drop_virtual_column(self, name: str) -> None:
        self.manifest.drop_virtual_column(name)

    def virtual_columns(self) -> list[dict]:
        return self.manifest.virtual_columns()

    def _parts_for_keys(self, ids: list[str]) -> set[int]:
        """Logical partitions that can hold ``ids`` — hash routing for
        ordinary keys, embedded-partition decode for allocator-assigned
        local ids (``{prefix}-PPPP-N``)."""
        from marc_data_migration_ray.functions.keys import hash_partition

        pref = self.cfg.local_id_prefix + "-"
        parts: set[int] = set()
        hashed = []
        for k in ids:
            seg = k.split("-")
            if k.startswith(pref) and len(seg) >= 3 and seg[-2].isdigit():
                # mod keeps ids addressable after a repartition to fewer
                # partitions (identity for the count that allocated them)
                parts.add(int(seg[-2]) % self.cfg.num_partitions)
            else:
                hashed.append(k)
        if hashed:
            arr = hash_partition(pa.array(hashed, pa.string()),
                                 self.cfg.num_partitions)
            parts.update(int(p) for p in arr.to_pylist())
        return parts

    def lookup(self, doc_ids: list[str], up_to_epoch: int | None = None,
               columns: list[str] | None = None, tag: str | None = None,
               up_to_lsn: int | None = None):
        """Point lookup (reference S4 authority point-lookup, made literal
        at scale): return the state rows for ``doc_ids`` by folding ONLY
        the partitions that can contain them — O(|ids|) bucket reads, not
        a full-table fold.

        Routing: a key's partition is ``hash_partition(key) %
        num_partitions`` (the same function ingest uses); allocator-
        assigned local ids (``{prefix}-PPPP-N``) encode their partition
        directly, so they are addressable too. Rows come back in exactly
        the ``read_state`` schema (schema ops + policies applied).

        Within each candidate bucket the fold is KEY-FILTERED at the
        parquet read (base rows to the requested keys via a scan filter;
        delta rows to requested keys ∪ keyless rows, preserving the
        positional local-id allocation) — per-bucket work is O(matches +
        keyless), not O(bucket rows). ``tag`` looks up as of a named
        snapshot (same resolution as ``read_state``); ``up_to_lsn`` is an
        LSN-level point-in-time lookup (same cut as ``read_state``)."""
        if tag is not None:
            if up_to_epoch is not None:
                raise ValueError("tag is exclusive with up_to_epoch")
            up_to_epoch = self.manifest.resolve_tag(tag)

        ids = [k for k in dict.fromkeys(doc_ids) if k]
        parts = self._parts_for_keys(ids)
        # resolve the projection AS OF the requested cut (code-review
        # r5): validating at head rejected a pre-rename display name a
        # read_state(up_to_lsn=L) of the same cut accepts
        payload_cols = self._resolve_projection(columns, up_to_epoch,
                                                up_to_lsn)
        refs = self._fold_part_refs(up_to_epoch, only_parts=parts,
                                    up_to_lsn=up_to_lsn,
                                    key_filter=ids, payload_cols=payload_cols)
        if refs:
            rows = ray.data.from_arrow_refs(list(refs.values()))
        else:
            rows = ray.data.from_arrow(_empty_fold())
        rows = rows.filter(expr="_kind == 'row'")
        want = pa.array(sorted(ids), pa.string())
        rows = rows.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"], value_set=want)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        return self._postprocess_rows(rows, up_to_epoch, up_to_lsn=up_to_lsn,
                                      columns=columns)

    #: stable doc_history event-log schema (state_*/tokens columns optional)
    _DOC_HISTORY_FIELDS = [
        ("lsn", pa.int64()), ("epoch", pa.int32()), ("op", pa.string()),
        ("route", pa.string()), ("status", pa.string()),
        ("match_score", pa.int32()), ("column_mask", pa.list_(pa.string())),
        ("n_tok", pa.int32()), ("source", pa.string()),
        ("collapsed", pa.bool_()),
    ]

    def doc_history(self, doc_id: str, with_payload: bool = False,
                    with_versions: bool = False) -> pa.Table:
        """Per-key lineage (row-level DESCRIBE HISTORY; a point query):
        every RETAINED event that targeted ``doc_id`` plus the
        base-snapshot row, sorted by lsn. Partition-pruned — only the
        key's bucket directories are listed — and key-filtered at the
        parquet read, so the cost is O(key's bucket files), never
        O(table). Events folded away by a compaction stay listed with
        ``absorbed=True`` for as long as their delta files (or a covering
        audit segment) are retained — ``vacuum(retain_audit=False)``
        reclaims them, after which only the compacted base row
        (``op='base'``, their net effect) remains.

        ``with_payload=True`` adds each event's ``tokens`` payload.
        ``with_versions=True`` reconstructs the state AS OF each event at
        or above the compaction ceiling via LSN-level time-travel point
        lookups (``lookup(..., up_to_lsn)``) — consistent with
        ``read_state`` by construction (it IS the same fold);
        ``state_live=False`` means the key had no live row after that
        event (tombstoned, rejected before any insert, …). Events below
        the ceiling get null ``state_*`` columns.

        Allocator-assigned local ids become addressable history once a
        compaction materializes them (same rule as ``lookup``); the
        keyless insert that allocated an id is not attributed to it."""
        return self.doc_history_many(
            [doc_id], with_payload=with_payload, with_versions=with_versions,
        ).drop_columns(["doc_id"])

    def doc_history_many(self, doc_ids: list[str],
                         with_payload: bool = False,
                         with_versions: bool = False) -> pa.Table:
        """Lineage over a KEY LIST (``doc_history`` generalized — VERDICT
        r2 item 8): one partition-pruned, bloom-pruned scan pass serves
        every requested key at once (each file's ``.keybloom`` sidecar is
        consulted once against the whole set), and ``with_versions=True``
        reconstructs all as-of states with one key-filtered fold pass per
        partition over the union of the keys' event LSNs
        (``_asof_states``) — never a per-key or per-event round trip.
        Output adds a leading ``doc_id`` column; rows sort by
        (doc_id, lsn)."""
        keys = [k for k in dict.fromkeys(doc_ids) if k]
        if not keys:
            raise ValueError("doc_ids must contain at least one key")
        S = self.cfg.num_salts
        parts = self._parts_for_keys(keys)
        phys_tokens = {
            f"{os.sep}part_p={lp * S + s}{os.sep}"
            for lp in parts for s in range(S)
        }

        def _mine(path: str) -> bool:
            return any(tok in path for tok in phys_tokens)

        plain: list = []
        seg_epochs: dict[str, set[int]] = {}
        floor = self.manifest.last_compacted_epoch()
        for e in self.manifest.committed_epochs():
            files, from_seg = self._epoch_files(e)
            for f in files:
                # partition pruning is only sound for epochs ABOVE the
                # compaction floor: a repartition (which always raises the
                # floor past every committed epoch) leaves retained
                # below-floor files in their ORIGINAL part_p layout, so
                # absorbed history must rely on the key filter (and the
                # bloom sidecars) instead of the current layout's dirs
                if e > floor and not _mine(f):
                    continue
                if from_seg:
                    seg_epochs.setdefault(f, set()).add(e)
                else:
                    plain.append((f, None))
        ev_items = plain + [(f, es) for f, es in sorted(seg_epochs.items())]
        ev_cols = [n for n, _ in self._DOC_HISTORY_FIELDS]
        if with_payload:
            ev_cols.append("tokens")
        # shard the scans ~64 files/task so wide tables (many epochs ×
        # many partitions) parallelize instead of serializing one task
        def _sharded(items: list, cols: list[str], key_col: str = "key"):
            return [
                _scan_key_history_task.remote(
                    items[i:i + 64], keys, cols, key_col)
                for i in range(0, len(items), 64)
            ]

        ev_refs = _sharded(ev_items, ev_cols) if ev_items else []

        base_is_final = bool(self.manifest.state.get("base_is_final_schema"))
        base_dir = self._ensure_bucketized_base()
        base_items = []
        if base_dir:
            for p, fs in self._files_by_part(base_dir).items():
                if (p // S if S > 1 else p) in parts:
                    base_items.extend((f, None) for f in fs)
        base_cols = (["last_lsn"] if base_is_final else ["lsn"]) \
            + ["status", "n_tok", "source"] + (["tokens"] if with_payload else [])
        base_refs = _sharded(base_items, base_cols,
                             "doc_id" if base_is_final else "key") \
            if base_items else []

        # versions need a key-filtered read of each touched partition
        # (the _asof_states input). Launch those reads NOW — they don't
        # depend on the event list, only on the key set — so they overlap
        # the event-log scan instead of serializing after it (the two
        # were the whole warm as-of lineage cost, r5 profiling). The
        # read uses the manifest head lsn (superset of any cut) and the
        # full payload projection; sweep/fold project per cut.
        pre_sweeps = None
        pre_read_chunks: dict[int, list] = {}
        kbp: dict[int, list[str]] = {}
        if with_versions and self.cfg.num_salts == 1:
            bif, bbp, dbp = self._fold_layout()
            head = self.manifest.head_lsn()
            # the same projection the versions tail requests below —
            # resolved at head lsn (superset of any cut). Narrowing
            # matters: an unprojected sweep packs EVERY added column
            # into per-cut extra_json and the driver-side extraction
            # pays for it (4.5 s on a 400-op DDL log, r5 profiling)
            ver_cols = (["doc_id", "tokens", "n_tok"] if with_payload
                        else ["doc_id", "n_tok"])
            skip_prelaunch = False
            pre_pay = None
            try:
                pre_pay = self._resolve_projection(ver_cols, None, head)
            except ValueError:
                # a rename of a core display column makes the canonical
                # names unresolvable at head — skip the speculative
                # prelaunch; the versions tail keeps the old explicit
                # path and surfaces its own (as-of-correct) resolution
                skip_prelaunch = True
            if not skip_prelaunch:
                for k_ in keys:
                    for p_ in self._parts_for_keys([k_]):
                        kbp.setdefault(p_, []).append(k_)
                # shard the per-partition key-filtered read over file
                # chunks (a 300-file bucket read serially was the fused
                # path's long pole); chunk order preserves the
                # unsharded row sequence
                SHARD = 96
                for p_, ks_ in sorted(kbp.items()):
                    items = ([(f, True) for f in bbp.get(p_, [])]
                             + [(f, False) for f in dbp.get(p_, [])])
                    chunks = ([items[i:i + SHARD]
                               for i in range(0, len(items), SHARD)]
                              or [[]])
                    pre_read_chunks[p_] = [
                        _read_key_rows_task.remote(
                            [f for f, isb in ch if isb],
                            [f for f, isb in ch if not isb],
                            self.cfg, bif, head, ks_, pre_pay)
                        for ch in chunks
                    ]
            # self-cutting sweeps chain off the reads worker-side — the
            # whole versions reconstruction overlaps the event-log scan
            all_ops = self.manifest.state["schema_ops"]
            op_lsns_ = [o["lsn"] for o in all_ops]
            sweep_ok_ = (
                not skip_prelaunch
                and not any(k_.startswith(self.cfg.local_id_prefix + "-")
                            for k_ in keys)
                and all(a <= b for a, b in zip(op_lsns_, op_lsns_[1:])))
            if sweep_ok_:
                ceil_ = self.manifest.ceiling_lsn()
                pre_sweeps = {
                    p_: _asof_sweep_auto_task.remote(
                        self.cfg, all_ops, ceil_, ks_, pre_pay,
                        *pre_read_chunks[p_])
                    for p_, ks_ in sorted(kbp.items())
                }

        got = ray.get(ev_refs + base_refs) if (ev_refs or base_refs) else []
        ev_parts = [t for t in got[:len(ev_refs)] if t is not None]
        base_parts = [t for t in got[len(ev_refs):] if t is not None]
        ev_t = pa.concat_tables(ev_parts) if ev_parts else None
        base_t = pa.concat_tables(base_parts) if base_parts else None

        fields = list(self._DOC_HISTORY_FIELDS)
        if with_payload:
            fields.append(("tokens", pa.list_(pa.int32())))
        schema = pa.schema([("doc_id", pa.string())] + fields
                           + [("_ord", pa.int8())])
        parts_out = []
        if base_t is not None and base_t.num_rows:
            n = base_t.num_rows
            cols = {
                "doc_id": pc.cast(base_t["_hist_key"], pa.string()),
                "lsn": pc.cast(base_t["last_lsn" if base_is_final else "lsn"],
                               pa.int64()),
                "epoch": pa.nulls(n, pa.int32()),
                "op": pa.array(["base"] * n, pa.string()),
                "route": pa.array(["base"] * n, pa.string()),
                "status": base_t["status"],
                "match_score": pa.nulls(n, pa.int32()),
                "column_mask": pa.nulls(n, pa.list_(pa.string())),
                "n_tok": base_t["n_tok"],
                "source": base_t["source"],
                "collapsed": pa.array([False] * n, pa.bool_()),
                "_ord": pa.array([0] * n, pa.int8()),
            }
            if with_payload:
                cols["tokens"] = base_t["tokens"]
            parts_out.append(pa.table(
                {n_: cols[n_] for n_ in schema.names}).cast(schema))
        if ev_t is not None and ev_t.num_rows:
            ev_t = ev_t.append_column(
                "doc_id", pc.cast(ev_t["_hist_key"], pa.string()))
            ev_t = ev_t.append_column(
                "_ord", pa.array([1] * ev_t.num_rows, pa.int8()))
            parts_out.append(ev_t.select(schema.names).cast(schema))
        if parts_out:
            hist = pa.concat_tables(parts_out).sort_by(
                [("doc_id", "ascending"), ("lsn", "ascending"),
                 ("_ord", "ascending")])
        else:
            hist = schema.empty_table()
        floor = self.manifest.last_compacted_epoch()
        hist = hist.append_column(
            "absorbed",
            pc.and_(pc.not_equal(hist["op"], "base"),
                    pc.less_equal(pc.fill_null(hist["epoch"], floor + 1),
                                  floor)),
        )
        hist = hist.drop_columns(["_ord"])

        if not with_versions:
            return hist
        ceiling = self.manifest.ceiling_lsn()
        cols = (["doc_id", "tokens", "n_tok"] if with_payload
                else ["doc_id", "n_tok"])
        # batched as-of reconstruction: ONE key-filtered partition read +
        # one in-process fold per distinct LSN (VERDICT r2 item 7) instead
        # of a sequential lookup() round trip per retained event
        want: dict[str, list[int]] = {}
        for k_, l, op in zip(hist["doc_id"].to_pylist(),
                             hist["lsn"].to_pylist(),
                             hist["op"].to_pylist()):
            if op != "base" and l is not None and l >= ceiling:
                want.setdefault(k_, []).append(int(l))
        states = None
        if pre_sweeps is not None and want:
            parts_sorted = sorted(pre_sweeps)
            got = dict(zip(parts_sorted, ray.get(
                [pre_sweeps[p_] for p_ in parts_sorted])))
            emitted = {p_: set(ls) for p_, (_, ls) in got.items()}
            covered = all(
                set(want.get(k_, ())) <= emitted.get(p_, set())
                for p_, ks_ in kbp.items() for k_ in ks_)
            if covered:
                states = self._asof_collect(
                    [t for t, _ in got.values()], cols,
                    self._ops_prefix_resolver())
        if states is None:
            # lazy: the combined per-partition read refs are only built
            # when the fallback actually needs them (the fused path
            # consumes the chunk refs directly inside the sweep task)
            pre_reads = {
                p_: (refs[0] if len(refs) == 1
                     else _concat_rows_task.remote(*refs))
                for p_, refs in pre_read_chunks.items()
            } or None
            states = self._asof_states(keys, want, cols,
                                       prelaunched=pre_reads)
        live, ntoks, toks = [], [], []
        for r_key, r_lsn, r_op in zip(hist["doc_id"].to_pylist(),
                                      hist["lsn"].to_pylist(),
                                      hist["op"].to_pylist()):
            if r_op == "base" or r_lsn is None or r_lsn < ceiling:
                live.append(None); ntoks.append(None); toks.append(None)
                continue
            row = states.get((r_key, int(r_lsn)))
            if row is not None:
                live.append(True)
                ntoks.append(row["n_tok"])
                toks.append(list(row["tokens"] or [])
                            if with_payload else None)
            else:
                live.append(False); ntoks.append(None); toks.append(None)
        hist = hist.append_column("state_live", pa.array(live, pa.bool_()))
        hist = hist.append_column("state_n_tok", pa.array(ntoks, pa.int32()))
        if with_payload:
            hist = hist.append_column(
                "state_tokens", pa.array(toks, pa.list_(pa.int32())))
        return hist

    def _asof_states(self, keys: list[str],
                     lsns: "list[int] | dict[str, list[int]]",
                     columns: list[str],
                     prelaunched: dict | None = None,
                     ) -> dict[tuple[str, int], dict]:
        """State rows for ``keys`` AS OF each LSN in ``lsns`` — the batched
        form of ``lookup(keys, up_to_lsn=L)`` over many L values: one
        key-filtered read per touched partition + one in-process fold per
        distinct cut over the already-read rows, then the identical
        postprocess chain applied per cut (each cut sees its own as-of
        schema). ``lsns`` may be a flat list (every cut folds in every
        touched partition) or a ``{key: [lsn, ...]}`` dict — then each
        partition folds ONLY the cuts of the keys that live in it (the
        doc_history_many case: keys spread over partitions must not
        multiply partitions × total cuts). Returns
        ``{(doc_id, lsn): state_row}``; a missing pair means the key had
        no live row as of that cut.

        Salted tables (``num_salts > 1``) fall back to per-cut lookups:
        the salted fold is a two-stage exchange, and as-of point-debug on
        declared hot keys is the rare case."""
        by_key = lsns if isinstance(lsns, dict) else None
        flat = ([l for ls in lsns.values() for l in ls]
                if by_key is not None else lsns)
        cut_lsns = sorted({int(l) for l in flat})
        if not cut_lsns or not keys:
            return {}
        out: dict[tuple[str, int], dict] = {}
        if self.cfg.num_salts > 1:
            for L in cut_lsns:
                for row in self.lookup(keys, up_to_lsn=L,
                                       columns=columns).take_all():
                    out[(row["doc_id"], L)] = row
            return out
        base_is_final, base_by_part, delta_by_part = self._fold_layout()
        offsets = self.manifest.local_id_offsets()
        payload_cols = self._resolve_projection(columns, None, cut_lsns[-1])
        ops_for = self._ops_prefix_resolver()
        ops_by_lsn = {L: ops_for(L) for L in cut_lsns}
        keys_by_part: dict[int, list[str]] = {}
        for k in dict.fromkeys(keys):
            for p in self._parts_for_keys([k]):
                keys_by_part.setdefault(p, []).append(k)
        # per-partition cut lists: only the LSNs of the keys living there
        cuts_by_part: dict[int, list] = {}
        for p, ks in keys_by_part.items():
            if by_key is None:
                p_lsns = cut_lsns
            else:
                p_lsns = sorted({int(l) for k in ks
                                 for l in by_key.get(k, ())})
            cuts_by_part[p] = [(L, ops_by_lsn[L]) for L in p_lsns]
        # read each touched partition's key-filtered rows ONCE (the ref
        # lands in the object store), then shard its cut list across fold
        # tasks (≤32 cuts each): a many-event key's cuts all live in ONE
        # partition and each in-process fold is serial within a task —
        # sharding parallelizes the folds while every shard reads the
        # shared rows zero-copy from plasma
        read_refs = {
            p: (prelaunched[p]
                if prelaunched is not None and p in prelaunched
                else _read_key_rows_task.remote(
                    base_by_part.get(p, []), delta_by_part.get(p, []),
                    self.cfg, base_is_final, cut_lsns[-1], ks,
                    payload_cols))
            for p, ks in sorted(keys_by_part.items())
            if cuts_by_part[p]
        }
        # Ordinary (non-local) keys take the single-sweep path: ONE task
        # per partition computes every cut's state in O(key-events +
        # cuts) via searchsorted timelines, mid-stream DDL included
        # (VERDICT r3 item 3). Local-id keys fall back to the
        # incremental-fold shards (≤32 cuts each) — positional
        # allocation needs the real fold.
        sweep_ok = not any(
            k.startswith(self.cfg.local_id_prefix + "-") for k in keys)
        if sweep_ok:
            refs = [
                _asof_sweep_task.remote(
                    read_refs[p], self.cfg, cuts_by_part[p], ks,
                    payload_cols)
                for p, ks in sorted(keys_by_part.items())
                if cuts_by_part[p]
            ]
        else:
            refs = [
                _asof_key_states_task.remote(
                    read_refs[p], self.cfg, offsets,
                    cuts_by_part[p][i:i + 32], ks, payload_cols)
                for p, ks in sorted(keys_by_part.items())
                for i in range(0, len(cuts_by_part[p]), 32)
            ]
        return self._asof_collect(ray.get(refs), columns, ops_for)

    def _ops_prefix_resolver(self):
        """``ops_for(L)`` → DDL ops with lsn ≤ L. The ops log is
        append-only in lsn order, so each cut's list is a PREFIX —
        bisect per cut and share the prefix objects (4001 per-cut filter
        scans were ~0.2 s of a long lineage, r5 profiling); unsorted
        legacy logs fall back to the per-cut filter (memoized)."""
        all_ops = self.manifest.state["schema_ops"]
        op_lsns = [o["lsn"] for o in all_ops]
        if all(a <= b for a, b in zip(op_lsns, op_lsns[1:])):
            ops_for = _ops_prefix_fn(all_ops)
        else:
            memo: dict[int, list] = {}

            def ops_for(L: int) -> list:
                got = memo.get(L)
                if got is None:
                    got = memo[L] = self._schema_ops_up_to(None, L)
                return got
        return ops_for

    def _asof_collect(self, tables, columns, ops_for,
                      ) -> dict[tuple[str, int], dict]:
        """Postprocess as-of sweep/fold task results into the
        ``{(doc_id, lsn): state_row}`` map (shared by ``_asof_states``
        and the prelaunched doc_history fast path): cuts grouped by
        as-of schema signature, one evolve-chain application per
        group."""
        out: dict[tuple[str, int], dict] = {}
        per_plugin = bool(self.cfg.policy_plugins)
        for t in tables:
            if not t.num_rows:
                continue
            asof = np.asarray(t["_asof_lsn"].to_numpy(zero_copy_only=False))
            body = t.drop_columns(["_asof_lsn"])
            # group cuts by as-of SCHEMA signature: every transform in the
            # postprocess chain is a pure function of the schema ops (DDL
            # is rare, so most cuts share one signature) and preserves row
            # order — one chain application covers the whole group. Policy
            # plugins may do arbitrary batch rewrites, so they keep the
            # per-cut path.
            # group key = len(ops): prefixes of the append-only DDL log
            # are unique by length, and repr() of a 400-op list per cut
            # was 0.5 s of a long lineage (r4 profiling)
            groups: dict[int, list[int]] = {}
            for L in sorted(set(asof.tolist())):
                groups.setdefault(len(ops_for(int(L))), []).append(int(L))
            # DDL-heavy lineages produce MANY schema groups (one per op
            # prefix); running the full evolve chain per group cost ~5 ms
            # × groups (r4 profiling). Without plugins or generated
            # columns the chain is select→evolve→project, and the evolve
            # extraction can run ONCE over the whole task result — per
            # group only a (vectorized) filter + metadata-level
            # select/rename remains. Extraction names come from the MAX
            # cut's Timeline.added INCLUDING dropped columns (a column
            # live at an early cut may be dropped by the last one).
            fast = not per_plugin and not self.manifest.virtual_columns()
            wide = None
            tl_full = None
            if fast:
                from marc_data_migration_ray.state.schema_timeline import \
                    Timeline

                max_ops = ops_for(int(asof.max()))
                tl_full = Timeline(max_ops)
                ext_names = list(tl_full.added)
                disp = body.select(_DISPLAY_COLS)
                arrays = list(disp.columns)
                if ext_names:
                    import polars as pl

                    ex = pl.from_arrow(body.select(["extra_json"]))
                    ext = ex.select([
                        pl.col("extra_json").str.json_path_match(
                            f"$.{name}").alias(name)
                        for name in ext_names
                    ]).to_arrow()
                    arrays += [
                        pc.cast(ext[name].combine_chunks()
                                if isinstance(ext[name], pa.ChunkedArray)
                                else ext[name], pa.string())
                        for name in ext_names
                    ]
                wide = pa.Table.from_arrays(
                    arrays, names=_DISPLAY_COLS + ext_names)
            for sig, ls in groups.items():
                if fast:
                    from marc_data_migration_ray.state.schema_timeline \
                        import resolve_schema_prefix

                    final_schema, _rn, added_g = resolve_schema_prefix(
                        _DISPLAY_COLS, tl_full, ls[0])
                    mask = np.isin(asof, ls)
                    sub = wide.select(_DISPLAY_COLS + added_g).filter(
                        pa.array(mask)).rename_columns(list(final_schema))
                    if columns is not None:
                        sub = sub.select(list(columns))
                    # the zip below assigns cut LSNs POSITIONALLY — valid
                    # because filter/select/rename preserve rows (ADVICE
                    # r3: fail loudly if that ever changes)
                    assert sub.num_rows == int(mask.sum()), (
                        "postprocess changed row count on the grouped "
                        "as-of path")
                    for L, row in zip(asof[mask].tolist(), sub.to_pylist()):
                        out[(row["doc_id"], int(L))] = row
                    continue
                if per_plugin:
                    subs = [(L, body.filter(pa.array(asof == L))) for L in ls]
                else:
                    mask = np.isin(asof, ls)
                    sub_all = body.filter(pa.array(mask))
                    done = self._postprocess_table(
                        sub_all, None, up_to_lsn=ls[0], columns=columns)
                    # positional zip — see the fast path's note (ADVICE r3)
                    assert done.num_rows == int(mask.sum()), (
                        "postprocess changed row count on the grouped "
                        "as-of path")
                    for L, row in zip(asof[mask].tolist(), done.to_pylist()):
                        out[(row["doc_id"], int(L))] = row
                    continue
                for L, sub in subs:
                    done = self._postprocess_table(sub, None, up_to_lsn=L,
                                                   columns=columns)
                    for row in done.to_pylist():
                        out[(row["doc_id"], L)] = row
        return out

    def _postprocess_rows(self, rows, up_to_epoch: int | None,
                          up_to_lsn: int | None = None,
                          columns: list[str] | None = None):
        """Fold row-kind dataset → public state schema (shared by
        ``read_state`` and ``lookup``). ``columns`` applies the requested
        projection as the FINAL step (after schema evolution and policy
        plugins), in the caller's order."""
        for fn in self._postprocess_fns(up_to_epoch, up_to_lsn, columns):
            rows = rows.map_batches(fn, batch_format="pyarrow",
                                    zero_copy_batch=True)
        return rows

    def _postprocess_table(self, t: pa.Table, up_to_epoch: int | None,
                           up_to_lsn: int | None = None,
                           columns: list[str] | None = None) -> pa.Table:
        """Local (driver / in-task) variant of ``_postprocess_rows`` for
        TINY tables (point lookups, per-LSN as-of states): applies the
        identical transform chain to one pa.Table without spinning up a
        Ray Data pipeline per call."""
        for fn in self._postprocess_fns(up_to_epoch, up_to_lsn, columns):
            t = fn(t)
        return t

    def _resolve_schema_cached(self, ops: list[dict] | None):
        """``manifest.resolve_schema(_DISPLAY_COLS, ops)`` memoized per
        ops signature — resolve_schema is a pure function of the ops
        list, and a many-cut as-of lineage resolves one signature per
        schema group (~2 ms each uncached; r4 profiling)."""
        cache = getattr(self, "_resolve_schema_cache", None)
        if cache is None:
            cache = self._resolve_schema_cache = {}
        sig = repr(ops)
        got = cache.get(sig)
        if got is None:
            got = cache[sig] = self.manifest.resolve_schema(
                _DISPLAY_COLS, ops)
        return got

    def _postprocess_fns(self, up_to_epoch: int | None,
                         up_to_lsn: int | None = None,
                         columns: list[str] | None = None) -> list:
        """The fold-rows → public-state transform chain as a list of pure
        ``pa.Table -> pa.Table`` functions (one ``map_batches`` each on the
        Dataset path; applied in-process on the point-query path)."""
        fns = [lambda t: t.select(_ROW_COLS)]
        ops = self._schema_ops_up_to(up_to_epoch, up_to_lsn)
        final_schema, _renames, added = self._resolve_schema_cached(ops)
        if added or _renames:
            # canonical order = _DISPLAY_COLS + added (resolve_schema appends
            # adds, renames in place) → rename positionally to final schema.
            def _evolve(t: pa.Table, added=tuple(added), names=tuple(final_schema)) -> pa.Table:
                import polars as pl

                ex = pl.from_arrow(t.select(["extra_json"]))
                t = t.drop_columns(["extra_json"])
                # ONE select for every added column: per-column selects
                # cost ~0.1 ms of polars fixed overhead each, which at
                # 100+ DDL-added columns × many small as-of batches was
                # the dominant driver cost of a long lineage (measured
                # 6.3 s of a 14 s doc_history; VERDICT r4 profiling)
                ext = ex.select([
                    pl.col("extra_json").str.json_path_match(
                        f"$.{name}").alias(name)
                    for name in added
                ]).to_arrow()
                arrays = list(t.columns) + [
                    pc.cast(ext[name].combine_chunks()
                            if isinstance(ext[name], pa.ChunkedArray)
                            else ext[name], pa.string())
                    for name in added
                ]
                return pa.Table.from_arrays(arrays, names=list(names))

            fns.append(_evolve)
        else:
            fns.append(lambda t: t.select(_DISPLAY_COLS))
        if self.cfg.policy_plugins:
            from marc_data_migration_ray.stages.policy import _PolicyStage

            fns.extend(_PolicyStage(p) for p in self.cfg.policy_plugins)
        vcs = self.manifest.virtual_columns()
        if vcs:
            # generated columns: vectorized polars-SQL exprs over the
            # display frame. Inputs pruned by a projection are null-filled
            # columns, so unrequested generated columns evaluate (to null)
            # and are dropped by the final select.
            def _generate(t: pa.Table, vcs=tuple(
                    (v["name"], v["expr"]) for v in vcs)) -> pa.Table:
                import polars as pl

                # physical wins (code-review r5): a later binlog
                # add_column/rename may land a REAL column with a
                # registered virtual column's name — overwriting its
                # data with the generated expression would be silent
                # data loss, so generation skips names already present
                todo = [(n, e) for n, e in vcs if n not in t.column_names]
                if not todo:
                    return t
                df = pl.from_arrow(t)
                df = df.with_columns(
                    *[pl.sql_expr(expr).alias(name) for name, expr in todo]
                )
                return df.to_arrow()

            fns.append(_generate)
        if columns is not None:
            sel = list(columns)
            fns.append(lambda t: t.select(sel))
        return fns

    def _aggregate_metrics_rows(self, out, seed: dict | None = None) -> dict:
        """Sum the per-bucket ``_kind == 'metrics'`` rows of a fold output.
        ``seed`` (a prior compaction's cumulative snapshot) pre-loads every
        counter except ``rows``, which is current-state, not cumulative."""
        seed = seed or {}
        agg = {"noop": seed.get("noop", 0), "tombstoned": seed.get("tombstoned", 0),
               "local": seed.get("local", 0), "rows": 0,
               "col_replacements": dict(seed.get("col_replacements", {})),
               "local_by_part": {int(k): v for k, v in seed.get("local_by_part", {}).items()},
               "noop_by_route": dict(seed.get("noop_by_route", {})),
               "fold_splits": seed.get("fold_splits", 0)}
        mrows = out.filter(expr="_kind == 'metrics'")
        for b in mrows.iter_batches(batch_format="pyarrow"):
            for s in b["metrics_json"].to_pylist():
                m = json.loads(s)
                agg["noop"] += m["noop"]
                agg["tombstoned"] += m["tombstoned"]
                agg["local"] += m["local"]
                agg["rows"] += m["rows"]
                for c, v in m["col_replacements"].items():
                    agg["col_replacements"][c] = agg["col_replacements"].get(c, 0) + v
                for p, c in m.get("local_by_part", {}).items():
                    agg["local_by_part"][int(p)] = agg["local_by_part"].get(int(p), 0) + c
                for r, c in m.get("noop_by_route", {}).items():
                    agg["noop_by_route"][r] = agg["noop_by_route"].get(r, 0) + c
                agg["fold_splits"] += m.get("fold_splits", 0)
        # DDL-added columns the fold never replaced stay at 0 in the bucket
        # counters; the run-level view (and the oracle) only reports columns
        # actually replaced.
        agg["col_replacements"] = {c: v for c, v in agg["col_replacements"].items() if v}
        return agg

    def fold_metrics(self, up_to_epoch: int | None = None) -> dict:
        """WHOLE-RUN fold metrics (noop/tombstoned/col_replacements/local),
        plus current row count and pre-fold route counts from the manifest.
        Counters survive compaction via the manifest metrics snapshot.
        Invariant: processed == sum(all routes)."""
        agg = self._aggregate_metrics_rows(
            self.fold_output(up_to_epoch), seed=self.manifest.metrics_snapshot()
        )
        routes = {}
        for e in self.manifest.committed_epochs():
            if up_to_epoch is not None and e > up_to_epoch:
                continue
            for r, c in self.manifest.epoch_entry(e)["routes"].items():
                routes[r] = routes.get(r, 0) + c
        # fold refinement moves events BETWEEN routes: a gate-passed update
        # that missed a live anchor is subtracted from its pre-fold route and
        # counted under noop, preserving processed == sum(all routes)
        refined = dict(routes)
        for r, c in agg["noop_by_route"].items():
            refined[r] = refined.get(r, 0) - c
            if refined[r] == 0:
                del refined[r]
        if agg["noop"]:
            refined["noop"] = refined.get("noop", 0) + agg["noop"]
        agg["routes_prefold"] = routes
        agg["routes"] = refined
        return agg

    # ------------------------------------------------------------------ #
    # compaction (LSM merge)
    # ------------------------------------------------------------------ #
    def _cumulative_metrics_snapshot(self, this_fold: dict) -> dict:
        """prior snapshot + this fold's counters — carried in the
        compaction/repartition record so fold_metrics stays whole-run
        after the absorbed epochs' events leave the delta files. ONE
        implementation for compact() and repartition() (code-review r5:
        the duplicated blocks both dropped ``fold_splits``, silently
        resetting the auto-split counter at every compaction)."""
        prev = self.manifest.metrics_snapshot()
        return {
            "noop": prev["noop"] + this_fold["noop"],
            "tombstoned": prev["tombstoned"] + this_fold["tombstoned"],
            "local": prev["local"] + this_fold["local"],
            "fold_splits": (prev.get("fold_splits", 0)
                            + this_fold.get("fold_splits", 0)),
            "col_replacements": _merge_counts(prev["col_replacements"],
                                              this_fold["col_replacements"]),
            "local_by_part": _merge_counts(
                {int(k): v for k, v in prev["local_by_part"].items()},
                dict(this_fold["local_by_part"])),
            "noop_by_route": _merge_counts(prev["noop_by_route"],
                                           this_fold["noop_by_route"]),
        }

    def compact(self, up_to_epoch: int | None = None,
                respect_tags: bool = False) -> str:
        """Fold base ∪ deltas into a new bucketized base snapshot; advance
        the per-partition local-id allocator offsets.

        ``respect_tags=True`` turns tags into retention pins for THIS call:
        the compaction ceiling is capped at the oldest tagged epoch, so
        every tag stays readable (otherwise a tag below the new floor
        raises on read and fsck flags it)."""
        up_to = up_to_epoch if up_to_epoch is not None else (
            self.manifest.committed_epochs()[-1] if self.manifest.committed_epochs() else -1
        )
        if respect_tags and self.manifest.tags():
            up_to = min(up_to, min(self.manifest.tags().values()))
        out = self.fold_output(up_to)
        new_base = os.path.join(self.root, f"base-compact-{uuid.uuid4().hex[:8]}")
        tmp = new_base + ".tmp"
        S = self.cfg.num_salts
        rows = out.filter(expr="_kind == 'row'").map_batches(
            # compacted rows land in salt 0 of their logical partition
            lambda t, S=S: t.select(_ROW_COLS + ["part_id"]).append_column(
                "part_p", pc.cast(pc.multiply(pc.cast(t["part_id"], pa.int64()), S), pa.int32())
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        write_parquet_partitioned(
            rows, tmp, ["part_p"], row_group_size=_ROW_GROUP_SIZE,
            expected_partitions=self.cfg.num_partitions * self.cfg.num_salts)
        # cumulative run counters (prior snapshot + this fold) ride along in
        # the compaction record so fold_metrics stays whole-run after the
        # absorbed epochs' events are gone from the delta files
        this_fold = self._aggregate_metrics_rows(out)
        local_counts = dict(this_fold["local_by_part"])  # this fold only: offsets accumulate
        snap = self._cumulative_metrics_snapshot(this_fold)
        os.rename(tmp, new_base)
        # record_compaction (CAS-retried) also flips base_is_final_schema
        # and points base_bucketized_path at the new snapshot
        ceiling = max(
            [self.manifest.ceiling_lsn()]
            + [
                self.manifest.epoch_entry(e).get("max_lsn", -1)
                for e in self.manifest.committed_epochs()
                if e <= up_to
            ]
        )
        self.manifest.record_compaction(
            up_to, new_base, local_counts, metrics_snapshot=snap, ceiling_lsn=ceiling
        )
        return new_base

    def repartition(self, num_partitions: int, num_salts: int | None = None) -> str:
        """Partition evolution: re-hash the folded state into a new base
        snapshot at a different partition (and optionally salt) count,
        committed exactly like a compaction.

        ``num_partitions`` is the engine's memory/commit-granularity knob
        (one fold task peaks at one partition's rows); at 100 TB a table
        sized for yesterday's volume must be able to grow its partition
        count without rebuilding from the raw binlog. This rewrites each
        live row into ``hash(doc_id) % new_P`` (allocator-assigned local
        ids go to their embedded partition mod new_P, where ``lookup`` and
        ``ParseRoute`` will address them), commits the snapshot + the new
        layout in ONE manifest CAS (readers see either the old or the new
        layout, never a mix), and carries run metrics and local-id
        allocator high-water marks forward like a compaction. Epochs
        applied after the call are routed and fenced at the new count;
        this Replayer's config is updated in place.

        The rewrite is the unavoidable all-to-all move (every row may
        change bucket) executed as ONE streaming pass:
        fold → recompute part → partitioned parquet write."""
        new_P = int(num_partitions)
        new_S = int(num_salts) if num_salts is not None else self.cfg.num_salts
        if new_P < 1 or new_S < 1:
            raise ValueError("num_partitions/num_salts must be >= 1")
        up_to = (self.manifest.committed_epochs()[-1]
                 if self.manifest.committed_epochs() else -1)
        out = self.fold_output(up_to) if (
            self.manifest.state.get("base_path") or self.manifest.committed_epochs()
        ) else None
        if out is None:
            raise ValueError("nothing to repartition: empty table")
        new_base = os.path.join(self.root, f"base-repart-{uuid.uuid4().hex[:8]}")
        tmp = new_base + ".tmp"
        prefix = self.cfg.local_id_prefix

        def _rewrite(t: pa.Table, P=new_P, S=new_S, prefix=prefix) -> pa.Table:
            from marc_data_migration_ray.functions.keys import (
                hash_partition, local_id_parts,
            )

            t = t.select(_ROW_COLS)
            ids = pc.cast(t["doc_id"], pa.string())
            part = hash_partition(ids, P)
            lk, lp = local_id_parts(ids, prefix, P)
            if pc.any(pc.is_valid(lk)).as_py():
                part = pc.if_else(pc.is_valid(lk), lp, part)
            t = t.append_column("part_id", pc.cast(part, pa.int32()))
            return t.append_column(
                "part_p",
                pc.cast(pc.multiply(pc.cast(part, pa.int64()), S), pa.int32()),
            )

        rows = out.filter(expr="_kind == 'row'").map_batches(
            _rewrite, batch_format="pyarrow", zero_copy_batch=True
        )
        write_parquet_partitioned(
            rows, tmp, ["part_p"], row_group_size=_ROW_GROUP_SIZE,
            # the NEW layout's physical partition count — self.cfg still
            # holds the old one here, which skipped the co-location sort
            # exactly when growing past the threshold (code-review r5)
            expected_partitions=new_P * new_S)
        this_fold = self._aggregate_metrics_rows(out)
        local_counts = dict(this_fold["local_by_part"])
        snap = self._cumulative_metrics_snapshot(this_fold)
        os.rename(tmp, new_base)
        ceiling = max(
            [self.manifest.ceiling_lsn()]
            + [
                self.manifest.epoch_entry(e).get("max_lsn", -1)
                for e in self.manifest.committed_epochs()
                if e <= up_to
            ]
        )
        self.manifest.record_repartition(
            up_to, new_base, local_counts, snap, ceiling, new_P, new_S
        )
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg, num_partitions=new_P, num_salts=new_S
        )
        return new_base

    def export_snapshot(self, dest: str, up_to_epoch: int | None = None,
                        cluster_by: str | None = None,
                        n_ranges: int = 8) -> dict:
        """Copy-out a consistent point-in-time snapshot of the PUBLIC table
        state (display schema, DDL applied) as hash-partitioned Parquet +
        a JSON export manifest — the hand-off artifact for a downstream
        consumer that doesn't speak this engine's manifest protocol.

        Layout: ``dest/part_p=<p>/*.parquet`` (one directory per physical
        partition, so a downstream loader can shard/resume per directory;
        never one giant file) + ``dest/_EXPORT.json`` (the ``_`` prefix keeps it out of parquet dataset scans) carrying epoch bounds,
        schema, row count and lineage (applied epochs, ceiling lsn).

        Idempotent + crash-safe: written to a tmp dir and atomically
        renamed; if ``dest`` already holds a complete export its manifest
        is returned untouched (re-running an export job is a no-op).

        ``cluster_by=<int column>`` (e.g. ``"n_tok"``) writes a
        RANGE-CLUSTERED layout instead (OPTIMIZE ... ZORDER/CLUSTER BY
        analog, 1-D): rows land in ``dest/range_id=<r>/`` directories by
        value range, and ``_EXPORT.json`` records one exact zone-map entry
        (min/max/n_rows/nulls) per range, so ``scan_export`` can skip
        whole directories for a range predicate. Boundaries come from an
        EXACT distributed value histogram (per-batch (value,count)
        partials → one tiny groupby — value-cardinality-bounded, the same
        scale argument as token_quantiles), split at N/K cumulative
        counts; equal values never split across ranges, so zones are
        non-overlapping by construction. NULL cluster values route to
        range 0 with ``min=max=None`` zone semantics handled by the
        scanner (a range predicate never matches NULL)."""
        marker = os.path.join(dest, "_EXPORT.json")
        if os.path.exists(marker):
            with open(marker) as f:
                return json.load(f)
        up_to = up_to_epoch if up_to_epoch is not None else (
            self.manifest.committed_epochs()[-1]
            if self.manifest.committed_epochs() else -1
        )
        from marc_data_migration_ray.functions.keys import hash_partition

        rows = self.read_state(up_to)
        P = self.cfg.num_partitions

        tmp = dest.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
        zones = None
        if cluster_by is None:
            def _with_part(t: pa.Table, P=P) -> pa.Table:
                return t.append_column(
                    "part_p", hash_partition(pc.cast(t["doc_id"], pa.string()), P)
                )

            part = rows.map_batches(_with_part, batch_format="pyarrow",
                                    zero_copy_batch=True)
            write_parquet_partitioned(
                part, tmp, ["part_p"], row_group_size=_ROW_GROUP_SIZE,
                expected_partitions=P)
        else:
            rows = rows.materialize()  # two consumers: histogram + route
            col = cluster_by

            def _hist(t: pa.Table, col=col) -> pa.Table:
                g = t.select([col]).group_by(col).aggregate([([], "count_all")])
                return pa.table({
                    "v": pc.cast(g[col], pa.int64()),
                    "c": pc.cast(g["count_all"], pa.int64()),
                })

            hist: dict = {}
            n_null = 0
            for b in rows.map_batches(
                _hist, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow"):
                for v, c in zip(b["v"].to_pylist(), b["c"].to_pylist()):
                    if v is None:
                        n_null += c
                    else:
                        hist[v] = hist.get(v, 0) + c
            vals = np.array(sorted(hist), dtype=np.int64)
            cnts = np.array([hist[v] for v in vals], dtype=np.int64)
            cum = np.cumsum(cnts)
            total = int(cum[-1]) if len(cum) else 0
            k = max(1, min(n_ranges, len(vals)))
            # boundary = first value whose cumulative count crosses i*N/k;
            # ranges are value-aligned (equal values never split)
            targets = (np.arange(1, k) * total) // k
            bidx = np.unique(np.searchsorted(cum, targets, side="left"))
            bounds = vals[bidx] if len(vals) else np.array([], np.int64)
            edges = np.concatenate([bounds, [np.iinfo(np.int64).max]])
            rid_of_val = np.searchsorted(bounds, vals, side="left")
            zones = []
            for r in range(len(edges)):
                m = rid_of_val == r
                zones.append({
                    "range_id": int(r),
                    "min": int(vals[m].min()) if m.any() else None,
                    "max": int(vals[m].max()) if m.any() else None,
                    "n_rows": int(cnts[m].sum()) + (n_null if r == 0 else 0),
                    "nulls": n_null if r == 0 else 0,
                })
            bounds_ref = ray.put(bounds)

            def _route(t: pa.Table, col=col) -> pa.Table:
                bs = ray.get(bounds_ref)
                v = pc.fill_null(
                    pc.cast(t[col], pa.int64()), np.iinfo(np.int64).min
                ).to_numpy(zero_copy_only=False)
                rid = np.searchsorted(bs, v, side="left")
                return t.append_column("range_id", pa.array(rid.astype(np.int32)))

            write_parquet_partitioned(rows.map_batches(
                _route, batch_format="pyarrow", zero_copy_batch=True
            ), tmp, ["range_id"], row_group_size=_ROW_GROUP_SIZE)
        ops = self._schema_ops_up_to(up_to)
        schema, _renames, _added = self.manifest.resolve_schema(_DISPLAY_COLS, ops)
        n_rows = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(tmp, "**", "*.parquet"), recursive=True)
        )
        info = {
            "up_to_epoch": up_to,
            "epochs": [e for e in self.manifest.committed_epochs() if e <= up_to],
            "ceiling_lsn": self.manifest.ceiling_lsn(),
            "schema": schema,
            "num_partitions": P,
            "n_rows": n_rows,
        }
        if cluster_by is not None:
            info["cluster_by"] = cluster_by
            info["zones"] = zones
        with open(os.path.join(tmp, "_EXPORT.json"), "w") as f:
            json.dump(info, f)
        os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
        try:
            os.rename(tmp, dest)
        except OSError:
            # concurrent exporter won: keep theirs, discard ours
            if not os.path.exists(marker):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
            with open(marker) as f:
                return json.load(f)
        return info

    def export_changes(self, dest: str, from_epoch: int, to_epoch: int,
                       with_payload: bool = False,
                       fmt: str = "parquet") -> dict:
        """CDC egress: write ``changes_between(from, to)`` as Parquet
        partitioned by change type + a ``_EXPORT.json`` manifest — the
        downstream-sync artifact (a consumer applies inserts/updates/
        deletes to its own store without speaking this engine's manifest).
        ``fmt="jsonl"`` writes Debezium-flavor envelope lines instead
        (distributed ``write_json``; readable back via
        ``sources.jsonl.read_jsonl_feed`` / ``apply_change_feed(...,
        feed_format="jsonl")``). Same idempotent tmp-dir + atomic-rename
        discipline as ``export_snapshot``; re-running is a no-op."""
        marker = os.path.join(dest, "_EXPORT.json")
        if os.path.exists(marker):
            with open(marker) as f:
                info = json.load(f)
            if bool(info.get("with_payload")) != bool(with_payload):
                raise ValueError(
                    f"{dest} already holds a "
                    f"{'payload' if info.get('with_payload') else 'scalar'} "
                    f"feed; re-export to a new dest for the other flavor"
                )
            if info.get("format", "parquet") != fmt:
                raise ValueError(
                    f"{dest} already holds a {info.get('format', 'parquet')} "
                    f"feed; re-export to a new dest for the other format"
                )
            return info
        ds = self.changes_between(from_epoch, to_epoch, with_payload=with_payload)
        tmp = dest.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
        counts: dict[str, int] = {}
        if fmt == "jsonl":
            from marc_data_migration_ray.sources.jsonl import write_jsonl_feed

            counts = write_jsonl_feed(ds, tmp)
        else:
            ds.write_parquet(tmp, partition_cols=["change"])
            os.makedirs(tmp, exist_ok=True)  # zero-change feeds still publish
            for d in os.listdir(tmp):
                if d.startswith("change="):
                    counts[d.split("=", 1)[1]] = sum(
                        pq.ParquetFile(p).metadata.num_rows
                        for p in glob.glob(os.path.join(tmp, d, "*.parquet"))
                    )
        info = {"from_epoch": from_epoch, "to_epoch": to_epoch,
                "n_changes": sum(counts.values()), "counts": counts,
                "with_payload": bool(with_payload), "format": fmt}
        with open(os.path.join(tmp, "_EXPORT.json"), "w") as f:
            json.dump(info, f)
        os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
        try:
            os.rename(tmp, dest)
        except OSError:
            if not os.path.exists(marker):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
            with open(marker) as f:
                return json.load(f)
        return info

    def backfill(self, transform, epoch: int) -> dict:
        """Full-table column rewrite executed THROUGH the replay path (the
        lakehouse backfill: re-tokenize, re-score, fix a bad column). Reads
        the current state per partition, applies ``transform`` (a
        serializable ``pa.Table -> pa.Table`` over the canonical payload
        columns), and emits ONE synthetic perfect-score update event per
        eligible row into a real binlog epoch dir under the table root,
        then ``apply_epoch``'s it — so backfills inherit exactly-once
        fencing, audit rows, metrics, the change feed and time travel like
        any upstream epoch (rather than mutating files in place, which
        would fork history).

        Eligible rows are live rows whose ``doc_id`` is its own canonical
        key (engine-allocated local ids are skipped and counted —
        re-keying them would re-allocate). LSNs are allocated above every
        committed lsn and the compaction ceiling, unique via
        ``base + row_index * P + partition``; each partition's events are
        generated and written by its own Ray task (no driver
        materialization)."""
        if self.manifest.is_committed(epoch):
            return self.manifest.epoch_entry(epoch)
        base_lsn = max(
            [self.manifest.ceiling_lsn()]
            + [self.manifest.epoch_entry(e).get("max_lsn", -1)
               for e in self.manifest.committed_epochs()]
        ) + 1
        refs = self._fold_part_refs(None)
        # lsn stride: the LOGICAL partition count, not len(refs) — refs
        # can be sparse (empty hash buckets), and a stride smaller than
        # max(part)+1 would let two partitions mint the same lsn
        P = max(self.cfg.num_partitions, 1)
        tmp_dir = os.path.join(self.root, "_tmp",
                               f"backfill-{epoch}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        tasks = [
            _backfill_part_task.remote(
                ref, transform, p, P, base_lsn, epoch,
                os.path.join(tmp_dir, f"part-{p:05d}.parquet"),
            )
            for p, ref in sorted(refs.items())
        ]
        stats = ray.get(tasks)
        n_events = sum(s[0] for s in stats)
        n_skipped = sum(s[1] for s in stats)
        entry = self.apply_epoch(epoch, tmp_dir)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return {**entry, "backfill_events": n_events,
                "backfill_skipped_local": n_skipped}

    def history(self) -> pa.Table:
        """Table history as an Arrow table (the ``DESCRIBE HISTORY`` /
        Iceberg-snapshots analog): one row per committed operation —
        epochs (with rows, per-route counts, lsn bounds), compactions,
        repartitions, delta segments and schema changes — ordered by
        manifest sequence. Pure metadata: reads only the manifest."""
        rows: list[dict] = []
        st = self.manifest.state
        for e in self.manifest.committed_epochs():
            ent = self.manifest.epoch_entry(e)
            rows.append({
                "kind": "epoch", "epoch": e,
                "rows": ent.get("rows"),
                "min_lsn": ent.get("min_lsn"), "max_lsn": ent.get("max_lsn"),
                "detail": json.dumps(ent.get("routes", {}), sort_keys=True),
            })
        for c in st.get("compactions", []):
            rp_info = c.get("repartition")
            rows.append({
                "kind": "repartition" if rp_info else "compaction",
                "epoch": c.get("up_to"),
                "rows": None, "min_lsn": None,
                "max_lsn": c.get("ceiling_lsn"),
                "detail": json.dumps(
                    rp_info if rp_info else {"base_path": c["base_path"]},
                    sort_keys=True),
            })
        for s in st.get("delta_segments", []):
            rows.append({
                "kind": "delta_segment", "epoch": s.get("to"),
                "rows": None, "min_lsn": None, "max_lsn": None,
                "detail": json.dumps({"from": s["from"], "to": s["to"]}),
            })
        for o in st.get("schema_ops", []):
            rows.append({
                "kind": f"ddl:{o.get('kind')}", "epoch": None, "rows": None,
                "min_lsn": o.get("lsn"), "max_lsn": o.get("lsn"),
                "detail": json.dumps(
                    {k: o.get(k) for k in ("name", "new_name") if o.get(k)},
                    sort_keys=True),
            })
        rows.sort(key=lambda r: (r["max_lsn"] if r["max_lsn"] is not None
                                 else (r["min_lsn"] or -1)))
        return pa.table({
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "epoch": pa.array([r["epoch"] for r in rows], pa.int64()),
            "rows": pa.array([r["rows"] for r in rows], pa.int64()),
            "min_lsn": pa.array([r["min_lsn"] for r in rows], pa.int64()),
            "max_lsn": pa.array([r["max_lsn"] for r in rows], pa.int64()),
            "detail": pa.array([r["detail"] for r in rows], pa.string()),
        })

    def delete_where(self, predicate, epoch: int) -> dict:
        """Predicate delete executed THROUGH the replay path (the lakehouse
        ``DELETE FROM t WHERE ...``): reads the current state per
        partition, evaluates ``predicate`` and emits one tombstone event
        per matching row into a real binlog epoch under the table root,
        then ``apply_epoch``'s it — so predicate deletes inherit
        exactly-once fencing, audit rows, metrics, the change feed and
        time travel like any upstream epoch (GDPR-style erasure keeps its
        own lineage rather than silently rewriting files).

        ``predicate`` is either a serializable callable
        ``pa.Table -> boolean array`` over the canonical row frame
        (``doc_id tokens n_tok source last_lsn status candidate_key
        extra_json`` — canonical names, not display renames) or a SQL
        expression string evaluated by polars (e.g. ``"source = 'web'
        AND n_tok < 10"``). Nulls count as non-matching.

        Local-id rows not yet materialized by a compaction are skipped
        and counted (``delete_skipped_unmaterialized``) — a tombstone
        addressing an unmaterialized id would fold to nothing; compact
        first to erase those."""
        if self.manifest.is_committed(epoch):
            return self.manifest.epoch_entry(epoch)
        if isinstance(predicate, str):
            expr = predicate

            def predicate(t: pa.Table, expr=expr):
                import polars as pl

                return (
                    pl.from_arrow(t)
                    .select(pl.sql_expr(expr).cast(pl.Boolean).alias("_m"))
                    .to_arrow()["_m"]
                )

        base_lsn = max(
            [self.manifest.ceiling_lsn()]
            + [self.manifest.epoch_entry(e).get("max_lsn", -1)
               for e in self.manifest.committed_epochs()]
        ) + 1
        ceiling = self.manifest.ceiling_lsn()
        refs = self._fold_part_refs(None)
        # lsn stride: the LOGICAL partition count, not len(refs) — refs
        # can be sparse (empty hash buckets), and a stride smaller than
        # max(part)+1 would let two partitions mint the same lsn
        P = max(self.cfg.num_partitions, 1)
        tmp_dir = os.path.join(self.root, "_tmp",
                               f"delete-{epoch}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        tasks = [
            _delete_where_part_task.remote(
                ref, predicate, p, P, base_lsn, epoch, ceiling,
                self.cfg.local_id_prefix,
                os.path.join(tmp_dir, f"part-{p:05d}.parquet"),
            )
            for p, ref in sorted(refs.items())
        ]
        stats = ray.get(tasks)
        n_events = sum(s[0] for s in stats)
        n_skipped = sum(s[1] for s in stats)
        entry = self.apply_epoch(epoch, tmp_dir)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return {**entry, "delete_events": n_events,
                "delete_skipped_unmaterialized": n_skipped}

    def merge(
        self,
        source,
        epoch: int,
        when_matched: str | None = "update",
        when_not_matched: str | None = "insert",
        column_mask: list[str] | None = None,
    ) -> dict:
        """``MERGE INTO`` executed THROUGH the replay path (the lakehouse
        upsert-from-table: Delta/Iceberg ``MERGE``). Each source row whose
        ``doc_id`` exists live in the target becomes a full-row ``update``
        (or, with ``when_matched='delete'``, a tombstone); unmatched rows
        become ``insert``s. The compiled events land in a real binlog
        epoch under the table root and are ``apply_epoch``'d — so merges
        inherit exactly-once fencing, audit rows, metrics, the change feed
        and time travel like any upstream epoch.

        ``source`` is a parquet path, a ``pa.Table`` or a
        ``ray.data.Dataset`` with the canonical payload columns
        ``doc_id tokens n_tok source``. ``column_mask`` restricts which
        payload columns a matched update overwrites (default: all).
        Matching is by the PARSE-normalized key: source keys that don't
        normalize flow through as keyless inserts and get an
        allocator-assigned local id, exactly like an upstream event with
        an invalid key (P6 ``set_local_id`` analog). More than one source row per key
        raises (Delta MERGE semantics). Local-id-format keys that are
        matched-but-unmaterialized or unmatched are skipped and counted
        (``merge_skipped_local``)."""
        if when_matched not in ("update", "delete", None):
            raise ValueError(f"bad when_matched: {when_matched!r}")
        if when_not_matched not in ("insert", None):
            raise ValueError(f"bad when_not_matched: {when_not_matched!r}")
        if self.manifest.is_committed(epoch):
            return self.manifest.epoch_entry(epoch)
        from marc_data_migration_ray.sources import readers

        if isinstance(source, str):
            ds = readers.read_parquet(source)
        elif isinstance(source, pa.Table):
            ds = ray.data.from_arrow(source)
        else:
            ds = source
        P = max(self.cfg.num_partitions, 1)
        cfg = self.cfg

        def _route(t: pa.Table, P=P, cfg=cfg) -> pa.Table:
            from marc_data_migration_ray.functions.keys import (
                hash_partition, local_id_parts, normalize_keys,
            )

            raw = t["doc_id"]
            norm = normalize_keys(raw)
            loc_key, loc_part = local_id_parts(raw, cfg.local_id_prefix, P)
            # the key the parse stage will adopt; un-normalizable keys keep
            # the raw value (they match nothing and deadletter at apply)
            key = pc.coalesce(loc_key, norm, pc.cast(raw, pa.string()))
            part = pc.if_else(
                pc.is_valid(loc_key),
                pc.cast(loc_part, pa.int32()),
                hash_partition(key, P),
            )
            return pa.table(
                {
                    "doc_id": key,
                    "tokens": pc.cast(t["tokens"], pa.list_(pa.int32())),
                    "n_tok": pc.cast(t["n_tok"], pa.int32()),
                    "source": pc.cast(t["source"], pa.string()),
                    "part_p": part,
                }
            )

        tmp_src = os.path.join(self.root, "_tmp",
                               f"merge-src-{epoch}-{uuid.uuid4().hex[:8]}")
        write_parquet_partitioned(ds.map_batches(
            _route, batch_format="pyarrow", zero_copy_batch=True
        ), tmp_src, ["part_p"], row_group_size=_ROW_GROUP_SIZE,
        expected_partitions=self.cfg.num_partitions * self.cfg.num_salts)
        src_by_part = self._files_by_part(tmp_src)
        base_lsn = max(
            [self.manifest.ceiling_lsn()]
            + [self.manifest.epoch_entry(e).get("max_lsn", -1)
               for e in self.manifest.committed_epochs()]
        ) + 1
        ceiling = self.manifest.ceiling_lsn()
        refs = self._fold_part_refs(None) if (
            self.manifest.committed_epochs()
            or self.manifest.state.get("base_path")
            or self.manifest.state.get("compactions")
        ) else {}
        tmp_dir = os.path.join(self.root, "_tmp",
                               f"merge-{epoch}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        empty = None
        tasks = []
        for p, files in sorted(src_by_part.items()):
            ref = refs.get(p)
            if ref is None:
                if empty is None:
                    empty = ray.put(_empty_fold())
                ref = empty
            tasks.append(
                _merge_source_part_task.remote(
                    ref, files, p, P, base_lsn, epoch, ceiling,
                    self.cfg.local_id_prefix, when_matched, when_not_matched,
                    column_mask,
                    os.path.join(tmp_dir, f"part-{p:05d}.parquet"),
                )
            )
        stats = ray.get(tasks)
        shutil.rmtree(tmp_src, ignore_errors=True)
        entry = self.apply_epoch(epoch, tmp_dir)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return {
            **entry,
            "merge_updated": sum(s[0] for s in stats),
            "merge_deleted": sum(s[1] for s in stats),
            "merge_inserted": sum(s[2] for s in stats),
            "merge_skipped_local": sum(s[3] for s in stats),
        }

    # thresholds for explain_layout recommendations (tunable, documented)
    _EXPLAIN_MAX_FILES_PER_BUCKET = 8      # merge-on-read amplification
    _EXPLAIN_MAX_BUCKET_BYTES = 256 << 20  # fold-task working set
    _EXPLAIN_COMPACT_DELTA_RATIO = 1.0     # compact when delta > ratio×base

    def explain_layout(self) -> dict:
        """Read-amplification / bucket-size diagnostic (the ops `explain`):
        what a fold of the CURRENT state will physically do — per-partition
        file counts and bytes for the base and the active (segment-aware)
        delta set — plus concrete maintenance recommendations:

        - many delta files per bucket → ``compact_deltas(a, b)`` (level-1
          file merge bounds merge-on-read amplification);
        - delta bytes rivaling the base → ``compact()`` (fold into a new
          base snapshot);
        - fat buckets (working set over ~256 MiB) → ``repartition(2P)``
          — fold throughput is a function of BUCKET size, not table size
          (measured: 4x data at fixed P folds ~1.9x superlinear; scaling P
          with the data restores the per-event rate, BASELINE.md).

        Pure metadata walk (file sizes only — no data reads, no Ray tasks),
        except the one-time base bucketization if this table has never
        been read (shared table setup, not part of the diagnostic).
        """
        st = self.manifest.state
        base_dir = self._ensure_bucketized_base()
        base_by_part = self._files_by_part(base_dir) if base_dir else {}
        delta_by_part: dict[int, list[str]] = {}
        floor = self.manifest.last_compacted_epoch()
        segs_added: set[str] = set()
        n_epoch_dirs = 0
        for e in self.manifest.active_epochs():
            seg = self.manifest.segment_covering(e)
            if seg and seg["from"] > floor:
                if seg["dir"] not in segs_added:
                    segs_added.add(seg["dir"])
                    for p, fs in self._files_by_part(seg["dir"]).items():
                        delta_by_part.setdefault(p, []).extend(fs)
                continue
            d = os.path.join(self.root, "deltas", f"epoch={e}")
            if not os.path.isdir(d):
                continue
            n_epoch_dirs += 1
            for p, fs in self._files_by_part(d).items():
                delta_by_part.setdefault(p, []).extend(fs)

        def _bytes(files: list[str]) -> int:
            return sum(os.path.getsize(f) for f in files)

        parts = sorted(set(base_by_part) | set(delta_by_part))
        per_part = {}
        for p in parts:
            bf, df = base_by_part.get(p, []), delta_by_part.get(p, [])
            per_part[p] = {
                "base_files": len(bf), "base_bytes": _bytes(bf),
                "delta_files": len(df), "delta_bytes": _bytes(df),
            }
        tot_base = sum(v["base_bytes"] for v in per_part.values())
        tot_delta = sum(v["delta_bytes"] for v in per_part.values())
        max_files = max((v["base_files"] + v["delta_files"]
                         for v in per_part.values()), default=0)
        max_bucket = max((v["base_bytes"] + v["delta_bytes"]
                          for v in per_part.values()), default=0)
        recs = []
        plan = []  # machine-readable twin of `recommendations` (maintain())
        epochs = self.manifest.active_epochs()
        if max_files > self._EXPLAIN_MAX_FILES_PER_BUCKET and n_epoch_dirs > 1:
            # the mergeable range starts AFTER any existing segment and
            # clamps to the oldest contiguous unsegmented run — a plan
            # anchored at floor+1 overlaps the previous maintain()'s
            # segment and compact_deltas rightly refuses (code-review
            # r5: the second maintain() call crashed the OPTIMIZE flow)
            segged: set[int] = set()
            for seg in self.manifest.delta_segments():
                segged.update(range(seg["from"], seg["to"] + 1))
            run: list[int] = []
            for e in epochs:
                if e in segged:
                    if run:
                        break  # only the oldest contiguous run
                    continue
                if run and e != run[-1] + 1:
                    break
                run.append(e)
            if len(run) > 1:
                recs.append(
                    f"compact_deltas({run[0]}, {run[-1]}): up to "
                    f"{max_files} files open per bucket fold")
                plan.append({"op": "compact_deltas",
                             "args": [run[0], run[-1]]})
        if tot_base and tot_delta > self._EXPLAIN_COMPACT_DELTA_RATIO * tot_base:
            recs.append(
                f"compact(): active deltas ({tot_delta >> 20} MiB) exceed "
                f"{self._EXPLAIN_COMPACT_DELTA_RATIO}x the base snapshot "
                f"({tot_base >> 20} MiB)")
            plan.append({"op": "compact", "args": []})
        if max_bucket > self._EXPLAIN_MAX_BUCKET_BYTES:
            recs.append(
                f"repartition({2 * self.cfg.num_partitions}, "
                f"{self.cfg.num_salts}): fattest bucket is "
                f"{max_bucket >> 20} MiB (fold working set)")
            plan.append({"op": "repartition",
                         "args": [2 * self.cfg.num_partitions,
                                  self.cfg.num_salts]})
        return {
            "num_partitions": self.cfg.num_partitions,
            "num_salts": self.cfg.num_salts,
            "active_epochs": len(epochs),
            "epoch_dirs_unmerged": n_epoch_dirs,
            "segments_used": len(segs_added),
            "base_bytes": tot_base,
            "delta_bytes": tot_delta,
            "max_files_per_bucket": max_files,
            "max_bucket_bytes": max_bucket,
            "per_part": per_part,
            "recommendations": recs,
            "plan": plan,
        }

    def build_key_blooms(self, task_files: int = 16,
                         only_parts: set[int] | None = None) -> dict:
        """File-skipping key index (the Delta/Iceberg bloom-filter-index
        analog): write a ``.keybloom`` sidecar (right-sized bitmap of the
        file's key hashes, ~16 bits/key with a 4 KiB floor, + a
        keyless-row flag) next to every delta and
        segment file that lacks one. Point lookups (``lookup`` /
        ``doc_history`` / key-filtered folds) then SKIP files the bitmap
        proves key-free — at 100 TB a lookup over a bucket with hundreds
        of retained delta files opens only the handful that can hold the
        key. Idempotent; sidecars live inside the dirs they index, so
        vacuum / rollback reclaim them with their data. ``only_parts``
        restricts the build to those logical partitions' directories
        (current layout; pure scope-limiting — pruning stays correct for
        unindexed files, they are simply always read)."""
        tokens = None
        if only_parts is not None:
            S = self.cfg.num_salts
            tokens = {f"{os.sep}part_p={lp * S + s}{os.sep}"
                      for lp in only_parts for s in range(S)}
        files: list[str] = []
        seen: set[str] = set()
        for e in self.manifest.committed_epochs():
            fs, _ = self._epoch_files(e)
            for f in fs:
                if f in seen:
                    continue
                if tokens is not None and not any(t in f for t in tokens):
                    continue
                seen.add(f)
                files.append(f)
        todo = [f for f in files if not os.path.exists(f + _KEYBLOOM_SUFFIX)]
        chunks = [todo[i:i + task_files]
                  for i in range(0, len(todo), task_files)]
        built = sum(ray.get([_build_keybloom_task.remote(c) for c in chunks]))
        return {"files": len(files), "built": built,
                "already_indexed": len(files) - len(todo)}

    #: explain/maintain summary keys (before/after comparison unit)
    _MAINTAIN_KEYS = ("max_files_per_bucket", "delta_bytes",
                      "max_bucket_bytes", "epoch_dirs_unmerged")

    def maintain(self, apply_repartition: bool = False,
                 max_rounds: int = 3, build_blooms: bool = True) -> dict:
        """Auto-optimize (the ops ``OPTIMIZE``): execute
        ``explain_layout``'s recommendations until the diagnostic is
        clean — ``compact()`` when active deltas outweigh the base (it
        subsumes a pending level-1 merge, so it runs first),
        ``compact_deltas`` for file-count read amplification.
        ``repartition`` is a whole-table rewrite whose cost rivals a full
        fold, so it only runs with ``apply_repartition=True``. One action
        per round, re-diagnosed between rounds; idempotent (a second call
        takes no actions). State is bit-identical before/after — every
        action is one of the engine's proven-equivalent maintenance ops.

        ``build_blooms`` (default on, VERDICT r4 item 5) finishes by
        building the ``.keybloom`` file-skipping sidecars for any file
        still missing one — point lookups and as-of lineage prune cold
        files without a separate ``index-blooms`` step; idempotent and
        incremental like the rest of maintain."""
        before = {k: None for k in self._MAINTAIN_KEYS}
        actions: list[str] = []
        for rnd in range(max_rounds):
            diag = self.explain_layout()
            if rnd == 0:
                before = {k: diag[k] for k in self._MAINTAIN_KEYS}
            ops = {p["op"]: p["args"] for p in diag["plan"]
                   if p["op"] != "repartition" or apply_repartition}
            if not ops:
                break
            if "compact" in ops:
                self.compact()
                actions.append("compact()")
            elif "compact_deltas" in ops:
                a, b = ops["compact_deltas"]
                self.compact_deltas(a, b)
                actions.append(f"compact_deltas({a}, {b})")
            elif "repartition" in ops:
                p_, s_ = ops["repartition"]
                self.repartition(p_, s_)
                actions.append(f"repartition({p_}, {s_})")
        after = self.explain_layout()
        out = {
            "actions": actions,
            "before": before,
            "after": {k: after[k] for k in self._MAINTAIN_KEYS},
            "remaining_recommendations": after["recommendations"],
        }
        if build_blooms:
            bl = self.build_key_blooms()
            if bl["built"]:
                actions.append(f"build_key_blooms() [{bl['built']} files]")
            out["key_blooms"] = bl
        return out

    def fsck(self, deep: bool = False) -> dict:
        """Table integrity check (the ops `fsck`): verify that everything
        the manifest claims is actually on disk and self-consistent —
        committed epoch dirs present (unless legitimately vacuumed below
        the compaction floor or covered by a delta segment), per-partition
        row counts matching the recorded lineage (parquet FOOTER metadata
        only — no data reads), lsn bounds within the entry's
        [min_lsn, max_lsn] (row-group statistics), segment dirs present,
        the active base snapshot present, and no rollback_pending
        leftovers. ``deep=True`` also re-reads every delta file's lsn
        column to confirm footer stats aren't lying (corruption check).

        Returns ``{"ok", "checks", "problems": [...]}`` — run it before
        trusting a restored backup or after a crash."""
        problems: list[str] = []
        checks = 0
        st = self.manifest.state
        floor = self.manifest.last_compacted_epoch()
        segged: set[int] = set()
        for seg in self.manifest.delta_segments():
            segged.update(range(seg["from"], seg["to"] + 1))
            checks += 1
            if not os.path.isdir(seg["dir"]):
                problems.append(f"segment dir missing: {seg['dir']}")
        base = st.get("base_bucketized_path") or st.get("base_path")
        if base is not None:
            checks += 1
            if not os.path.isdir(base) and not os.path.isfile(base):
                problems.append(f"base snapshot missing: {base}")
        for e in self.manifest.committed_epochs():
            entry = self.manifest.epoch_entry(e)
            d = entry.get("dir")
            if d is None:
                continue  # empty epoch
            if not os.path.isdir(d):
                checks += 1
                if e > floor and e not in segged:
                    problems.append(f"epoch {e}: delta dir missing: {d}")
                continue  # vacuumed below floor / segment-covered: fine
            part_files = self._files_by_part(d)
            want_parts = {int(p): v for p, v in entry.get("parts", {}).items()}
            for p, meta in want_parts.items():
                checks += 1
                files = part_files.get(p, [])
                if not files:
                    if meta.get("rows", 0) > 0:
                        problems.append(f"epoch {e} part {p}: files missing")
                    continue
                n = 0
                lsn_lo, lsn_hi = None, -1
                for f in files:
                    pf = pq.ParquetFile(f)
                    n += pf.metadata.num_rows
                    for rg in range(pf.metadata.num_row_groups):
                        col = pf.metadata.row_group(rg).column(
                            pf.schema_arrow.get_field_index("lsn"))
                        s = col.statistics
                        if s is not None and s.has_min_max:
                            lsn_lo = s.min if lsn_lo is None else min(lsn_lo, s.min)
                            lsn_hi = max(lsn_hi, s.max)
                    if deep:
                        t = pq.read_table(f, columns=["lsn"])
                        if t.num_rows:
                            lo = pc.min(t["lsn"]).as_py()
                            hi = pc.max(t["lsn"]).as_py()
                            lsn_lo = lo if lsn_lo is None else min(lsn_lo, lo)
                            lsn_hi = max(lsn_hi, hi)
                if n != meta.get("rows", n):
                    problems.append(
                        f"epoch {e} part {p}: {n} rows on disk vs "
                        f"{meta['rows']} in lineage")
                if lsn_hi > entry.get("max_lsn", lsn_hi):
                    problems.append(
                        f"epoch {e} part {p}: lsn {lsn_hi} above entry "
                        f"max_lsn {entry.get('max_lsn')}")
                mn = entry.get("min_lsn")
                if mn is not None and lsn_lo is not None and lsn_lo < mn:
                    problems.append(
                        f"epoch {e} part {p}: lsn {lsn_lo} below entry "
                        f"min_lsn {mn}")
        for d in self.manifest.rollback_pending():
            checks += 1
            if os.path.exists(d):
                problems.append(f"rollback_pending leftover on disk: {d}")
        # tags must point at readable epochs (committed AND at/above the
        # compaction floor — a floor-passed tag raises on read)
        for name, e in self.manifest.tags().items():
            checks += 1
            if not self.manifest.is_committed(e):
                problems.append(f"tag {name!r}: epoch {e} not committed")
            elif e < floor:
                problems.append(
                    f"tag {name!r}: epoch {e} below compaction floor {floor} "
                    f"(unreadable; delete the tag or restore from export)")
        # in-doubt transaction intents (state/txn.py): staged-but-undecided
        # work holding disk — resolve with MultiTableTxn.recover
        idir = os.path.join(self.root, "_txn")
        if os.path.isdir(idir):
            for fn in sorted(os.listdir(idir)):
                if fn.endswith(".json"):
                    checks += 1
                    problems.append(f"in-doubt txn intent: {fn} "
                                    f"(run MultiTableTxn.recover)")
        return {"ok": not problems, "checks": checks, "problems": problems}

    def orphans(self) -> dict:
        """Inverse of :meth:`fsck`: list what's ON DISK that the manifest
        does NOT reference (fsck checks manifest→disk; this checks
        disk→manifest). Never deletes — it's the vacuum dry-run / clone-
        and-crash-leftover audit.

        Classification:
        - ``staged_epochs`` — ``deltas/epoch=N`` dirs for uncommitted N:
          a prepared-but-unfinalized epoch (possibly a pending multi-table
          txn — see the intent files fsck reports) or a crashed apply.
          Resolvable, so listed separately from junk.
        - ``orphans`` — everything else unreferenced: CAS-loser base
        snapshots a ``vacuum`` would reclaim, scratch under ``_tmp``,
        stray files. Safe-to-delete candidates.
        Returns ``{"orphans": [...], "staged_epochs": [...], "bytes": N}``
        (bytes = total size of the orphan files only)."""
        st = self.manifest.state
        referenced: set[str] = set()
        for entry in st.get("epochs", {}).values():
            if entry.get("dir"):
                referenced.add(os.path.abspath(entry["dir"]))
        for seg in self.manifest.delta_segments():
            referenced.add(os.path.abspath(seg["dir"]))
        for c in st.get("compactions", []):
            for key in ("base_path",):
                if c.get(key):
                    referenced.add(os.path.abspath(c[key]))
        for key in ("base_path", "base_bucketized_path"):
            if st.get(key):
                referenced.add(os.path.abspath(st[key]))
        for d in self.manifest.rollback_pending():
            referenced.add(os.path.abspath(d))

        def _is_referenced(path: str) -> bool:
            p = os.path.abspath(path)
            for r in referenced:
                if p == r or p.startswith(r + os.sep) or r.startswith(p + os.sep):
                    return True
            return False

        committed = set(self.manifest.committed_epochs())
        orphans: list[str] = []
        staged: list[str] = []
        root_abs = os.path.abspath(self.root)
        for name in sorted(os.listdir(self.root)):
            if name in ("_manifest", "_txn"):
                continue  # engine metadata, always live
            top = os.path.join(self.root, name)
            if name == "_tmp" and os.path.isdir(top):
                # the (empty) scratch parent is normal; only leftovers
                # inside it are orphans (a crashed apply's staging dir)
                orphans.extend(
                    os.path.join(name, sub) for sub in sorted(os.listdir(top))
                )
                continue
            if name == "deltas" and os.path.isdir(top):
                for sub in sorted(os.listdir(top)):
                    d = os.path.join(top, sub)
                    if _is_referenced(d):
                        continue
                    if sub.startswith("epoch="):
                        try:
                            e = int(sub.split("=", 1)[1])
                        except ValueError:
                            e = None
                        if e is not None and e not in committed:
                            staged.append(os.path.relpath(d, root_abs))
                            continue
                    orphans.append(os.path.relpath(d, root_abs))
                continue
            if _is_referenced(top):
                continue
            orphans.append(os.path.relpath(top, root_abs))

        total = 0
        for rel in orphans:
            p = os.path.join(self.root, rel)
            if os.path.isfile(p):
                total += os.path.getsize(p)
            else:
                for dp, _dn, fns in os.walk(p):
                    total += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
        return {"orphans": orphans, "staged_epochs": staged, "bytes": total}

    def rollback(self, to_epoch: int) -> dict:
        """Truncate the log to ``to_epoch`` (drop every later committed
        epoch — the bad-upstream-batch remedy): one CAS manifest commit
        drops the epochs, THEIR schema ops and fully-above delta segments,
        then the orphaned delta dirs are removed (best-effort; a crash
        mid-cleanup is healed by ``apply_epoch``'s rollback_pending check,
        so stale data can never be adopted by a re-applied epoch).

        Refuses to roll below the compaction floor (those events are
        already folded into a base snapshot and cannot be un-applied
        without restoring an older snapshot) or across a delta segment
        straddling the boundary (the merged run cannot be split; run the
        rollback before segmenting, or to a segment edge).

        Incrementally-maintained views based above the new head must be
        rebuilt (SourceCountsView detects a vanished base epoch and falls
        back to a full rebuild on refresh)."""
        floor = self.manifest.last_compacted_epoch()
        if to_epoch < floor:
            raise ValueError(
                f"cannot roll back to epoch {to_epoch}: epochs <= {floor} "
                f"are compacted into the base snapshot"
            )
        for seg in self.manifest.delta_segments():
            if seg["from"] <= to_epoch < seg["to"]:
                raise ValueError(
                    f"rollback to {to_epoch} would split delta segment "
                    f"[{seg['from']}..{seg['to']}]; roll back to a segment "
                    f"edge or vacuum the segment first"
                )
        before = self.manifest.committed_epochs()
        dropped = [e for e in before if e > to_epoch]
        dirs = self.manifest.record_rollback(to_epoch)
        cleaned = []
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
            if not os.path.exists(d):
                cleaned.append(d)
        self.manifest.clear_rollback_pending(cleaned)
        return {"to_epoch": to_epoch, "dropped_epochs": dropped,
                "removed_dirs": cleaned}

    # ------------------------------------------------------------------ #
    # level-1 delta compaction (bounds merge-on-read read amplification)
    # ------------------------------------------------------------------ #
    def compact_deltas(self, from_epoch: int, to_epoch: int) -> str:
        """Merge the delta FILES of committed epochs [from..to] into ONE
        sorted run per physical partition (LSM level-1). Events are
        preserved bit-for-bit (sorted by lsn, duplicate lsns dropped), so
        semantics are untouched — this bounds the file-count read
        amplification that grows with epoch count between full ``compact``
        calls. Idempotent: an existing covering segment is returned."""
        for seg in self.manifest.delta_segments():
            if seg["from"] == from_epoch and seg["to"] == to_epoch:
                return seg["dir"]
            if not (to_epoch < seg["from"] or from_epoch > seg["to"]):
                raise ValueError(f"range [{from_epoch},{to_epoch}] overlaps segment {seg}")
        floor = self.manifest.last_compacted_epoch()
        if from_epoch <= floor:
            raise ValueError(f"epochs <= {floor} are already base-compacted")
        epochs = [e for e in self.manifest.committed_epochs()
                  if from_epoch <= e <= to_epoch]
        if epochs != list(range(from_epoch, to_epoch + 1)):
            raise ValueError(
                f"range [{from_epoch},{to_epoch}] is not a contiguous committed run"
            )
        by_part: dict[int, list[str]] = {}
        for e in epochs:
            d = os.path.join(self.root, "deltas", f"epoch={e}")
            if os.path.isdir(d):
                for p, fs in self._files_by_part(d).items():
                    by_part.setdefault(p, []).extend(fs)
        final_dir = os.path.join(
            self.root, "delta_segments", f"seg={from_epoch}-{to_epoch}"
        )
        if not os.path.exists(final_dir):
            tmp = final_dir + ".tmp-" + uuid.uuid4().hex[:8]
            os.makedirs(tmp, exist_ok=True)  # all-empty ranges publish an empty segment
            refs = [
                _merge_delta_files_task.remote(
                    fs, os.path.join(tmp, f"part_p={p}", "merged.parquet")
                )
                for p, fs in sorted(by_part.items())
            ]
            ray.get(refs)
            os.makedirs(os.path.dirname(final_dir), exist_ok=True)
            try:
                os.rename(tmp, final_dir)
            except OSError:
                if not os.path.exists(final_dir):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
        self.manifest.record_delta_segment(from_epoch, to_epoch, final_dir)
        return final_dir

    def clone(self, dst_root: str) -> dict:
        """Zero-copy table clone (the lakehouse ``CLONE TABLE`` analog):
        hardlink every data file under this table's root into ``dst_root``
        and write a fresh manifest whose under-root paths are rewritten to
        the clone. O(files) metadata work, zero data bytes copied.

        Hardlinks make the clone *independent* of the source's lifecycle —
        unlike a shallow (pointer) clone, ``vacuum``/``rollback``/
        ``compact`` on either table can never invalidate the other (an
        inode lives until its last link drops) — while still sharing all
        data bytes at clone time. Writes diverge naturally: each table
        appends new epochs under its own root. Falls back to a real copy
        across filesystems. An external ``base_path`` outside the root is
        kept as a shared read-only reference (the same contract the source
        itself has with it).

        The clone captures the manifest version current at entry; its
        version log restarts at v1 (the snapshot carries state, not
        history — same contract as Delta Lake's CLONE). A concurrent
        writer's later commit is not part of the clone. Concurrent
        ``vacuum`` during the link walk may race file removal; run clone
        from a quiesced writer or catch the raised error and retry.

        Reference analog: none — the reference reruns migrations from
        scratch (purge-then-reload, record_update.py:170-173); this is the
        table-management surface around the S9 manifest sink."""
        import copy as _copy

        snapshot = _copy.deepcopy(self.manifest.state)
        src_abs = os.path.abspath(self.root)
        dst_abs = os.path.abspath(dst_root)
        if dst_abs == src_abs or dst_abs.startswith(src_abs + os.sep) or \
                src_abs.startswith(dst_abs + os.sep):
            raise ValueError("clone destination must be outside the source root")
        if os.path.exists(dst_root) and os.listdir(dst_root):
            raise ValueError(f"clone destination not empty: {dst_root}")
        os.makedirs(dst_root, exist_ok=True)

        files_linked = 0
        for name in sorted(os.listdir(self.root)):
            if name in ("_manifest", "_tmp", "_txn"):
                continue  # fresh manifest below; scratch/intents are not state
            top = os.path.join(self.root, name)
            if os.path.isfile(top):
                dp = os.path.join(dst_root, name)
                try:
                    os.link(top, dp)
                except OSError:
                    shutil.copy2(top, dp)
                files_linked += 1
                continue
            for dirpath, _dirnames, filenames in os.walk(top):
                rel = os.path.relpath(dirpath, self.root)
                os.makedirs(os.path.join(dst_root, rel), exist_ok=True)
                for fn in filenames:
                    sp = os.path.join(dirpath, fn)
                    dp = os.path.join(dst_root, rel, fn)
                    try:
                        os.link(sp, dp)
                    except OSError:
                        shutil.copy2(sp, dp)
                    files_linked += 1

        prefixes = {self.root, src_abs}

        def _rewrite(o):
            if isinstance(o, str):
                for pref in prefixes:
                    if o == pref:
                        return dst_root
                    if o.startswith(pref + os.sep):
                        return os.path.join(dst_root, os.path.relpath(o, pref))
                return o
            if isinstance(o, list):
                return [_rewrite(x) for x in o]
            if isinstance(o, dict):
                return {k: _rewrite(v) for k, v in o.items()}
            return o

        new_state = _rewrite(snapshot)
        new_state["version"] = 0
        dst_manifest = Manifest(dst_root)
        if dst_manifest.state.get("num_partitions") is not None:
            raise ValueError(f"clone destination already has a table: {dst_root}")
        dst_manifest.state = new_state
        dst_manifest.save()
        return {
            "root": dst_root,
            "files_linked": files_linked,
            "source_version": snapshot.get("version", 0),
            "epochs": sorted(int(k) for k in snapshot.get("epochs", {})),
        }

    def vacuum_deltas(self) -> list[str]:
        """Remove per-epoch delta dirs fully covered by merged segments.
        After vacuuming, ``up_to_epoch`` reads that cut a segment mid-range
        raise (the guard in ``fold_output``); audit/deadletter reads fall
        back to the segment filtered by epoch."""
        removed = []
        floor = self.manifest.last_compacted_epoch()
        for seg in self.manifest.delta_segments():
            straddles = seg["from"] <= floor < seg["to"]
            for e in range(seg["from"], seg["to"] + 1):
                if straddles and e > floor:
                    # state reads EXCLUDE floor-straddling segments (their
                    # pre-floor part is already folded into the base), so
                    # the per-epoch dir is the only live copy of this
                    # epoch's events — keep it
                    continue
                d = os.path.join(self.root, "deltas", f"epoch={e}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
                    removed.append(d)
        return removed

    def vacuum(self, retain_audit: bool = True, retain_snapshots: int = 0,
               retain_versions: int = 64) -> list[str]:
        """Reclaim storage after compactions (Delta-Lake-style VACUUM).

        Removes base snapshots under the table root superseded by a later
        ``compact()`` (each compaction writes a full new snapshot — at
        scale the old ones dominate storage). ``retain_snapshots=N`` keeps
        the N most recently superseded snapshots as a retention window
        (Delta's ``RETAIN``): a reader that listed its files before any of
        the last N compactions committed still finds its base. With
        ``retain_audit=False`` it also drops the below-floor delta epoch
        dirs and segments whose events are already folded into the base;
        their per-epoch audit/deadletter history becomes unreadable
        (``audit_dataset`` raises), while state and whole-run metrics stay
        intact (the compaction's metrics snapshot carries the counters).

        With ``retain_snapshots=0``, run only when no concurrent reader
        predates the latest compaction. Never touches the user-supplied
        ``base_path`` input (only snapshots under the table root)."""
        removed: list[str] = []
        current = self.manifest.state.get("base_bucketized_path")
        if current and self.manifest.state["compactions"]:
            cur = os.path.realpath(current)
            # superseded snapshots in commit order: the original bucketized
            # base, then each compaction's snapshot
            ordered = [os.path.join(self.root, "base_bucketized")]
            ordered += [c["base_path"] for c in self.manifest.state["compactions"]]
            ordered = [d for d in ordered
                       if os.path.isdir(d) and os.path.realpath(d) != cur]
            keep = set(ordered[len(ordered) - retain_snapshots:]) \
                if retain_snapshots else set()
            # orphans: snapshot dirs never recorded in the manifest (a CAS
            # loser's published-but-unreferenced output) are always dead
            known = {os.path.realpath(d) for d in ordered} | {cur}
            orphans = [d for pat in ("base-compact-*", "base-repart-*")
                       for d in glob.glob(os.path.join(self.root, pat))
                       if ".tmp" not in os.path.basename(d)
                       and os.path.realpath(d) not in known]
            for d in ordered + orphans:
                if d in keep:
                    continue
                shutil.rmtree(d)
                removed.append(d)
        if not retain_audit:
            floor = self.manifest.last_compacted_epoch()
            for e in self.manifest.committed_epochs():
                if e > floor:
                    continue
                d = os.path.join(self.root, "deltas", f"epoch={e}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
                    removed.append(d)
            for seg in self.manifest.delta_segments():
                if seg["to"] <= floor and os.path.isdir(seg["dir"]):
                    shutil.rmtree(seg["dir"])
                    removed.append(seg["dir"])
        if retain_versions > 0:
            # transaction-log checkpointing: one version file per commit
            # accumulates forever under streaming ingest
            removed += self.manifest.prune_versions(keep=retain_versions)
        return removed

    def _epoch_files(self, epoch: int) -> tuple[list[str], bool]:
        """Files holding an epoch's events + whether a segment filter by
        epoch is needed (vacuumed epoch served from its merged segment)."""
        d = os.path.join(self.root, "deltas", f"epoch={epoch}")
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        if files:
            return files, False
        seg = self.manifest.segment_covering(epoch)
        if seg:
            return sorted(
                glob.glob(os.path.join(seg["dir"], "**", "*.parquet"), recursive=True)
            ), True
        return [], False

    # ------------------------------------------------------------------ #
    def audit_dataset(self, epoch: int):
        """Full routed-event audit for an epoch (reference S11 audit logs),
        with M16 fuzzy-audit parity: ratio, Jaccard and both titles
        (reference ``log_fuzzy_match``, utils.py:301-344).

        Jaccard is computed here in the audit READ path (per-row over the
        audit artifact only — the reference likewise computes it per logged
        record), keeping the ingest hot path fully vectorized."""
        from marc_data_migration_ray.functions.fuzzy import jaccard as _jac

        files, need_filter = self._epoch_files(epoch)
        if not files and self.manifest.is_committed(epoch) \
                and self.manifest.epoch_entry(epoch)["processed"]:
            raise ValueError(
                f"epoch {epoch}: delta events were vacuumed without audit "
                f"retention (vacuum(retain_audit=False)); audit history is gone"
            )
        ds = ray.data.read_parquet(
            files,
            columns=["lsn", "epoch", "doc_id_raw", "key", "op", "route", "status",
                     "match_score", "title", "match_title"],
        )
        if need_filter:
            ds = ds.filter(expr=f"epoch == {epoch}")
        ds = ds.map_batches(
            lambda t: t.drop_columns(["epoch"]), batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def _with_metrics(t: pa.Table) -> pa.Table:
            titles = t["title"].to_pylist()
            matches = t["match_title"].to_pylist()
            ja = [
                _jac(a, b) if (a is not None and b is not None) else None
                for a, b in zip(titles, matches)
            ]
            out = t.rename_columns(
                ["lsn", "doc_id_raw", "key", "op", "route", "status",
                 "ratio", "title", "match_title"]
            )
            return out.append_column("jaccard", pa.array(ja, pa.float64()))

        return ds.map_batches(_with_metrics, batch_format="pyarrow", zero_copy_batch=True)

    def deadletter_dataset(self, epoch: int):
        """Dead-letter rows for an epoch (reference S7 bad-records sink)."""
        files, need_filter = self._epoch_files(epoch)
        if not files:
            if self.manifest.is_committed(epoch) \
                    and self.manifest.epoch_entry(epoch)["processed"]:
                # consistent with audit_dataset: destroyed history must not
                # read as "the epoch had no deadletters"
                raise ValueError(
                    f"epoch {epoch}: delta events were vacuumed without audit "
                    f"retention (vacuum(retain_audit=False)); history is gone"
                )
            return None
        ds = ray.data.read_parquet(files)
        if need_filter:
            ds = ds.filter(expr=f"epoch == {epoch}")
        return ds.filter(expr="route == 'deadletter'")

    def cleanup_tmp(self) -> None:
        t = os.path.join(self.root, "_tmp")
        if os.path.isdir(t):
            shutil.rmtree(t)


def _empty_like_export(dest: str, fallback_cols) -> pa.Table:
    """Zero-row table with the export's REAL schema (read from any data
    file), so a fully-pruned scan still yields every column a consumer
    selects; falls back to int64 cluster columns on a fileless export."""
    any_file = next(
        iter(glob.glob(os.path.join(dest, "*", "*.parquet"))), None)
    if any_file is not None:
        return pq.read_schema(any_file).empty_table()
    return pa.table({c: pa.array([], pa.int64()) for c in fallback_cols})


def scan_export(dest: str, lo: int | None = None, hi: int | None = None) -> dict:
    """Zone-map-pruned scan of a range-clustered export
    (``export_snapshot(..., cluster_by=col)``): the consumer-side data-
    skipping read. Directories whose zone ``[min, max]`` cannot intersect
    ``[lo, hi]`` are never opened — at 100 TB a selective range predicate
    touches a handful of range dirs instead of the whole table. Surviving
    files are read with the same predicate pushed down as a parquet filter
    (row-group pruning inside files) AND applied exactly (NULL cluster
    values never match, matching SQL comparison semantics).

    Returns ``{"dataset", "cluster_by", "ranges_scanned", "ranges_total",
    "rows_skipped"}`` — the skip counts are the no-silent-caps audit trail."""
    with open(os.path.join(dest, "_EXPORT.json")) as f:
        info = json.load(f)
    if "zones" not in info:
        raise ValueError(f"{dest} is not a range-clustered export")
    col = info["cluster_by"]
    keep, skipped_rows = [], 0
    bounded = lo is not None or hi is not None
    for z in info["zones"]:
        # an all-NULL/empty zone never matches a RANGE PREDICATE (SQL
        # comparison semantics) — but an unbounded scan must return its
        # rows (code-review r5: they silently vanished with no predicate
        # to justify it; scan_export_zorder already keeps all zones when
        # no predicate is given)
        empty = bounded and z["min"] is None
        out = empty or (lo is not None and z["max"] < lo) \
            or (hi is not None and z["min"] > hi)
        if out:
            skipped_rows += z["n_rows"]
        else:
            keep.append(z["range_id"])
    files = []
    for r in keep:
        files.extend(sorted(glob.glob(
            os.path.join(dest, f"range_id={r}", "*.parquet"))))
    if not files:
        ds = ray.data.from_arrow(_empty_like_export(dest, [col]))
    else:
        import pyarrow.dataset as pads
        from marc_data_migration_ray.sources import readers

        f_expr = None
        if lo is not None:
            f_expr = pads.field(col) >= lo
        if hi is not None:
            e = pads.field(col) <= hi
            f_expr = e if f_expr is None else (f_expr & e)
        ds = readers.read_parquet(
            files, **({"filter": f_expr} if f_expr is not None else {})
        )
        conds = [c for c, on in
                 ((f"{col} >= {lo}", lo is not None),
                  (f"{col} <= {hi}", hi is not None)) if on]
        if conds:
            ds = ds.filter(expr=" and ".join(conds))
    return {
        "dataset": ds,
        "cluster_by": col,
        "ranges_scanned": len(keep),
        "ranges_total": len(info["zones"]),
        "rows_skipped": skipped_rows,
    }


# ------------------------------------------------------------- Z-order --


def _morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """62-bit Morton (Z-order) code of two non-negative int arrays: bits
    of ``a`` on even positions, ``b`` on odd. Pure numpy bit spreading —
    the standard magic-mask interleave (public domain folklore; cf.
    "Bit Twiddling Hacks")."""

    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64) & np.uint64((1 << 31) - 1)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return spread(a) | (spread(b) << np.uint64(1))


_Z_COARSE_BITS = 16  # keep the top 16 OCCUPIED Morton bits -> <= 65536 bins


def export_snapshot_zorder(
    rp: "Replayer",
    dest: str,
    cols: tuple[str, str] = ("n_tok", "last_lsn"),
    n_ranges: int = 16,
    up_to_epoch: int | None = None,
) -> dict:
    """2-D Z-ORDER clustered export (OPTIMIZE ... ZORDER BY (a, b)
    analog): rows land in ``dest/range_id=<r>/`` directories ordered by
    the Morton interleave of the two int columns, and ``_EXPORT.json``
    records one exact per-range zone map PER COLUMN — so
    ``scan_export_zorder`` can skip directories for a predicate on
    EITHER column (the property 1-D range clustering lacks).

    Scale shape: pass 1 = per-batch min partials (offsets make values
    non-negative for the interleave); pass 2 = per-batch stats grouped by
    the COARSE Morton bin (top 16 bits → ≤ 65536 bins regardless of row
    count — the bounded-histogram argument of token_quantiles); driver
    merges the bins, splits at N/k cumulative counts on bin boundaries
    (equal bins never split), derives per-range/per-column min/max from
    the bin stats; route pass broadcasts the bin bounds. NULL in either
    column routes to range 0 and is counted in the zone's ``nulls`` (a
    range predicate never matches NULL — SQL semantics — so null rows
    are always prunable/filtered exactly)."""
    marker = os.path.join(dest, "_EXPORT.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    a_col, b_col = cols
    up_to = up_to_epoch if up_to_epoch is not None else (
        rp.manifest.committed_epochs()[-1]
        if rp.manifest.committed_epochs() else -1
    )
    rows = rp.read_state(up_to).materialize()

    def _minmax(t: pa.Table) -> pa.Table:
        out = {}
        for c in (a_col, b_col):
            v = pc.drop_null(pc.cast(t[c], pa.int64()))
            has = len(v) > 0
            out[f"{c}_lo"] = pa.array([pc.min(v).as_py() if has else None], pa.int64())
            out[f"{c}_hi"] = pa.array([pc.max(v).as_py() if has else None], pa.int64())
        return pa.table(out)

    lo = {a_col: None, b_col: None}
    hi = {a_col: None, b_col: None}
    for b in rows.map_batches(
        _minmax, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for c in (a_col, b_col):
            vlo, vhi = b[f"{c}_lo"][0].as_py(), b[f"{c}_hi"][0].as_py()
            if vlo is not None:
                lo[c] = vlo if lo[c] is None else min(lo[c], vlo)
                hi[c] = vhi if hi[c] is None else max(hi[c], vhi)
    off_a = lo[a_col] or 0
    off_b = lo[b_col] or 0
    # adaptive coarse shift: the Morton code occupies 2*max(bit widths)
    # bits for THIS data; keep its top _Z_COARSE_BITS (<= 65536 bins)
    span_bits = max(
        int(hi[a_col] - off_a).bit_length() if hi[a_col] is not None else 1,
        int(hi[b_col] - off_b).bit_length() if hi[b_col] is not None else 1,
        1,
    )
    shift = max(0, 2 * span_bits - _Z_COARSE_BITS)

    def _bin_of(t: pa.Table) -> np.ndarray:
        av = pc.fill_null(pc.cast(t[a_col], pa.int64()), off_a).to_numpy(
            zero_copy_only=False) - off_a
        bv = pc.fill_null(pc.cast(t[b_col], pa.int64()), off_b).to_numpy(
            zero_copy_only=False) - off_b
        return (_morton2(np.maximum(av, 0), np.maximum(bv, 0))
                >> np.uint64(shift)).astype(np.int64)

    def _stats(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64())
        b = pc.cast(t[b_col], pa.int64())
        both = pc.cast(
            pc.and_kleene(pc.is_valid(a), pc.is_valid(b)), pa.int64())
        g = pa.table({
            "bin": pa.array(_bin_of(t)), "a": a, "b": b, "both": both,
        })
        return g.group_by("bin").aggregate([
            ("a", "min"), ("a", "max"),
            ("b", "min"), ("b", "max"),
            ("both", "sum"), ([], "count_all"),
        ])

    bins: dict[int, list] = {}
    for t in rows.map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for r in t.to_pylist():
            e = bins.setdefault(r["bin"], [None, None, None, None, 0, 0])
            for i, k in ((0, "a_min"), (2, "b_min")):
                if r[k] is not None:
                    e[i] = r[k] if e[i] is None else min(e[i], r[k])
            for i, k in ((1, "a_max"), (3, "b_max")):
                if r[k] is not None:
                    e[i] = r[k] if e[i] is None else max(e[i], r[k])
            e[4] += r["count_all"]
            # rows with NULL in EITHER column (exact: total - both-valid)
            e[5] += r["count_all"] - (r["both_sum"] or 0)

    order = np.array(sorted(bins), np.int64)
    cnts = np.array([bins[x][4] for x in order], np.int64)
    cum = np.cumsum(cnts)
    total = int(cum[-1]) if len(cum) else 0
    k = max(1, min(n_ranges, len(order)))
    targets = (np.arange(1, k) * total) // k
    bidx = np.unique(np.searchsorted(cum, targets, side="left"))
    bounds = order[bidx] if len(order) else np.array([], np.int64)
    rid_of_bin = np.searchsorted(bounds, order, side="left")
    zones = []
    for r in range(len(bounds) + 1):
        sel = [x for x, rid in zip(order, rid_of_bin) if rid == r]
        amin = amax = bmin = bmax = None
        n = nulls = 0
        for x in sel:
            e = bins[x]
            if e[0] is not None:
                amin = e[0] if amin is None else min(amin, e[0])
                amax = e[1] if amax is None else max(amax, e[1])
            if e[2] is not None:
                bmin = e[2] if bmin is None else min(bmin, e[2])
                bmax = e[3] if bmax is None else max(bmax, e[3])
            n += e[4]
            nulls += e[5]
        zones.append({
            "range_id": int(r),
            f"{a_col}_min": amin, f"{a_col}_max": amax,
            f"{b_col}_min": bmin, f"{b_col}_max": bmax,
            "n_rows": int(n), "nulls": int(nulls),
        })
    bounds_ref = ray.put(bounds)

    def _route(t: pa.Table) -> pa.Table:
        bs = ray.get(bounds_ref)
        rid = np.searchsorted(bs, _bin_of(t), side="left")
        return t.append_column("range_id", pa.array(rid.astype(np.int32)))

    tmp = dest.rstrip("/") + f".tmp-{uuid.uuid4().hex[:8]}"
    write_parquet_partitioned(rows.map_batches(
        _route, batch_format="pyarrow", zero_copy_batch=True
    ), tmp, ["range_id"], row_group_size=_ROW_GROUP_SIZE)
    info = {
        "up_to_epoch": up_to,
        "cluster_by": list(cols),
        "zorder": True,
        "zones": zones,
        "n_rows": total,
    }
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "_EXPORT.json"), "w") as f:
        json.dump(info, f)
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    try:
        os.rename(tmp, dest)
    except OSError:
        if not os.path.exists(marker):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
        with open(marker) as f:
            return json.load(f)
    return info


def scan_export_zorder(dest: str, **preds) -> dict:
    """Zone-pruned scan of a Z-ordered export: ``preds`` maps a clustered
    column to an ``(lo, hi)`` bound (either may be None). A directory is
    skipped when ANY predicated column's zone cannot intersect its bound
    (rows with NULL in a predicated column never match, so null rows
    prune away with their range). Survivors are read with the conjunctive
    predicate pushed into the parquet scan and applied exactly."""
    with open(os.path.join(dest, "_EXPORT.json")) as f:
        info = json.load(f)
    if not info.get("zorder"):
        raise ValueError(f"{dest} is not a Z-ordered export")
    cols = info["cluster_by"]
    for c in preds:
        if c not in cols:
            raise ValueError(f"{c} is not a clustered column of {dest}")
    keep, skipped_rows = [], 0
    for z in info["zones"]:
        out = False
        for c, (lo, hi) in preds.items():
            zmin, zmax = z[f"{c}_min"], z[f"{c}_max"]
            if zmin is None or (lo is not None and zmax < lo) \
                    or (hi is not None and zmin > hi):
                out = True
                break
        if out:
            skipped_rows += z["n_rows"]
        else:
            keep.append(z["range_id"])
    files = []
    for r in keep:
        files.extend(sorted(glob.glob(
            os.path.join(dest, f"range_id={r}", "*.parquet"))))
    if not files:
        ds = ray.data.from_arrow(_empty_like_export(dest, cols))
    else:
        import pyarrow.dataset as pads

        from marc_data_migration_ray.sources import readers

        f_expr = None
        for c, (lo, hi) in preds.items():
            for e in ([pads.field(c) >= lo] if lo is not None else []) + \
                     ([pads.field(c) <= hi] if hi is not None else []):
                f_expr = e if f_expr is None else (f_expr & e)
        ds = readers.read_parquet(
            files, **({"filter": f_expr} if f_expr is not None else {})
        )
        conds = []
        for c, (lo, hi) in preds.items():
            if lo is not None:
                conds.append(f"{c} >= {lo}")
            if hi is not None:
                conds.append(f"{c} <= {hi}")
        if conds:
            ds = ds.filter(expr=" and ".join(conds))
    return {
        "dataset": ds,
        "cluster_by": cols,
        "ranges_scanned": len(keep),
        "ranges_total": len(info["zones"]),
        "rows_skipped": skipped_rows,
    }
