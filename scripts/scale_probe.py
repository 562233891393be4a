"""10× scale probe: does "partitions scale with data" hold another decade?

Round-2 established (BASELINE.md, 4× probe): per-event replay cost is flat
when ``num_partitions`` grows with the data. This probe pushes one more
decade — default **40M events / 20M-row base / 1024 partitions** (10× the
bench fixture) — and optionally applies deliberate object-store pressure
(``--object-store-gb``) to observe spill behavior instead of guessing it.

Rerunnable:

    python scripts/scale_probe.py                      # full 10x probe
    python scripts/scale_probe.py --events 8000000 \
        --partitions 256 --cpus 8                      # smaller dry run
    python scripts/scale_probe.py --object-store-gb 2  # force spilling

Protocol mirrors bench.py's headline (same warm-up, same timing cuts):
fixture on /tmp (one-time generation, cached by a _DONE marker keyed on
the shape), table root on /dev/shm, ``precollapse_updates=True``,
8 cpus by default (this VM's memory-bandwidth-optimal level — see
BASELINE.md "bandwidth wall"). Prints one JSON line per phase and a
final summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

os.environ.setdefault("POLARS_MAX_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def ensure_fixture(root: str, n_rows: int, n_events: int, n_epochs: int,
                   epoch_chunk: int) -> str:
    """Generate the probe fixture once. The base table is one vectorized
    call (fits driver memory comfortably at 20M rows); the binlog is
    written in EPOCH CHUNKS with rebased LSNs so the driver never holds
    the whole 40M-event log at once. Chunks re-seed deterministically, so
    the fixture is a pure function of the shape arguments."""
    from marc_data_migration_ray.sources import fixtures

    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        # the marker records epoch_chunk (binlog content depends on the
        # chunk-indexed seeds): an explicit --fixture-root reused with a
        # different chunk regenerates instead of silently serving stale
        # data (ADVICE r3 item 4)
        try:
            if int(open(marker).read().strip()) == epoch_chunk:
                return root
        except ValueError:
            pass  # legacy "ok" marker: regenerate once under the new rule
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    base_dir = os.path.join(root, "base")
    os.makedirs(base_dir)
    import pyarrow.parquet as pq

    base = fixtures.make_base_table(n_rows=n_rows, seed=1234)
    for i in range(0, n_rows, 2_000_000):
        pq.write_table(base.slice(i, 2_000_000),
                       os.path.join(base_dir, f"part-{i // 2_000_000:05d}.parquet"),
                       row_group_size=1 << 20)
    del base
    log({"phase": "fixture_base", "rows": n_rows,
         "sec": round(time.perf_counter() - t0, 1)})
    # binlog, one epoch at a time, each epoch in chunks
    per_epoch = n_events // n_epochs
    lsn0 = 1
    t0 = time.perf_counter()
    for e in range(n_epochs):
        d = os.path.join(root, "binlog", f"epoch={e}")
        os.makedirs(d)
        written = 0
        chunk_i = 0
        while written < per_epoch:
            n = min(epoch_chunk, per_epoch - written)
            b = fixtures.make_binlog(
                n_events=n, n_base_rows=n_rows, seed=4321 + e * 1000 + chunk_i,
                n_epochs=1, schema_change_frac=0.0,
            )
            import pyarrow.compute as pc
            import pyarrow as pa

            # re-base lsn (globally unique, monotone) and epoch columns
            b = b.set_column(
                b.column_names.index("lsn"), "lsn",
                pc.add(pc.cast(b["lsn"], pa.int64()), lsn0 - 1))
            b = b.set_column(
                b.column_names.index("epoch"), "epoch",
                pa.array([e] * b.num_rows, pa.int32()))
            # many files per epoch = read parallelism for the ingest scan
            # (same 100k rows/file layout as bench.py's fixture)
            for off in range(0, b.num_rows, 100_000):
                pq.write_table(
                    b.slice(off, 100_000),
                    os.path.join(d, f"chunk-{chunk_i:05d}-{off // 100_000:04d}.parquet"))
            lsn0 += n
            written += n
            chunk_i += 1
    log({"phase": "fixture_binlog", "events": n_events, "epochs": n_epochs,
         "sec": round(time.perf_counter() - t0, 1)})
    open(marker, "w").write(str(epoch_chunk))
    return root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=40_000_000)
    ap.add_argument("--rows", type=int, default=None,
                    help="base rows (default events // 2)")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=1024)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--object-store-gb", type=float, default=None,
                    help="cap the object store to force spilling")
    ap.add_argument("--fixture-root", default=None)
    ap.add_argument("--table-root", default=None)
    ap.add_argument("--epoch-chunk", type=int, default=2_000_000)
    ap.add_argument("--fold-split-bytes", type=int, default=None,
                    help="override cfg.fold_split_bytes (0 disables the "
                         "fat-bucket auto-split; default = config default)")
    args = ap.parse_args()
    n_rows = args.rows or args.events // 2
    # epoch_chunk is part of the fixture identity: chunk-indexed seeds
    # mean a different chunk size yields different binlog CONTENT, so it
    # must key the cache dir too (ADVICE r3 item 4 — a stale _DONE
    # fixture was silently reused across --epoch-chunk values)
    fx = args.fixture_root or (
        f"/tmp/cdc_probe_fixture_r{n_rows}_e{args.events}_p{args.epochs}"
        f"_c{args.epoch_chunk}")
    root = args.table_root or f"/dev/shm/cdc_probe_table_{args.partitions}"

    ensure_fixture(fx, n_rows, args.events, args.epochs, args.epoch_chunk)

    import ray

    init_kw = dict(address="local", num_cpus=args.cpus,
                   include_dashboard=False)
    if args.object_store_gb:
        init_kw["object_store_memory"] = int(args.object_store_gb * (1 << 30))
    ray.init(**init_kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from marc_data_migration_ray.config import ReplayConfig
    from marc_data_migration_ray.pipelines.replay import Replayer

    # warm the page cache over the fixture (bench.py protocol): measure
    # compute, not first-touch virtual-disk reads
    t0 = time.perf_counter()
    for dirpath, _, files in os.walk(fx):
        for fn in files:
            if fn.endswith(".parquet"):
                with open(os.path.join(dirpath, fn), "rb") as f:
                    while f.read(1 << 24):
                        pass
    log({"phase": "page_cache_warm", "sec": round(time.perf_counter() - t0, 1)})

    cfg_kw = {}
    if args.fold_split_bytes is not None:
        cfg_kw["fold_split_bytes"] = args.fold_split_bytes
    cfg = ReplayConfig(num_partitions=args.partitions,
                       precollapse_updates=True, **cfg_kw)
    shutil.rmtree(root, ignore_errors=True)
    rp = Replayer(root, cfg, base_path=os.path.join(fx, "base"))
    t0 = time.perf_counter()
    rp._ensure_bucketized_base()
    t_bucketize = time.perf_counter() - t0
    log({"phase": "bucketize", "sec": round(t_bucketize, 1)})
    # bench.py warm-up: worker pool + a tiny Ray Data round trip, no
    # lingering multi-GB fold output (BASELINE.md warm-up gotcha)
    rp.lookup(["1"]).count()
    import pyarrow as pa

    ray.data.from_arrow(pa.table({"x": list(range(64))})).map_batches(
        lambda t: t, batch_format="pyarrow").count()

    t0 = time.perf_counter()
    for e in range(args.epochs):
        te = time.perf_counter()
        rep = rp.apply_epoch(e, os.path.join(fx, "binlog", f"epoch={e}"))
        log({"phase": "ingest_epoch", "epoch": e,
             "events": rep["processed"],
             "sec": round(time.perf_counter() - te, 1)})
    t1 = time.perf_counter()
    # one fold execution yields the row count AND the run counters —
    # fold_splits is the engaged-auto-split evidence (VERDICT r4 item 7)
    fm = rp.fold_metrics()
    n_final = fm["rows"]
    t2 = time.perf_counter()

    # spill evidence: the raylet logs a cumulative "Spilled N MiB" line
    # whenever object-store pressure pushed objects to disk
    spill = {"spilled": None}
    try:
        session_dir = ray._private.worker._global_node.get_session_dir_path()
        with open(os.path.join(session_dir, "logs", "raylet.out")) as f:
            for line in f:
                if "Spilled" in line:
                    spill["spilled"] = line.split("Spilled", 1)[1].split(
                        ". Set", 1)[0].strip()
    except Exception:
        pass

    out = {
        "metric": "scale_probe",
        "events": args.events,
        "base_rows": n_rows,
        "num_partitions": args.partitions,
        "num_cpus": args.cpus,
        "object_store_gb": args.object_store_gb,
        "bucketize_sec": round(t_bucketize, 1),
        "ingest_sec": round(t1 - t0, 1),
        "fold_sec": round(t2 - t1, 1),
        "total_sec": round(t2 - t0, 1),
        "events_per_sec": round(args.events / (t2 - t0), 1),
        "final_rows": n_final,
        "fold_splits": fm.get("fold_splits", 0),
        **spill,
    }
    log(out)
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
