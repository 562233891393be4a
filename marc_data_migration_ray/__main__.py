"""CLI entry point (analog of the reference's flag-dispatched
``processor.py``): ``python -m marc_data_migration_ray <cmd> ...``.

Commands:
  gen-fixture  — write a deterministic synthetic base+binlog fixture
  apply        — parse/gate/route one binlog epoch and commit it (fenced)
  state        — materialize current table state (print sample or write out)
  metrics      — fold metrics + manifest route counts
  compact      — LSM-merge committed deltas into a new base snapshot

Owns its Ray session (guarded init; the driver's ``__ray_entry__`` path
never goes through here).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def _cfg_from_args(args) -> "ReplayConfig":
    from marc_data_migration_ray.config import ReplayConfig

    return ReplayConfig(
        num_partitions=args.num_partitions,
        fuzzy_threshold=args.fuzzy_threshold,
        require_perfect=args.require_perfect,
        strategy=args.strategy,
        precollapse_updates=args.precollapse,
        policy_plugins=tuple(args.policy or ()),
    )


def _add_cfg_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--num-partitions", type=int, default=32, dest="num_partitions")
    p.add_argument("--fuzzy-threshold", type=int, default=50, dest="fuzzy_threshold")
    p.add_argument("--require-perfect", action="store_true", dest="require_perfect")
    p.add_argument("--strategy", choices=["replace_and_add", "replace_only"],
                   default="replace_and_add")
    p.add_argument("--precollapse", action="store_true",
                   help="within-batch LWW pre-collapse of hot-key updates")
    p.add_argument("--policy", action="append",
                   help="dotted path of an UpdatePolicy plugin (repeatable)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="marc_data_migration_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-fixture")
    g.add_argument("--root", required=True)
    g.add_argument("--rows", type=int, default=1000)
    g.add_argument("--events", type=int, default=5000)
    g.add_argument("--epochs", type=int, default=4)
    g.add_argument("--seed", type=int, default=7)

    a = sub.add_parser("apply")
    a.add_argument("--table", required=True)
    a.add_argument("--epoch", type=int, required=True)
    a.add_argument("--binlog", required=True)
    a.add_argument("--base", default=None)
    _add_cfg_args(a)

    st = sub.add_parser("state")
    st.add_argument("--table", required=True)
    st.add_argument("--out", default=None, help="write Parquet here instead of printing")
    st.add_argument("--limit", type=int, default=10)
    _add_cfg_args(st)

    m = sub.add_parser("metrics")
    m.add_argument("--table", required=True)
    _add_cfg_args(m)

    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    _add_cfg_args(c)

    args = ap.parse_args(argv)

    if args.cmd == "gen-fixture":
        from marc_data_migration_ray.sources import fixtures

        info = fixtures.write_fixture(
            args.root, n_rows=args.rows, n_events=args.events,
            n_epochs=args.epochs, seed=args.seed,
        )
        print(json.dumps(info))
        return 0

    ray = _ray_session()
    try:
        from marc_data_migration_ray.pipelines.replay import Replayer

        rp = Replayer(args.table, _cfg_from_args(args), base_path=getattr(args, "base", None))
        if args.cmd == "apply":
            entry = rp.apply_epoch(args.epoch, args.binlog)
            print(json.dumps({"epoch": args.epoch, **{k: v for k, v in entry.items() if k != "dir"}}))
        elif args.cmd == "state":
            ds = rp.read_state()
            if args.out:
                ds.write_parquet(args.out)
                print(json.dumps({"rows": ds.count(), "out": args.out}))
            else:
                rows = ds.take(args.limit)
                for r in rows:
                    r = dict(r)
                    if r.get("tokens") is not None:
                        r["tokens"] = list(r["tokens"])[:8] + (["..."] if len(r["tokens"]) > 8 else [])
                    print(json.dumps(r, default=str))
                print(json.dumps({"total_rows": ds.count()}))
        elif args.cmd == "metrics":
            print(json.dumps(rp.fold_metrics()))
        elif args.cmd == "compact":
            path = rp.compact()
            print(json.dumps({"compacted_to": path}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
