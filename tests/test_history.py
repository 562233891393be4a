"""``Replayer.history()`` — the DESCRIBE HISTORY / snapshots metadata table."""

import json
import os

import pyarrow.parquet as pq

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures


def test_history_records_all_operations(ray_session, tmp_path):
    fdir = str(tmp_path / "fx")
    fixtures.write_fixture(fdir, n_rows=60, n_events=300, n_epochs=2, seed=61,
                           invalid_key_frac=0.0)
    root = str(tmp_path / "t")
    rp = Replayer(root, ReplayConfig(num_partitions=4),
                  base_path=os.path.join(fdir, "base"))
    rp.apply_epoch(0, os.path.join(fdir, "binlog", "epoch=0"))
    rp.compact()
    rp.apply_epoch(1, os.path.join(fdir, "binlog", "epoch=1"))
    rp.repartition(6)
    rp.delete_where("n_tok < 10", epoch=5)

    h = rp.history().to_pylist()
    kinds = [r["kind"] for r in h]
    assert kinds.count("epoch") == 3  # 0, 1, and the delete epoch 5
    assert "compaction" in kinds and "repartition" in kinds
    rep = next(r for r in h if r["kind"] == "repartition")
    assert json.loads(rep["detail"])["to"] == [6, 1]
    # epochs carry lineage: per-route counts + lsn bounds
    e0 = next(r for r in h if r["kind"] == "epoch" and r["epoch"] == 0)
    assert e0["rows"] == 150 and e0["min_lsn"] >= 0 and e0["max_lsn"] >= e0["min_lsn"]
    assert sum(json.loads(e0["detail"]).values()) == 150
    # DDL events from the fixture appear as ddl:* rows when present
    n_ddl = len([r for r in h if r["kind"].startswith("ddl:")])
    assert n_ddl == len(rp.manifest.state["schema_ops"])
    # ordering is by log position
    keys = [r["max_lsn"] if r["max_lsn"] is not None else (r["min_lsn"] or -1)
            for r in h]
    assert keys == sorted(keys)
