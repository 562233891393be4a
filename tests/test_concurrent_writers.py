"""True multi-process concurrency: two OS processes commit epochs against
one table root at the same time — including racing on the SAME epoch —
and the manifest CAS must keep exactly-once semantics (every epoch
committed once, final state == oracle, fsck green).

In-process CAS conflicts are covered in test_manifest; this drives the
actual cross-process path (hardlink CAS + reload-retry) the multi-writer
design claims.
"""

import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 4

_WORKER = """
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
root, fdir, base = sys.argv[1], sys.argv[2], sys.argv[3]
epochs = [int(e) for e in sys.argv[4].split(",")]
rp = Replayer(root, ReplayConfig(num_partitions=4), base_path=base)
import os
for e in epochs:
    rp.apply_epoch(e, os.path.join(fdir, "binlog", f"epoch={e}"))
print("done", epochs)
ray.shutdown()
"""


@pytest.mark.parametrize("split", [
    ("0,2", "1,3"),          # disjoint interleaved epochs
    ("0,1,2,3", "0,1,2,3"),  # full overlap: every epoch raced
])
def test_two_processes_commit_concurrently(ray_session, tmp_path, split):
    fdir = str(tmp_path / "fx")
    fixtures.write_fixture(fdir, n_rows=80, n_events=400, n_epochs=N_EPOCHS,
                           seed=71)
    root = str(tmp_path / "t")
    base = os.path.join(fdir, "base")
    env = dict(os.environ, RAY_ADDRESS="", PYTHONPATH="/root/repo")

    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, root, fdir, base, eps],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for eps in split
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]

    rp = Replayer(root, ReplayConfig(num_partitions=4))
    assert rp.manifest.committed_epochs() == list(range(N_EPOCHS))
    # no duplicated data: state equals the one-shot oracle
    events = []
    for e in range(N_EPOCHS):
        d = os.path.join(fdir, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            events += pq.read_table(os.path.join(d, f)).to_pylist()
    o = oracle.replay(pq.read_table(base).to_pylist(), events,
                      ReplayConfig(num_partitions=4))
    eng = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
    want = sorted(o["final"], key=lambda r: r["doc_id"])
    assert len(eng) == len(want)
    for a, b in zip(eng, want):
        assert a["doc_id"] == b["doc_id"]
        assert list(a["tokens"] or []) == list(b["tokens"] or [])
    assert rp.fsck()["ok"], rp.fsck()["problems"]
    # the losing writer's tmp dirs must not linger as committed data; any
    # leftover tmp is cleanable
    rp.cleanup_tmp()
    assert rp.fsck()["ok"]
