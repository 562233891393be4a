"""Policy-plugin surface (reference P13) + multimodal plumbing tests."""

import os

import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines import multimodal
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.stages.policy import load_policy


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pol_fixture"))
    fixtures.write_fixture(root, n_rows=100, n_events=400, n_epochs=2, seed=77,
                           schema_change_frac=0.0)
    return root


def test_load_policy_dynamic():
    p = load_policy("marc_data_migration_ray.plugins.sample_policy")
    assert p.column_moves() == {"candidate_key": "candidate_key_local"}


def test_policy_applied_in_read_state(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(
        num_partitions=4,
        policy_plugins=("marc_data_migration_ray.plugins.sample_policy",),
    )
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    rows = rp.read_state().take_all()
    names = set(rows[0].keys())
    assert "local_note" in names          # P8-analog execute_batch
    assert "online" in names              # M10-analog route flag
    assert "candidate_key_local" in names  # U7-analog column move
    assert "candidate_key" not in names
    for r in rows:
        assert r["online"] == (r["source"] in ("web", "wiki") if r["source"] else False)
        if r["status"] == "local":
            assert r["local_note"] == "local"


def test_media_decode_pipeline(ray_session):
    out = multimodal.decode_pipeline(n_rows=64).take_all()
    assert len(out) == 64
    assert all(len(r["features"]) == multimodal.MediaDecoder.FEATURE_DIM for r in out)
    # deterministic: same content → same features
    out2 = multimodal.decode_pipeline(n_rows=64).take_all()
    a = sorted(out, key=lambda r: r["media_id"])
    b = sorted(out2, key=lambda r: r["media_id"])
    assert all(list(x["features"]) == list(y["features"]) for x, y in zip(a, b))


def test_media_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.MediaDecoder(decoder="real")


def test_frame_sampler(ray_session):
    out = multimodal.frame_sample_pipeline(n_rows=64).take_all()
    assert len(out) >= 64  # videos expand to ≥1 frame rows
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all(r["frame_ms"] % 10000 == 0 for r in vids)
