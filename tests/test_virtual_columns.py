"""Generated (virtual) columns: manifest-registered polars-SQL expressions
materialized at every state read — Delta generated-column analog, applied
at read time like policy plugins (a table PROPERTY, not epoch data)."""

import os

import pandas as pd
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 2


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vc_fixture"))
    fixtures.write_fixture(root, n_rows=200, n_events=1200, n_epochs=N_EPOCHS,
                           seed=5, schema_change_frac=0.0)
    return root


def _replay(fixture_dir, root, cfg):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_generated_column_materializes_and_persists(ray_session, fixture_dir,
                                                    tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "t"), cfg)
    before = _df(rp.read_state())
    rp.set_virtual_column("tok_score", "n_tok * 3 + 7", inputs=["n_tok"])
    full = _df(rp.read_state())
    assert (full["tok_score"] == full["n_tok"] * 3 + 7).all()
    # a reopened Replayer sees the definition (manifest-persisted)
    rp2 = Replayer(str(tmp_path / "t"), cfg)
    assert rp2.virtual_columns() == [
        {"name": "tok_score", "expr": "n_tok * 3 + 7", "inputs": ["n_tok"]}
    ]
    assert "tok_score" in _df(rp2.read_state()).columns
    # drop restores the original schema exactly
    rp.drop_virtual_column("tok_score")
    pd.testing.assert_frame_equal(_df(rp.read_state()), before)


def test_generated_column_with_projection_pushdown(ray_session, fixture_dir,
                                                   tmp_path):
    """Requesting a generated column pulls its DECLARED inputs into the
    pruned fold; everything else (tokens!) stays pruned."""
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "p"), cfg)
    rp.set_virtual_column("tok_score", "n_tok * 3 + 7", inputs=["n_tok"])
    full = _df(rp.read_state())
    proj = _df(rp.read_state(columns=["doc_id", "tok_score"]))
    pd.testing.assert_frame_equal(proj, full[["doc_id", "tok_score"]])
    # string-input generated column: source must enter the pruned fold
    rp.set_virtual_column("src_tag", "source || '!'", inputs=["source"])
    proj2 = _df(rp.read_state(columns=["doc_id", "src_tag"]))
    assert (proj2["src_tag"] == full["source"] + "!").all()
    # lookup applies generated columns too
    ids = full["doc_id"].head(4).tolist()
    lk = _df(rp.lookup(ids, columns=["doc_id", "tok_score"]))
    pd.testing.assert_frame_equal(
        lk, full[full["doc_id"].isin(ids)][["doc_id", "tok_score"]]
        .reset_index(drop=True))


def test_generated_column_validation(ray_session, fixture_dir, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "v"), cfg)
    with pytest.raises(ValueError, match="already exists"):
        rp.set_virtual_column("n_tok", "1", inputs=[])
    with pytest.raises(ValueError, match="not in schema"):
        rp.set_virtual_column("x", "1", inputs=["nope"])
    rp.set_virtual_column("x", "n_tok + 1", inputs=["n_tok"])
    with pytest.raises(ValueError, match="already exists"):
        rp.set_virtual_column("x", "n_tok + 2", inputs=["n_tok"])
    with pytest.raises(ValueError, match="unknown columns"):
        rp.read_state(columns=["doc_id", "y"])
