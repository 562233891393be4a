"""Projection pushdown: ``read_state(columns=...)`` / ``lookup(columns=...)``
prune unrequested payload columns at the parquet scan AND inside the fold,
yet return rows bit-identical to a full read's projection.

Why this is safe (and what these tests pin down): per-column LWW is
independent per column, and row MEMBERSHIP — anchors, tombstones, local-id
allocation, lineage (last_lsn/status) — never reads payload values. So a
pruned fold must agree exactly with ``read_state().select(columns)`` under
every layout variation: salting, DDL renames/adds, both replace strategies,
LSN-level time travel, and policy plugins (which disable the pushdown but
keep the projection semantics).
"""

import os

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures

N_EPOCHS = 2


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proj_fixture"))
    # schema_change_frac > 0: renames + added columns exercise the
    # display-name resolution and the extra_json carrier pruning
    fixtures.write_fixture(root, n_rows=250, n_events=1600, n_epochs=N_EPOCHS,
                           seed=11, schema_change_frac=0.02)
    return root


def _replay(fixture_dir, root, cfg):
    rp = Replayer(root, cfg, base_path=os.path.join(fixture_dir, "base"))
    for e in range(N_EPOCHS):
        rp.apply_epoch(e, os.path.join(fixture_dir, "binlog", f"epoch={e}"))
    return rp


def _df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("salts", [1, 2])
def test_projected_read_equals_full_select(ray_session, fixture_dir, tmp_path,
                                           salts):
    import pandas as pd

    cfg = ReplayConfig(num_partitions=8, num_salts=salts)
    rp = _replay(fixture_dir, str(tmp_path / f"t{salts}"), cfg)
    full = _df(rp.read_state())
    names = list(full.columns)
    # scalar-only (token payload pruned), renamed display name, DDL-added
    # column, full set, and a no-doc_id projection
    for cs in ([ "doc_id", "n_tok"], ["doc_id", names[3], names[-1]],
               names, [names[4], "doc_id"]):
        proj = rp.read_state(columns=cs).to_pandas()
        proj = proj.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(proj, full[cs].reset_index(drop=True))


def test_projection_composes_with_time_travel(ray_session, fixture_dir,
                                              tmp_path):
    import pandas as pd

    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "tt"), cfg)
    evs = []
    for e in range(N_EPOCHS):
        d = os.path.join(fixture_dir, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            evs += pq.read_table(os.path.join(d, f)).to_pylist()
    cut = max(e["lsn"] for e in evs) // 2
    full = _df(rp.read_state(up_to_lsn=cut))
    cs = ["doc_id", "n_tok", "last_lsn"]
    proj = _df(rp.read_state(up_to_lsn=cut, columns=cs))
    pd.testing.assert_frame_equal(proj, full[cs])


def test_projected_lookup(ray_session, fixture_dir, tmp_path):
    import pandas as pd

    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "lk"), cfg)
    full = _df(rp.read_state())
    ids = full["doc_id"].head(6).tolist() + ["no-such-key"]
    cs = ["doc_id", list(full.columns)[2]]
    proj = _df(rp.lookup(ids, columns=cs))
    ref = _df(rp.lookup(ids))[cs]
    pd.testing.assert_frame_equal(proj, ref)


def test_replace_only_strategy_pruned(ray_session, fixture_dir, tmp_path):
    """replace_only gates a column write on the anchor HAVING the column —
    the pruned fold must evaluate that gate only for requested columns and
    still match the full fold."""
    import pandas as pd

    cfg = ReplayConfig(num_partitions=8, strategy="replace_only")
    rp = _replay(fixture_dir, str(tmp_path / "ro"), cfg)
    full = _df(rp.read_state())
    cs = ["doc_id", "n_tok"]
    proj = _df(rp.read_state(columns=cs))
    pd.testing.assert_frame_equal(proj, full[cs])


def test_projection_with_policy_plugins(ray_session, tmp_path_factory,
                                        tmp_path):
    """Policy plugins may read any column → pushdown is disabled, but the
    projection must still apply (post-policy) and match the full read —
    including POLICY-CREATED columns, which a pushdown-validated read
    could never know about."""
    import pandas as pd

    # DDL-free fixture: the sample policy reads `source` by name
    fdir = str(tmp_path_factory.mktemp("proj_policy_fixture"))
    fixtures.write_fixture(fdir, n_rows=200, n_events=1200, n_epochs=N_EPOCHS,
                           seed=13, schema_change_frac=0.0)
    cfg = ReplayConfig(
        num_partitions=8,
        policy_plugins=("marc_data_migration_ray.plugins.sample_policy",),
    )
    rp = _replay(fdir, str(tmp_path / "pp"), cfg)
    full = _df(rp.read_state())
    assert "local_note" in full.columns  # policy-added
    cs = ["doc_id", "source", "local_note"]
    proj = _df(rp.read_state(columns=cs))
    pd.testing.assert_frame_equal(proj, full[cs])


def test_unknown_and_duplicate_columns_raise(ray_session, fixture_dir,
                                             tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = _replay(fixture_dir, str(tmp_path / "err"), cfg)
    with pytest.raises(ValueError, match="unknown columns"):
        rp.read_state(columns=["doc_id", "nope"])
    with pytest.raises(ValueError, match="duplicate"):
        rp.read_state(columns=["doc_id", "doc_id"])
    # canonical names hidden by a rename are NOT addressable
    st = rp.read_state()
    names = set(st.schema().names)
    renamed_away = {"tokens", "n_tok", "source"} - names
    for c in renamed_away:
        with pytest.raises(ValueError, match="unknown columns"):
            rp.read_state(columns=[c])


def test_pruned_scan_skips_token_bytes(ray_session, fixture_dir, tmp_path):
    """The pushdown is physical, not cosmetic: a scalar projection must
    not decode the token column. Asserted structurally — the pruned fold
    input columns exclude ``tokens``."""
    from marc_data_migration_ray.stages.fold import fold_input_columns

    cols = fold_input_columns(payload_cols=("n_tok",))
    assert "tokens" not in cols and "extra_json" not in cols
    assert "n_tok" in cols and "key" in cols and "lsn" in cols
    # an added-column projection keeps the extra_json carrier
    cols2 = fold_input_columns(payload_cols=("extra_19",))
    assert "extra_json" in cols2 and "tokens" not in cols2
