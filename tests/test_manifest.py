"""Manifest / transaction-log unit tests (no Ray)."""

from marc_data_migration_ray.state.manifest import Manifest


def test_commit_and_fence(tmp_path):
    m = Manifest(str(tmp_path))
    assert m.commit_epoch(0, {"rows": 10}) is True
    assert m.commit_epoch(0, {"rows": 999}) is False  # fenced
    m2 = Manifest(str(tmp_path))  # reload from disk
    assert m2.epoch_entry(0) == {"rows": 10}
    assert m2.committed_epochs() == [0]


def test_atomic_save_survives_reload(tmp_path):
    m = Manifest(str(tmp_path))
    m.commit_epoch(3, {"rows": 1})
    m.commit_epoch(1, {"rows": 2})
    assert Manifest(str(tmp_path)).committed_epochs() == [1, 3]


def test_schema_resolution_chain(tmp_path):
    m = Manifest(str(tmp_path))
    m.record_schema_ops(
        [
            {"lsn": 1, "kind": "add_column", "name": "x", "new_name": None},
            {"lsn": 2, "kind": "rename_column", "name": "source", "new_name": "origin"},
            {"lsn": 3, "kind": "rename_column", "name": "x", "new_name": "y"},
            {"lsn": 4, "kind": "rename_column", "name": "missing", "new_name": "z"},  # no-op
            {"lsn": 5, "kind": "add_column", "name": "y", "new_name": None},  # no-op (exists)
        ]
    )
    schema, renames, added = m.resolve_schema(["doc_id", "source"])
    assert schema == ["doc_id", "origin", "y"]
    assert renames == {"source": "origin", "x": "y"}
    assert added == ["x"]


def test_schema_ops_dedup_on_lsn(tmp_path):
    m = Manifest(str(tmp_path))
    op = {"lsn": 7, "kind": "add_column", "name": "a", "new_name": None}
    m.record_schema_ops([op])
    m.record_schema_ops([op])  # duplicate delivery
    assert len(m.state["schema_ops"]) == 1


def test_compaction_offsets(tmp_path):
    m = Manifest(str(tmp_path))
    m.commit_epoch(0, {"rows": 1})
    m.commit_epoch(1, {"rows": 1})
    m.record_compaction(0, "/x/base2", {3: 2, 5: 1})
    assert m.active_epochs() == [1]
    assert m.local_id_offsets() == {3: 2, 5: 1}
    m.record_compaction(1, "/x/base3", {3: 1})
    assert m.local_id_offsets() == {3: 3, 5: 1}
    assert m.state["base_path"] == "/x/base3"
