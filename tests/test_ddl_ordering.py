"""Mid-stream DDL ordering (SEMANTICS §schema, VERDICT r1 item #7).

Column masks resolve AS OF the event's lsn: after ``rename_column(n_tok,
tok_count)`` a mask must say ``tok_count`` (the old name is a no-op), and
``add_column`` columns become writable by later masked updates via
``extra_json``. These tests interleave renames/adds with updates around
the DDL boundaries — exactly the cases the previous canonical-names-only
resolution would have misapplied — and check engine ≡ oracle plus
hand-computed expected values.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.stages.fold import fold_bucket
from marc_data_migration_ray.stages.parse import ParseRoute, PrepBase
from marc_data_migration_ray.state.schema_timeline import Timeline


def _ev(lsn, op, doc_id=None, n_tok=None, tokens=None, source=None,
        mask=(), score=100, kind=None, name=None, new=None, extra=None):
    return {
        "lsn": lsn, "epoch": 0, "op": op, "doc_id": doc_id,
        "tokens": tokens, "n_tok": n_tok, "source": source,
        "column_mask": list(mask), "match_score": score,
        "title": None, "match_title": None, "extra_json": extra,
        "schema_kind": kind, "schema_name": name, "schema_new_name": new,
    }


def _binlog_table(events):
    cols = {
        "lsn": pa.array([e["lsn"] for e in events], pa.int64()),
        "epoch": pa.array([e["epoch"] for e in events], pa.int32()),
        "op": pa.array([e["op"] for e in events], pa.string()),
        "doc_id": pa.array([e["doc_id"] for e in events], pa.string()),
        "tokens": pa.array([e["tokens"] for e in events], pa.list_(pa.int32())),
        "n_tok": pa.array([e["n_tok"] for e in events], pa.int32()),
        "source": pa.array([e["source"] for e in events], pa.string()),
        "column_mask": pa.array([e["column_mask"] for e in events], pa.list_(pa.string())),
        "match_score": pa.array([e["match_score"] for e in events], pa.int32()),
        "title": pa.array([e["title"] for e in events], pa.string()),
        "match_title": pa.array([e["match_title"] for e in events], pa.string()),
        "extra_json": pa.array([e["extra_json"] for e in events], pa.string()),
        "schema_kind": pa.array([e["schema_kind"] for e in events], pa.string()),
        "schema_name": pa.array([e["schema_name"] for e in events], pa.string()),
        "schema_new_name": pa.array([e["schema_new_name"] for e in events], pa.string()),
    }
    return pa.table(cols)


def _engine_rows(base_tbl, events, cfg):
    binlog = _binlog_table(events)
    parsed = pa.concat_tables([PrepBase(cfg)(base_tbl), ParseRoute(cfg)(binlog)])
    ops = sorted(
        (
            {"lsn": e["lsn"], "kind": e["schema_kind"], "name": e["schema_name"],
             "new_name": e["schema_new_name"]}
            for e in events if e["op"] == "schema_change"
        ),
        key=lambda o: o["lsn"],
    )
    out = fold_bucket(parsed, cfg, schema_ops=ops)
    rows = out.filter(pc.equal(out["_kind"], "row"))
    return sorted(rows.to_pylist(), key=lambda r: r["doc_id"]), ops


BASE = pa.table(
    {
        "doc_id": pa.array(["100", "200"]),
        "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1], pa.int32()),
        "source": pa.array(["web", "books"]),
    }
)


def test_mask_uses_post_rename_name():
    """rename(n_tok → tok_count) at lsn 5: a mask saying 'n_tok' at lsn 7
    is a NO-OP; a mask saying 'tok_count' at lsn 8 writes the column. The
    pre-DDL mask 'n_tok' at lsn 3 writes it."""
    cfg = ReplayConfig(num_partitions=1)
    events = [
        _ev(3, "update", "100", n_tok=3, mask=["n_tok"]),
        _ev(5, "schema_change", kind="rename_column", name="n_tok", new="tok_count"),
        _ev(7, "update", "100", n_tok=7, mask=["n_tok"]),       # stale name → no-op write
        _ev(8, "update", "200", n_tok=8, mask=["tok_count"]),   # new name → writes
    ]
    rows, ops = _engine_rows(BASE, events, cfg)
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id["100"]["n_tok"] == 3   # lsn 7's write did NOT land
    assert by_id["200"]["n_tok"] == 8   # lsn 8's write DID land
    o = oracle.replay(BASE.to_pylist(), events, cfg)
    ob = {r["doc_id"]: r for r in o["final"]}
    # oracle's final display name for n_tok is tok_count
    assert ob["100"]["tok_count"] == 3 and ob["200"]["tok_count"] == 8


def test_added_column_becomes_writable_and_renames():
    """add(extra_0) at lsn 4 → masked update at lsn 6 writes it (value via
    extra_json); a mask naming it BEFORE the add (lsn 2) is a no-op;
    rename(extra_0 → label) at lsn 8 → update at lsn 9 must mask 'label'."""
    cfg = ReplayConfig(num_partitions=1)
    events = [
        _ev(2, "update", "100", mask=["extra_0"], extra='{"extra_0":"early"}'),
        _ev(4, "schema_change", kind="add_column", name="extra_0"),
        _ev(6, "update", "100", mask=["extra_0"], extra='{"extra_0":"v6"}'),
        _ev(8, "schema_change", kind="rename_column", name="extra_0", new="label"),
        _ev(9, "update", "200", mask=["label"], extra='{"label":"v9"}'),
        _ev(10, "update", "200", mask=["extra_0"], extra='{"extra_0":"stale"}'),
    ]
    rows, ops = _engine_rows(BASE, events, cfg)
    by_id = {r["doc_id"]: r for r in rows}
    import json

    assert json.loads(by_id["100"]["extra_json"])["extra_0"] == "v6"
    assert json.loads(by_id["200"]["extra_json"])["extra_0"] == "v9"  # canonical key
    o = oracle.replay(BASE.to_pylist(), events, cfg)
    ob = {r["doc_id"]: r for r in o["final"]}
    assert ob["100"]["label"] == "v6"   # final display name after rename
    assert ob["200"]["label"] == "v9"
    tl = Timeline(ops)
    assert tl.added == ["extra_0"]
    assert tl.name_at("extra_0", 7) == "extra_0"
    assert tl.name_at("extra_0", 9) == "label"
    assert tl.name_at("extra_0", 3) is None  # before the add


@pytest.mark.parametrize("seed", [1404, 2808, 3412])
def test_random_ddl_interleaving_matches_oracle(seed):
    """Fixture-generated binlogs with frequent DDL: engine fold ≡ oracle
    including added-column values and as-of-lsn masks."""
    cfg = ReplayConfig(num_partitions=1 + seed % 8,
                       strategy="replace_only" if seed % 2 else "replace_and_add")
    base = fixtures.make_base_table(n_rows=60, seed=seed)
    binlog = fixtures.make_binlog(
        n_events=900, n_base_rows=60, seed=seed + 3,
        schema_change_frac=0.02, hot_keys=2, hot_frac=0.3,
    )
    events = binlog.to_pylist()
    o = oracle.replay(base.to_pylist(), events, cfg)
    ops = sorted(
        (
            {"lsn": e["lsn"], "kind": e["schema_kind"], "name": e["schema_name"],
             "new_name": e["schema_new_name"]}
            for e in events if e["op"] == "schema_change"
        ),
        key=lambda x: x["lsn"],
    )
    parsed = pa.concat_tables(
        [PrepBase(cfg)(base), ParseRoute(cfg)(binlog)]
    )
    out = fold_bucket(parsed, cfg, schema_ops=ops)
    rows = out.filter(pc.equal(out["_kind"], "row")).to_pylist()
    # materialize engine added columns from canonical extra_json like
    # read_state does, then apply display renames
    import json

    tl = Timeline(ops)
    final_schema, renames, added = _resolve(ops)
    got = []
    for r in rows:
        d = {k: r[k] for k in ("doc_id", "tokens", "n_tok", "source",
                               "last_lsn", "status", "candidate_key")}
        ex = json.loads(r["extra_json"]) if r["extra_json"] else {}
        for name in added:
            d[name] = ex.get(name)
        for canon, new in renames.items():
            if canon in d:
                d[new] = d.pop(canon)
        if d.get("tokens") is not None:
            d["tokens"] = list(d["tokens"])
        got.append(d)
    got.sort(key=lambda r: r["doc_id"])
    want = [
        {k: (list(v) if k == "tokens" and v is not None else v) for k, v in r.items()}
        for r in o["final"]
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)


def _resolve(ops):
    """Manifest.resolve_schema for driver-less tests (shared definition)."""
    from marc_data_migration_ray.state.schema_timeline import resolve_schema_ops

    return resolve_schema_ops(
        ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status",
         "candidate_key"], ops)


def test_replayer_end_to_end_with_ddl(ray_session, tmp_path):
    """Manifest path: DDL + masked updates through apply_epoch/read_state,
    salted and unsalted, equal to the oracle."""
    root = str(tmp_path / "fix")
    fixtures.write_fixture(root, n_rows=50, n_events=800, n_epochs=2, seed=99,
                           schema_change_frac=0.02)
    base_rows = pq.read_table(os.path.join(root, "base")).to_pylist()
    events = []
    for e in range(2):
        d = os.path.join(root, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            events += pq.read_table(os.path.join(d, f)).to_pylist()

    for salts, sub in ((1, "p"), (3, "s")):
        cfg = ReplayConfig(num_partitions=4, num_salts=salts)
        rp = Replayer(str(tmp_path / sub), cfg, base_path=os.path.join(root, "base"))
        for e in range(2):
            rp.apply_epoch(e, os.path.join(root, "binlog", f"epoch={e}"))
        o = oracle.replay(base_rows, events, cfg)
        got = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
        assert len(got) == len(o["final"])
        for g, w in zip(got, o["final"]):
            for k in set(g) | set(w):
                va, vb = g.get(k), w.get(k)
                if k == "tokens":
                    va = list(va) if va is not None else None
                    vb = list(vb) if vb is not None else None
                assert va == vb, (salts, g.get("doc_id"), k, va, vb)


def test_drop_column_removes_added_column_and_retires_name():
    """add(extra_0) → masked writes land → drop(extra_0): the column
    vanishes from the final schema, masks after the drop are no-ops, and a
    re-add of the retired name is a no-op (SEMANTICS §schema drops)."""
    cfg = ReplayConfig(num_partitions=1)
    events = [
        _ev(2, "schema_change", kind="add_column", name="extra_0"),
        _ev(3, "update", "100", mask=["extra_0"], extra='{"extra_0":"v3"}'),
        _ev(5, "schema_change", kind="drop_column", name="extra_0"),
        _ev(6, "update", "100", mask=["extra_0"], extra='{"extra_0":"late"}'),
        _ev(7, "schema_change", kind="add_column", name="extra_0"),  # retired → no-op
        _ev(8, "update", "200", mask=["extra_0"], extra='{"extra_0":"v8"}'),
    ]
    rows, ops = _engine_rows(BASE, events, cfg)
    tl = Timeline(ops)
    assert tl.added == ["extra_0"] and tl.dropped == {"extra_0"}
    assert tl.live_added() == []
    assert tl.name_at("extra_0", 4) == "extra_0"
    assert tl.name_at("extra_0", 6) is None  # after the drop
    schema, renames, added = _resolve(ops)
    assert "extra_0" not in schema and added == []
    o = oracle.replay(BASE.to_pylist(), events, cfg)
    assert o["schema"] == schema
    ob = {r["doc_id"]: r for r in o["final"]}
    assert "extra_0" not in ob["100"] and "extra_0" not in ob["200"]


def test_drop_of_base_payload_column_is_noop():
    """Base payload columns carry the token invariant — drop is a no-op,
    including via a renamed name."""
    cfg = ReplayConfig(num_partitions=1)
    events = [
        _ev(2, "schema_change", kind="drop_column", name="source"),
        _ev(4, "schema_change", kind="rename_column", name="source", new="src"),
        _ev(5, "schema_change", kind="drop_column", name="src"),
        _ev(6, "update", "100", source="news", mask=["src"]),
    ]
    rows, ops = _engine_rows(BASE, events, cfg)
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id["100"]["source"] == "news"  # column alive, write landed
    schema, renames, added = _resolve(ops)
    assert "src" in schema
    o = oracle.replay(BASE.to_pylist(), events, cfg)
    assert o["schema"] == schema
    assert {r["doc_id"]: r for r in o["final"]}["100"]["src"] == "news"


def test_drop_of_renamed_added_column_retires_both_names():
    """add(extra_0) → rename(extra_0→label) → drop(label): both names are
    retired; re-adding either is a no-op; pre-drop writes are gone from the
    final table."""
    cfg = ReplayConfig(num_partitions=1)
    events = [
        _ev(2, "schema_change", kind="add_column", name="extra_0"),
        _ev(3, "update", "100", mask=["extra_0"], extra='{"extra_0":"v3"}'),
        _ev(4, "schema_change", kind="rename_column", name="extra_0", new="label"),
        _ev(5, "schema_change", kind="drop_column", name="label"),
        _ev(6, "schema_change", kind="add_column", name="label"),    # no-op
        _ev(7, "schema_change", kind="add_column", name="extra_0"),  # no-op
    ]
    _rows, ops = _engine_rows(BASE, events, cfg)
    schema, renames, added = _resolve(ops)
    assert "label" not in schema and "extra_0" not in schema and added == []
    tl = Timeline(ops)
    assert tl.live_added() == []
    o = oracle.replay(BASE.to_pylist(), events, cfg)
    assert o["schema"] == schema


@pytest.mark.parametrize("seed", [7101, 7202])
def test_random_ddl_with_drops_matches_oracle(seed):
    """Fixture binlogs with add/rename/drop cycles: engine fold ≡ oracle
    row-for-row, including surviving added-column values."""
    cfg = ReplayConfig(num_partitions=1 + seed % 4,
                       strategy="replace_only" if seed % 2 else "replace_and_add")
    base = fixtures.make_base_table(n_rows=60, seed=seed)
    binlog = fixtures.make_binlog(
        n_events=900, n_base_rows=60, seed=seed + 3,
        schema_change_frac=0.03, hot_keys=2, hot_frac=0.3, with_drops=True,
    )
    events = binlog.to_pylist()
    kinds = {e["schema_kind"] for e in events if e["op"] == "schema_change"}
    assert "drop_column" in kinds, "fixture must actually exercise drops"
    o = oracle.replay(base.to_pylist(), events, cfg)
    ops = sorted(
        (
            {"lsn": e["lsn"], "kind": e["schema_kind"], "name": e["schema_name"],
             "new_name": e["schema_new_name"]}
            for e in events if e["op"] == "schema_change"
        ),
        key=lambda x: x["lsn"],
    )
    parsed = pa.concat_tables([PrepBase(cfg)(base), ParseRoute(cfg)(binlog)])
    out = fold_bucket(parsed, cfg, schema_ops=ops)
    rows = out.filter(pc.equal(out["_kind"], "row")).to_pylist()
    import json

    final_schema, renames, added = _resolve(ops)
    got = []
    for r in rows:
        d = {k: r[k] for k in ("doc_id", "tokens", "n_tok", "source",
                               "last_lsn", "status", "candidate_key")}
        ex = json.loads(r["extra_json"]) if r["extra_json"] else {}
        for name in added:
            d[name] = ex.get(name)
        for canon, new in renames.items():
            if canon in d:
                d[new] = d.pop(canon)
        if d.get("tokens") is not None:
            d["tokens"] = list(d["tokens"])
        got.append(d)
    got.sort(key=lambda r: r["doc_id"])
    want = [
        {k: (list(v) if k == "tokens" and v is not None else v) for k, v in r.items()}
        for r in o["final"]
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)


def test_replayer_end_to_end_with_drops(ray_session, tmp_path):
    """Manifest path with drops: apply_epoch/read_state ≡ oracle, dropped
    columns absent from the public schema."""
    root = str(tmp_path / "fix")
    fixtures.write_fixture(root, n_rows=50, n_events=800, n_epochs=2, seed=77,
                           schema_change_frac=0.03, with_drops=True)
    base_rows = pq.read_table(os.path.join(root, "base")).to_pylist()
    events = []
    for e in range(2):
        d = os.path.join(root, "binlog", f"epoch={e}")
        for f in sorted(os.listdir(d)):
            events += pq.read_table(os.path.join(d, f)).to_pylist()
    assert any(e["schema_kind"] == "drop_column" for e in events
               if e["op"] == "schema_change")

    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg, base_path=os.path.join(root, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(root, "binlog", f"epoch={e}"))
    o = oracle.replay(base_rows, events, cfg)
    assert rp.read_state().schema().names == o["schema"]
    got = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])
    assert len(got) == len(o["final"])
    for g, w in zip(got, o["final"]):
        for k in set(g) | set(w):
            va, vb = g.get(k), w.get(k)
            if k == "tokens":
                va = list(va) if va is not None else None
                vb = list(vb) if vb is not None else None
            assert va == vb, (g.get("doc_id"), k, va, vb)


def test_random_schema_op_sequences_resolver_invariants():
    """Property test over random DDL sequences (add/rename/drop with
    colliding, unknown and retired names): the shared resolver and the
    Timeline stay mutually consistent and structurally sane."""
    import random

    from marc_data_migration_ray.state.schema_timeline import (
        Timeline,
        resolve_schema_ops,
    )

    display = ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status",
               "candidate_key"]
    names = [f"c{i}" for i in range(6)] + ["source", "n_tok", "status"]
    rng = random.Random(424242)
    for _trial in range(300):
        ops = []
        for lsn in range(1, rng.randint(2, 25)):
            kind = rng.choice(["add_column", "rename_column", "drop_column"])
            op = {"lsn": lsn, "kind": kind, "name": rng.choice(names),
                  "new_name": rng.choice(names) if kind == "rename_column" else None}
            ops.append(op)
        schema, renames, added = resolve_schema_ops(display, ops)
        tl = Timeline(ops)
        # structural invariants
        assert len(schema) == len(set(schema)), (ops, schema)
        assert len(schema) == len(display) + len(added)
        assert schema[0] == "doc_id"
        # base display columns never vanish (drops are added-origin only)
        assert len([c for c in schema]) >= len(display)
        # resolver's live added set == timeline's (same canonical ids)
        assert added == tl.live_added(), (ops, added, tl.live_added())
        # every live added column's end-of-log visible name is in the schema
        for c in tl.live_added():
            nm = tl.name_at(c, 10**9)
            assert nm is not None and nm in schema, (ops, c, nm, schema)
        # dropped canonicals are invisible at end-of-log
        for c in tl.dropped:
            assert tl.name_at(c, 10**9) is None


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_resolve_schema_prefix_equals_from_scratch(seed):
    """resolve_schema_prefix (O(columns) from the FULL timeline) equals
    resolve_schema_ops rebuilt from scratch on every prefix — the as-of
    fast path resolves one schema per DDL prefix through it."""
    import random

    from marc_data_migration_ray.state.schema_timeline import (
        resolve_schema_ops, resolve_schema_prefix)

    rng = random.Random(seed)
    names = ["extra_a", "extra_b", "n_tok", "tok_count", "extra_c",
             "source", "doc_id", "extra_a2"]
    ops = []
    for i in range(40):
        kind = rng.choice(["add_column", "rename_column", "drop_column"])
        op = {"lsn": (i + 1) * 10, "kind": kind,
              "name": rng.choice(names)}
        if kind == "rename_column":
            op["new_name"] = rng.choice(names)
        ops.append(op)
    base = ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status",
            "candidate_key"]
    tl = Timeline(ops)
    for cut in [0, 5, 10, 15, 55, 105, 200, 399, 400, 401, 1000]:
        prefix = [o for o in ops if o["lsn"] <= cut]
        want = resolve_schema_ops(base, prefix)
        got = resolve_schema_prefix(base, tl, cut)
        assert got == want, (cut, got, want)


def test_rename_to_retired_name_is_noop():
    """Code-review r5: a dropped column's names are RETIRED for renames
    exactly as they are for add_column — resurrecting one would make an
    old delta's mask ambiguous under the new incarnation."""
    ops = [
        {"lsn": 2, "kind": "add_column", "name": "x", "new_name": None},
        {"lsn": 4, "kind": "rename_column", "name": "x", "new_name": "y"},
        {"lsn": 6, "kind": "drop_column", "name": "y", "new_name": None},
        # both the original and the renamed name are retired
        {"lsn": 8, "kind": "rename_column", "name": "tokens",
         "new_name": "x"},
        {"lsn": 10, "kind": "rename_column", "name": "tokens",
         "new_name": "y"},
    ]
    tl = Timeline(ops)
    assert tl.name_at("tokens", 11) == "tokens"  # both renames no-ops
    # and add_column agrees (the pre-existing rule)
    tl2 = Timeline(ops[:3] + [
        {"lsn": 8, "kind": "add_column", "name": "y", "new_name": None}])
    assert tl2.live_added() == []


def test_virtual_column_never_overwrites_physical(ray_session, tmp_path):
    """Code-review r5: if a later DDL lands a REAL column with a
    registered virtual column's name, the read-path generator must skip
    it (physical wins) instead of silently replacing the data."""
    import pyarrow.parquet as pq_

    root = str(tmp_path / "fx")
    fixtures.write_fixture(root, n_rows=40, n_events=200, n_epochs=1,
                           seed=5, schema_change_frac=0.0)
    cfg = ReplayConfig(num_partitions=2)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(root, "base"))
    rp.apply_epoch(0, os.path.join(root, "binlog", "epoch=0"))
    rp.set_virtual_column("vscore", "n_tok * 2", ["n_tok"])
    want = {r["doc_id"]: r["vscore"] for r in rp.read_state(
        columns=["doc_id", "vscore"]).take_all()}
    assert want and all(v is not None for v in want.values())
    # simulate the collision: a schema op adds a physical 'vscore'
    rp.manifest._cas_update(lambda st: st["schema_ops"].append(
        {"lsn": 10**9, "kind": "add_column", "name": "vscore",
         "new_name": None, "epoch": 0}))
    rp2 = Replayer(str(tmp_path / "t"), cfg)
    rows = rp2.read_state().take_all()
    # the physical column exists (all-null: no event wrote it) and the
    # generator did NOT overwrite it with the expression
    assert all(r["vscore"] is None for r in rows)
