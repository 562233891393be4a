"""Site-policy plugin (reference P1-P5, P7, P9-P12): kernels vs an
independent scalar Python mirror, and the plugin enabled inside a real
manifest replay (fold → policy chain → final rows vs oracle+mirror)."""

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray import oracle
from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.functions.site_policy import (
    LITERAL_LOCATIONS,
    LOCATION_RULES,
    ONLINE_MARKERS,
)
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.plugins.site_policy import UpdatePolicy

PLUGIN = "marc_data_migration_ray.plugins.site_policy"


# ------------------------------------------------------------- mirror --
def _keyer(cn):
    if cn is None:
        return None
    low = cn.lower()
    for rx, code in LOCATION_RULES:
        if re.search(rx, low):
            return code
    return None


def mirror(note, call_number=None, phys_desc=None):
    """Row-at-a-time mirror of the plugin chain (independent of Arrow)."""
    online_type = None
    if note is not None:
        for marker, label in ONLINE_MARKERS:
            if marker in note:
                online_type = label
                break
    cn = call_number
    if cn is None and note is not None:
        m = re.search(r"(?:^|\|)Shelf:([^|]+)", note)
        cn = m.group(1) if m else None
    lit = None
    if note is not None:
        m = re.search(r"(?:^|\|)Loc:([^|]+)", note)
        if m:
            lit = LITERAL_LOCATIONS.get(m.group(1))
    location = None if online_type else (lit if lit else _keyer(cn))
    inv = fund = pol = None
    if note is not None:
        m = re.search(r"(?:^|\|)Inventory:(\d{2})/(\d{2})/(\d{4,5})", note)
        if m:
            inv = m.group(3) + m.group(1) + m.group(2)
        m = re.search(r"(?:^|\|)(Fund[^|]*)", note)
        if m:
            fund = "PNCA " + m.group(1)
        if re.search(r"(?:^|\|)Policy:LIB", note):
            pol = "PNOCIRC"
    out = {
        "location": location,
        "inventory_date": inv,
        "fund": fund,
        "item_policy": pol,
        "online_type": online_type,
        "online": online_type is not None,
        "n_local_fields": sum(x is not None for x in (location, inv, fund, pol)),
    }
    if phys_desc is not None and cn is not None:
        cl, pl = cn.lower(), phys_desc.lower()
        out["mat_conflict_audio"] = (
            "audio" in pl and "cdrom" not in cl and "cd-rom" not in cl
            and not re.match(r"^cd\s", cl)
        )
        out["mat_conflict_video"] = (
            "video" in cl and "videocassette" not in pl and "videorecording" not in pl
        )
        out["mat_conflict_dvd"] = "dvd" in cl and "videodisc" not in pl and "dvd" not in pl
        clear = "cd-rom" in pl or "cdrom" in pl or "optical" in pl
        out["mat_conflict_cdrom"] = "cdrom" in cl and not clear
        out["mat_conflict_cd_rom"] = "cd-rom" in cl and not clear
    return out


NOTES = [
    "Shelf:dvd 12|Inventory:03/15/2021|Fund:Art|Policy:LIB USE ONLY",
    "Shelf:over 9|Note:EBOOK shelf",
    "Loc:1st Floor CDs|Shelf:cd 4",
    "Loc:OVERSIZE PERIODICALS|Shelf:periodical v3",
    "Shelf:NA123",
    "Shelf:NE4|Fund:FundX",
    "Shelf:new 77|Inventory:12/01/1999",
    "Note:STREAMING VIDEO reel|Shelf:video 5",
    "Note:ONLINE PERIODICAL x",
    "Shelf:x-unmappable",
    "Shelf:headphone 3|Policy:LIB",
    "plain source string",
    None,
    "Shelf:spec over 8",
    "Shelf:Z99|Inventory:06/30/20211",  # 5-digit year quirk (reference \\d{4,5})
]


def test_execute_batch_matches_scalar_mirror():
    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(NOTES))]),
                  "note_852": pa.array(NOTES, pa.string())})
    out = UpdatePolicy().execute_batch(t)
    rows = out.to_pylist()
    for i, r in enumerate(rows):
        want = mirror(NOTES[i])
        for k in ("location", "inventory_date", "fund", "item_policy", "online_type",
                  "n_local_fields"):
            assert r[k] == want[k], (i, k, r[k], want[k])


def test_mat_type_and_dup100_kernels():
    t = pa.table(
        {
            "doc_id": pa.array(["1", "2", "3", "4"]),
            "call_number": pa.array(["video 2", "cd 1", "dvd 3", "cdrom 9"]),
            "phys_desc": pa.array(["xii p.", "1 audio disc", "1 videodisc (DVD)", "booklet"]),
            "author": pa.array(["Smith, J.", "Doe, A. · lang=fr", None, "Poe"]),
            "uniform_lang": pa.array(["eng", "ger", "spa", None]),
        }
    )
    out = UpdatePolicy().execute_batch(t).to_pylist()
    for i, r in enumerate(out):
        want = mirror(None, call_number=t["call_number"][i].as_py(),
                      phys_desc=t["phys_desc"][i].as_py())
        for k in [c for c in want if c.startswith("mat_")]:
            assert r[k] == want[k], (i, k)
    # P7: lang merged into author when both present and author lacks one
    assert out[0]["author"] == "Smith, J. · lang=eng" and out[0]["uniform_lang"] is None
    assert out[1]["author"] == "Doe, A. · lang=fr" and out[1]["uniform_lang"] is None
    assert out[2]["author"] is None and out[2]["uniform_lang"] == "spa"
    assert out[3]["author"] == "Poe" and out[3]["uniform_lang"] is None


def test_drop_and_note900_cleanup():
    t = pa.table(
        {
            "doc_id": pa.array(["1", "2"]),
            "f035": pa.array(["(OCoLC)1", "(OCoLC)2"]),
            "note_900": pa.array(["has value", ""]),
        }
    )
    out = UpdatePolicy().execute_batch(t)
    assert "f035" not in out.column_names  # P9
    assert out["note_900"].to_pylist() == ["has value", None]  # P10


# --------------------------------------------------- replay integration --
@pytest.fixture(scope="module")
def policy_fixture(tmp_path_factory):
    """Tiny base+binlog whose ``source`` payload carries structured notes."""
    root = str(tmp_path_factory.mktemp("policy_fix"))
    n = 60
    base = pa.table(
        {
            "doc_id": pa.array([str(1000 + i) for i in range(n)]),
            "tokens": pa.array([[i] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array([NOTES[i % len(NOTES)] for i in range(n)], pa.string()),
        }
    )
    os.makedirs(os.path.join(root, "base"))
    pq.write_table(base, os.path.join(root, "base", "part-0.parquet"))
    ev = pa.table(
        {
            "lsn": pa.array(range(1, n + 1), pa.int64()),
            "epoch": pa.array([0] * n, pa.int32()),
            "op": pa.array(
                ["update" if i % 3 else "insert" for i in range(n)], pa.string()
            ),
            "doc_id": pa.array([str(1000 + (i * 7) % (n + 20)) for i in range(n)]),
            "tokens": pa.array([[i, i] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": pa.array(
                [NOTES[(i * 5) % len(NOTES)] for i in range(n)], pa.string()
            ),
            "column_mask": pa.array([[] for _ in range(n)], pa.list_(pa.string())),
            "match_score": pa.array([100 if i % 2 else 60 for i in range(n)], pa.int32()),
            "schema_kind": pa.nulls(n, pa.string()),
            "schema_name": pa.nulls(n, pa.string()),
            "schema_new_name": pa.nulls(n, pa.string()),
        }
    )
    os.makedirs(os.path.join(root, "binlog", "epoch=0"))
    pq.write_table(ev, os.path.join(root, "binlog", "epoch=0", "part-0.parquet"))
    return root


def test_replay_with_site_policy_plugin(ray_session, policy_fixture, tmp_path):
    """Full manifest replay with the plugin in cfg.policy_plugins: final
    rows equal oracle rows + the scalar mirror of the policy chain."""
    cfg = ReplayConfig(num_partitions=4, policy_plugins=(PLUGIN,))
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(policy_fixture, "base"))
    rp.apply_epoch(0, os.path.join(policy_fixture, "binlog", "epoch=0"))
    got = sorted(rp.read_state().take_all(), key=lambda r: r["doc_id"])

    base_rows = pq.read_table(os.path.join(policy_fixture, "base")).to_pylist()
    events = pq.read_table(
        os.path.join(policy_fixture, "binlog", "epoch=0", "part-0.parquet")
    ).to_pylist()
    o = oracle.replay(base_rows, events, cfg)
    assert len(got) == len(o["final"])
    for g, w in zip(got, o["final"]):
        assert g["doc_id"] == w["doc_id"]
        assert g["source"] == w["source"]
        assert list(g["tokens"] or []) == list(w["tokens"] or [])
        m = mirror(w["source"])
        for k in ("location", "inventory_date", "fund", "item_policy",
                  "online_type", "online", "n_local_fields"):
            assert g[k] == m[k], (g["doc_id"], k, g[k], m[k])
