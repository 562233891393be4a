"""Driver queries exercising the site-policy plugin chain (reference
P1-P5, P7, P9-P12) against DuckDB CASE/regexp oracles.

Inputs are synthesized deterministically from ``documents.doc_id`` with
arithmetic expressible identically in SQL; the engine side runs the REAL
plugin (``plugins/site_policy.py``) through the same ``_PolicyStage``
actor-pool stage the replay pipeline uses, so the driver correctness gate
exercises the production code path.

The SQL-fragment builders at the bottom generate the oracle CASE
expressions **from the same constants the kernels use**
(``functions/site_policy.LOCATION_RULES`` etc.), so engine and oracle
cannot drift.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.functions.site_policy import (
    FUND_RE,
    INVENTORY_RE,
    LITERAL_LOCATIONS,
    LOC_RE,
    LOCATION_RULES,
    ONLINE_MARKERS,
    POLICY_RE,
)
from marc_data_migration_ray.stages.policy import _PolicyStage
from marc_data_migration_ray.sources import readers

_PLUGIN = "marc_data_migration_ray.plugins.site_policy"

#: call-number synthesis templates by doc_id % 20 — covers every keyer rule
#: class (prefix specials, the n-family, first-char fallbacks, unmapped).
CN_TEMPLATES = (
    "NA{i}", "NE{i}", "QA76.{i}", "over {i}", "spec over {i}",
    "periodical v.{i}", "thesis {i}", "games {i}", "archive box {i}",
    "spec {i}", "dvd {i}", "zine {i}", "new {i}", "asc {i}", "video {i}",
    "perm {i}", "headphone {i}", "B{i}", "Z{i}", "x-{i}",
)

#: mat-type synthesis templates (call number by %6, phys desc by %5).
MAT_CN_TEMPLATES = ("cd {i}", "cdrom {i}", "cd-rom box {i}", "dvd {i}", "video {i}", "QA{i}")
MAT_PD_TEMPLATES = (
    "1 audio disc", "2 videocassettes", "1 videodisc (DVD)",
    "CD-ROM with booklet", "xii, 300 p.",
)


def _docs_ids(sf_dir: str) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )


def _ids_str(t: pa.Table) -> pa.Array:
    return pc.cast(t["doc_id"], pa.string())


def _select_template(ids_i64: pa.Array, templates, mod: int) -> pa.Array:
    """Vectorized template fill: doc_id % mod picks the template."""
    s = pc.cast(ids_i64, pa.string())
    form = pc.cast(pc.subtract(ids_i64, pc.multiply(pc.divide(ids_i64, mod), mod)), pa.int64())
    out = pa.nulls(len(s), pa.string())
    for k, tmpl in enumerate(templates):
        pre, _, post = tmpl.partition("{i}")
        if "{i}" in tmpl:
            val = pc.binary_join_element_wise(
                pa.scalar(pre, pa.string()), s, pa.scalar(post, pa.string()),
                pa.scalar("", pa.string()),
            )
        else:
            val = pa.nulls(len(s), pa.string()).fill_null(tmpl)
        out = pc.if_else(pc.equal(form, k), val, out)
    return out if isinstance(out, pa.Array) else out.combine_chunks()


def synth_call_numbers(ids_i64: pa.Array) -> pa.Array:
    return _select_template(ids_i64, CN_TEMPLATES, len(CN_TEMPLATES))


def _mod(ids: pa.Array, m: int) -> pa.Array:
    return pc.subtract(ids, pc.multiply(pc.divide(ids, m), m))


def _opt(cond, text_arr) -> pa.Array:
    """Conditional note fragment: text when cond else ''."""
    return pc.if_else(cond, text_arr, pa.scalar("", pa.string()))


def synth_notes(ids_i64: pa.Array) -> pa.Array:
    """Deterministic pipe-delimited Alexandria-style note per doc
    (item order: Shelf, Loc, Inventory, Fund, Policy, Note)."""
    ids = pc.cast(ids_i64, pa.int64())
    s = pc.cast(ids, pa.string())
    cn = synth_call_numbers(ids)
    j = lambda *parts: pc.binary_join_element_wise(*parts, pa.scalar("", pa.string()))  # noqa: E731
    shelf = j(pa.scalar("Shelf:", pa.string()), cn)
    loc = pc.if_else(
        pc.equal(_mod(ids, 19), 0), pa.scalar("|Loc:1st Floor CDs", pa.string()),
        pc.if_else(pc.equal(_mod(ids, 19), 1),
                   pa.scalar("|Loc:OVERSIZE PERIODICALS", pa.string()),
                   pa.scalar("", pa.string())),
    )
    mm = pc.utf8_lpad(pc.cast(pc.add(_mod(ids, 12), 1), pa.string()), 2, "0")
    dd = pc.utf8_lpad(pc.cast(pc.add(_mod(ids, 28), 1), pa.string()), 2, "0")
    yyyy = pc.cast(pc.add(_mod(ids, 30), 1990), pa.string())
    inv = _opt(
        pc.equal(_mod(ids, 3), 0),
        j(pa.scalar("|Inventory:", pa.string()), mm, pa.scalar("/", pa.string()),
          dd, pa.scalar("/", pa.string()), yyyy),
    )
    fund = _opt(
        pc.equal(_mod(ids, 4), 0),
        j(pa.scalar("|Fund:F", pa.string()), pc.cast(_mod(ids, 7), pa.string())),
    )
    pol = _opt(pc.equal(_mod(ids, 5), 0), pa.scalar("|Policy:LIB USE ONLY", pa.string()))
    marker = pc.if_else(
        pc.equal(_mod(ids, 23), 0), pa.scalar("|Note:STREAMING VIDEO", pa.string()),
        pc.if_else(pc.equal(_mod(ids, 11), 0), pa.scalar("|Note:EBOOK", pa.string()),
                   pc.if_else(pc.equal(_mod(ids, 17), 0),
                              pa.scalar("|Note:ONLINE PERIODICAL", pa.string()),
                              pa.scalar("", pa.string()))),
    )
    return j(shelf, loc, inv, fund, pol, marker)


def _run_policy(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The production policy stage: one plugin instance per worker process."""
    return ds.map_batches(
        _PolicyStage(_PLUGIN),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def policy_location_map(sf_dir: str) -> ray.data.Dataset:
    """P1/P2 driver query: (doc_id, call_number, location)."""

    def _mk(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table({"doc_id": ids, "call_number": synth_call_numbers(ids)})

    out = _run_policy(_docs_ids(sf_dir).map_batches(_mk, batch_format="pyarrow"))
    return out.map_batches(
        lambda t: t.select(["doc_id", "call_number", "location"]),
        batch_format="pyarrow",
    )


def policy_chain(sf_dir: str) -> ray.data.Dataset:
    """Full P1-P5/P8 chain over synthesized notes: (doc_id, location,
    inventory_date, fund, item_policy, online_type, online, n_local_fields)."""

    def _mk(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table({"doc_id": ids, "note_852": synth_notes(ids)})

    out = _run_policy(_docs_ids(sf_dir).map_batches(_mk, batch_format="pyarrow"))
    return out.map_batches(
        lambda t: t.select(
            ["doc_id", "location", "inventory_date", "fund", "item_policy",
             "online_type", "online", "n_local_fields"]
        ),
        batch_format="pyarrow",
    )


def policy_mat_type(sf_dir: str) -> ray.data.Dataset:
    """P11 audit report: rows whose call number / physical description
    conflict under any mat-type rule."""

    def _mk(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": ids,
                "call_number": _select_template(ids, MAT_CN_TEMPLATES, len(MAT_CN_TEMPLATES)),
                "phys_desc": _select_template(ids, MAT_PD_TEMPLATES, len(MAT_PD_TEMPLATES)),
            }
        )

    out = _run_policy(_docs_ids(sf_dir).map_batches(_mk, batch_format="pyarrow"))
    cols = ["doc_id", "call_number", "phys_desc", "mat_conflict_audio",
            "mat_conflict_video", "mat_conflict_dvd", "mat_conflict_cdrom",
            "mat_conflict_cd_rom"]

    def _filter(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        any_c = t["mat_conflict_audio"]
        for c in cols[4:]:
            any_c = pc.or_(any_c, t[c])
        return t.filter(any_c)

    return out.map_batches(_filter, batch_format="pyarrow")


def online_counts(sf_dir: str) -> pa.Table:
    """P12/A3: grouped online-type counts (null → 'offline'). Bounded
    cardinality (4 groups) → per-batch partials + tiny driver merge."""
    ds = policy_chain(sf_dir)

    def _partial(t: pa.Table) -> pa.Table:
        g = pa.table({"online_type": pc.fill_null(t["online_type"], "offline")})
        return g.group_by("online_type").aggregate([([], "count_all")])

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    tbl = pa.concat_tables(partials.iter_batches(batch_format="pyarrow"))
    final = tbl.group_by("online_type").aggregate([("count_all", "sum")])
    return pa.table(
        {
            "online_type": final["online_type"],
            "n": pc.cast(final["count_all_sum"], pa.int64()),
        }
    ).sort_by([("online_type", "ascending")])


# ------------------------------------------------------------------ SQL --
# Oracle-fragment builders: generated from the SAME constants the kernels
# use so the two sides cannot drift.


def cn_case_sql(col: str = "doc_id", templates=CN_TEMPLATES) -> str:
    """CASE expression synthesizing call numbers from an integer id."""
    mod = len(templates)
    arms = []
    for k, tmpl in enumerate(templates):
        pre, _, post = tmpl.partition("{i}")
        expr = f"'{pre}' || CAST({col} AS VARCHAR)" if "{i}" in tmpl else f"'{tmpl}'"
        if post:
            expr += f" || '{post}'"
        arms.append(f"WHEN {k} THEN {expr}")
    return f"CASE {col} % {mod} " + " ".join(arms) + " END"


def location_case_sql(cn_expr: str) -> str:
    """The keyer+map CASE over a lowercase call-number expression."""
    arms = [
        f"WHEN regexp_matches(lower({cn_expr}), '{rx}') THEN '{code}'"
        for rx, code in LOCATION_RULES
    ]
    return "CASE " + " ".join(arms) + " END"


def note_sql(col: str = "doc_id") -> str:
    """The synth_notes construction in SQL (item order must match)."""
    cn = cn_case_sql(col)
    mm = f"lpad(CAST(1 + {col} % 12 AS VARCHAR), 2, '0')"
    dd = f"lpad(CAST(1 + {col} % 28 AS VARCHAR), 2, '0')"
    yyyy = f"CAST(1990 + {col} % 30 AS VARCHAR)"
    return (
        f"'Shelf:' || {cn}"
        f" || CASE WHEN {col} % 19 = 0 THEN '|Loc:1st Floor CDs'"
        f" WHEN {col} % 19 = 1 THEN '|Loc:OVERSIZE PERIODICALS' ELSE '' END"
        f" || CASE WHEN {col} % 3 = 0 THEN '|Inventory:' || {mm} || '/' || {dd} || '/' || {yyyy} ELSE '' END"
        f" || CASE WHEN {col} % 4 = 0 THEN '|Fund:F' || CAST({col} % 7 AS VARCHAR) ELSE '' END"
        f" || CASE WHEN {col} % 5 = 0 THEN '|Policy:LIB USE ONLY' ELSE '' END"
        f" || CASE WHEN {col} % 23 = 0 THEN '|Note:STREAMING VIDEO'"
        f" WHEN {col} % 11 = 0 THEN '|Note:EBOOK'"
        f" WHEN {col} % 17 = 0 THEN '|Note:ONLINE PERIODICAL' ELSE '' END"
    )


def online_type_sql(note_expr: str) -> str:
    arms = [
        f"WHEN contains({note_expr}, '{marker}') THEN '{label}'"
        for marker, label in ONLINE_MARKERS
    ]
    return "CASE " + " ".join(arms) + " END"


def literal_loc_sql(note_expr: str) -> str:
    lit = f"NULLIF(regexp_extract({note_expr}, '{LOC_RE}', 1), '')"
    arms = [f"WHEN {lit} = '{k}' THEN '{v}'" for k, v in LITERAL_LOCATIONS.items()]
    return "CASE " + " ".join(arms) + " END"


def chain_sql_fragments(note_expr: str) -> dict[str, str]:
    """Column expressions for the policy_chain oracle over a note expr."""
    cn = f"NULLIF(regexp_extract({note_expr}, '(?:^|\\|)Shelf:(?P<cn>[^|]+)', 1), '')"
    online_type = online_type_sql(note_expr)
    inv = (
        f"CASE WHEN regexp_matches({note_expr}, '{INVENTORY_RE}') THEN "
        f"regexp_extract({note_expr}, '{INVENTORY_RE}', 3)"
        f" || regexp_extract({note_expr}, '{INVENTORY_RE}', 1)"
        f" || regexp_extract({note_expr}, '{INVENTORY_RE}', 2) END"
    )
    fund = (
        f"CASE WHEN regexp_matches({note_expr}, '{FUND_RE}') THEN "
        f"'PNCA ' || regexp_extract({note_expr}, '{FUND_RE}', 1) END"
    )
    pol = f"CASE WHEN regexp_matches({note_expr}, '{POLICY_RE}') THEN 'PNOCIRC' END"
    location = (
        f"CASE WHEN ({online_type}) IS NOT NULL THEN NULL ELSE "
        f"COALESCE({literal_loc_sql(note_expr)}, {location_case_sql(cn)}) END"
    )
    return {
        "call_number": cn,
        "online_type": online_type,
        "inventory_date": inv,
        "fund": fund,
        "item_policy": pol,
        "location": location,
    }


def mat_conflict_sql(cn_expr: str, pd_expr: str) -> dict[str, str]:
    """Boolean conflict expression per mat-type rule (reference order)."""
    cn = f"lower({cn_expr})"
    pd_ = f"lower({pd_expr})"
    present = f"({cn_expr} IS NOT NULL AND {pd_expr} IS NOT NULL)"
    out = {}
    out["mat_conflict_audio"] = (
        f"({present} AND contains({pd_}, 'audio') AND NOT contains({cn}, 'cdrom')"
        f" AND NOT contains({cn}, 'cd-rom')"
        f" AND NOT regexp_matches({cn}, '^cd\\s'))"
    )
    out["mat_conflict_video"] = (
        f"({present} AND contains({cn}, 'video')"
        f" AND NOT contains({pd_}, 'videocassette') AND NOT contains({pd_}, 'videorecording'))"
    )
    out["mat_conflict_dvd"] = (
        f"({present} AND contains({cn}, 'dvd')"
        f" AND NOT contains({pd_}, 'videodisc') AND NOT contains({pd_}, 'dvd'))"
    )
    for name, trig in (("mat_conflict_cdrom", "cdrom"), ("mat_conflict_cd_rom", "cd-rom")):
        out[name] = (
            f"({present} AND contains({cn}, '{trig}')"
            f" AND NOT contains({pd_}, 'cd-rom') AND NOT contains({pd_}, 'cdrom')"
            f" AND NOT contains({pd_}, 'optical'))"
        )
    return out
