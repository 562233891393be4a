"""Pure-Python replay oracle.

Implements SEMANTICS.md row-at-a-time with plain dicts and loops —
independently of the vectorized engine — so pytest can compare the engine's
final table state (including exact ``tokens`` array equality, the
``input_hint`` invariant) against it. Mirrors the reference's
record-at-a-time processing style (``record_update.py:182``).
"""

from __future__ import annotations

import re
from collections import defaultdict

from marc_data_migration_ray.config import PAYLOAD_COLUMNS, ReplayConfig

_LABEL = re.compile(r"\(OCoLC\)", re.IGNORECASE)
_PREFIX = re.compile(r"^(ocn|ocm|on)", re.IGNORECASE)
_TRAIL = re.compile(r"\W+\d+$")
_VALID = re.compile(r"^\d+$")


def normalize_key(raw):
    if raw is None:
        return None
    s = raw.strip()
    s = _LABEL.sub("", s)
    s = _PREFIX.sub("", s, count=1)
    s = _TRAIL.sub("", s)
    return s if _VALID.match(s) else None


def is_key_prefixed(raw) -> bool:
    """Mirror of functions.keys.is_key_prefixed (reference M4)."""
    if raw is None:
        return False
    s = raw.strip()
    return bool(_LABEL.search(s) or _PREFIX.match(s))


def fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def partition_of(key, raw, num_partitions: int) -> int:
    k = key if key is not None else raw
    if k is None:
        return 0
    return fnv1a64(k) % num_partitions


def _is_malformed(ev: dict) -> bool:
    if ev["op"] not in ("insert", "update", "delete", "schema_change"):
        return True  # unknown op → deadletter (aligned with ParseRoute)
    if ev["op"] == "schema_change":
        return False
    if ev["doc_id"] is None:
        return True
    if ev.get("n_tok") is not None and ev["n_tok"] < 0:
        return True
    if ev.get("tokens") is not None and ev.get("n_tok") is not None and ev["n_tok"] != len(ev["tokens"]):
        return True
    if ev["op"] == "insert" and ev.get("tokens") is None:
        return True
    return False


def _check_fail(ev: dict, constraints) -> str | None:
    """Scalar mirror of stages.parse._constraint_masks: name of the first
    (declaration-order) violated constraint, or None. Null payload values
    pass every op except 'not_null'."""
    for name, col, op, val in constraints:
        v = ev.get(col)
        if op == "not_null":
            if v is None:
                return name
            continue
        if v is None:
            continue
        if op == "ge" and v < val:
            return name
        if op == "le" and v > val:
            return name
        if op == "between" and (v < val[0] or v > val[1]):
            return name
        if op == "in" and v not in val:
            return name
        if op == "matches" and not re.search(val, v):
            return name
    return None


def replay(base_rows: list[dict], events: list[dict], cfg: ReplayConfig | None = None) -> dict:
    """Replay ``events`` (any order; sorted by lsn internally) onto
    ``base_rows``. Returns ``{"final": [rows], "audit": [rows],
    "metrics": dict, "schema_ops": [(kind, name, new_name)]}``.
    """
    cfg = cfg or ReplayConfig()
    # allocator-assigned local ids ({prefix}-PPPP-N) are first-class
    # addressable keys (mirror of stages.parse / functions.keys.local_id_parts)
    _local_re = re.compile(rf"^{re.escape(cfg.local_id_prefix)}-\d+-\d+$")

    def _norm(raw):
        if raw is not None and _local_re.match(raw.strip()):
            return raw.strip()
        return normalize_key(raw)

    events = sorted(events, key=lambda e: e["lsn"])
    # duplicate-delivery absorption: dedupe on globally-unique lsn
    seen_lsn = set()
    events = [e for e in events if not (e["lsn"] in seen_lsn or seen_lsn.add(e["lsn"]))]

    # --- base dedup (SEMANTICS: greatest raw doc_id, then greatest n_tok) ---
    base: dict[str, dict] = {}
    for row in base_rows:
        key = _norm(row["doc_id"])
        if key is None:
            continue  # base rows with unnormalizable keys are unreachable; drop
        cur = base.get(key)
        if cur is None or (row["doc_id"], row["n_tok"]) > (cur["doc_id"], cur["n_tok"]):
            base[key] = row

    # --- per-event routing ---
    audit = []
    routes = defaultdict(int)
    schema_ops = []
    applied_events: dict[str, list[dict]] = defaultdict(list)  # key -> events
    local_inserts: list[dict] = []

    def route_ev(ev, route, status):
        audit.append(
            {
                "lsn": ev["lsn"],
                "doc_id_raw": ev.get("doc_id"),
                "doc_id": ev.get("_key"),
                "op": ev["op"],
                "route": route,
                "status": status,
                "match_score": ev.get("match_score"),
            }
        )
        routes[route] += 1
        ev["_route"], ev["_status"] = route, status

    for ev in events:
        ev["_key"] = _norm(ev.get("doc_id"))
        if _is_malformed(ev):
            route_ev(ev, "deadletter", "malformed")
        elif ev["op"] == "schema_change":
            schema_ops.append(
                {"lsn": ev["lsn"], "kind": ev.get("schema_kind"),
                 "name": ev.get("schema_name"), "new_name": ev.get("schema_new_name")}
            )
            route_ev(ev, "schema", "schema")
        elif cfg.check_constraints and ev["op"] in ("insert", "update") and (
            _chk := _check_fail(ev, cfg.check_constraints)
        ):
            route_ev(ev, "rejected", f"check-failed:{_chk}")
        elif ev["_key"] is None:
            if ev["op"] == "insert":
                route_ev(ev, "local", "local")
                local_inserts.append(ev)
            else:
                route_ev(ev, "rejected", "no-key")
        elif ev["op"] == "delete":
            route_ev(ev, "applied", "tombstone")
            applied_events[ev["_key"]].append(ev)
        elif ev["op"] == "insert":
            route_ev(ev, "applied", "inserted")
            applied_events[ev["_key"]].append(ev)
        else:  # update: gate (reference M14)
            score = ev.get("match_score") or 0
            if score == 100:
                route_ev(ev, "applied", "perfect")
                applied_events[ev["_key"]].append(ev)
            elif cfg.fuzzy_001_test:
                # reference do_fuzzy_001_test (record_update.py:395-410)
                if not is_key_prefixed(ev.get("doc_id")) and score < cfg.fuzzy_threshold:
                    route_ev(ev, "rejected", "fuzzy-match-failed")
                else:
                    status = ("fuzzy-match-passed" if score >= cfg.fuzzy_threshold
                              else "fuzzy-match-failed")
                    route_ev(ev, "fuzzy", status)
                    applied_events[ev["_key"]].append(ev)
            elif cfg.require_perfect:
                route_ev(ev, "rejected", "fuzzy-match-failed")
            elif score >= cfg.fuzzy_threshold:
                route_ev(ev, "fuzzy", "fuzzy-match-passed")
                applied_events[ev["_key"]].append(ev)
            else:
                route_ev(ev, "rejected", "fuzzy-match-failed")

    # --- fold per key (anchor model) ---
    from marc_data_migration_ray.state.schema_timeline import Timeline

    tl = Timeline(schema_ops)

    def _ev_extra(ev: dict) -> dict:
        """Event/row extra payload → canonical-keyed dict (event payloads
        key by then-visible name; rows by canonical name)."""
        import json as _json

        raw = ev.get("extra_json")
        if raw is None:
            return {}
        d = _json.loads(raw)
        out = {}
        for c in tl.added:
            name = tl.name_at(c, ev.get("lsn", -1) if ev.get("lsn") is not None else -1)
            if name is not None and name in d:
                out[c] = d[name]
            elif c in d:
                out[c] = d[c]
        return out

    final = []
    col_replacements = defaultdict(int)
    tombstoned = 0
    all_keys = set(base) | set(applied_events)
    for key in all_keys:
        evs = applied_events.get(key, [])
        anchors = [e for e in evs if e["op"] in ("insert", "delete")]
        anchor_lsn, anchor_row, anchor_op = -1, base.get(key), "base"
        if anchors:
            a = anchors[-1]  # events already in lsn order
            anchor_lsn, anchor_op = a["lsn"], a["op"]
            anchor_row = None if a["op"] == "delete" else a
        elif anchor_row is None:
            # only updates targeted a key that never existed
            for e in evs:
                if e["op"] == "update":
                    _reroute(audit, routes, e, "noop")
            continue
        alive = anchor_op != "delete"
        if not alive:
            tombstoned += 1
        updates = [e for e in evs if e["op"] == "update"]
        applied_updates = []
        for e in updates:
            if e["lsn"] > anchor_lsn and alive:
                applied_updates.append(e)
            else:
                _reroute(audit, routes, e, "noop")
        if not alive:
            continue
        row = {c: anchor_row.get(c) for c in PAYLOAD_COLUMNS}
        for c in PAYLOAD_COLUMNS:
            for e in applied_updates:  # lsn order; later wins
                writes = tl.writes(c, e["lsn"], e.get("column_mask"))
                if writes and (cfg.strategy == "replace_and_add" or anchor_row.get(c) is not None):
                    row[c] = e.get(c)
                    col_replacements[c] += 1
        # DDL-added columns: anchor-carried value, overwritten by masked
        # updates carrying the value in extra_json (as-of-lsn names)
        anchor_extra = _ev_extra(anchor_row)
        row_extra = {c: anchor_extra.get(c) for c in tl.added}
        for c in tl.added:
            for e in applied_updates:
                if tl.writes(c, e["lsn"], e.get("column_mask")):
                    if cfg.strategy == "replace_only" and anchor_extra.get(c) is None:
                        continue
                    row_extra[c] = _ev_extra(e).get(c)
                    col_replacements[c] += 1
        lineage = [e for e in applied_updates]
        if anchor_op == "insert":
            lineage = [a] + lineage
        if lineage:
            last = max(lineage, key=lambda e: e["lsn"])
            status = {"insert": "inserted"}.get(last["op"], last["_status"])
            last_lsn = last["lsn"]
        else:
            status, last_lsn = "base", -1
        final.append(
            {
                "doc_id": key,
                "tokens": row["tokens"],
                "n_tok": row["n_tok"],
                "source": row["source"],
                "last_lsn": last_lsn,
                "status": status,
                "candidate_key": None,
                "_extra": row_extra,
            }
        )

    # --- local-id allocation (per-partition, lsn order) ---
    by_part = defaultdict(list)
    for e in local_inserts:
        by_part[partition_of(None, e["doc_id"], cfg.num_partitions)].append(e)
    for part, evs in by_part.items():
        for i, e in enumerate(sorted(evs, key=lambda x: x["lsn"]), start=1):
            final.append(
                {
                    "doc_id": f"{cfg.local_id_prefix}-{part:04d}-{cfg.local_id_start + i}",
                    "tokens": e.get("tokens"),
                    "n_tok": e.get("n_tok"),
                    "source": e.get("source"),
                    "last_lsn": e["lsn"],
                    "status": "local",
                    "candidate_key": e["doc_id"],
                    "_extra": {c: _ev_extra(e).get(c) for c in tl.added},
                }
            )

    # --- schema evolution on final schema (added columns carry VALUES;
    # dropped columns vanish) --- shared resolver, same as Manifest
    from marc_data_migration_ray.state.schema_timeline import resolve_schema_ops

    display = ["doc_id", "tokens", "n_tok", "source", "last_lsn", "status",
               "candidate_key"]
    schema, renames, added = resolve_schema_ops(display, schema_ops)
    canon_order = display + added
    add_set = set(added)
    final = [
        {
            disp: ((r.get("_extra") or {}).get(canon) if canon in add_set
                   else r[canon])
            for canon, disp in zip(canon_order, schema)
        }
        for r in final
    ]

    metrics = dict(routes)
    metrics["processed"] = len(events)
    metrics["tombstoned"] = tombstoned
    metrics["col_replacements"] = dict(col_replacements)
    assert metrics["processed"] == sum(routes.values())
    final.sort(key=lambda r: r["doc_id"])
    return {"final": final, "audit": audit, "metrics": metrics,
            "schema": schema, "schema_ops": schema_ops, "renames": renames}


def _reroute(audit, routes, ev, new_route):
    """Re-route a previously gate-passed update to noop (SEMANTICS fold rule)."""
    routes[ev["_route"]] -= 1
    routes[new_route] += 1
    for a in audit:
        if a["lsn"] == ev["lsn"]:
            a["route"] = new_route
            a["status"] = "noop"
            break
    ev["_route"] = new_route


def table_to_rows(table) -> list[dict]:
    """pyarrow.Table → list of plain-python row dicts (tokens as lists)."""
    return table.to_pylist()
