"""Schema-op timeline: as-of-lsn column-name resolution (mid-stream DDL).

The binlog's ``schema_change`` events form a total order by lsn. A column
mask inside an update event refers to the schema AS OF THAT EVENT'S LSN —
an update emitted after ``rename_column(n_tok, tok_count)`` masks
``tok_count``, and one emitted before the rename masks ``n_tok``; a mask
naming a column before it was added is a no-op. ``add_column`` columns
become WRITABLE by later updates (values carried in the event's
``extra_json`` payload keyed by the column's then-visible name).

This module builds, from the DDL list, a per-canonical-column segment
timeline ``[(start_lsn, end_lsn, visible_name)]`` consumed by BOTH the
vectorized fold (polars expressions) and the pure-Python oracle — one
definition, no drift. Canonical id of a base payload column is its
original name; of an added column, its add-time name.
"""

from __future__ import annotations

from marc_data_migration_ray.config import PAYLOAD_COLUMNS


class Timeline:
    """Per-canonical-column visible-name segments.

    ``segments[c]`` = list of ``(start_lsn, end_lsn, name)`` with
    ``start_lsn is None`` ⇒ since always, ``end_lsn is None`` ⇒ open.
    ``added`` = canonical names of DDL-added columns, in add order.
    """

    #: display columns of the final table — occupied names: an add naming
    #: one is a no-op, a rename targeting one is a no-op (mirrors
    #: Manifest.resolve_schema / the oracle's schema section exactly).
    RESERVED = ("doc_id", "tokens", "n_tok", "source", "last_lsn", "status",
                "candidate_key")

    def __init__(self, schema_ops: list[dict] | None):
        self.segments: dict[str, list[tuple[int | None, int | None, str]]] = {
            c: [(None, None, c)] for c in PAYLOAD_COLUMNS
        }
        self.added: list[str] = []
        self.dropped: set[str] = set()  # canonical ids of dropped added cols
        retired: set[str] = set()  # every name a DROPPED column ever wore
        visible: dict[str, str] = {c: c for c in PAYLOAD_COLUMNS}  # canonical→name
        occupied = set(self.RESERVED)
        for op in sorted(schema_ops or [], key=lambda o: o["lsn"]):
            kind, name, new = op.get("kind"), op.get("name"), op.get("new_name")
            lsn = op["lsn"]
            if kind == "add_column":
                if name in visible.values() or name in self.segments or name in occupied:
                    continue  # adding an existing/occupied name is a no-op
                self.segments[name] = [(lsn, None, name)]
                self.added.append(name)
                visible[name] = name
                occupied.add(name)
            elif kind == "rename_column":
                canon = next((c for c, v in visible.items() if v == name), None)
                # no-op when: unknown source; target currently visible;
                # target reserved; or target RETIRED (a dropped column's
                # old name — same reuse ban the add_column path enforces,
                # code-review r5: the previous compound condition's
                # occupied/visible conjuncts were dead and let a rename
                # resurrect a retired name)
                if (canon is None or new in visible.values()
                        or new in self.RESERVED or new in retired):
                    continue
                s, _, nm = self.segments[canon][-1]
                self.segments[canon][-1] = (s, lsn, nm)
                self.segments[canon].append((lsn, None, new))
                visible[canon] = new
                occupied.add(new)
            elif kind == "drop_column":
                # Only DDL-ADDED columns are droppable: the base payload
                # columns carry the token-equality invariant (input_hint)
                # and dropping them would silently break every reader.
                # A dropped column's names stay RETIRED (in `occupied` /
                # `segments`), so a later add_column reusing the name is a
                # no-op — name reuse would make merge-on-read history
                # ambiguous (an old delta's mask would resurrect under the
                # new incarnation).
                canon = next(
                    (c for c, v in visible.items()
                     if v == name and c in self.added), None)
                if canon is None:
                    continue  # base payload / unknown / already dropped
                s, _, nm = self.segments[canon][-1]
                self.segments[canon][-1] = (s, lsn, nm)
                del visible[canon]
                self.dropped.add(canon)
                retired.update(
                    seg_nm for _, _, seg_nm in self.segments[canon])

    def has_renames_or_adds(self) -> bool:
        return bool(self.added) or any(
            len(segs) > 1 for segs in self.segments.values()
        )

    def live_added(self) -> list[str]:
        """Canonical ids of added columns still visible at end-of-log."""
        return [c for c in self.added if c not in self.dropped]

    def name_at(self, canonical: str, lsn: int) -> str | None:
        """Visible name of ``canonical`` as of ``lsn`` (None ⇒ not visible)."""
        for start, end, name in self.segments.get(canonical, ()):
            if (start is None or lsn >= start) and (end is None or lsn < end):
                return name
        return None

    def writes(self, canonical: str, lsn: int, mask: list[str] | None) -> bool:
        """Does an update at ``lsn`` with ``mask`` write ``canonical``?

        Empty/None mask ⇒ all BASE payload columns (added columns are only
        written when explicitly masked)."""
        if not mask:
            return canonical in PAYLOAD_COLUMNS
        name = self.name_at(canonical, lsn)
        return name is not None and name in mask


def resolve_schema_prefix(
    base_columns: list[str], tl: "Timeline", lsn: int
) -> tuple[list[str], dict[str, str], list[str]]:
    """``resolve_schema_ops(base_columns, [op for op in ops if op[\"lsn\"]
    <= lsn])`` computed from the FULL timeline in O(columns), no Timeline
    reconstruction: truncating an append-only DDL log only truncates
    segment chains, so a column's prefix end-of-log name IS its visible
    name AT ``lsn``, and the prefix's added set is the add-order prefix
    with ``add_lsn ≤ lsn`` minus columns dropped at or before it. A
    many-cut as-of lineage resolves one schema per DDL prefix; rebuilding
    a Timeline per prefix cost O(prefixes × ops) (r4 profiling).
    Equality with the from-scratch resolver is property-tested."""
    schema: list[str] = []
    renames: dict[str, str] = {}
    for c in base_columns:
        if c in PAYLOAD_COLUMNS:
            nm = tl.name_at(c, lsn) or c
            schema.append(nm)
            if nm != c:
                renames[c] = nm
        else:
            schema.append(c)
    added: list[str] = []
    for c in tl.added:
        start = tl.segments[c][0][0]
        if start is not None and start > lsn:
            continue  # added after the cut
        nm = tl.name_at(c, lsn)
        if nm is None:
            continue  # dropped at or before the cut
        added.append(c)
        schema.append(nm)
        if nm != c:
            renames[c] = nm
    return schema, renames, added


def resolve_schema_ops(
    base_columns: list[str], ops: list[dict] | None
) -> tuple[list[str], dict[str, str], list[str]]:
    """Simulate schema ops over display columns (SEMANTICS §schema).

    ONE definition shared by ``Manifest.resolve_schema``, the pure-Python
    oracle's final-schema section and the tests' mirror — no drift.

    Returns ``(final_schema, renames canonical→final, added_canonicals)``:
    ``final_schema`` is positionally aligned with ``base_columns +
    added_canonicals`` (adds append; renames rewrite in place; drops remove
    the column from BOTH lists, keeping alignment). ``drop_column`` applies
    only to DDL-added columns and RETIRES the dropped names — a later
    ``add_column`` reusing one is a no-op (mirrors ``Timeline``).
    """
    # Derived FROM the Timeline so the two can never drift: the final
    # schema is each base column's end-of-log visible name (payload
    # canonicals resolve through their segment chain; engine metadata
    # columns — doc_id, last_lsn, status, candidate_key — are not
    # DDL-addressable and keep their names) followed by the live added
    # columns' visible names, positionally aligned with
    # ``base_columns + added``.
    tl = Timeline(ops or [])
    end = 1 << 62  # "end of log" lsn for name_at
    schema: list[str] = []
    renames: dict[str, str] = {}
    for c in base_columns:
        if c in PAYLOAD_COLUMNS:
            nm = tl.name_at(c, end) or c
            schema.append(nm)
            if nm != c:
                renames[c] = nm
        else:
            schema.append(c)
    added = tl.live_added()
    for c in added:
        nm = tl.name_at(c, end)
        schema.append(nm)
        if nm != c:
            renames[c] = nm
    return schema, renames, added
