"""Site policy plugin: the full reference pnca mutator chain in batch form
(reference ``processors/plugins/pnca/pnca_policy.py:38-52`` chain order:
location → inventory → funds → item-policy → fix-dup-100 → local-note →
remove-035 → remove-9xx).

The plugin reads the Alexandria-era pipe-delimited note from ``note_852``
(falling back to ``source`` — our recast of the 852$1 note carrier), and:

- P1/P2 location: online rows get none (pnca_policy.py:322-324); a literal
  ``Loc:`` value maps through ``LITERAL_LOCATIONS`` (pnca_policy.py:340);
  otherwise the call number (explicit ``call_number`` column, else the
  ``Shelf:`` note item) runs the prefix keyer;
- P3/P4/P5: ``inventory_date`` / ``fund`` / ``item_policy`` columns;
- P7: merges ``uniform_lang`` into ``author`` when both columns exist;
- P8 local-note: ``n_local_fields`` counts the site-local derived columns
  a row carries (the $9local preservation marker, batch form);
- P9/P10 drops: drops ``f035`` if present and nulls empty ``note_900``
  values (pnca_policy.py:225-234,464-480);
- P11: ``mat_conflict_*`` boolean audit columns when ``call_number`` and
  ``phys_desc`` are both present;
- M10/P12: ``online_type`` column; ``route_flags`` exposes the boolean.

All work is vectorized Arrow (``functions/site_policy.py`` kernels); the
policy object is constructed once per actor by ``_PolicyStage``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from marc_data_migration_ray.functions import site_policy as sp
from marc_data_migration_ray.stages.policy import UpdatePolicy as _Base

#: P9 analog: legacy identifier columns stripped before the load.
DROP_COLUMNS = ("f035",)

#: columns counted by the P8 local-note marker.
LOCAL_FIELD_COLUMNS = ("location", "inventory_date", "fund", "item_policy")


class UpdatePolicy(_Base):
    NOTE_COLUMNS = ("note_852", "source")

    def execute_batch(self, table: pa.Table) -> pa.Table:
        n = table.num_rows
        note = None
        for c in self.NOTE_COLUMNS:
            if c in table.column_names:
                note = table[c]
                break
        if note is None:
            note = pa.nulls(n, pa.string())

        online_type = sp.online_types(note)
        online = pc.is_valid(online_type)

        if "call_number" in table.column_names:
            call_number = pc.cast(table["call_number"], pa.string())
        else:
            call_number = sp.shelf_call_numbers(note)

        # P1: literal Loc: wins, else call-number keyer; online rows skip
        lit = sp.literal_location(sp.loc_literals(note))
        by_cn = sp.location_for_callnumber(call_number)
        location = pc.if_else(online, pa.scalar(None, pa.string()),
                              pc.coalesce(lit, by_cn))

        inventory_date = sp.inventory_dates(note)
        fund = sp.funds(note)
        item_policy = sp.item_policies(note)

        out = table
        # P7 dup-100 merge (only when the site columns exist on this table)
        if "author" in out.column_names and "uniform_lang" in out.column_names:
            merged, remaining = sp.fix_dup_100(out["author"], out["uniform_lang"])
            out = out.set_column(out.column_names.index("author"), "author", merged)
            out = out.set_column(
                out.column_names.index("uniform_lang"), "uniform_lang", remaining
            )

        derived = {
            "location": location,
            "inventory_date": inventory_date,
            "fund": fund,
            "item_policy": item_policy,
            "online_type": online_type,
        }
        for name, col in derived.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, col)

        # P8: count of populated site-local derived columns per row
        n_local = pc.cast(pc.is_valid(location), pa.int64())
        for c in LOCAL_FIELD_COLUMNS[1:]:
            n_local = pc.add(n_local, pc.cast(pc.is_valid(derived[c]), pa.int64()))
        if "n_local_fields" in out.column_names:
            out = out.drop_columns(["n_local_fields"])
        out = out.append_column("n_local_fields", n_local)

        # P11 mat-type audit columns
        if "phys_desc" in out.column_names:
            for rule, flag in sp.mat_type_conflicts(call_number, out["phys_desc"]).items():
                name = f"mat_conflict_{rule.replace('-', '_')}"
                if name in out.column_names:
                    out = out.drop_columns([name])
                out = out.append_column(name, flag)

        # P9: drop legacy columns; P10: null empty note_900 values
        drops = [c for c in DROP_COLUMNS if c in out.column_names]
        if drops:
            out = out.drop_columns(drops)
        if "note_900" in out.column_names:
            n900 = pc.cast(out["note_900"], pa.string())
            cleaned = pc.if_else(
                pc.fill_null(pc.equal(n900, ""), True), pa.scalar(None, pa.string()), n900
            )
            out = out.set_column(out.column_names.index("note_900"), "note_900", cleaned)
        return out

    def route_flags(self, table: pa.Table) -> pa.Array:
        # M10 analog: the online routing bit (pnca_policy.py:71-96)
        flags = pc.is_valid(table["online_type"])
        return flags.combine_chunks() if isinstance(flags, pa.ChunkedArray) else flags
