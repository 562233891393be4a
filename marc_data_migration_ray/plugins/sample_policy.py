"""Sample policy plugin (analog of reference
``processors/plugins/sample/sample_policy.py`` — the documented extension
example; also exercises the P8 local-note append, M10 online routing, and
U7 conditional-move semantics in batch form)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from marc_data_migration_ray.stages.policy import UpdatePolicy as _Base


class UpdatePolicy(_Base):
    #: sources treated as "online" (reference is_online checked 900$a for
    #: STREAMING VIDEO / EBOOK / ONLINE PERIODICAL, pnca_policy.py:71-96)
    ONLINE_SOURCES = ("web", "wiki")

    def execute_batch(self, table: pa.Table) -> pa.Table:
        # P8 analog: stamp locally-assigned rows with a note column
        note = pc.if_else(
            pc.equal(table["status"], "local"),
            pa.scalar("local", pa.string()),
            pa.scalar(None, pa.string()),
        )
        if "local_note" in table.column_names:
            table = table.drop_columns(["local_note"])
        return table.append_column("local_note", note)

    def route_flags(self, table: pa.Table) -> pa.Array:
        # M10 analog: online routing bit from the source column
        return pc.is_in(
            table["source"], value_set=pa.array(self.ONLINE_SOURCES, pa.string())
        )

    def column_moves(self) -> dict[str, str]:
        # U7 analog: site-local rename
        return {"candidate_key": "candidate_key_local"}
