"""Within-batch LWW pre-collapse (hot-key / skew mitigation).

Among gate-passed EMPTY-MASK *updates* (full-row writes) in one batch that
share a key, only the max-``lsn`` event can ever win a column in the fold
(winners are per-column max-lsn among appliers, and the noop rule — ``lsn >
anchor_lsn`` with a live anchor — can never prefer the lower-lsn duplicate
when the higher one exists; an empty mask writes the base payload columns
in EVERY schema segment, so mid-stream DDL cannot change its write set).
Dropping the superseded ones therefore leaves the final table state
bit-identical while bounding a hot key's full-row delta volume to ≤ one
row per batch — complementary to the cross-partition salted fold.

Masked updates are NOT collapsed: under as-of-lsn mask resolution
(SEMANTICS §schema) two same-mask updates straddling a rename DDL write
DIFFERENT canonical columns, so the lower-lsn one can still be a column's
only writer.

Enabled via ``ReplayConfig.precollapse_updates``. Inserts / deletes /
rejected / deadletter / schema rows always pass through untouched.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from marc_data_migration_ray.stages.parse import PARSED_SCHEMA


def precollapse_batch(t: pa.Table) -> pa.Table:
    df = pl.from_arrow(t)
    is_cand = (
        df["route"].is_in(["applied", "fuzzy"])
        & (df["op"] == "update")
        & (df["column_mask"].list.len().fill_null(0) == 0)
    )
    upd = df.filter(is_cand)
    rest = df.filter(~is_cand)
    if upd.height:
        upd = (
            upd.sort(["key", "lsn"])
            .unique(subset=["key"], keep="last", maintain_order=True)
        )
    out = pl.concat([rest, upd], how="vertical").to_arrow()
    cols = []
    for name, typ in zip(PARSED_SCHEMA.names, PARSED_SCHEMA.types):
        c = out.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c.cast(typ))
    return pa.Table.from_arrays(cols, schema=PARSED_SCHEMA)
