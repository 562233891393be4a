"""Within-batch LWW pre-collapse (hot-key / skew mitigation).

Among gate-passed *updates* in one batch that share ``(key, column-mask
set)``, only the max-``lsn`` event can ever win a column in the fold
(winners are per-column max-lsn among appliers, and the noop rule — ``lsn >
anchor_lsn`` with a live anchor — can never prefer the lower-lsn duplicate
when the higher one exists). Dropping the superseded ones therefore leaves
the final table state bit-identical while bounding a hot key's delta volume
to ≤ one row per batch per mask-set — the salted-sub-partition analog for a
co-partitioned layout (SURVEY §4.1 skew row; north-star "salted hot keys").

Enabled via ``ReplayConfig.precollapse_updates``. Inserts / deletes /
rejected / deadletter / schema rows always pass through untouched.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from marc_data_migration_ray.stages.parse import PARSED_SCHEMA


def precollapse_batch(t: pa.Table) -> pa.Table:
    df = pl.from_arrow(t)
    is_cand = df["route"].is_in(["applied", "fuzzy"]) & (df["op"] == "update")
    upd = df.filter(is_cand)
    rest = df.filter(~is_cand)
    if upd.height:
        upd = (
            upd.with_columns(
                pl.col("column_mask")
                .list.sort()
                .list.join(",")
                .fill_null("")
                .alias("_masksig")
            )
            .sort(["key", "_masksig", "lsn"])
            .unique(subset=["key", "_masksig"], keep="last", maintain_order=True)
            .drop("_masksig")
        )
    out = pl.concat([rest, upd], how="vertical").to_arrow()
    cols = []
    for name, typ in zip(PARSED_SCHEMA.names, PARSED_SCHEMA.types):
        c = out.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c.cast(typ))
    return pa.Table.from_arrays(cols, schema=PARSED_SCHEMA)
