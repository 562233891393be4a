"""Within-batch LWW pre-collapse (hot-key / skew mitigation).

Among gate-passed EMPTY-MASK *updates* (full-row writes) in one batch that
share a key, only the max-``lsn`` event can ever win a column in the fold
(winners are per-column max-lsn among appliers, and the noop rule — ``lsn >
anchor_lsn`` with a live anchor — can never prefer the lower-lsn duplicate
when the higher one exists; an empty mask writes the base payload columns
in EVERY schema segment, so mid-stream DDL cannot change its write set).

Superseded events are NOT dropped: they are kept payload-STRIPPED
(``tokens`` nulled — the column that dominates bytes) and flagged
``collapsed=True``. The fold needs NO special handling for flagged rows:
a stripped row can never be a column winner — its within-batch winner has
a strictly higher lsn for the same key and is always co-present in any
fold input (unsalted: same key ⇒ same partition; salted: each sub-bucket
forwards its per-key max-lsn candidate, and the GLOBAL max-lsn applier is
by definition never superseded in its own batch, so it always out-ranks
any forwarded stripped row at the merge). Keeping the rows means audit
rows, route counts, noop/col-replacement metrics and the
``processed == Σroutes`` invariant stay EXACTLY what an uncollapsed run
(and the oracle) produce — while a hot key's full-row delta *bytes*
still shrink to ≤ one payload per batch.

Masked updates are NOT collapsed: under as-of-lsn mask resolution
(SEMANTICS §schema) two same-mask updates straddling a rename DDL write
DIFFERENT canonical columns, so the lower-lsn one can still be a column's
only writer.

Enabled via ``ReplayConfig.precollapse_updates``. Inserts / deletes /
rejected / deadletter / schema rows always pass through untouched.
"""

from __future__ import annotations

import os

# must precede the polars import (same guard as stages/fold.py): a Ray
# worker whose FIRST polars import happens here would otherwise freeze a
# full-size thread pool that every later num_cpus=1 fold task inherits
os.environ.setdefault("POLARS_MAX_THREADS", "1")

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
        # lsn is globally unique, so the per-key max IS the batch winner
        upd = upd.with_columns(
            (pl.col("lsn") != pl.col("lsn").max().over("key")).alias("collapsed")
        ).with_columns(
            tokens=pl.when(pl.col("collapsed"))
            .then(pl.lit(None))
            .otherwise(pl.col("tokens")),
        )
    out = pl.concat([rest, upd], how="vertical").to_arrow()
    cols = []
    for name, typ in zip(PARSED_SCHEMA.names, PARSED_SCHEMA.types):
        c = out.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c.cast(typ))
    return pa.Table.from_arrays(cols, schema=PARSED_SCHEMA)
