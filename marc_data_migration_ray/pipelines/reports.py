"""Key-normalization and title-similarity report pipelines (reference
M1-M3, M7, M15 and the report entry points §3.3), over the driver tables.

Raw keys are synthesized deterministically from ``documents.doc_id`` (the
same CASE arithmetic in the DuckDB oracle), so the reference's key-noise
normalization quirks are exercised against a SQL ground truth.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.functions.keys import normalize_keys
from marc_data_migration_ray.functions.text import normalize_titles
from marc_data_migration_ray.sources import readers


def _docs(sf_dir: str, columns) -> ray.data.Dataset:
    return readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def key_normalize(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, raw_key, norm_key, is_valid): normalize noisy synthetic keys.

    Noise form by doc_id % 6: (OCoLC)ocm… / ocn… / ON… / trailing junk /
    clean / invalid. Mirrors reference M1-M3 precedence + quirks.
    """

    def _mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        s = ids.astype(str).astype(object)
        form = ids % 6
        raw = np.select(
            [form == 0, form == 1, form == 2, form == 3, form == 4],
            ["(OCoLC)ocm" + s, "ocn" + s, "ON" + s, s + " 99", s],
            default="bad" + s + "x",
        ).astype(object)
        raw_arr = pa.array(raw, pa.string())
        norm = normalize_keys(raw_arr)
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "raw_key": raw_arr,
                "norm_key": norm,
                "is_valid": pc.is_valid(norm),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(_mk, batch_format="pyarrow", zero_copy_batch=True)


def title_normalize(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, norm_title): reference M7 normalization over punctuated text
    (punctuation appended deterministically so the kernel has work to do)."""

    def _mk(t: pa.Table) -> pa.Table:
        raw = pc.binary_join_element_wise(
            pc.cast(t["text"], pa.string()), "-- tail..!  (x) ", " "
        )
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.int64()), "norm_title": normalize_titles(raw)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mk, batch_format="pyarrow", zero_copy_batch=True
    )


def intra_record_dups(sf_dir: str) -> ray.data.Dataset:
    """Reference R2/R3 analog (``reports.py:116-169``): records carrying a
    repeated single-valued field. Recast: binlog events whose column mask
    lists the same column more than once — a malformed-but-parseable shape
    the reference reports for human review rather than rejecting.

    Masks are synthesized deterministically (lsn % 9 picks the form, update
    events only) so the DuckDB oracle mirrors the arithmetic exactly.
    Output: (lsn, doc_id, n_mask, n_distinct) for offending events.
    """
    import polars as pl

    from marc_data_migration_ray.pipelines.derived import build_binlog_ds

    ds = build_binlog_ds(sf_dir)

    def _mk(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["lsn", "doc_id", "op"]))
        form = pl.col("lsn") % 9
        empty = pl.lit([], dtype=pl.List(pl.String))
        mask = (
            pl.when(pl.col("op") != "update").then(empty)
            .when(form == 0).then(pl.lit(["n_tok", "n_tok"]))
            .when(form == 1).then(pl.lit(["tokens", "source", "tokens"]))
            .when(form == 2).then(pl.lit(["source"]))
            .otherwise(empty)
        )
        out = (
            df.with_columns(mask.alias("mask"))
            .with_columns(
                pl.col("mask").list.len().cast(pl.Int64).alias("n_mask"),
                pl.col("mask").list.n_unique().cast(pl.Int64).alias("n_distinct"),
            )
            .filter(pl.col("n_mask") > pl.col("n_distinct"))
            .select("lsn", "doc_id", "n_mask", "n_distinct")
        )
        a = out.to_arrow()
        return pa.table(
            {
                "lsn": pc.cast(a["lsn"], pa.int64()),
                "doc_id": pc.cast(a["doc_id"], pa.string()),
                "n_mask": pc.cast(a["n_mask"], pa.int64()),
                "n_distinct": pc.cast(a["n_distinct"], pa.int64()),
            }
        )

    return ds.map_batches(_mk, batch_format="pyarrow", zero_copy_batch=True)


def title_jaccard(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, jaccard): stop-word-stripped word-set Jaccard between doc i
    and doc i+1 (reference M15 audit metric), via Dataset.join on doc_id+1.

    Jaccard = |A∩B| / |A∪B| over distinct non-stop-word tokens — a ratio of
    small integers, so engine and SQL agree exactly.
    """
    left = _docs(sf_dir, ["doc_id", "text"])
    right = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table(
            {
                "next_id": pc.cast(pc.subtract(t["doc_id"], 1), pa.int64()),
                "text_b": t["text"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    left = left.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()), "text_a": t["text"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = left.join(right, join_type="inner", num_partitions=8, on=("doc_id",), right_on=("next_id",))

    STOP = frozenset({"the", "of", "a", "an", "p", "n"})

    def _jac(t: pa.Table) -> pa.Table:
        out = []
        for a, b in zip(t["text_a"].to_pylist(), t["text_b"].to_pylist()):
            sa = {w for w in a.split() if w and w not in STOP}
            sb = {w for w in b.split() if w and w not in STOP}
            u = sa | sb
            out.append(len(sa & sb) / len(u) if u else 0.0)
        return pa.table(
            {"doc_id": t["doc_id"], "jaccard": pa.array(out, pa.float64())}
        )

    return joined.map_batches(_jac, batch_format="pyarrow")
