"""Debezium-flavor JSONL binlog ingest.

Real CDC streams usually arrive as JSON envelopes (Debezium's
``{op, before, after, source{lsn}}`` convention — public docs/format),
not Parquet. This module maps a JSONL epoch onto the SAME Arrow binlog
schema the Parquet path produces, so ``ParseRoute`` and everything
downstream (routing, fold, audit, change feed, time travel) are
format-agnostic: one line of difference at the read.

Envelope — one JSON object per line:

    {"op": "c" | "u" | "d" | "ddl",
     "lsn": N,
     "before": {"doc_id": ...} | null,          # key carrier for deletes
     "after":  {"doc_id", "tokens", "n_tok", "source", "title",
                "match_title", "extra_json"} | null,
     "meta":   {"column_mask": [...], "match_score": N} | null,
     "schema_change": {"kind", "name", "new_name"} | null}

Mapping to the binlog schema: ``c``→insert, ``u``→update, ``d``→delete,
``ddl``→schema_change; any other ``op`` string passes through verbatim so
the gate's unknown-op → deadletter/malformed routing (ADVICE r1 alignment)
behaves identically across formats. Deletes carry their key Debezium-style
in ``before.doc_id``; the reader coalesces ``after.doc_id`` → ``before``.

Scale shape: ``ray.data.read_json`` streams line-delimited JSON block by
block with an EXPLICIT Arrow schema (no sampling-dependent inference —
a quiet epoch whose lines all lack ``meta`` must still produce the same
columns), and the normalizer is one vectorized ``map_batches`` of
``pyarrow.compute`` struct-field extraction + casts.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_AFTER_T = pa.struct(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int64())),
        ("n_tok", pa.int64()),
        ("source", pa.string()),
        ("title", pa.string()),
        ("match_title", pa.string()),
        ("extra_json", pa.string()),
    ]
)
_ENVELOPE_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("lsn", pa.int64()),
        ("before", pa.struct([("doc_id", pa.string())])),
        ("after", _AFTER_T),
        (
            "meta",
            pa.struct(
                [("column_mask", pa.list_(pa.string())), ("match_score", pa.int64())]
            ),
        ),
        (
            "schema_change",
            pa.struct(
                [("kind", pa.string()), ("name", pa.string()), ("new_name", pa.string())]
            ),
        ),
    ]
)

_OP_IN = pa.array(["c", "u", "d", "ddl"], pa.string())
_OP_OUT = pa.array(["insert", "update", "delete", "schema_change"], pa.string())


def _normalize(epoch: int):
    def _fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        op = pc.cast(t["op"], pa.string())
        idx = pc.index_in(op, value_set=_OP_IN)
        mapped = pc.take(_OP_OUT, idx)
        out_op = pc.if_else(pc.is_valid(idx), mapped, op)  # unknown ops verbatim
        after = t["after"]
        before = t["before"]
        doc_id = pc.coalesce(
            pc.struct_field(after, "doc_id"), pc.struct_field(before, "doc_id")
        )
        meta = t["meta"]
        sc = t["schema_change"]
        return pa.table(
            {
                "lsn": pc.cast(t["lsn"], pa.int64()),
                "epoch": pa.array([epoch] * n, pa.int32()),
                "op": out_op,
                "doc_id": doc_id,
                "tokens": pc.cast(
                    pc.struct_field(after, "tokens"), pa.list_(pa.int32())
                ),
                "n_tok": pc.cast(pc.struct_field(after, "n_tok"), pa.int32()),
                "source": pc.struct_field(after, "source"),
                "column_mask": pc.struct_field(meta, "column_mask"),
                "match_score": pc.cast(
                    pc.struct_field(meta, "match_score"), pa.int32()
                ),
                "title": pc.struct_field(after, "title"),
                "match_title": pc.struct_field(after, "match_title"),
                "extra_json": pc.struct_field(after, "extra_json"),
                "schema_kind": pc.struct_field(sc, "kind"),
                "schema_name": pc.struct_field(sc, "name"),
                "schema_new_name": pc.struct_field(sc, "new_name"),
            }
        )

    return _fn


def read_jsonl_binlog(paths: str | list[str], epoch: int) -> ray.data.Dataset:
    """JSONL epoch → a Dataset with the exact Parquet-binlog schema."""
    from pyarrow import json as pajson

    ds = ray.data.read_json(
        paths,
        file_extensions=["jsonl"],
        parse_options=pajson.ParseOptions(
            explicit_schema=_ENVELOPE_SCHEMA,
            unexpected_field_behavior="ignore",
        ),
    )
    return ds.map_batches(
        _normalize(epoch), batch_format="pyarrow", zero_copy_batch=True
    )


def binlog_to_jsonl(parquet_files: list[str], dest_file: str) -> int:
    """Egress/fixture converter: Parquet binlog rows → Debezium-flavor
    JSONL (inverse of :func:`read_jsonl_binlog`). Driver-side row loop —
    a test/CLI helper for producing envelope fixtures, not a data-plane
    stage. Returns the number of lines written."""
    import pyarrow.parquet as pq

    inv = {"insert": "c", "update": "u", "delete": "d", "schema_change": "ddl"}
    n = 0
    with open(dest_file, "w") as f:
        for path in parquet_files:
            for row in pq.read_table(path).to_pylist():
                op = inv.get(row["op"], row["op"])
                env: dict = {"op": op, "lsn": row["lsn"]}
                payload = {
                    "doc_id": row["doc_id"],
                    "tokens": row["tokens"],
                    "n_tok": row["n_tok"],
                    "source": row["source"],
                    "title": row["title"],
                    "match_title": row["match_title"],
                    "extra_json": row["extra_json"],
                }
                if op == "d":
                    env["before"] = {"doc_id": row["doc_id"]}
                    # a clean delete has a null payload; keep ``after`` only
                    # when some payload field is set (e.g. planted
                    # inconsistent rows the gate must still deadletter)
                    env["after"] = (
                        payload
                        if any(v is not None for k, v in payload.items()
                               if k != "doc_id")
                        else None
                    )
                else:
                    env["after"] = payload
                if row.get("column_mask") is not None or row.get("match_score") is not None:
                    env["meta"] = {
                        "column_mask": row.get("column_mask"),
                        "match_score": row.get("match_score"),
                    }
                if row.get("schema_kind") is not None:
                    env["schema_change"] = {
                        "kind": row["schema_kind"],
                        "name": row["schema_name"],
                        "new_name": row["schema_new_name"],
                    }
                f.write(json.dumps(env) + "\n")
                n += 1
    return n
