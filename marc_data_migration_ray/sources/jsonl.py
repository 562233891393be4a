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


def sniff_encoding(head: bytes) -> dict:
    """Byte-sniffing encoding preflight — the engine analog of the
    reference's chardet pass over input files before parsing (S3,
    ``processors/encoding_utils/encoding.py:6-25``), with stdlib
    heuristics (no chardet in this environment):

    1. BOMs: UTF-8-sig / UTF-16 LE,BE / UTF-32 LE,BE — confidence 1.0;
    2. NUL-pattern UTF-16 detection (BOM-less): mostly-ASCII text in
       UTF-16-LE has NULs at odd byte positions, BE at even;
    3. strict UTF-8 validation (decodes cleanly ⇒ UTF-8);
    4. latin-1 as the lossless single-byte fallback (every byte maps).

    Returns ``{"encoding", "confidence", "bom"}``. Only the first ~64 KiB
    should be passed — the decision is stable after that."""
    if head.startswith(b"\xff\xfe\x00\x00"):
        return {"encoding": "utf-32-le", "confidence": 1.0, "bom": True}
    if head.startswith(b"\x00\x00\xfe\xff"):
        return {"encoding": "utf-32-be", "confidence": 1.0, "bom": True}
    if head.startswith(b"\xef\xbb\xbf"):
        return {"encoding": "utf-8-sig", "confidence": 1.0, "bom": True}
    if head.startswith(b"\xff\xfe"):
        return {"encoding": "utf-16-le", "confidence": 1.0, "bom": True}
    if head.startswith(b"\xfe\xff"):
        return {"encoding": "utf-16-be", "confidence": 1.0, "bom": True}
    if len(head) >= 8:
        # BOM-less UTF-32 first: mostly-ASCII text has NULs in 3 of
        # every 4 positions, which also trips the utf-16 odd/even test
        q = [head[r::4].count(0) / max(len(head[r::4]), 1)
             for r in range(4)]
        if q[1] > 0.3 and q[2] > 0.3 and q[3] > 0.3 and q[0] < 0.05:
            return {"encoding": "utf-32-le",
                    "confidence": round(min(q[1:]), 3), "bom": False}
        if q[0] > 0.3 and q[1] > 0.3 and q[2] > 0.3 and q[3] < 0.05:
            return {"encoding": "utf-32-be",
                    "confidence": round(min(q[:3]), 3), "bom": False}
    if len(head) >= 4:
        odd_nul = head[1::2].count(0) / max(len(head[1::2]), 1)
        even_nul = head[0::2].count(0) / max(len(head[0::2]), 1)
        if odd_nul > 0.4 and even_nul < 0.05:
            return {"encoding": "utf-16-le",
                    "confidence": round(odd_nul, 3), "bom": False}
        if even_nul > 0.4 and odd_nul < 0.05:
            return {"encoding": "utf-16-be",
                    "confidence": round(even_nul, 3), "bom": False}
    if b"\x00" in head:
        # NUL is VALID UTF-8, so a BOM-less wide encoding that dodged
        # the pattern tests above would otherwise classify as utf-8 at
        # confidence 1.0 and salvage as NUL-riddled mojibake (code-
        # review r5); no sane JSONL text feed contains NUL — decode
        # losslessly as latin-1 and say we are guessing
        return {"encoding": "latin-1", "confidence": 0.3, "bom": False}
    try:
        head.decode("utf-8")
        return {"encoding": "utf-8", "confidence": 1.0, "bom": False}
    except UnicodeDecodeError as e:
        # the head is a PREFIX of the file (sniff window) — a multibyte
        # sequence straddling the window's edge leaves 1-3 truncated
        # trailing bytes that must not force the latin-1 fallback
        # (ADVICE r4 item 1). "unexpected end of data" is the decoder's
        # own truncation verdict: the tail is a VALID lead byte plus
        # valid continuations that simply ran out — an invalid start or
        # continuation byte at the edge (e.g. latin-1 \xff) reports a
        # different reason and still falls back. head[:e.start] is
        # clean by definition (e.start is the first offending byte).
        # Inherent ambiguity: a latin-1 accented byte as the window's
        # very last byte (\xe9 is also a UTF-8 lead) classifies utf-8;
        # a straddled window is near-certain for real UTF-8 while a
        # first accented byte in the last 3 of 64 KiB is vanishing.
        if (e.start >= len(head) - 3
                and e.reason == "unexpected end of data"):
            return {"encoding": "utf-8", "confidence": 0.99,
                    "bom": False}
        return {"encoding": "latin-1", "confidence": 0.5, "bom": False}


def _decode_sniffed(epoch: int, forced: str | None = None):
    """Per-FILE bytes → decoded text lines (salvage preflight stage):
    sniff each file's head once (or use the caller's ``forced`` codec),
    transcode the whole file, split lines. Runs as ordinary map tasks —
    one file per row is the right unit because encoding is a per-file
    property, and salvage mode is the explicit recovery tool, not the
    hot path."""

    def _fn(t: pa.Table) -> pa.Table:
        lines: list[str] = []
        for raw in t["bytes"].to_pylist():
            if forced is not None:
                enc = forced
            else:
                info = sniff_encoding(bytes(raw[:65536]))
                enc = info["encoding"]
                if info["bom"]:  # BOM-consuming codec, or U+FEFF leaks
                    if enc.startswith("utf-16"):  # into line 1's JSON
                        enc = "utf-16"
                    elif enc.startswith("utf-32"):
                        enc = "utf-32"
            text = bytes(raw).decode(enc, errors="replace")
            if text.startswith("\ufeff"):
                # a FORCED non-BOM-consuming codec (e.g. 'utf-16-le' on
                # a BOM'd file) leaks U+FEFF into line 1 and deadletters
                # the first record of every file (code-review r5)
                text = text[1:]
            # \n-only splitting (plus \r strip downstream): splitlines()
            # also breaks on U+0085/U+2028/U+2029, which are LEGAL raw
            # inside JSON strings — a latin-1 0x85 in a title tore the
            # line into two unparseable halves (code-review r5)
            lines.extend(text.split("\n"))
        return _lenient_lines(epoch)(pa.table(
            {"text": pa.array(lines, pa.string())}))

    return _fn


def read_jsonl_binlog(paths: str | list[str], epoch: int,
                      strict: bool = True,
                      encoding: str = "utf-8") -> ray.data.Dataset:
    """JSONL epoch → a Dataset with the exact Parquet-binlog schema.

    ``strict=True`` (default): Arrow's C++ JSON parser with the explicit
    envelope schema — fastest, and a torn/corrupt line FAILS THE EPOCH
    loudly (the epoch is atomic; nothing commits). That is the right
    contract for a fenced CDC feed: a malformed envelope means upstream
    corruption, not data to guess at.

    ``strict=False`` (salvage mode): line-level tolerant parse — every
    line that is not a valid envelope (broken JSON, non-object, wrong
    field types) becomes an ``op='__unparseable__'`` event, which the
    gate's unknown-op rule routes to **deadletter/malformed** (same path
    as every other bad record; the raw line is preserved in the audit's
    ``extra_json``). Slower (per-line ``json.loads``) — an explicit
    recovery tool, not the default.

    ``encoding="auto"`` (salvage mode only): byte-sniffing encoding
    preflight per file (:func:`sniff_encoding` — the reference's chardet
    pass, S3) before line splitting, so a UTF-16 / latin-1 / BOM'd feed
    salvages instead of mangling; the strict path keeps the UTF-8
    contract (a fenced CDC feed in the wrong encoding IS upstream
    corruption)."""
    from pyarrow import json as pajson

    if strict:
        if encoding not in ("utf-8", None):
            raise ValueError(
                "strict mode is UTF-8 by contract; use strict=False with "
                "encoding='auto' to salvage a mis-encoded feed")
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
    if encoding not in ("utf-8", None):
        # 'auto' sniffs per file; an EXPLICIT codec decodes every file
        # with it (skipping the sniff) — either way the arg is honored,
        # never silently ignored
        forced = None if encoding == "auto" else encoding
        ds = ray.data.read_binary_files(paths, file_extensions=["jsonl"])
        return ds.map_batches(
            _decode_sniffed(epoch, forced), batch_format="pyarrow")
    ds = ray.data.read_text(paths, file_extensions=["jsonl"])
    return ds.map_batches(
        _lenient_lines(epoch), batch_format="pyarrow", zero_copy_batch=True
    )


_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1
_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


def _int_or_none(v, lo: int = _I64_MIN, hi: int = _I64_MAX):
    # range-checked: a Python int beyond the Arrow column's width would
    # crash Table.from_pylist / the later safe int32 cast with
    # OverflowError/ArrowInvalid mid-salvage (code-review r5) — treat it
    # like any other wrong-typed value and null it out
    return v if (isinstance(v, int) and not isinstance(v, bool)
                 and lo <= v <= hi) else None


def _int32_or_none(v):
    return _int_or_none(v, _I32_MIN, _I32_MAX)


def _str_or_none(v):
    return v if isinstance(v, str) else None


def _coerce_envelope(o: dict) -> dict:
    """Best-effort envelope sanitation for the lenient path: keep only
    schema fields, null out anything wrong-typed (a null doc_id / op makes
    the event malformed downstream — never a crash, never a guess)."""
    def _struct(v, fields) -> dict | None:
        if not isinstance(v, dict):
            return None
        return {k: fn(v.get(k)) for k, fn in fields}

    after = _struct(o.get("after"), [
        ("doc_id", _str_or_none),
        ("tokens", lambda v: v if isinstance(v, list)
         and all(isinstance(x, int) and not isinstance(x, bool)
                 and _I32_MIN <= x <= _I32_MAX for x in v)
         else None),
        ("n_tok", _int32_or_none),
        ("source", _str_or_none),
        ("title", _str_or_none),
        ("match_title", _str_or_none),
        ("extra_json", _str_or_none),
    ])
    meta = _struct(o.get("meta"), [
        ("column_mask", lambda v: v if isinstance(v, list)
         and all(isinstance(x, str) for x in v) else None),
        ("match_score", _int32_or_none),
    ])
    sc = _struct(o.get("schema_change"), [
        ("kind", _str_or_none),
        ("name", _str_or_none),
        ("new_name", _str_or_none),
    ])
    return {
        "op": _str_or_none(o.get("op")) or "__missing-op__",
        "lsn": _int_or_none(o.get("lsn")),
        "before": _struct(o.get("before"), [("doc_id", _str_or_none)]),
        "after": after,
        "meta": meta,
        "schema_change": sc,
    }


def _lenient_lines(epoch: int):
    """Batch of raw text lines → envelope table (salvage mode)."""
    def _fn(t: pa.Table) -> pa.Table:
        rows = []
        for line in t["text"].to_pylist():
            line = (line or "").strip()
            if not line:
                continue
            try:
                o = json.loads(line)
                if not isinstance(o, dict):
                    raise ValueError("not an object")
                rows.append(_coerce_envelope(o))
            except Exception:
                # raw line preserved for the audit (S7 archive analog)
                rows.append({
                    "op": "__unparseable__", "lsn": None, "before": None,
                    "after": {"doc_id": None, "tokens": None, "n_tok": None,
                              "source": None, "title": None,
                              "match_title": None,
                              "extra_json": json.dumps({"raw_line": line[:4096]})},
                    "meta": None, "schema_change": None,
                })
        env = pa.Table.from_pylist(rows, schema=_ENVELOPE_SCHEMA)
        return _normalize(epoch)(env)

    return _fn


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


# --------------------------------------------------------------------- #
# change-FEED envelopes (CDC egress / replication ingest as JSON)
# --------------------------------------------------------------------- #
_IMG_T = pa.struct(
    [
        ("last_lsn", pa.int64()),
        ("n_tok", pa.int64()),
        ("source", pa.string()),
        ("status", pa.string()),
        ("tokens", pa.list_(pa.int64())),
    ]
)
_FEED_ENVELOPE_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("key", pa.string()),
        ("before", _IMG_T),
        ("after", _IMG_T),
    ]
)
_FEED_OP_IN = pa.array(["insert", "update", "delete"], pa.string())
_FEED_OP_OUT = pa.array(["c", "u", "d"], pa.string())


def feed_to_envelopes(t: pa.Table) -> pa.Table:
    """changes_between feed batch → envelope columns (op, key, before,
    after) ready for ``Dataset.write_json`` — the distributed CDC-egress
    encoder (vectorized struct assembly; no driver row loop)."""
    idx = pc.index_in(t["change"], value_set=_FEED_OP_IN)
    op = pc.take(_FEED_OP_OUT, idx)
    n = t.num_rows
    has_payload = "tokens_after" in t.column_names
    tok_after = (
        pc.cast(t["tokens_after"], pa.list_(pa.int64()))
        if has_payload
        else pa.nulls(n, pa.list_(pa.int64()))
    )

    def _img(suffix: str, tokens, null_mask) -> pa.StructArray:
        cols = [
            pc.cast(t[f"last_lsn{suffix}"], pa.int64()),
            pc.cast(t[f"n_tok{suffix}"], pa.int64()),
            pc.cast(t[f"source{suffix}"], pa.string()),
            pc.cast(t[f"status{suffix}"], pa.string()),
            tokens,
        ]
        cols = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in cols]
        if isinstance(null_mask, pa.ChunkedArray):
            null_mask = null_mask.combine_chunks()
        return pa.StructArray.from_arrays(
            cols, fields=list(_IMG_T), mask=null_mask
        )

    # Debezium convention (code-review r5): an insert has NO before
    # image and a delete NO after image — serialize them as null, not
    # as a struct of all-null fields, so external consumers that
    # classify by `before === null` read the feed correctly
    ch = pc.cast(t["change"], pa.string())
    return pa.table(
        {
            "op": op,
            "key": pc.cast(t["doc_id"], pa.string()),
            "before": _img("_before", pa.nulls(n, pa.list_(pa.int64())),
                           pc.equal(ch, "insert")),
            "after": _img("_after", tok_after, pc.equal(ch, "delete")),
        }
    )


def read_jsonl_feed(paths: str | list[str]) -> ray.data.Dataset:
    """JSONL feed envelopes → the ``changes_between(..., with_payload=True)``
    schema (inverse of :func:`feed_to_envelopes`), consumable by
    ``apply_change_feed``."""
    from pyarrow import json as pajson

    ds = ray.data.read_json(
        paths,
        file_extensions=["jsonl"],
        parse_options=pajson.ParseOptions(
            explicit_schema=_FEED_ENVELOPE_SCHEMA,
            unexpected_field_behavior="ignore",
        ),
    )

    def _fn(t: pa.Table) -> pa.Table:
        idx = pc.index_in(pc.cast(t["op"], pa.string()), value_set=_FEED_OP_OUT)
        change = pc.take(_FEED_OP_IN, idx)
        b, a = t["before"], t["after"]
        return pa.table(
            {
                "doc_id": pc.cast(t["key"], pa.string()),
                "change": change,
                "last_lsn_before": pc.struct_field(b, "last_lsn"),
                "last_lsn_after": pc.struct_field(a, "last_lsn"),
                "n_tok_before": pc.struct_field(b, "n_tok"),
                "source_before": pc.struct_field(b, "source"),
                "status_before": pc.struct_field(b, "status"),
                "n_tok_after": pc.struct_field(a, "n_tok"),
                "source_after": pc.struct_field(a, "source"),
                "status_after": pc.struct_field(a, "status"),
                "tokens_after": pc.cast(
                    pc.struct_field(a, "tokens"), pa.list_(pa.int32())
                ),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True)


def write_jsonl_feed(feed: ray.data.Dataset, out_dir: str) -> dict:
    """Distributed JSONL feed writer: each task encodes its batch to
    envelopes and writes one ``part-*.jsonl`` file under ``out_dir``
    (tmp + rename per file). Avoids ``Dataset.write_json``'s
    pandas serialization, which floatifies nullable ints (``364.0``)
    and breaks schema'd re-reads. Returns per-change counts."""
    import hashlib
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    names = {"c": "insert", "u": "update", "d": "delete"}

    def _w(t: pa.Table) -> pa.Table:
        env = feed_to_envelopes(t)
        counts: dict[str, int] = {}
        buf: list[str] = []
        for row in env.to_pylist():
            counts[row["op"]] = counts.get(row["op"], 0) + 1
            buf.append(json.dumps(row))
        payload = "\n".join(buf) + ("\n" if buf else "")
        # CONTENT-addressed part name: a Ray task retry (worker death
        # after the rename, lost-block recompute) re-produces the same
        # bytes and overwrites the same file instead of duplicating
        # every event under a fresh uuid (code-review r5); distinct
        # feed batches are disjoint row sets, so names never collide
        name = hashlib.md5(payload.encode()).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.jsonl")
        tmp = path + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            f.write(payload)
        os.rename(tmp, path)
        return pa.table(
            {"change": pa.array(sorted(counts), pa.string()),
             "n": pa.array([counts[k] for k in sorted(counts)], pa.int64())}
        )

    totals: dict[str, int] = {}
    for b in feed.map_batches(
        _w, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for op, n in zip(b["change"].to_pylist(), b["n"].to_pylist()):
            totals[names[op]] = totals.get(names[op], 0) + n
    return totals
