"""Debezium-flavor JSONL binlog ingest: format parity with Parquet.

The converter round-trip is the strongest check available: a fixture
epoch (inserts/updates/deletes, fuzzy scores, column masks, schema
changes, planted malformed rows) converted to JSONL envelopes and
replayed must produce bit-identical state, routes and metrics to the
Parquet replay of the same events.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.config import ReplayConfig
from marc_data_migration_ray.pipelines.replay import Replayer
from marc_data_migration_ray.sources import fixtures
from marc_data_migration_ray.sources.jsonl import binlog_to_jsonl


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jsonl_fx"))
    fixtures.write_fixture(root, n_rows=150, n_events=800, n_epochs=2, seed=11)
    return root


def _rows(rp):
    return sorted(
        rp.read_state().take_all(), key=lambda r: (r["doc_id"] or "", r["last_lsn"])
    )


def test_jsonl_replay_matches_parquet(ray_session, fixture_root, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp_pq = Replayer(str(tmp_path / "t_pq"), cfg,
                     base_path=os.path.join(fixture_root, "base"))
    rp_js = Replayer(str(tmp_path / "t_js"), cfg,
                     base_path=os.path.join(fixture_root, "base"))
    for e in range(2):
        src = os.path.join(fixture_root, "binlog", f"epoch={e}")
        files = sorted(glob.glob(os.path.join(src, "*.parquet")))
        js_dir = str(tmp_path / f"jsonl/epoch={e}")
        os.makedirs(js_dir, exist_ok=True)
        n = binlog_to_jsonl(files, os.path.join(js_dir, "part-0.jsonl"))
        assert n == sum(pq.read_metadata(f).num_rows for f in files)
        ent_pq = rp_pq.apply_epoch(e, src)
        ent_js = rp_js.apply_epoch(e, js_dir, source_format="jsonl")
        assert ent_js["routes"] == ent_pq["routes"]
        assert ent_js["processed"] == ent_pq["processed"]
        assert ent_js["max_lsn"] == ent_pq["max_lsn"]
    a, b = _rows(rp_pq), _rows(rp_js)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb  # full row equality incl. tokens, status, lsn


def test_jsonl_empty_epoch_commits(ray_session, fixture_root, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fixture_root, "base"))
    empty = str(tmp_path / "empty")
    os.makedirs(empty, exist_ok=True)
    ent = rp.apply_epoch(0, empty, source_format="jsonl")
    assert ent["rows"] == 0 and ent["processed"] == 0


def test_jsonl_unknown_op_routes_like_parquet(ray_session, tmp_path):
    """An envelope with an unmapped op string must flow through to the
    gate verbatim and route exactly like the Parquet path (deadletter)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog
    from marc_data_migration_ray.stages.parse import ParseRoute

    line = {
        "op": "upsert", "lsn": 5,
        "after": {"doc_id": "1000001", "tokens": [1, 2], "n_tok": 2,
                  "source": "web", "title": "t", "match_title": "t",
                  "extra_json": None},
        "meta": {"column_mask": None, "match_score": 100},
    }
    p = str(tmp_path / "b.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps(line) + "\n")
    cfg = ReplayConfig(num_partitions=4)
    parsed_js = read_jsonl_binlog(p, 0).map_batches(
        ParseRoute(cfg), batch_format="pyarrow").take_all()

    t = pa.table({
        "lsn": pa.array([5], pa.int64()), "epoch": pa.array([0], pa.int32()),
        "op": pa.array(["upsert"]), "doc_id": pa.array(["1000001"]),
        "tokens": pa.array([[1, 2]], pa.list_(pa.int32())),
        "n_tok": pa.array([2], pa.int32()), "source": pa.array(["web"]),
        "column_mask": pa.array([None], pa.list_(pa.string())),
        "match_score": pa.array([100], pa.int32()),
        "title": pa.array(["t"]), "match_title": pa.array(["t"]),
        "extra_json": pa.array([None], pa.string()),
        "schema_kind": pa.array([None], pa.string()),
        "schema_name": pa.array([None], pa.string()),
        "schema_new_name": pa.array([None], pa.string()),
    })
    pqf = str(tmp_path / "b.parquet")
    pq_mod.write_table(t, pqf)
    import ray.data
    parsed_pq = ray.data.read_parquet(pqf).map_batches(
        ParseRoute(cfg), batch_format="pyarrow").take_all()
    assert len(parsed_js) == len(parsed_pq) == 1
    assert parsed_js[0]["route"] == parsed_pq[0]["route"]
    assert parsed_js[0]["status"] == parsed_pq[0]["status"]


def test_mixed_format_epochs_one_table(ray_session, fixture_root, tmp_path):
    """A table may ingest epoch 0 as Parquet and epoch 1 as JSONL (a feed
    migrating encodings mid-stream): state equals the all-Parquet replay."""
    cfg = ReplayConfig(num_partitions=8)
    rp_all = Replayer(str(tmp_path / "t_all"), cfg,
                      base_path=os.path.join(fixture_root, "base"))
    rp_mix = Replayer(str(tmp_path / "t_mix"), cfg,
                      base_path=os.path.join(fixture_root, "base"))
    e1 = os.path.join(fixture_root, "binlog", "epoch=1")
    js_dir = str(tmp_path / "jsonl_e1")
    os.makedirs(js_dir, exist_ok=True)
    binlog_to_jsonl(sorted(glob.glob(os.path.join(e1, "*.parquet"))),
                    os.path.join(js_dir, "part-0.jsonl"))
    for e, (path, fmt) in enumerate([
        (os.path.join(fixture_root, "binlog", "epoch=0"), "parquet"),
        (js_dir, "jsonl"),
    ]):
        rp_mix.apply_epoch(e, path, source_format=fmt)
        rp_all.apply_epoch(e, os.path.join(fixture_root, "binlog", f"epoch={e}"))
    assert _rows(rp_mix) == _rows(rp_all)


def test_follow_jsonl_stream(ray_session, fixture_root, tmp_path):
    """CLI `follow --format jsonl` tails a root of JSONL epochs and lands
    the same state as the in-process Parquet replay."""
    import subprocess
    import sys

    root = str(tmp_path / "stream")
    for e in range(2):
        src = os.path.join(fixture_root, "binlog", f"epoch={e}")
        d = os.path.join(root, f"epoch={e}")
        os.makedirs(d, exist_ok=True)
        binlog_to_jsonl(sorted(glob.glob(os.path.join(src, "*.parquet"))),
                        os.path.join(d, "part-0.jsonl"))
    table = str(tmp_path / "t_follow")
    out = subprocess.run(
        [sys.executable, "-m", "marc_data_migration_ray", "follow",
         "--table", table, "--binlog-root", root,
         "--base", os.path.join(fixture_root, "base"),
         "--num-partitions", "8", "--format", "jsonl",
         "--until-epoch", "1", "--max-idle-polls", "2", "--poll", "0.2"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert '"applied_epoch": 1' in out.stdout

    cfg = ReplayConfig(num_partitions=8)
    rp_follow = Replayer(table, cfg)
    rp_pq = Replayer(str(tmp_path / "t_ref"), cfg,
                     base_path=os.path.join(fixture_root, "base"))
    for e in range(2):
        rp_pq.apply_epoch(e, os.path.join(fixture_root, "binlog", f"epoch={e}"))
    assert _rows(rp_follow) == _rows(rp_pq)


@pytest.fixture(scope="module")
def repl_fixture_root(tmp_path_factory):
    """Replication fixture: no invalid keys (feed-apply documentedly skips
    engine-allocated local-id rows) and no DDL (keeps names comparable)."""
    root = str(tmp_path_factory.mktemp("jsonl_repl_fx"))
    fixtures.write_fixture(root, n_rows=150, n_events=800, n_epochs=2,
                           seed=13, invalid_key_frac=0.0,
                           schema_change_frac=0.0)
    return root


def test_jsonl_feed_replication_round_trip(ray_session, repl_fixture_root, tmp_path):
    """CDC egress as JSONL envelopes closes the replication loop: export a
    snapshot, ship the payload feed as Debezium-flavor lines, apply it on a
    replica at a different layout — replica payload set == source."""
    fixture_root = repl_fixture_root
    cfg = ReplayConfig(num_partitions=8)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_root, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_root, "binlog", f"epoch={e}"))

    exp = str(tmp_path / "exp0")
    src.export_snapshot(exp, up_to_epoch=0)
    rep = Replayer(str(tmp_path / "replica"), ReplayConfig(num_partitions=5),
                   base_path=exp)

    feed_dir = str(tmp_path / "feed_jsonl")
    info = src.export_changes(feed_dir, 0, 1, with_payload=True, fmt="jsonl")
    assert info["format"] == "jsonl" and info["n_changes"] > 0
    assert glob.glob(os.path.join(feed_dir, "*.jsonl"))
    # re-export is a no-op returning the manifest; format mismatch raises
    assert src.export_changes(feed_dir, 0, 1, with_payload=True,
                              fmt="jsonl") == info
    with pytest.raises(ValueError, match="format"):
        src.export_changes(feed_dir, 0, 1, with_payload=True)

    rep.apply_change_feed(feed_dir, epoch=0, feed_format="jsonl")

    def payload(rp):
        return sorted(
            (r["doc_id"], list(r["tokens"] or []), r["n_tok"], r["source"])
            for r in rp.read_state().take_all()
        )

    assert payload(rep) == payload(src)


def test_jsonl_scalar_feed_refused_for_apply(ray_session, fixture_root, tmp_path):
    cfg = ReplayConfig(num_partitions=8)
    src = Replayer(str(tmp_path / "src"), cfg,
                   base_path=os.path.join(fixture_root, "base"))
    for e in range(2):
        src.apply_epoch(e, os.path.join(fixture_root, "binlog", f"epoch={e}"))
    feed_dir = str(tmp_path / "feed_scalar")
    src.export_changes(feed_dir, 0, 1, with_payload=False, fmt="jsonl")
    rep = Replayer(str(tmp_path / "replica"), cfg,
                   base_path=os.path.join(fixture_root, "base"))
    with pytest.raises(ValueError, match="tokens_after"):
        rep.apply_change_feed(feed_dir, epoch=5, feed_format="jsonl")


def test_lenient_jsonl_salvages_junk_lines(ray_session, fixture_root, tmp_path):
    """jsonl-lenient: junk lines (broken JSON, non-objects, wrong-typed
    fields) become deadletter events; every VALID envelope replays
    bit-identically to the strict path."""
    cfg = ReplayConfig(num_partitions=8)
    src = os.path.join(fixture_root, "binlog", "epoch=0")
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    clean = str(tmp_path / "clean/epoch=0")
    dirty = str(tmp_path / "dirty/epoch=0")
    os.makedirs(clean, exist_ok=True)
    os.makedirs(dirty, exist_ok=True)
    binlog_to_jsonl(files, os.path.join(clean, "part-0.jsonl"))
    junk = [
        "{not json at all",
        "[1, 2, 3]",
        '"just a string"',
        '{"op": 42, "lsn": "nope"}',
        '{"op": "u", "lsn": 1e99, "after": {"doc_id": 7}}',
        '{"op": "c", "lsn": null, "after": {"tokens": ["a", "b"]}}',
        "\x00\xff binary garbage",
        "",
    ]
    with open(os.path.join(clean, "part-0.jsonl")) as f:
        lines = f.read().splitlines()
    n_junk = len([j for j in junk if j.strip()])
    mixed = lines[:5] + junk + lines[5:]
    with open(os.path.join(dirty, "part-0.jsonl"), "w") as f:
        f.write("\n".join(mixed) + "\n")

    rp_clean = Replayer(str(tmp_path / "t_clean"), cfg,
                        base_path=os.path.join(fixture_root, "base"))
    rp_dirty = Replayer(str(tmp_path / "t_dirty"), cfg,
                        base_path=os.path.join(fixture_root, "base"))
    ent_c = rp_clean.apply_epoch(0, clean, source_format="jsonl")
    ent_d = rp_dirty.apply_epoch(0, dirty, source_format="jsonl-lenient")
    # every junk line lands in deadletter; all real routes are unchanged
    assert ent_d["processed"] == ent_c["processed"] + n_junk
    assert (ent_d["routes"]["deadletter"]
            == ent_c["routes"].get("deadletter", 0) + n_junk)
    for r, n in ent_c["routes"].items():
        if r != "deadletter":
            assert ent_d["routes"][r] == n, r
    a, b = _rows(rp_clean), _rows(rp_dirty)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra == rb


def test_lenient_jsonl_hypothesis_never_crashes(ray_session, tmp_path):
    """Property: ANY byte salad ingests without crashing in lenient mode,
    and lines that are not valid envelopes all route to deadletter."""
    from hypothesis import given, settings, strategies as st

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    cases = []

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(min_size=1, max_size=60).map(
        # read_text splits on every str.splitlines separator (\v, \f,
        # NEL, LS, PS, \x1c-\x1e, \r...) — collapse them so one
        # hypothesis string stays one physical line
        lambda s: " ".join(s.splitlines())), min_size=1, max_size=8))
    def _collect(lines):
        cases.append(lines)

    _collect()
    d = str(tmp_path / "fuzz")
    os.makedirs(d, exist_ok=True)
    all_lines = [ln for ls in cases for ln in ls]
    with open(os.path.join(d, "part-0.jsonl"), "w") as f:
        f.write("\n".join(all_lines) + "\n")
    out = read_jsonl_binlog(d, epoch=0, strict=False).take_all()
    n_nonempty = len([ln for ln in all_lines if ln.strip()])
    assert len(out) == n_nonempty
    # a random text line is essentially never a valid envelope with an
    # int lsn AND a known op — but tolerate hypothesis finding one
    bad = [r for r in out if r["op"] in
           ("__unparseable__", "__missing-op__") or r["lsn"] is None]
    assert len(bad) >= n_nonempty - 2


def test_sniff_encoding_heuristics():
    """The S3-analog byte preflight: BOMs, BOM-less UTF-16 NUL patterns,
    strict UTF-8 validation, latin-1 fallback."""
    from marc_data_migration_ray.sources.jsonl import sniff_encoding

    line = '{"op":"c","lsn":1}\n'
    assert sniff_encoding(line.encode("utf-8"))["encoding"] == "utf-8"
    assert sniff_encoding(
        b"\xef\xbb\xbf" + line.encode())["encoding"] == "utf-8-sig"
    got = sniff_encoding(line.encode("utf-16"))  # BOM'd LE on x86
    assert got["encoding"] in ("utf-16-le", "utf-16-be") and got["bom"]
    # BOM-less UTF-16-LE: NULs at odd positions
    got = sniff_encoding(line.encode("utf-16-le"))
    assert got["encoding"] == "utf-16-le" and not got["bom"]
    got = sniff_encoding(line.encode("utf-16-be"))
    assert got["encoding"] == "utf-16-be"
    # invalid UTF-8 bytes -> lossless single-byte fallback
    assert sniff_encoding(b'{"op":"caf\xe9"}')["encoding"] == "latin-1"
    assert sniff_encoding(b"")["encoding"] == "utf-8"
    # ADVICE r4 item 1: the sniff window is a PREFIX — a multibyte
    # sequence cut at the window edge (1, 2 or 3 trailing bytes of a
    # valid UTF-8 char) must still classify as utf-8, not latin-1
    full = '{"op":"c","title":"café € \U0001f600'.encode("utf-8")
    for cut in (1, 2, 3):  # cuts land inside the 4-byte emoji
        head = full[:-cut]
        assert head[-1] & 0x80, "fixture must cut inside a multibyte seq"
        got = sniff_encoding(head)
        assert got["encoding"] == "utf-8", (cut, got)
    # a GENUINE mid-buffer error still falls back to latin-1
    assert sniff_encoding(b'{"x":"\xe9 trailing"}')["encoding"] == "latin-1"
    # an INVALID byte at the window edge (not a truncated sequence —
    # \xff can never start UTF-8) must also stay latin-1
    assert sniff_encoding(b'{"x":"caf\xff')["encoding"] == "latin-1"
    # invalid continuation at the edge: \xe9 lead followed by ASCII
    assert sniff_encoding(b'{"x":"caf\xe9"')["encoding"] == "latin-1"


def test_salvage_auto_encoding_matches_utf8(ray_session, fixture_root,
                                            tmp_path):
    """A UTF-16-LE-encoded (and a latin-1) JSONL epoch read with
    encoding='auto' parses to exactly the rows the UTF-8 file yields —
    the encoding-detection preflight completes the reference's S3 story
    for the salvage reader."""
    import glob

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    files = sorted(glob.glob(os.path.join(
        fixture_root, "binlog", "epoch=0", "*.parquet")))
    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    binlog_to_jsonl(files, os.path.join(clean, "part-0.jsonl"))
    text = open(os.path.join(clean, "part-0.jsonl"),
                encoding="utf-8").read()

    for enc in ("utf-16-le", "utf-16", "latin-1"):
        d = str(tmp_path / f"enc_{enc}")
        os.makedirs(d)
        payload = text if enc != "latin-1" else text.encode(
            "utf-8").decode("utf-8").encode("latin-1", "replace").decode(
            "latin-1")
        with open(os.path.join(d, "part-0.jsonl"), "w",
                  encoding=enc) as f:
            f.write(payload)
        want = sorted(read_jsonl_binlog(clean, 0, strict=False).take_all(),
                      key=lambda r: (r["lsn"] is None, r["lsn"]))
        got = sorted(read_jsonl_binlog(d, 0, strict=False,
                                       encoding="auto").take_all(),
                     key=lambda r: (r["lsn"] is None, r["lsn"]))
        if enc == "latin-1":
            assert len(got) == len(want)  # lossy transcode: rows survive
        else:
            assert got == want, enc


def test_salvage_forced_encoding(ray_session, fixture_root, tmp_path):
    """An EXPLICIT codec (not 'auto') is honored in salvage mode — it
    was previously silently ignored (r4 code-review finding)."""
    import glob

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    files = sorted(glob.glob(os.path.join(
        fixture_root, "binlog", "epoch=0", "*.parquet")))
    clean = str(tmp_path / "clean")
    os.makedirs(clean)
    binlog_to_jsonl(files, os.path.join(clean, "part-0.jsonl"))
    text = open(os.path.join(clean, "part-0.jsonl"),
                encoding="utf-8").read()
    d = str(tmp_path / "u16")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.jsonl"), "w",
              encoding="utf-16-le") as f:
        f.write(text)
    want = sorted(read_jsonl_binlog(clean, 0, strict=False).take_all(),
                  key=lambda r: (r["lsn"] is None, r["lsn"]))
    got = sorted(read_jsonl_binlog(d, 0, strict=False,
                                   encoding="utf-16-le").take_all(),
                 key=lambda r: (r["lsn"] is None, r["lsn"]))
    assert got == want


def test_salvage_never_crashes_on_absurd_ints(ray_session, tmp_path):
    """Code-review r5 (reproduced): out-of-range ints crashed the salvage
    read (OverflowError at Table.from_pylist; ArrowInvalid at the int32
    cast). They now coerce to null like any wrong-typed value."""
    import json as _json

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    lines = [
        {"op": "u", "lsn": 99999999999999999999999,  # > int64
         "after": {"doc_id": "1000001", "n_tok": 2, "tokens": [1, 2]}},
        {"op": "u", "lsn": 5,
         "after": {"doc_id": "1000002", "n_tok": 3000000000}},  # > int32
        {"op": "u", "lsn": 6,
         "after": {"doc_id": "1000003", "tokens": [1, 2 ** 40]}},
        {"op": "u", "lsn": 7, "after": {"doc_id": "1000004", "n_tok": 1},
         "meta": {"match_score": 2 ** 35}},
        {"op": "u", "lsn": 8,
         "after": {"doc_id": "1000005", "n_tok": 4, "tokens": [9, 9]},
         "meta": {"match_score": 90}},  # sane control row
    ]
    p = str(tmp_path / "b.jsonl")
    with open(p, "w") as f:
        for o in lines:
            f.write(_json.dumps(o) + "\n")
    rows = read_jsonl_binlog(p, 0, strict=False).take_all()
    assert len(rows) == 5
    by = {r["doc_id"]: r for r in rows if r["doc_id"]}
    assert by["1000001"]["lsn"] is None        # absurd lsn nulled
    assert by["1000002"]["n_tok"] is None      # > int32 nulled
    assert by["1000003"]["tokens"] is None     # oversized element
    assert by["1000004"]["match_score"] is None
    assert by["1000005"]["n_tok"] == 4 and by["1000005"]["match_score"] == 90


def test_salvage_unicode_linebreaks_stay_inside_lines(ray_session,
                                                      tmp_path):
    """Code-review r5: U+0085/U+2028 are legal raw inside JSON strings;
    splitlines() tore such lines into two unparseable halves. The
    sniffed-decode path now splits on newline only."""
    import json as _json

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    line = {"op": "u", "lsn": 3,
            "after": {"doc_id": "1000001", "n_tok": 1, "tokens": [1],
                      "title": "part one\x85part two part three"}}
    p = str(tmp_path / "b.jsonl")
    with open(p, "w", encoding="utf-8") as f:
        f.write(_json.dumps(line, ensure_ascii=False) + "\n")
    rows = read_jsonl_binlog(p, 0, strict=False,
                             encoding="auto").take_all()
    assert len(rows) == 1
    assert rows[0]["op"] == "update" and rows[0]["doc_id"] == "1000001"


def test_forced_codec_strips_bom(ray_session, tmp_path):
    """Code-review r5: encoding='utf-16-le' on a BOM'd file must not
    leak U+FEFF into (and deadletter) the first line."""
    import json as _json

    from marc_data_migration_ray.sources.jsonl import read_jsonl_binlog

    line = {"op": "u", "lsn": 1,
            "after": {"doc_id": "1000001", "n_tok": 1, "tokens": [1]}}
    p = str(tmp_path / "b.jsonl")
    with open(p, "w", encoding="utf-16") as f:  # BOM-prefixed LE
        f.write(_json.dumps(line) + "\n")
    rows = read_jsonl_binlog(p, 0, strict=False,
                             encoding="utf-16-le").take_all()
    assert len(rows) == 1 and rows[0]["op"] == "update"


def test_sniff_bomless_utf32_and_nul_guard():
    """Code-review r5: BOM-less UTF-32 detection, and NUL-bearing heads
    must never classify utf-8 at confidence 1.0."""
    from marc_data_migration_ray.sources.jsonl import sniff_encoding

    line = '{"op":"u","lsn":1}\n' * 40
    got = sniff_encoding(line.encode("utf-32-le"))
    assert got["encoding"] in ("utf-32-le",)
    got = sniff_encoding(line.encode("utf-32-be"))
    assert got["encoding"] == "utf-32-be"
    # arbitrary NUL-bearing bytes: never utf-8/1.0
    got = sniff_encoding(b'{"a":1}\x00\x00garbage\x00moregarbage\x00!!')
    assert not (got["encoding"] == "utf-8" and got["confidence"] == 1.0)


def test_feed_envelopes_null_images(ray_session, tmp_path):
    """Code-review r5: Debezium convention — insert has before:null,
    delete has after:null (not structs of all-null fields)."""
    import glob
    import json as _json

    from marc_data_migration_ray.sources.jsonl import write_jsonl_feed

    fix = str(tmp_path / "fx")
    fixtures.write_fixture(fix, n_rows=60, n_events=300, n_epochs=2,
                           seed=13, schema_change_frac=0.0)
    cfg = ReplayConfig(num_partitions=4)
    rp = Replayer(str(tmp_path / "t"), cfg,
                  base_path=os.path.join(fix, "base"))
    for e in range(2):
        rp.apply_epoch(e, os.path.join(fix, "binlog", f"epoch={e}"))
    feed = rp.changes_between(0, 1, with_payload=True)
    out = str(tmp_path / "feed")
    write_jsonl_feed(feed, out)
    ops_seen = set()
    for f in glob.glob(os.path.join(out, "*.jsonl")):
        for ln in open(f):
            o = _json.loads(ln)
            ops_seen.add(o["op"])
            if o["op"] == "c":
                assert o["before"] is None, o
            if o["op"] == "d":
                assert o["after"] is None, o
    assert "c" in ops_seen or "d" in ops_seen
