"""The CDC near-dup queries verify on WORKERS, not the driver.

VERDICT r3 item 1: ``cdc_near_dup_index`` / ``cdc_near_dup_probe`` /
``cdc_ingest_dedup_gate`` previously pulled candidate token payloads to
the driver (``lookup(...).take_all()`` into a dict) and verified with a
per-pair Python Jaccard loop. The distributed path hash-co-locates pairs
with their key-filtered state payloads and verifies in ``map_batches``.

Spy protocol (same idea as the as-of lookup spy in test_doc_history):
wrap ``derived._token_shingles`` with a call recorder bound to a
DRIVER-local list. Cloudpickle ships the wrapper (closure globals go by
value) so workers still verify correctly, but their appends land in
worker-local copies — only a DRIVER-side verification call can make the
driver's list non-empty.

ADVICE r3 item 1 (recall diagnosis): every BRUTE-FORCE ≥0.8 pair over
the fixture must be LSH-reachable through the index's candidate
generation, so an equality failure in the oracle gate can never be a
silent banding recall miss.
"""

import pyarrow as pa
import pytest

from marc_data_migration_ray.pipelines import derived

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("query", [
    derived.cdc_near_dup_index,
    derived.cdc_near_dup_probe,
    derived.cdc_ingest_dedup_gate,
])
def test_verify_never_runs_on_driver(ray_session, monkeypatch, query):
    want = query(SF)  # unpatched reference run (memoized table layout)
    calls: list = []
    orig = derived._token_shingles

    def _spy(tk):
        calls.append(True)
        return orig(tk)

    monkeypatch.setattr(derived, "_token_shingles", _spy)
    got = query(SF)
    monkeypatch.undo()
    assert got.equals(want)
    assert calls == [], "verification loop ran in the driver process"


def test_oracle_pairs_are_lsh_reachable(ray_session):
    """Brute-force all-pairs shingle-Jaccard ≥ 0.8 over the tokenized
    corpus (with the planted doc-'0'←doc-'1' update) ⊆ index candidate
    pairs — the banding (16×4 at J=0.8 ⇒ ~0.9998/pair) plus the planted
    fixture must leave ZERO unreachable true pairs, or the driver gate
    would mis-diagnose a recall miss as a value mismatch."""
    rp, view = derived._ensure_mh_view(SF, None)
    toks = {r["doc_id"]: list(r["tokens"] or [])
            for r in rp.read_state(columns=["doc_id", "tokens"]).take_all()}
    sh = {d: derived._token_shingles(tk) for d, tk in toks.items()}
    true_pairs = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        sa = sh[a]
        if not sa:
            continue
        for b in ids[i + 1:]:
            sb = sh[b]
            if not sb:
                continue
            union = sa | sb
            if union and len(sa & sb) / len(union) >= derived.NEAR_DUP_JACCARD:
                true_pairs.add((min(a, b), max(a, b)))
    cands = {(r["doc_a"], r["doc_b"])
             for r in view.candidate_pairs_ds().take_all()}
    missing = true_pairs - cands
    assert not missing, f"LSH-unreachable true pairs: {sorted(missing)}"
    assert true_pairs, "fixture must plant at least one true pair"


def test_gate_equals_probe_composition(ray_session):
    """cdc_ingest_dedup_gate's distributed path (truncate → batch probe →
    attach → verify) agrees with a scalar recomputation from state."""
    got = derived.cdc_ingest_dedup_gate(SF)
    rp, view = derived._ensure_mh_view(SF, None)
    D = derived._doc_count(SF)
    ids = [str(i) for i in range(derived.INGEST_GATE_RESIDUE, D,
                                 derived.INGEST_GATE_MOD)]
    state = {r["doc_id"]: list(r["tokens"] or [])
             for r in rp.lookup(ids, columns=["doc_id", "tokens"]).take_all()}
    ordered = [k for k in ids if k in state]
    incoming = {k: state[k][:-1] for k in ordered}
    cand_sets = view.candidates_for_tokens([incoming[k] for k in ordered])
    all_c = sorted(set().union(*cand_sets)) if cand_sets else []
    ctoks = {r["doc_id"]: list(r["tokens"] or []) for r in rp.lookup(
        all_c, columns=["doc_id", "tokens"]).take_all()} if all_c else {}
    rows = []
    for k, cands in zip(ordered, cand_sets):
        si = derived._token_shingles(incoming[k])
        for m in sorted(cands):
            sm = derived._token_shingles(ctoks.get(m))
            union = si | sm
            j = len(si & sm) / len(union) if union else 0.0
            if j >= derived.NEAR_DUP_JACCARD:
                rows.append((k, m, j))
    want = pa.table({
        "incoming_id": pa.array([r[0] for r in rows], pa.string()),
        "dup_of": pa.array([r[1] for r in rows], pa.string()),
        "jaccard": pa.array([r[2] for r in rows], pa.float64()),
    }).sort_by([("incoming_id", "ascending"), ("dup_of", "ascending")])
    assert got.equals(want)


def test_near_dup_gate_dedupes_multi_event_probes(ray_session):
    """ADVICE r4 item 2: a doc_id with several events in one epoch must
    probe as ONE row (latest lsn wins) — duplicate probes used to fan
    out the token attach into duplicate/conflicting pair rows."""
    import ray.data

    rp, view = derived._ensure_mh_view(SF, None)
    src = next(r for r in rp.read_state(
        columns=["doc_id", "tokens"]).take_all()
        if r["tokens"] is not None and len(r["tokens"]) >= 8)
    copy_toks = list(src["tokens"])
    junk_toks = list(range(900_000, 900_012))

    def gate(rows):
        inc = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "tokens": pa.array([r[1] for r in rows],
                               derived._TOK_LIST_T),
            "lsn": pa.array([r[2] for r in rows], pa.int64()),
        }))
        t = derived.near_dup_gate(rp, view, inc)
        return [(x["incoming_id"], x["dup_of"]) for x in t.to_pylist()]

    # later event (higher lsn) is the copy -> exactly one clean pair
    got = gate([("zz-new", junk_toks, 1), ("zz-new", copy_toks, 2)])
    assert got == [("zz-new", src["doc_id"])]
    # later event is junk -> the earlier near-dup payload must NOT probe
    got = gate([("zz-new", copy_toks, 1), ("zz-new", junk_toks, 2)])
    assert got == []
    # no lsn column + conflicting payloads is ambiguous -> hard error
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["zz-new", "zz-new"], pa.string()),
        "tokens": pa.array([junk_toks, copy_toks], derived._TOK_LIST_T),
    }))
    with pytest.raises(Exception, match="conflicting probe payloads"):
        derived.near_dup_gate(rp, view, inc)
    # no lsn column + agreeing payloads dedupes silently
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["zz-new", "zz-new"], pa.string()),
        "tokens": pa.array([copy_toks, copy_toks], derived._TOK_LIST_T),
    }))
    t = derived.near_dup_gate(rp, view, inc)
    assert [(x["incoming_id"], x["dup_of"]) for x in t.to_pylist()] == \
        [("zz-new", src["doc_id"])]
