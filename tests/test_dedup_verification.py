"""Independent verification for the approximate dedup / ANN operators
(VERDICT r1 item #2: no query may be oracle-blind AND unverified).

Planted-near-dup fixtures with known ground truth, brute-force Python
oracles, and recall/precision assertions for every approximate path:
minhash, simhash, embedding LSH, ANN LSH/IVF, plus a scalar FNV check for
the fingerprint kernel.
"""

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marc_data_migration_ray.pipelines import dedup, similarity
from marc_data_migration_ray.pipelines.dedup import exact_jaccard, hash_str64

SEED = 1234


# ------------------------------------------------------------ fixtures --
@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """documents.parquet with known near-dup structure:
    ids 0..59 random 60-word docs; 100+i = near-dup of i (1 word changed,
    j ≈ 0.9) for i < 5; 200+i = exact dup of i for i < 3."""
    rng = np.random.default_rng(SEED)
    vocab = [f"w{j}" for j in range(800)]
    texts, ids = [], []
    base = []
    for i in range(60):
        words = [vocab[k] for k in rng.integers(0, len(vocab), 60)]
        base.append(words)
        ids.append(i)
        texts.append(" ".join(words))
    for i in range(5):
        words = list(base[i])
        words[30] = "CHANGED"
        ids.append(100 + i)
        texts.append(" ".join(words))
    for i in range(3):
        ids.append(200 + i)
        texts.append(" ".join(base[i]))
    root = str(tmp_path_factory.mktemp("planted_docs"))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
        os.path.join(root, "documents.parquet"),
    )
    return root, dict(zip(ids, texts))


@pytest.fixture(scope="module")
def planted_embeddings(tmp_path_factory):
    """embeddings.parquet: 100 random unit vectors (dim 16) + 8 planted
    near-dups (cos ≈ 0.99) with ids 1000+i."""
    rng = np.random.default_rng(SEED)
    emb = rng.standard_normal((100, 16))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = list(range(100))
    rows = [emb]
    for i in range(8):
        v = emb[i] + 0.05 * rng.standard_normal(16)
        rows.append((v / np.linalg.norm(v))[None, :])
        ids.append(1000 + i)
    allv = np.concatenate(rows).astype(np.float32)
    root = str(tmp_path_factory.mktemp("planted_emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in allv],
                                      pa.list_(pa.float32())),
            }
        ),
        os.path.join(root, "embeddings.parquet"),
    )
    return root, np.array(ids), allv.astype(np.float64)


def _brute_jaccard_pairs(texts: dict, threshold: float) -> set:
    ids = sorted(texts)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if exact_jaccard(texts[a], texts[b]) >= threshold:
                out.add((a, b))
    return out


# ---------------------------------------------------------------- tests --
def test_minhash_recall_and_precision(ray_session, planted_docs):
    root, texts = planted_docs
    want = _brute_jaccard_pairs(texts, 0.8)
    assert len(want) >= 8  # 5 near-dups + 3 exact dups planted
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash(root, 0.8).take_all()
    }
    assert got == want  # exact verify stage ⇒ precision 1; banding ⇒ recall 1 here


def test_minhash_verify_paths_agree(ray_session, planted_docs, monkeypatch):
    """The adaptive verify (broadcast candidate texts under the budget,
    two-sided hash-attach over it) yields identical DISTINCT pairs on
    both paths — and the pair artifact's three consumers (dedup_minhash,
    dedup_clusters, dedup_keep_best) agree across paths (VERDICT r3
    item 2 regression harness)."""
    root, texts = planted_docs
    want = _brute_jaccard_pairs(texts, 0.8)

    def run_all():
        dedup._MINHASH_MEMO.clear()
        pairs = dedup._dedup_minhash_build(root, 0.8, 256).materialize()
        clusters = sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.dedup_clusters(root).take_all())
        keep = sorted(
            (r["cluster_id"], r["keep_doc_id"], r["n_members"])
            for r in dedup.dedup_keep_best(root).take_all())
        dedup._MINHASH_MEMO.clear()
        return pairs, clusters, keep

    bc_pairs, bc_clusters, bc_keep = run_all()  # broadcast (fixture scale)
    monkeypatch.setattr(dedup, "_BROADCAST_TEXT_BYTES", 0)
    ex_pairs, ex_clusters, ex_keep = run_all()  # forced exchange path
    got_bc = {(r["doc_a"], r["doc_b"]) for r in bc_pairs.take_all()}
    got_ex = {(r["doc_a"], r["doc_b"]) for r in ex_pairs.take_all()}
    assert got_bc == got_ex == want
    # row-level: band-duplicated candidates never reach the output twice
    assert bc_pairs.count() == len(got_bc)
    assert ex_pairs.count() == len(got_ex)
    assert bc_clusters == ex_clusters
    assert bc_keep == ex_keep


def test_minhash_bucket_cap_reports_drops(ray_session, planted_docs, caplog):
    root, _ = planted_docs
    with caplog.at_level("WARNING", logger="marc_data_migration_ray.pipelines.dedup"):
        dedup.candidate_pairs_minhash(root, bucket_cap=2).materialize()
    assert any("skipped by bucket_cap" in r.message for r in caplog.records)


def _scalar_simhash(text: str) -> int:
    import hashlib

    words = re.split(r"\s+", text)
    if not words:
        return 0
    counts = np.zeros(64, np.int64)
    for w in words:
        # the portable md5 word hash (== DuckDB md5_number_lower)
        h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
        for b in range(64):
            counts[b] += (h >> b) & 1
    v = counts * 2 - len(words)
    sim = 0
    for b in range(64):
        if v[b] > 0:
            sim |= 1 << b
    return sim


def test_simhash_finds_planted_and_verifies_hamming(ray_session, planted_docs):
    root, texts = planted_docs
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dedup.dedup_simhash(root).take_all()}
    # exact dups must be found at hamming 0
    for i in range(3):
        assert got.get((i, 200 + i)) == 0, (i, got)
    # every reported pair's hamming verified against the scalar mirror
    for (a, b), h in got.items():
        hs = bin(_scalar_simhash(texts[a]) ^ _scalar_simhash(texts[b])).count("1")
        assert hs == h and h <= 3, (a, b, h, hs)


def test_embedding_near_dup_exact_vs_brute(ray_session, planted_embeddings):
    root, ids, emb = planted_embeddings
    n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = n @ n.T
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and sims[i, j] >= 0.9:
                want.add((ids[i], ids[j]))
    assert len(want) >= 8
    got = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup(root, threshold=0.9).take_all()
    }
    assert got == want


def test_embedding_lsh_recall(ray_session, planted_embeddings):
    root, ids, emb = planted_embeddings
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup(root, threshold=0.9).take_all()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup_lsh(root, threshold=0.9).take_all()
    }
    assert approx <= exact  # within-bucket check is exact ⇒ precision 1
    assert len(approx & exact) / len(exact) >= 0.8  # multi-table recall


@pytest.mark.parametrize("variant", ["lsh", "ivf", "pq"])
def test_ann_approximate_recall(ray_session, variant):
    sf = "/root/testdata/sf0.001"
    exact = similarity.ann_topk(sf)
    approx = {"lsh": similarity.ann_topk_lsh, "ivf": similarity.ann_topk_ivf,
              "pq": similarity.ann_topk_pq}[variant](sf)

    def to_set(t):
        return set(zip(t["query_id"].to_pylist(), t["vec_id"].to_pylist()))

    se, sa = to_set(exact), to_set(approx)
    recall = len(se & sa) / len(se)
    assert recall >= 0.6, recall  # measured ≈0.8 for both variants


def test_fingerprint_matches_scalar_fnv(ray_session):
    from marc_data_migration_ray.functions.text import fingerprints

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    texts = t["text"].to_pylist()[:50]
    got = fingerprints(pa.array(texts)).to_pylist()
    want = [np.uint64(hash_str64(s)).astype(np.int64).item() for s in texts]
    assert got == want


def test_connected_components_chain_and_island(ray_session):
    """Min-label propagation over a 12-node chain (needs many rounds) plus
    a disjoint pair: every chain node labels to the chain minimum."""
    import pyarrow as pa
    import ray.data

    from marc_data_migration_ray.pipelines.dedup import connected_components

    a = list(range(11)) + [100]
    b = list(range(1, 12)) + [101]
    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(edges).take_all()}
    assert got == {**{i: 0 for i in range(12)}, 100: 100, 101: 100}


def test_connected_components_random_graph_vs_union_find(ray_session):
    """Distributed CC equals a scalar union-find on a seeded random graph
    (mixed component sizes, self-contained islands, a few cliques)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from marc_data_migration_ray.pipelines.dedup import connected_components

    rng = np.random.default_rng(4242)
    nodes = rng.choice(5000, size=120, replace=False)
    a = nodes[rng.integers(0, len(nodes), size=90)]
    b = nodes[rng.integers(0, len(nodes), size=90)]
    keep = a != b
    a, b = a[keep], b[keep]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for x, y in zip(a.tolist(), b.tolist()):
        union(x, y)
    want = {x: find(x) for x in set(a.tolist()) | set(b.tolist())}
    # path-compress to final roots
    want = {x: find(x) for x in want}

    edges = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(edges).take_all()}
    assert got == want


def test_block_dedup_keep_first_and_full_dup_drop(ray_session, tmp_path):
    """Planted block-level dups: a shared 8-word boilerplate block is kept
    only in the earliest (doc_id, block_idx) position; an exact full-dup
    doc loses every block and disappears; unique text is untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from marc_data_migration_ray.pipelines import dedup

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    u = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = {
        0: boiler + " " + u("a", 8),        # first occurrence of boiler
        1: u("c", 8) + " " + boiler,        # later occurrence -> dropped
        2: boiler + " " + u("a", 8),        # exact dup of doc 0 -> vanishes
        3: u("d", 10),                       # unique, 2 blocks (8 + 2 words)
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[k] for k in sorted(docs)], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in dedup.block_dedup(str(tmp_path)).take_all()}
    assert set(rows) == {0, 1, 3}            # doc 2 fully deduplicated away
    assert rows[0]["n_blocks"] == 2 and rows[0]["n_kept"] == 2
    assert rows[0]["cleaned_text"] == docs[0]
    assert rows[1]["n_blocks"] == 2 and rows[1]["n_kept"] == 1
    assert rows[1]["cleaned_text"] == u("c", 8)   # boiler block stripped
    assert rows[3]["n_kept"] == 2 and rows[3]["cleaned_text"] == docs[3]


# ------------------------------------------------- exact substring spans --
def _scalar_substring_spans(texts: dict, L: int) -> dict:
    """Brute-force mirror of exact_substring_spans: window dict → positions
    with count ≥2 → per-doc island merge (starts within L merge)."""
    from collections import defaultdict

    words = {d: re.findall(r"\S+", t) for d, t in texts.items()}
    occ = defaultdict(list)
    for d, ws in words.items():
        for s in range(len(ws) - L + 1):
            occ[" ".join(ws[s : s + L])].append((d, s))
    dup_starts = defaultdict(list)
    for ps in occ.values():
        if len(ps) >= 2:
            for d, s in ps:
                dup_starts[d].append(s)
    out = {}
    for d, ss in dup_starts.items():
        ss.sort()
        islands = [[ss[0], ss[0]]]
        for s in ss[1:]:
            if s - islands[-1][1] <= L:
                islands[-1][1] = s
            else:
                islands.append([s, s])
        dup_words = sum(s1 + L - s0 for s0, s1 in islands)
        out[d] = (len(islands), dup_words, len(words[d]))
    return out


def test_exact_substring_spans_planted(ray_session, tmp_path):
    """Planted duplicated spans with known geometry: a 30-word span shared
    by two docs (one merged island each), a within-doc periodic repeat, a
    clean doc (absent), two same-doc occurrences separated by exactly L
    unique words (two islands), and adjacent occurrences (one island)."""
    L = dedup.SPAN_WORDS  # 12
    c = iter(range(10_000))
    u = lambda n: " ".join(f"u{next(c)}" for _ in range(n))
    shared = " ".join(f"S{k}" for k in range(30))
    rep = " ".join(f"A{k}" for k in range(15))
    blk = " ".join(f"R{k}" for k in range(L))
    docs = {
        0: u(20) + " " + shared + " " + u(10),
        1: u(5) + " " + shared + " " + u(15),
        2: rep + " " + rep,                     # periodic within-doc repeat
        3: u(40),                               # clean
        4: blk + " " + u(L) + " " + blk,        # gap L ⇒ 2 islands (ids 0, 2L)
        5: blk + " " + blk,                     # adjacent ⇒ 1 merged island
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[k] for k in sorted(docs)], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["dup_spans"], r["dup_words"], r["total_words"])
        for r in dedup.exact_substring_spans(str(tmp_path)).take_all()
    }
    want = _scalar_substring_spans(docs, L)
    assert got == want
    assert 3 not in got
    assert got[0] == (1, 30, 60) and got[1] == (1, 30, 50)
    assert got[4] == (2, 2 * L, 3 * L)   # starts 0 and 2L: gap 2L > L
    assert got[5] == (1, 2 * L, 2 * L)   # starts 0 and L: gap L merges


def test_dedup_keep_best_longest_wins(ray_session, tmp_path):
    """Planted cluster: three near-dup docs where the LONGEST member (not
    the smallest id) must be the survivor; ties on length → smallest id."""
    base = " ".join(f"k{i}" for i in range(40))
    tie = " ".join(f"t{i}" for i in range(40))
    docs = {
        3: base,                          # min id but SHORTEST — must lose
        7: base + " extra1",              # middle
        9: base + " extra1 extra2",       # longest → survivor
        50: tie + " a1 b2",               # tie cluster: same length as 60
        60: tie + " a1 c3",               # → smaller id (50) wins the tie
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[k] for k in sorted(docs)], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["cluster_id"]: r for r in dedup.dedup_keep_best(str(tmp_path)).take_all()}
    assert sorted(rows) == [3, 50]        # clusters labeled by min member id
    assert rows[3]["keep_doc_id"] == 9    # longest member wins, not min id
    assert rows[3]["n_members"] == 3 and rows[3]["max_tokens"] == 42
    assert rows[50]["keep_doc_id"] == 50  # equal length → smaller id
    assert rows[50]["n_members"] == 2 and rows[50]["max_tokens"] == 42


def test_exact_substring_scrub_planted(ray_session, tmp_path):
    """Removal semantics: covered words vanish, survivors keep order; a
    fully-duplicated doc disappears; a clean doc passes through intact."""
    L = dedup.SPAN_WORDS
    c = iter(range(10_000))
    u = lambda n: " ".join(f"u{next(c)}" for _ in range(n))
    shared = " ".join(f"S{k}" for k in range(2 * L))
    pre0, post0 = u(5), u(7)
    pre1 = u(9)
    clean = u(20)
    docs = {
        0: pre0 + " " + shared + " " + post0,   # middle scrubbed
        1: pre1 + " " + shared,                 # suffix scrubbed
        2: shared,                              # fully duplicated → vanishes
        3: clean,                               # untouched
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[k] for k in sorted(docs)], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in dedup.exact_substring_scrub(str(tmp_path)).take_all()}
    assert set(rows) == {0, 1, 3}
    assert rows[0]["cleaned_text"] == pre0 + " " + post0
    assert rows[0]["n_words"] == 5 + 2 * L + 7 and rows[0]["kept_words"] == 12
    assert rows[1]["cleaned_text"] == pre1 and rows[1]["kept_words"] == 9
    assert rows[3]["cleaned_text"] == clean and rows[3]["kept_words"] == 20


def test_ann_topk_per_source_no_driver_corpus_scan(ray_session, monkeypatch):
    """VERDICT r4 item 1: the source→code mapping must come from a
    distributed set-union aggregate, not a driver-side duckdb DISTINCT
    scan of the corpus. Spy: any driver-side duckdb.connect during the
    query is a regression (workers never unpickle this patch)."""
    import duckdb

    calls: list = []
    orig = duckdb.connect

    def _spy(*a, **kw):
        calls.append(True)
        return orig(*a, **kw)

    monkeypatch.setattr(duckdb, "connect", _spy)
    got = similarity.ann_topk_per_source("/root/testdata/sf0.001")
    monkeypatch.undo()
    assert calls == [], "driver-side duckdb scan in ann_topk_per_source"
    # sanity: one best row per (query, source); full value equality is
    # enforced by the oracle harness in test_queries_vs_duckdb.
    n_src = duckdb.connect().execute(
        "SELECT count(DISTINCT source) FROM "
        "'/root/testdata/sf0.001/documents.parquet'").fetchone()[0]
    assert got.num_rows == 3 * n_src
