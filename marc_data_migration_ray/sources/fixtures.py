"""Deterministic synthetic fixtures: base table + binlog (FIXTURES.md).

Everything is seeded numpy — no wall clock, no external data. Shapes follow
``BASELINE.json`` ``input_hint`` exactly. Key noise exercises the reference
normalization quirks (M1–M3); hot keys exercise skew handling; malformed
rows exercise the dead-letter route (S7/M11).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOURCES = np.array(["web", "books", "code", "wiki"], dtype=object)

_TITLE_WORDS = (
    "annual report history of modern art library science data journal "
    "studies early western color maps atlas field guide music theory"
).split()


def _title_pool(seed: int, size: int = 64):
    """Precomputed (title, match_title, ratio) pool: ratios are DERIVED from
    the title pair via token_sort_ratio once per pool entry (content-driven
    reference M13), then assigned to events vectorized — no per-event
    SequenceMatcher in the generator hot loop."""
    from marc_data_migration_ray.functions.fuzzy import token_sort_ratio

    rng = np.random.default_rng(seed ^ 0x7175E)
    pool = []
    for _ in range(size):
        k = rng.integers(3, 7)
        words = [_TITLE_WORDS[j] for j in rng.integers(0, len(_TITLE_WORDS), k)]
        title = " ".join(words)
        kind = rng.integers(0, 5)
        if kind == 0:  # identical
            match = title
        elif kind == 1:  # shuffled (token_sort_ratio == 100)
            match = " ".join(rng.permutation(words))
        elif kind == 2:  # one word changed
            w2 = list(words)
            w2[int(rng.integers(0, len(w2)))] = "variant"
            match = " ".join(w2)
        elif kind == 3:  # truncated
            match = " ".join(words[: max(1, k // 2)])
        else:  # unrelated
            match = " ".join(
                [_TITLE_WORDS[j] for j in rng.integers(0, len(_TITLE_WORDS), k)][::-1]
            ) + " unrelated entirely"
        pool.append((title, match, token_sort_ratio(title, match)))
    return pool

#: raw-key noise forms; every form normalizes back to the canonical digits.
_NOISE_FORMS = (
    "{k}",
    "(OCoLC){k}",
    "(ocolc)ocm{k}",
    "ocn{k}",
    "ON{k}",
    "{k} 99",
    "  (OCoLC)on{k}  ",
)


def _noisy_keys(rng: np.random.Generator, canon: np.ndarray, noise_frac: float) -> np.ndarray:
    """Wrap a fraction of canonical digit-string keys in reference-style noise."""
    out = canon.astype(object).copy()
    noisy = rng.random(len(canon)) < noise_frac
    forms = rng.integers(1, len(_NOISE_FORMS), size=len(canon))
    for i in np.nonzero(noisy)[0]:
        out[i] = _NOISE_FORMS[forms[i]].format(k=canon[i])
    return out


def _token_arrays(rng: np.random.Generator, n: int, mean_len: int = 64) -> tuple[list, np.ndarray]:
    """Skewed-length int32 token arrays (p50 ≈ mean_len, long tail)."""
    lens = np.minimum(
        (rng.lognormal(mean=np.log(mean_len), sigma=0.8, size=n)).astype(np.int64) + 1,
        16 * mean_len,
    )
    flat = rng.integers(0, 50257, size=int(lens.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(n)]
    return tokens, lens.astype(np.int32)


def make_base_table(
    n_rows: int = 1000,
    seed: int = 7,
    noise_frac: float = 0.15,
    dup_frac: float = 0.02,
    mean_tokens: int = 64,
) -> pa.Table:
    """Base lake table (input_hint shape). A ``dup_frac`` of rows repeat an
    earlier normalized key (exercises base dedup, reference R1/J2)."""
    rng = np.random.default_rng(seed)
    canon = np.array([str(1_000_000 + i) for i in range(n_rows)], dtype=object)
    ndup = int(n_rows * dup_frac)
    if ndup:
        dup_pos = rng.choice(n_rows, size=ndup, replace=False)
        dup_src = rng.integers(0, n_rows, size=ndup)
        canon[dup_pos] = canon[dup_src]
    raw = _noisy_keys(rng, canon, noise_frac)
    tokens, n_tok = _token_arrays(rng, n_rows, mean_tokens)
    source = SOURCES[rng.integers(0, len(SOURCES), size=n_rows)]
    return pa.table(
        {
            "doc_id": pa.array(raw, pa.string()),
            "tokens": pa.array(tokens, pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(source, pa.string()),
        }
    )


def make_binlog(
    n_events: int = 5000,
    n_base_rows: int = 1000,
    seed: int = 11,
    n_epochs: int = 4,
    noise_frac: float = 0.15,
    hot_keys: int = 5,
    hot_frac: float = 0.2,
    malformed_frac: float = 0.005,
    invalid_key_frac: float = 0.02,
    schema_change_frac: float = 0.004,
    mean_tokens: int = 64,
    with_drops: bool = False,
) -> pa.Table:
    """Synthetic change-event binlog over a ``make_base_table`` key space.

    Op mix ≈ 20% insert / 60% update / 20% delete + rare schema changes;
    ``hot_keys`` canonical keys receive ``hot_frac`` of all key-addressed
    events (skew); ``malformed_frac`` rows are dead-letter bait;
    ``invalid_key_frac`` rows carry non-normalizable keys.
    """
    rng = np.random.default_rng(seed)
    n = n_events
    lsn = np.arange(1, n + 1, dtype=np.int64)
    epoch = (np.arange(n) * n_epochs // n).astype(np.int32)

    r = rng.random(n)
    op = np.where(
        r < schema_change_frac,
        "schema_change",
        np.where(r < schema_change_frac + 0.2, "insert",
                 np.where(r < schema_change_frac + 0.8, "update", "delete")),
    ).astype(object)

    # key targeting: existing base keys (80%) vs new keys (20%); hot-key overlay
    existing = rng.random(n) < 0.8
    base_ids = rng.integers(0, n_base_rows, size=n)
    new_ids = rng.integers(n_base_rows, n_base_rows * 2, size=n)
    kid = np.where(existing, base_ids, new_ids)
    hot = rng.random(n) < hot_frac
    kid[hot] = rng.integers(0, max(hot_keys, 1), size=int(hot.sum()))
    canon = np.array([str(1_000_000 + k) for k in kid], dtype=object)
    raw = _noisy_keys(rng, canon, noise_frac)

    # invalid (non-normalizable) keys
    invalid = rng.random(n) < invalid_key_frac
    for i in np.nonzero(invalid)[0]:
        raw[i] = f"badkey{kid[i]}x"

    tokens, n_tok = _token_arrays(rng, n, mean_tokens)
    tokens = [t for t in tokens]  # list of np arrays
    n_tok = n_tok.astype(object)
    source = SOURCES[rng.integers(0, len(SOURCES), size=n)].astype(object)

    # schema ops assigned FIRST (masks must reference as-of-lsn names)
    from marc_data_migration_ray.state.schema_timeline import Timeline

    schema_kind = np.full(n, None, dtype=object)
    schema_name = np.full(n, None, dtype=object)
    schema_new = np.full(n, None, dtype=object)
    sc_idx = np.nonzero(op == "schema_change")[0]
    if not with_drops:
        for j, i in enumerate(sc_idx):
            if j % 2 == 0:
                schema_kind[i] = "add_column"
                schema_name[i] = f"extra_{j // 2}"
            else:
                schema_kind[i] = "rename_column"
                schema_name[i] = "source" if j % 4 == 1 else f"extra_{j // 2 - (j // 2 and 1)}"
                schema_new[i] = f"renamed_{j // 2}"
    else:
        # add / rename / drop cycle over a running timeline so every drop
        # names a then-live added column by its then-visible name
        ops_so_far: list[dict] = []
        for j, i in enumerate(sc_idx):
            ln = int(lsn[i])
            tl_now = Timeline(ops_so_far)
            live = tl_now.live_added()
            if j % 3 == 0 or not live:
                schema_kind[i] = "add_column"
                schema_name[i] = f"extra_{j}"
            elif j % 3 == 1:
                schema_kind[i] = "rename_column"
                schema_name[i] = tl_now.name_at(live[-1], ln)
                schema_new[i] = f"renamed_{j}"
            else:
                schema_kind[i] = "drop_column"
                schema_name[i] = tl_now.name_at(live[0], ln)
            ops_so_far.append(
                {"lsn": ln, "kind": schema_kind[i], "name": schema_name[i],
                 "new_name": schema_new[i]}
            )

    tl = Timeline(
        [
            {"lsn": int(lsn[i]), "kind": schema_kind[i], "name": schema_name[i],
             "new_name": schema_new[i]}
            for i in sc_idx
        ]
    )

    # payload applicability: deletes/schema carry no payload; update masks
    # use the column names VISIBLE at the event's lsn (mid-stream DDL), and
    # a fraction of updates write a DDL-added column via extra_json
    mask_choice = rng.random(n)
    masks: list = []
    extra_json: list = []
    for i in range(n):
        ex = None
        if op[i] == "update":
            L = int(lsn[i])
            live_added = [c for c in tl.added if tl.name_at(c, L) is not None]
            if mask_choice[i] < 0.55:
                masks.append([tl.name_at("tokens", L), tl.name_at("n_tok", L)])
            elif mask_choice[i] < 0.72:
                masks.append([tl.name_at("source", L)])
            elif mask_choice[i] < 0.85 and live_added:
                c = live_added[i % len(live_added)]
                name = tl.name_at(c, L)
                masks.append([name])
                # non-ASCII value: pins that every serializer in the
                # engine (polars json_encode on the fold path, json.dumps
                # on the as-of sweep) emits raw UTF-8, not \uXXXX
                ex = '{"%s":"v%d é€"}' % (name, L)
            else:
                masks.append([])  # full row
        else:
            masks.append([])
        extra_json.append(ex)
    tokens_col: list = []
    for i in range(n):
        if op[i] in ("delete", "schema_change"):
            tokens_col.append(None)
            n_tok[i] = None
            source[i] = None
        elif op[i] == "update" and extra_json[i] is not None:
            # added-column-only update: no base payload
            tokens_col.append(None)
            n_tok[i] = None
            source[i] = None
        elif op[i] == "update" and len(masks[i]) == 1 and masks[i][0] is not None \
                and tl.name_at("source", int(lsn[i])) == masks[i][0]:
            tokens_col.append(None)
            n_tok[i] = None
        else:
            tokens_col.append(tokens[i])

    # titles + match scores (reference M5/M6/M13): updates draw a
    # (title, match_title, ratio) triple from the precomputed pool, so the
    # score is content-derived (ratio == token_sort_ratio(title, match))
    # while assignment stays vectorized; other ops carry no titles.
    pool = _title_pool(seed)
    pidx = rng.integers(0, len(pool), size=n)
    pool_t = np.array([p[0] for p in pool], dtype=object)
    pool_m = np.array([p[1] for p in pool], dtype=object)
    pool_r = np.array([p[2] for p in pool], dtype=np.int32)
    is_upd = op == "update"
    title = np.where(is_upd, pool_t[pidx], None)
    match_title = np.where(is_upd, pool_m[pidx], None)
    score = np.where(is_upd, pool_r[pidx], 0).astype(np.int32)

    # DDL events carry no key
    for i in sc_idx:
        raw[i] = None

    # malformed bait: null doc_id / negative n_tok / inconsistent n_tok
    bad = np.nonzero((rng.random(n) < malformed_frac) & (op != "schema_change"))[0]
    for j, i in enumerate(bad):
        kind = j % 3
        if kind == 0:
            raw[i] = None
        elif kind == 1:
            n_tok[i] = -1
        else:
            if tokens_col[i] is not None:
                n_tok[i] = int(len(tokens_col[i])) + 1
            else:
                raw[i] = None

    return pa.table(
        {
            "lsn": pa.array(lsn, pa.int64()),
            "epoch": pa.array(epoch, pa.int32()),
            "op": pa.array(op, pa.string()),
            "doc_id": pa.array(raw, pa.string()),
            "tokens": pa.array(tokens_col, pa.list_(pa.int32())),
            "n_tok": pa.array(list(n_tok), pa.int32()),
            "source": pa.array(list(source), pa.string()),
            "column_mask": pa.array(masks, pa.list_(pa.string())),
            "match_score": pa.array(score, pa.int32()),
            "title": pa.array(list(title), pa.string()),
            "match_title": pa.array(list(match_title), pa.string()),
            "extra_json": pa.array(extra_json, pa.string()),
            "schema_kind": pa.array(schema_kind, pa.string()),
            "schema_name": pa.array(schema_name, pa.string()),
            "schema_new_name": pa.array(schema_new, pa.string()),
        }
    )


def write_fixture(
    root: str,
    n_rows: int = 1000,
    n_events: int = 5000,
    n_epochs: int = 4,
    seed: int = 7,
    rows_per_file: int = 100_000,
    **binlog_kw,
) -> dict:
    """Write ``root/base/*.parquet`` + ``root/binlog/epoch=<e>/*.parquet``.

    Returns a small manifest dict of what was written. Layout is one
    directory per epoch so replay can tail epochs independently (resumable
    input sharding, SURVEY §4.2).
    """
    base = make_base_table(n_rows=n_rows, seed=seed)
    binlog = make_binlog(
        n_events=n_events, n_base_rows=n_rows, seed=seed + 4, n_epochs=n_epochs,
        **binlog_kw,
    )
    base_dir = os.path.join(root, "base")
    os.makedirs(base_dir, exist_ok=True)
    for i in range(0, base.num_rows, rows_per_file):
        pq.write_table(base.slice(i, rows_per_file), os.path.join(base_dir, f"part-{i // rows_per_file:05d}.parquet"))
    epochs = []
    import pyarrow.compute as pc

    for e in range(n_epochs):
        t = binlog.filter(pc.equal(binlog["epoch"], e))
        d = os.path.join(root, "binlog", f"epoch={e}")
        os.makedirs(d, exist_ok=True)
        for i in range(0, t.num_rows, rows_per_file):
            pq.write_table(t.slice(i, rows_per_file), os.path.join(d, f"part-{i // rows_per_file:05d}.parquet"))
        epochs.append({"epoch": e, "rows": t.num_rows, "dir": d})
    return {"base_rows": base.num_rows, "binlog_rows": binlog.num_rows, "epochs": epochs}
