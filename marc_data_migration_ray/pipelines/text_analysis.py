"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline ops: token counting, quality scoring,
language-ID heuristic, document fingerprinting. All are stateless
vectorized ``map_batches`` stages (reference-style per-record projections
M5-M8 widened to corpus analytics). Kernels shared with the DuckDB oracle
where SQL-expressible (see ``__ray_entry__``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.functions import text as T


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace-token count per document."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "n_tokens": T.token_counts(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): GPT-2-style BPE pre-tokenizer count."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": T.bpe_token_counts(t["text"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens, n_stop, stop_ratio, is_quality)."""

    def _q(t: pa.Table) -> pa.Table:
        cols = T.quality_columns(t["text"])
        return pa.table({"doc_id": t["doc_id"], **cols})

    return _docs(sf_dir).map_batches(_q, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang_pred): stopword-marker language-ID heuristic."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "lang_pred": T.lang_id(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fp): 64-bit FNV-1a content fingerprint (rows-only oracle —
    byte-level hashing is not SQL-expressible)."""
    return _docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "fp": T.fingerprints(t["text"])}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
