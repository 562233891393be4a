"""External-enrichment driver pipeline: every document looked up against
the (fixture) authority service through the REAL rate-limited actor-pool
stage (``stages/enrich.py`` — reference S5 / record_update.py:777-809
recast). Deterministic by construction, so the DuckDB oracle mirrors the
service arithmetic exactly (portable ``md5_number_lower`` convention)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from marc_data_migration_ray.sources import readers
from marc_data_migration_ray.stages.enrich import EnrichStage

#: fixture-service arithmetic shared with the oracle SQL
ENRICH_FAIL_MOD = 17
ENRICH_TRANSIENT_MOD = 5
#: per-actor rate (the external quota knob); high enough that the bench
#: never stalls, non-None so the token-bucket path actually executes
ENRICH_RATE_PER_SEC = 50_000
ENRICH_CONCURRENCY = 4
ENRICH_MAX_RETRIES = 3  # the reference's 3-try loop


def enrich_authority(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, authority, enrich_status, enrich_attempts) for every
    document — an ACTOR POOL (``concurrency=4``) of rate-limited service
    clients; failed lookups dead-letter in-band (status='failed', null
    authority) after the bounded retry budget."""
    docs = readers.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(
        lambda t: t.set_column(0, "doc_id",
                               pc.cast(t["doc_id"], pa.string())),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return docs.map_batches(
        EnrichStage,
        fn_constructor_kwargs={
            "key_col": "doc_id",
            "rate_per_sec": ENRICH_RATE_PER_SEC,
            "burst": 256,
            "max_retries": ENRICH_MAX_RETRIES,
        },
        concurrency=ENRICH_CONCURRENCY,
        batch_size=512,
        batch_format="pyarrow",
    )


ENRICH_AUTHORITY_SQL = (
    "WITH m AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "md5_number_lower(CAST(doc_id AS VARCHAR)) AS n FROM documents) "
    "SELECT doc_id, "
    f"CASE WHEN n % {ENRICH_FAIL_MOD} = 0 THEN NULL "
    "ELSE 'auth-' || CAST(n % 100000 AS VARCHAR) END AS authority, "
    f"CASE WHEN n % {ENRICH_FAIL_MOD} = 0 THEN 'failed' "
    "ELSE 'ok' END AS enrich_status, "
    f"CASE WHEN n % {ENRICH_FAIL_MOD} = 0 THEN {ENRICH_MAX_RETRIES} "
    f"WHEN n % {ENRICH_TRANSIENT_MOD} = 0 THEN 2 "
    "ELSE 1 END AS enrich_attempts "
    "FROM m ORDER BY doc_id"
)
