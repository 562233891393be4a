"""Enrichment-as-policy: the rate-limited external lookup applied INSIDE
the replay read path (fold → P13 policy chain), so folded state rows
leave the pipeline already enriched — the composition the reference
actually runs (its authority fetch happens DURING record processing,
``record_update.py:777-809``, not as a separate batch job).

Load with ``ReplayConfig(policy_plugins=
("marc_data_migration_ray.plugins.enrich_policy",))`` or
``--policy-plugin`` on the CLI. Uses the deterministic fixture service
(no network in this environment); a real site subclasses and passes its
own ``service_factory``. The per-process policy cache in
``stages/policy.py`` gives the stage the same build-once semantics an
actor pool would."""

from __future__ import annotations

import pyarrow as pa

from marc_data_migration_ray.stages.enrich import EnrichStage
from marc_data_migration_ray.stages.policy import UpdatePolicy as _Base


class UpdatePolicy(_Base):
    """Stamp ``authority`` / ``enrich_status`` / ``enrich_attempts`` on
    every folded row through the token-bucket + bounded-retry +
    dead-letter enrichment core."""

    def __init__(self):
        self._stage = EnrichStage(
            key_col="doc_id", out_col="authority",
            rate_per_sec=100_000, burst=256, max_retries=3)

    def execute_batch(self, table: pa.Table) -> pa.Table:
        return self._stage(table)
