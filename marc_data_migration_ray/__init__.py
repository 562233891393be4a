"""Ray-Data-native CDC / incremental-ingest engine.

Recasts the batch MARC migration semantics of
``hatfieldlibrary/marc_data_migration`` (keyed authority lookup, fuzzy-match
gated field replacement, schema-evolving upserts, deterministic multi-way
routing, audit logs and counters — see SURVEY.md) as a change-log replay
problem over Parquet tables of pre-tokenized training sequences:

    base table : doc_id:string, tokens:list<int32>, n_tok:int32, source:string
    binlog     : (lsn, epoch, op in {insert,update,delete,schema_change},
                  doc_id, tokens?, n_tok?, source?, column_mask, match_score,
                  schema_kind?, schema_name?, schema_new_name?)

Execution is idiomatic Ray Data: ``read_parquet`` → ``map_batches`` over
zero-copy Arrow batches → hash-partitioned ``groupby(part_id).map_groups``
fold (vectorized, polars) → partitioned Parquet sink committed through an
epoch-fenced JSON manifest (exactly-once, resumable, merge-on-read deltas
with explicit compaction).
"""

from marc_data_migration_ray.config import ReplayConfig

__all__ = ["ReplayConfig"]
__version__ = "0.1.0"
