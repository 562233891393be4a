"""Schema-metadata-stripping Parquet reader.

The driver-generated testdata parquet files embed a ``pandas`` schema-metadata
blob.  ``pyarrow.Schema.__hash__`` raises ``TypeError: unhashable type: 'dict'``
on any schema that carries metadata, which defeats Ray Data's schema-dedup
fast path (``transform_pyarrow.unify_schemas`` tries ``set(schemas)`` first)
and logs a ``Failed to hash the schemas`` warning per fan-in.  Every pipeline
reads through this wrapper, which drops the metadata in a zero-copy
``map_batches`` that fuses with the read operator (``replace_schema_metadata``
only allocates a new schema object, never touches buffers).

Note: the appended transform disables the parquet-metadata ``count()`` fast
path.  Call sites that want a metadata-only row count should use
``ray.data.read_parquet(path).count()`` directly on a raw read.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def read_parquet(paths, **kwargs) -> "ray.data.Dataset":
    """``ray.data.read_parquet`` with hashable (metadata-free) block schemas.

    All keyword arguments (``columns=``, ``filter=``, ``override_num_blocks=``,
    ...) pass through, so column pruning and row-group predicate pushdown still
    happen at the read.
    """
    ds = ray.data.read_parquet(paths, **kwargs)
    return ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
