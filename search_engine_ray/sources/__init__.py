"""Source readers (transcripts + generic cleaned parquet)."""

from __future__ import annotations

import pyarrow as pa
import ray.data


def read_clean_parquet(paths, columns=None, **read_kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with file-level schema metadata stripped.

    Files written by pandas/pyarrow carry a ``b'pandas'`` schema-metadata
    blob; ``pyarrow.Schema.__hash__`` raises on metadata-bearing schemas,
    which makes every downstream Ray operator log a benign-but-noisy
    "Failed to hash the schemas (for deduplication): unhashable type:
    'dict'" warning per task. Stripping at the read (a fused, zero-copy
    ``map_batches``) keeps every block schema hashable engine-wide.
    """
    ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )
