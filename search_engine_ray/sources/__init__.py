"""Source readers (transcripts + generic cleaned parquet)."""

from __future__ import annotations

import os

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
    if "schema" not in read_kwargs:
        # strip at the READ too: the ReadParquet operator hashes block
        # schemas internally (SplitBlocks dedup) BEFORE any downstream
        # map can clean them, so a metadata-bearing file schema still
        # logs one warning per read task unless the operator itself is
        # handed a clean schema
        import pyarrow.parquet as pq

        first = paths[0] if isinstance(paths, (list, tuple)) else paths
        if os.path.isdir(first):
            cand = sorted(
                os.path.join(first, f)
                for f in os.listdir(first)
                if f.endswith(".parquet")
            )
            first = cand[0] if cand else first
        try:
            sch = pq.read_schema(first).remove_metadata()
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            read_kwargs["schema"] = sch
        except Exception:  # noqa: BLE001 — fall back to the plain read
            pass
    ds = ray.data.read_parquet(paths, columns=columns, **read_kwargs)
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )
