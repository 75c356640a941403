"""Sequence packing for training-batch construction over the
``documents`` table — the step between a cleaned corpus and a trainer:
concatenate document token streams and slice them into fixed-length
training sequences (the GPT-style "concat-and-chunk" packing used by
most LLM pretraining pipelines; docs may span a sequence boundary).

Each document gets its placement in the packed stream:

    n_tokens     — WORD_REGEX token count (the shared ``[a-z0-9]+``
                   pre-tokenization of text_analysis.token_counts)
    pack_group   — ``doc_id // group_size``: packing RESTARTS at every
                   group boundary. This is the scale device: groups
                   pack independently (one bounded shuffle on the group
                   key, group size is a parameter), so a 100 TB corpus
                   packs as millions of independent group tasks and a
                   resumed/failed run re-packs only its groups. The
                   cost is <= one partially-filled final sequence per
                   group — bounded, documented waste.
    start_offset — exclusive prefix sum of n_tokens within the group in
                   canonical doc_id order (deterministic at any
                   parallelism)
    first_seq /  — the group-local training-sequence indices this doc's
    last_seq       tokens land in: floor(start/max_len) and
                   floor((start + max(n,1) - 1)/max_len); an empty doc
                   sits at its boundary (first == last, spans nothing)

The whole operator is ONE groupby (map_groups on the group key) over a
pure counting map — integer math only, so the DuckDB oracle (window
cumsum with the same expressions) is exact to the last row.

The reference engine has no training surface; this module extends the
LLM-training-data family (SURVEY.md "beyond the reference" mandate)
alongside sampling.py / dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .text_analysis import WORD_REGEX, token_counts

PACK_MAX_LEN = 512
PACK_GROUP_SIZE = 1024


def pack_sequences(
    ds: rd.Dataset,
    max_len: int = PACK_MAX_LEN,
    group_size: int = PACK_GROUP_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Concat-and-chunk packing plan: per-document placement in the
    packed training stream (see module docstring). -> Dataset of
    (id, n_tokens, pack_group, start_offset, first_seq, last_seq)."""
    max_len = int(max_len)
    group_size = int(group_size)
    if max_len <= 0 or group_size <= 0:
        raise ValueError("max_len and group_size must be positive")

    def counted(batch: pa.Table) -> pa.Table:
        t = token_counts(batch, text_col)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("pack_sequences requires non-negative ids")
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": t.column("n_word_tokens"),
                "pack_group": pa.array(ids // group_size, pa.int64()),
            }
        )

    def place(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group, sort_keys=[(id_col, "ascending")])
        group = group.take(order)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        start = np.concatenate(([0], np.cumsum(n)[:-1]))
        first = start // max_len
        last = (start + np.maximum(n, 1) - 1) // max_len
        return pa.table(
            {
                id_col: group.column(id_col),
                "n_tokens": pa.array(n, pa.int64()),
                "pack_group": group.column("pack_group"),
                "start_offset": pa.array(start, pa.int64()),
                "first_seq": pa.array(first, pa.int64()),
                "last_seq": pa.array(last, pa.int64()),
            }
        )

    return (
        ds.map_batches(counted, batch_format="pyarrow")
        .groupby("pack_group")
        .map_groups(place, batch_format="pyarrow")
    )


def pack_sequences_sql(
    src: str,
    max_len: int = PACK_MAX_LEN,
    group_size: int = PACK_GROUP_SIZE,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`pack_sequences` — same token regex, same
    integer expressions, window cumsum for the exclusive prefix sum."""
    low = "lower(coalesce(text, ''))"
    return f"""
WITH tc AS (
    SELECT {id_col},
           CAST(len(regexp_extract_all({low}, '{WORD_REGEX}')) AS BIGINT) AS n_tokens,
           CAST({id_col} // {group_size} AS BIGINT) AS pack_group
    FROM {src}
),
w AS (
    SELECT *,
           coalesce(sum(n_tokens) OVER (
               PARTITION BY pack_group ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS start_offset
    FROM tc
)
SELECT {id_col}, n_tokens, pack_group,
       CAST(start_offset AS BIGINT) AS start_offset,
       CAST(start_offset // {max_len} AS BIGINT) AS first_seq,
       CAST((start_offset + greatest(n_tokens, 1) - 1) // {max_len} AS BIGINT) AS last_seq
FROM w
"""
