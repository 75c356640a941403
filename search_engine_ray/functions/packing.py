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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# Overlapping fixed-size chunking (the RAG / embedding context-window op)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(
    ds,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sliding-window document chunking — the context-window splitter
    every embedding / RAG / long-context ingestion pipeline runs
    (LangChain's token splitter shape): chunk k covers tokens
    ``[k*stride, k*stride + size)`` of the SPACE-SPLIT word stream
    (``stride < size`` = overlap carrying context across boundaries),
    and a doc emits ``1 + ceil(max(0, n - size) / stride)`` chunks —
    the first window always, then one per stride until a window
    reaches the end; every doc (even empty) emits >= 1 chunk so no
    text is silently dropped.  -> Dataset(id, chunk_idx, text,
    n_tokens) where n_tokens is the chunk's own token count.

    Zero-shuffle fully-vectorized map: per batch one split, integer
    chunk geometry in numpy, one flat ``take`` gather and one
    ``binary_join`` re-join — no per-row Python.  Unlike
    :func:`pack_sequences` (concat-and-chunk for TRAINING batches,
    docs spanning boundaries), chunks here never cross documents —
    retrieval wants provenance, so (id, chunk_idx) is the chunk's
    stable address at any corpus scale."""
    size_, stride_ = int(size), int(stride)
    if size_ < 1 or stride_ < 1 or stride_ > size_:
        raise ValueError(
            f"need 1 <= stride <= size, got size={size}, stride={stride}")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pc.fill_null(batch.column(text_col), "")
        toks = pc.split_pattern(txt, " ")
        toks = (
            toks.combine_chunks() if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        flat = toks.flatten()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(off)
        n_chunks = np.where(
            counts <= size_, 1,
            1 + (counts - size_ + stride_ - 1) // stride_,
        )
        total = int(n_chunks.sum())
        chunk_doc = np.repeat(np.arange(len(ids)), n_chunks)
        chunk_starts = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(total, dtype=np.int64) - chunk_starts[chunk_doc]
        begin = chunk_idx * stride_
        end = np.minimum(begin + size_, counts[chunk_doc])
        lens = end - begin
        out_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        # flat gather indices: doc base + [begin, end) per chunk
        base = off[:-1][chunk_doc] + begin
        idx = np.arange(int(out_off[-1]), dtype=np.int64) \
            - np.repeat(out_off[:-1], lens) + np.repeat(base, lens)
        kept = flat.take(pa.array(idx, pa.int64()))
        # int32 list offsets bound one batch's gathered tokens to 2^31
        # — pa.array raises loudly on overflow (shrink batch_size then)
        chunks = pa.ListArray.from_arrays(pa.array(out_off, pa.int32()), kept)
        return pa.table({
            id_col: pa.array(ids[chunk_doc], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            text_col: pc.binary_join(chunks, " "),
            "n_tokens": pa.array(lens, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents_sql(
    src: str,
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`chunk_documents`: the same space-split
    token stream, the same chunk-count formula, ``generate_series``
    chunk indices, and an ordered ``string_agg`` over each window —
    integer geometry only, so the twin is exact to the byte."""
    size_, stride_ = int(size), int(stride)
    if size_ < 1 or stride_ < 1 or stride_ > size_:
        raise ValueError(
            f"need 1 <= stride <= size, got size={size}, stride={stride}")
    return f"""
WITH toks AS (
    SELECT {id_col},
           unnest(string_split(coalesce(text, ''), ' ')) AS word,
           generate_subscripts(string_split(coalesce(text, ''), ' '), 1) - 1
               AS i
    FROM {src}
),
nt AS (SELECT {id_col}, count(*) AS n FROM toks GROUP BY 1),
nc AS (
    SELECT {id_col},
           CASE WHEN n <= {size_} THEN 1
                ELSE 1 + (n - {size_} + {stride_} - 1) // {stride_}
           END AS n_chunks
    FROM nt
),
chunks AS (
    SELECT {id_col}, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
    FROM nc
)
SELECT c.{id_col}, CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
       string_agg(t.word, ' ' ORDER BY t.i) AS text,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM chunks c
JOIN toks t
  ON t.{id_col} = c.{id_col}
 AND t.i >= c.chunk_idx * {stride_}
 AND t.i < c.chunk_idx * {stride_} + {size_}
GROUP BY 1, 2
"""
