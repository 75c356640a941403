"""Deterministic docID assignment.

docID = ``(conv_rank << TURN_BITS) | turn_idx`` where ``conv_rank`` is the
dense rank of ``conv_id`` in global sorted order. Because ranks follow
sorted ``conv_id`` order and ``turn_idx < 2**TURN_BITS``, **integer docid
order == lexicographic (conv_id, turn_idx) order** — which makes the
rank-identity tie-break total order (score DESC, conv_id ASC, turn_idx
ASC) a plain ``(score DESC, docid ASC)`` comparison, and lets posting
lists be delta-encoded over a single integer key.

The reference's docID is a MySQL auto-increment page id
(``/root/reference/src/main/java/searchengine/model/Page.java:12-17``) —
arrival-order and non-deterministic; a deterministic key is required for
resume/byte-identical builds (SURVEY.md §7).

Scale note: the conv_id -> rank map is built driver-side from
``ds.unique('conv_id')`` and broadcast once via ``ray.put`` (a few MB per
million conversations). At 10^12-turn scale replace with the distributed
dense-rank: ``sort('conv_id')`` the unique conv_ids, read per-block row
counts from block metadata (tiny), prefix-sum the offsets driver-side,
then assign ranks per block — same output, no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .config import TURN_BITS


def make_docids(conv_rank: np.ndarray, turn_idx: np.ndarray) -> np.ndarray:
    return (conv_rank.astype(np.int64) << TURN_BITS) | turn_idx.astype(np.int64)


def split_docids(docids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """docid -> (conv_rank, turn_idx)."""
    d = docids.astype(np.int64)
    return d >> TURN_BITS, (d & ((1 << TURN_BITS) - 1)).astype(np.int32)


# per-worker-process broadcast cache: ObjectRef hex -> resolved pa.Array.
# Worker processes are reused across map_batches tasks, so each process
# resolves the ray.put side exactly once (zero-copy from the local
# object store); per batch, index_in runs on the batch's DICTIONARY
# (unique conv_ids), so the value-set probe stays off the per-row path.
_CONVS_CACHE: dict[str, pa.Array] = {}


def make_docid_attacher(convs_ref):
    """Task-based ``map_batches`` fn: adds an int64 ``docid`` column.

    The sorted conv_id list is broadcast once with ``ray.put``; the
    returned closure carries only the ObjectRef (Ray pins it) and each
    worker process memoizes a conv->rank dict in ``_CONVS_CACHE`` —
    a map-side broadcast join, never re-shipped per batch. Per batch only
    the batch's UNIQUE conv_ids (dictionary encode) hit the dict.
    """

    def attach(batch: pa.Table) -> pa.Table:
        key = convs_ref.hex()
        value_set = _CONVS_CACHE.get(key)
        if value_set is None:
            import ray

            convs = ray.get(convs_ref)
            value_set = convs if isinstance(convs, pa.Array) else pa.array(convs, pa.string())
            _CONVS_CACHE.clear()  # at most one live rank map per build
            _CONVS_CACHE[key] = value_set
        d = batch.column("conv_id").combine_chunks().dictionary_encode()
        ranks_u = pc.index_in(d.dictionary, value_set=value_set)
        if ranks_u.null_count:
            raise ValueError("conv_id missing from broadcast rank map")
        uniq_rank = ranks_u.cast(pa.int64()).to_numpy(zero_copy_only=False)
        codes = d.indices.to_numpy(zero_copy_only=False)
        turn_np = batch.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
        docid = make_docids(uniq_rank[codes], turn_np)
        return batch.append_column("docid", pa.array(docid, pa.int64()))

    return attach
