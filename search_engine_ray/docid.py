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
    """Composite docid. ``turn_idx`` must fit in ``TURN_BITS`` — an
    oversized (or negative) value would silently bleed into the next
    conversation's docid range, corrupting docid ordering, tombstone
    masking and conv_rank-based enrichment. External JSONL/CSV inputs
    reach this path, so validate and fail loudly."""
    t = np.asarray(turn_idx)
    if len(t) and (int(t.min()) < 0 or int(t.max()) >= (1 << TURN_BITS)):
        bad = t[(t < 0) | (t >= (1 << TURN_BITS))][0]
        raise ValueError(
            f"turn_idx {int(bad)} outside [0, 2**{TURN_BITS}) — cannot assign docids"
        )
    return (conv_rank.astype(np.int64) << TURN_BITS) | t.astype(np.int64)


def split_docids(docids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """docid -> (conv_rank, turn_idx)."""
    d = docids.astype(np.int64)
    return d >> TURN_BITS, (d & ((1 << TURN_BITS) - 1)).astype(np.int32)


# per-worker-process broadcast cache: ObjectRef hex -> sorted np unicode
# array of conv_ids. Worker processes are reused across map_batches
# tasks, so each process resolves the ray.put side and converts it
# exactly once; per batch the rank lookup is a C-level np.searchsorted
# of the batch's DICTIONARY (unique conv_ids) — O(uniq·log n) with no
# per-call hash-table rebuild, so it stays fast whether the executor
# hands us 2M-row blocks or (when fused into the read) 10k-row batches.
_CONVS_CACHE: dict[str, np.ndarray] = {}


def make_docid_attacher(convs_ref):
    """Task-based ``map_batches`` fn: adds an int64 ``docid`` column.

    The sorted conv_id list is broadcast once with ``ray.put``; the
    returned closure carries only the ObjectRef (Ray pins it) — a
    map-side broadcast join, never re-shipped per batch. The sorted-array
    binary search doubles as membership validation (rank order IS the
    sorted order, so ``sorted[rank] == conv`` must hold).
    """

    def attach(batch: pa.Table) -> pa.Table:
        key = convs_ref.hex()
        sorted_np = _CONVS_CACHE.get(key)
        if sorted_np is None:
            import ray

            convs = ray.get(convs_ref)
            vals = convs.to_pylist() if isinstance(convs, pa.Array) else list(convs)
            sorted_np = np.array(vals, dtype=np.str_)
            _CONVS_CACHE.clear()  # at most one live rank map per build
            _CONVS_CACHE[key] = sorted_np
        d = batch.column("conv_id").combine_chunks().dictionary_encode()
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=np.str_)
        uniq_rank = np.searchsorted(sorted_np, uniq)
        ok = uniq_rank < len(sorted_np)
        if not (ok.all() and (sorted_np[uniq_rank[ok]] == uniq[ok]).all()):
            raise ValueError("conv_id missing from broadcast rank map")
        codes = d.indices.to_numpy(zero_copy_only=False)
        turn_np = batch.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False)
        docid = make_docids(uniq_rank[codes], turn_np)
        return batch.append_column("docid", pa.array(docid, pa.int64()))

    return attach
