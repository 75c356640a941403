"""Stage D map — (lemma, docid)-sorted postings -> compressed index blocks.

The reference's "physical index" is flat MySQL rows behind B-trees
(``/root/reference/src/main/java/searchengine/model/Index.java:11-28``,
``repositories/PageRepository.java:24-38``). The north rule replaces it
with from-scratch compressed posting lists: fixed-size blocks of
delta+varint docid gaps + tf + doc_len runs, with per-block skip metadata
(``first_docid``/``last_docid``/``n``) and a per-block BM25 upper-bound
weight for block-max WAND (Ding & Suel, SIGIR 2011).

This stage runs as ``map_batches`` over the output of
``sort(['lemma','docid'])`` — the range-partitioned sort IS the k-way
merge: every Arrow batch arrives already globally sorted within its key
range, so block encoding is a pure vectorized scan. A hot lemma whose
posting list exceeds one sort partition is simply split across batches
into independent docid-range runs (skew handling falls out of the range
partitioner — no single task ever holds the full hot list); the block
rows of all runs are disjoint docid ranges and query-time readers just
concatenate them in ``first_docid`` order.

``bmw`` stores ``max(tf / (tf + k1*(1 - b + b*dl/avgdl)))`` over the
block — the df-independent part of BM25 — so the query-time upper bound
is ``idf * (k1+1) * bmw`` without needing df at encode time.

Exchange-payload minimization: the all-to-all sort feeding this stage
ships only ``(lemma_h:int64, docid:int64, tf:int32)`` — 20 bytes/row.
The lemma *string* is restored here from a broadcast ``lemma_h ->
lemma`` vocabulary (``ray.put`` once, zero-copy plasma read per worker)
and ``doc_len`` from a broadcast docid-sorted ``(docid, dl)`` pair read
off the already-written doc store. Both broadcasts are opt-in: when the
vocabulary has a (detected) 63-bit hash collision, or the corpus is too
large for the dl broadcast, the build falls back to carrying the
column through the shuffle and the encoder transparently uses the batch
column instead (``lemma`` / ``doc_len`` present in the batch wins).

Encoding is fully vectorized: ONE varint pass per column over the whole
batch, then zero-copy slicing into per-block binary cells via Arrow
offset buffers. No per-posting Python; per-block work is O(#blocks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state import codec

# per-worker-process broadcast cache (ObjectRef hex -> resolved value):
# worker processes are reused across map_batches tasks, so each process
# resolves a ray.put side exactly once (zero-copy for numpy arrays)
_BCAST_CACHE: dict[str, object] = {}


def _resolve(ref):
    key = ref.hex()
    got = _BCAST_CACHE.get(key)
    if got is None:
        import ray

        got = ray.get(ref)
        _BCAST_CACHE[key] = got
    return got

INDEX_SCHEMA = pa.schema(
    [
        ("lemma", pa.string()),
        ("lemma_h", pa.int64()),
        ("first_docid", pa.int64()),
        ("last_docid", pa.int64()),
        ("n", pa.int32()),
        ("bmw", pa.float32()),
        ("block_cf", pa.int64()),
        ("block_max_tf", pa.int32()),
        ("gaps", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("scps", pa.binary()),
        # per-posting token-position streams (phrase queries): the
        # concatenation of each posting's delta+varint position blob
        # (tf values per posting — block_cf totals the block). Empty
        # when the build ran without positions.
        ("poss", pa.binary()),
    ]
)


def scope_code_space(roles: list[str], tools: list[str]) -> int:
    """Size of the dense scope-code space: code = role_code * (n_tools+1)
    + tool_code, where code 0 of each axis is the empty value."""
    return (len(roles) + 1) * (len(tools) + 1)


def scope_codes_of(role_col, tool_col, roles: list[str], tools: list[str]) -> np.ndarray:
    """Vectorized (role, tool) -> dense scope code. Unknown/empty values
    map to axis code 0. The code is a pure function of the manifest's
    ``stats.roles``/``stats.tools`` lists (known after stage B), so the
    query engine reconstructs the mapping without extra persisted state."""
    import pyarrow.compute as _pc

    r_idx = _pc.index_in(role_col, value_set=pa.array(roles, pa.string()))
    t_idx = _pc.index_in(tool_col, value_set=pa.array(tools, pa.string()))
    r = _pc.fill_null(_pc.add(r_idx, 1), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    t = _pc.fill_null(_pc.add(t_idx, 1), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    return r * (len(tools) + 1) + t


def _binary_cells(buf: bytes, byte_offsets: np.ndarray) -> pa.Array:
    """Zero-copy pa.binary() array slicing ``buf`` at ``byte_offsets``."""
    off = pa.array(byte_offsets.astype(np.int32)).buffers()[1]
    return pa.Array.from_buffers(
        pa.binary(), len(byte_offsets) - 1, [None, off, pa.py_buffer(buf)]
    )


def make_block_encoder(
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    vocab_ref=None,
    dl_ref=None,
):
    """Returns the vectorized encode fn for ``map_batches(batch_format='pyarrow')``.

    ``vocab_ref``: ``ray.put((lemma_h_sorted:int64[], lemma:object[]))`` —
    used to restore the lemma string when the batch carries only
    ``lemma_h`` (the minimized shuffle payload). ``dl_ref``:
    ``ray.put((docid_sorted:int64[], dl:int32[], scope_code:int32[]))`` —
    likewise for ``doc_len`` and the per-doc scope code (2-tuples from
    older callers are accepted; scope codes then fall back to the batch
    column or zeros). A batch column with the same name always wins (the
    fallback paths for hash collisions / oversized corpora, and direct
    encoder invocations in tests)."""

    def encode(batch: pa.Table) -> pa.Table:
        npost = batch.num_rows
        if npost == 0:
            return INDEX_SCHEMA.empty_table()
        docid = batch.column("docid").combine_chunks().to_numpy(zero_copy_only=False)
        if "tf" in batch.column_names:
            tf = batch.column("tf").combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            # minimized positions exchange: tf == the number of varint
            # values in the posting's pos cell (one terminator byte —
            # high bit 0 — per value), so the column never ships. One
            # vectorized mask + reduceat over the cell byte offsets.
            pd_, po_ = binary_column_buffers(batch.column("pos"))
            term = ((pd_ & 0x80) == 0).astype(np.int64)
            cum_t = np.concatenate(([0], np.cumsum(term)))
            tf = (cum_t[po_[1:]] - cum_t[po_[:-1]]).astype(np.uint64)
        bpos = None
        if "doc_len" in batch.column_names:
            dl = batch.column("doc_len").combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            bcast = _resolve(dl_ref)
            bdoc = bcast[0]
            bpos = np.searchsorted(bdoc, docid)
            dl = bcast[1][bpos].astype(np.uint64)
        # per-posting scope code (doc-level (role, tool) -> dense code):
        # rides the same docid-aligned broadcast as doc_len, or the
        # shuffle column in the no-broadcast regime; zeros (= the empty
        # scope pair) for direct encoder invocations without either
        if "scope_code" in batch.column_names:
            sc = batch.column("scope_code").combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        elif dl_ref is not None and len(_resolve(dl_ref)) > 2 and bpos is None:
            bcast = _resolve(dl_ref)
            sc = bcast[2][np.searchsorted(bcast[0], docid)].astype(np.uint64)
        elif bpos is not None and len(_resolve(dl_ref)) > 2:
            sc = _resolve(dl_ref)[2][bpos].astype(np.uint64)
        else:
            sc = np.zeros(npost, np.uint64)

        lemma = None
        if "lemma" in batch.column_names:
            lemma = batch.column("lemma").combine_chunks()
            # lemma run boundaries (dictionary-encode -> codes -> diff)
            codes = lemma.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            run_start = np.flatnonzero(np.diff(codes, prepend=codes[0] - 1))
        elif "lemma_r" in batch.column_names:
            # minimized exchange: int32 dense vocabulary rank instead of
            # the int64 hash (rank order == hash order, so the sort is
            # identical); the rank indexes the broadcast vocab directly
            r_np = batch.column("lemma_r").combine_chunks().to_numpy(zero_copy_only=False)
            run_start = np.flatnonzero(np.diff(r_np, prepend=r_np[0] - 1))
            h_np = None
        else:
            h_np = batch.column("lemma_h").combine_chunks().to_numpy(zero_copy_only=False)
            run_start = np.flatnonzero(np.diff(h_np, prepend=h_np[0] - 1))

        # chunk each run into blocks of `block_size`
        run_end = np.append(run_start[1:], npost)
        run_len = run_end - run_start
        nblk = (run_len + block_size - 1) // block_size
        # block start indices: run_start[i] + j*block_size for j in range(nblk[i])
        rep_start = np.repeat(run_start, nblk)
        rep_end = np.repeat(run_end, nblk)
        within = np.concatenate([np.arange(k) for k in nblk]) if len(nblk) else np.empty(0, np.int64)
        blk_start = rep_start + within * block_size
        blk_end = np.minimum(blk_start + block_size, rep_end)
        bounds = np.append(blk_start, npost)

        # delta encode docids with a reset at every block start
        u = docid.astype(np.uint64)
        gaps = u.copy()
        gaps[1:] -= u[:-1]
        gaps[blk_start] = u[blk_start]

        # one varint pass per column; per-block byte ranges from cum lengths
        cells = []
        for vals in (gaps, tf, dl, sc):
            nb = codec.varint_nbytes(vals)
            cum = np.concatenate(([0], np.cumsum(nb)))
            cells.append(_binary_cells(codec.varint_encode(vals), cum[bounds]))

        # positions: the per-posting blobs are already encoded (each
        # self-contained: first value absolute within its posting), so
        # the per-block cell is a pure byte-slice of the shuffled binary
        # column — no decode, no re-encode.
        if "pos" in batch.column_names:
            pdata, poff = binary_column_buffers(batch.column("pos"))
            pbytes = pdata[poff[0] : poff[-1]].tobytes()
            cells.append(
                _binary_cells(pbytes, (poff[bounds] - poff[0]).astype(np.int64))
            )
        else:  # positionless build: empty stream per block
            cells.append(_binary_cells(b"", np.zeros(len(bounds), np.int64)))

        # block-max BM25 weight (df-independent part) + per-block partial
        # aggregates (cf = Σtf, max_tf) so the term dictionary is derived
        # from block metadata instead of re-shuffling every posting
        w = tf.astype(np.float64) / (
            tf + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl)
        )
        if len(blk_start):
            bmw = np.maximum.reduceat(w, blk_start)
            blk_cf = np.add.reduceat(tf.astype(np.int64), blk_start)
            blk_max_tf = np.maximum.reduceat(tf.astype(np.int64), blk_start)
        else:
            bmw = blk_cf = blk_max_tf = np.empty(0)

        # float32 upper bounds must round UP: a round-to-nearest cast can
        # land ~1 ulp BELOW the true float64 block max, and a window whose
        # best doc scores exactly at the top-k threshold would then be
        # pruned — breaking the lossless-pruning guarantee (search.py).
        bmw32 = bmw.astype(np.float32)
        low = bmw32.astype(np.float64) < bmw
        if low.any():
            bmw32[low] = np.nextafter(bmw32[low], np.float32(np.inf))

        if lemma is not None:
            blk_lemma = lemma.take(pa.array(blk_start, pa.int64()))
            if "lemma_h" in batch.column_names:
                blk_h = batch.column("lemma_h").combine_chunks().take(
                    pa.array(blk_start, pa.int64())
                )
            else:  # direct encoder invocations (tests) without the sort key
                from ..analyzer import lemma_hash64

                blk_h = pa.array(
                    [lemma_hash64(s) for s in blk_lemma.to_pylist()], pa.int64()
                )
        elif "lemma_r" in batch.column_names:
            # rank -> (hash, string) is a direct index into the vocab
            vh, vlem = _resolve(vocab_ref)
            br = r_np[blk_start]
            if len(br) and int(br.max()) >= len(vh):
                raise ValueError("lemma_r out of vocabulary range")
            blk_lemma = pa.array(vlem[br], pa.string())
            blk_h = pa.array(vh[br], pa.int64())
        else:  # restore the string from the broadcast vocabulary
            vh, vlem = _resolve(vocab_ref)
            bh = h_np[blk_start]
            pos = np.searchsorted(vh, bh)
            if pos.max(initial=-1) >= len(vh) or (len(pos) and not (vh[pos] == bh).all()):
                raise ValueError("lemma_h missing from broadcast vocabulary")
            blk_lemma = pa.array(vlem[pos], pa.string())
            blk_h = pa.array(bh, pa.int64())

        return pa.Table.from_arrays(
            [
                blk_lemma,
                blk_h,
                pa.array(docid[blk_start], pa.int64()),
                pa.array(docid[blk_end - 1], pa.int64()),
                pa.array((blk_end - blk_start).astype(np.int32), pa.int32()),
                pa.array(bmw32, pa.float32()),
                pa.array(blk_cf.astype(np.int64), pa.int64()),
                pa.array(blk_max_tf.astype(np.int32), pa.int32()),
                *cells,
            ],
            schema=INDEX_SCHEMA,
        )

    return encode


def decode_block(gaps: bytes, tfs: bytes, dls: bytes, n: int):
    """One block -> (docid:int64[n], tf:int64[n], dl:int64[n])."""
    docid = codec.delta_decode(codec.varint_decode(gaps, n)).astype(np.int64)
    tf = codec.varint_decode(tfs, n).astype(np.int64)
    dl = codec.varint_decode(dls, n).astype(np.int64)
    return docid, tf, dl


def binary_column_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy ``(data:uint8[], offsets:int64[])`` view of a
    ``pa.binary()`` column — the query engine slices contiguous block
    ranges straight out of ``data`` instead of materializing a Python
    ``bytes`` object per block (``to_pylist``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[col.offset : col.offset + len(col) + 1]
    data = (
        np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    )
    return data, offs.astype(np.int64)


def decode_gaps_range(
    gaps_buf: tuple[np.ndarray, np.ndarray],
    cum_n: np.ndarray,
    a: int,
    b: int,
) -> np.ndarray:
    """Docids of blocks [a, b) only — one varint pass over the gaps
    column, tf/dl untouched (the counting path needs no weights)."""
    total = int(cum_n[b] - cum_n[a])
    if total == 0:
        return np.empty(0, np.int64)
    gd, go = gaps_buf
    gaps = codec.varint_decode(gd[go[a] : go[b]], total)
    ns = np.diff(cum_n[a : b + 1])
    cum = np.cumsum(gaps, dtype=np.uint64).view(np.int64)
    seg_start = (cum_n[a:b] - cum_n[a]).astype(np.int64)
    correction = cum[seg_start] - gaps[seg_start].astype(np.int64)
    return cum - np.repeat(correction, ns)


def decode_block_range(
    gaps_buf: tuple[np.ndarray, np.ndarray],
    tfs_buf: tuple[np.ndarray, np.ndarray],
    dls_buf: tuple[np.ndarray, np.ndarray],
    cum_n: np.ndarray,
    a: int,
    b: int,
    scps_buf: tuple[np.ndarray, np.ndarray] | None = None,
):
    """Decode blocks [a, b) in one pass from zero-copy buffer views:
    a contiguous block range's payload bytes are contiguous in the Arrow
    data buffer, so each column is ONE vectorized varint decode; the
    per-block delta chains are reconstructed with a segmented cumsum
    (per-block correction broadcast via ``np.repeat``). ~10-50x faster
    than a per-block Python loop for hot lemmas with thousands of
    blocks. Returns (docid, tf, dl, scope_code); scope codes are None
    when ``scps_buf`` is None."""
    total = int(cum_n[b] - cum_n[a])
    if total == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z
    gd, go = gaps_buf
    td, to = tfs_buf
    dd, do = dls_buf
    gaps = codec.varint_decode(gd[go[a] : go[b]], total)
    # int64 views, not astype copies: varint payloads are < 2^63 by
    # construction, so the uint64 reinterpretation is free
    tf = codec.varint_decode(td[to[a] : to[b]], total).view(np.int64)
    dl = codec.varint_decode(dd[do[a] : do[b]], total).view(np.int64)
    if scps_buf is not None:
        sd, so = scps_buf
        sc = codec.varint_decode(sd[so[a] : so[b]], total).view(np.int64)
    else:
        sc = None
    ns = np.diff(cum_n[a : b + 1])
    cum = np.cumsum(gaps, dtype=np.uint64).view(np.int64)
    seg_start = (cum_n[a:b] - cum_n[a]).astype(np.int64)
    correction = cum[seg_start] - gaps[seg_start].astype(np.int64)
    docid = cum - np.repeat(correction, ns)
    return docid, tf, dl, sc


def decode_poss_range(
    poss_buf: tuple[np.ndarray, np.ndarray],
    cum_cf: np.ndarray,
    a: int,
    b: int,
    tf: np.ndarray,
) -> np.ndarray:
    """Token positions of blocks [a, b): ONE varint pass over the poss
    column slice (``cum_cf`` = cumulative per-block position counts =
    cumsum of block_cf), then a segmented cumsum keyed on per-POSTING
    boundaries (``tf`` = per-posting counts within [a, b), i.e. the
    already-decoded tf stream of the same range). Returns the flat
    absolute-position array; posting boundaries are ``cumsum(tf)``."""
    total = int(cum_cf[b] - cum_cf[a])
    if total == 0:
        return np.empty(0, np.int64)
    sd, so = poss_buf
    deltas = codec.varint_decode(sd[so[a] : so[b]], total)
    cum = np.cumsum(deltas, dtype=np.uint64).view(np.int64)
    seg_start = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))[:-1]
    correction = cum[seg_start] - deltas[seg_start].astype(np.int64)
    return cum - np.repeat(correction, tf)


def decode_scps_range(
    scps_buf: tuple[np.ndarray, np.ndarray],
    cum_n: np.ndarray,
    a: int,
    b: int,
) -> np.ndarray:
    """Scope codes of blocks [a, b) only — the scoped counting path
    pairs this with :func:`decode_gaps_range` (tf/dl untouched)."""
    total = int(cum_n[b] - cum_n[a])
    if total == 0:
        return np.empty(0, np.int64)
    sd, so = scps_buf
    return codec.varint_decode(sd[so[a] : so[b]], total).view(np.int64)
