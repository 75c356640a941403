"""Stage A — the flagship stateful map: transcripts -> flat postings.

Reference analog: ``LemmaFinderImpl`` is a loaded-once singleton service
(``/root/reference/src/main/java/searchengine/services/morphology/LemmaFinderImpl.java:10-16``)
invoked per page by ``EntitySaver.saveLemmasAndIndexes``
(``services/indexation/EntitySaver.java:66-85``). Here it is a callable
class passed to ``map_batches`` — one actor per pool slot, analyzer state
(the surface-form -> lemma memo cache) built in ``__init__`` once per
actor, vectorized Arrow work per ``__call__``.

Output: one combined Arrow table per batch holding BOTH
- posting rows:  (lemma, conv_id, turn_idx, tf, doc_len, role, tool, ts=null)
- doc rows:      (lemma=null, conv_id, turn_idx, tf=0, doc_len, role, tool, ts)

Posting rows carry role/tool (dictionary-encoded on disk, so near-free)
for the oversized-corpus stage-C regime where the per-doc scope-code
broadcast does not fit and the int32 code rides the shuffle instead.

``tool``/``ts`` ride the doc rows into the doc store so result
enrichment (J6; the reference joins site url/name/title per result,
``SearchServiceImpl.java:117-133``) can project them without re-reading
the transcripts source, and so ``tool`` can serve as a scope value.

Doc rows exist for every input turn (including empty text, doc_len=0) —
they are the document store / doc_stats side (G3 in SURVEY.md §2.5,
computed in-map with NO shuffle because one turn's tokens live in one
batch). Posting rows carry ``doc_len`` so BM25 block encoding later never
needs a postings<->doc_stats join. Downstream consumers split the two row
kinds with a cheap ``lemma IS NULL`` predicate that parquet row-group
stats prune well.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analyzer import ANALYZER_VERSION, analyze_batch  # noqa: F401

ANALYZED_SCHEMA = pa.schema(
    [
        ("lemma", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("tf", pa.int32()),
        # per-posting token positions, delta+varint bytes (tf values per
        # posting; 0-based over the doc's surviving-token sequence) —
        # the physical basis of phrase queries. Null for doc rows and
        # for pluggable analyzers without HAS_POSITIONS.
        ("pos", pa.binary()),
        ("doc_len", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        # row kind: "post" | "doc" — stage A writes hive-partitioned on
        # this column (part-NNN/kind=post/, kind=doc/), so downstream
        # passes read ONLY their row kind's files: no mixed-file filter,
        # no decoding 80M posting rows to extract 6M doc rows (measured
        # 3x stage-B/C input-pass cost at sf1 pre-split)
        ("kind", pa.string()),
    ]
)


def encode_pos_cells(pos_deltas: np.ndarray, tf: np.ndarray) -> pa.Array:
    """Per-posting position blobs: ONE varint pass over the whole
    delta stream, then zero-copy slicing at per-posting boundaries
    (value counts = tf). Each blob is self-contained (first value
    absolute within its posting), so downstream stages can concatenate/
    re-slice blobs without re-encoding."""
    from ..state import codec

    buf = codec.varint_encode(pos_deltas)
    nb = codec.varint_nbytes(pos_deltas)
    cum_vals = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))
    byte_off = np.concatenate(([0], np.cumsum(nb)))[cum_vals].astype(np.int32)
    off_buf = pa.array(byte_off).buffers()[1]
    return pa.Array.from_buffers(
        pa.binary(), len(tf), [None, off_buf, pa.py_buffer(buf)]
    )


class AnalyzerActor:
    """Stateful analyzer for ``map_batches(AnalyzerActor, batch_format='pyarrow')``."""

    def __init__(
        self,
        kill_after_batches: int | None = None,
        analyzer_module: str | None = None,
        stop_path: str | None = None,
        stop_after_batches: int | None = None,
    ):
        # once per actor process: the memoized surface->lemma cache (the
        # analog of the reference's loaded-once morphology dictionary)
        self.memo: dict[str, str] = {}
        # pluggable analyzer (protocols.Analyzer): imported ONCE per
        # actor; its version is part of the partition lineage key
        if analyzer_module:
            import importlib

            self._analyze_batch = importlib.import_module(analyzer_module).analyze_batch
        else:
            self._analyze_batch = analyze_batch
        # test hook (resume tests): hard-kill this worker PROCESS after N
        # batches — a real mid-flight actor death, not an exception
        self._kill_after = kill_after_batches
        # cooperative cancel (reference stopIndexing semantics): the stop
        # flag lives under the index out_dir — shared storage on a real
        # cluster, so every actor sees it; one os.stat per ~2k-row batch
        self._stop_path = stop_path
        # test hook: this actor WRITES the stop flag after N batches (a
        # deterministic mid-build stop request from inside the pool)
        self._stop_after = stop_after_batches

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._kill_after is not None:
            self._kill_after -= 1
            if self._kill_after < 0:
                import os

                os._exit(1)
        if self._stop_path is not None:
            import os

            if self._stop_after is not None:
                self._stop_after -= 1
                if self._stop_after < 0:
                    with open(self._stop_path, "w") as f:
                        f.write("stop")
            if os.path.exists(self._stop_path):
                raise RuntimeError("build stop requested (cooperative cancel)")
        texts = batch.column("text")
        conv = batch.column("conv_id").combine_chunks()
        turn = batch.column("turn_idx").combine_chunks()
        role = batch.column("role").combine_chunks()
        tool = batch.column("tool").combine_chunks()
        ts = batch.column("ts").combine_chunks()
        n = batch.num_rows

        got = self._analyze_batch(texts, self.memo)
        # 5-tuple: positions (default analyzer); 4-tuple: a legacy
        # pluggable analyzer without positions -> pos column stays null
        # and the build records positions=False for the index
        doc_idx, lemmas, tf, doc_len = got[:4]
        pos_deltas = got[4] if len(got) > 4 else None
        npost = len(doc_idx)
        idx = pa.array(doc_idx, pa.int64())
        doc_len_arr = pa.array(doc_len, pa.int32())
        pos_col = (
            encode_pos_cells(pos_deltas, tf)
            if pos_deltas is not None
            else pa.nulls(npost, pa.binary())
        )

        post_tbl = pa.Table.from_arrays(
            [
                pa.array(lemmas, pa.string()),
                conv.take(idx),
                turn.take(idx),
                pa.array(tf, pa.int32()),
                pos_col,
                doc_len_arr.take(idx),
                role.take(idx),
                tool.take(idx),
                pa.nulls(npost, pa.timestamp("us")),
                pa.array(["post"] * npost, pa.string()),
            ],
            schema=ANALYZED_SCHEMA,
        )
        doc_tbl = pa.Table.from_arrays(
            [
                pa.nulls(n, pa.string()),
                conv,
                turn,
                pa.array(np.zeros(n, np.int32), pa.int32()),
                pa.nulls(n, pa.binary()),
                doc_len_arr,
                role,
                tool,
                ts,
                pa.array(["doc"] * n, pa.string()),
            ],
            schema=ANALYZED_SCHEMA,
        )
        return pa.concat_tables([post_tbl, doc_tbl])
