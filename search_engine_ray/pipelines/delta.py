"""Incremental single-conversation re-index — the analog of
``POST /api/indexPage`` (SURVEY.md §3.3).

Reference flow (``/root/reference/src/main/java/searchengine/services/
indexation/IndexationServiceImpl.java:66-79,119-131``): validate the URL
is inside a configured site (reject otherwise), then re-fetch and
re-analyze just that page on a spawned thread, upserting its postings.
Here the unit is a *conversation* (all its turns), and the design is
LSM-style: each re-index appends a **delta generation** under
``<out_dir>/delta/gen-NNNN/`` containing

- ``postings.parquet`` — the conversation's fresh flat postings,
- ``docs.parquet``     — its fresh doc rows (docid, role, doc_len),
- ``manifest.json``    — lineage: conv_ids, tombstoned docid ranges,
  old/new turn counts and token masses (the exact corpus-stat
  adjustments), analyzer version, generation number.

The base index files are never rewritten (resume/lineage stays intact);
the query engine overlays deltas at read time (``search.SearchEngine``):
tombstoned docid ranges mask stale base postings, affected lemmas are
merged-on-read, and N/avgdl/df are adjusted exactly — so search over
base+delta is **rank-identical** to a full rebuild of the modified
corpus (verified in tests/test_delta.py). A full ``build_index`` run is
the compaction path.

Docid stability: a conversation keeps its dense conv_rank, so only
EXISTING conversations can be re-indexed (a brand-new conv_id would
shift every later rank — that is a rebuild, and the request is rejected
the way the reference rejects an out-of-scope URL,
``IndexationServiceImpl.java:133-149``).

The slice is tiny (one conversation ≪ one block), so analysis runs
driver-side with the same analyzer module — the analog of the
reference's single raw Thread, below cluster-work granularity.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .. import analyzer
from ..config import TURN_BITS
from ..docid import make_docids
from ..state.manifest import load_json, write_json_atomic
from . import build as build_mod


def delta_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "delta")


def list_generations(out_dir: str) -> list[dict]:
    """Delta generation manifests, ascending generation order."""
    d = delta_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        m = load_json(os.path.join(d, name, "manifest.json"))
        if m and m.get("state") == "DONE":
            m["_dir"] = os.path.join(d, name)
            out.append(m)
    return sorted(out, key=lambda m: m["generation"])


def reindex_conversations(
    out_dir: str,
    conv_ids: list[str],
    input_paths: list[str] | None = None,
) -> dict:
    """Re-analyze ``conv_ids`` from ``input_paths`` (default: the build's
    inputs) and append one delta generation. Returns a reference-style
    response dict: ``{"result": bool, "error": str|None, "generation":
    int|None}``."""
    m = load_json(build_mod.build_manifest_path(out_dir))
    if not m:
        return {"result": False, "error": "no build manifest", "generation": None}
    paths = input_paths or m["config"]["input_paths"]

    convs = build_mod._load_sorted_convs(out_dir)
    convs_np = np.asarray(convs.to_pylist(), dtype=object)
    ranks = np.searchsorted(convs_np, np.asarray(conv_ids, dtype=object))
    for cid, r in zip(conv_ids, ranks):
        if r >= len(convs_np) or convs_np[r] != cid:
            # reference: out-of-scope page -> {"result": false, error}
            return {
                "result": False,
                "error": f"conversation {cid!r} not in index (full rebuild required)",
                "generation": None,
            }

    # old per-conv turn counts + token mass from the docid-sorted doc
    # store (pruned range read per conv at scale; column read here)
    dtab = pq.read_table(build_mod.docs_dir(out_dir), columns=["docid", "doc_len"])
    base_docids = dtab.column("docid").to_numpy()
    base_dl = dtab.column("doc_len").to_numpy()
    ranges = [(int(r) << TURN_BITS, (int(r) + 1) << TURN_BITS) for r in ranks]
    old_turns = old_len = 0
    for lo, hi in ranges:
        a, b = np.searchsorted(base_docids, lo), np.searchsorted(base_docids, hi)
        old_turns += int(b - a)
        old_len += int(base_dl[a:b].sum())

    # fresh analysis of the slice (filter-pushdown read)
    src = pads.dataset(paths)
    slice_tbl = src.to_table(
        filter=pads.field("conv_id").isin(conv_ids),
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    rank_of = {c: int(r) for c, r in zip(conv_ids, ranks)}
    conv_col = slice_tbl.column("conv_id").to_pylist()
    turn_np = slice_tbl.column("turn_idx").to_numpy(zero_copy_only=False)
    rank_arr = np.array([rank_of[c] for c in conv_col], np.int64)
    docid = make_docids(rank_arr, turn_np)

    got = analyzer.analyze_batch(slice_tbl.column("text"), {})
    post_doc_idx, lemmas, tf, doc_len = got[:4]
    pos_deltas = got[4] if len(got) > 4 else None
    from ..stages.analyze import encode_pos_cells

    postings = pa.table(
        {
            "lemma": pa.array(lemmas, pa.string()),
            "docid": pa.array(docid[post_doc_idx], pa.int64()),
            "tf": pa.array(tf, pa.int32()),
            # per-posting position blobs (phrase queries survive the
            # delta overlay / compaction fold)
            "pos": (
                encode_pos_cells(pos_deltas, tf)
                if pos_deltas is not None
                else pa.nulls(len(post_doc_idx), pa.binary())
            ),
            "doc_len": pa.array(doc_len[post_doc_idx].astype(np.int32), pa.int32()),
        }
    )
    docs = pa.table(
        {
            "docid": pa.array(docid, pa.int64()),
            "conv_id": slice_tbl.column("conv_id"),
            "turn_idx": slice_tbl.column("turn_idx"),
            "role": slice_tbl.column("role"),
            "doc_len": pa.array(doc_len.astype(np.int32), pa.int32()),
            "tool": slice_tbl.column("tool"),
            "ts": slice_tbl.column("ts"),
        }
    )

    gens = list_generations(out_dir)
    gen = (gens[-1]["generation"] + 1) if gens else 1
    gdir = os.path.join(delta_dir(out_dir), f"gen-{gen:04d}")
    tmp = gdir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(postings.sort_by([("lemma", "ascending"), ("docid", "ascending")]),
                   os.path.join(tmp, "postings.parquet"))
    pq.write_table(docs, os.path.join(tmp, "docs.parquet"))
    manifest = {
        "generation": gen,
        "conv_ids": list(conv_ids),
        "tombstones": ranges,
        "old_turns": old_turns,
        "old_len": old_len,
        "new_turns": int(slice_tbl.num_rows),
        "new_len": int(doc_len.sum()),
        "analyzer_version": analyzer.ANALYZER_VERSION,
        "input_paths": list(paths),  # snippet/text source for these convs
        "state": "DONE",
    }
    write_json_atomic(os.path.join(tmp, "manifest.json"), manifest)
    if os.path.exists(gdir):
        shutil.rmtree(gdir)
    os.replace(tmp, gdir)
    return {"result": True, "error": None, "generation": gen}
