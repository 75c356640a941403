"""Reindex-by-query — the ES ``_reindex``-with-a-query parity op:
extract every turn matching a query into a NEW corpus slice and build a
fresh index over it (curated sub-index construction: "give me a
searchable index of just the deploy-failure turns").

Membership is decided by RE-ANALYSIS, not by the source index: a turn
matches iff its analyzed lemma set intersects the query's analyzed
lemmas (the engine's disjunctive matching rule; optional ``scope``
narrows by role / ``tool:``).  That makes the extract ONE zero-shuffle
stateful map over the corpus — the analyzer memo lives once per actor —
with nothing corpus-sized ever broadcast or driver-held (a hot query
can match half the corpus; shipping its matching-set ids anywhere would
be the scale bug).  ES pays the same shape: ``_reindex`` re-ingests
matching docs through the destination's analyzers.

The extract is DONE-atomic (slice written to ``<dest>/corpus/`` under a
tmp+rename marker, skipped on re-run) and the build underneath is the
standard resumable ``build_index`` — so the whole op inherits
partition-level crash resume at both levels.

Reference analog: the reference can only rebuild its whole table
(``IndexationServiceImpl.java`` truncate-all); this is the surgical
sibling its operators ask for first.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .. import analyzer
from ..config import BuildConfig
from . import build as build_mod

_SLICE_DONE = "_SLICE_DONE.json"


class _MatchFilter:
    """Actor-pool filter: keep turns whose analyzed lemmas intersect the
    query lemma set (memoized lemmatizer state once per actor)."""

    def __init__(self, lemmas: tuple[str, ...], scope: str | None):
        import numpy as np  # noqa: F401  (worker import)

        self.lemmas = frozenset(lemmas)
        self.scope = scope
        self.memo: dict[str, str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_idx, lems, _tf, _dl, _pos = analyzer.analyze_batch(
            batch.column("text"), self.memo)
        hit = np.zeros(batch.num_rows, bool)
        if len(doc_idx):
            lem_arr = np.asarray(lems, dtype=object)
            m = np.fromiter((x in self.lemmas for x in lem_arr),
                            bool, count=len(lem_arr))
            hit[doc_idx[m]] = True
        if self.scope is not None:
            if self.scope.startswith("tool:"):
                col = batch.column("tool")
                want = self.scope[5:]
            else:
                col = batch.column("role")
                want = self.scope
            hit &= pc.equal(pc.fill_null(col, ""), want).to_numpy(
                zero_copy_only=False)
        return batch.filter(pa.array(hit))


def reindex_by_query(
    input_paths: list[str],
    query: str,
    dest_dir: str,
    scope: str | None = None,
    n_partitions: int | None = None,
    concurrency=None,
) -> dict:
    """Extract + build. -> {"result", "error", "n_turns", "out_dir"}.

    ``dest_dir`` gets ``corpus/`` (the extracted slice, DONE-atomic)
    and the index at its root; re-runs skip whatever already finished
    (slice marker / build manifest)."""
    from ..state.manifest import load_json, write_json_atomic

    lemmas = analyzer.analyze_query(query)
    if not lemmas:
        return {"result": False, "error": "empty_query",
                "n_turns": 0, "out_dir": dest_dir}
    corpus_dir = os.path.join(dest_dir, "corpus")
    marker = os.path.join(corpus_dir, _SLICE_DONE)
    done = load_json(marker)
    if not done:
        import ray.data as rd

        tmp = corpus_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds = rd.read_parquet(input_paths)
        filtered = ds.map_batches(
            _MatchFilter,
            fn_constructor_args=(tuple(lemmas), scope),
            batch_format="pyarrow",
            concurrency=concurrency or (1, 4),
        )
        filtered.write_parquet(tmp)
        # an all-filtered (zero-match) slice writes no directory at all
        os.makedirs(tmp, exist_ok=True)
        n = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        write_json_atomic(os.path.join(tmp, _SLICE_DONE),
                          {"query": query, "scope": scope, "n_turns": n})
        if os.path.exists(corpus_dir):
            shutil.rmtree(corpus_dir)
        os.replace(tmp, corpus_dir)
        done = {"n_turns": n}
    n_turns = int(done["n_turns"])
    if n_turns == 0:
        return {"result": False, "error": "empty_result",
                "n_turns": 0, "out_dir": dest_dir}
    files = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    cfg = BuildConfig(input_paths=files, out_dir=dest_dir,
                      n_partitions=n_partitions, concurrency=concurrency)
    build_mod.build_index(cfg)  # resumable by manifest (DONE-skip)
    return {"result": True, "error": None,
            "n_turns": n_turns, "out_dir": dest_dir}


def reindexed_src_sql(src: str, query: str) -> str:
    """SQL relation of the extracted slice: turns whose analyzed lemma
    set intersects the query's analyzed lemmas — the same shared
    analyzer CTE chain, nested in a parenthesized scope so an outer
    BM25 twin can re-analyze the filtered relation under its own CTE
    names (the ``update_search`` nesting precedent)."""
    lemmas = analyzer.analyze_query(query)
    if not lemmas:
        raise ValueError("empty analyzed query")
    lemlist = ", ".join(f"'{x}'" for x in sorted(set(lemmas)))
    return f"""(
    WITH {analyzer.postings_ctes_sql(src)}
    SELECT s.* FROM {src} s
    WHERE EXISTS (
        SELECT 1 FROM __postings p
        WHERE p.conv_id = s.conv_id AND p.turn_idx = s.turn_idx
          AND p.lemma IN ({lemlist})
    ))"""
