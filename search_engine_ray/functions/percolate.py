"""Percolation — reverse search over a document STREAM (the
Elasticsearch percolator, the routing/alerting primitive): instead of a
query probing an index, every incoming document probes a REGISTERED
query set and the matching query ids come out. The reference engine has
no analog; at 100 TB this is the shape that tags/routes every transcript
turn to standing subscriptions in one pass.

Semantics: a query matches a turn when EVERY analyzed query lemma
occurs in the turn's surviving-lemma set (conjunctive containment —
Lucene's percolator default for term queries), optionally restricted to
a role scope. A query whose text analyzes to nothing, or containing a
lemma absent from the turn, matches nothing for that turn.

Shape: one zero-shuffle ``map_batches`` pass with the analyzer running
in-map (actor pool, per-process rule-table memo — the
``aggregates.role_top_lemmas`` pattern); the query set rides the
closure (it is registration-sized, never data-sized). Per batch the
work is one ``analyze_batch`` plus, per query lemma, one vectorized
membership pass over the batch's posting rows — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import analyzer


def percolate(ds, queries: list[dict], text_col: str = "text"):
    """-> Dataset(query_id, conv_id, turn_idx) of (turn, query) matches.

    ``queries``: [{'query_id', 'query_text', 'scope': role|None}, ...].
    Lemma sets are pre-analyzed ONCE on the driver (the same shared
    analyzer module the oracle SQL is generated from)."""
    plans: list[tuple[str, str | None, tuple[str, ...]]] = []
    for q in queries:
        lemmas = analyzer.analyze_query(q["query_text"])
        plans.append((q["query_id"], q.get("scope"), tuple(dict.fromkeys(lemmas))))

    class Percolator:
        def __init__(self):
            self.memo: dict[str, str] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            empty = pa.table(
                {
                    "query_id": pa.array([], pa.string()),
                    "conv_id": pa.array([], pa.string()),
                    "turn_idx": pa.array([], pa.int32()),
                }
            )
            if n == 0:
                return empty
            post_doc_idx, post_lemmas, _tf, _dl, _pos = analyzer.analyze_batch(
                batch.column(text_col), self.memo
            )
            roles = pc.fill_null(batch.column("role"), "").to_numpy(
                zero_copy_only=False
            )
            out_q: list[np.ndarray] = []
            out_rows: list[np.ndarray] = []
            for qid, scope, lems in plans:
                if not lems:
                    continue
                hit = np.ones(n, bool)
                for lem in lems:
                    has = np.zeros(n, bool)
                    has[post_doc_idx[post_lemmas == lem]] = True
                    hit &= has
                    if not hit.any():
                        break
                if scope is not None:
                    hit &= roles == scope
                rows = np.flatnonzero(hit)
                if len(rows):
                    out_rows.append(rows)
                    out_q.append(np.full(len(rows), qid, object))
            if not out_rows:
                return empty
            rows = np.concatenate(out_rows)
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.string()),
                    "conv_id": batch.column("conv_id").take(
                        pa.array(rows, pa.int64())
                    ),
                    "turn_idx": batch.column("turn_idx")
                    .take(pa.array(rows, pa.int64()))
                    .cast(pa.int32()),
                }
            )

    return ds.map_batches(
        Percolator, batch_format="pyarrow", concurrency=(1, 4), max_restarts=0
    )


def percolate_sql(src: str, queries: list[dict]) -> str:
    """DuckDB oracle for :func:`percolate`: conjunctive containment via
    a match-count floor over the shared analyzer postings CTEs (a query
    lemma absent from the corpus can never satisfy the floor, matching
    the engine's containment semantics exactly)."""
    metas, lrows = [], []
    for q in queries:
        lemmas = list(dict.fromkeys(analyzer.analyze_query(q["query_text"])))
        qid = analyzer._sql_quote(q["query_id"])
        scope = "NULL" if q.get("scope") is None else analyzer._sql_quote(q["scope"])
        metas.append(f"({qid}, {scope}, {len(lemmas)})")
        for lem in lemmas:
            lrows.append(f"({qid}, {analyzer._sql_quote(lem)})")
    qmeta = "(VALUES " + ", ".join(metas) + ") qm(query_id, scope, n_terms)"
    qlem = (
        "(VALUES " + ", ".join(lrows) + ") ql(query_id, lemma)"
        if lrows
        else "(SELECT NULL AS query_id, NULL AS lemma WHERE 1=0) ql"
    )
    return f"""
WITH {analyzer.postings_ctes_sql(src)},
roles AS (SELECT conv_id, turn_idx, coalesce(role, '') AS role FROM {src}),
qmeta AS (SELECT * FROM {qmeta}),
qlem AS (SELECT * FROM {qlem})
SELECT q.query_id, p.conv_id, p.turn_idx
FROM qmeta q
JOIN qlem l ON l.query_id = q.query_id
JOIN __postings p ON p.lemma = l.lemma
JOIN roles r ON r.conv_id = p.conv_id AND r.turn_idx = p.turn_idx
WHERE q.n_terms > 0 AND (q.scope IS NULL OR r.role = q.scope)
GROUP BY q.query_id, p.conv_id, p.turn_idx, q.n_terms
HAVING count(*) >= q.n_terms
"""
