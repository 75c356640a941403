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

Shape — the ES percolator design (the query set is INDEXED, not
scanned): the driver builds, once, an inverted lemma -> query-ids CSR
map over the registered queries; per batch, postings are joined against
that map with ONE vectorized searchsorted, and a query matches a turn
iff its distinct-matched-lemma count reaches its term count (the same
match-count floor the SQL oracle states).  Per-batch cost is
O(P log Q_lemmas + M) where P = posting rows and M = matched
(turn, query-lemma) expansions — independent of the registered-query
COUNT, so 10^4-10^6 standing queries cost only their actual matches
(the round-3 design was a Python loop over every query per batch).
Degenerate worst case: if thousands of queries share one ultra-hot
lemma, M approaches P x queries-per-hot-lemma — inherent to candidate
generation (ES pays the same on its hottest extracted term).

The analyzer runs in-map (actor pool, per-process rule-table memo —
the ``aggregates.role_top_lemmas`` pattern); the query index rides the
closure (registration-sized, never data-sized).
"""

from __future__ import annotations

from search_engine_ray.functions import actor_pool

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
        plans.append(
            (q["query_id"], q.get("scope"), tuple(dict.fromkeys(lemmas)))
        )

    # ---- driver-built query index (the percolator's "term index") ----
    active = [(qid, scope, lems) for qid, scope, lems in plans if lems]
    nq = len(active)
    qid_arr = np.array([a[0] for a in active], object)
    scope_arr = np.array([a[1] for a in active], object)
    unscoped = np.array([a[1] is None for a in active], bool)
    n_terms = np.array([len(a[2]) for a in active], np.int64)
    lem2q: dict[str, list[int]] = {}
    for qi, (_, _, lems) in enumerate(active):
        for lem in lems:
            lem2q.setdefault(lem, []).append(qi)
    qlemmas = np.array(sorted(lem2q), object)
    nl = len(qlemmas)
    q_counts = np.array([len(lem2q[str(l)]) for l in qlemmas], np.int64)
    q_indptr = np.concatenate([[0], np.cumsum(q_counts)]).astype(np.int64)
    q_indices = (
        np.concatenate([np.array(lem2q[str(l)], np.int64) for l in qlemmas])
        if nl
        else np.empty(0, np.int64)
    )

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
            if n == 0 or nq == 0 or nl == 0:
                return empty
            post_doc_idx, post_lemmas, _tf, _dl, _pos = analyzer.analyze_batch(
                batch.column(text_col), self.memo
            )
            if not len(post_lemmas):
                return empty
            # ONE searchsorted joins batch postings to the query-lemma
            # dictionary; rows whose lemma no query uses drop here
            lem_obj = np.asarray(post_lemmas, object)
            pos = np.searchsorted(qlemmas, lem_obj)
            pos_c = np.minimum(pos, nl - 1)
            m = qlemmas[pos_c] == lem_obj
            if not m.any():
                return empty
            doc = np.asarray(post_doc_idx, np.int64)[m]
            li = pos_c[m].astype(np.int64)
            # distinct (turn, query-lemma) pairs (tf > 1 counts once
            # toward the floor)
            ukey = np.unique(doc * nl + li)
            udoc, ulem = ukey // nl, ukey % nl
            # expand each pair to the queries containing that lemma
            reps = q_counts[ulem]
            tot = int(reps.sum())
            if tot == 0:
                return empty
            edoc = np.repeat(udoc, reps)
            offs = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            eq = q_indices[np.repeat(q_indptr[ulem], reps) + offs]
            # match-count floor: distinct matched lemmas == term count
            upk, cnt = np.unique(edoc * nq + eq, return_counts=True)
            mdoc, mq = upk // nq, upk % nq
            ok = cnt == n_terms[mq]
            if not ok.any():
                return empty
            mdoc, mq = mdoc[ok], mq[ok]
            # per-query role scope
            scoped = ~unscoped[mq]
            if scoped.any():
                roles = pc.fill_null(batch.column("role"), "").to_numpy(
                    zero_copy_only=False
                )
                keep = ~scoped
                keep[scoped] = (
                    roles[mdoc[scoped]] == scope_arr[mq[scoped]]
                )
                mdoc, mq = mdoc[keep], mq[keep]
            if not len(mdoc):
                return empty
            # stable output order (query registration order, then row)
            order = np.lexsort((mdoc, mq))
            mdoc, mq = mdoc[order], mq[order]
            rows = pa.array(mdoc, pa.int64())
            return pa.table(
                {
                    "query_id": pa.array(qid_arr[mq], pa.string()),
                    "conv_id": batch.column("conv_id").take(rows),
                    "turn_idx": batch.column("turn_idx")
                    .take(rows)
                    .cast(pa.int32()),
                }
            )

    return ds.map_batches(
        Percolator, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
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
