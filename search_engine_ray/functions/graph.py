"""Distributed PageRank over a document similarity graph — the
iterative-numeric family member (Page et al. 1999; the power-iteration
shape every distributed graph engine runs): rank centrality of
documents in the near-dup pair graph surfaces template hubs a curation
pass should inspect first.

Exactness device: the whole iteration is INTEGER arithmetic.  Ranks are
quantized to ``Q = 1e9`` units; with damping d = 85/100 the update is

    r'(v) = (15 * Q) // 100  +  Σ_{u -> v} (85 * r(u)) // (100 * deg(u))

— floor division and int64 sums only, so every iteration is order-free
(exact at any block layout / cluster size) and the SQL twin (the same
expression per chained CTE) matches bit-for-bit.  The un-normalized
form (r0 = Q, additive base (1-d)Q) is the standard rank-mass variant:
total mass stays ~N*Q, so with Q = 1e9 the 85*r products stay far
inside int64 up to ~10^8-node graphs (documented bound; shrink Q
beyond).

Scale shape (the dup_clusters tagged-union pattern): per iteration one
SCATTER groupby over [state rows + out-edge rows] keyed by a 1024-way
SOURCE-node bucket — the in-bucket fold joins state onto edges by
searchsorted and emits (dst, contribution) — then one GATHER groupby
over [node+deg rows + contribution rows] keyed by the DESTINATION
bucket, folding with factorize + int64 add.at into the new state.  The
exchanged frames are node+edge-sized; nothing is ever broadcast or
driver-held (a rank vector IS corpus-sized at 10^12 docs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

PAGERANK_Q = 1_000_000_000
PAGERANK_ITERS = 5
_D_NUM, _D_DEN = 85, 100
_BASE = (_D_DEN - _D_NUM) * PAGERANK_Q // _D_DEN  # (1-d) * Q, exact


def pagerank(
    nodes_ds: rd.Dataset,
    edges: pa.Table,
    iters: int = PAGERANK_ITERS,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """``nodes_ds``: a Dataset carrying ``id_col`` (every node, with or
    without edges); ``edges``: undirected pairs (doc_a, doc_b) — each
    expands to both directions.  -> Dataset(id, rank_q int64) after
    ``iters`` exact integer power iterations.

    Both the scatter and the gather key on a 1024-way node-id BUCKET
    (the exact_dedup bucket device), never on the raw node id — groups
    stay thousands of times fewer than nodes and the per-group fold is
    fully vectorized (factorize + searchsorted + bincount)."""
    it = int(iters)
    if it < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nb = 1024
    ea = edges.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
    eb = edges.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.concatenate([ea, eb])
    dst = np.concatenate([eb, ea])
    deg_ids, deg_cnt = np.unique(src, return_counts=True)
    deg_of = dict(zip(deg_ids.tolist(), deg_cnt.tolist()))

    def init_state(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "kb": pa.array(ids % nb, pa.int64()),
            "k": pa.array(ids, pa.int64()),
            "r": pa.array(np.full(len(ids), PAGERANK_Q), pa.int64()),
            "deg": pa.array(
                [deg_of.get(int(i), 0) for i in ids], pa.int64()),
            "dst": pa.array(np.full(len(ids), -1), pa.int64()),
        })

    # the edge frame is static across iterations (kind: dst >= 0),
    # bucketed by SOURCE node for the scatter
    edge_tbl = pa.table({
        "kb": pa.array(src % nb, pa.int64()),
        "k": pa.array(src, pa.int64()),
        "r": pa.array(np.zeros(len(src), np.int64)),
        "deg": pa.array(np.zeros(len(src), np.int64)),
        "dst": pa.array(dst, pa.int64()),
    })

    def scatter(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        r = group.column("r").to_numpy(zero_copy_only=False)
        deg = group.column("deg").to_numpy(zero_copy_only=False)
        is_state = d < 0
        sk = k[is_state]
        order = np.argsort(sk)
        sk, sr = sk[order], r[is_state][order]
        sdeg = deg[is_state][order]
        ek, ed = k[~is_state], d[~is_state]
        pos = np.searchsorted(sk, ek)
        # edges whose source is outside nodes_ds: drop (no state row)
        ok = (pos < len(sk)) & (sk[np.minimum(pos, len(sk) - 1)] == ek) \
            if len(sk) else np.zeros(len(ek), bool)
        pos, ed = pos[ok], ed[ok]
        dg = sdeg[pos]
        live = dg > 0
        c = (_D_NUM * sr[pos[live]]) // (_D_DEN * dg[live])
        return pa.table({
            "kb": pa.array(ed[live] % nb, pa.int64()),
            "k": pa.array(ed[live], pa.int64()),
            "c": pa.array(c, pa.int64()),
            "deg": pa.array(np.zeros(live.sum(), np.int64)),
        })

    def to_gather_state(b: pa.Table) -> pa.Table:
        # node row: c = -1 marks "this key exists; carries deg"
        return pa.table({
            "kb": b.column("kb"),
            "k": b.column("k"),
            "c": pa.array(np.full(b.num_rows, -1), pa.int64()),
            "deg": b.column("deg"),
        })

    def gather(group: pa.Table) -> pa.Table:
        import pandas as pd

        k = group.column("k").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        deg = group.column("deg").to_numpy(zero_copy_only=False)
        is_node = c < 0
        codes, uq = pd.factorize(k, sort=False)
        n = len(uq)
        has_node = np.zeros(n, bool)
        has_node[codes[is_node]] = True
        node_deg = np.zeros(n, np.int64)
        node_deg[codes[is_node]] = deg[is_node]
        # int64 add.at, NOT a float-weighted bincount — float64 would
        # silently lose exactness once hub sums cross 2^53
        sums = np.zeros(n, np.int64)
        np.add.at(sums, codes[~is_node], c[~is_node])
        sel = has_node
        ks = uq[sel].astype(np.int64)
        return pa.table({
            "kb": pa.array(ks % nb, pa.int64()),
            "k": pa.array(ks, pa.int64()),
            "r": pa.array(_BASE + sums[sel], pa.int64()),
            "deg": pa.array(node_deg[sel], pa.int64()),
            "dst": pa.array(np.full(int(sel.sum()), -1), pa.int64()),
        })

    state = nodes_ds.select_columns([id_col]).map_batches(
        init_state, batch_format="pyarrow")
    edges_ds = rd.from_arrow(edge_tbl)
    for _ in range(it):
        contribs = (
            state.union(edges_ds)
            .groupby("kb")
            .map_groups(scatter, batch_format="pyarrow")
        )
        node_side = state.map_batches(to_gather_state, batch_format="pyarrow")
        state = (
            node_side.union(contribs)
            .groupby("kb")
            .map_groups(gather, batch_format="pyarrow")
            # checkpoint the node-sized iteration state: without it the
            # lazy DAG re-executes every earlier round each iteration
            # (O(iters^2) work); the materialized frame is (node, r,
            # deg) rows in the object store — bounded, the one
            # legitimate mid-pipeline materialize in this repo
            .materialize()
        )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column("k"),
            "rank_q": b.column("r"),
        })

    return state.map_batches(finish, batch_format="pyarrow")


def pagerank_sql(
    src: str,
    pairs_rel: str,
    iters: int = PAGERANK_ITERS,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`pagerank`: ``pairs_rel`` is any
    relation with (doc_a, doc_b); chained CTEs r1..rK apply the same
    integer update (DuckDB ``//`` on positive BIGINTs == Python floor
    division), LEFT JOINs keep isolated nodes at the base rank."""
    it = int(iters)
    if it < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    q, base = PAGERANK_Q, _BASE
    steps = []
    for k in range(1, it + 1):
        prev = f"r{k - 1}"
        steps.append(f"""r{k} AS (
    SELECT n.{id_col},
           {base} + coalesce(sum(({_D_NUM} * p.r) // ({_D_DEN} * dg.deg)), 0) AS r
    FROM nodes n
    LEFT JOIN edges e ON e.d = n.{id_col}
    LEFT JOIN {prev} p ON p.{id_col} = e.s
    LEFT JOIN deg dg ON dg.s = e.s
    GROUP BY 1
)""")
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM {pairs_rel}),
edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT {id_col} FROM {src}),
r0 AS (SELECT {id_col}, CAST({q} AS BIGINT) AS r FROM nodes),
{chain}
SELECT {id_col}, CAST(r AS BIGINT) AS rank_q FROM r{it}
"""
