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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# Market-basket co-occurrence graph + distributed triangle counting
# ---------------------------------------------------------------------------

_FIB = np.uint64(0x9E3779B97F4A7C15)  # the hash_join bucket mixer
_ID_BITS = 31  # node ids validated < 2^31 so a pair packs into int64


def _check_ids(a: np.ndarray, b: np.ndarray, who: str) -> None:
    if len(a) and (
        a.min() < 0 or b.min() < 0
        or a.max() >= (1 << _ID_BITS) or b.max() >= (1 << _ID_BITS)
    ):
        raise ValueError(
            f"{who}: node ids must be in [0, 2^{_ID_BITS}) — the pair "
            "packs into one int64 (the dup_clusters loud-sentinel rule)"
        )


def _pair_bucket(a: np.ndarray, b: np.ndarray, n_buckets: int) -> np.ndarray:
    packed = (a.astype(np.uint64) << np.uint64(_ID_BITS)) | b.astype(np.uint64)
    return ((packed * _FIB) >> np.uint64(64 - 16)).astype(np.int64) % n_buckets


def cooccurrence_pairs(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    max_basket: int = 10_000,
    n_buckets: int = 256,
) -> rd.Dataset:
    """Market-basket co-occurrence counts — for every unordered pair of
    DISTINCT items sharing a group (parts in an order, terms in a doc,
    users in a session), the number of groups they co-occur in: the
    edge-list constructor for co-purchase / co-view graphs and the
    input both :func:`triangle_counts` and association-rule mining
    want.

    Plan: ONE ``groupby(group_col)`` exchange; each group dedups its
    items (``np.unique``) and emits its ``k*(k-1)/2`` sorted pairs
    vectorized (``np.triu_indices`` — quadratic in the BASKET, which
    is why ``max_basket`` refuses loudly: one hot basket of 10^6 items
    is 5*10^11 pairs, a caller bug, not a shuffle problem); a second
    pair-bucket groupby folds per-group pairs into global counts.
    Output (a, b, n) with ``a < b``.
    """
    def per_group(g: pa.Table) -> pa.Table:
        items = np.unique(
            g.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        k = len(items)
        if k > max_basket:
            raise ValueError(
                f"cooccurrence_pairs: basket of {k} items exceeds "
                f"max_basket={max_basket} (quadratic pair emission)"
            )
        if k < 2:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        ii, jj = np.triu_indices(k, 1)
        a, b = items[ii], items[jj]
        _check_ids(a, b, "cooccurrence_pairs")
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "n": pa.array(np.ones(len(a), np.int64), pa.int64()),
                "__b": pa.array(_pair_bucket(a, b, n_buckets), pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        t = g.select(["a", "b", "n"]).group_by(["a", "b"]).aggregate(
            [("n", "sum")]
        )
        return t.rename_columns(["a", "b", "n"])

    return (
        ds.select_columns([group_col, item_col])
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(fold, batch_format="pyarrow")
    )


def cooccurrence_pairs_sql(src: str, group_col: str, item_col: str) -> str:
    """DuckDB oracle for :func:`cooccurrence_pairs` — the literal
    distinct-per-group self-join, counted per pair."""
    return f"""
WITH g AS (SELECT DISTINCT {group_col} AS grp, {item_col} AS it FROM {src}),
p AS (
    SELECT g1.it AS a, g2.it AS b
    FROM g g1 JOIN g g2 ON g1.grp = g2.grp AND g1.it < g2.it
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY a, b
"""


def triangle_counts(
    pairs: rd.Dataset,
    a_col: str = "a",
    b_col: str = "b",
    max_out_degree: int = 20_000,
    max_nodes_broadcast: int = 2_000_000,
    n_buckets: int = 256,
    orient_mode: str = "auto",
) -> rd.Dataset:
    """Per-node triangle participation counts over an undirected graph
    — the local clustering / community-density primitive (a doc in
    many near-dup triangles sits in a dense template cluster; a part
    in many co-purchase triangles anchors a basket motif).  Exact, via
    the classic degree-ordered wedge algorithm (Cohen 2009; Suri &
    Vassilvitskii 2011 MR triangle counting):

    1. normalize + dedup edges (min/max orient, self-loops dropped):
       in-map pre-dedup then ONE pair-bucket groupby.
    2. degrees: one node groupby over endpoint partials; the degree
       table broadcasts once (``ray.put`` sorted arrays, guarded by
       ``max_nodes_broadcast`` — above it the documented path is a
       two-round degree JOIN, the tfidf rule).
    3. orient each edge low-(degree, id) -> high: every wedge is now
       generated at its LOWEST-degree vertex, so per-source
       out-degree is O(sqrt(2m)) REGARDLESS of hub skew — the whole
       point of the ordering; ``max_out_degree`` refuses loudly if a
       degenerate graph defeats it.
    4. wedges (v, w, u) emit per source group (ONE groupby,
       ``np.triu_indices``), meet the edge set in ONE pair-bucket
       groupby, membership = searchsorted against the bucket's packed
       edges; matched wedges yield per-bucket (node, n) partials.
    5. final node groupby sums.  Output (node, n_triangles), nodes
       with >= 1 triangle.
    """
    import ray

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        lo, hi = lo[keep], hi[keep]
        _check_ids(lo, hi, "triangle_counts")
        t2 = pa.table(
            {"a": pa.array(lo), "b": pa.array(hi)}
        ).group_by(["a", "b"]).aggregate([])
        a2 = t2.column("a").to_numpy(zero_copy_only=False)
        b2 = t2.column("b").to_numpy(zero_copy_only=False)
        return t2.append_column(
            "__b", pa.array(_pair_bucket(a2, b2, n_buckets), pa.int64())
        )

    def dedup_bucket(g: pa.Table) -> pa.Table:
        return g.select(["a", "b"]).group_by(["a", "b"]).aggregate([])

    edges = (
        pairs.map_batches(
            lambda t: norm(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("__b")
        .map_groups(dedup_bucket, batch_format="pyarrow")
        .materialize()  # consumed three times: degrees, wedges, match
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        v, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(v, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    deg_tbl = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Sum("d", alias_name="d"))
        .materialize()  # consumed by count + orientation (2-3 reads)
    )

    def _orient_cols(
        a: np.ndarray, b: np.ndarray, da: np.ndarray, db: np.ndarray
    ) -> pa.Table:
        # low (deg, id) is the wedge source; a < b already
        a_src = (da < db) | (da == db)
        src = np.where(a_src, a, b)
        dst = np.where(a_src, b, a)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    n_nodes = deg_tbl.count()
    if orient_mode == "auto":
        orient_mode = (
            "broadcast" if n_nodes <= max_nodes_broadcast else "join"
        )
    if orient_mode == "broadcast":
        if n_nodes > max_nodes_broadcast:
            raise ValueError(
                f"triangle_counts: {n_nodes} nodes exceed the degree "
                f"broadcast bound {max_nodes_broadcast} — use "
                "orient_mode='join' (two-round degree-join orientation)"
            )
        rows = deg_tbl.take_all()
        dn = np.array([r["node"] for r in rows], np.int64)
        dd = np.array([r["d"] for r in rows], np.int64)
        o = np.argsort(dn)
        deg_ref = ray.put((dn[o], dd[o]))

        def orient(t: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = degs[np.searchsorted(nodes, a)]
            db = degs[np.searchsorted(nodes, b)]
            return _orient_cols(a, b, da, db)

        oriented_src = edges.map_batches(orient, batch_format="pyarrow")
    elif orient_mode == "join":
        # scale fallback (Suri & Vassilvitskii 2011 round structure):
        # attach deg(a) then deg(b) to every edge through TWO
        # key-partitioned hash joins of the edge table against the
        # degree table — no driver-side degree array at any size;
        # pinned equal to the broadcast path by a forced-low-threshold
        # test (the tfidf two-path pattern)
        from search_engine_ray.functions.joins import hash_join

        deg_a = deg_tbl.map_batches(
            lambda t: t.rename_columns(["node", "__da"]),
            batch_format="pyarrow",
        )
        deg_b = deg_tbl.map_batches(
            lambda t: t.rename_columns(["node", "__db"]),
            batch_format="pyarrow",
        )
        e1 = hash_join(
            edges, deg_a, left_on="a", right_on="node", mode="shuffle"
        )
        e2 = hash_join(
            e1, deg_b, left_on="b", right_on="node", mode="shuffle"
        )

        def orient_joined(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = t.column("__da").to_numpy(zero_copy_only=False)
            db = t.column("__db").to_numpy(zero_copy_only=False)
            return _orient_cols(a, b, da, db)

        oriented_src = e2.map_batches(orient_joined, batch_format="pyarrow")
    else:
        raise ValueError(f"bad orient_mode {orient_mode!r}")

    def wedges(g: pa.Table) -> pa.Table:
        nbr = np.sort(g.column("dst").to_numpy(zero_copy_only=False))
        k = len(nbr)
        if k > max_out_degree:
            raise ValueError(
                f"triangle_counts: out-degree {k} exceeds "
                f"max_out_degree={max_out_degree} after degree "
                "orientation — degenerate near-complete graph"
            )
        if k < 2:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                    "u": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                    "__b": pa.array([], pa.int64()),
                }
            )
        ii, jj = np.triu_indices(k, 1)
        v, w = nbr[ii], nbr[jj]
        u = np.full(len(v), g.column("src")[0].as_py(), np.int64)
        return pa.table(
            {
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "kind": pa.array(np.ones(len(v), np.int8), pa.int8()),
                "__b": pa.array(_pair_bucket(v, w, n_buckets), pa.int64()),
            }
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "v": pa.array(a, pa.int64()),
                "w": pa.array(b, pa.int64()),
                "u": pa.array(np.full(len(a), -1, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(a), np.int8), pa.int8()),
                "__b": pa.array(_pair_bucket(a, b, n_buckets), pa.int64()),
            }
        )

    def match(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        u = g.column("u").to_numpy(zero_copy_only=False)
        pack = (v.astype(np.int64) << _ID_BITS) | w.astype(np.int64)
        e = np.sort(pack[kind == 0])
        wm = kind == 1
        pos = np.searchsorted(e, pack[wm])
        pos[pos == len(e)] = 0
        hit = (e[pos] == pack[wm]) if len(e) else np.zeros(wm.sum(), bool)
        tri_nodes = np.concatenate(
            [u[wm][hit], v[wm][hit], w[wm][hit]]
        )
        nod, cnt = np.unique(tri_nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nod, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    wedge_ds = oriented_src.groupby("src").map_groups(
        wedges, batch_format="pyarrow"
    )
    edge_tagged = edges.map_batches(edge_rows, batch_format="pyarrow")
    return (
        wedge_ds.union(edge_tagged)
        .groupby("__b")
        .map_groups(match, batch_format="pyarrow")
        .groupby("node")
        .aggregate(_Sum("n", alias_name="n_triangles"))
    )


def triangle_counts_sql(pairs_rel: str, a_col: str = "a", b_col: str = "b") -> str:
    """DuckDB oracle for :func:`triangle_counts` — normalize + dedup,
    the literal u<v<w triple join, per-node participation counts."""
    return f"""
WITH p AS (SELECT {a_col} AS a, {b_col} AS b FROM {pairs_rel}),
e0 AS (
    SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
    FROM p WHERE a <> b
),
tri AS (
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM e0 e1
    JOIN e0 e2 ON e2.a = e1.b
    JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
    SELECT u AS node FROM tri
    UNION ALL SELECT v FROM tri
    UNION ALL SELECT w FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY node
"""


# ---------------------------------------------------------------------------
# Association rules (support / confidence / lift over the basket graph)
# ---------------------------------------------------------------------------

RULES_Q = 1_000_000  # ratio quantization (micro-units, half-up)


def association_rules(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket: int = 10_000,
    n_buckets: int = 256,
) -> rd.Dataset:
    """Association rules a -> b over baskets — the market-basket
    trio: ``support`` (co-occurrence count), ``confidence`` =
    P(b | a) and ``lift`` = P(a,b) / (P(a) P(b)) — emitted BOTH
    directions per pair (confidence is asymmetric).

    Plan: ONE ``groupby(group_col)`` exchange where each basket dedups
    its items once and emits pair rows, item rows AND a basket-count
    row on a single tagged schema — pair supports, item supports and
    the basket total are all counts of the SAME distinct
    (group, item) sets, so computing them in one fold is what makes
    them consistent (a separate per-block item dedup would overcount
    pairs spanning blocks — the bug the oracle caught in the first
    draft); ONE pair-bucket groupby folds global counts.  Item
    supports broadcast once (sorted arrays, 2M loud bound); the rule
    emission is a pure vectorized map over the pair rows — nothing
    pair-sized on the driver.

    Exactness device: confidence and lift are RATIOS of exact int64
    counts, quantized ``floor(x * 1e6 + 0.5)`` (the NB rule) from the
    identical division in both engines — no epsilon anywhere; the
    basket count is bounded at 2M so the lift numerator
    ``n * n_baskets * 1e6`` stays inside int64 (numpy would WRAP
    silently past 2^63 while DuckDB errors — refuse loudly instead).
    """
    import ray
    from ray.data.aggregate import Sum as _Sum

    def per_basket(g: pa.Table) -> pa.Table:
        items = np.unique(
            g.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        k = len(items)
        if k > max_basket:
            raise ValueError(
                f"association_rules: basket of {k} items exceeds "
                f"max_basket={max_basket} (quadratic pair emission)"
            )
        _check_ids(items, items, "association_rules")
        if k >= 2:
            ii, jj = np.triu_indices(k, 1)
            pa_, pb = items[ii], items[jj]
        else:
            pa_ = pb = np.empty(0, np.int64)
        # tagged rows: pairs (a,b) / items (it,-1) / basket (-1,-1)
        a = np.concatenate([pa_, items, [-1]])
        b = np.concatenate([pb, np.full(k, -1, np.int64), [-1]])
        bucket = np.empty(len(a), np.int64)
        bucket[: len(pa_)] = _pair_bucket(pa_, pb, n_buckets)
        bucket[len(pa_) : len(pa_) + k] = _pair_bucket(
            items, items, n_buckets
        )
        bucket[-1] = 0
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "n": pa.array(np.ones(len(a), np.int64), pa.int64()),
                "__b": pa.array(bucket, pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        t = g.select(["a", "b", "n"]).group_by(["a", "b"]).aggregate(
            [("n", "sum")]
        )
        return t.rename_columns(["a", "b", "n"])

    counts = (
        ds.select_columns([group_col, item_col])
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(group_col)
        .map_groups(per_basket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(fold, batch_format="pyarrow")
        .materialize()  # consumed three times: baskets, items, pairs
    )

    bk = counts.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("a"), pa.scalar(-1, pa.int64()))
        ).select(["n"]),
        batch_format="pyarrow",
    ).aggregate(_Sum("n", alias_name="n"))
    n_baskets = int(bk["n"] or 0)
    if n_baskets == 0:
        raise ValueError("association_rules: no baskets")
    from .aggregates import headroom_guard

    headroom_guard(
        "association_rules", n_baskets, bound=2_000_001,
        hint="the RULES_Q-scaled lift product wraps int64 past 2M "
        "baskets; rescale RULES_Q or fold in decimal128",
    )

    item_side = counts.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("a"), pa.scalar(0, pa.int64())),
                pc.equal(t.column("b"), pa.scalar(-1, pa.int64())),
            )
        ),
        batch_format="pyarrow",
    ).materialize()  # consumed by count + take_all: one execution
    n_items = item_side.count()
    if n_items > 2_000_000:
        raise ValueError(
            f"association_rules: {n_items} items exceed the support "
            "broadcast bound — join item supports by key instead"
        )
    rows = item_side.take_all()
    si = np.array([r["a"] for r in rows], np.int64)
    sn = np.array([r["n"] for r in rows], np.int64)
    o = np.argsort(si)
    supp_ref = ray.put((si[o], sn[o]))

    def emit(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("b"), pa.scalar(0, pa.int64())))
        nodes, supps = ray.get(supp_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        keep = n >= min_pair_support
        a, b, n = a[keep], b[keep], n[keep]
        sa = supps[np.searchsorted(nodes, a)]
        sb = supps[np.searchsorted(nodes, b)]
        conf_ab = np.floor(n * RULES_Q / sa + 0.5).astype(np.int64)
        conf_ba = np.floor(n * RULES_Q / sb + 0.5).astype(np.int64)
        lift = np.floor(
            n * n_baskets * RULES_Q / (sa * sb) + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "lhs": pa.array(np.concatenate([a, b]), pa.int64()),
                "rhs": pa.array(np.concatenate([b, a]), pa.int64()),
                "support": pa.array(np.concatenate([n, n]), pa.int64()),
                "confidence_q": pa.array(
                    np.concatenate([conf_ab, conf_ba]), pa.int64()
                ),
                "lift_q": pa.array(np.concatenate([lift, lift]), pa.int64()),
            }
        )

    return counts.map_batches(emit, batch_format="pyarrow")


def association_rules_sql(
    src: str,
    group_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> str:
    """DuckDB oracle for :func:`association_rules` — same distinct
    basket semantics, same quantized ratio expressions."""
    q = RULES_Q
    return f"""
WITH g AS (SELECT DISTINCT {group_col} AS grp, {item_col} AS it FROM {src}),
nb AS (SELECT count(DISTINCT grp) AS n FROM g),
isup AS (SELECT it, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY it),
p AS (
    SELECT g1.it AS a, g2.it AS b, CAST(count(*) AS BIGINT) AS n
    FROM g g1 JOIN g g2 ON g1.grp = g2.grp AND g1.it < g2.it
    GROUP BY g1.it, g2.it
    HAVING count(*) >= {min_pair_support}
),
dir2 AS (
    SELECT a AS lhs, b AS rhs, n FROM p
    UNION ALL SELECT b, a, n FROM p
)
SELECT lhs, rhs, dir2.n AS support,
       CAST(floor(dir2.n * {q} * 1.0 / sl.n + 0.5) AS BIGINT)
           AS confidence_q,
       CAST(floor(dir2.n * nb.n * {q} * 1.0 / (sl.n * sr.n) + 0.5) AS BIGINT)
           AS lift_q
FROM dir2
JOIN isup sl ON sl.it = dir2.lhs
JOIN isup sr ON sr.it = dir2.rhs
CROSS JOIN nb
"""


# ---------------------------------------------------------------------------
# Connected components (general graph form)
# ---------------------------------------------------------------------------


def connected_components(
    edges,
    col_a: str = "a",
    col_b: str = "b",
) -> pa.Table:
    """Connected components of a general undirected graph — the
    community/reachability primitive ("which products belong to one
    co-purchase ecosystem"), promoted from the dedup pipeline to a
    first-class graph operator: the engine is
    :func:`~search_engine_ray.functions.dedup.dup_clusters`' hash-min
    label propagation (two groupbys over |E|+|V| rows per round,
    rounds = component diameter, scalar-sum convergence — no joins, no
    broadcasts, no driver-side graph above the documented edge
    threshold), re-keyed to graph vocabulary: ``(node, component,
    is_root)`` with ``component`` = min node id of the component and
    ``is_root`` marking the canonical node.

    Same loud non-negative-id rule as the dedup form (-1 is the label
    sentinel).  Isolated nodes (no edge) do not appear — a component
    of size one is the absence of edges, exactly as in the SQL twin's
    edge-derived node set.
    """
    from .dedup import dup_clusters

    t = dup_clusters(edges, col_a=col_a, col_b=col_b)
    return pa.table(
        {
            "node": t.column("doc_id"),
            "component": t.column("cluster_id"),
            "is_root": t.column("keep"),
        }
    )


def connected_components_sql(pairs_sql: str) -> str:
    """DuckDB oracle for :func:`connected_components` — the recursive
    closure over the same edge set (``pairs_sql`` must yield columns
    ``doc_a, doc_b``)."""
    from .dedup import dup_clusters_sql

    return f"""
SELECT doc_id AS node, cluster_id AS component, keep AS is_root
FROM ({dup_clusters_sql(pairs_sql)})
"""
