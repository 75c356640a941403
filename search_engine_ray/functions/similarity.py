"""Similarity search over an embedding column (``list<float>``):
brute-force cosine top-k (the baseline: numpy matmul per batch against
a broadcast query matrix) and an IVF-bucketed variant (the scale path:
search only the ``nprobe`` nearest of ``nlist`` coarse cells).
"""

from __future__ import annotations

from search_engine_ray.functions import actor_pool

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


from search_engine_ray.functions.veccol import (
    vec_matrix as _vm,
    vec_matrix_normalized as _vm_norm,
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _query_matrix(ds: rd.Dataset, id_col: str, vec_col: str, n_queries: int):
    import pyarrow.compute as pc

    q = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), n_queries)),
        batch_format="pyarrow",
    ).to_pandas()
    q = q.sort_values(id_col)
    return q[id_col].to_numpy(), _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))


def knn_bruteforce(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 8,
    k: int = 5,
) -> pa.Table:
    """Exact cosine top-k for the first ``n_queries`` vectors (query set
    = ``id < n_queries``), self-matches excluded. The query matrix is
    broadcast ONCE (ray.put); each batch emits its local top-k partials
    (k rows per query per batch); the driver merges the tiny partials.
    Deterministic tie-break: (cosine DESC, id ASC).
    """
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    ref = ray.put((qids, qmat))

    class PartialTopK:
        def __init__(self):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mat = _vm_norm(batch.column(vec_col))
            sims = self.qmat @ mat.T  # (nq, nb)
            out_q, out_v, out_c = [], [], []
            for r, qid in enumerate(self.qids):
                s = sims[r]
                mask = ids != qid
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
                out_q.extend([int(qid)] * len(top))
                out_v.extend(ids[top].tolist())
                out_c.extend(s[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        PartialTopK, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def range_search(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 8,
    threshold: float = 0.35,
) -> pa.Table:
    """Radius (range) search — EVERY neighbor with cosine >= threshold
    per probe query (the FAISS ``range_search`` / sklearn
    ``radius_neighbors`` shape, the "give me all near-duplicates of
    THIS doc" query knn's fixed k can't express). Query set = ``id <
    n_queries``, self-matches excluded. One broadcast of the bounded
    query matrix (ray.put once) + ONE scan: each batch emits its own
    rows' matches — no shuffle, no top-k merge, and unlike knn no
    driver-side rank pass at all; output size is threshold-bounded
    (the caller owns picking a threshold whose result fits — the same
    contract as embedding_dup_pairs). The threshold compare uses the
    UNROUNDED float64 cosine on both engines (the dedup precedent);
    the emitted column rounds half-away like DuckDB ``round``.
    Deterministic output order (query_id, neighbor_id).
    -> pa.Table(query_id, neighbor_id, cosine)."""
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    ref = ray.put((qids, qmat))

    class RangeFinder:
        def __init__(self):
            self.qids, self.qmat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mat = _vm_norm(batch.column(vec_col))
            sims = self.qmat @ mat.T  # (nq, nb)
            keep = sims >= threshold
            keep &= ids[None, :] != self.qids[:, None]  # no self-match
            r, c = np.nonzero(keep)
            return pa.table(
                {
                    "query_id": pa.array(self.qids[r], pa.int64()),
                    "neighbor_id": pa.array(ids[c], pa.int64()),
                    "cosine": pa.array(
                        np.floor(sims[r, c] * 1e6 + 0.5) / 1e6, pa.float64()
                    ),
                }
            )

    out = ds.select_columns([id_col, vec_col]).map_batches(
        RangeFinder, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    )
    parts = [t for t in ray.get(out.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    tbl = pa.concat_tables(parts)
    return tbl.sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])


def range_search_sql(src: str, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_queries: int = 8,
                     threshold: float = 0.35) -> str:
    """DuckDB oracle for :func:`range_search` (exact float64 cosine,
    unrounded threshold compare, rounded emit)."""
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM e WHERE {id_col} < {n_queries}),
s AS (
    SELECT q.query_id, e.{id_col} AS neighbor_id,
           list_cosine_similarity(q.qv, e.v) AS cos
    FROM q JOIN e ON e.{id_col} != q.query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cosine
FROM s WHERE cos >= {threshold}
"""


def knn_bruteforce_sql(src: str, id_col: str = "vec_id", vec_col: str = "embedding",
                       n_queries: int = 8, k: int = 5) -> str:
    """DuckDB oracle (float64 cosine on the CASTed list, same rounding
    and tie-break)."""
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM e WHERE {id_col} < {n_queries}),
s AS (
    SELECT q.query_id, e.{id_col}, list_cosine_similarity(q.qv, e.v) AS cos
    FROM q JOIN e ON e.{id_col} != q.query_id
),
ranked AS (
    SELECT query_id, {id_col}, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, {id_col}) AS rank
    FROM s
)
SELECT query_id, CAST(rank AS INT) AS rank, {id_col} AS neighbor_id,
       round(cos, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) ANN — the scale path
# ---------------------------------------------------------------------------

def train_centroids(ds: rd.Dataset, vec_col: str, nlist: int, iters: int = 8,
                    sample: int = 4096, seed: int = 11,
                    id_col: str = "vec_id") -> np.ndarray:
    """Seeded mini k-means on a driver-side sample (centroid training is
    O(sample); assignment stays distributed). The sample is the id-SORTED
    ``id < sample`` slice — ``limit()`` would return whichever blocks the
    executor finished first, making centroids (and every IVF result)
    nondeterministic across calls."""
    import pyarrow.compute as pc

    q = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), sample)),
        batch_format="pyarrow",
    ).to_pandas().sort_values(id_col)
    x = _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


def build_ivf_index(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
) -> tuple[rd.Dataset, np.ndarray]:
    """Persistent IVF index: train coarse centroids (seeded driver-side
    sample), then ONE distributed assignment pass adds a ``cell`` column.
    Returns (indexed dataset, centroids). Build once, query many — the
    round-1 verdict's 'persist the cell column' fix: repeated query sets
    reuse the assignment instead of recomputing it per batch per call
    (``write_parquet(partition_cols=['cell'])`` makes the cells physical
    partitions that ``knn_ivf`` probes can prune at the read)."""
    cents = train_centroids(ds, vec_col, nlist, id_col=id_col)
    cref = ray.put(cents)

    class AssignCell:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _vm_norm(batch.column(vec_col))
            cell = np.argmax(mat @ self.cents.T, axis=1).astype(np.int32)
            return batch.append_column("cell", pa.array(cell, pa.int32()))

    return (
        ds.map_batches(AssignCell, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0),
        cents,
    )


def knn_ivf(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 8,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    indexed: tuple[rd.Dataset, np.ndarray] | None = None,
) -> pa.Table:
    """IVF ANN: assign every vector to its nearest of ``nlist`` coarse
    centroids (one map pass, centroids broadcast — or a prebuilt
    ``indexed`` pair from :func:`build_ivf_index`, in which case the
    persisted ``cell`` column is filtered instead of recomputed), then
    each query scans only its ``nprobe`` nearest cells. Approximate —
    recall is asserted against :func:`knn_bruteforce` in tests, not an
    exact oracle."""
    if indexed is not None:
        return _knn_ivf_indexed(indexed, ds, id_col, vec_col, n_queries, k, nprobe)
    cents = train_centroids(ds, vec_col, nlist, id_col=id_col)
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((qids, qmat, cents, probe))

    class CellTopK:
        def __init__(self):
            self.qids, self.qmat, self.cents, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mat = _vm_norm(batch.column(vec_col))
            cell = np.argmax(mat @ self.cents.T, axis=1)
            out_q, out_v, out_c = [], [], []
            for r, qid in enumerate(self.qids):
                m = np.isin(cell, self.probe[r]) & (ids != qid)
                cand = np.flatnonzero(m)
                if not len(cand):
                    continue
                s = mat[cand] @ self.qmat[r]
                top = np.lexsort((ids[cand], -s))[:k]
                out_q.extend([int(qid)] * len(top))
                out_v.extend(ids[cand][top].tolist())
                out_c.extend(s[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        CellTopK, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def _knn_ivf_indexed(
    indexed: tuple[rd.Dataset, np.ndarray],
    ds: rd.Dataset,
    id_col: str,
    vec_col: str,
    n_queries: int,
    k: int,
    nprobe: int,
) -> pa.Table:
    """Query path over a prebuilt IVF index: filter the persisted cell
    column to the probed cells (a pushdown-friendly predicate; with
    cell-partitioned parquet this is partition pruning), score only the
    surviving vectors."""
    cell_ds, cents = indexed
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_cells = sorted({int(c) for row in probe for c in row})
    ref = ray.put((qids, qmat, probe))

    class ProbeTopK:
        def __init__(self):
            self.qids, self.qmat, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            cell = batch.column("cell").to_numpy(zero_copy_only=False)
            mat = _vm_norm(batch.column(vec_col))
            out_q, out_v, out_c = [], [], []
            for r, qid in enumerate(self.qids):
                m = np.isin(cell, self.probe[r]) & (ids != qid)
                cand = np.flatnonzero(m)
                if not len(cand):
                    continue
                s = mat[cand] @ self.qmat[r]
                top = np.lexsort((ids[cand], -s))[:k]
                out_q.extend([int(qid)] * len(top))
                out_v.extend(ids[cand][top].tolist())
                out_c.extend(s[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    import pyarrow.compute as pc_

    probed = cell_ds.map_batches(
        lambda b: b.filter(pc_.is_in(b.column("cell"), value_set=pa.array(probe_cells, pa.int32()))),
        batch_format="pyarrow",
    )
    parts = probed.map_batches(
        ProbeTopK, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Filtered ANN — top-k within a metadata predicate (the compound op real
# vector workloads hit immediately: "nearest neighbors WHERE label = X")
# ---------------------------------------------------------------------------

def _query_matrix_labeled(ds: rd.Dataset, id_col: str, vec_col: str,
                          filter_col: str, n_queries: int):
    import pyarrow.compute as pc

    q = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), n_queries)),
        batch_format="pyarrow",
    ).to_pandas().sort_values(id_col)
    return (
        q[id_col].to_numpy(),
        _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64)),
        q[filter_col].to_numpy(),
    )


def knn_filtered(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str = "label",
    n_queries: int = 8,
    k: int = 5,
    indexed: tuple[rd.Dataset, np.ndarray] | None = None,
    nprobe: int | None = None,
) -> pa.Table:
    """Predicate-constrained cosine top-k: each query's neighbors are
    restricted to vectors whose ``filter_col`` equals the query's own
    value (self excluded). Exact by default (filtered brute force, the
    oracle form — per-batch partial top-k against the broadcast query
    matrix, k-row driver merge). Pass a prebuilt ``indexed`` pair from
    :func:`build_ivf_index` (+ ``nprobe``) for the scale path: the
    persisted ``cell`` column prunes the scan to the probed cells BEFORE
    the predicate mask — with ``nprobe == nlist`` the result is pinned
    exactly equal to the filtered brute force (tests), below it recall
    is asserted, matching the unfiltered IVF contract."""
    qids, qmat, qlab = _query_matrix_labeled(ds, id_col, vec_col, filter_col, n_queries)

    probe = None
    source = ds
    if indexed is not None:
        import pyarrow.compute as pc_

        cell_ds, cents = indexed
        np_ = nprobe if nprobe is not None else len(cents)
        probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :np_]  # (nq, nprobe)
        probe_cells = sorted({int(c) for row in probe for c in row})
        source = cell_ds.map_batches(
            lambda b: b.filter(
                pc_.is_in(b.column("cell"), value_set=pa.array(probe_cells, pa.int32()))
            ),
            batch_format="pyarrow",
        )
    ref = ray.put((qids, qmat, qlab, probe))
    use_cell = indexed is not None

    class FilteredTopK:
        def __init__(self):
            self.qids, self.qmat, self.qlab, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            lab = batch.column(filter_col).to_numpy(zero_copy_only=False)
            cell = (
                batch.column("cell").to_numpy(zero_copy_only=False)
                if use_cell
                else None
            )
            mat = _vm_norm(batch.column(vec_col))
            out_q, out_v, out_c = [], [], []
            for r, qid in enumerate(self.qids):
                m = (ids != qid) & (lab == self.qlab[r])
                if cell is not None:
                    m &= np.isin(cell, self.probe[r])
                cand = np.flatnonzero(m)
                if not len(cand):
                    continue
                s = mat[cand] @ self.qmat[r]
                top = np.lexsort((ids[cand], -s))[:k]
                out_q.extend([int(qid)] * len(top))
                out_v.extend(ids[cand][top].tolist())
                out_c.extend(s[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    id_col: pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    cols = [id_col, vec_col, filter_col] + (["cell"] if use_cell else [])
    parts = source.select_columns(cols).map_batches(
        FilteredTopK, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def knn_filtered_sql(src: str, id_col: str = "vec_id", vec_col: str = "embedding",
                     filter_col: str = "label", n_queries: int = 8, k: int = 5) -> str:
    """DuckDB oracle for :func:`knn_filtered` (exact filtered cosine)."""
    return f"""
WITH e AS (SELECT {id_col}, {filter_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
q AS (SELECT {id_col} AS query_id, {filter_col} AS qlab, v AS qv
      FROM e WHERE {id_col} < {n_queries}),
s AS (
    SELECT q.query_id, e.{id_col}, list_cosine_similarity(q.qv, e.v) AS cos
    FROM q JOIN e ON e.{id_col} != q.query_id AND e.{filter_col} = q.qlab
),
ranked AS (
    SELECT query_id, {id_col}, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, {id_col}) AS rank
    FROM s
)
SELECT query_id, CAST(rank AS INT) AS rank, {id_col} AS neighbor_id,
       round(cos, 6) AS cosine
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Distributed k-means (spherical / cosine geometry) — the clustering
# primitive for embedding-space curation (SemDeDup-style cells, topic
# bucketing, stratified curation). train_centroids above fits on a
# driver-side SAMPLE (the IVF coarse quantizer); kmeans_fit runs Lloyd's
# over the FULL corpus: one map pass per iteration emitting k x d partial
# sums per batch — nothing corpus-sized ever reaches the driver.
# ---------------------------------------------------------------------------

def seed_centroids(
    ds: rd.Dataset, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic initial centroids: the id-sorted first ``k``
    vectors, L2-normalized. SQL-expressible (``WHERE id < k``), so
    assignment against these seeds has an exact DuckDB oracle."""
    import pyarrow.compute as pc

    q = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), k)),
        batch_format="pyarrow",
    ).to_pandas().sort_values(id_col)
    return _normalize(np.stack(q[vec_col].to_numpy()).astype(np.float64))


def kmeans_assign(
    ds: rd.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Assign every vector to its max-cosine centroid (ties -> lowest
    cluster id, matching ``row_number() OVER (ORDER BY cos DESC,
    cluster)``). Pure map: centroids broadcast once (ray.put), each
    batch is one (nb x d) @ (d x k) matmul — zero shuffles, streams at
    any corpus size. -> Dataset(id, cluster:int32, cosine:round6)."""
    cref = ray.put(_normalize(np.asarray(centroids, np.float64)))

    class Assign:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            mat = _vm_norm(batch.column(vec_col))
            sims = mat @ self.cents.T  # (nb, k)
            cl = np.argmax(sims, axis=1)  # first max == lowest cluster id
            cos = sims[np.arange(len(cl)), cl]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "cluster": pa.array(cl.astype(np.int32), pa.int32()),
                    "cosine": pa.array(np.round(cos, 6), pa.float64()),
                }
            )

    return ds.select_columns([id_col, vec_col]).map_batches(
        Assign, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    )


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float]]:
    """Distributed spherical k-means (Lloyd's) over the FULL embedding
    column. Init = :func:`seed_centroids` (deterministic). Each
    iteration is ONE ``map_batches`` pass: a batch assigns its vectors
    (argmax cosine) and emits per-cluster partials (count, float64
    sum-vector, cosine mass, batch min id) — k rows x d floats per
    batch, never the corpus. The driver combines partials in sorted
    (cluster, min_id) order so the float64 reduction order is
    deterministic at any block layout; empty clusters keep their
    previous centroid; new centroids are re-normalized (spherical
    k-means — the objective Σ cos(x, c_assigned) is non-decreasing
    under these updates). Returns (centroids, per-iteration objective).
    At 10^12 vectors: iters map passes, k x d driver state — the same
    shape Meta's SemDeDup pipeline uses for its cluster step.

    The projected source MATERIALIZES once and every Lloyd pass (and
    the seed scan) reuses the cached blocks — without it each iteration
    re-reads and re-decodes the parquet from storage. The blocks are
    object-store-resident with disk spill beyond memory; at the extreme
    scale where spilling the projection exceeds the cost of re-reading
    columnar storage per pass, drop the ``materialize()`` — the
    iteration loop is unchanged either way."""
    src = ds.select_columns([id_col, vec_col]).materialize()
    cents = seed_centroids(src, k, id_col, vec_col)
    objective: list[float] = []
    for _ in range(iters):
        cref = ray.put(cents)

        class Partials:
            def __init__(self):
                self.cents = ray.get(cref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)
                mat = _vm_norm(batch.column(vec_col))
                sims = mat @ self.cents.T
                cl = np.argmax(sims, axis=1)
                cos = sims[np.arange(len(cl)), cl]
                rows_c, rows_n, rows_v, rows_m, rows_s = [], [], [], [], []
                for j in np.unique(cl):
                    m = cl == j
                    rows_c.append(int(j))
                    rows_n.append(int(m.sum()))
                    rows_v.append(mat[m].sum(axis=0).tolist())
                    rows_m.append(int(ids[m].min()))
                    rows_s.append(float(cos[m].sum()))
                return pa.table(
                    {
                        "cluster": pa.array(rows_c, pa.int32()),
                        "n": pa.array(rows_n, pa.int64()),
                        "vsum": pa.array(rows_v, pa.list_(pa.float64())),
                        "min_id": pa.array(rows_m, pa.int64()),
                        "cos_sum": pa.array(rows_s, pa.float64()),
                    }
                )

        parts = src.map_batches(
            Partials, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
        ).to_pandas().sort_values(["cluster", "min_id"])
        objective.append(float(parts["cos_sum"].to_numpy().sum()))
        new = cents.copy()
        for j, g in parts.groupby("cluster"):
            vs = np.stack(g["vsum"].to_numpy())
            new[int(j)] = vs.sum(axis=0) / g["n"].to_numpy().sum()
        cents = _normalize(new)
    return cents, objective


def kmeans_assign_sql(
    src: str, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle for :func:`kmeans_assign` over :func:`seed_centroids`
    (centroids = the ``id < k`` vectors; list_cosine_similarity is
    normalization-invariant, so raw vectors give the same cosines)."""
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
c AS (SELECT {id_col} AS cluster, v AS cv FROM e WHERE {id_col} < {k}),
s AS (
    SELECT e.{id_col}, c.cluster, list_cosine_similarity(c.cv, e.v) AS cos
    FROM e CROSS JOIN c
),
ranked AS (
    SELECT {id_col}, cluster, cos,
           row_number() OVER (
               PARTITION BY {id_col} ORDER BY cos DESC, cluster
           ) AS rn
    FROM s
)
SELECT {id_col}, CAST(cluster AS INT) AS cluster, round(cos, 6) AS cosine
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Scalar quantization (int8 codes) — the memory-scale path for vectors
# ---------------------------------------------------------------------------


def _dim_minmax(ds: rd.Dataset, vec_col: str):
    """Global per-dimension (min, max) in TWO tiny steps: per-block
    partials (one d-sized row pair per block) fold through one
    groupby(dim) — d rows return to the driver (parameter-bounded, the
    DSIR-histogram shape). -> (vmin, vmax) float64 arrays."""
    from ray.data.aggregate import Max, Min

    def partials(batch: pa.Table) -> pa.Table:
        mat = _vm(batch.column(vec_col))
        return pa.table(
            {
                "dim": pa.array(np.arange(mat.shape[1], dtype=np.int64), pa.int64()),
                "vmin": pa.array(mat.min(axis=0), pa.float64()),
                "vmax": pa.array(mat.max(axis=0), pa.float64()),
            }
        )

    mm = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("vmin", alias_name="vmin"), Max("vmax", alias_name="vmax"))
        .to_pandas()
        .sort_values("dim")
    )
    return mm["vmin"].to_numpy(), mm["vmax"].to_numpy()


def quantize_embeddings(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scalar (int8-range) quantization of the embedding column — the
    standard 4x memory compression vector stores apply before ANN
    (FAISS SQ8 / Lucene scalar quantizer): per dimension, an affine map
    of [min, max] onto integer codes 0..255,

        code = clip(floor((x - min) / (max - min) * 255), 0, 255)

    with a constant dimension (max == min) coding to 0. DETERMINISTIC
    float64 math in a fixed op order, so the DuckDB oracle reproduces
    every code exactly. Two passes: the d-sized min/max fold
    (:func:`_dim_minmax`, parameter-bounded), then one pure map — the
    (min, max) vectors ride ``ray.put`` once. Returns the LONG code
    frame (id, dim, code) so the oracle compares integer rows;
    :func:`knn_quantized` consumes the same codes reconstructed
    (dequantized) for search, with recall vs the exact float path
    pinned by test."""
    vmin, vmax = _dim_minmax(ds, vec_col)
    ref = ray.put((vmin, vmax))

    def codes(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _vm(batch.column(vec_col))
        scale = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (mat - lo) / scale
        t[:, scale == 0] = 0.0
        c = np.clip(np.floor(t * 255.0), 0, 255).astype(np.int64)
        d = mat.shape[1]
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(ids)), pa.int64()),
                "code": pa.array(c.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(codes, batch_format="pyarrow")


def quantize_embeddings_sql(src: str, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """DuckDB oracle for :func:`quantize_embeddings` — same float64
    widening, same op order ((x - min) / (max - min) * 255, floor,
    clip), same constant-dimension rule."""
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
x AS (
    SELECT {id_col}, i - 1 AS dim, v[i] AS x
    FROM e, UNNEST(range(1, len(v) + 1)) AS r(i)
),
mm AS (SELECT dim, min(x) AS vmin, max(x) AS vmax FROM x GROUP BY dim)
SELECT x.{id_col}, CAST(x.dim AS BIGINT) AS dim,
       CAST(CASE WHEN mm.vmax = mm.vmin THEN 0
            ELSE least(255, greatest(0, floor((x.x - mm.vmin) / (mm.vmax - mm.vmin) * 255.0)))
       END AS BIGINT) AS code
FROM x JOIN mm ON mm.dim = x.dim
"""


def knn_quantized(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 8,
    k: int = 5,
) -> pa.Table:
    """Brute-force cosine top-k over the DEQUANTIZED int8 codes
    (x_hat = min + (code + 0.5)/256 * (max - min), the reconstruction
    midpoint): the compressed-memory sibling of :func:`knn_bruteforce` —
    same per-block partial top-k shape, 4x smaller resident vectors at
    scale. Approximate by construction; recall vs the exact float path
    is pinned by test (the driver-gated exactness lives on the CODES,
    :func:`quantize_embeddings`). Queries stay full-precision (the
    asymmetric-distance convention)."""
    vmin, vmax = _dim_minmax(ds, vec_col)
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    ref = ray.put((vmin, vmax, qids, qmat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        lo, hi, qi, qm = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _vm(batch.column(vec_col))
        scale = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (mat - lo) / scale
        t[:, scale == 0] = 0.0
        c = np.clip(np.floor(t * 255.0), 0, 255)
        deq = lo + (c + 0.5) / 256.0 * scale
        deq = _normalize(deq)
        sims = qm @ deq.T
        out_q, out_v, out_c = [], [], []
        for r, qid in enumerate(qi):
            s = sims[r]
            cand = np.flatnonzero(ids != qid)
            if not len(cand):
                continue
            top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(ids[top].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow"
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ codes + ADC search) — the sub-byte-per-dim
# memory-scale path for vectors (Jégou, Douze & Schmid, TPAMI 2011)
# ---------------------------------------------------------------------------


def _normalize_seq(mat: np.ndarray) -> np.ndarray:
    """L2 row-normalize with LEFT-TO-RIGHT squared-sum accumulation —
    binary float64 adds in dimension order, the exact op sequence a SQL
    expression ``sqrt(v[1]*v[1] + v[2]*v[2] + ...)`` evaluates — so the
    PQ code oracle compares bit-identical normalized coordinates
    (np.linalg.norm's pairwise summation would differ in ulps; codes
    are INTEGER-compared, so even a tie-flip would be a row mismatch).
    Same 1e-12 zero guard as :func:`_normalize`."""
    s = mat[:, 0] * mat[:, 0]
    for j in range(1, mat.shape[1]):
        s = s + mat[:, j] * mat[:, j]
    return mat / np.maximum(np.sqrt(s)[:, None], 1e-12)


def _pq_dists(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared L2 from every row of ``sub`` (n, dsub) to every centroid
    (k, dsub), accumulated left-to-right over dimensions (the SQL
    expression's op order). -> (n, k) float64."""
    diff = sub[:, None, :] - cents[None, :, :]
    sq = diff * diff
    d = sq[..., 0]
    for j in range(1, sq.shape[-1]):
        d = d + sq[..., j]
    return d


def pq_seed_codebooks(
    ds: rd.Dataset, m: int = 8, n_cents: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic PQ seed codebooks: the id-sorted first ``n_cents``
    vectors, L2-normalized (sequential op order), split into ``m``
    contiguous subspaces — SQL-expressible (``WHERE id < n_cents``), so
    encoding against the seeds has an exact DuckDB oracle (the
    ``seed_centroids``/``cluster_assign`` device). -> (m, n_cents,
    d/m) float64."""
    import pyarrow.compute as pc

    q = ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), n_cents)),
        batch_format="pyarrow",
    ).to_pandas().sort_values(id_col)
    mat = _normalize_seq(np.stack(q[vec_col].to_numpy()).astype(np.float64))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return mat.reshape(len(mat), m, d // m).transpose(1, 0, 2).copy()


def pq_fit(
    ds: rd.Dataset, m: int = 8, n_cents: int = 16, iters: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float]]:
    """Distributed PQ codebook fit: per-subspace EUCLIDEAN k-means
    (Lloyd's), ALL ``m`` subspaces in the SAME map pass — each batch
    assigns its subvectors (argmin L2, ties lowest code) and emits
    per-(sub, cluster) partials (count, float64 sum-vector, squared
    -error mass, batch min id): at most m*n_cents rows x d/m floats per
    batch, never the corpus. The driver folds partials in sorted
    (sub, cluster, min_id) order (deterministic float64 reduction at a
    FIXED partitioning; empty clusters keep their previous centroid).
    Lloyd's SSE objective is non-increasing — pinned by test. At 10^12
    vectors: ``iters`` map passes, m*n_cents*dsub driver state.
    Returns (codebooks (m, n_cents, dsub), per-iteration SSE)."""
    cents = pq_seed_codebooks(ds, m, n_cents, id_col, vec_col)
    dsub = cents.shape[2]
    sse: list[float] = []
    src = ds.select_columns([id_col, vec_col])
    for _ in range(iters):
        cref = ray.put(cents)

        class Partials:
            def __init__(self):
                self.cents = ray.get(cref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)
                mat = _normalize_seq(
                    _vm(batch.column(vec_col))
                )
                mm, kk, ds_ = self.cents.shape
                subs = mat.reshape(len(mat), mm, ds_)
                r_s, r_c, r_n, r_v, r_e, r_m = [], [], [], [], [], []
                for s in range(mm):
                    dist = _pq_dists(subs[:, s, :], self.cents[s])
                    cl = np.argmin(dist, axis=1)
                    err = dist[np.arange(len(cl)), cl]
                    for j in np.unique(cl):
                        sel = cl == j
                        r_s.append(s)
                        r_c.append(int(j))
                        r_n.append(int(sel.sum()))
                        r_v.append(subs[sel, s, :].sum(axis=0).tolist())
                        r_e.append(float(err[sel].sum()))
                        r_m.append(int(ids[sel].min()))
                return pa.table(
                    {
                        "sub": pa.array(r_s, pa.int32()),
                        "cluster": pa.array(r_c, pa.int32()),
                        "n": pa.array(r_n, pa.int64()),
                        "vec": pa.array(r_v, pa.list_(pa.float64())),
                        "err": pa.array(r_e, pa.float64()),
                        "min_id": pa.array(r_m, pa.int64()),
                    }
                )

        parts = src.map_batches(Partials, batch_format="pyarrow",
                                concurrency=actor_pool(), max_restarts=0).to_pandas()
        parts = parts.sort_values(["sub", "cluster", "min_id"])
        new = cents.copy()
        total_err = 0.0
        for (s, j), g in parts.groupby(["sub", "cluster"], sort=True):
            cnt = int(g["n"].sum())
            total_err += float(g["err"].sum())
            if cnt:
                vec = np.zeros(dsub, np.float64)
                for v in g["vec"]:
                    vec = vec + np.asarray(v, np.float64)
                new[s, j] = vec / cnt
        sse.append(total_err)
        cents = new
    return cents, sse


def pq_encode(
    ds: rd.Dataset, codebooks: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> rd.Dataset:
    """PQ-encode every vector: per contiguous subspace, the argmin-L2
    centroid code (ties -> lowest code, matching ``row_number() OVER
    (ORDER BY dist, cent)``). Pure map — codebooks broadcast once
    (ray.put), zero shuffles, streams at any corpus size. Returns the
    LONG integer frame (id, sub, code) so the oracle hash-compares
    integer rows (the ``quantize_embeddings`` convention); m codes of
    log2(k) bits each is the d*4-bytes -> m-bytes compression ANN
    memory budgets at 10^12 vectors require."""
    cref = ray.put(np.asarray(codebooks, np.float64))

    class Encode:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize_seq(
                _vm(batch.column(vec_col))
            )
            mm, kk, ds_ = self.cents.shape
            subs = mat.reshape(len(mat), mm, ds_)
            codes = np.empty((len(mat), mm), np.int64)
            for s in range(mm):
                codes[:, s] = np.argmin(_pq_dists(subs[:, s, :], self.cents[s]), axis=1)
            return pa.table(
                {
                    id_col: pa.array(np.repeat(ids, mm), pa.int64()),
                    "sub": pa.array(np.tile(np.arange(mm, dtype=np.int64), len(ids)), pa.int64()),
                    "code": pa.array(codes.ravel(), pa.int64()),
                }
            )

    return ds.select_columns([id_col, vec_col]).map_batches(
        Encode, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0
    )


def pq_encode_sql(src: str, m: int = 8, n_cents: int = 16, d: int = 64,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB oracle for :func:`pq_encode` over the SEED codebooks
    (``id < n_cents`` — the SQL-expressible fit-free codebook, the
    ``kmeans_assign_sql`` device): explicit left-to-right squared-sum
    normalization and distance expressions mirror the engine's exact
    float64 op order, so the integer codes hash-compare exactly."""
    dsub = d // m
    sq_terms = " + ".join(f"v[{j}] * v[{j}]" for j in range(1, d + 1))
    sub_branches = " UNION ALL ".join(
        "SELECT " + id_col + f", {s} AS sub, "
        + ", ".join(f"vn[{s * dsub + j}] AS x{j}" for j in range(1, dsub + 1))
        + " FROM n"
        for s in range(m)
    )
    cb_branches = " UNION ALL ".join(
        "SELECT " + id_col + f" AS cent, {s} AS sub, "
        + ", ".join(f"vn[{s * dsub + j}] AS c{j}" for j in range(1, dsub + 1))
        + " FROM n WHERE " + id_col + f" < {n_cents}"
        for s in range(m)
    )
    dist = " + ".join(
        f"(s.x{j} - c.c{j}) * (s.x{j} - c.c{j})" for j in range(1, dsub + 1)
    )
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src}),
n AS (
    SELECT {id_col},
           list_transform(v, x -> x / greatest(sqrt({sq_terms}), 1e-12)) AS vn
    FROM e
),
subs AS ({sub_branches}),
cb AS ({cb_branches}),
dists AS (
    SELECT s.{id_col}, s.sub, c.cent, {dist} AS dist
    FROM subs s JOIN cb c ON c.sub = s.sub
),
ranked AS (
    SELECT {id_col}, sub, cent,
           row_number() OVER (
               PARTITION BY {id_col}, sub ORDER BY dist, cent
           ) AS rn
    FROM dists
)
SELECT {id_col}, CAST(sub AS BIGINT) AS sub, CAST(cent AS BIGINT) AS code
FROM ranked WHERE rn = 1
"""


def knn_pq(
    ds: rd.Dataset, m: int = 16, n_cents: int = 64, iters: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_queries: int = 8, k: int = 5,
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k over FITTED PQ codes: queries
    stay full-precision; each query precomputes an (m x n_cents) dot
    table against the codebooks, and a database vector's approximate
    cosine is the sum of m table lookups at its codes — the FAISS
    IVF-PQ inner loop, d multiply-adds replaced by m lookups. Same
    per-block partial top-k + k-row driver merge as
    :func:`knn_bruteforce`; approximate by construction (codes
    quantize), recall vs the exact float path pinned by test — the
    driver-gated exactness lives on the CODES (:func:`pq_encode`).

    Measured on the synthetic embeddings (sf0.01, 500 vecs): the
    defaults (96-bit codes, 16x compression) reach recall@5 ~0.65 vs
    exact — BOUNDED BY THE DATA, not the math: the corpus's true
    top-10 cosines cluster within ~0.01-0.05 of each other while the
    mean ADC reconstruction error is ~0.036, so fine-grained neighbor
    order is unresolvable at any practical code size (8x64 reaches
    0.30, 32x64 0.75). Real embedding corpora with separated neighbors
    sit far higher; the recall test pins >= 0.5 with this analysis."""
    cents, _sse = pq_fit(ds, m, n_cents, iters, id_col, vec_col)
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    qn = _normalize_seq(np.asarray(qmat, np.float64))
    mm, kk, dsub = cents.shape
    qsubs = qn.reshape(len(qn), mm, dsub)
    # (n_q, m, k): query-side ADC tables — the only query-time float work
    tables = np.einsum("qsd,skd->qsk", qsubs, cents)
    ref = ray.put((cents, qids, tables))

    def partial_topk(batch: pa.Table) -> pa.Table:
        cb, qi, tabs = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_seq(
            _vm(batch.column(vec_col))
        )
        mm_, kk_, ds_ = cb.shape
        subs = mat.reshape(len(mat), mm_, ds_)
        codes = np.empty((len(mat), mm_), np.int64)
        for s in range(mm_):
            codes[:, s] = np.argmin(_pq_dists(subs[:, s, :], cb[s]), axis=1)
        # ADC: sims[q, i] = sum_s tabs[q, s, codes[i, s]]
        sims = tabs[:, np.arange(mm_)[None, :], codes].sum(axis=2)  # (n_q, n)
        out_q, out_v, out_c = [], [], []
        for r, qid in enumerate(qi):
            s = sims[r]
            cand = np.flatnonzero(ids != qid)
            if not len(cand):
                continue
            top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(ids[top].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow"
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def knn_ivfpq(
    ds: rd.Dataset, m: int = 16, n_cents: int = 64, iters: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_queries: int = 8, k: int = 5,
    nlist: int = 16, nprobe: int = 4,
) -> pa.Table:
    """IVF-PQ ANN — the composition that IS the FAISS memory-AND-compute
    scale path (IndexIVFPQ, ``by_residual=False``): the coarse IVF
    quantizer prunes each query's scan to its ``nprobe`` nearest of
    ``nlist`` cells, and within the probed cells vectors score by ADC
    over their PQ codes (m table lookups instead of d multiply-adds).
    At 10^12 vectors the two levers compound: codes shrink memory
    ~16x (m bytes vs 4d) and cells shrink compute nprobe/nlist —
    neither alone suffices. Raw-vector PQ (not FAISS's default
    residual encoding) keeps the codes identical to :func:`pq_encode`'s
    driver-gated exact frame; residual PQ would buy accuracy at the
    cost of per-cell codebook state and is noted as the next rung.

    One map pass per query set: coarse centroids + codebooks + query
    ADC tables broadcast once (ray.put); per batch the cell assign,
    the code assign and the masked ADC lookups are all vectorized;
    then the standard per-block partial top-k + k-row driver merge.
    ``nprobe == nlist`` degenerates to :func:`knn_pq` EXACTLY (no
    cell is pruned — the pinned composition identity); approximate
    otherwise (recall vs the exact float path asserted by test, with
    :func:`knn_pq`'s near-tie-neighbor analysis applying on top of
    the IVF pruning loss)."""
    coarse = train_centroids(ds, vec_col, nlist, id_col=id_col)
    cents, _sse = pq_fit(ds, m, n_cents, iters, id_col, vec_col)
    qids, qmat = _query_matrix(ds, id_col, vec_col, n_queries)
    qn = _normalize_seq(np.asarray(qmat, np.float64))
    mm, kk, dsub = cents.shape
    qsubs = qn.reshape(len(qn), mm, dsub)
    tables = np.einsum("qsd,skd->qsk", qsubs, cents)
    probe = np.argsort(-(qn @ coarse.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((coarse, cents, qids, tables, probe))

    def partial_topk(batch: pa.Table) -> pa.Table:
        crs, cb, qi, tabs, prb = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_seq(
            _vm(batch.column(vec_col))
        )
        cell = np.argmax(mat @ crs.T, axis=1)
        mm_, kk_, ds_ = cb.shape
        subs = mat.reshape(len(mat), mm_, ds_)
        codes = np.empty((len(mat), mm_), np.int64)
        for s in range(mm_):
            codes[:, s] = np.argmin(_pq_dists(subs[:, s, :], cb[s]), axis=1)
        sims = tabs[:, np.arange(mm_)[None, :], codes].sum(axis=2)  # (n_q, n)
        out_q, out_v, out_c = [], [], []
        for r, qid in enumerate(qi):
            cand = np.flatnonzero(np.isin(cell, prb[r]) & (ids != qid))
            if not len(cand):
                continue
            s = sims[r]
            top = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(ids[top].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial_topk, batch_format="pyarrow"
    ).to_pandas()
    rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        for rank, (_, row) in enumerate(g.iterrows(), start=1):
            rows.append((int(qid), rank, int(row[id_col]), round(float(row["cosine"]), 6)))
    rows.sort()
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "neighbor_id": pa.array([r[2] for r in rows], pa.int64()),
            "cosine": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Exact distributed covariance / correlation matrix (PCA prep)
# ---------------------------------------------------------------------------

COV_QUANT = 1_000_000.0


def embed_covariance(
    ds: rd.Dataset,
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact sample covariance AND Pearson correlation matrix of the
    embedding dimensions — the moment pass every PCA / whitening /
    feature-decorrelation step runs first, as one distributed
    scan: out d*d rows ``(i, j, cov, corr)`` (1-based dims, full
    symmetric matrix, (i, j) sorted).

    Exactness device: each float32 component quantizes to int64
    (``round(v * 1e6)`` — the identical double expression both
    engines), every block folds to ONE d x d integer Gram matrix
    ``X^T X`` plus column sums via an int64 matmul, the single
    groupby ships |d^2 + d| numbers per block (never rows), and the
    centered moments ``n*Sij - Si*Sj`` are exact integers, so ``cov =
    float(m_ij) / (float(n*(n-1)) * 1e12)`` and ``corr = float(m_ij)
    / sqrt(float(m_ii) * float(m_jj))`` (quantization cancels) are
    IDENTICAL float expressions both engines — bit-exact at any block
    layout.  Zero-variance dims emit NULL corr.  int64 headroom:
    |component| <= ~2.0 quantized keeps X^T X safe through ~1e6 rows
    per block and the HUGEINT-mirrored Python-int finish exact at any
    n.  The d x d finish is driver-side — bounded by DIMENSION, not
    data (the lemma-dict "honest small side" rule).

    SQL twin: unnest WITH ORDINALITY + a dim self-join per vec_id —
    O(n * d^2) rows, sf0.01-scale only; the engine's matmul fold is
    the scale path.
    """
    import math

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int32()),
                    "j": pa.array([], pa.int32()),
                    "s": pa.array([], pa.int64()),
                }
            )
        x = _vm(b.column(vec_col))
        q = (np.floor(np.abs(x) * COV_QUANT + 0.5) * np.sign(x)).astype(
            np.int64
        )
        d = q.shape[1]
        gram = q.T @ q  # int64 matmul, exact
        sums = q.sum(axis=0)
        n = q.shape[0]
        ii, jj = np.meshgrid(
            np.arange(1, d + 1, dtype=np.int32),
            np.arange(1, d + 1, dtype=np.int32),
            indexing="ij",
        )
        # tagged rows: (i, j, gram_ij); (i, 0, sum_i); (0, 0, n)
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate(
                        [ii.ravel(), np.arange(1, d + 1, dtype=np.int32),
                         np.array([0], np.int32)]
                    ),
                    pa.int32(),
                ),
                "j": pa.array(
                    np.concatenate(
                        [jj.ravel(), np.zeros(d, np.int32),
                         np.array([0], np.int32)]
                    ),
                    pa.int32(),
                ),
                "s": pa.array(
                    np.concatenate(
                        [gram.ravel(), sums, np.array([n], np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.select_columns([vec_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["i", "j"])
        .aggregate(_Sum("s", alias_name="s"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "i": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64()),
            "cov": pa.array([], pa.float64()),
            "corr": pa.array([], pa.float64()),
        }
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    gram: dict = {}
    sums: dict = {}
    n = 0
    for i, j, s in zip(
        t.column("i").to_numpy(zero_copy_only=False),
        t.column("j").to_numpy(zero_copy_only=False),
        t.column("s").to_numpy(zero_copy_only=False),
    ):
        if i == 0:
            n = int(s)
        elif j == 0:
            sums[int(i)] = int(s)
        else:
            gram[(int(i), int(j))] = int(s)
    if n < 2 or not gram:
        return empty
    d = max(sums)
    rows_i, rows_j, covs, corrs = [], [], [], []
    m = {
        (i, j): n * gram[(i, j)] - sums[i] * sums[j]
        for (i, j) in gram
    }
    denom = float(n * (n - 1)) * (COV_QUANT * COV_QUANT)
    for i in range(1, d + 1):
        for j in range(1, d + 1):
            mij = m[(i, j)]
            rows_i.append(i)
            rows_j.append(j)
            covs.append(float(mij) / denom)
            mii, mjj = m[(i, i)], m[(j, j)]
            corrs.append(
                float(mij) / math.sqrt(float(mii) * float(mjj))
                if mii > 0 and mjj > 0
                else None
            )
    return pa.table(
        {
            "i": pa.array(rows_i, pa.int64()),
            "j": pa.array(rows_j, pa.int64()),
            "cov": pa.array(covs, pa.float64()),
            "corr": pa.array(corrs, pa.float64()),
        }
    )


def embed_covariance_sql(
    src: str = "embeddings", vec_col: str = "embedding"
) -> str:
    """DuckDB oracle for :func:`embed_covariance` — the same quantized
    integer moments via unnest WITH ORDINALITY + a per-vector dim
    self-join (O(n*d^2): oracle-scale only), the same single-cast
    float expressions."""
    q = int(COV_QUANT)
    return f"""
WITH flat AS (
    SELECT vec_id,
           generate_subscripts({vec_col}, 1) AS dim,
           CAST(round(CAST(unnest({vec_col}) AS DOUBLE) * {q}) AS BIGINT)
               AS qv
    FROM {src}
),
nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM flat),
moms AS (
    SELECT a.dim AS i, b.dim AS j,
           SUM(CAST(a.qv AS HUGEINT) * b.qv) AS gram,
           SUM(CAST(a.qv AS HUGEINT)) AS si,
           SUM(CAST(b.qv AS HUGEINT)) AS sj
    FROM flat a JOIN flat b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
),
m AS (
    SELECT i, j,
           CAST(nn.n AS HUGEINT) * gram - si * sj AS mij
    FROM moms, nn
)
SELECT CAST(a.i AS BIGINT) AS i, CAST(a.j AS BIGINT) AS j,
       CAST(a.mij AS DOUBLE)
       / (CAST(nn.n * (nn.n - 1) AS DOUBLE) * {q * q}.0) AS cov,
       CASE WHEN dii.mij > 0 AND djj.mij > 0
            THEN CAST(a.mij AS DOUBLE)
                 / sqrt(CAST(dii.mij AS DOUBLE) * CAST(djj.mij AS DOUBLE))
       END AS corr
FROM m a
JOIN m dii ON dii.i = a.i AND dii.j = a.i
JOIN m djj ON djj.i = a.j AND djj.j = a.j
CROSS JOIN nn
ORDER BY a.i, a.j
"""


def embed_pca(
    ds: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_components: int = 2,
) -> rd.Dataset:
    """PCA projection of the embedding column onto its top
    ``n_components`` principal axes — the dimensionality-reduction /
    visualization step downstream of :func:`embed_covariance`:
    out (vec_id, pc1..pcK).

    Plan: ONE moment scan (the :func:`embed_covariance` partial — a
    per-block int64 Gram matmul + column sums, tagged rows, one
    |d^2 + d|-row groupby), a d x d eigendecomposition on the DRIVER
    (``numpy.linalg.eigh`` — bounded by dimension, not data; symmetric
    so deterministic up to sign, which is fixed by the
    largest-|component|-positive convention), then a ZERO-SHUFFLE
    projection map: ``y = (v - mean) @ V``.  Total: two scans, one
    tiny exchange, nothing corpus-sized anywhere.

    Eigenvectors are not SQL-expressible, so this op has no value
    oracle; instead the tests pin the algebra: components are
    orthonormal, per-component projection variance equals the
    eigenvalue (to float tolerance), projections are block-layout
    invariant (per-row arithmetic), and the sign convention is
    stable.
    """
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # empty blocks happen under load (the rel_cube flake class);
            # return the typed empty tagged table like embed_covariance
            return pa.table(
                {
                    "i": pa.array([], pa.int32()),
                    "j": pa.array([], pa.int32()),
                    "s": pa.array([], pa.int64()),
                }
            )
        x = _vm(b.column(vec_col))
        q = (np.floor(np.abs(x) * COV_QUANT + 0.5) * np.sign(x)).astype(
            np.int64
        )
        d = q.shape[1]
        gram = q.T @ q
        sums = q.sum(axis=0)
        ii, jj = np.meshgrid(
            np.arange(1, d + 1, dtype=np.int32),
            np.arange(1, d + 1, dtype=np.int32),
            indexing="ij",
        )
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate(
                        [ii.ravel(), np.arange(1, d + 1, dtype=np.int32),
                         np.array([0], np.int32)]
                    ),
                    pa.int32(),
                ),
                "j": pa.array(
                    np.concatenate(
                        [jj.ravel(), np.zeros(d, np.int32),
                         np.array([0], np.int32)]
                    ),
                    pa.int32(),
                ),
                "s": pa.array(
                    np.concatenate(
                        [gram.ravel(), sums,
                         np.array([q.shape[0]], np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.select_columns([vec_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["i", "j"])
        .aggregate(_Sum("s", alias_name="s"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        raise ValueError("embed_pca: empty input")
    t = pa.concat_tables(tabs)
    gram: dict = {}
    sums: dict = {}
    n = 0
    for i, j, s in zip(
        t.column("i").to_numpy(zero_copy_only=False),
        t.column("j").to_numpy(zero_copy_only=False),
        t.column("s").to_numpy(zero_copy_only=False),
    ):
        if i == 0:
            n = int(s)
        elif j == 0:
            sums[int(i)] = int(s)
        else:
            gram[(int(i), int(j))] = int(s)
    d = max(sums)
    if n < 2:
        raise ValueError("embed_pca: need >= 2 vectors")
    if n_components > d:
        raise ValueError(
            f"embed_pca: n_components={n_components} exceeds dim={d}"
        )
    cov = np.empty((d, d), np.float64)
    for i in range(1, d + 1):
        for j in range(1, d + 1):
            cov[i - 1, j - 1] = float(
                n * gram[(i, j)] - sums[i] * sums[j]
            ) / (float(n * (n - 1)) * (COV_QUANT * COV_QUANT))
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :n_components]  # eigh ascends; take top-K
    # sign convention: the largest-|.| entry of each component positive
    for k in range(n_components):
        a = comps[:, k]
        if a[np.argmax(np.abs(a))] < 0:
            comps[:, k] = -a
    mean = np.array(
        [sums[i] for i in range(1, d + 1)], np.float64
    ) / (n * COV_QUANT)
    comps_ref = ray.put(comps)
    mean_ref = ray.put(mean)

    def project(b: pa.Table) -> pa.Table:
        c = ray.get(comps_ref)
        m = ray.get(mean_ref)
        if b.num_rows == 0:
            cols = {id_col: b.column(id_col)}
            for k in range(c.shape[1]):
                cols[f"pc{k + 1}"] = pa.array([], pa.float64())
            return pa.table(cols)
        x = _vm(b.column(vec_col))
        xc = x - m
        cols = {id_col: b.column(id_col)}
        # per-component elementwise-multiply + axis-1 pairwise sum, NOT
        # a dgemm: BLAS blocking varies with the BATCH shape and moves
        # the last ulp across layouts; the fixed-length row reduction
        # depends only on d, so projections are block-layout EXACT
        for k in range(c.shape[1]):
            cols[f"pc{k + 1}"] = pa.array(
                (xc * c[:, k]).sum(axis=1), pa.float64()
            )
        return pa.table(cols)

    return ds.select_columns([id_col, vec_col]).map_batches(
        lambda t: project(t.replace_schema_metadata(None)),
        batch_format="pyarrow",
    )
