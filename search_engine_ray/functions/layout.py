"""Data-layout operators — Z-order (Morton) clustering, the
space-filling-curve layout primitive behind Delta Lake ``OPTIMIZE
ZORDER BY`` / ClickHouse ``mortonEncode`` ordering (Morton 1966;
Orenstein & Merrett 1984 — the published multi-dimensional indexing
device).

Why a 100 TB engine needs it: a table sorted by ONE column prunes
row-groups on that column only — a selective 2-D box query (user AND
time range) still scans every block.  Interleaving the bits of both
key columns into one sort key gives every output block a TIGHT min-max
envelope on BOTH dimensions simultaneously, so standard per-block
min/max statistics (the parquet row-group stats the query planner
already prunes with — ``search.py`` J3) prune multi-dimensional
predicates.  The z-value computation is a zero-shuffle vectorized map;
the ONE exchange is the sort — the same cost as any single-column
layout rewrite, but the pruning works on every interleaved dimension.

Exactness device: each column min-max scales to ``bits_per_dim`` bits
with pure int64 arithmetic ``(v - mn) * (2^b - 1) // (mx - mn)`` and
the interleave is 2*b mask-shift terms — both expressible verbatim in
DuckDB (``//``, ``>>``, ``&``), so the SQL twin matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

ZORDER_BITS = 16  # per-dimension resolution (2 dims -> 32-bit z-value)


def _int64_col(batch: pa.Table, col: str) -> np.ndarray:
    """Column as int64 (timestamps as epoch-µs).  Nulls are refused
    loudly — a silent null->0 fold would z-cluster every null row into
    the min corner and corrupt the layout's pruning envelope."""
    c = batch.column(col)
    if c.null_count:
        raise ValueError(f"zorder column {col!r} contains nulls")
    arr = c.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":  # datetime64 -> epoch counts
        return arr.astype("datetime64[us]").view(np.int64)
    return arr.astype(np.int64)


def zorder_key(
    ds: rd.Dataset,
    cols: tuple[str, str],
    id_col: str = "event_id",
    bits_per_dim: int = ZORDER_BITS,
) -> rd.Dataset:
    """-> Dataset(id_col, zval int64): the Morton z-value per row over
    two integer/timestamp columns, each min-max scaled to
    ``bits_per_dim`` bits against the GLOBAL column range (two scalar
    aggregates — the only non-map work besides the caller's sort).
    A constant column scales to 0 everywhere (degenerates to the other
    dimension's order, still correct)."""
    if not 1 <= bits_per_dim <= 31:
        raise ValueError(f"bits_per_dim must be in [1, 31], got {bits_per_dim}")
    if len(cols) != 2:
        raise ValueError(f"zorder_key interleaves exactly 2 columns, got {cols}")
    top = (1 << bits_per_dim) - 1

    # global per-column ranges: one tiny aggregate over the pruned read
    stats = {}
    agg = ds.select_columns(list(cols)).map_batches(
        lambda b: pa.table({
            f"mn_{c}": pa.array([_int64_col(b, c).min() if b.num_rows else None],
                                pa.int64())
            for c in cols
        } | {
            f"mx_{c}": pa.array([_int64_col(b, c).max() if b.num_rows else None],
                                pa.int64())
            for c in cols
        }),
        batch_format="pyarrow",
    ).take_all()
    for c in cols:
        mns = [r[f"mn_{c}"] for r in agg if r[f"mn_{c}"] is not None]
        mxs = [r[f"mx_{c}"] for r in agg if r[f"mx_{c}"] is not None]
        if not mns:
            raise ValueError("zorder_key over an empty dataset")
        stats[c] = (min(mns), max(mxs))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "zval": pa.array([], pa.int64())})
        z = np.zeros(batch.num_rows, np.int64)
        for d, c in enumerate(cols):
            mn, mx = stats[c]
            v = _int64_col(batch, c)
            s = ((v - mn) * top // (mx - mn)) if mx > mn else np.zeros_like(v)
            for j in range(bits_per_dim):
                z |= ((s >> j) & 1) << (2 * j + d)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "zval": pa.array(z, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def zorder_layout(
    ds: rd.Dataset,
    cols: tuple[str, str],
    id_col: str = "event_id",
    bits_per_dim: int = ZORDER_BITS,
) -> rd.Dataset:
    """The full layout rewrite: z-key every row, then ONE sort by the
    z-value — downstream ``write_parquet`` blocks then carry tight
    min-max envelopes on BOTH key columns (pinned by the pruning test:
    a 2-D box query intersects far fewer z-laid-out blocks than
    single-column-sorted ones)."""
    keyed = zorder_key(ds, cols, id_col=id_col, bits_per_dim=bits_per_dim)
    return keyed.sort("zval")


def zorder_sql(
    src: str,
    cols: tuple[str, str] = ("user_id", "ts"),
    id_col: str = "event_id",
    bits_per_dim: int = ZORDER_BITS,
    ts_cols: tuple[str, ...] = ("ts",),
) -> str:
    """DuckDB oracle for :func:`zorder_key` — the identical min-max
    scale (``//`` integer division) and the identical 2*b mask-shift
    interleave terms; timestamps via ``epoch_us``."""
    if not 1 <= bits_per_dim <= 31:
        raise ValueError(f"bits_per_dim must be in [1, 31], got {bits_per_dim}")
    top = (1 << bits_per_dim) - 1

    def raw(c: str) -> str:
        return f"epoch_us({c})" if c in ts_cols else f"CAST({c} AS BIGINT)"

    scaled = {
        c: (
            f"(CASE WHEN mx_{c} > mn_{c} THEN "
            f"(({raw(c)} - mn_{c}) * {top}) // (mx_{c} - mn_{c}) "
            f"ELSE 0 END)"
        )
        for c in cols
    }
    terms = " | ".join(
        f"(((s_{c} >> {j}) & 1) << {2 * j + d})"
        for d, c in enumerate(cols)
        for j in range(bits_per_dim)
    )
    mm = ", ".join(
        f"min({raw(c)}) AS mn_{c}, max({raw(c)}) AS mx_{c}" for c in cols
    )
    sc = ", ".join(f"{scaled[c]} AS s_{c}" for c in cols)
    return f"""
WITH mm AS (SELECT {mm} FROM {src}),
s AS (SELECT {id_col}, {sc} FROM {src} CROSS JOIN mm)
SELECT CAST({id_col} AS BIGINT) AS {id_col}, CAST({terms} AS BIGINT) AS zval
FROM s
"""
