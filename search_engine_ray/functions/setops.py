"""Full-row set operations — SQL ``EXCEPT`` / ``INTERSECT`` (DISTINCT
set semantics, NULL = NULL) between two datasets of the same schema.
The whole-ROW siblings of the key-based :func:`joins.semi_join`: there
the membership unit is a key column; here it is the entire tuple, which
is what "which documents did yesterday's snapshot have that today's
lost" actually asks.

Plan: per block, rows serialize to one canonical string (every column
cast to its Arrow string form, nulls to a reserved sentinel, joined
with an unprintable separator) and pre-dedup IN-MAP (Arrow
``group_by`` over all columns — blocks ship at most their distinct
rows).  Tagged blocks from both sides meet in ONE ``groupby('__b')``
exchange bucketed by an md5-derived 64-bit hash of the serialized row
(equal rows always co-locate; the hash picks the BUCKET only, so a
collision costs nothing — membership inside a bucket is decided by the
actual columns).  Each bucket resolves at C speed with one Arrow
``group_by`` over all columns aggregating min/max of the side tag:
``EXCEPT`` keeps groups whose max tag is 0 (A rows never seen in B),
``INTERSECT`` keeps min 0 / max 1 (seen in both) — and because Arrow
``group_by`` places nulls in one group, NULL = NULL falls out exactly
as SQL set ops define it (unlike a join-based plan, where Acero's
null-never-matches rule would silently diverge).

The serialization is engine-internal (only the RESULT is compared to
the SQL twin), so float formatting quirks cannot cause divergence —
only bucket placement depends on it, and equal values always serialize
equally.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SEP = "\x1f"
_NULL = "\x00\x00N"  # reserved: cannot collide with a cast value


def _row_serial(t: pa.Table) -> pa.Array:
    """One canonical string per row: columns cast to string, nulls to
    the reserved sentinel, joined with an unprintable separator."""
    cols = [
        pc.fill_null(pc.cast(t.column(n), pa.string()), _NULL)
        for n in t.schema.names
    ]
    if len(cols) == 1:
        return cols[0].combine_chunks() if isinstance(
            cols[0], pa.ChunkedArray
        ) else cols[0]
    return pc.binary_join_element_wise(*cols, _SEP)


def _bucket64(serial: pa.Array | pa.ChunkedArray, n_buckets: int) -> pa.Array:
    """md5-derived bucket id per serialized row (the _md5_col
    memoryview pattern; first 8 digest bytes -> uint64 -> mod)."""
    if isinstance(serial, pa.ChunkedArray):
        serial = serial.combine_chunks()
    if len(serial) == 0:
        return pa.array([], pa.int64())
    bufs = serial.buffers()
    odt = np.int64 if pa.types.is_large_string(serial.type) else np.int32
    off = np.frombuffer(bufs[1], odt)[
        serial.offset : serial.offset + len(serial) + 1
    ].tolist()
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    raw = b"".join(md5(mv[a:b]).digest()[:8] for a, b in zip(off, off[1:]))
    h = np.frombuffer(raw, np.uint64)
    return pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())


def set_op(
    a: rd.Dataset,
    b: rd.Dataset,
    op: str = "except",
    n_buckets: int = 64,
) -> rd.Dataset:
    """``a EXCEPT b`` / ``a INTERSECT b`` / ``a UNION b`` with SQL
    DISTINCT-set semantics (output rows are distinct; NULL = NULL).
    Schemas must match by name and type. See the module docstring for
    the plan (UNION keeps every group, no tag test)."""
    if op not in ("except", "intersect", "union"):
        raise ValueError(
            f"op must be 'except'/'intersect'/'union', got {op!r}"
        )
    sa, sb = a.schema(), b.schema()
    if sa.names != sb.names or [str(t) for t in sa.types] != [
        str(t) for t in sb.types
    ]:
        raise ValueError(
            f"set_op needs identical schemas, got {list(zip(sa.names, sa.types))} "
            f"vs {list(zip(sb.names, sb.types))}"
        )
    names = list(sa.names)
    if "__tag" in names or "__b" in names:
        raise ValueError("column names __tag/__b are reserved")

    def pad(tag: int):
        def f(t: pa.Table) -> pa.Table:
            # in-map pre-dedup: ship at most the block's distinct rows
            g = t.group_by(names).aggregate([])
            cols: dict = {n: g.column(n) for n in names}
            cols["__tag"] = pa.array(
                np.full(g.num_rows, tag, np.int8), pa.int8()
            )
            cols["__b"] = _bucket64(_row_serial(g.select(names)), n_buckets)
            return pa.table(cols)

        return f

    def resolve(g: pa.Table) -> pa.Table:
        agg = g.group_by(names).aggregate([("__tag", "min"), ("__tag", "max")])
        if op == "union":  # every distinct row, either side
            return agg.select(names)
        mn, mx = agg.column("__tag_min"), agg.column("__tag_max")
        if op == "except":
            keep = pc.equal(mx, pa.scalar(0, pa.int8()))
        else:
            keep = pc.and_(
                pc.equal(mn, pa.scalar(0, pa.int8())),
                pc.equal(mx, pa.scalar(1, pa.int8())),
            )
        return agg.filter(keep).select(names)

    tagged = a.map_batches(pad(0), batch_format="pyarrow").union(
        b.map_batches(pad(1), batch_format="pyarrow")
    )
    return tagged.groupby("__b").map_groups(resolve, batch_format="pyarrow")


def set_op_sql(a_src: str, b_src: str, op: str = "except") -> str:
    """DuckDB oracle for :func:`set_op` — the literal set operator."""
    kw = {"except": "EXCEPT", "intersect": "INTERSECT", "union": "UNION"}[op]
    return f"SELECT * FROM {a_src} {kw} SELECT * FROM {b_src}"
