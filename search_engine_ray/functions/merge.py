"""CDC MERGE (SQL ``MERGE INTO`` / Delta Lake upsert) — apply a
change set (inserts / updates / deletes keyed by ``doc_id``) to a base
table in ONE key exchange.  This is the continuous-ingestion table
maintenance primitive every lakehouse engine ships (and the batch
generalization of the index's own delta/compaction lifecycle,
``pipelines/delta.py`` — there the change set is a re-analyzed
conversation; here it is arbitrary rows).

Plan (the only physical plan that works when BOTH sides are big): base
rows and change rows are tagged and bucketed by the same Fibonacci-mixed
key hash as ``joins.hash_join``, meet in ONE ``groupby('__b')``
exchange, and each bucket resolves vectorized — a searchsorted
membership mask drops base rows whose key has a change row, then the
non-delete change rows are appended.  No per-key Python, no row
widening, output is exactly ``|base| - |matched| - |deletes-of-absent|
+ |upserts|`` rows.  When the change set is small (the common CDC case)
the same resolve works with the change table broadcast — ``mode=
'broadcast'`` ships the whole change set via ``ray.put`` once and the
base side streams with ZERO shuffles.

MERGE semantics enforced loudly: at most ONE change row per key (SQL
MERGE raises on multiple matches; a silent last-wins would make output
depend on block order), op codes limited to I/U/D.  I and U both mean
"the change row replaces whatever the base had" (an I whose key exists
behaves as U — idempotent re-application), D removes the key (a D for
an absent key is a no-op, the CDC replay contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from search_engine_ray.functions.joins import BROADCAST_MAX_ROWS, _bucket_of

OPS = ("I", "U", "D")


def merge_upsert(
    base: rd.Dataset,
    changes: rd.Dataset,
    on: str = "doc_id",
    op_col: str = "op",
    mode: str = "auto",
    n_buckets: int = 64,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> rd.Dataset:
    """Apply ``changes`` (base schema + ``op_col`` in {'I','U','D'}) to
    ``base`` keyed by ``on``; returns the merged table with the base
    schema.  See the module docstring for the plan."""
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"bad mode {mode!r}")
    bs, cs = base.schema(), changes.schema()
    if on not in bs.names:
        raise ValueError(f"key {on!r} not in base {bs.names}")
    if op_col not in cs.names:
        raise ValueError(f"op column {op_col!r} not in changes {cs.names}")
    missing = [n for n in bs.names if n not in cs.names]
    if missing:
        raise ValueError(f"changes lack base columns {missing}")
    kt = dict(zip(bs.names, bs.types))[on]
    if not pa.types.is_integer(kt):
        raise ValueError(f"merge_upsert needs an integer key, got {kt}")
    base_names = list(bs.names)

    def _check_ops(t: pa.Table) -> None:
        bad = pc.sum(
            pc.cast(pc.invert(pc.is_in(t.column(op_col), value_set=pa.array(OPS))), pa.int64())
        ).as_py()
        if bad:
            raise ValueError(f"{bad} change rows with op outside {OPS}")

    def _resolve(
        bt: pa.Table, ct: pa.Table
    ) -> pa.Table:
        """Vectorized bucket/broadcast resolve: base minus matched keys,
        plus non-D change rows. Duplicate change keys raise."""
        ck = ct.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk = np.unique(ck)
        if len(uk) != len(ck):
            raise ValueError(
                "multiple change rows for one key — SQL MERGE cardinality "
                "violation (make the change set keyed)"
            )
        bk = bt.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(uk, bk)
        idx_c = np.clip(idx, 0, max(len(uk) - 1, 0))
        matched = (
            (idx < len(uk)) & (uk[idx_c] == bk)
            if len(uk)
            else np.zeros(len(bk), bool)
        )
        keep_base = bt.filter(pa.array(~matched))
        keep_changes = ct.filter(
            pc.invert(pc.equal(ct.column(op_col), "D"))
        ).select(base_names)
        return pa.concat_tables(
            [keep_base.select(base_names), keep_changes]
        )

    if mode == "auto":
        # count streams; only a broadcast-bound (small) changes side
        # materializes — the driver pull needs those blocks anyway,
        # and a big side must not pin in the object store
        if changes.count() <= broadcast_max_rows:
            changes = changes.materialize()
            mode = "broadcast"
        else:
            mode = "shuffle"

    if mode == "broadcast":
        tabs = [
            t
            for t in ray.get(
                changes.select_columns([*base_names, op_col]).materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        ct = (
            pa.concat_tables(tabs).combine_chunks()
            if tabs
            else pa.table(
                {
                    n: pa.array([], dict(zip(cs.names, cs.types))[n])
                    for n in [*base_names, op_col]
                }
            )
        )
        if ct.num_rows > broadcast_max_rows:
            raise ValueError(
                f"change set has {ct.num_rows} rows > {broadcast_max_rows}; "
                "use mode='shuffle'"
            )
        _check_ops(ct)
        # validate cardinality ONCE up front (a per-block check could
        # never see a cross-block duplicate anyway)
        ck = ct.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(np.unique(ck)) != len(ck):
            raise ValueError(
                "multiple change rows for one key — SQL MERGE cardinality "
                "violation (make the change set keyed)"
            )
        ct_ref = ray.put(ct)

        def bresolve(b: pa.Table) -> pa.Table:
            c = ray.get(ct_ref)
            # each base block drops its matched keys; change rows are
            # appended ONCE by the extra empty-base resolve below
            uk = np.unique(
                c.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            bk = b.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = np.searchsorted(uk, bk)
            idx_c = np.clip(idx, 0, max(len(uk) - 1, 0))
            matched = (
                (idx < len(uk)) & (uk[idx_c] == bk)
                if len(uk)
                else np.zeros(len(bk), bool)
            )
            return b.filter(pa.array(~matched)).select(base_names)

        filtered = base.map_batches(bresolve, batch_format="pyarrow")
        additions = ct.filter(
            pc.invert(pc.equal(ct.column(op_col), "D"))
        ).select(base_names)
        return filtered.union(rd.from_arrow(additions))

    # ---- shuffle plan ----
    def pad_base(b: pa.Table) -> pa.Table:
        cols: dict = {n: b.column(n) for n in base_names}
        cols[op_col] = pa.nulls(b.num_rows, pa.string())
        cols["__tag"] = pa.array(np.zeros(b.num_rows, np.int8), pa.int8())
        cols["__b"] = _bucket_of(b.column(on), n_buckets)
        return pa.table(cols)

    def pad_changes(b: pa.Table) -> pa.Table:
        _check_ops(b)
        cols = {n: b.column(n) for n in base_names}
        cols[op_col] = b.column(op_col)
        cols["__tag"] = pa.array(np.ones(b.num_rows, np.int8), pa.int8())
        cols["__b"] = _bucket_of(b.column(on), n_buckets)
        return pa.table(cols)

    def resolve_bucket(g: pa.Table) -> pa.Table:
        tag = g.column("__tag")
        bt = g.filter(pc.equal(tag, pa.scalar(0, pa.int8())))
        ct = g.filter(pc.equal(tag, pa.scalar(1, pa.int8())))
        return _resolve(bt, ct)

    tagged = base.map_batches(pad_base, batch_format="pyarrow").union(
        changes.select_columns([*base_names, op_col]).map_batches(
            pad_changes, batch_format="pyarrow"
        )
    )
    return tagged.groupby("__b").map_groups(
        resolve_bucket, batch_format="pyarrow"
    )


def merge_upsert_sql(
    base_src: str, changes_src: str, on: str = "doc_id", op_col: str = "op",
    cols: str | None = None,
) -> str:
    """DuckDB oracle for :func:`merge_upsert` — anti-join survivors plus
    non-delete change rows (the relational definition of MERGE)."""
    sel = cols or "b.*"
    return f"""
SELECT {sel} FROM {base_src} b
WHERE NOT EXISTS (SELECT 1 FROM {changes_src} c WHERE c.{on} = b.{on})
UNION ALL
SELECT {sel.replace('b.', 'c.')} FROM {changes_src} c WHERE c.{op_col} <> 'D'
"""
