"""Privacy operators for training-data pipelines: deterministic
pseudonymization (stable keyed tokens for identifier columns —
referential integrity survives, raw ids don't) and a k-anonymity audit
(which quasi-identifier combinations isolate fewer than k rows — the
re-identification risk report a dataset release runs before shipping;
Sweeney 2002).

Both are the engine's cheapest shapes: pseudonymization is a pure
zero-shuffle map (the md5 device — same digest both engines, so the
DuckDB twin reproduces tokens bit-for-bit and joins across
pseudonymized tables still line up); the audit is one pre-aggregated
groupby over the quasi-identifier tuple.

The reference engine has no privacy surface; this module belongs to
the LLM-training-data extension set alongside
:mod:`search_engine_ray.functions.sampling` (same salt-determinism
contract) and the PII-redaction map in ``text_analysis``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

PSEUDO_HEX = 16  # 64-bit tokens: collision odds ~n^2/2^65, documented


def pseudonymize(
    ds: rd.Dataset,
    cols: list[str],
    salt: str = "s1",
) -> rd.Dataset:
    """Replace each identifier column with a deterministic keyed token
    — the first 16 md5 hex digits of ``"{salt}:{col}:{value}"``.
    Same value -> same token EVERYWHERE (joins across pseudonymized
    tables keep working; that is what distinguishes pseudonymization
    from redaction), different columns get independent token spaces
    (the column name is in the digest), and rotating ``salt`` retires
    an entire token universe at once.  NULL stays NULL (an absent
    identifier is not an identity).  Pure zero-shuffle map; the
    per-row Python md5 loop is the ``_digests`` precedent (no Arrow
    md5 kernel exists).
    """
    if not cols:
        raise ValueError("pseudonymize: no columns given")

    def tok(batch: pa.Table) -> pa.Table:
        out = {}
        for name in batch.schema.names:
            col = batch.column(name)
            if name not in cols:
                out[name] = col
                continue
            pre = f"{salt}:{name}:".encode()
            vals = col.cast(pa.string()).to_pylist()
            out[name] = pa.array(
                [
                    None
                    if v is None
                    else hashlib.md5(pre + v.encode()).hexdigest()[:PSEUDO_HEX]
                    for v in vals
                ],
                pa.string(),
            )
        return pa.table(out)

    missing = [c for c in cols if c not in ds.schema().names]
    if missing:
        raise ValueError(f"pseudonymize: columns {missing} not in schema")
    return ds.map_batches(tok, batch_format="pyarrow")


def pseudonymize_sql(src: str, cols: list[str], salt: str = "s1",
                     all_cols: list[str] | None = None) -> str:
    """DuckDB oracle for :func:`pseudonymize` — the identical digest
    per column.  ``all_cols`` is the full output column list (SQL has
    no schema introspection in a plain SELECT)."""
    if all_cols is None:
        raise ValueError("pseudonymize_sql needs the full column list")
    sel = []
    for name in all_cols:
        if name in cols:
            sel.append(
                f"CASE WHEN {name} IS NULL THEN NULL ELSE "
                f"substr(md5('{salt}:{name}:' || CAST({name} AS VARCHAR)), "
                f"1, {PSEUDO_HEX}) END AS {name}"
            )
        else:
            sel.append(name)
    return f"SELECT {', '.join(sel)} FROM {src}"


def k_anonymity_audit(
    ds: rd.Dataset,
    quasi_cols: list[str],
    k: int = 5,
) -> rd.Dataset:
    """The re-identification risk report: every quasi-identifier
    combination shared by FEWER than ``k`` rows, with its row count —
    the groups a k-anonymity release would have to suppress or
    generalize (Sweeney 2002).  A dataset is k-anonymous iff this
    result is empty.

    One pre-aggregated exchange: blocks collapse to per-combination
    partial counts in-map (Arrow ``group_by``), ONE groupby over the
    quasi tuple sums, and the ``< k`` filter runs post-aggregate —
    rare-combination rows never ship twice.  NULL is a value (two
    rows both missing a field still look alike to an attacker) —
    Arrow and SQL GROUP BY agree on that.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    missing = [c for c in quasi_cols if c not in ds.schema().names]
    if missing:
        raise ValueError(f"k_anonymity_audit: columns {missing} not in schema")

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(quasi_cols).group_by(quasi_cols).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([*quasi_cols, "n"])

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.select_columns(quasi_cols)
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(quasi_cols)
        .aggregate(_Sum("n", alias_name="n"))
        .map_batches(
            lambda t: t.filter(pc.less(t.column("n"), pa.scalar(k))),
            batch_format="pyarrow",
        )
    )


def k_anonymity_audit_sql(src: str, quasi_cols: list[str], k: int = 5) -> str:
    """DuckDB oracle for :func:`k_anonymity_audit`."""
    qs = ", ".join(quasi_cols)
    return f"""
SELECT {qs}, CAST(count(*) AS BIGINT) AS n
FROM {src}
GROUP BY {qs}
HAVING count(*) < {k}
"""


def k_suppress(
    ds: rd.Dataset,
    quasi_cols: list[str],
    k: int = 5,
    max_combos_broadcast: int = 2_000_000,
    mode: str = "auto",
) -> rd.Dataset:
    """Suppression-based k-anonymization: drop every row whose
    quasi-identifier combination is shared by fewer than ``k`` rows —
    the minimal release that passes :func:`k_anonymity_audit` (by
    construction: audit(k_suppress(ds)) is empty, pinned by test).
    Suppression is the blunt instrument (generalization keeps more
    rows); it is also the only one that needs no domain hierarchy.

    Two physical plans, pinned equal by test (the hash_join /
    semi_join pattern):

    - ``broadcast`` — the audit's one exchange finds the under-k
      combos; their canonical serializations (the setops row-serial
      device — NULL = NULL, exactly the audit's grouping rule)
      broadcast once as a sorted array (bounded by
      ``max_combos_broadcast``, loud), and the suppression pass is a
      zero-shuffle searchsorted membership filter.
    - ``shuffle`` — the scale plan when the under-k combo set itself
      is corpus-sized (high-cardinality quasi tuples: MOST combos are
      rare, so the "small side" isn't): skip the audit entirely and
      group the FULL rows by the quasi tuple in ONE exchange, keeping
      each group iff it has >= k rows — suppression and census meet
      in the same groupby, nothing broadcasts, nothing is driver-side.
      (Ray's groupby groups NULL keys together exactly as the audit's
      Arrow ``group_by`` does — the audit's own oracle pins that.)

    ``mode='auto'`` tries broadcast and falls over to shuffle when the
    combo count exceeds the bound.
    """
    from search_engine_ray.functions.setops import _row_serial

    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"bad mode {mode!r}")

    def _shuffle_plan() -> rd.Dataset:
        def keep_ge_k(g: pa.Table) -> pa.Table:
            return g if g.num_rows >= k else g.slice(0, 0)

        return ds.groupby(quasi_cols).map_groups(
            keep_ge_k, batch_format="pyarrow"
        )

    if mode == "shuffle":
        return _shuffle_plan()

    # materialize FIRST: the audit's COMPUTE is corpus-scale but its
    # OUTPUT is combo-domain-sized — pinning the output lets the bound
    # count and the take_all share one execution (an over-bound result
    # is discarded promptly on the shuffle fallback)
    under = k_anonymity_audit(ds, quasi_cols, k).materialize()
    n_combos = under.count()
    if n_combos > max_combos_broadcast:
        if mode == "auto":
            return _shuffle_plan()
        raise ValueError(
            f"k_suppress: {n_combos} under-k combos exceed the broadcast "
            f"bound {max_combos_broadcast} — use mode='shuffle'"
        )
    tabs = under.select_columns(quasi_cols).take_all()
    if tabs:
        cols = {c: [r[c] for r in tabs] for c in quasi_cols}
        serial = _row_serial(pa.table(cols)).to_pylist()
    else:
        serial = []
    bad = np.sort(np.array(serial, dtype=object))
    import ray

    bad_ref = ray.put(bad)

    def drop(b: pa.Table) -> pa.Table:
        bd = ray.get(bad_ref)
        if len(bd) == 0:
            return b
        s = np.array(
            _row_serial(b.select(quasi_cols)).to_pylist(), dtype=object
        )
        pos = np.searchsorted(bd, s)
        pos[pos == len(bd)] = 0
        m = bd[pos] == s
        return b.filter(pa.array(~m))

    return ds.map_batches(drop, batch_format="pyarrow")


def k_suppress_sql(src: str, quasi_cols: list[str], k: int = 5,
                   cols: str = "*") -> str:
    """DuckDB oracle for :func:`k_suppress` — anti-join against the
    under-k combos with NULL-safe equality (IS NOT DISTINCT FROM:
    the audit groups NULLs together, so suppression must too)."""
    qs = ", ".join(quasi_cols)
    on = " AND ".join(
        f"s.{c} IS NOT DISTINCT FROM u.{c}" for c in quasi_cols
    )
    return f"""
WITH u AS (
    SELECT {qs} FROM {src} GROUP BY {qs} HAVING count(*) < {k}
)
SELECT {cols} FROM {src} s
ANTI JOIN u ON {on}
"""
