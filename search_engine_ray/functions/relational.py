"""Relational pipeline operators over the TPC-H-ish side tables
(``lineitem`` / ``orders`` / ``customer``) — the proof the engine's
shuffle shapes cover classic warehouse work, not just text:

- :func:`pricing_summary` (Q1 analog): scan-heavy group-aggregate.
  Per-batch map-side combine (vectorized expressions + an Arrow
  ``group_by`` inside the map) collapses each batch to <= |groups| rows,
  so the ONE global groupby ships a handful of partial rows per block —
  the pre-aggregated shuffle shape the brief mandates.
- :func:`top_unshipped_orders` (Q3 analog): selective multi-table join
  + top-k. The customer segment is the genuinely small side (broadcast
  as a sorted key array); orders and lineitem meet in ONE orderkey
  shuffle (tagged-union + vectorized aggregates — no per-group Python,
  no Dataset.join dependency); top-k is per-batch partial selection +
  a k-row driver merge, never a global sort.

Money arithmetic is quantized to ``QUANT`` decimals per row BEFORE
summing (both engines compute bit-identical per-row doubles, quantize
identically, then sum exact int64) — sums become order-independent, so
the DuckDB comparison is exact at any parallelism, block order, or
scale, where raw float sums would drift with addition order. int64
headroom: ~1e9 rows per group at price magnitude 1e5 before overflow;
production decimals would use decimal128.

The reference engine has no relational surface (single-table postings,
/root/reference/src/main/java/searchengine/repositories) — this module
exists because the driver registers these tables as first-class inputs.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

QUANT = 4
_Q = 10.0**QUANT

PRICING_CUTOFF = "1998-09-01"
TOPK_SEGMENT = "BUILDING"
TOPK_DATE = "1998-06-15"
TOPK_K = 10


def _quant(x: np.ndarray) -> np.ndarray:
    """Half-up quantization of non-negative money values to QUANT
    decimals as int64 (identical to the SQL ``floor(x*1e4 + 0.5)``)."""
    return np.floor(x * _Q + 0.5).astype(np.int64)


def _col(batch: pa.Table, name: str) -> np.ndarray:
    return batch.column(name).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# Q1 analog: pricing summary
# ---------------------------------------------------------------------------

def pricing_summary(lineitem: rd.Dataset, cutoff: str = PRICING_CUTOFF) -> rd.Dataset:
    """Per (returnflag, linestatus): row count and exact quantized sums
    of quantity, base price, discounted price, and charge for rows
    shipped on or before ``cutoff``."""
    cut = _dt.datetime.fromisoformat(cutoff)
    keys = ["l_returnflag", "l_linestatus"]
    qcols = ["q_qty", "q_base", "q_disc", "q_charge", "n_rows"]

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less_equal(batch.column("l_shipdate"), pa.scalar(cut)))
        price = _col(b, "l_extendedprice")
        disc = _col(b, "l_discount")
        disc_price = price * (1.0 - disc)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "q_qty": pa.array(_quant(_col(b, "l_quantity")), pa.int64()),
                "q_base": pa.array(_quant(price), pa.int64()),
                "q_disc": pa.array(_quant(disc_price), pa.int64()),
                "q_charge": pa.array(_quant(disc_price * (1.0 + _col(b, "l_tax"))), pa.int64()),
                "n_rows": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by(keys).aggregate([(c, "sum") for c in qcols])
        return g.select(keys + [f"{c}_sum" for c in qcols]).rename_columns(keys + qcols)

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(*[Sum(c, alias_name=c) for c in qcols])
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pa.array(_col(batch, "q_qty") / _Q, pa.float64()),
                "sum_base_price": pa.array(_col(batch, "q_base") / _Q, pa.float64()),
                "sum_disc_price": pa.array(_col(batch, "q_disc") / _Q, pa.float64()),
                "sum_charge": pa.array(_col(batch, "q_charge") / _Q, pa.float64()),
                "n_rows": batch.column("n_rows"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def pricing_summary_sql(src: str = "lineitem", cutoff: str = PRICING_CUTOFF) -> str:
    """DuckDB oracle for :func:`pricing_summary` (same quantization)."""
    q = int(_Q)

    def s(expr: str) -> str:
        return f"sum(CAST(floor(({expr}) * {q} + 0.5) AS BIGINT)) / {q}.0"

    return f"""
SELECT l_returnflag, l_linestatus,
       {s('l_quantity')} AS sum_qty,
       {s('l_extendedprice')} AS sum_base_price,
       {s('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {s('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       count(*) AS n_rows
FROM {src}
WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3 analog: top unshipped orders by revenue for a market segment
# ---------------------------------------------------------------------------

def top_unshipped_orders(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    segment: str = TOPK_SEGMENT,
    date: str = TOPK_DATE,
    k: int = TOPK_K,
) -> pa.Table:
    """Top-``k`` orders by revenue (quantized sum of
    ``l_extendedprice * (1 - l_discount)``) among orders placed before
    ``date`` by customers in ``segment`` with lineitems shipping after
    ``date``; deterministic (revenue DESC, orderkey ASC) order."""
    cut = _dt.datetime.fromisoformat(date)

    seg = customer.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), pa.scalar(segment)))
        .select(["c_custkey"])
        .replace_schema_metadata(None),  # keep block schemas hashable
        batch_format="pyarrow",
    )
    tabs = [t for t in ray.get(seg.materialize().to_arrow_refs()) if t.num_rows]
    ck = np.sort(
        np.concatenate([_col(t, "c_custkey") for t in tabs])
        if tabs
        else np.empty(0, np.int64)
    )
    ck_ref = ray.put(ck)

    def order_rows(batch: pa.Table) -> pa.Table:
        keys = ray.get(ck_ref)
        b = batch.filter(pc.less(batch.column("o_orderdate"), pa.scalar(cut)))
        custs = _col(b, "o_custkey")
        if len(keys):
            pos = np.clip(np.searchsorted(keys, custs), 0, len(keys) - 1)
            b = b.filter(pa.array(keys[pos] == custs))
        else:
            b = b.slice(0, 0)
        n = b.num_rows
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey"),
                "q_rev": pa.array(np.zeros(n, np.int64), pa.int64()),
                "o_date_us": b.column("o_orderdate").cast(pa.int64()),
                "o_prio": b.column("o_orderpriority"),
                "is_order": pa.array(np.ones(n, np.int64), pa.int64()),
                "has_line": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("l_shipdate"), pa.scalar(cut)))
        rev = _quant(_col(b, "l_extendedprice") * (1.0 - _col(b, "l_discount")))
        t = pa.table({"l_orderkey": b.column("l_orderkey"), "q_rev": pa.array(rev, pa.int64())})
        g = t.group_by(["l_orderkey"]).aggregate([("q_rev", "sum")])
        n = g.num_rows
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "q_rev": g.column("q_rev_sum"),
                "o_date_us": pa.array([None] * n, pa.int64()),
                "o_prio": pa.array([None] * n, pa.string()),
                "is_order": pa.array(np.zeros(n, np.int64), pa.int64()),
                # lineitem presence is its own indicator: inferring the
                # inner join from q_rev > 0 would drop an order whose
                # qualifying lineitems all quantize to zero revenue
                # (e.g. discount = 1.0) while the SQL oracle keeps it
                "has_line": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    joined = (
        orders.map_batches(order_rows, batch_format="pyarrow")
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))
        .groupby("l_orderkey")
        .aggregate(
            Sum("q_rev", alias_name="q_rev"),
            Max("o_date_us", alias_name="o_date_us"),
            Max("o_prio", alias_name="o_prio"),
            Sum("is_order", alias_name="is_order"),
            Sum("has_line", alias_name="has_line"),
        )
    )

    def part_topk(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater(batch.column("is_order"), pa.scalar(0)),
            pc.greater(batch.column("has_line"), pa.scalar(0)),
        )
        b = batch.filter(keep)
        rev = _col(b, "q_rev")
        order = np.lexsort((_col(b, "l_orderkey"), -rev))[:k]
        b = b.take(order)
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "o_orderdate": b.column("o_date_us").cast(pa.timestamp("us")),
                "o_orderpriority": b.column("o_prio"),
                "revenue": pa.array(_col(b, "q_rev") / _Q, pa.float64()),
            }
        )

    parts = joined.map_batches(part_topk, batch_format="pyarrow")
    tabs = [t for t in ray.get(parts.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table(
            {"l_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_orderpriority": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    t = pa.concat_tables(tabs)
    order = np.lexsort(
        (t.column("l_orderkey").to_numpy(zero_copy_only=False),
         -t.column("revenue").to_numpy(zero_copy_only=False))
    )[:k]
    return t.take(order)


# ---------------------------------------------------------------------------
# Q5 analog: revenue by nation for intra-region customer/supplier pairs
# ---------------------------------------------------------------------------

# gate for the Q5 date-key semi-join prefilter of the fact-fact
# exchange (A/B-able; measured neutral at sf0.1 where per-execution
# overhead ~ exchange cost, and strictly exchange-shrinking beyond)
Q5_PREFILTER = True

Q5_REGION = "ASIA"
Q5_FROM = "1995-01-01"
Q5_TO = "1996-01-01"


def region_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    region: rd.Dataset,
    region_name: str = Q5_REGION,
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
    join_mode: str = "auto",
) -> pa.Table:
    """Quantized revenue by nation (``n_name``, revenue DESC, name ASC)
    for orders placed in [date_from, date_to) where customer and
    supplier sit in the SAME nation of ``region_name`` — the classic
    multi-join + group-aggregate warehouse shape (TPC-H Q5), expressed
    over the generic :func:`~.joins.hash_join` operator:

    - nation ⋈ region resolves driver-side (25 x 5 rows — constant).
    - orders(date-pruned) ⋈ customer(region-pruned) is join #1 —
      customer is corpus-scale at 100 TB, so this is an honest
      key-partitioned shuffle join, never a broadcast of customers.
    - lineitem ⋈ that result on orderkey is join #2 — the fact-fact
      exchange, the join that dominates; only three integer columns
      plus the quantized revenue ship.
    - supplier is the genuinely small side (1/15th of customer in
      TPC-H): joined by ``join_mode`` ('auto' broadcasts under the 2M
      bound, shuffles above), then the intra-region constraint
      ``c_nationkey == s_nationkey`` filters.
    - revenue pre-aggregates per batch (Arrow group_by) before the
      final <= 25-key groupby — the map-side-combine shuffle shape.

    Money is per-row quantized int64 (module header): sums are
    order-independent, the DuckDB twin is exact at any block layout.
    """
    from .joins import hash_join, hash_join_schema

    lo = _dt.datetime.fromisoformat(date_from)
    hi = _dt.datetime.fromisoformat(date_to)

    # constant-sized dims: 5 regions x 25 nations
    rt = pa.concat_tables(
        [t for t in ray.get(region.materialize().to_arrow_refs()) if t.num_rows])
    nt = pa.concat_tables(
        [t for t in ray.get(nation.materialize().to_arrow_refs()) if t.num_rows])
    rkeys = {
        r["r_regionkey"] for r in rt.to_pylist() if r["r_name"] == region_name
    }
    nmap = {
        r["n_nationkey"]: r["n_name"]
        for r in nt.to_pylist()
        if r["n_regionkey"] in rkeys
    }
    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "revenue": pa.array([], pa.float64())})
    if not nmap:
        return empty
    nk_arr = pa.array(sorted(nmap), pa.int32())

    def cust_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_nationkey"), value_set=nk_arr))
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "c_nationkey": b.column("c_nationkey")})

    def order_rows(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi)),
        )
        b = b.filter(keep)
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")})

    def line_rows(b: pa.Table) -> pa.Table:
        rev = _quant(_col(b, "l_extendedprice") * (1.0 - _col(b, "l_discount")))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_suppkey": b.column("l_suppkey"),
                         "q_rev": pa.array(rev, pa.int64())})

    def supp_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("s_nationkey"), value_set=nk_arr))
        return pa.table({"s_suppkey": b.column("s_suppkey"),
                         "s_nationkey": b.column("s_nationkey")})

    cust = customer.map_batches(cust_rows, batch_format="pyarrow")
    ords = orders.map_batches(order_rows, batch_format="pyarrow")
    line = lineitem.map_batches(line_rows, batch_format="pyarrow")
    supp = supplier.map_batches(supp_rows, batch_format="pyarrow")

    # every schema below is passed EXPLICITLY (derived from the cheap
    # parquet-metadata schemas of the source tables + the projections
    # above), so no link of the 3-join chain ever calls
    # Dataset.schema() on a lazy all-to-all input — schema inference
    # there executes the whole upstream exchange, and chaining three
    # lazy joins re-ran join #1 four times (45.8 s); the interim fix
    # materialize()d j1/j2 (14.0 s); explicit schemas stream the
    # whole chain once with zero materializations.
    ot = dict(zip(orders.schema().names, orders.schema().types))
    ct = dict(zip(customer.schema().names, customer.schema().types))
    lt = dict(zip(lineitem.schema().names, lineitem.schema().types))
    st = dict(zip(supplier.schema().names, supplier.schema().types))
    ords_schema = pa.schema(
        [("o_orderkey", ot["o_orderkey"]), ("o_custkey", ot["o_custkey"])])
    cust_schema = pa.schema(
        [("c_custkey", ct["c_custkey"]), ("c_nationkey", ct["c_nationkey"])])
    line_schema = pa.schema(
        [("l_orderkey", lt["l_orderkey"]), ("l_suppkey", lt["l_suppkey"]),
         ("q_rev", pa.int64())])
    supp_schema = pa.schema(
        [("s_suppkey", st["s_suppkey"]), ("s_nationkey", st["s_nationkey"])])

    # semi-join prefilter ahead of the dominant fact-fact exchange:
    # the date-pruned ORDER KEY SET (~1/7 of orders) broadcasts once
    # and lineitem streams through a zero-shuffle membership mask, so
    # j2 ships only rows that can survive the join. Gated on the 2M
    # broadcast bound: above it the prefilter is SKIPPED (a shuffle
    # semi-join would itself be a fact exchange) and the plan degrades
    # to the plain chain — results identical either way, pinned by the
    # shared oracle. Only KEYS broadcast, never rows (the
    # corpus-scale-customer rule in the plan docstring holds).
    from .joins import BROADCAST_MAX_ROWS, semi_join

    if Q5_PREFILTER:
        # the bound COUNT streams (blocks released); only an
        # under-bound (small) projection materializes — then the filter
        # keys and j1 share its cached blocks. Materializing before the
        # gate would pin a corpus-sized fact projection exactly when
        # the prefilter is skipped (the hash_join auto-mode rule).
        if ords.count() <= BROADCAST_MAX_ROWS:
            ords = ords.materialize()
            line = semi_join(line, ords, "l_orderkey", "o_orderkey",
                             mode="broadcast")

    shuffle_mode = "shuffle" if join_mode == "auto" else join_mode
    j1 = hash_join(ords, cust, "o_custkey", "c_custkey",
                   mode=shuffle_mode,
                   left_schema=ords_schema, right_schema=cust_schema)
    j1 = j1.map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    j1_schema = pa.schema(
        [("o_orderkey", ot["o_orderkey"]), ("c_nationkey", ct["c_nationkey"])])
    j2 = hash_join(line, j1, "l_orderkey", "o_orderkey",
                   mode=shuffle_mode,
                   left_schema=line_schema, right_schema=j1_schema)
    j2_schema = hash_join_schema(line_schema, "l_orderkey", j1_schema,
                                 "o_orderkey")
    j3 = hash_join(j2, supp, "l_suppkey", "s_suppkey", mode=join_mode,
                   left_schema=j2_schema, right_schema=supp_schema)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("c_nationkey"), b.column("s_nationkey")))
        t = pa.table({"c_nationkey": b.column("c_nationkey"),
                      "q_rev": b.column("q_rev")})
        g = t.group_by(["c_nationkey"]).aggregate([("q_rev", "sum")])
        return g.rename_columns(["c_nationkey", "q_rev"])

    agg = (
        j3.map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Sum("q_rev", alias_name="q_rev"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    rows = sorted(
        (
            (-int(q), nmap[int(nk)])
            for nk, q in zip(_col(t, "c_nationkey"), _col(t, "q_rev"))
        ),
    )
    return pa.table({
        "n_name": pa.array([n for _, n in rows], pa.string()),
        "revenue": pa.array([-q / _Q for q, _ in rows], pa.float64()),
    })


def region_revenue_sql(
    region_name: str = Q5_REGION,
    date_from: str = Q5_FROM,
    date_to: str = Q5_TO,
) -> str:
    """DuckDB oracle for :func:`region_revenue` (same quantization)."""
    q = int(_Q)
    return f"""
SELECT n_name,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q} + 0.5) AS BIGINT)) / {q}.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q18 analog: large-volume orders (group-HAVING semi-join)
# ---------------------------------------------------------------------------

Q18_QTY = 212.0
Q18_K = 10


def big_orders(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    qty_threshold: float = Q18_QTY,
    k: int = Q18_K,
) -> pa.Table:
    """Top-``k`` largest orders by total lineitem quantity above
    ``qty_threshold`` (TPC-H Q18's group-HAVING semi-join), with the
    ordering customer attached: quantities pre-aggregate per batch
    (Arrow group_by) before ONE orderkey groupby; the HAVING filter
    shrinks the survivors to a handful BEFORE any join, so the
    customer/order attach is a per-block partial top-k + k-row driver
    merge followed by two tiny broadcast joins — the
    aggregate-then-join plan every optimizer picks for Q18.
    Deterministic order (total_qty DESC, o_orderkey ASC). Quantity is
    quantized int64 per row (module header) — exact at any layout."""

    def line_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "q_qty": pa.array(_quant(_col(b, "l_quantity")), pa.int64()),
        })
        g = t.group_by(["o_orderkey"]).aggregate([("q_qty", "sum")])
        return g.rename_columns(["o_orderkey", "q_qty"])

    thresh = int(round(qty_threshold * _Q))
    totals = (
        lineitem.map_batches(line_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("q_qty", alias_name="q_qty"))
    )

    def part_topk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("q_qty"), pa.scalar(thresh)))
        qq = _col(b, "q_qty")
        order = np.lexsort((_col(b, "o_orderkey"), -qq))[:k]
        return b.take(order)

    parts = [
        t for t in ray.get(
            totals.map_batches(part_topk, batch_format="pyarrow").materialize().to_arrow_refs())
        if t.num_rows
    ]
    empty = pa.table({
        "c_name": pa.array([], pa.string()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_totalprice": pa.array([], pa.float64()),
        "total_qty": pa.array([], pa.float64()),
    })
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    order = np.lexsort((_col(t, "o_orderkey"), -_col(t, "q_qty")))[:k]
    top = t.take(order).combine_chunks()

    # the HAVING survivors are <= k rows (a PAGE, not a table): attach
    # orders and customers by SEMI-pruning each corpus-scale table to
    # the k keys (a k-element isin mask map — broadcasting orders or
    # customer wholesale would be the 100 TB anti-plan), then join the
    # three k-row frames driver-side with the Acero kernel
    okeys = pa.array(top.column("o_orderkey").to_pylist(), pa.int64())

    def order_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("o_orderkey"), value_set=okeys))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "o_orderdate": b.column("o_orderdate"),
            "o_totalprice": b.column("o_totalprice"),
        })

    ords_k = pa.concat_tables([
        x for x in ray.get(
            orders.map_batches(order_rows, batch_format="pyarrow")
            .materialize().to_arrow_refs())
        if x.num_rows
    ]).combine_chunks()
    ckeys = pa.array(sorted(set(ords_k.column("o_custkey").to_pylist())),
                     pa.int64())

    def cust_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_custkey"), value_set=ckeys))
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "c_name": b.column("c_name")})

    cust_k = pa.concat_tables([
        x for x in ray.get(
            customer.map_batches(cust_rows, batch_format="pyarrow")
            .materialize().to_arrow_refs())
        if x.num_rows
    ]).combine_chunks()
    out = top.join(ords_k, keys="o_orderkey").join(
        cust_k, keys="o_custkey", right_keys="c_custkey")
    if not out.num_rows:
        return empty
    order2 = np.lexsort((_col(out, "o_orderkey"), -_col(out, "q_qty")))
    out = out.take(order2)
    return pa.table({
        "c_name": out.column("c_name"),
        "o_orderkey": out.column("o_orderkey"),
        "o_orderdate": out.column("o_orderdate"),
        "o_totalprice": out.column("o_totalprice"),
        "total_qty": pa.array(_col(out, "q_qty") / _Q, pa.float64()),
    })


def big_orders_sql(qty_threshold: float = Q18_QTY, k: int = Q18_K) -> str:
    """DuckDB oracle for :func:`big_orders` (same quantization)."""
    q = int(_Q)
    thresh = int(round(qty_threshold * q))
    return f"""
SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
       total_qty
FROM (
    SELECT l_orderkey AS o_orderkey,
           sum(CAST(floor(l_quantity * {q} + 0.5) AS BIGINT)) AS q_qty,
           sum(CAST(floor(l_quantity * {q} + 0.5) AS BIGINT)) / {q}.0 AS total_qty
    FROM lineitem GROUP BY 1 HAVING q_qty > {thresh}
) t
JOIN orders USING (o_orderkey)
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT {k}
"""


def top_unshipped_orders_sql(
    segment: str = TOPK_SEGMENT, date: str = TOPK_DATE, k: int = TOPK_K
) -> str:
    """DuckDB oracle for :func:`top_unshipped_orders`."""
    q = int(_Q)
    return f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q} + 0.5) AS BIGINT)) / {q}.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date}'
  AND l_shipdate > TIMESTAMP '{date}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Q4 analog: order-priority checking (the EXISTS semi-join + groupby plan)
# ---------------------------------------------------------------------------

Q4_START = "1996-01-01"
Q4_END = "1997-01-01"
Q4_RETURNFLAG = "R"


def order_priority(
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    start: str = Q4_START,
    end: str = Q4_END,
    returnflag: str = Q4_RETURNFLAG,
) -> rd.Dataset:
    """TPC-H Q4 analog — how many orders per priority, in a date
    window, have at least one returned line (the reference Q4's
    ``l_commitdate < l_receiptdate`` lateness predicate replaced by
    ``l_returnflag = 'R'``; the testdata schema carries no
    commit/receipt dates).  The plan every optimizer picks for Q4:
    the EXISTS never becomes a join — a pure right-side filter, then
    an exact SEMI-JOIN on orderkey (only keys move, no row widening,
    duplicate lineitems collapse block-locally via the semi-join's
    per-block key dedup), then a groupby over the tiny priority
    domain with map-side combine.  One key exchange end to end
    (semi_join shuffle mode), output is priority-sorted.
    """
    from search_engine_ray.functions.joins import semi_join

    s_dt = _dt.datetime.fromisoformat(start)
    e_dt = _dt.datetime.fromisoformat(end)

    def win(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate")
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(s_dt)),
            pc.less(ts, pa.scalar(e_dt)),
        )
        return b.filter(keep).select(["o_orderkey", "o_orderpriority"])

    def returned(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("l_returnflag"), pa.scalar(returnflag))
        return b.filter(keep).select(["l_orderkey"])

    hits = semi_join(
        orders.map_batches(win, batch_format="pyarrow"),
        lineitem.map_batches(returned, batch_format="pyarrow"),
        "o_orderkey",
        "l_orderkey",
        mode="shuffle",
    )

    def combine(b: pa.Table) -> pa.Table:
        return (
            b.group_by("o_orderpriority")
            .aggregate([("o_orderkey", "count")])
            .rename_columns(["o_orderpriority", "n"])
        )

    agg = (
        hits.map_batches(combine, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="order_count"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "order_count": b.column("order_count").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        "o_orderpriority"
    )


def order_priority_sql(
    start: str = Q4_START, end: str = Q4_END, returnflag: str = Q4_RETURNFLAG
) -> str:
    """DuckDB oracle for :func:`order_priority` (TPC-H Q4 shape)."""
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{start}'
  AND o_orderdate < TIMESTAMP '{end}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_returnflag = '{returnflag}')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# ROLLUP / grouping-sets aggregate (the OLAP subtotal primitive)
# ---------------------------------------------------------------------------

ROLLUP_CENTS = 100  # money quantized to int64 cents before any sum


ROLLUP_SETS = (("year", "o_orderpriority"), ("year",), ())
CUBE_SETS = (
    ("year", "o_orderpriority"), ("year",), ("o_orderpriority",), ()
)


def rollup_orders(
    orders: rd.Dataset,
    sets: tuple[tuple[str, ...], ...] = ROLLUP_SETS,
) -> rd.Dataset:
    """``GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)`` — order
    count and total price at THREE grains in one result: (year,
    priority), (year, ALL) and (ALL, ALL), with SQL's NULL markers on
    the rolled-up columns.

    Plan: the cluster does ONE shuffle at the FINEST grain only (the
    same pre-aggregated groupby as :func:`pricing_summary` — map-side
    combine ships <= |years|x|priorities| partial rows per block); the
    coarser grains are then re-aggregated from that finest-grain table,
    which is DOMAIN-BOUNDED (|years| x |priorities| rows — dozens, at
    any data scale), so the re-aggregation is a driver-side Arrow fold
    of a provably tiny input, not a second data shuffle.  This is the
    standard ROLLUP plan: subtotals are additive, so each level folds
    from the level below (sums of sums, sums of counts) — never from
    the raw rows.

    Exactness: prices quantize to int64 cents per row
    (half-away-from-zero) before ANY sum, so every level's total is an
    exact integer and the fold order cannot drift — the same device as
    the other relational ops.  Output: ``(year, o_orderpriority,
    n_orders, sum_cents)``; NULL year/priority mark rolled-up levels
    exactly as SQL ROLLUP does.
    """

    def finest(b: pa.Table) -> pa.Table:
        yr = pc.year(b.column("o_orderdate")).cast(pa.int64())
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = (
            np.floor(np.abs(price) * ROLLUP_CENTS + 0.5) * np.sign(price)
        ).astype(np.int64)
        t = pa.table(
            {
                "year": yr,
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": pa.array(cents, pa.int64()),
            }
        )
        # in-map partial: collapse the batch to <= |domain| rows
        g = t.group_by(["year", "o_orderpriority"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(
            ["year", "o_orderpriority", "sum_cents", "n_orders"]
        )

    fine = (
        orders.map_batches(finest, batch_format="pyarrow")
        .groupby(["year", "o_orderpriority"])
        .aggregate(
            Sum("sum_cents", alias_name="sum_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )

    # domain-bounded driver fold (dozens of rows by construction).
    # Empty blocks from the groupby carry a bare schema and must be
    # dropped before concat (ArrowInvalid otherwise — schema mismatch).
    _fine_tabs = [t for t in ray.get(fine.materialize().to_arrow_refs()) if t.num_rows]
    ft = pa.concat_tables(
        _fine_tabs
        or [
            pa.table(
                {
                    "year": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                    "sum_cents": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        ]
    ).combine_chunks()

    def lvl(t: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = t.group_by(keys).aggregate(
                [("sum_cents", "sum"), ("n_orders", "sum")]
            ).rename_columns([*keys, "sum_cents", "n_orders"])
        else:
            g = pa.table(
                {
                    "sum_cents": pa.array(
                        [pc.sum(t.column("sum_cents")).as_py() or 0], pa.int64()
                    ),
                    "n_orders": pa.array(
                        [pc.sum(t.column("n_orders")).as_py() or 0], pa.int64()
                    ),
                }
            )
        cols = {
            "year": g.column("year")
            if "year" in g.schema.names
            else pa.nulls(g.num_rows, pa.int64()),
            "o_orderpriority": g.column("o_orderpriority")
            if "o_orderpriority" in g.schema.names
            else pa.nulls(g.num_rows, pa.string()),
            "n_orders": g.column("n_orders").cast(pa.int64()),
            "sum_cents": g.column("sum_cents").cast(pa.int64()),
        }
        return pa.table(cols)

    out = pa.concat_tables([lvl(ft, list(ks)) for ks in sets])
    return rd.from_arrow(out)


def rollup_orders_sql() -> str:
    """DuckDB oracle for :func:`rollup_orders` — the literal ROLLUP,
    with the identical per-row cents quantization inside the SUM."""
    return f"""
SELECT year(o_orderdate) AS year, o_orderpriority,
       count(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * {ROLLUP_CENTS}) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders
GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
"""


def cube_orders(orders: rd.Dataset) -> rd.Dataset:
    """``GROUP BY CUBE(year, priority)`` — all FOUR grouping sets from
    the same single finest-grain shuffle (ROLLUP's lattice completed
    with the (ALL, priority) slice); subtotals stay additive, so the
    extra grain is one more fold of the domain-bounded finest table,
    not another exchange."""
    return rollup_orders(orders, sets=CUBE_SETS)


def cube_orders_sql() -> str:
    """DuckDB oracle for :func:`cube_orders` — the literal CUBE with
    the identical per-row cents quantization."""
    return f"""
SELECT year(o_orderdate) AS year, o_orderpriority,
       count(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * {ROLLUP_CENTS}) AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders
GROUP BY CUBE(year(o_orderdate), o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Pivot (wide conditional aggregation over a small categorical domain)
# ---------------------------------------------------------------------------


def pivot_events(events: rd.Dataset) -> rd.Dataset:
    """Pivot the events table to ONE ROW PER USER with a count column
    per event type (the feature-matrix reshape every per-entity model
    pipeline runs; SQL ``PIVOT`` / conditional aggregation).

    The pivoted column set comes from the DATA — a distinct pass over
    ``event_type`` (a domain-bounded vocabulary, sorted for a
    deterministic schema; ``Dataset.unique`` is a tiny
    column-projected exchange).  The pivot itself is ONE user-key
    shuffle: each block collapses map-side to per-(user, type) partial
    counts (an in-map Arrow ``group_by``), and the per-user group fold
    sums partials into one wide row with ``np.add.at`` — additive, so
    partials of the same (user, type) arriving from different blocks
    combine instead of overwriting.  The reshape adds no exchange; at
    100 TB the shuffled intermediate is |users| x |types| partial rows
    per block, never the raw events.
    """
    types = sorted(events.unique("event_type"))
    tidx = {t: j for j, t in enumerate(types)}

    def partial(b: pa.Table) -> pa.Table:
        return (
            b.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
            .rename_columns(["user_id", "event_type", "n"])
        )

    def widen(group: pa.Table) -> pa.Table:
        ty = group.column("event_type").to_pylist()
        n = group.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        row = np.zeros(len(types), np.int64)
        np.add.at(row, [tidx[t] for t in ty], n)
        cols: dict = {
            "user_id": pa.array(
                [group.column("user_id")[0].as_py()], pa.int64()
            )
        }
        for j, t in enumerate(types):
            cols[t] = pa.array([row[j]], pa.int64())
        return pa.table(cols)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(widen, batch_format="pyarrow")
    )


def pivot_events_sql(src: str) -> str:
    """DuckDB oracle for :func:`pivot_events` — DuckDB's dynamic
    ``PIVOT`` derives the column set from the data exactly as the
    engine's distinct pass does (columns named by the type value on
    BOTH sides; absent types stay absent identically), so the twin
    needs no static type list."""
    return f"""
PIVOT (SELECT user_id, event_type FROM {src})
ON event_type USING count(*)
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Q12 analog: shipping-priority counts (join + conditional aggregation)
# ---------------------------------------------------------------------------

Q12_START = "1996-01-01"
Q12_END = "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def shipmode_priority(
    lineitem: rd.Dataset,
    orders: rd.Dataset,
    start: str = Q12_START,
    end: str = Q12_END,
) -> rd.Dataset:
    """TPC-H Q12 analog — per ``l_linestatus`` (standing in for the
    schema's missing ``l_shipmode``), how many shipdate-window
    lineitems belong to high-priority (1-URGENT/2-HIGH) vs other
    orders.  The Q12 plan: the date filter prunes lineitem FIRST (the
    selective side), the join ships only (l_orderkey, l_linestatus)
    against (o_orderkey, o_orderpriority) — ONE key exchange via the
    partitioned hash join — and the conditional aggregation collapses
    map-side over the tiny linestatus domain before a second,
    group-domain-sized exchange.
    """
    from search_engine_ray.functions.joins import hash_join

    s_dt = _dt.datetime.fromisoformat(start)
    e_dt = _dt.datetime.fromisoformat(end)

    def win(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate")
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(s_dt)), pc.less(ts, pa.scalar(e_dt))
        )
        return b.filter(keep).select(["l_orderkey", "l_linestatus"])

    joined = hash_join(
        lineitem.map_batches(win, batch_format="pyarrow"),
        orders.select_columns(["o_orderkey", "o_orderpriority"]),
        "l_orderkey",
        "o_orderkey",
        mode="shuffle",
    )

    def combine(b: pa.Table) -> pa.Table:
        is_high = pc.is_in(
            b.column("o_orderpriority"), value_set=pa.array(Q12_HIGH)
        )
        hi = pc.cast(is_high, pa.int64())
        t = pa.table(
            {
                "l_linestatus": b.column("l_linestatus"),
                "high_line_count": hi,
                "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )
        return (
            t.group_by("l_linestatus")
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(["l_linestatus", "high_line_count", "low_line_count"])
        )

    agg = (
        joined.map_batches(combine, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": b.column("l_linestatus"),
                "high_line_count": b.column("high_line_count").cast(pa.int64()),
                "low_line_count": b.column("low_line_count").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("l_linestatus")


def shipmode_priority_sql(start: str = Q12_START, end: str = Q12_END) -> str:
    """DuckDB oracle for :func:`shipmode_priority` (Q12 shape)."""
    hi = ", ".join(f"'{p}'" for p in Q12_HIGH)
    return f"""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ({hi}) THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ({hi}) THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{start}'
  AND l_shipdate < TIMESTAMP '{end}'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 analog: promo-type revenue share (broadcast dimension join + ratio)
# ---------------------------------------------------------------------------

Q14_START = "1996-01-01"
Q14_END = "1996-04-01"
Q14_TYPE = "ECONOMY"
_Q14_QUANT = 100  # revenue cents


def promo_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    start: str = Q14_START,
    end: str = Q14_END,
    promo_type: str = Q14_TYPE,
) -> rd.Dataset:
    """TPC-H Q14 analog — the revenue share of one part type
    (``ECONOMY`` standing in for Q14's ``PROMO%`` prefix; the synth
    part table has flat type labels) in a shipdate window.  The Q14
    plan: ``part`` is the CLASSIC small dimension — broadcast once
    (``ray.put`` via the broadcast hash join), the windowed lineitem
    side streams with ZERO shuffles, per-row revenue quantizes to
    int64 cents, and the two conditional sums fold associatively to
    one row.  Output: (promo_cents, total_cents, promo_share) where
    share = round(promo/total, 6) computed from the SAME exact ints in
    both engines.
    """
    from search_engine_ray.functions.joins import hash_join

    s_dt = _dt.datetime.fromisoformat(start)
    e_dt = _dt.datetime.fromisoformat(end)

    def win(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate")
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(s_dt)), pc.less(ts, pa.scalar(e_dt))
        )
        return b.filter(keep).select(
            ["l_partkey", "l_extendedprice", "l_discount"]
        )

    joined = hash_join(
        lineitem.map_batches(win, batch_format="pyarrow"),
        part.select_columns(["p_partkey", "p_type"]),
        "l_partkey",
        "p_partkey",
        mode="broadcast",
    )

    def partial(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        cents = (np.floor(np.abs(rev) * _Q14_QUANT + 0.5) * np.sign(rev)).astype(
            np.int64
        )
        is_promo = pc.equal(
            b.column("p_type"), pa.scalar(promo_type)
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo_cents": pa.array(
                    [int(cents[is_promo].sum())], pa.int64()
                ),
                "total_cents": pa.array([int(cents.sum())], pa.int64()),
            }
        )

    sums = joined.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_cents", alias_name="promo_cents"),
        Sum("total_cents", alias_name="total_cents"),
    )
    promo = int(sums["promo_cents"] or 0)
    total = int(sums["total_cents"] or 0)
    share = round(promo / total, 6) if total else 0.0
    return rd.from_arrow(
        pa.table(
            {
                "promo_cents": pa.array([promo], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "promo_share": pa.array([share], pa.float64()),
            }
        )
    )


def promo_revenue_sql(
    start: str = Q14_START, end: str = Q14_END, promo_type: str = Q14_TYPE
) -> str:
    """DuckDB oracle for :func:`promo_revenue` (Q14 shape) — identical
    per-row cents quantization, identical round-6 share."""
    cents = (
        f"CAST(round(l_extendedprice * (1 - l_discount) * {_Q14_QUANT}) "
        "AS BIGINT)"
    )
    return f"""
WITH s AS (
    SELECT CAST(SUM(CASE WHEN p_type = '{promo_type}' THEN {cents} ELSE 0 END)
                AS BIGINT) AS promo_cents,
           CAST(SUM({cents}) AS BIGINT) AS total_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{start}'
      AND l_shipdate < TIMESTAMP '{end}'
)
SELECT promo_cents, total_cents,
       round(promo_cents / total_cents, 6) AS promo_share
FROM s
"""


# ---------------------------------------------------------------------------
# Q17 analog — small-quantity-order revenue (aggregate-rejoin)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#4"
_Q17_QUANT = 100  # money to int64 cents (the Q14 device)


def small_qty_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    brand: str = Q17_BRAND,
    max_keys_broadcast: int = 2_000_000,
) -> rd.Dataset:
    """TPC-H Q17 analog — revenue lost to small-quantity orders: among
    one brand's lineitems, sum the prices of rows whose quantity is
    below 20% of that PART's average quantity, divided by 7.  The
    classic decorrelated scalar subquery (``l_quantity < 0.2 *
    (SELECT avg ... WHERE same part)``) — an aggregate of the fact
    table rejoined against the fact table itself.

    Plan: the brand filter usually makes ``part`` the genuinely small
    side — its KEY SET broadcasts once (``ray.put`` of a sorted int64
    array, vectorized ``searchsorted`` membership in-map), so the fact
    table semi-filters with ZERO shuffles and only the brand's
    lineitems (partkey, qty, cents) enter the ONE
    ``groupby(l_partkey)`` exchange, where each part resolves its own
    average and threshold test vectorized — the aggregate and the
    rejoin meet in the same exchange, never two.  When the filtered
    key set exceeds ``max_keys_broadcast`` (a non-selective brand at
    scale), the membership routes through the key-partitioned exact
    :func:`~search_engine_ray.functions.joins.semi_join` instead —
    one extra bucketed key exchange, no driver-side array — pinned
    equal to the broadcast path by a forced-low-threshold test.

    Exactness device: quantities are integral, so the float predicate
    ``q < 0.2 * (sum/cnt)`` is the INTEGER inequality ``5*q*cnt <
    sum`` (cnt > 0) — exact at any block order, shared verbatim with
    the SQL twin; money folds as int64 cents and ``avg_yearly`` is the
    same single ``cents / 700.0`` IEEE division in both engines.
    """
    filtered = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_brand"), pa.scalar(brand)))
        .select(["p_partkey"]),
        batch_format="pyarrow",
    )

    def quantize(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = (
            np.floor(np.abs(price) * _Q17_QUANT + 0.5) * np.sign(price)
        ).astype(np.int64)
        return pa.table(
            {
                "pk": b.column("l_partkey"),
                "q": pa.array(q.astype(np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    n_keys = filtered.count()
    if n_keys > max_keys_broadcast:
        # scale fallback: the brand key set is NOT small — route the
        # membership through the key-partitioned exact semi-join (one
        # bucketed exchange of keys, never a driver-side array), then
        # quantize as usual; pinned equal to the broadcast path by a
        # forced-low-threshold test (the tfidf two-path pattern)
        from search_engine_ray.functions.joins import semi_join

        kept = semi_join(
            lineitem.select_columns(
                ["l_partkey", "l_quantity", "l_extendedprice"]
            ),
            filtered,
            left_on="l_partkey",
            right_on="p_partkey",
            mode="shuffle",
        )
        pre = kept.map_batches(quantize, batch_format="pyarrow")
    else:
        keys = filtered.take_all()
        key_arr = np.sort(np.array([r["p_partkey"] for r in keys], np.int64))
        key_ref = ray.put(key_arr)

        def semi(b: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)
            pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, pk)
            pos[pos == len(ks)] = 0
            m = ks[pos] == pk if len(ks) else np.zeros(len(pk), bool)
            return quantize(b.filter(pa.array(m)))

        pre = lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice"]
        ).map_batches(semi, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        q = g.column("q").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        small = 5 * q * len(q) < q.sum()
        return pa.table(
            {"part_cents": pa.array([int(cents[small].sum())], pa.int64())}
        )

    per_part = pre.groupby("pk").map_groups(resolve, batch_format="pyarrow")
    total = per_part.aggregate(Sum("part_cents", alias_name="small_cents"))
    cents_sum = int(total["small_cents"] or 0)
    return rd.from_arrow(
        pa.table(
            {
                "small_cents": pa.array([cents_sum], pa.int64()),
                "avg_yearly": pa.array([cents_sum / 700.0], pa.float64()),
            }
        )
    )


def small_qty_revenue_sql(brand: str = Q17_BRAND) -> str:
    """DuckDB oracle for :func:`small_qty_revenue` — the same integer
    inequality and cents quantization, so no epsilon anywhere."""
    return f"""
WITH l AS (
    SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_extendedprice * {_Q17_QUANT}) AS BIGINT) AS cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = '{brand}'
), g AS (
    SELECT pk, SUM(q) AS sq, COUNT(*) AS cnt FROM l GROUP BY pk
), s AS (
    SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS small_cents
    FROM l JOIN g USING (pk) WHERE 5 * l.q * g.cnt < g.sq
)
SELECT small_cents, small_cents / 700.0 AS avg_yearly FROM s
"""


# ---------------------------------------------------------------------------
# Q22 analog — global sales opportunity (scalar subquery + anti-join)
# ---------------------------------------------------------------------------


Q22_BIG_ORDER = 400_000.0


def sales_opportunity(
    customer: rd.Dataset,
    orders: rd.Dataset,
    big_order_min: float = Q22_BIG_ORDER,
) -> rd.Dataset:
    """TPC-H Q22 analog — per nation, the count and balance mass of
    customers with an ABOVE-AVERAGE positive account balance and NO
    BIG order (none above ``big_order_min`` — the synthetic corpus
    gives every customer SOME order, so the literal Q22 "no orders"
    is vacuous; the filtered right side keeps the exact NOT-EXISTS
    shape and adds the realistic anti-join-after-selection).  Two
    decorrelated subqueries in one query: a global scalar aggregate
    (the average) and a ``NOT EXISTS`` (the anti-join).

    Plan: balances quantize to int64 cents in-map; the global (sum,
    count) of positive balances folds with ONE distributed aggregate
    (two int64 scalars to the driver — never rows); the ``NOT
    EXISTS`` is :func:`joins.semi_join` ``anti=True`` over the
    in-map-filtered orders (only qualifying order KEYS move, auto
    broadcast/shuffle); the above-average test is the exact integer
    inequality ``cents * cnt > sum`` (no float average anywhere); the
    final rollup is driver-finished over the tiny nation domain after
    in-map pre-aggregation, which also pins the output schema when
    the result is empty.
    """
    from search_engine_ray.functions.joins import semi_join

    def cents_map(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = (np.floor(np.abs(bal) * 100 + 0.5) * np.sign(bal)).astype(
            np.int64
        )
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_nationkey": b.column("c_nationkey"),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    cust = customer.select_columns(
        ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(cents_map, batch_format="pyarrow")

    def pos_partial(b: pa.Table) -> pa.Table:
        c = b.column("cents").to_numpy(zero_copy_only=False)
        pos = c[c > 0]
        return pa.table(
            {
                "sm": pa.array([int(pos.sum())], pa.int64()),
                "cnt": pa.array([len(pos)], pa.int64()),
            }
        )

    tot = cust.map_batches(pos_partial, batch_format="pyarrow").aggregate(
        Sum("sm", alias_name="sm"), Sum("cnt", alias_name="cnt")
    )
    sm, cnt = int(tot["sm"] or 0), int(tot["cnt"] or 0)
    if cnt == 0:  # SQL: comparison against NULL avg keeps nothing
        return rd.from_arrow(
            pa.table(
                {
                    "c_nationkey": pa.array([], pa.int32()),
                    "n_custs": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        )

    rich = cust.map_batches(
        lambda b: b.filter(
            pc.greater(
                pc.multiply(b.column("cents"), pa.scalar(cnt, pa.int64())),
                pa.scalar(sm, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
    big = orders.map_batches(
        lambda b: b.filter(
            pc.greater(b.column("o_totalprice"), pa.scalar(big_order_min))
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    no_big = semi_join(rich, big, "c_custkey", "o_custkey", anti=True)

    def nation_partial(b: pa.Table) -> pa.Table:
        return b.group_by("c_nationkey").aggregate(
            [("cents", "sum"), ("cents", "count")]
        ).rename_columns(["c_nationkey", "total_cents", "n_custs"])

    # nation-domain-sized finish: take_all is bounded by |nations|, and
    # constructing the table driver-side pins the schema even when empty
    rows = (
        no_big.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_custs", alias_name="n_custs"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .take_all()
    )
    return rd.from_arrow(
        pa.table(
            {
                "c_nationkey": pa.array(
                    [r["c_nationkey"] for r in rows], pa.int32()
                ),
                "n_custs": pa.array([r["n_custs"] for r in rows], pa.int64()),
                "total_cents": pa.array(
                    [r["total_cents"] for r in rows], pa.int64()
                ),
            }
        )
    )


def sales_opportunity_sql(big_order_min: float = Q22_BIG_ORDER) -> str:
    """DuckDB oracle for :func:`sales_opportunity` — same cents
    quantization, same integer above-average inequality, literal
    NOT EXISTS over the same filtered orders."""
    big = repr(big_order_min)
    return f"""
WITH c AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS cents
    FROM customer
), s AS (
    SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS sm,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM c WHERE cents > 0
), k AS (
    SELECT c.c_nationkey, c.cents FROM c, s
    WHERE c.cents * s.cnt > s.sm
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > {big})
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM k GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q15 analog — top supplier (argmax over an aggregated view, ties kept)
# ---------------------------------------------------------------------------

Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def top_supplier(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    start: str = Q15_START,
    end: str = Q15_END,
) -> rd.Dataset:
    """TPC-H Q15 analog — the supplier(s) with the maximum windowed
    revenue, TIES KEPT (the view + ``WHERE total = (SELECT max(...))``
    shape, which a plain top-1 sort truncates wrong on ties).

    Plan: windowed lineitem pre-aggregates per-supplier cents IN-MAP
    (Arrow ``group_by`` per block), ONE suppkey groupby folds the
    partials (supplier-domain-sized, never lineitem-sized), the global
    max is a second DISTRIBUTED aggregate over that small table (one
    scalar to the driver), the tie set filters distributed, and only
    the winner keys (|ties|, guarded) return to broadcast-join the
    supplier names.  Money folds as exact int64 cents — argmax over
    float sums would be block-order-dependent at the tie boundary.
    """
    s_dt = _dt.datetime.fromisoformat(start)
    e_dt = _dt.datetime.fromisoformat(end)

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate")
        keep = pc.and_(
            pc.greater_equal(ts, pa.scalar(s_dt)), pc.less(ts, pa.scalar(e_dt))
        )
        b = b.filter(keep)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        cents = (np.floor(np.abs(rev) * 100 + 0.5) * np.sign(rev)).astype(
            np.int64
        )
        t = pa.table({"sk": b.column("l_suppkey"), "c": pa.array(cents)})
        return t.group_by("sk").aggregate([("c", "sum")]).rename_columns(
            ["sk", "c"]
        )

    rev = (
        lineitem.select_columns(
            ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("c", alias_name="total_cents"))
        .materialize()  # two consumers: the max and the tie filter
    )
    mx = rev.aggregate(Max("total_cents", alias_name="mx"))["mx"]
    if mx is None:
        return rd.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "s_name": pa.array([], pa.string()),
                    "total_cents": pa.array([], pa.int64()),
                }
            )
        )
    winners = rev.map_batches(
        lambda b: b.filter(
            pc.equal(b.column("total_cents"), pa.scalar(int(mx), pa.int64()))
        ),
        batch_format="pyarrow",
    ).take_all()
    if len(winners) > 100_000:
        raise ValueError(
            f"top_supplier: {len(winners)} tied winners — a degenerate "
            "revenue column; investigate before broadcasting"
        )
    wk = {int(r["sk"]): int(r["total_cents"]) for r in winners}
    wk_ref = ray.put(wk)

    def name_join(b: pa.Table) -> pa.Table:
        w = ray.get(wk_ref)
        sk = b.column("s_suppkey").to_numpy(zero_copy_only=False)
        m = np.array([int(k) in w for k in sk], bool)
        b = b.filter(pa.array(m))
        cents = [w[int(k)] for k in b.column("s_suppkey").to_pylist()]
        return pa.table(
            {
                "s_suppkey": b.column("s_suppkey"),
                "s_name": b.column("s_name"),
                "total_cents": pa.array(cents, pa.int64()),
            }
        )

    return supplier.select_columns(["s_suppkey", "s_name"]).map_batches(
        name_join, batch_format="pyarrow"
    )


def top_supplier_sql(start: str = Q15_START, end: str = Q15_END) -> str:
    """DuckDB oracle for :func:`top_supplier` — the literal view + max
    subquery with the same per-row cents quantization."""
    return f"""
WITH rev AS (
    SELECT l_suppkey AS sk,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{start}'
      AND l_shipdate < TIMESTAMP '{end}'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_cents
FROM supplier JOIN rev ON s_suppkey = sk
WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
"""


# ---------------------------------------------------------------------------
# Composed per-user feature matrix (pivot ⋈ per-user median)
# ---------------------------------------------------------------------------


def user_features(events: rd.Dataset) -> rd.Dataset:
    """Composed feature-engineering pipeline: ONE ROW PER USER carrying
    the per-type event counts (:func:`pivot_events`) joined with the
    user's exact median event value (:func:`aggregates.grouped_quantiles`
    keyed by user, the same ceil-rank rule) — the feature matrix a
    per-entity model actually trains on, assembled from two
    already-oracled primitives plus ONE partitioned hash join on
    user_id (each input is user-keyed and user-domain-sized; the
    composition adds no new scale risk, which is the point of
    composing primitives instead of widening one op).
    """
    from search_engine_ray.functions.aggregates import grouped_quantiles
    from search_engine_ray.functions.joins import hash_join

    piv = pivot_events(events)
    med = grouped_quantiles(
        events, "user_id", "value", quantiles=((1, 2),)
    ).map_batches(
        lambda t: pa.table(
            {
                "med_user": t.column("user_id").cast(pa.int64()),
                "p50_value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(piv, med, "user_id", "med_user", mode="shuffle")
    return joined.map_batches(
        lambda t: t.drop_columns(["med_user"])
        if "med_user" in t.schema.names
        else t,
        batch_format="pyarrow",
    )


def user_features_sql(src: str) -> str:
    """DuckDB oracle for :func:`user_features` — the dynamic PIVOT
    joined with the explicit rank-rule median, twins composed by
    relation nesting exactly as the engine composes operators."""
    return f"""
WITH piv AS (
    PIVOT (SELECT user_id, event_type FROM {src})
    ON event_type USING count(*)
    GROUP BY user_id
),
vals AS (SELECT user_id AS g, value AS v FROM {src}
         WHERE value IS NOT NULL),
counts AS (SELECT g, v, count(*) AS n FROM vals GROUP BY g, v),
cum AS (SELECT g, v, sum(n) OVER (PARTITION BY g ORDER BY v) AS c
        FROM counts),
tot AS (SELECT g, count(*) AS n FROM vals GROUP BY g),
med AS (
    SELECT t.g AS user_id,
           (SELECT min(v) FROM cum
            WHERE cum.g = t.g AND c >= (1 * t.n + 2 - 1) // 2) AS p50_value
    FROM tot t
)
SELECT piv.*, med.p50_value
FROM piv JOIN med USING (user_id)
"""


def unpivot_events(wide: rd.Dataset, id_col: str = "user_id") -> rd.Dataset:
    """UNPIVOT/melt the :func:`pivot_events` feature matrix back to
    long (user_id, event_type, n) rows — the inverse reshape (SQL
    ``UNPIVOT``; pandas ``melt``).  Zero counts survive: a pivoted 0
    is a value, not a NULL, and dropping it would silently change the
    row count of every downstream per-(user, type) join — callers who
    want the sparse form filter ``n > 0`` (which recovers exactly the
    pre-pivot groupby counts; pinned by the roundtrip test).

    Plan: pure zero-shuffle map — each wide row explodes into
    |value columns| long rows with np.repeat/tile (no Python loop, no
    exchange; the reshape is embarrassingly parallel).  The value
    column set is taken from each block's schema (every block of a
    pivot output carries the full deterministic sorted column set).
    """

    def melt(b: pa.Table) -> pa.Table:
        vcols = [c for c in b.column_names if c != id_col]
        k, m = len(vcols), b.num_rows
        ids = np.repeat(
            b.column(id_col).to_numpy(zero_copy_only=False), k
        )
        types = np.tile(np.array(vcols, dtype=object), m)
        vals = np.empty((m, k), np.int64)
        for j, c in enumerate(vcols):
            vals[:, j] = b.column(c).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "n": pa.array(vals.reshape(-1), pa.int64()),
            }
        )

    return wide.map_batches(
        lambda t: melt(t.replace_schema_metadata(None)),
        batch_format="pyarrow",
    )


def unpivot_events_sql(src: str) -> str:
    """DuckDB oracle for :func:`unpivot_events` composed over
    :func:`pivot_events` — dynamic UNPIVOT over dynamic PIVOT, the
    same derived column set on both sides."""
    return f"""
UNPIVOT (PIVOT (SELECT user_id, event_type FROM {src})
         ON event_type USING count(*) GROUP BY user_id)
ON COLUMNS(* EXCLUDE (user_id))
INTO NAME event_type VALUE n
"""


# ---------------------------------------------------------------------------
# Q13 analog: customer order-count distribution
# ---------------------------------------------------------------------------


def customer_distribution(
    customer: rd.Dataset, orders: rd.Dataset
) -> pa.Table:
    """Distribution of orders-per-customer INCLUDING the zero bucket
    (TPC-H Q13 — "how many customers placed k orders"): one row per
    distinct order count with the number of customers at that count,
    ordered (custdist DESC, c_count DESC).

    The classic plan is customer LEFT JOIN orders + two aggregations;
    the scale-smart plan here NEVER JOINS: per-customer counts come
    from ONE custkey groupby over orders (in-map partials), the
    histogram of counts is a second exchange over the tiny count
    domain, and the zero bucket is PURE ARITHMETIC — ``|customer| -
    |custkeys seen in orders|`` — because a left join's null rows are
    exactly the customers no order references.  The join the SQL twin
    performs is replaced by one distributed count.  Assumes
    referential integrity (every o_custkey exists in customer — the
    FK the schema declares); a violation would make the zero bucket
    negative, which is checked and refused loudly rather than
    silently mis-binned.

    Counts are exact int64; no floats anywhere.
    """

    def order_partial(b: pa.Table) -> pa.Table:
        t = b.select(["o_custkey"])
        out = t.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return out.rename_columns(["o_custkey", "n"])

    per_cust = (
        orders.map_batches(
            lambda t: order_partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        t = b.select(["c_count"])
        out = t.group_by(["c_count"]).aggregate([([], "count_all")])
        return out.rename_columns(["c_count", "custdist"])

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )
    tabs = [t for t in ray.get(hist.materialize().to_arrow_refs()) if t.num_rows]
    n_customers = customer.count()
    rows: list[tuple[int, int]] = []
    seen = 0
    if tabs:
        t = pa.concat_tables(tabs)
        for c, d in zip(_col(t, "c_count"), _col(t, "custdist")):
            rows.append((int(c), int(d)))
            seen += int(d)
    zero = n_customers - seen
    if zero < 0:
        raise ValueError(
            "customer_distribution: orders reference more distinct "
            "custkeys than customer rows — FK violation"
        )
    if zero > 0:
        rows.append((0, zero))
    rows.sort(key=lambda r: (-r[1], -r[0]))
    return pa.table(
        {
            "c_count": pa.array([c for c, _ in rows], pa.int64()),
            "custdist": pa.array([d for _, d in rows], pa.int64()),
        }
    )


def customer_distribution_sql() -> str:
    """DuckDB oracle for :func:`customer_distribution` — the textbook
    LEFT JOIN + double aggregation."""
    return """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q7 analog: nation-pair shipping volume
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


def nation_volume(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
    join_mode: str = "auto",
) -> pa.Table:
    """Bilateral shipping volume between two nations by year (TPC-H
    Q7): revenue of lineitems shipped in [date_from, date_to) where
    the supplier sits in one of the two nations and the ordering
    customer in the OTHER, grouped by (supp_nation, cust_nation,
    year) — the trade-balance readout, and the multi-join shape of
    :func:`region_revenue` with a cross-pair constraint instead of an
    intra-nation one.

    Plan (the region_revenue discipline): nation resolves driver-side
    (25 rows — constant); customer pre-filters to the two nations
    BEFORE its shuffle join with orders (the selective side prunes at
    the read, never after the exchange); the date-pruned lineitem
    meets that result in the one fact-fact orderkey exchange shipping
    only integer keys + quantized revenue + a small year; supplier
    (the genuinely small side) joins by ``join_mode``; the asymmetric
    pair filter keeps (a→b) and (b→a) and the final groupby is
    map-side-combined over a |2 x years| domain.  Money per-row
    int64-quantized — exact at any block order.
    """
    from .joins import hash_join, hash_join_schema

    lo = _dt.datetime.fromisoformat(date_from)
    hi = _dt.datetime.fromisoformat(date_to)

    nt = pa.concat_tables(
        [t for t in ray.get(nation.materialize().to_arrow_refs()) if t.num_rows]
    )
    nk = {
        r["n_name"]: r["n_nationkey"]
        for r in nt.to_pylist()
        if r["n_name"] in (nation_a, nation_b)
    }
    empty = pa.table(
        {
            "supp_nation": pa.array([], pa.string()),
            "cust_nation": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
        }
    )
    if len(nk) != 2:
        return empty
    ka, kb = nk[nation_a], nk[nation_b]
    names = {ka: nation_a, kb: nation_b}
    pair_arr = pa.array(sorted((ka, kb)), pa.int32())

    def cust_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_nationkey"), value_set=pair_arr))
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_nationkey": b.column("c_nationkey"),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
            }
        )

    def line_rows(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
            pc.less(b.column("l_shipdate"), pa.scalar(hi)),
        )
        b = b.filter(keep)
        rev = _quant(
            _col(b, "l_extendedprice") * (1.0 - _col(b, "l_discount"))
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "l_year": pc.year(b.column("l_shipdate")).cast(pa.int64()),
                "q_rev": pa.array(rev, pa.int64()),
            }
        )

    def supp_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("s_nationkey"), value_set=pair_arr))
        return pa.table(
            {
                "s_suppkey": b.column("s_suppkey"),
                "s_nationkey": b.column("s_nationkey"),
            }
        )

    cust = customer.map_batches(cust_rows, batch_format="pyarrow")
    ords = orders.map_batches(order_rows, batch_format="pyarrow")
    line = lineitem.map_batches(line_rows, batch_format="pyarrow")
    supp = supplier.map_batches(supp_rows, batch_format="pyarrow")

    # explicit schemas end-to-end (region_revenue discipline): the
    # chain streams once, no materialize(), no schema-inference
    # re-execution of the fact-fact exchange
    ot = dict(zip(orders.schema().names, orders.schema().types))
    ct = dict(zip(customer.schema().names, customer.schema().types))
    ltt = dict(zip(lineitem.schema().names, lineitem.schema().types))
    st = dict(zip(supplier.schema().names, supplier.schema().types))
    ords_schema = pa.schema(
        [("o_orderkey", ot["o_orderkey"]), ("o_custkey", ot["o_custkey"])])
    cust_schema = pa.schema(
        [("c_custkey", ct["c_custkey"]), ("c_nationkey", ct["c_nationkey"])])
    line_schema = pa.schema(
        [("l_orderkey", ltt["l_orderkey"]), ("l_suppkey", ltt["l_suppkey"]),
         ("l_year", pa.int64()), ("q_rev", pa.int64())])
    supp_schema = pa.schema(
        [("s_suppkey", st["s_suppkey"]), ("s_nationkey", st["s_nationkey"])])

    # Q5's semi-prefilter discipline: here ORDERS enters its exchange
    # unfiltered, so the nation-pair-pruned CUSTOMER KEY SET (~2/25)
    # broadcasts first and orders streams through the membership mask;
    # the surviving ORDER KEY SET then prefilters lineitem the same
    # way. Both gated on the 2M broadcast bound (skip above — a shuffle
    # semi-join would be its own fact exchange); results identical
    # either way, pinned by the shared oracle.
    if Q5_PREFILTER:
        from .joins import BROADCAST_MAX_ROWS, semi_join

        # gate BEFORE materialize (the region_revenue / hash_join
        # auto-mode rule): counts stream, only under-bound projections
        # pin, and the filter keys + j1 then share the cached blocks
        # (gate constant == semi_join's own enforcement bound, so the
        # two can never diverge into a hard refusal)
        if cust.count() <= BROADCAST_MAX_ROWS:
            cust = cust.materialize()
            ords = semi_join(ords, cust, "o_custkey", "c_custkey",
                             mode="broadcast")
        if ords.count() <= BROADCAST_MAX_ROWS:
            ords = ords.materialize()
            line = semi_join(line, ords, "l_orderkey", "o_orderkey",
                             mode="broadcast")

    shuffle_mode = "shuffle" if join_mode == "auto" else join_mode
    j1 = hash_join(
        ords, cust, "o_custkey", "c_custkey", mode=shuffle_mode,
        left_schema=ords_schema, right_schema=cust_schema,
    )
    j1 = j1.map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    j1_schema = pa.schema(
        [("o_orderkey", ot["o_orderkey"]), ("c_nationkey", ct["c_nationkey"])])
    j2 = hash_join(
        line, j1, "l_orderkey", "o_orderkey", mode=shuffle_mode,
        left_schema=line_schema, right_schema=j1_schema,
    )
    j2_schema = hash_join_schema(line_schema, "l_orderkey", j1_schema,
                                 "o_orderkey")
    j3 = hash_join(j2, supp, "l_suppkey", "s_suppkey", mode=join_mode,
                   left_schema=j2_schema, right_schema=supp_schema)

    def partial(b: pa.Table) -> pa.Table:
        # cross-pair only: supplier nation != customer nation (both
        # already restricted to {a, b})
        b = b.filter(
            pc.not_equal(b.column("s_nationkey"), b.column("c_nationkey"))
        )
        t = pa.table(
            {
                "s_nationkey": b.column("s_nationkey"),
                "c_nationkey": b.column("c_nationkey"),
                "l_year": b.column("l_year"),
                "q_rev": b.column("q_rev"),
            }
        )
        g = t.group_by(["s_nationkey", "c_nationkey", "l_year"]).aggregate(
            [("q_rev", "sum")]
        )
        return g.rename_columns(
            ["s_nationkey", "c_nationkey", "l_year", "q_rev"]
        )

    agg = (
        j3.map_batches(partial, batch_format="pyarrow")
        .groupby(["s_nationkey", "c_nationkey", "l_year"])
        .aggregate(Sum("q_rev", alias_name="q_rev"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    rows = sorted(
        (
            names[int(s)],
            names[int(c)],
            int(y),
            int(q),
        )
        for s, c, y, q in zip(
            _col(t, "s_nationkey"),
            _col(t, "c_nationkey"),
            _col(t, "l_year"),
            _col(t, "q_rev"),
        )
    )
    return pa.table(
        {
            "supp_nation": pa.array([r[0] for r in rows], pa.string()),
            "cust_nation": pa.array([r[1] for r in rows], pa.string()),
            "l_year": pa.array([r[2] for r in rows], pa.int64()),
            "revenue": pa.array(
                [r[3] / _Q for r in rows], pa.float64()
            ),
        }
    )


def nation_volume_sql(
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
    date_from: str = Q7_FROM,
    date_to: str = Q7_TO,
) -> str:
    """DuckDB oracle for :func:`nation_volume` (same quantization,
    same [from, to) window, same order)."""
    q = int(_Q)
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q} + 0.5)
                AS BIGINT)) / {q}.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{nation_a}' AND n2.n_name = '{nation_b}')
       OR (n1.n_name = '{nation_b}' AND n2.n_name = '{nation_a}'))
  AND l_shipdate >= TIMESTAMP '{date_from}'
  AND l_shipdate < TIMESTAMP '{date_to}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q10 analog: returned-item revenue (top-k customers)
# ---------------------------------------------------------------------------

Q10_FROM = "1997-07-01"
Q10_TO = "1997-10-01"
Q10_K = 20


def returned_customers(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    nation: rd.Dataset,
    date_from: str = Q10_FROM,
    date_to: str = Q10_TO,
    k: int = Q10_K,
    join_mode: str = "auto",
) -> pa.Table:
    """Top-``k`` customers by revenue of RETURNED lineitems on orders
    placed in [date_from, date_to) (TPC-H Q10 — the churn-risk
    report: who sent the most money back last quarter), enriched with
    name, account balance and nation.

    Plan: the return-flag filter prunes lineitem at the read and
    revenue pre-aggregates per (orderkey) in-map BEFORE the one
    orderkey shuffle join with the date-pruned orders; per-customer
    revenue is a second map-side-combined groupby; the top-k is
    per-block partial selection + a k-row driver merge (never a
    global sort); and enrichment is the :func:`big_orders` discipline
    — SEMI-prune the corpus-scale customer table to the k keys with
    an isin mask map, then join k-row frames driver-side.  Nation
    resolves driver-side (25 rows).  Money per-row int64-quantized —
    exact at any block order; ties (same revenue) break custkey ASC.
    """
    from .joins import hash_join

    lo = _dt.datetime.fromisoformat(date_from)
    hi = _dt.datetime.fromisoformat(date_to)

    nt = pa.concat_tables(
        [t for t in ray.get(nation.materialize().to_arrow_refs()) if t.num_rows]
    )
    nmap = {r["n_nationkey"]: r["n_name"] for r in nt.to_pylist()}
    empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue": pa.array([], pa.float64()),
            "c_acctbal": pa.array([], pa.float64()),
            "n_name": pa.array([], pa.string()),
        }
    )

    def order_rows(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("o_orderdate"), pa.scalar(lo)),
            pc.less(b.column("o_orderdate"), pa.scalar(hi)),
        )
        b = b.filter(keep)
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
            }
        )

    def line_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "q_rev": pa.array(
                    _quant(
                        _col(b, "l_extendedprice")
                        * (1.0 - _col(b, "l_discount"))
                    ),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by(["l_orderkey"]).aggregate([("q_rev", "sum")])
        return g.rename_columns(["l_orderkey", "q_rev"])

    ords = orders.map_batches(order_rows, batch_format="pyarrow")
    line = lineitem.map_batches(line_partial, batch_format="pyarrow")
    j = hash_join(
        line, ords, "l_orderkey", "o_orderkey",
        mode="shuffle" if join_mode == "auto" else join_mode,
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"o_custkey": b.column("o_custkey"), "q_rev": b.column("q_rev")}
        )
        g = t.group_by(["o_custkey"]).aggregate([("q_rev", "sum")])
        return g.rename_columns(["o_custkey", "q_rev"])

    per_cust = (
        j.map_batches(cust_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("q_rev", alias_name="q_rev"))
    )

    def part_topk(b: pa.Table) -> pa.Table:
        order = np.lexsort((_col(b, "o_custkey"), -_col(b, "q_rev")))[:k]
        return b.take(order)

    parts = [
        t
        for t in ray.get(
            per_cust.map_batches(
                part_topk, batch_format="pyarrow"
            ).materialize().to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    order = np.lexsort((_col(t, "o_custkey"), -_col(t, "q_rev")))[:k]
    top = t.take(order).combine_chunks()

    ckeys = pa.array(top.column("o_custkey").to_pylist(), pa.int64())

    def cust_rows(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column("c_custkey"), value_set=ckeys))
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
                "c_nationkey": b.column("c_nationkey"),
            }
        )

    cust_k = pa.concat_tables(
        [
            x
            for x in ray.get(
                customer.map_batches(
                    cust_rows, batch_format="pyarrow"
                ).materialize().to_arrow_refs()
            )
            if x.num_rows
        ]
    ).combine_chunks()
    out = top.join(cust_k, keys="o_custkey", right_keys="c_custkey")
    if not out.num_rows:
        return empty
    order2 = np.lexsort((_col(out, "o_custkey"), -_col(out, "q_rev")))
    out = out.take(order2)
    return pa.table(
        {
            "c_custkey": out.column("o_custkey").cast(pa.int64()),
            "c_name": out.column("c_name"),
            "revenue": pa.array(_col(out, "q_rev") / _Q, pa.float64()),
            "c_acctbal": out.column("c_acctbal"),
            "n_name": pa.array(
                [
                    nmap[int(x)]
                    for x in _col(out, "c_nationkey")
                ],
                pa.string(),
            ),
        }
    )


def returned_customers_sql(
    date_from: str = Q10_FROM,
    date_to: str = Q10_TO,
    k: int = Q10_K,
) -> str:
    """DuckDB oracle for :func:`returned_customers` (same
    quantization, same order, same LIMIT)."""
    q = int(_Q)
    return f"""
SELECT c_custkey, c_name,
       sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q} + 0.5)
                AS BIGINT)) / {q}.0 AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate < TIMESTAMP '{date_to}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Q6 analog: forecasting revenue change (pure filter-sum)
# ---------------------------------------------------------------------------

Q6_FROM = "1996-01-01"
Q6_TO = "1997-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_MAX_QTY = 24.0


def forecast_revenue(
    lineitem: rd.Dataset,
    date_from: str = Q6_FROM,
    date_to: str = Q6_TO,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    max_qty: float = Q6_MAX_QTY,
) -> pa.Table:
    """Revenue that WOULD have been kept had discounts in a band been
    dropped (TPC-H Q6 — the what-if filter-sum): ``SUM(extendedprice *
    discount)`` over one shipdate year, a discount band (inclusive
    both ends, the TPC-H ``between``) and a quantity cap.  The
    simplest possible distributed shape — a pure zero-shuffle
    filter + quantized in-map partial sum folded by ONE scalar
    aggregate — kept because a warehouse suite without its
    sanity-check scan is incomplete, and because it pins the
    discount-band float comparison convention: the band bounds are
    compared as the same doubles both engines, no epsilon.

    Money quantizes per row (module header) — the sum is exact int64,
    order-independent at any block layout.
    """
    lo = _dt.datetime.fromisoformat(date_from)
    hi = _dt.datetime.fromisoformat(date_to)

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), pa.scalar(lo)),
                pc.less(b.column("l_shipdate"), pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(
                        b.column("l_discount"), pa.scalar(disc_lo)
                    ),
                    pc.less_equal(
                        b.column("l_discount"), pa.scalar(disc_hi)
                    ),
                ),
                pc.less(b.column("l_quantity"), pa.scalar(max_qty)),
            ),
        )
        b = b.filter(keep)
        q = _quant(_col(b, "l_extendedprice") * _col(b, "l_discount"))
        return pa.table({"q_rev": pa.array([int(q.sum())], pa.int64())})

    total = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .sum("q_rev")
    )
    return pa.table(
        {"revenue": pa.array([(total or 0) / _Q], pa.float64())}
    )


def forecast_revenue_sql(
    date_from: str = Q6_FROM,
    date_to: str = Q6_TO,
    disc_lo: float = Q6_DISC_LO,
    disc_hi: float = Q6_DISC_HI,
    max_qty: float = Q6_MAX_QTY,
) -> str:
    """DuckDB oracle for :func:`forecast_revenue` (same quantization,
    same inclusive band)."""
    q = int(_Q)
    return f"""
SELECT COALESCE(sum(CAST(floor(l_extendedprice * l_discount * {q} + 0.5)
                         AS BIGINT)), 0) / {q}.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_from}'
  AND l_shipdate < TIMESTAMP '{date_to}'
  AND l_discount BETWEEN {disc_lo} AND {disc_hi}
  AND l_quantity < {max_qty}
"""


# ---------------------------------------------------------------------------
# Year-over-year revenue growth per nation (lag over an aggregate)
# ---------------------------------------------------------------------------


def yoy_growth(
    lineitem: rd.Dataset,
    supplier: rd.Dataset,
    nation: rd.Dataset,
    join_mode: str = "auto",
) -> pa.Table:
    """Year-over-year supplier-nation revenue growth — the
    trend-report shape (lag over an AGGREGATE, not over rows): revenue
    by (nation, ship-year), then each year's growth vs the nation's
    previous PRESENT year (a gap year compares against the last year
    that exists, the LAG-over-ordered-partition semantics — not a
    dense calendar join; first year NULL).

    Plan: lineitem pre-aggregates (suppkey, year, quantized revenue)
    in-map, joins the genuinely-small supplier side by ``join_mode``,
    and ONE (nation, year) groupby folds partials; the result is
    |nations x years| — driver-finished like the rollup family.
    ``growth = cur/prev - 1.0`` is one identical float expression of
    exact int64 revenues.
    """
    from .joins import hash_join

    nt = pa.concat_tables(
        [t for t in ray.get(nation.materialize().to_arrow_refs()) if t.num_rows]
    )
    nmap = {r["n_nationkey"]: r["n_name"] for r in nt.to_pylist()}

    def line_rows(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_suppkey": b.column("l_suppkey"),
                "l_year": pc.year(b.column("l_shipdate")).cast(pa.int64()),
                "q_rev": pa.array(
                    _quant(
                        _col(b, "l_extendedprice")
                        * (1.0 - _col(b, "l_discount"))
                    ),
                    pa.int64(),
                ),
            }
        )
        g = t.group_by(["l_suppkey", "l_year"]).aggregate([("q_rev", "sum")])
        return g.rename_columns(["l_suppkey", "l_year", "q_rev"])

    def supp_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": b.column("s_suppkey"),
                "s_nationkey": b.column("s_nationkey"),
            }
        )

    line = lineitem.map_batches(line_rows, batch_format="pyarrow")
    supp = supplier.map_batches(supp_rows, batch_format="pyarrow")
    j = hash_join(line, supp, "l_suppkey", "s_suppkey", mode=join_mode)

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "s_nationkey": b.column("s_nationkey"),
                "l_year": b.column("l_year"),
                "q_rev": b.column("q_rev"),
            }
        )
        g = t.group_by(["s_nationkey", "l_year"]).aggregate(
            [("q_rev", "sum")]
        )
        return g.rename_columns(["s_nationkey", "l_year", "q_rev"])

    agg = (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby(["s_nationkey", "l_year"])
        .aggregate(Sum("q_rev", alias_name="q_rev"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "n_name": pa.array([], pa.string()),
            "l_year": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "growth": pa.array([], pa.float64()),
        }
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    rows = sorted(
        (nmap[int(nk)], int(y), int(q))
        for nk, y, q in zip(
            _col(t, "s_nationkey"), _col(t, "l_year"), _col(t, "q_rev")
        )
    )
    names, years, revs, growth = [], [], [], []
    prev_name = None
    prev_q = None
    for name, y, q in rows:
        names.append(name)
        years.append(y)
        revs.append(q / _Q)
        if name == prev_name and prev_q:
            growth.append(float(q) / float(prev_q) - 1.0)
        else:
            growth.append(None)
        prev_name, prev_q = name, q
    return pa.table(
        {
            "n_name": pa.array(names, pa.string()),
            "l_year": pa.array(years, pa.int64()),
            "revenue": pa.array(revs, pa.float64()),
            "growth": pa.array(growth, pa.float64()),
        }
    )


def yoy_growth_sql() -> str:
    """DuckDB oracle for :func:`yoy_growth` — lag over the same
    aggregate, the same single float expression."""
    q = int(_Q)
    return f"""
WITH rev AS (
    SELECT n_name,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q}
                               + 0.5) AS BIGINT)) AS BIGINT) AS q_rev
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
lagged AS (
    SELECT n_name, l_year, q_rev,
           lag(q_rev) OVER (PARTITION BY n_name ORDER BY l_year) AS prev
    FROM rev
)
SELECT n_name, l_year, q_rev / {q}.0 AS revenue,
       CASE WHEN prev IS NOT NULL AND prev != 0
            THEN CAST(q_rev AS DOUBLE) / CAST(prev AS DOUBLE) - 1.0
       END AS growth
FROM lagged
ORDER BY n_name, l_year
"""


# ---------------------------------------------------------------------------
# Q19 analog: disjunctive-predicate revenue (OR-of-ANDs join filter)
# ---------------------------------------------------------------------------

Q19_CLAUSES = (
    ("Brand#1", 1, 10, 1.0, 15.0),
    ("Brand#2", 5, 20, 10.0, 25.0),
    ("Brand#3", 10, 35, 20.0, 35.0),
)


def disjunctive_revenue(
    lineitem: rd.Dataset,
    part: rd.Dataset,
    clauses: tuple = Q19_CLAUSES,
    join_mode: str = "auto",
) -> pa.Table:
    """Revenue matching an OR of brand/size/quantity conjunctions
    (TPC-H Q19 — the disjunctive-predicate classic): each clause is
    ``(p_brand, size_lo, size_hi, qty_lo, qty_hi)`` with inclusive
    bounds, and a lineitem counts if ANY clause matches its part.
    The optimizer lesson Q19 encodes: a disjunction over join
    attributes cannot prune either side alone — the join runs on the
    UNION of per-clause part sets, and the filter evaluates after.

    Plan: the part side pre-filters to the clause union (brand+size
    prune at the read — each clause's part set is selective even when
    the union is not) carrying (partkey, brand, size); lineitem ships
    (partkey, qty, quantized revenue); ONE partkey join by
    ``join_mode``; the OR evaluates VECTORIZED per batch (numpy mask
    union — no per-clause rescan); one scalar aggregate folds the
    exact int64 revenue.  Bounds compare as identical doubles both
    engines; money per-row quantized (module header).
    """
    from .joins import hash_join

    brands = sorted({c[0] for c in clauses})
    brand_arr = pa.array(brands, pa.string())

    def part_rows(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("p_brand"), value_set=brand_arr)
        b = b.filter(keep)
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "p_brand": b.column("p_brand"),
                "p_size": b.column("p_size"),
            }
        )

    def line_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "l_quantity": b.column("l_quantity"),
                "q_rev": pa.array(
                    _quant(
                        _col(b, "l_extendedprice")
                        * (1.0 - _col(b, "l_discount"))
                    ),
                    pa.int64(),
                ),
            }
        )

    li = lineitem.map_batches(line_rows, batch_format="pyarrow")
    pt = part.map_batches(part_rows, batch_format="pyarrow")
    j = hash_join(li, pt, "l_partkey", "p_partkey", mode=join_mode)

    def partial(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand").to_numpy(zero_copy_only=False)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = np.zeros(b.num_rows, bool)
        for br, slo, shi, qlo, qhi in clauses:
            keep |= (
                (brand == br)
                & (size >= slo)
                & (size <= shi)
                & (qty >= qlo)
                & (qty <= qhi)
            )
        q = _col(b, "q_rev")[keep]
        return pa.table(
            {"q_rev": pa.array([int(q.sum())], pa.int64())}
        )

    total = j.map_batches(partial, batch_format="pyarrow").sum("q_rev")
    return pa.table(
        {"revenue": pa.array([(total or 0) / _Q], pa.float64())}
    )


def disjunctive_revenue_sql(clauses: tuple = Q19_CLAUSES) -> str:
    """DuckDB oracle for :func:`disjunctive_revenue` (same inclusive
    bounds, same quantization)."""
    q = int(_Q)
    ors = " OR ".join(
        f"(p_brand = '{br}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for br, slo, shi, qlo, qhi in clauses
    )
    return f"""
SELECT COALESCE(sum(CAST(floor(l_extendedprice * (1 - l_discount) * {q}
                               + 0.5) AS BIGINT)), 0) / {q}.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
"""
