"""Corpus-analytics aggregates: per-conversation rollups, per-role top
lemmas (grouped top-k), and exact distributed quantiles of an integer
expression. All three are the map-side-combine shape: a vectorized
per-batch partial aggregate (Arrow ``group_by`` / ``value_counts``)
shrinks each block to at-most-|groups| rows BEFORE the one global
``groupby`` — the only shuffle ships group-sized partials, never rows.
Reference analog: the statistics surface
(``services/statistics/StatisticsServiceImpl.java:33-79``) exposes only
global and per-site totals; these are its corpus-scale generalizations.
"""

from __future__ import annotations

from search_engine_ray.functions import actor_pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

# one safety bit under the int64 wrap point: values at or above this
# cannot be trusted through one more add/subtract in a numpy fold
INT64_HEADROOM = 2**62


def headroom_guard(op: str, value: int, bound: int = INT64_HEADROOM,
                   hint: str = "requantize, rebase, or split the group") -> None:
    """Loud refusal where a numpy int64 fold would WRAP silently — the
    shared guard behind every grouped statistic that documents an exact
    int64 headroom bound (ks_test / emd_by_group pioneered the inline
    form; this centralizes it so no silent-wrap path can regress in).

    ``value`` is the op's documented worst-case magnitude computed with
    PYTHON ints (arbitrary precision — the check itself cannot wrap).
    """
    if value >= bound:
        raise ValueError(
            f"{op}: worst-case magnitude {value} exceeds the exact "
            f"int64 headroom ({bound}) — {hint}"
        )


def conv_stats(ds: rd.Dataset) -> rd.Dataset:
    """Per-conversation rollup over the transcripts table: turn count,
    tool-call count, first/last ts, total text characters. One shuffle
    of per-batch (conv_id, partials) rows; at 10^12 turns each block
    contributes at most its distinct-conv count of rows."""

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        tool = pc.fill_null(batch.column("tool"), "")
        t = pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "n_turns": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
                "n_tool_turns": pc.cast(pc.not_equal(tool, ""), pa.int64()),
                "first_us": ts_us,
                "last_us": ts_us,
                "total_chars": pc.cast(
                    pc.utf8_length(pc.fill_null(batch.column("text"), "")), pa.int64()
                ),
            }
        )
        g = t.group_by(["conv_id"]).aggregate(
            [
                ("n_turns", "sum"),
                ("n_tool_turns", "sum"),
                ("first_us", "min"),
                ("last_us", "max"),
                ("total_chars", "sum"),
            ]
        )
        return g.rename_columns(
            ["conv_id", "n_turns", "n_tool_turns", "first_us", "last_us", "total_chars"]
        )

    agg = (
        ds.select_columns(["conv_id", "turn_idx", "role", "tool", "ts", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_tool_turns", alias_name="n_tool_turns"),
            Min("first_us", alias_name="first_us"),
            Max("last_us", alias_name="last_us"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "n_turns": pc.cast(batch.column("n_turns"), pa.int64()),
                "n_tool_turns": pc.cast(batch.column("n_tool_turns"), pa.int64()),
                "first_ts": pc.cast(batch.column("first_us"), pa.timestamp("us")),
                "last_ts": pc.cast(batch.column("last_us"), pa.timestamp("us")),
                "total_chars": pc.cast(batch.column("total_chars"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def conv_stats_sql(src: str) -> str:
    """DuckDB oracle for :func:`conv_stats` (length() and utf8_length
    both count codepoints)."""
    return f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (WHERE tool IS NOT NULL AND tool != '') AS BIGINT)
           AS n_tool_turns,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS total_chars
FROM {src}
GROUP BY conv_id
"""


def role_top_lemmas(ds: rd.Dataset, k: int = 10) -> pa.Table:
    """Per-role top-k lemmas by document frequency (grouped top-k). The
    analyzer runs in the map (same actor-memoized rule tables as the
    index build), each batch emits pre-counted (role, lemma, df)
    partials, ONE global groupby sums them, and per-block partial top-k
    selection + a (k x #roles)-row driver merge avoids pulling the
    vocab-sized grouped table to the driver. Tie-break (df DESC, lemma
    ASC). -> pa.Table(role, rank, lemma, df)."""
    from .. import analyzer

    class Partial:
        def __init__(self):
            self.memo: dict[str, str] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            post_doc_idx, post_lemmas, _tf, _dl, _pos = analyzer.analyze_batch(
                batch.column("text"), self.memo
            )
            roles = pc.fill_null(batch.column("role"), "").to_numpy(
                zero_copy_only=False
            )
            t = pa.table(
                {
                    "role": pa.array(roles[post_doc_idx], pa.string()),
                    "lemma": pa.array(post_lemmas, pa.string()),
                    "df": pa.array(np.ones(len(post_lemmas), np.int64), pa.int64()),
                }
            )
            g = t.group_by(["role", "lemma"]).aggregate([("df", "sum")])
            return g.rename_columns(["role", "lemma", "df"])

    grouped = (
        ds.select_columns(["role", "text"])
        .map_batches(Partial, batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0)
        .groupby(["role", "lemma"])
        .aggregate(Sum("df", alias_name="df"))
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        roles = batch.column("role").to_numpy(zero_copy_only=False)
        lemmas = batch.column("lemma").to_numpy(zero_copy_only=False)
        df = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = []
        for r in np.unique(roles):
            idx = np.flatnonzero(roles == r)
            order = idx[np.lexsort((lemmas[idx], -df[idx]))[:k]]
            keep.extend(order.tolist())
        keep.sort()
        return batch.take(pa.array(keep, pa.int64()))

    parts = grouped.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for role, g in parts.groupby("role"):
        g = g.sort_values(["df", "lemma"], ascending=[False, True]).head(k)
        for rank, (_, r_) in enumerate(g.iterrows(), start=1):
            rows.append((role, rank, r_["lemma"], int(r_["df"])))
    rows.sort()
    return pa.table(
        {
            "role": pa.array([r[0] for r in rows], pa.string()),
            "rank": pa.array([r[1] for r in rows], pa.int32()),
            "lemma": pa.array([r[2] for r in rows], pa.string()),
            "df": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def role_top_lemmas_sql(src: str, k: int = 10) -> str:
    """DuckDB oracle for :func:`role_top_lemmas` (same analyzer CTEs)."""
    from .. import analyzer

    return f"""
WITH {analyzer.postings_ctes_sql(src)},
meta AS (SELECT conv_id, turn_idx, coalesce(role, '') AS role FROM {src}),
per AS (
    SELECT m.role, p.lemma, count(*) AS df
    FROM __postings p
    JOIN meta m ON m.conv_id = p.conv_id AND m.turn_idx = p.turn_idx
    GROUP BY m.role, p.lemma
),
ranked AS (
    SELECT role, lemma, df,
           row_number() OVER (PARTITION BY role ORDER BY df DESC, lemma) AS rank
    FROM per
)
SELECT role, CAST(rank AS INT) AS rank, lemma, CAST(df AS BIGINT) AS df
FROM ranked WHERE rank <= {k}
"""


# quantile fractions as integer (num, den) pairs so the rank rule
# rank = ceil(q * n) = (num*n + den - 1) // den is exact integer math in
# BOTH engines (0.9 * n in float can straddle an integer boundary)
DEFAULT_QUANTILES: tuple[tuple[int, int], ...] = (
    (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)
)


def column_quantiles(
    ds: rd.Dataset,
    expr,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
) -> pa.Table:
    """Exact distributed quantiles of a bounded-cardinality integer
    expression via a value-counts histogram: each batch emits
    (value, count) partials (``expr(batch) -> int array``), one global
    groupby sums them, and the driver resolves quantiles from the
    cumulative counts of the (small) distinct-value table. Quantile
    rule: value at 1-based rank ``ceil(q*n)`` of the sorted multiset —
    the classic discrete quantile, integer-exact on both engines.
    -> pa.Table(q, value). At 10^12 rows the shuffled table is
    |distinct values|, not |rows| — for unbounded-cardinality columns
    bucket the expression first (this is the exact sibling of a t-digest
    sketch, applicable whenever the value domain is small)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(expr(batch), np.int64)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "value": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("value")
    )
    vals = hist["value"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for num, den in quantiles:
        out_q.append(num / den)
        if n == 0:
            out_v.append(None)
            continue
        rank = (num * n + den - 1) // den  # ceil(q*n), exact
        out_v.append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())}
    )


def column_quantiles_sql(
    src: str,
    sql_expr: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
) -> str:
    """DuckDB oracle for :func:`column_quantiles` — the same explicit
    rank rule in integer math (NOT quantile_disc, whose positioning
    convention differs)."""
    qrows = ", ".join(f"({num}/{den}.0, {num}, {den})" for num, den in quantiles)
    return f"""
WITH vals AS (SELECT {sql_expr} AS v FROM {src}),
counts AS (SELECT v, count(*) AS n FROM vals GROUP BY v),
cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS c FROM counts),
tot AS (SELECT count(*) AS n FROM vals),
quants AS (SELECT * FROM (VALUES {qrows}) q(q, num, den))
SELECT q.q AS q,
       (SELECT min(v) FROM cum
        WHERE c >= (q.num * t.n + q.den - 1) // q.den) AS value
FROM quants q CROSS JOIN tot t
"""


def quantile_sketch(
    ds: rd.Dataset,
    expr,
    n_buckets: int = 256,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
    vmin: int | None = None,
    vmax: int | None = None,
) -> pa.Table:
    """Bounded-memory quantile SKETCH — the fixed-width-histogram
    sibling :func:`column_quantiles` (and the metrics docstring) point
    to for unbounded-cardinality domains: the shuffled/driver state is
    ``n_buckets`` rows regardless of corpus size or distinct values
    (the deterministic stand-in for a t-digest/KLL sketch — same
    mergeable-histogram idea, but a pure function of the data, so the
    SQL twin matches hash-exactly instead of approximately).

    Bucket ``(v - vmin) // width`` with ``width = ceil(range/B)``;
    the quantile estimate is the LOWER BOUND of the bucket containing
    rank ``ceil(q*n)`` — downward-biased by construction with
    guaranteed absolute error < ``width`` (returned per row, the
    sketch's honest accuracy contract; pytest pins |estimate - exact|
    < width against :func:`column_quantiles`). Pass ``vmin``/``vmax``
    when the domain is known to skip the range pass — otherwise ONE
    extra min/max column scan runs first (t-digest's one-pass
    advantage is real; the two-scan fixed grid buys exact
    reproducibility).
    -> pa.Table(q, value, err_bound)"""
    if vmin is None or vmax is None:
        def mm(batch: pa.Table) -> pa.Table:
            v = np.asarray(expr(batch), np.int64)
            if not len(v):
                return pa.table({"mn": pa.array([], pa.int64()),
                                 "mx": pa.array([], pa.int64())})
            return pa.table({"mn": pa.array([int(v.min())], pa.int64()),
                             "mx": pa.array([int(v.max())], pa.int64())})

        import ray as _ray
        parts = [t for t in _ray.get(
            ds.map_batches(mm, batch_format="pyarrow").materialize().to_arrow_refs())
            if t.num_rows]
        if not parts:
            return pa.table({"q": pa.array([], pa.float64()),
                             "value": pa.array([], pa.int64()),
                             "err_bound": pa.array([], pa.int64())})
        folded = pa.concat_tables(parts)
        vmin = pc.min(folded.column("mn")).as_py()
        vmax = pc.max(folded.column("mx")).as_py()
    # == ceil((range+1)/B) for any non-negative range; stated this way
    # because DuckDB's // truncates toward zero while Python floors,
    # so the negative-division ceil idiom would silently diverge
    width = (vmax - vmin) // n_buckets + 1

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(expr(batch), np.int64)
        b = np.clip((v - vmin) // width, 0, n_buckets - 1)
        vals, cnt = np.unique(b, return_counts=True)
        return pa.table({
            "bucket": pa.array(vals, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
    )
    bks = hist["bucket"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for num, den in quantiles:
        out_q.append(num / den)
        if n == 0:
            out_v.append(None)
            continue
        rank = (num * n + den - 1) // den  # ceil(q*n), exact
        out_v.append(int(vmin + bks[np.searchsorted(cum, rank)] * width))
    return pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.int64()),
        "err_bound": pa.array([width - 1] * len(out_q), pa.int64()),
    })


def quantile_sketch_sql(
    src: str,
    sql_expr: str,
    n_buckets: int = 256,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
) -> str:
    """DuckDB twin of :func:`quantile_sketch` — the same integer
    bucket grid, rank rule and lower-bound estimate, so the sketch
    hash-compares exactly (a t-digest could only be recall-tested)."""
    qrows = ", ".join(f"({num}/{den}.0, {num}, {den})" for num, den in quantiles)
    return f"""
WITH vals AS (SELECT {sql_expr} AS v FROM {src}),
rng AS (SELECT min(v) AS vmin, max(v) AS vmax FROM vals),
w AS (
    -- (vmax-vmin)//B + 1 == ceil((range+1)/B): non-negative operands
    -- only (DuckDB // truncates toward zero, Python floors)
    SELECT vmin, (vmax - vmin) // {n_buckets} + 1 AS width FROM rng
),
counts AS (
    SELECT least(greatest((v - w.vmin) // w.width, 0), {n_buckets - 1}) AS bucket,
           count(*) AS n
    FROM vals CROSS JOIN w GROUP BY 1
),
cum AS (SELECT bucket, sum(n) OVER (ORDER BY bucket) AS c FROM counts),
tot AS (SELECT count(*) AS n FROM vals),
quants AS (SELECT * FROM (VALUES {qrows}) q(q, num, den))
SELECT q.q AS q,
       (SELECT CAST(w.vmin + min(bucket) * w.width AS BIGINT) FROM cum
        WHERE c >= (q.num * t.n + q.den - 1) // q.den) AS value,
       CAST(w.width - 1 AS BIGINT) AS err_bound
FROM quants q CROSS JOIN tot t CROSS JOIN w
"""


# ---------------------------------------------------------------------------
# Grouped top-n (SQL row_number() OVER (...) <= n — the per-entity leaderboard)
# ---------------------------------------------------------------------------

TOP_PER_GROUP_N = 3


def top_n_per_group(
    ds: rd.Dataset,
    key: str = "user_id",
    order_col: str = "value",
    tiebreak: str = "event_id",
    n: int = TOP_PER_GROUP_N,
) -> rd.Dataset:
    """Top ``n`` rows per group by ``(order_col DESC, tiebreak ASC)`` —
    SQL ``row_number() OVER (PARTITION BY key ORDER BY ...) <= n``, the
    per-entity leaderboard shape (a global sort+limit answers the wrong
    question; a per-group sort is the point).

    Plan: each block first prunes ITSELF to <= n rows per key present
    in the block (vectorized: one lexicographic sort, then a
    run-position index — a row survives iff its rank within its key's
    run is < n), because a block can never contribute more than its
    own top-n per key to the global answer — the same partial-selection
    idea as the relational top-k ops, applied per group.  Only those
    partials shuffle (<= n rows per key per block, independent of the
    events-per-key skew), then ONE ``groupby(key)`` and the identical
    vectorized selection finishes per group.  The emitted ``rank``
    column is the final per-group row_number (1-based).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    names = [key, order_col, tiebreak]

    def prune(b: pa.Table, final: bool) -> pa.Table:
        order = pc.sort_indices(
            b,
            sort_keys=[
                (key, "ascending"),
                (order_col, "descending"),
                (tiebreak, "ascending"),
            ],
        )
        g = b.take(order)
        k = g.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        # rank of each row within its key's run (vectorized run index)
        starts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        run_id = np.cumsum(np.concatenate(([0], (k[1:] != k[:-1]).astype(np.int64))))
        rank = np.arange(len(k)) - starts[run_id]
        keep = rank < n
        out = g.filter(pa.array(keep))
        if final:
            out = out.append_column(
                "rank", pa.array(rank[keep] + 1, pa.int64())
            )
        return out

    return (
        ds.select_columns(names)
        .map_batches(
            lambda b: prune(b.replace_schema_metadata(None), False),
            batch_format="pyarrow",
        )
        .groupby(key)
        .map_groups(lambda g: prune(g, True), batch_format="pyarrow")
    )


def top_n_per_group_sql(
    src: str,
    key: str = "user_id",
    order_col: str = "value",
    tiebreak: str = "event_id",
    n: int = TOP_PER_GROUP_N,
) -> str:
    """DuckDB oracle for :func:`top_n_per_group` — the literal
    row_number formulation."""
    return f"""
SELECT {key}, {order_col}, {tiebreak}, rank FROM (
    SELECT {key}, {order_col}, {tiebreak},
           row_number() OVER (
               PARTITION BY {key}
               ORDER BY {order_col} DESC, {tiebreak} ASC) AS rank
    FROM {src}
) WHERE rank <= {n}
"""


# ---------------------------------------------------------------------------
# Exact per-group quantiles (GROUP BY + percentiles in one exchange)
# ---------------------------------------------------------------------------


def grouped_quantiles(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
) -> rd.Dataset:
    """Exact quantiles of ``value_col`` PER GROUP — the grouped sibling
    of :func:`column_quantiles`, same discrete rank rule (value at
    1-based rank ``ceil(q*n)`` of the group's sorted multiset, so the
    answer is always an actual data value — no interpolation, no float
    drift).

    Plan: each block pre-aggregates to (group, value, count) rows with
    one Arrow ``group_by`` (blocks ship their distinct pairs, never
    raw rows), ONE ``groupby(group)`` exchange co-locates each group's
    value histogram, and the per-group resolve is a vectorized
    sort + cumsum + searchsorted.  The exchange is |distinct (group,
    value)| — a real reduction for discrete/low-cardinality values;
    for continuous values it degenerates to row count, and the honest
    scale path is :func:`quantile_sketch` (t-digest-style, constant
    memory) — this is the exact sibling.
    """
    for num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {num}/{den} outside (0, 1]")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"g": b.column(group_col), "v": b.column(value_col)})
        t = t.filter(pc.is_valid(t.column("v")))  # SQL aggregates skip NULLs
        g = t.group_by(["g", "v"]).aggregate([([], "count_all")])
        return g.rename_columns(["g", "v", "n"])

    qn = [(num, den) for num, den in quantiles]

    def resolve(grp: pa.Table) -> pa.Table:
        v = grp.column("v").to_numpy(zero_copy_only=False)
        n_ = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, cum = v[order], n_[order].cumsum()
        n = int(cum[-1])
        vals = [
            v[np.searchsorted(cum, (num * n + den - 1) // den)]
            for num, den in qn
        ]
        return pa.table(
            {
                group_col: grp.column("g").slice(0, 1).to_pylist() * len(qn),
                "q": pa.array([num / den for num, den in qn], pa.float64()),
                "value": pa.array(vals, pa.float64()),
            }
        )

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(resolve, batch_format="pyarrow")
    )


def grouped_quantiles_sql(
    src: str,
    group_col: str,
    value_col: str,
    quantiles: tuple[tuple[int, int], ...] = DEFAULT_QUANTILES,
) -> str:
    """DuckDB oracle for :func:`grouped_quantiles` — the same explicit
    integer rank rule per group (NOT quantile_disc, whose positioning
    convention differs)."""
    qrows = ", ".join(
        f"({num}/{den}.0, {num}, {den})" for num, den in quantiles
    )
    return f"""
WITH vals AS (SELECT {group_col} AS g, {value_col} AS v FROM {src}
              WHERE {value_col} IS NOT NULL),
counts AS (SELECT g, v, count(*) AS n FROM vals GROUP BY g, v),
cum AS (SELECT g, v, sum(n) OVER (PARTITION BY g ORDER BY v) AS c FROM counts),
tot AS (SELECT g, count(*) AS n FROM vals GROUP BY g),
quants AS (SELECT * FROM (VALUES {qrows}) q(q, num, den))
SELECT t.g AS {group_col}, q.q AS q,
       (SELECT min(v) FROM cum
        WHERE cum.g = t.g
          AND c >= (q.num * t.n + q.den - 1) // q.den) AS value
FROM tot t CROSS JOIN quants q
"""


# ---------------------------------------------------------------------------
# Grouped z-score outliers (the aggregate-rejoin anomaly detector)
# ---------------------------------------------------------------------------

OUTLIER_CENT = 100  # value quantization for the exact moment sums


def grouped_outliers(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    z_num: int = 3,
    z_den: int = 2,
) -> rd.Dataset:
    """Rows whose value deviates more than ``z_num/z_den`` standard
    deviations from their GROUP's mean — the per-segment anomaly
    detector (population sigma), as an aggregate-rejoin: the group
    moments come from one distributed aggregate, broadcast once, and
    the flagging pass is a pure zero-shuffle map (the Q17 shape on a
    float predicate).

    Exactness device: values quantize to int64 cents; per group the
    exact moments (n, sum, sumsq) fold as int64s (in-map partials +
    one tiny group exchange); the z-test
    ``|v - mean| > (z_num/z_den) * sigma`` is squared into the
    INTEGER-DERIVED comparison

        z_den^2 * (v*n - sum)^2  >  z_num^2 * (n*sumsq - sum^2)

    evaluated IN FLOAT64 from the exact ints with the identical
    expression both engines — identical doubles compare identically,
    so the boundary rows agree bit-for-bit at any scale (int64 moment
    headroom: n * max_cent^2 per group; requantize beyond).
    """
    if z_num <= 0 or z_den <= 0:
        raise ValueError(f"z must be positive, got {z_num}/{z_den}")

    def mom(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * OUTLIER_CENT + 0.5) * np.sign(v)).astype(
            np.int64
        )
        t = pa.table(
            {
                "g": b.column(group_col),
                "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "s": pa.array(c, pa.int64()),
                "ss": pa.array(c * c, pa.int64()),
                # per-group |cent| max rides along so the fold can
                # verify the documented n*max_cent^2 moment headroom
                # AFTER aggregation (max never wraps, so the check is
                # valid even where a sum would already have)
                "m": pa.array(np.abs(c), pa.int64()),
            }
        )
        out = t.group_by("g").aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum"), ("m", "max")]
        )
        return out.rename_columns(["g", "n", "s", "ss", "m"])

    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    stats = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: mom(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("s", alias_name="s"),
            _Sum("ss", alias_name="ss"),
            _Max("m", alias_name="m"),
        )
        .take_all()  # group-domain bounded
    )
    import ray

    for r in stats:
        headroom_guard(
            "grouped_outliers",
            int(r["n"]) * int(r["m"]) ** 2,
            hint="requantize OUTLIER_CENT or split the group",
        )
    lut = {
        r["g"]: (int(r["n"]), int(r["s"]), int(r["ss"])) for r in stats
    }
    # rhs per group as an EXACT python int (arbitrary precision), then
    # one float conversion — the same number DuckDB's HUGEINT->DOUBLE
    # cast produces
    rhs = {
        g: float(z_num * z_num * (n * ss - s * s))
        for g, (n, s, ss) in lut.items()
    }
    lut_ref = ray.put((lut, rhs, z_den))

    def flag(b: pa.Table) -> pa.Table:
        lut_, rhs_, zd = ray.get(lut_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * OUTLIER_CENT + 0.5) * np.sign(v)).astype(
            np.int64
        )
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(c), bool)
        for grp in np.unique(g):
            n, s, _ = lut_[grp]
            m = g == grp
            d = (c[m] * n - s).astype(np.float64) * zd
            keep[m] = d * d > rhs_[grp]
        return b.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_outliers_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
    z_num: int = 3,
    z_den: int = 2,
    cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`grouped_outliers` — the identical
    integer moments and the identical float comparison."""
    q = OUTLIER_CENT
    return f"""
WITH c AS (
    SELECT *, CAST(round({value_col} * {q}) AS BIGINT) AS __c
    FROM {src}
),
m AS (
    SELECT {group_col} AS g, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(__c) AS BIGINT) AS s,
           CAST(SUM(__c * __c) AS BIGINT) AS ss
    FROM c GROUP BY 1
)
SELECT {cols}
FROM c JOIN m ON c.{group_col} = m.g
WHERE CAST((__c * m.n - m.s) * {z_den} AS DOUBLE)
      * CAST((__c * m.n - m.s) * {z_den} AS DOUBLE)
      > CAST({z_num * z_num} * (m.n * m.ss - m.s * m.s) AS DOUBLE)
"""


# ---------------------------------------------------------------------------
# Grouped winsorization (clip to per-group percentiles)
# ---------------------------------------------------------------------------


def winsorize_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
) -> rd.Dataset:
    """Winsorize ``value_col`` to its GROUP's [p_lo, p_hi] percentile
    band — the outlier-robust feature clip every tabular-ML pipeline
    runs before normalization (clip, not drop: the row survives, its
    tail value is pinned to the boundary ORDER STATISTIC, an actual
    data value by the same exact ceil-rank rule as
    :func:`grouped_quantiles`).

    Plan: :func:`grouped_quantiles` computes both boundaries in its
    one exchange; the (group, lo, hi) table is group-domain bounded,
    broadcasts once, and the clip pass is a pure zero-shuffle map
    appending ``value_w`` (the Q17 aggregate-rejoin shape again).
    """
    ln, ld = lo
    hn, hd = hi
    if not (0 < ln / ld <= hn / hd <= 1):
        raise ValueError(f"bad band {lo} .. {hi}")
    q = grouped_quantiles(ds, group_col, value_col, quantiles=(lo, hi))
    rows = q.take_all()  # |groups| x 2 rows
    lo_f, hi_f = ln / ld, hn / hd
    band: dict = {}
    for r in rows:
        b = band.setdefault(r[group_col], [None, None])
        if r["q"] == lo_f:
            b[0] = r["value"]
        if r["q"] == hi_f:
            b[1] = r["value"]
    import ray

    band_ref = ray.put(band)

    def clip(b: pa.Table) -> pa.Table:
        bd = ray.get(band_ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        out = v.copy()
        for grp in np.unique(g):
            lo_v, hi_v = bd[grp]
            m = g == grp
            out[m] = np.minimum(np.maximum(v[m], lo_v), hi_v)
        return b.append_column("value_w", pa.array(out, pa.float64()))

    return ds.map_batches(clip, batch_format="pyarrow")


def winsorize_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
    lo: tuple[int, int] = (1, 20),
    hi: tuple[int, int] = (19, 20),
    cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`winsorize_by_group` — the same
    explicit rank-rule boundaries, then least/greatest."""
    ln, ld = lo
    hn, hd = hi
    return f"""
WITH vals AS (SELECT {group_col} AS g, {value_col} AS v FROM {src}
              WHERE {value_col} IS NOT NULL),
counts AS (SELECT g, v, count(*) AS n FROM vals GROUP BY g, v),
cum AS (SELECT g, v, sum(n) OVER (PARTITION BY g ORDER BY v) AS c FROM counts),
tot AS (SELECT g, count(*) AS n FROM vals GROUP BY g),
band AS (
    SELECT t.g,
           (SELECT min(v) FROM cum
            WHERE cum.g = t.g AND c >= ({ln} * t.n + {ld} - 1) // {ld}) AS lo_v,
           (SELECT min(v) FROM cum
            WHERE cum.g = t.g AND c >= ({hn} * t.n + {hd} - 1) // {hd}) AS hi_v
    FROM tot t
)
SELECT {cols}, least(greatest(s.{value_col}, band.lo_v), band.hi_v) AS value_w
FROM {src} s JOIN band ON s.{group_col} = band.g
"""


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

TE_Q = 1_000_000  # encoded mean quantization (micro-units)
TE_CENT = 100


def target_encode_loo(
    ds: rd.Dataset,
    cat_col: str = "event_type",
    target_col: str = "value",
) -> rd.Dataset:
    """Leave-one-out target encoding — replace a categorical with the
    mean target of its category EXCLUDING the row itself (the standard
    leakage guard: encoding a row with a mean that contains its own
    target leaks the label into the feature; Micci-Barreca 2001).

    Plan: per-category exact int64 moments (n, sum of target cents) in
    one tiny exchange, broadcast once, and the encode pass is a pure
    zero-shuffle map: ``loo_q = floor((sum - v) * 1e6 / (n-1) + 0.5)``
    — exact ints through the identical float division both engines;
    singleton categories (n == 1) encode NULL (no other rows to learn
    from), mirroring SQL's NULLIF.
    """
    from ray.data.aggregate import Sum as _Sum

    def mom(b: pa.Table) -> pa.Table:
        v = b.column(target_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * TE_CENT + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "g": b.column(cat_col),
                "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "s": pa.array(c, pa.int64()),
            }
        )
        return t.group_by("g").aggregate(
            [("n", "sum"), ("s", "sum")]
        ).rename_columns(["g", "n", "s"])

    stats = (
        ds.select_columns([cat_col, target_col])
        .map_batches(
            lambda t: mom(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(_Sum("n", alias_name="n"), _Sum("s", alias_name="s"))
        .take_all()
    )
    lut = {r["g"]: (int(r["n"]), int(r["s"])) for r in stats}
    import ray

    lut_ref = ray.put(lut)

    def enc(b: pa.Table) -> pa.Table:
        lut_ = ray.get(lut_ref)
        g = b.column(cat_col).to_numpy(zero_copy_only=False)
        v = b.column(target_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * TE_CENT + 0.5) * np.sign(v)).astype(np.int64)
        out = np.zeros(len(c), np.int64)
        valid = np.ones(len(c), bool)
        for grp in np.unique(g):
            n, s = lut_[grp]
            m = g == grp
            if n <= 1:
                valid[m] = False
                continue
            out[m] = np.floor((s - c[m]) * TE_Q / (n - 1) + 0.5).astype(
                np.int64
            )
        return b.append_column(
            "te_loo_q", pa.array(out, pa.int64(), mask=~valid)
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def target_encode_loo_sql(
    src: str,
    cat_col: str = "event_type",
    target_col: str = "value",
    cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`target_encode_loo` — identical cents
    quantization, identical float division, NULL for singletons."""
    return f"""
WITH c AS (
    SELECT *, CAST(round({target_col} * {TE_CENT}) AS BIGINT) AS __c
    FROM {src}
),
m AS (
    SELECT {cat_col} AS g, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(__c) AS BIGINT) AS s
    FROM c GROUP BY 1
)
SELECT {cols},
       CASE WHEN m.n > 1
            THEN CAST(floor((m.s - __c) * {TE_Q} * 1.0 / (m.n - 1) + 0.5)
                      AS BIGINT)
       END AS te_loo_q
FROM c JOIN m ON c.{cat_col} = m.g
"""


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def skyline2d(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    max_frontier: int = 2_000_000,
) -> rd.Dataset:
    """The 2-D skyline — every row NOT dominated by another row, both
    dimensions maximized (Börzsönyi et al. 2001: p dominates q iff
    p >= q on both and > on at least one; exact ties dominate
    nothing, so duplicate frontier points all survive).  The classic
    multi-criteria shortlist ("newest AND highest-value, no trade-off
    losers").

    Plan: the skyline is DISTRIBUTIVE — a row dominated within its own
    block is dominated globally, so each block reduces to its LOCAL
    frontier first (vectorized: sort by x DESC, then a row is
    dominated iff the running y-max over strictly-greater x beats it,
    or a same-x row has strictly greater y — two prefix scans, no
    pairwise loop), and only local-frontier rows reach the final
    single-group fold, which re-applies the same scan.  The fold input
    is the union of local frontiers — usually tiny, guarded loudly
    (an anti-correlated worst case can make the frontier
    corpus-sized; that is a property of the DATA, not a plan bug).

    NULL in either dimension drops the row (SQL comparison semantics:
    a NULL coordinate can neither dominate nor be dominated — the
    twin's NOT EXISTS would keep such rows vacuously, which is a
    trap, so both engines filter them first).
    """

    def local_frontier(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.is_valid(b.column(x_col)), pc.is_valid(b.column(y_col))
            )
        )
        if b.num_rows == 0:
            return b
        idx = pc.sort_indices(
            b, sort_keys=[(x_col, "descending"), (y_col, "descending")]
        )
        b = b.take(idx)
        x = b.column(x_col).to_numpy(zero_copy_only=False)
        y = b.column(y_col).to_numpy(zero_copy_only=False)
        n = len(x)
        # run starts: positions where x strictly drops
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = x[1:] != x[:-1]
        run_id = np.cumsum(new_run) - 1
        # y-max per run, then prefix max over PRIOR runs
        run_starts = np.flatnonzero(new_run)
        run_ymax = np.maximum.reduceat(y, run_starts)
        prior = np.empty_like(run_ymax)
        prior[0] = -np.inf
        if len(run_ymax) > 1:
            prior[1:] = np.maximum.accumulate(run_ymax[:-1])
        # dominated iff a strictly-greater-x row has y >= mine, or a
        # same-x row has y > mine (the run max, strict)
        dom = (prior[run_id] >= y) | (run_ymax[run_id] > y)
        return b.filter(pa.array(~dom))

    cand = ds.map_batches(
        lambda t: local_frontier(t.replace_schema_metadata(None)),
        batch_format="pyarrow",
    ).materialize()  # consumed by count + the driver fold: one execution
    n_cand = cand.count()
    if n_cand > max_frontier:
        raise ValueError(
            f"skyline2d: {n_cand} local-frontier rows exceed "
            f"{max_frontier} — the frontier itself is corpus-sized "
            "(anti-correlated dimensions); a skyline is not a useful "
            "shortlist on this data"
        )
    tabs = [t for t in cand.materialize().to_arrow_refs()]
    import ray

    pooled = pa.concat_tables(
        [t for t in ray.get(tabs) if t.num_rows]
    ) if tabs else None
    if pooled is None or pooled.num_rows == 0:
        return cand  # typed empty
    return rd.from_arrow(local_frontier(pooled))


def skyline2d_sql(src: str, x_col: str, y_col: str, cols: str = "*") -> str:
    """DuckDB oracle for :func:`skyline2d` — the literal NOT EXISTS
    dominance test over the NULL-filtered relation."""
    return f"""
WITH t AS (
    SELECT * FROM {src}
    WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
)
SELECT {cols} FROM t
WHERE NOT EXISTS (
    SELECT 1 FROM t o
    WHERE o.{x_col} >= t.{x_col} AND o.{y_col} >= t.{y_col}
      AND (o.{x_col} > t.{x_col} OR o.{y_col} > t.{y_col})
)
"""


# ---------------------------------------------------------------------------
# Per-key linear trend (grouped OLS slope from additive moments)
# ---------------------------------------------------------------------------

TREND_HOUR_US = 3_600_000_000


def user_trend(ds: rd.Dataset) -> rd.Dataset:
    """Per-user OLS slope of value over time (cents per hour) — the
    per-entity trend feature ("is this user's value drifting up"):
    ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` with x = epoch hours
    (integer) and y = value cents.

    The scale story is the point: ALL FIVE regression moments (n, Sx,
    Sy, Sxy, Sxx) are ADDITIVE, so each block collapses to per-user
    partial moments in-map (Arrow ``group_by``) and the ONE groupby
    ships |users| x 5 int64s per block — no row ever moves, no
    map_groups, strictly cheaper than any sort-based window plan.

    Exactness: moments are exact int64 sums (headroom documented:
    epoch-hours^2 x rows/user inside int64 through ~10^5 rows/user at
    current epochs; rebase x beyond); the slope is one float64
    division of identical exact ints in both engines.  A user whose
    events share one timestamp-hour has zero x-variance -> NULL slope
    (SQL NULLIF), pinned by test.
    """

    def mom(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = us // TREND_HOUR_US
        v = b.column("value").to_numpy(zero_copy_only=False)
        y = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "n": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
            }
        )
        g = t.group_by("user_id").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")]
        )
        return g.rename_columns(["user_id", "n", "sx", "sy", "sxy", "sxx"])

    from ray.data.aggregate import Sum as _Sum

    agg = (
        ds.select_columns(["user_id", "ts", "value"])
        .map_batches(
            lambda t: mom(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .aggregate(
            *[_Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx")]
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        den = (n * sxx - sx * sx).astype(np.float64)
        num = (n * sxy - sx * sy).astype(np.float64)
        ok = den != 0.0
        slope = np.zeros(len(n), np.float64)
        slope[ok] = num[ok] / den[ok]
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n": pa.array(n, pa.int64()),
                "slope_cents_per_hour": pa.array(
                    slope, pa.float64(), mask=~ok
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def user_trend_sql(src: str) -> str:
    """DuckDB oracle for :func:`user_trend` — identical integer
    moments, identical single division, NULLIF on zero x-variance."""
    return f"""
WITH m AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(epoch_us(ts) // {TREND_HOUR_US}) AS BIGINT) AS sx,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sy,
           CAST(SUM((epoch_us(ts) // {TREND_HOUR_US})
                    * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sxy,
           CAST(SUM((epoch_us(ts) // {TREND_HOUR_US})
                    * (epoch_us(ts) // {TREND_HOUR_US})) AS BIGINT) AS sxx
    FROM {src} GROUP BY user_id
)
SELECT user_id, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)
           AS slope_cents_per_hour
FROM m
"""


# ---------------------------------------------------------------------------
# Welch's t-test per group (the A/B-test primitive)
# ---------------------------------------------------------------------------


def ab_test(
    ds: rd.Dataset,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> rd.Dataset:
    """Welch's unequal-variance t statistic per group between two
    segments (Welch 1947) — the A/B-test readout ("did the treatment
    move the metric, per surface"): ``t = (m1 - m2) /
    sqrt(v1/n1 + v2/n2)`` with sample variances.

    Plan: the same additive-moments shape as :func:`user_trend` — each
    block collapses to per-(group, segment) int64 (n, sum, sumsq)
    cents partials in-map, ONE groupby ships moments, and the finish
    is a driver fold over the tiny group x 2 domain.

    Exactness: every intermediate that CAN be integer is (sums,
    squared sums), and every float step is the IDENTICAL expression in
    both engines — including the operation ORDER (``CAST(ss AS
    DOUBLE) - CAST(s*s AS DOUBLE)/n``, integer products exact FIRST,
    one conversion each), so t agrees bit-for-bit.  Degenerate cells
    (a segment with n < 2, or zero pooled variance) emit NULL t.
    Segments must be exactly {0, 1} — refused loudly otherwise.
    """

    def mom(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        seg = b.column(segment_col).to_numpy(zero_copy_only=False)
        if len(seg) and not np.isin(seg, (0, 1)).all():
            raise ValueError("ab_test: segment must be 0 or 1")
        t = pa.table(
            {
                "g": b.column(group_col),
                "seg": pa.array(seg.astype(np.int64), pa.int64()),
                "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "s": pa.array(c, pa.int64()),
                "ss": pa.array(c * c, pa.int64()),
            }
        )
        out = t.group_by(["g", "seg"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")]
        )
        return out.rename_columns(["g", "seg", "n", "s", "ss"])

    from ray.data.aggregate import Sum as _Sum

    rows = (
        ds.select_columns([group_col, segment_col, value_col])
        .map_batches(
            lambda t: mom(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["g", "seg"])
        .aggregate(
            _Sum("n", alias_name="n"),
            _Sum("s", alias_name="s"),
            _Sum("ss", alias_name="ss"),
        )
        .take_all()  # |groups| x 2 rows
    )
    cells: dict = {}
    for r in rows:
        cells.setdefault(r["g"], {})[int(r["seg"])] = (
            int(r["n"]), int(r["s"]), int(r["ss"])
        )
    gs, na_, nb_, ts = [], [], [], []
    for g in sorted(cells):
        a = cells[g].get(0)
        b = cells[g].get(1)
        n1, s1, ss1 = a if a else (0, 0, 0)
        n2, s2, ss2 = b if b else (0, 0, 0)
        gs.append(g)
        na_.append(n1)
        nb_.append(n2)
        if n1 < 2 or n2 < 2:
            ts.append(None)
            continue
        v1 = (float(ss1) - float(s1 * s1) / n1) / (n1 - 1)
        v2 = (float(ss2) - float(s2 * s2) / n2) / (n2 - 1)
        den = v1 / n1 + v2 / n2
        if den <= 0.0:
            ts.append(None)
            continue
        ts.append((s1 / n1 - s2 / n2) / float(np.sqrt(den)))
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(gs),
                "n_a": pa.array(na_, pa.int64()),
                "n_b": pa.array(nb_, pa.int64()),
                "t_stat": pa.array(ts, pa.float64()),
            }
        )
    )


def ab_test_sql(
    src: str,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`ab_test` — identical integer moments,
    identical float expression and operation order."""
    return f"""
WITH m AS (
    SELECT {group_col} AS g, {segment_col} AS seg,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(SUM(CAST(round({value_col} * 100) AS BIGINT)
                    * CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)
               AS ss
    FROM {src} GROUP BY 1, 2
),
w AS (
    SELECT coalesce(a.g, b.g) AS g,
           coalesce(a.n, 0) AS n1, coalesce(a.s, 0) AS s1,
           coalesce(a.ss, 0) AS ss1,
           coalesce(b.n, 0) AS n2, coalesce(b.s, 0) AS s2,
           coalesce(b.ss, 0) AS ss2
    FROM (SELECT * FROM m WHERE seg = 0) a
    FULL OUTER JOIN (SELECT * FROM m WHERE seg = 1) b ON a.g = b.g
)
SELECT g AS {group_col},
       CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       CASE WHEN n1 >= 2 AND n2 >= 2 AND
                 ((CAST(ss1 AS DOUBLE) - CAST(s1*s1 AS DOUBLE)/n1)/(n1-1)/n1
                  + (CAST(ss2 AS DOUBLE) - CAST(s2*s2 AS DOUBLE)/n2)/(n2-1)/n2)
                 > 0.0
            THEN (CAST(s1 AS DOUBLE)/n1 - CAST(s2 AS DOUBLE)/n2)
                 / sqrt((CAST(ss1 AS DOUBLE) - CAST(s1*s1 AS DOUBLE)/n1)
                        /(n1-1)/n1
                        + (CAST(ss2 AS DOUBLE) - CAST(s2*s2 AS DOUBLE)/n2)
                          /(n2-1)/n2)
       END AS t_stat
FROM w
"""


# ---------------------------------------------------------------------------
# Mann-Whitney U per group (the nonparametric A/B sibling)
# ---------------------------------------------------------------------------


def mann_whitney(
    ds: rd.Dataset,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> rd.Dataset:
    """Mann-Whitney U per group between two segments (Mann & Whitney
    1947) — the rank-based A/B readout that needs no normality
    assumption: ``U1 = R1 - n1(n1+1)/2`` with R1 the segment-0 rank
    sum under midrank ties.  :func:`ab_test`'s nonparametric sibling.

    Exactness is PURE INTEGER: doubled midranks ``2*avg_rank =
    2*first_rank + tie_count - 1`` are integers, so ``u2 = 2*U1``
    folds as exact int64 and the twin matches without an epsilon or a
    float anywhere — the strongest oracle class in this repo.

    Plan: ONE ``groupby(group)`` exchange of in-map pre-deduped
    (value, segment, count) rows (rank statistics need the group's
    full value multiset co-located, but only |distinct values x 2|
    rows ship per group); the per-group fold is one sort + cumsum
    (first ranks) — vectorized.
    """

    def partial(b: pa.Table) -> pa.Table:
        seg = b.column(segment_col).to_numpy(zero_copy_only=False)
        if len(seg) and not np.isin(seg, (0, 1)).all():
            raise ValueError("mann_whitney: segment must be 0 or 1")
        t = pa.table(
            {
                "g": b.column(group_col),
                "v": b.column(value_col),
                "seg": pa.array(seg.astype(np.int64), pa.int64()),
            }
        ).filter(pc.is_valid(b.column(value_col)))
        out = t.group_by(["g", "v", "seg"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "seg", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        v = grp.column("v").to_numpy(zero_copy_only=False)
        seg = grp.column("seg").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, seg, n = v[order], seg[order], n[order]
        # collapse equal values across segments: tie group sizes
        uniq, inv = np.unique(v, return_inverse=True)
        tie_n = np.zeros(len(uniq), np.int64)
        np.add.at(tie_n, inv, n)
        first_rank = np.concatenate(([1], 1 + np.cumsum(tie_n)[:-1]))
        two_avg = 2 * first_rank + tie_n - 1  # doubled midrank, integer
        m0 = seg == 0
        n1 = int(n[m0].sum())
        n2 = int(n[~m0].sum())
        two_r1 = int((n[m0] * two_avg[inv[m0]]).sum())
        u2 = two_r1 - n1 * (n1 + 1)  # 2*U1, exact
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n_a": pa.array([n1], pa.int64()),
                "n_b": pa.array([n2], pa.int64()),
                "u2": pa.array([u2], pa.int64()),
            }
        )

    out = (
        ds.select_columns([group_col, segment_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n_a", "n_b", "u2"]),
        batch_format="pyarrow",
    )


def mann_whitney_sql(
    src: str,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`mann_whitney` — the same doubled
    midranks in pure integer arithmetic (rank() is the first rank of a
    tie run; count(*) per (group, value) its size)."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, {value_col} AS v, {segment_col} AS seg
    FROM {src} WHERE {value_col} IS NOT NULL
),
r AS (
    SELECT g, v, seg,
           rank() OVER (PARTITION BY g ORDER BY v) AS frank,
           count(*) OVER (PARTITION BY g, v) AS tie_n
    FROM t
),
agg AS (
    SELECT g,
           CAST(SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN seg = 0 THEN 2 * frank + tie_n - 1
                         ELSE 0 END) AS BIGINT) AS two_r1
    FROM r GROUP BY g
)
SELECT g AS {group_col}, n_a, n_b,
       CAST(two_r1 - n_a * (n_a + 1) AS BIGINT) AS u2
FROM agg
"""


# ---------------------------------------------------------------------------
# Chi-square independence test (categorical x categorical)
# ---------------------------------------------------------------------------


def chi2_independence(
    ds: rd.Dataset,
    a_col: str,
    b_col: str,
) -> rd.Dataset:
    """Pearson's chi-square statistic for independence between two
    categorical columns (the contingency-table readout: "does event
    mix differ by segment") plus the degrees of freedom — one row.

    Plan: in-map (a, b, count) partials, ONE groupby over the cell
    domain, and a driver fold over the |A| x |B| contingency table
    (domain-bounded by definition — a chi-square over unbounded
    cardinality is the caller's modeling error and the 2M guard says
    so loudly).

    Exactness: observed counts and all marginals are exact int64; each
    cell's term is ``(n*o - ra*cb)^2 / (n*ra*cb)`` — the expected
    count cleared of its division so the numerator is EXACT integer
    arithmetic, converted once and divided once per cell.  The final
    float sum over the |A| x |B| cells is the one place addition order
    is not pinned (DuckDB's SUM need not follow the ORDER BY); its
    drift is ~cells * ulp — orders of magnitude below the gate's 1e-6
    rounding, and the per-cell terms themselves are bit-identical.
    """
    from ray.data.aggregate import Sum as _Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([a_col, b_col])
        g = t.group_by([a_col, b_col]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "n"])

    rows = (
        ds.select_columns([a_col, b_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["a", "b"])
        .aggregate(_Sum("n", alias_name="n"))
        .take_all()
    )
    if len(rows) > 2_000_000:
        raise ValueError(
            f"chi2_independence: {len(rows)} contingency cells — "
            "unbounded-cardinality columns are a modeling error here"
        )
    if not rows:
        raise ValueError("chi2_independence: empty input")
    ra: dict = {}
    cb: dict = {}
    for r in rows:
        ra[r["a"]] = ra.get(r["a"], 0) + int(r["n"])
        cb[r["b"]] = cb.get(r["b"], 0) + int(r["n"])
    n = sum(ra.values())
    cells = {(r["a"], r["b"]): int(r["n"]) for r in rows}
    stat = 0.0
    # FULL cross product: absent cells contribute (0 - E)^2/E too
    for av in sorted(ra):
        for bv in sorted(cb):
            o = cells.get((av, bv), 0)
            num = n * o - ra[av] * cb[bv]
            stat += float(num * num) / (float(n) * ra[av] * cb[bv])
    dof = (len(ra) - 1) * (len(cb) - 1)
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "dof": pa.array([dof], pa.int64()),
                "chi2": pa.array([stat], pa.float64()),
            }
        )
    )


def chi2_independence_sql(src: str, a_col: str, b_col: str) -> str:
    """DuckDB oracle for :func:`chi2_independence` — the same
    integer-cleared cell terms over the FULL cross product (absent
    cells included), summed in the same sorted cell order."""
    return f"""
WITH t AS (SELECT {a_col} AS a, {b_col} AS b FROM {src}),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY a, b),
ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM cells GROUP BY a),
cb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells),
grid AS (
    SELECT ra.a, cb.b, ra.ra, cb.cb, coalesce(cells.n, 0) AS o, tot.n
    FROM ra CROSS JOIN cb CROSS JOIN tot
    LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b
),
terms AS (
    SELECT a, b,
           CAST((n*o - ra*cb) * (n*o - ra*cb) AS DOUBLE)
           / (CAST(n AS DOUBLE) * ra * cb) AS term
    FROM grid
)
SELECT (SELECT n FROM tot) AS n,
       CAST((SELECT count(*) FROM ra) - 1 AS BIGINT)
       * CAST((SELECT count(*) FROM cb) - 1 AS BIGINT) AS dof,
       (SELECT SUM(term) FROM (SELECT term FROM terms ORDER BY a, b)) AS chi2
"""


# ---------------------------------------------------------------------------
# Spearman rank correlation per group
# ---------------------------------------------------------------------------


def spearman_by_group(
    ds: rd.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
) -> rd.Dataset:
    """Spearman's rank correlation per group between two columns
    (Spearman 1904) — Pearson on midranks: the monotone-trend readout
    that ignores outliers and nonlinearity ("does value drift with
    time, per type").

    Exactness device: doubled midranks (2*first_rank + tie_n - 1) are
    INTEGERS for both variables, so all five Pearson moments over them
    fold as exact int64 and ``rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx -
    Sx^2) * (n*Syy - Sy^2))`` is one identical float expression both
    engines.  int64 headroom: Sxy <= n * (2n)^2 — safe through ~50k
    rows per group; beyond, rebase ranks per partition (documented).
    Zero rank variance on either side (all-tied values) -> NULL.

    Plan: ONE group exchange of in-map pre-deduped (x, y, count)
    rows; per-group fold computes each variable's midranks from its
    own multiset (searchsorted against sorted uniques + cumsum) —
    vectorized, no pairwise work.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "g": b.column(group_col),
                "x": b.column(x_col),
                "y": b.column(y_col),
            }
        ).filter(
            pc.and_(
                pc.is_valid(b.column(x_col)), pc.is_valid(b.column(y_col))
            )
        )
        out = t.group_by(["g", "x", "y"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "x", "y", "n"])

    def midranks2(vals: np.ndarray, cnt: np.ndarray) -> np.ndarray:
        """Doubled midrank per input row (over the weighted multiset)."""
        uniq, inv = np.unique(vals, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cnt)
        first = np.concatenate(([1], 1 + np.cumsum(tot)[:-1]))
        return (2 * first + tot - 1)[inv]

    def fold(grp: pa.Table) -> pa.Table:
        x = grp.column("x").to_numpy(zero_copy_only=False)
        y = grp.column("y").to_numpy(zero_copy_only=False)
        c = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(c.sum())
        # Sxy <= sum c*(2n)^2 = 4n^3 and each elementwise product is
        # bounded the same way (docstring bound, ~50k rows/group)
        headroom_guard("spearman_by_group", 4 * n**3)
        rx = midranks2(x, c)  # doubled midranks, int64
        ry = midranks2(y, c)
        sx = int((c * rx).sum())
        sy = int((c * ry).sum())
        sxy = int((c * rx * ry).sum())
        sxx = int((c * rx * rx).sum())
        syy = int((c * ry * ry).sum())
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        rho = (
            float(num) / float(np.sqrt(float(dx) * float(dy)))
            if dx > 0 and dy > 0
            else None
        )
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "rho": pa.array([rho], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "rho"]),
        batch_format="pyarrow",
    )


def spearman_by_group_sql(
    src: str, group_col: str, x_col: str, y_col: str
) -> str:
    """DuckDB oracle for :func:`spearman_by_group` — identical doubled
    midranks, identical integer moments, identical float expression."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, {x_col} AS x, {y_col} AS y FROM {src}
    WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
r AS (
    SELECT g,
           2 * rank() OVER (PARTITION BY g ORDER BY x)
             + count(*) OVER (PARTITION BY g, x) - 1 AS rx,
           2 * rank() OVER (PARTITION BY g ORDER BY y)
             + count(*) OVER (PARTITION BY g, y) - 1 AS ry
    FROM t
),
m AS (
    SELECT g, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
           CAST(SUM(rx * ry) AS BIGINT) AS sxy,
           CAST(SUM(rx * rx) AS BIGINT) AS sxx,
           CAST(SUM(ry * ry) AS BIGINT) AS syy
    FROM r GROUP BY g
)
SELECT g AS {group_col}, n,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS rho
FROM m
"""


# ---------------------------------------------------------------------------
# Gini coefficient per group (value-concentration audit)
# ---------------------------------------------------------------------------


def gini_by_group(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
) -> rd.Dataset:
    """Gini concentration coefficient of ``value_col`` per group (the
    Lorenz-curve summary; Gini 1912) — the inequality audit every
    usage dashboard wants ("is revenue concentrated in a few whales,
    per segment"): ``G = sum_i (2i - n - 1) x_(i) / (n * sum x)`` over
    the sorted multiset.

    Plan: the column_quantiles shape — blocks pre-aggregate to
    (group, value-cents, count) rows, ONE group exchange co-locates
    each group's value histogram, and the rank-weighted sum collapses
    tie runs in closed form: a value occupying ranks a..b contributes
    ``x * c * (a + b - n - 1)`` — EXACT int64 arithmetic (ranks from
    one cumsum), so the numerator and both denominator factors are
    exact ints and G is one identical float division.  Negative
    values are refused (the Lorenz construction assumes a
    non-negative measure); an all-zero or empty group yields NULL.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        if len(c) and c.min() < 0:
            raise ValueError(
                "gini_by_group: negative values — the Lorenz construction "
                "assumes a non-negative measure"
            )
        t = pa.table({"g": b.column(group_col), "c": pa.array(c, pa.int64())})
        out = t.group_by(["g", "c"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        c = grp.column("c").to_numpy(zero_copy_only=False)
        cnt = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(c, kind="stable")
        c, cnt = c[order], cnt[order]
        n = int(cnt.sum())
        ends = np.cumsum(cnt)          # b per run
        starts = ends - cnt + 1        # a per run
        num = int((c * cnt * (starts + ends - n - 1)).sum())
        tot = int((c * cnt).sum())
        g = float(num) / (float(n) * tot) if tot > 0 else None
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "gini": pa.array([g], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "gini"]),
        batch_format="pyarrow",
    )


def gini_by_group_sql(src: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle for :func:`gini_by_group` — the same cents, the
    same rank-weighted sum via row_number over the sorted multiset
    (2i - n - 1 summed per row == the engine's closed-form tie runs),
    the same single float division."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src}
),
r AS (
    SELECT g, c,
           row_number() OVER (PARTITION BY g ORDER BY c) AS i,
           count(*) OVER (PARTITION BY g) AS n
    FROM t
),
m AS (
    SELECT g, CAST(max(n) AS BIGINT) AS n,
           CAST(SUM(c * (2 * i - n - 1)) AS BIGINT) AS num,
           CAST(SUM(c) AS BIGINT) AS tot
    FROM r GROUP BY g
)
SELECT g AS {group_col}, n,
       CASE WHEN tot > 0
            THEN CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * tot)
       END AS gini
FROM m
"""


# ---------------------------------------------------------------------------
# Shannon entropy per group (behavioral diversity)
# ---------------------------------------------------------------------------

ENTROPY_Q = 1_000_000  # per-term log quantization (the NB/JS device)


def entropy_by_group(
    ds: rd.Dataset,
    group_col: str,
    cat_col: str,
) -> rd.Dataset:
    """Shannon entropy (nats) of the ``cat_col`` distribution per
    group — the behavioral-diversity feature ("does this user do one
    thing or many"): ``H = -sum_i p_i ln p_i``.

    Exactness device (the JS-divergence rule): each category's
    ``ln(n_i / n)`` is the ln of a ratio of exact int64s — the SAME
    double both engines — quantized ``floor(x*1e6 + 0.5)``, weighted
    by the int64 count and summed exactly; the final ``-hq / (n *
    1e6)`` is one identical float division.  Singleton-category
    groups measure exactly 0.0 (ln 1 quantizes to 0).

    Plan: in-map (group, category, count) partials, ONE
    (group, category) groupby, then a per-group fold over the tiny
    category domain — the exchange is |groups x categories| rows.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_col, cat_col])
        g = t.group_by([group_col, cat_col]).aggregate([([], "count_all")])
        return g.rename_columns(["g", "cat", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        n_i = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(n_i.sum())
        qlog = np.floor(
            np.log(n_i / n) * ENTROPY_Q + 0.5
        ).astype(np.int64)
        hq = int((n_i * qlog).sum())
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "entropy": pa.array(
                    [-hq / (float(n) * ENTROPY_Q)], pa.float64()
                ),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    out = (
        ds.select_columns([group_col, cat_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["g", "cat"])
        .aggregate(_Sum("n", alias_name="n"))
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "entropy"]),
        batch_format="pyarrow",
    )


def entropy_by_group_sql(src: str, group_col: str, cat_col: str) -> str:
    """DuckDB oracle for :func:`entropy_by_group` — identical ratio
    through ln, identical quantization, identical final division."""
    q = ENTROPY_Q
    return f"""
WITH c AS (
    SELECT {group_col} AS g, {cat_col} AS cat,
           CAST(count(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1, 2
),
tot AS (SELECT g, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY g),
h AS (
    SELECT c.g,
           CAST(SUM(c.n * CAST(floor(ln(c.n * 1.0 / t.nt) * {q} + 0.5)
                               AS BIGINT)) AS BIGINT) AS hq,
           CAST(max(t.nt) AS BIGINT) AS nt
    FROM c JOIN tot t ON c.g = t.g
    GROUP BY c.g
)
SELECT g AS {group_col}, nt AS n,
       CAST(-hq AS DOUBLE) / (CAST(nt AS DOUBLE) * {q}) AS entropy
FROM h
"""


# ---------------------------------------------------------------------------
# Equal-frequency quantile binning (discretization)
# ---------------------------------------------------------------------------


def quantile_bin(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    bins: int = 4,
) -> rd.Dataset:
    """Equal-frequency discretization — label every row with its
    within-group quantile bucket 1..bins (quartiles by default): the
    feature binning a tabular pipeline runs before categorical models,
    VALUE-based (ties share a bucket; unlike ``ntile``, which splits
    tied rows by position).

    Boundaries are the same exact ceil-rank ORDER STATISTICS as
    :func:`grouped_quantiles` at q = i/bins; the label is ``1 +
    #{boundaries strictly below v}`` — identical double comparisons
    against identical boundary values in both engines, so every row
    labels identically.  One quantile exchange + a broadcast label
    map (the winsorize shape).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    qs = tuple((i, bins) for i in range(1, bins))
    bounds = grouped_quantiles(ds, group_col, value_col, quantiles=qs)
    rows = bounds.take_all()
    per: dict = {}
    for r in rows:
        per.setdefault(r[group_col], []).append((r["q"], r["value"]))
    band = {
        g: np.array([v for _, v in sorted(vals)], np.float64)
        for g, vals in per.items()
    }
    import ray

    band_ref = ray.put(band)

    def label(b: pa.Table) -> pa.Table:
        bd = ray.get(band_ref)
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        out = np.ones(len(v), np.int64)
        for grp in np.unique(g):
            m = g == grp
            edges = bd[grp]
            # strictly-greater count: values EQUAL to a boundary belong
            # to the boundary's bucket (v > edge moves up, v == stays)
            out[m] = 1 + (v[m][None, :] > edges[:, None]).sum(axis=0)
        return b.append_column("bin", pa.array(out, pa.int64()))

    return ds.map_batches(label, batch_format="pyarrow")


def quantile_bin_sql(
    src: str,
    group_col: str,
    value_col: str,
    bins: int = 4,
    cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`quantile_bin` — the same rank-rule
    boundaries, the same strictly-greater counting."""
    qrows = ", ".join(f"({i}, {bins})" for i in range(1, bins))
    return f"""
WITH vals AS (SELECT {group_col} AS g, {value_col} AS v FROM {src}
              WHERE {value_col} IS NOT NULL),
counts AS (SELECT g, v, count(*) AS n FROM vals GROUP BY g, v),
cum AS (SELECT g, v, sum(n) OVER (PARTITION BY g ORDER BY v) AS c FROM counts),
tot AS (SELECT g, count(*) AS n FROM vals GROUP BY g),
quants AS (SELECT * FROM (VALUES {qrows}) q(num, den)),
bounds AS (
    SELECT t.g, q.num,
           (SELECT min(v) FROM cum
            WHERE cum.g = t.g
              AND c >= (q.num * t.n + q.den - 1) // q.den) AS bv
    FROM tot t CROSS JOIN quants q
)
SELECT {cols},
       CAST(1 + (SELECT count(*) FROM bounds
                 WHERE bounds.g = s.{group_col}
                   AND s.{value_col} > bounds.bv) AS BIGINT) AS bin
FROM {src} s
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test per group
# ---------------------------------------------------------------------------


def ks_test(
    ds: rd.Dataset,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
    headroom_bound: int = INT64_HEADROOM,
) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov statistic per group between two
    segments (Kolmogorov 1933; Smirnov 1939) — the distribution-shape
    A/B readout that :func:`ab_test` (means) and :func:`mann_whitney`
    (location shift) cannot see: ``D = sup_v |F_a(v) - F_b(v)|`` over
    the empirical CDFs.  A segment can match in mean and rank-sum yet
    differ in variance or modality; D catches exactly that.

    Exactness is PURE INTEGER until the last division: at each
    distinct value the CDF gap is ``|ca*nb - cb*na| / (na*nb)`` with
    ``ca``/``cb`` the cumulative segment counts — numerator and both
    factors are exact int64 (headroom: ``ca*nb <= na*nb``, safe
    through ~3e9 rows per segment per group), the max folds over
    integers, and ``d`` is ONE identical float expression both
    engines: ``float(ks_num) / (float(na) * float(nb))``.  Degenerate
    one-sided groups emit NULL d (sup over an empty comparison).

    Plan: the :func:`mann_whitney` shape — ONE ``groupby(group)``
    exchange of in-map pre-deduped (value, segment, count) rows (the
    CDF needs the group's value multiset co-located, but only
    |distinct values x 2| rows ship per group); the per-group fold is
    one sort + two cumsums — vectorized.  Reference analog: the
    statistics surface (``services/statistics/StatisticsServiceImpl.java:33-79``)
    generalized to distribution monitoring.
    """

    def partial(b: pa.Table) -> pa.Table:
        seg = b.column(segment_col).to_numpy(zero_copy_only=False)
        if len(seg) and not np.isin(seg, (0, 1)).all():
            raise ValueError("ks_test: segment must be 0 or 1")
        t = pa.table(
            {
                "g": b.column(group_col),
                "v": b.column(value_col),
                "seg": pa.array(seg.astype(np.int64), pa.int64()),
            }
        ).filter(pc.is_valid(b.column(value_col)))
        out = t.group_by(["g", "v", "seg"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "seg", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        v = grp.column("v").to_numpy(zero_copy_only=False)
        seg = grp.column("seg").to_numpy(zero_copy_only=False)
        n = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(v, return_inverse=True)
        a = np.zeros(len(uniq), np.int64)
        b = np.zeros(len(uniq), np.int64)
        m0 = seg == 0
        np.add.at(a, inv[m0], n[m0])
        np.add.at(b, inv[~m0], n[~m0])
        na = int(a.sum())
        nb = int(b.sum())
        # numpy int64 would wrap SILENTLY past this point and produce
        # a wrong D (``headroom_bound`` overridable: testable refusal)
        headroom_guard("ks_test", na * nb, bound=headroom_bound,
                       hint="requantize or subsample the segments")
        ca = np.cumsum(a)
        cb = np.cumsum(b)
        ks_num = int(np.abs(ca * nb - cb * na).max()) if len(uniq) else 0
        d = (
            float(ks_num) / (float(na) * float(nb))
            if na > 0 and nb > 0
            else None
        )
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "ks_num": pa.array([ks_num], pa.int64()),
                "d": pa.array([d], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, segment_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n_a", "n_b", "ks_num", "d"]),
        batch_format="pyarrow",
    )


def ks_test_sql(
    src: str,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`ks_test` — the same integer CDF-gap
    numerators via window cumsums, the same single float division."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, {value_col} AS v, {segment_col} AS seg
    FROM {src} WHERE {value_col} IS NOT NULL
),
cell AS (
    SELECT g, v,
           CAST(SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
    FROM t GROUP BY g, v
),
cum AS (
    SELECT g,
           CAST(SUM(a) OVER w AS BIGINT) AS ca,
           CAST(SUM(b) OVER w AS BIGINT) AS cb
    FROM cell
    WINDOW w AS (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING)
),
tot AS (
    SELECT g, CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
    FROM cell GROUP BY g
)
SELECT cum.g AS {group_col}, tot.na AS n_a, tot.nb AS n_b,
       CAST(MAX(ABS(ca * tot.nb - cb * tot.na)) AS BIGINT) AS ks_num,
       CASE WHEN tot.na > 0 AND tot.nb > 0
            THEN CAST(MAX(ABS(ca * tot.nb - cb * tot.na)) AS DOUBLE)
                 / (CAST(tot.na AS DOUBLE) * CAST(tot.nb AS DOUBLE))
       END AS d
FROM cum JOIN tot ON cum.g = tot.g
GROUP BY cum.g, tot.na, tot.nb
"""


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation per group
# ---------------------------------------------------------------------------


def _fenwick_prefix(tree: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Vectorized Fenwick prefix sums: for each 1-based position in
    ``idx`` return sum(tree[1..idx]).  O(log U) vectorized passes."""
    res = np.zeros(len(idx), np.int64)
    i = idx.astype(np.int64).copy()
    while True:
        m = i > 0
        if not m.any():
            return res
        res[m] += tree[i[m]]
        i[m] -= i[m] & (-i[m])


def _fenwick_add(tree: np.ndarray, idx: np.ndarray, w: np.ndarray) -> None:
    """Vectorized Fenwick point updates (1-based positions)."""
    limit = len(tree) - 1
    i = idx.astype(np.int64).copy()
    w = w.astype(np.int64).copy()
    while True:
        m = (i > 0) & (i <= limit)
        if not m.any():
            return
        np.add.at(tree, i[m], w[m])
        i[m] += i[m] & (-i[m])
        i[~m] = 0


def kendall_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    x_col: str = "ts_us",
    y_col: str = "value",
    headroom_bound: int = INT64_HEADROOM,
) -> rd.Dataset:
    """Kendall tau-b per group (Kendall 1938) — the concordance-based
    correlation completing :func:`spearman_by_group`'s rank family:
    ``tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2))`` with C/D the
    concordant/discordant pair counts, ``n0 = n(n-1)/2`` and n1/n2 the
    x-tie / y-tie pair counts.  Spearman correlates the RANKS; tau
    counts pair ORDER agreements — more robust to a few gross
    outliers, and its sign test is the Mann-Kendall trend statistic.

    Exactness: C - D, n0, n1, n2 all fold as exact integers; the
    denominator product is formed as an arbitrary-precision Python int
    and converted to float ONCE (the same number DuckDB's
    HUGEINT->DOUBLE cast produces — the grouped_outliers device), so
    ``tau = float(S) / sqrt(float(den))`` is the identical expression
    both engines; a perfect monotone map measures exactly +-1.0.
    Zero-variance sides (den == 0) emit NULL.  int64 headroom: |S| <=
    n0 < 2^63 through ~4.2e9 rows/group.

    Plan: ONE group exchange of in-map pre-deduped (x, y, count) rows
    (the spearman shape — pair statistics need the group's multiset
    co-located, but only |distinct (x, y)| rows ship).  The fold is
    the classic offline 2D dominance count: sort by x, then per x-run
    query/insert a Fenwick tree over y-ranks — O(d log d) in distinct
    pairs, queries and updates vectorized across each run (never the
    O(d^2) all-pairs the SQL twin uses, which is why the twin is
    sf0.01-only and the engine is the scale path).
    """
    import math

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b.column(x_col)), pc.is_valid(b.column(y_col))
        )
        t = pa.table(
            {
                "g": b.column(group_col),
                "x": b.column(x_col),
                "y": b.column(y_col),
            }
        ).filter(keep)
        out = t.group_by(["g", "x", "y"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "x", "y", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        x = grp.column("x").to_numpy(zero_copy_only=False)
        y = grp.column("y").to_numpy(zero_copy_only=False)
        w = grp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((y, x))
        x, y, w = x[order], y[order], w[order]
        n = int(w.sum())
        # |S| and every Fenwick partial are bounded by n0 = C(n, 2)
        # (docstring bound, ~4.2e9 rows/group; ``headroom_bound`` is
        # overridable so the refusal is testable without 4e9 rows)
        headroom_guard("kendall_by_group", n * (n - 1) // 2,
                       bound=headroom_bound)
        n0 = n * (n - 1) // 2
        tx = np.zeros(len(np.unique(x)), np.int64)
        _, xi = np.unique(x, return_inverse=True)
        np.add.at(tx, xi, w)
        n1 = int(sum(int(t) * (int(t) - 1) // 2 for t in tx))
        yu, yr = np.unique(y, return_inverse=True)
        ty = np.zeros(len(yu), np.int64)
        np.add.at(ty, yr, w)
        n2 = int(sum(int(t) * (int(t) - 1) // 2 for t in ty))
        tree = np.zeros(len(yu) + 1, np.int64)
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        ends = np.r_[starts[1:], len(x)]
        s = 0
        prior = 0
        for a, b in zip(starts, ends):
            idx = yr[a:b] + 1
            ww = w[a:b]
            below = _fenwick_prefix(tree, idx - 1)
            atmost = _fenwick_prefix(tree, idx)
            s += int((ww * (below - (prior - atmost))).sum())
            _fenwick_add(tree, idx, ww)
            prior += int(ww.sum())
        den = (n0 - n1) * (n0 - n2)
        tau = float(s) / math.sqrt(float(den)) if den > 0 else None
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s], pa.int64()),
                "tau": pa.array([tau], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "s", "tau"]),
        batch_format="pyarrow",
    )


def kendall_by_group_sql(
    src: str,
    group_col: str = "event_type",
    x_col: str = "ts_us",
    y_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`kendall_by_group` — the all-pairs
    SIGN-product definition (O(n^2) per group: sf0.01-scale only, the
    engine's Fenwick fold is the scale path); identical tie counts and
    the identical HUGEINT->DOUBLE single-cast denominator."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, {id_col} AS id, {x_col} AS x, {y_col} AS y
    FROM {src}
    WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
p AS (
    SELECT a.g AS g,
           CAST(SUM(CAST(SIGN(a.x - b.x) AS BIGINT)
                    * CAST(SIGN(a.y - b.y) AS BIGINT)) AS BIGINT) AS s
    FROM t a JOIN t b ON a.g = b.g AND a.id < b.id
    GROUP BY a.g
),
nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
tx AS (
    SELECT g, CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n1
    FROM (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY g, x)
    GROUP BY g
),
ty AS (
    SELECT g, CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n2
    FROM (SELECT g, y, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY g, y)
    GROUP BY g
)
SELECT nn.g AS {group_col}, nn.n,
       CAST(COALESCE(p.s, 0) AS BIGINT) AS s,
       CASE WHEN (nn.n * (nn.n - 1) // 2 - tx.n1) > 0
             AND (nn.n * (nn.n - 1) // 2 - ty.n2) > 0
            THEN CAST(COALESCE(p.s, 0) AS DOUBLE)
                 / sqrt(CAST(CAST(nn.n * (nn.n - 1) // 2 - tx.n1 AS HUGEINT)
                             * CAST(nn.n * (nn.n - 1) // 2 - ty.n2 AS HUGEINT)
                             AS DOUBLE))
       END AS tau
FROM nn
JOIN tx ON nn.g = tx.g
JOIN ty ON nn.g = ty.g
LEFT JOIN p ON nn.g = p.g
"""


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group
# ---------------------------------------------------------------------------


def mode_by_group(
    ds: rd.Dataset,
    group_col: str = "user_id",
    value_col: str = "event_type",
) -> rd.Dataset:
    """Most frequent value per group with a deterministic (count DESC,
    value ASC) tie-break — the categorical summary ("what does this
    user mostly DO") next to the numeric quantile family.  An
    arbitrary-tie mode is block-order-dependent — the bug class an
    oracle can never pin — so the total order is part of the contract.

    Plan: the :func:`mann_whitney` shape — blocks pre-aggregate to
    (group, value, count) rows in-map (Arrow ``group_by``), ONE
    ``groupby(group)`` exchange ships at most |distinct values| rows
    per group per block, and the fold re-sums partials per value then
    takes the (count DESC, value ASC) head — vectorized lexsort.
    Exact integer counts; no floats anywhere.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"g": b.column(group_col), "v": b.column(value_col)}
        ).filter(pc.is_valid(b.column(value_col)))
        out = t.group_by(["g", "v"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "v"]).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            merged,
            sort_keys=[("n_sum", "descending"), ("v", "ascending")],
        )
        top = merged.take(idx.slice(0, 1))
        return pa.table(
            {
                "g": top.column("g"),
                "mode": top.column("v"),
                "n": top.column("n_sum"),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "mode", "n"]),
        batch_format="pyarrow",
    )


def mode_by_group_sql(
    src: str,
    group_col: str = "user_id",
    value_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`mode_by_group` — the same (count DESC,
    value ASC) total order via row_number."""
    return f"""
WITH c AS (
    SELECT {group_col} AS g, {value_col} AS v,
           CAST(count(*) AS BIGINT) AS n
    FROM {src} WHERE {value_col} IS NOT NULL
    GROUP BY g, v
),
r AS (
    SELECT g, v, n,
           row_number() OVER (PARTITION BY g ORDER BY n DESC, v ASC) AS rn
    FROM c
)
SELECT g AS {group_col}, v AS mode, n FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Interpolated percentiles per group (PERCENTILE_CONT)
# ---------------------------------------------------------------------------

PCTCONT_QS = (0.25, 0.5, 0.75, 0.95)


def percentile_cont_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = PCTCONT_QS,
) -> rd.Dataset:
    """SQL-standard PERCENTILE_CONT per group — the INTERPOLATED
    quantile (R type-7 / NIST default), the continuous sibling of
    :func:`grouped_quantiles`' order statistics: at ``h = (n-1)*q``
    the result is ``v[floor(h)]*(1-f) + v[ceil(h)]*f`` with ``f = h -
    floor(h)`` — between two data points, not one of them.

    Exactness: both order statistics are exact doubles read from the
    same parquet, and ``h``, ``f`` and the lerp are the IDENTICAL
    float expressions DuckDB's quantile_cont evaluates (verified
    empirically: DuckDB lerps ``lo*(1-f) + hi*f``, not ``lo +
    f*(hi-lo)`` — the two differ in the last ulp and the distinction
    is pinned by the driver oracle), so every percentile agrees
    bit-for-bit.

    Plan: the :func:`grouped_quantiles` shape — ONE group exchange of
    in-map pre-deduped (value, count) rows; the fold ranks the
    weighted multiset with one cumsum + searchsorted per q.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"g": b.column(group_col), "v": b.column(value_col)}
        ).filter(pc.is_valid(b.column(value_col)))
        out = t.group_by(["g", "v"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "v", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "v"]).aggregate([("n", "sum")])
        v = merged.column("v").to_numpy(zero_copy_only=False)
        n = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1]) if len(cum) else 0

        def at_rank(r: int) -> float:
            return float(v[np.searchsorted(cum, r + 1)])

        cols = {"g": grp.column("g").slice(0, 1)}
        for q in qs:
            if total == 0:
                val = None
            else:
                h = (total - 1) * q
                lo = int(np.floor(h))
                hi = int(np.ceil(h))
                f = h - lo
                vlo, vhi = at_rank(lo), at_rank(hi)
                val = vlo * (1.0 - f) + vhi * f
            cols[f"p{int(q * 100)}"] = pa.array([val], pa.float64())
        return pa.table(cols)

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    names = [group_col] + [f"p{int(q * 100)}" for q in qs]
    return out.map_batches(
        lambda t: t.rename_columns(names), batch_format="pyarrow"
    )


def percentile_cont_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
    qs: tuple = PCTCONT_QS,
) -> str:
    """DuckDB oracle for :func:`percentile_cont_by_group` — native
    quantile_cont per q (the engine mirrors ITS lerp bit-for-bit)."""
    cols = ", ".join(
        f"quantile_cont({value_col}, {q}::DOUBLE) AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
SELECT {group_col}, {cols}
FROM {src}
WHERE {value_col} IS NOT NULL
GROUP BY {group_col}
"""


# ---------------------------------------------------------------------------
# Benford first-significant-digit audit per group
# ---------------------------------------------------------------------------


def benford_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """First-significant-digit distribution per group vs Benford's law
    (Newcomb 1881; Benford 1938) — the classic fabricated-numbers
    audit: naturally occurring multiplicative data leads with digit d
    at rate ``log10(1 + 1/d)``; invented numbers don't.  Output one
    row per (group, observed leading digit) with the exact count, the
    observed rate and the Benford expectation, both in ppm.

    Exactness: the digit comes from the INTEGER cents ``round(|v| *
    100)`` — extracted by repeated integer division (mirrored in SQL
    by substr of the exact integer print), never from float log10 of
    the raw value, whose boundary cells (v = 999.99...) would diverge.
    ``actual_ppm = floor(n * 1e6 / total + 0.5)`` is the identical
    float division of exact int64s both engines; ``expected_ppm``
    quantizes ``log10(1 + 1/d)`` of the 9 identical doubles (the NB
    rule; no quantization boundary lies within an ulp for any digit).
    Zero cents have no leading digit and drop on BOTH sides.

    Plan: the :func:`entropy_by_group` shape — in-map (group, digit,
    count) partials over a 9-value domain, ONE group exchange, fold
    over at most 9 rows per group.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        g = b.column(group_col)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = np.floor(np.abs(v[keep]) * 100 + 0.5).astype(np.int64)
        g = g.filter(pa.array(keep))
        nz = c > 0
        c, g = c[nz], g.filter(pa.array(nz))
        while (c >= 10).any():
            big = c >= 10
            c[big] //= 10
        t = pa.table({"g": g, "digit": pa.array(c, pa.int64())})
        out = t.group_by(["g", "digit"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "digit", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "digit"]).aggregate([("n", "sum")])
        d = merged.column("digit").to_numpy(zero_copy_only=False)
        n = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(d)
        d, n = d[order], n[order]
        total = int(n.sum())
        actual = np.floor(n * 1000000.0 / total + 0.5).astype(np.int64)
        expected = np.floor(
            np.log10(1.0 + 1.0 / d) * 1000000.0 + 0.5
        ).astype(np.int64)
        k = len(d)
        return pa.table(
            {
                "g": pa.chunked_array([grp.column("g").slice(0, 1)] * k)
                if k
                else grp.column("g").slice(0, 0),
                "digit": pa.array(d, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "actual_ppm": pa.array(actual, pa.int64()),
                "expected_ppm": pa.array(expected, pa.int64()),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "digit", "n", "actual_ppm", "expected_ppm"]
        ),
        batch_format="pyarrow",
    )


def benford_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`benford_by_group` — the digit from the
    exact integer print, the same quantized rates."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round(abs({value_col}) * 100) AS BIGINT) AS c
    FROM {src} WHERE {value_col} IS NOT NULL
),
d AS (
    SELECT g, CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM t WHERE c > 0
),
cnt AS (
    SELECT g, digit, CAST(count(*) AS BIGINT) AS n
    FROM d GROUP BY g, digit
),
tot AS (SELECT g, CAST(SUM(n) AS BIGINT) AS total FROM cnt GROUP BY g)
SELECT cnt.g AS {group_col}, cnt.digit, cnt.n,
       CAST(floor(cnt.n * 1000000.0 / tot.total + 0.5) AS BIGINT)
           AS actual_ppm,
       CAST(floor(log10(1.0 + 1.0 / cnt.digit) * 1000000.0 + 0.5)
            AS BIGINT) AS expected_ppm
FROM cnt JOIN tot ON cnt.g = tot.g
"""


# ---------------------------------------------------------------------------
# Pythagorean means per group (arithmetic / geometric / harmonic)
# ---------------------------------------------------------------------------


def pythagorean_means(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """The three Pythagorean means of value per group — arithmetic
    (the average), geometric (the compounding-rate mean: one 10x
    outlier shifts AM by 10x/n but GM by only 10^(1/n)) and harmonic
    (the rate mean: "average speed over equal distances") — with the
    AM >= GM >= HM inequality holding EXACTLY in the output (pinned).

    Exactness: values quantize to int64 cents (positive required —
    GM/HM are undefined at 0 and sign-ambiguous below); per distinct
    cent value ``lnq = floor(ln(c/100.0) * 1e6 + 0.5)`` (the NB rule
    — ln of a ratio of exact ints, the same double both engines) and
    ``invq = floor(1e12 * 100.0 / c + 0.5)`` fold as count-weighted
    exact int64 sums; the three finishes are one identical float
    expression each: ``am = S/(n*100)``, ``gm = exp(L/(n*1e6))/100``
    ... with the exp of an identical double identical, and ``hm =
    n*1e12/IV/100``.  All three moments are PER-VALUE functions, so
    partials are fully additive IN-MAP (the user_trend shape): the one
    groupby ships four int64s per group per block, never rows, and no
    map_groups / sort exists anywhere in the plan.  int64 headroom:
    ~9e3 rows/group at the 1e12 inverse scale (documented; rebase
    invq to 1e9 beyond — the driver corpus is far below).
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        if (v[keep] <= 0).any():
            raise ValueError(
                "pythagorean_means: values must be positive (GM/HM are "
                "undefined at 0 and sign-ambiguous below)"
            )
        c = np.floor(v * 100 + 0.5).astype(np.int64)[keep]
        if (c <= 0).any():
            raise ValueError(
                "pythagorean_means: values must round to positive cents"
            )
        g = b.column(group_col).filter(pa.array(keep))
        lnq = np.floor(np.log(c / 100.0) * 1e6 + 0.5).astype(np.int64)
        invq = np.floor(1e12 * 100.0 / c + 0.5).astype(np.int64)
        t = pa.table(
            {
                "g": g,
                "n": pa.array(np.ones(len(c), np.int64), pa.int64()),
                "s": pa.array(c, pa.int64()),
                "l": pa.array(lnq, pa.int64()),
                "iv": pa.array(invq, pa.int64()),
            }
        )
        out = t.group_by(["g"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("l", "sum"), ("iv", "sum")]
        )
        return out.rename_columns(["g", "n", "s", "l", "iv"])

    rows = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("l", alias_name="l"),
            Sum("iv", alias_name="iv"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        import math

        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        ln_ = b.column("l").to_numpy(zero_copy_only=False).astype(np.int64)
        iv = b.column("iv").to_numpy(zero_copy_only=False).astype(np.int64)
        am = [float(int(si)) / (int(ni) * 100.0) for si, ni in zip(s, n)]
        gm = [
            math.exp(float(int(li)) / (int(ni) * 1e6))
            for li, ni in zip(ln_, n)
        ]
        hm = [
            int(ni) * 1e12 / float(int(ivi))
            for ivi, ni in zip(iv, n)
        ]
        return pa.table(
            {
                "g": b.column("g"),
                "n": pa.array(n, pa.int64()),
                "am": pa.array(am, pa.float64()),
                "gm": pa.array(gm, pa.float64()),
                "hm": pa.array(hm, pa.float64()),
            }
        )

    out = rows.map_batches(finish, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "am", "gm", "hm"]),
        batch_format="pyarrow",
    )


def pythagorean_means_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`pythagorean_means` — the same cents,
    the same quantized ln/inverse, the same finishes."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src} WHERE {value_col} IS NOT NULL
),
m AS (
    SELECT g, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(CAST(floor(ln(c / 100.0) * 1000000.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS l,
           CAST(SUM(CAST(floor(1000000000000.0 * 100.0 / c + 0.5)
                         AS BIGINT)) AS BIGINT) AS iv
    FROM t GROUP BY g
)
SELECT g AS {group_col}, n,
       CAST(s AS DOUBLE) / (n * 100.0) AS am,
       exp(CAST(l AS DOUBLE) / (n * 1000000.0)) AS gm,
       n * 1000000000000.0 / CAST(iv AS DOUBLE) AS hm
FROM m
"""


# ---------------------------------------------------------------------------
# MAD robust outliers per group (median absolute deviation)
# ---------------------------------------------------------------------------

MAD_K = 3


def mad_outliers_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = MAD_K,
) -> rd.Dataset:
    """Median-absolute-deviation outlier audit per group (Hampel
    1974) — the ROBUST sibling of :func:`grouped_outliers`' z-score:
    one genuine spike inflates a group's standard deviation enough to
    hide a second spike (masking); the median and MAD have a 50%
    breakdown point and do not.  Per group: the median, ``mad =
    median(|v - median|)`` and the count of rows with ``|v - median| >
    k * mad``.

    The exactness class is the strongest in the repo: cents, both
    medians by the ceil-rank ORDER-STATISTIC rule (rank ``ceil(n/2)``
    of the sorted multiset — always an actual data value, the
    :func:`grouped_quantiles` convention), deviations exact int64, and
    the flag test ``dev > k * mad`` pure integer — no float, no
    epsilon, anywhere.

    Plan: ONE group exchange of in-map pre-deduped (value-cents,
    count) rows (the rank-statistics shape); the fold is two
    sort+cumsum+searchsorted passes — the second over the deviation
    multiset DERIVED from the first (|distinct values| entries, no new
    exchange).  Zero-MAD groups (a majority at one value) flag every
    row off the median — the documented Hampel behavior.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)[
            keep
        ]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by(["g", "c"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "c"]).aggregate([("n", "sum")])
        c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        w = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(c)
        c, w = c[order], w[order]
        cum = np.cumsum(w)
        n = int(cum[-1])
        med = int(c[np.searchsorted(cum, (n + 1) // 2)])
        dev = np.abs(c - med)
        do = np.argsort(dev, kind="stable")
        dev_s, w_s = dev[do], w[do]
        dcum = np.cumsum(w_s)
        mad = int(dev_s[np.searchsorted(dcum, (n + 1) // 2)])
        n_out = int(w[dev > k * mad].sum())
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "med_c": pa.array([med], pa.int64()),
                "mad_c": pa.array([mad], pa.int64()),
                "n_out": pa.array([n_out], pa.int64()),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n", "med_c", "mad_c", "n_out"]
        ),
        batch_format="pyarrow",
    )


def mad_outliers_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
    k: int = MAD_K,
) -> str:
    """DuckDB oracle for :func:`mad_outliers_by_group` — the same
    cents, the same ceil-rank medians, the same integer flag test."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src} WHERE {value_col} IS NOT NULL
),
nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
cnt AS (SELECT g, c, count(*) AS m FROM t GROUP BY g, c),
cum AS (
    SELECT g, c, sum(m) OVER (PARTITION BY g ORDER BY c) AS cm FROM cnt
),
med AS (
    SELECT nn.g,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (nn.n + 1) // 2) AS med_c
    FROM nn
),
dev AS (
    SELECT t.g, ABS(t.c - med.med_c) AS d
    FROM t JOIN med ON t.g = med.g
),
dcnt AS (SELECT g, d, count(*) AS m FROM dev GROUP BY g, d),
dcum AS (
    SELECT g, d, sum(m) OVER (PARTITION BY g ORDER BY d) AS cm FROM dcnt
),
mad AS (
    SELECT nn.g,
           (SELECT min(d) FROM dcum
            WHERE dcum.g = nn.g AND cm >= (nn.n + 1) // 2) AS mad_c
    FROM nn
)
SELECT nn.g AS {group_col}, nn.n,
       CAST(med.med_c AS BIGINT) AS med_c,
       CAST(mad.mad_c AS BIGINT) AS mad_c,
       CAST((SELECT count(*) FROM dev
             WHERE dev.g = nn.g AND dev.d > {k} * mad.mad_c)
            AS BIGINT) AS n_out
FROM nn JOIN med ON nn.g = med.g JOIN mad ON nn.g = mad.g
"""


# ---------------------------------------------------------------------------
# 1-D earth mover's distance between two segments per group
# ---------------------------------------------------------------------------


def emd_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> rd.Dataset:
    """First Wasserstein distance (earth mover's) between two
    segments' value distributions per group — :func:`ks_test`'s L1
    sibling: KS reports the WORST CDF gap, EMD the TOTAL AREA between
    the CDFs (``W1 = integral |F_a - F_b|``), so a broad small shift
    that never spikes (invisible to KS beyond its height) still
    accumulates here, in value units ("how far does the money have to
    move").

    Exactness: values quantize to int64 cents; over the sorted
    distinct cents the area is ``sum_i |ca_i*nb - cb_i*na| * (c_{i+1}
    - c_i)`` — every factor exact int64, the sum folds as a Python
    bigint mirrored by HUGEINT, and ``emd = float(num) / (float(na) *
    float(nb) * 100.0)`` is ONE identical float expression (the /100
    returns cents to value units).  Identical segments measure 0.0
    and a constant shift of d units exactly d (pinned).  One-sided
    groups emit NULL.

    Plan: the :func:`ks_test` exchange verbatim — ONE group exchange
    of in-map pre-deduped (cents, segment, count) rows; the fold is
    one sort + two cumsums + one weighted absolute sum.
    """

    def partial(b: pa.Table) -> pa.Table:
        seg = b.column(segment_col).to_numpy(zero_copy_only=False)
        if len(seg) and not np.isin(seg, (0, 1)).all():
            raise ValueError("emd_by_group: segment must be 0 or 1")
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)[
            keep
        ]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
                "seg": pa.array(
                    seg[keep].astype(np.int64), pa.int64()
                ),
            }
        )
        out = t.group_by(["g", "c", "seg"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "seg", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "c", "seg"]).aggregate([("n", "sum")])
        c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        seg = merged.column("seg").to_numpy(zero_copy_only=False)
        n = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        uniq, inv = np.unique(c, return_inverse=True)
        a = np.zeros(len(uniq), np.int64)
        b = np.zeros(len(uniq), np.int64)
        m0 = seg == 0
        np.add.at(a, inv[m0], n[m0])
        np.add.at(b, inv[~m0], n[~m0])
        na, nb = int(a.sum()), int(b.sum())
        emd = None
        num = 0
        if na > 0 and nb > 0 and len(uniq) > 1:
            # the whole sum is bounded by na*nb*(value range); numpy
            # int64 would WRAP past 2^63 where DuckDB's HUGEINT grows
            headroom_guard(
                "emd_by_group", na * nb * int(uniq[-1] - uniq[0]),
                hint="rebase cents or split the group",
            )
            ca = np.cumsum(a)[:-1]
            cb = np.cumsum(b)[:-1]
            gaps = np.diff(uniq)
            num = int(np.sum(np.abs(ca * nb - cb * na) * gaps))
            emd = float(num) / (float(na) * float(nb) * 100.0)
        elif na > 0 and nb > 0:
            emd = 0.0
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "emd_num": pa.array([num], pa.int64()),
                "emd": pa.array([emd], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, segment_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n_a", "n_b", "emd_num", "emd"]
        ),
        batch_format="pyarrow",
    )


def emd_by_group_sql(
    src: str,
    group_col: str = "event_type",
    segment_col: str = "segment",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`emd_by_group` — the same cents, the
    same cumulative gaps weighted by lead() value steps, the same
    single float expression."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round(abs({value_col}) * 100)
                * CASE WHEN {value_col} < 0 THEN -1 ELSE 1 END
                AS BIGINT) AS c,
           {segment_col} AS seg
    FROM {src} WHERE {value_col} IS NOT NULL
),
cell AS (
    SELECT g, c,
           CAST(SUM(CASE WHEN seg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN seg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
    FROM t GROUP BY g, c
),
cum AS (
    SELECT g, c,
           CAST(SUM(a) OVER w AS BIGINT) AS ca,
           CAST(SUM(b) OVER w AS BIGINT) AS cb,
           lead(c) OVER (PARTITION BY g ORDER BY c) AS nxt
    FROM cell
    WINDOW w AS (PARTITION BY g ORDER BY c ROWS UNBOUNDED PRECEDING)
),
tot AS (
    SELECT g, CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
    FROM cell GROUP BY g
),
num AS (
    SELECT cum.g,
           CAST(COALESCE(SUM(CAST(ABS(ca * tot.nb - cb * tot.na)
                                  AS HUGEINT) * (nxt - c)), 0)
                AS BIGINT) AS emd_num
    FROM cum JOIN tot ON cum.g = tot.g
    WHERE nxt IS NOT NULL
    GROUP BY cum.g
)
SELECT tot.g AS {group_col}, tot.na AS n_a, tot.nb AS n_b,
       COALESCE(num.emd_num, 0) AS emd_num,
       CASE WHEN tot.na > 0 AND tot.nb > 0
            THEN CAST(COALESCE(num.emd_num, 0) AS DOUBLE)
                 / (CAST(tot.na AS DOUBLE) * CAST(tot.nb AS DOUBLE)
                    * 100.0)
       END AS emd
FROM tot LEFT JOIN num ON tot.g = num.g
"""


# ---------------------------------------------------------------------------
# Min-max scaling per group (feature normalization)
# ---------------------------------------------------------------------------


def minmax_scale_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Min-max feature scaling within each group — the [0, 1]
    normalizer every per-segment model input runs
    (:func:`winsorize_by_group` clips tails, :func:`quantile_bin`
    discretizes; this is the third member, the affine rescale):
    ``scaled = (v - min) / (max - min)`` with the GROUP's extrema.

    Exactness: cents int64; extrema are exact ints from one tiny
    aggregate-rejoin exchange (in-map min/max partials — the
    grouped_outliers shape), the stats broadcast once, and the scale
    is one identical float expression of exact ints — group minima
    map to exactly 0.0 and maxima to exactly 1.0.  Constant groups
    (max == min) emit NULL (the 0/0 the twin's NULLIF produces).
    The rescale pass is pure zero-shuffle.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)[
            keep
        ]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by(["g"]).aggregate([("c", "min"), ("c", "max")])
        return out.rename_columns(["g", "mn", "mx"])

    stats_t = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )
    import ray as _ray

    tabs = [t for t in _ray.get(stats_t.materialize().to_arrow_refs()) if t.num_rows]
    lut = {}
    for t in tabs:
        for g, mn, mx in zip(
            t.column("g").to_pylist(),
            t.column("mn").to_pylist(),
            t.column("mx").to_pylist(),
        ):
            lut[g] = (int(mn), int(mx))
    lut_ref = _ray.put(lut)

    def scale(b: pa.Table) -> pa.Table:
        m = _ray.get(lut_ref)
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        nan = np.isnan(v) if v.dtype.kind == "f" else np.zeros(len(v), bool)
        vv = np.where(nan, 0.0, v)
        c = (np.floor(np.abs(vv) * 100 + 0.5) * np.sign(vv)).astype(np.int64)
        g = np.asarray(b.column(group_col).to_pylist(), dtype=object)
        ug, inv = np.unique(g, return_inverse=True)
        mns = np.array([m.get(x, (0, 0))[0] for x in ug], np.int64)[inv]
        rngs = (
            np.array([m.get(x, (0, 0))[1] for x in ug], np.int64)[inv] - mns
        )
        ok = (rngs > 0) & ~nan
        out = np.zeros(len(c), np.float64)
        out[ok] = (c[ok] - mns[ok]).astype(np.float64) / rngs[ok].astype(
            np.float64
        )
        return pa.table(
            {
                id_col: b.column(id_col),
                group_col: b.column(group_col),
                "scaled": pa.array(out, pa.float64(), mask=~ok),
            }
        )

    return ds.select_columns([id_col, group_col, value_col]).map_batches(
        lambda t: scale(t.replace_schema_metadata(None)),
        batch_format="pyarrow",
    )


def minmax_scale_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`minmax_scale_by_group` — the same
    cents extrema, the same single float expression, NULLIF for the
    constant group."""
    return f"""
WITH t AS (
    SELECT {id_col} AS id, {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src}
),
s AS (
    SELECT g, CAST(min(c) AS BIGINT) AS mn, CAST(max(c) AS BIGINT) AS mx
    FROM t GROUP BY g
)
SELECT t.id AS {id_col}, t.g AS {group_col},
       CAST(t.c - s.mn AS DOUBLE)
       / CAST(NULLIF(s.mx - s.mn, 0) AS DOUBLE) AS scaled
FROM t JOIN s ON t.g = s.g
"""


# ---------------------------------------------------------------------------
# Hour-of-day uniformity test per group (seasonality audit)
# ---------------------------------------------------------------------------


def hour_uniformity_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Chi-square goodness-of-fit of each group's hour-of-day profile
    against the UNIFORM distribution — the seasonality audit ("is
    this event type time-patterned or flat"): organic human traffic
    is strongly diurnal (large chi2), synthetic/cron traffic is flat
    (small) or single-spiked (huge).  The fixed-expected sibling of
    :func:`chi2_independence`.

    Exactness: hours are pure integer arithmetic (``epoch_us //
    3600e6 % 24`` — identical int64 both engines); the statistic is
    integer-cleared of its division — ``chi2 = sum_h (24*o_h - n)^2 /
    (24*n)`` with the sum over ALL 24 cells (an absent hour
    contributes n^2 — a cells-only sum understates, the
    chi2_independence lesson) folding as exact int64, then ONE float
    division.  Plan: in-map (group, hour, count) partials over a
    24-value domain, one group exchange, 24-cell folds.
    """
    us_hour = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "g": b.column(group_col),
                "h": pa.array((us // us_hour) % 24, pa.int64()),
            }
        )
        out = t.group_by(["g", "h"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "h", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "h"]).aggregate([("n", "sum")])
        h = merged.column("h").to_numpy(zero_copy_only=False)
        n_ = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.zeros(24, np.int64)
        np.add.at(o, h, n_)
        n = int(o.sum())
        # 24 cells: fold as Python bigints (mirrors HUGEINT — numpy
        # would wrap past ~2.5e7 rows/group)
        num = sum(int(24 * int(x) - n) ** 2 for x in o)
        chi2 = float(num) / (24.0 * float(n)) if n > 0 else None
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "chi2_num": pa.array([num], pa.int64()),
                "chi2": pa.array([chi2], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, ts_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "chi2_num", "chi2"]),
        batch_format="pyarrow",
    )


def hour_uniformity_by_group_sql(
    src: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB oracle for :func:`hour_uniformity_by_group` — the dense
    24-cell grid via generate_series, the same integer-cleared sum."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           (epoch_us({ts_col}) // 3600000000) % 24 AS h
    FROM {src}
),
cnt AS (SELECT g, h, CAST(count(*) AS BIGINT) AS o FROM t GROUP BY g, h),
nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
grid AS (
    SELECT nn.g, gs.h, nn.n, COALESCE(cnt.o, 0) AS o
    FROM nn CROSS JOIN (SELECT unnest(range(0, 24)) AS h) gs
    LEFT JOIN cnt ON cnt.g = nn.g AND cnt.h = gs.h
),
agg AS (
    SELECT g, CAST(max(n) AS BIGINT) AS n,
           CAST(SUM(CAST(24 * o - n AS HUGEINT) * (24 * o - n))
                AS BIGINT) AS chi2_num
    FROM grid GROUP BY g
)
SELECT g AS {group_col}, n, chi2_num,
       CASE WHEN n > 0
            THEN CAST(chi2_num AS DOUBLE) / (24.0 * CAST(n AS DOUBLE))
       END AS chi2
FROM agg
"""


# ---------------------------------------------------------------------------
# Wilson lower-bound proportion ranking per group
# ---------------------------------------------------------------------------

WILSON_Z = 1.96


def wilson_lower_bound(
    ds: rd.Dataset,
    group_col: str = "user_id",
    flag_col: str = "is_hit",
    z: float = WILSON_Z,
) -> rd.Dataset:
    """Wilson score interval lower bound of a per-group success
    proportion (Wilson 1927) — THE small-sample-honest ranking rule
    (Reddit's comment sort): a 1/1 group must NOT outrank a 95/100
    group, which the raw proportion does and the Wilson lower bound
    does not (pinned).  Output (group, n, k, rate, wilson_lb) ordered
    by nothing (the caller ranks).

    Exactness: n and k fold as exact int64 in-map partials (ONE tiny
    groupby — the cheapest shape); the bound is float arithmetic, but
    the EXPRESSION is written once and mirrored token-for-token in
    the twin — ``(p + z2/(2n) - z*sqrt((p*(1-p) + z2/(4n))/n)) / (1 +
    z2/n)`` with ``p = k/n`` — identical IEEE ops on identical
    doubles, so the hash matches with no epsilon.  Empty groups
    cannot occur (a group exists only via its rows).
    """

    def partial(b: pa.Table) -> pa.Table:
        f = b.column(flag_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(f) and not np.isin(f, (0, 1)).all():
            raise ValueError("wilson_lower_bound: flag must be 0 or 1")
        t = pa.table(
            {
                "g": b.column(group_col),
                "n": pa.array(np.ones(len(f), np.int64), pa.int64()),
                "k": pa.array(f, pa.int64()),
            }
        )
        out = t.group_by(["g"]).aggregate([("n", "sum"), ("k", "sum")])
        return out.rename_columns(["g", "n", "k"])

    rows = (
        ds.select_columns([group_col, flag_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("k", alias_name="k"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        z2 = z * z
        p = k / n
        lb = (p + z2 / (2 * n) - z * np.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (
            1 + z2 / n
        )
        return pa.table(
            {
                "g": b.column("g"),
                "n": b.column("n").cast(pa.int64()),
                "k": b.column("k").cast(pa.int64()),
                "rate": pa.array(p, pa.float64()),
                "wilson_lb": pa.array(lb, pa.float64()),
            }
        )

    out = rows.map_batches(finish, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "k", "rate", "wilson_lb"]),
        batch_format="pyarrow",
    )


def wilson_lower_bound_sql(
    src: str,
    group_col: str = "user_id",
    flag_col: str = "is_hit",
    z: float = WILSON_Z,
) -> str:
    """DuckDB oracle for :func:`wilson_lower_bound` — the identical
    expression token-for-token (p + z2/(2n) - z*sqrt((p*(1-p) +
    z2/(4n))/n)) / (1 + z2/n).  Constants inject as
    ``CAST('<repr>' AS DOUBLE)`` STRING casts: a bare numeric literal
    parses as DECIMAL first and loses the exact double
    (3.8415999999999997 becomes 3.8416 — one ulp off, measured)."""
    return f"""
WITH m AS (
    SELECT {group_col} AS g,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM({flag_col}) AS BIGINT) AS k
    FROM {src} GROUP BY g
),
d AS (
    SELECT g, n, k,
           CAST(n AS DOUBLE) AS nd,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p
    FROM m
)
SELECT g AS {group_col}, n, k, p AS rate,
       (p + CAST('{z * z!r}' AS DOUBLE) / (2 * nd)
          - CAST('{z!r}' AS DOUBLE)
            * sqrt((p * (1 - p)
                    + CAST('{z * z!r}' AS DOUBLE) / (4 * nd)) / nd))
       / (1 + CAST('{z * z!r}' AS DOUBLE) / nd) AS wilson_lb
FROM d
"""


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration per group
# ---------------------------------------------------------------------------


def hhi_by_group(
    ds: rd.Dataset,
    group_col: str = "user_id",
    cat_col: str = "event_type",
) -> rd.Dataset:
    """Herfindahl-Hirschman concentration of a categorical mix per
    group — the economics twin of :func:`entropy_by_group` (antitrust
    reads HHI, information theory reads entropy; both answer "one
    thing or many", but HHI weights the DOMINANT share quadratically,
    so a 90/10 mix scores near-monopoly while its entropy still looks
    moderate): ``HHI = sum_i (n_i/n)^2``, 1/k for a uniform k-way mix
    and exactly 1.0 for a single-category group (pinned).

    Exactness is pure integer until one division: ``sum n_i^2`` folds
    exact int64 (headroom ~3e9 rows/group) and ``hhi = float(sum) /
    (float(n) * float(n))`` is the identical expression both engines.
    The :func:`entropy_by_group` plan: in-map (group, category,
    count) partials, ONE groupby over the tiny category domain,
    per-group fold.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"g": b.column(group_col), "c": b.column(cat_col)}
        ).filter(pc.is_valid(b.column(cat_col)))
        out = t.group_by(["g", "c"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "c"]).aggregate([("n", "sum")])
        n_ = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = int(n_.sum())
        ss = int((n_ * n_).sum())
        hhi = float(ss) / (float(n) * float(n)) if n else None
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "ss": pa.array([ss], pa.int64()),
                "hhi": pa.array([hhi], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, cat_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "ss", "hhi"]),
        batch_format="pyarrow",
    )


def hhi_by_group_sql(
    src: str,
    group_col: str = "user_id",
    cat_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`hhi_by_group` — the same integer
    square sum, the same single division."""
    return f"""
WITH c AS (
    SELECT {group_col} AS g, {cat_col} AS c, CAST(count(*) AS BIGINT) AS n
    FROM {src} WHERE {cat_col} IS NOT NULL
    GROUP BY g, c
),
m AS (
    SELECT g, CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(n * n) AS BIGINT) AS ss
    FROM c GROUP BY g
)
SELECT g AS {group_col}, n, ss,
       CASE WHEN n > 0
            THEN CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
       END AS hhi
FROM m
"""


# ---------------------------------------------------------------------------
# Odds ratio / relative risk per group (the 2x2 effect sizes)
# ---------------------------------------------------------------------------


def odds_ratio_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    exposure_col: str = "segment",
    outcome_col: str = "hit",
) -> rd.Dataset:
    """Odds ratio and relative risk of a binary outcome between two
    exposure arms, per group — the 2x2 EFFECT SIZES that
    :func:`chi2_independence` (which only says "dependent") does not
    report: with cells a = exposed&hit, b = exposed&miss, c =
    unexposed&hit, d = unexposed&miss, ``OR = ad/bc`` and ``RR =
    a(c+d) / c(a+b)``.  OR is what logistic regression exponentiates;
    RR is what a clinician quotes.

    Exactness: all four cells fold as exact int64 counts (in-map
    (group, exposure, outcome, count) partials over a 4-cell domain,
    ONE group exchange); both ratios are ONE float division of exact
    integer PRODUCTS formed as Python ints (the HUGEINT mirror — ad
    and bc stay exact at any scale), so the twin matches with no
    epsilon.  A zero denominator (an empty margin or a zero cell)
    emits NULL — the undefined-estimate convention, NOT a continuity
    correction (Haldane-Anscombe is a modeling choice the caller adds
    explicitly).
    """

    def partial(b: pa.Table) -> pa.Table:
        e = b.column(exposure_col).to_numpy(zero_copy_only=False)
        o = b.column(outcome_col).to_numpy(zero_copy_only=False)
        if len(e) and not (np.isin(e, (0, 1)).all() and np.isin(o, (0, 1)).all()):
            raise ValueError(
                "odds_ratio_by_group: exposure and outcome must be 0 or 1"
            )
        t = pa.table(
            {
                "g": b.column(group_col),
                "e": pa.array(e.astype(np.int64), pa.int64()),
                "o": pa.array(o.astype(np.int64), pa.int64()),
            }
        )
        out = t.group_by(["g", "e", "o"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "e", "o", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "e", "o"]).aggregate([("n", "sum")])
        cells = {(0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0}
        for e, o, n in zip(
            merged.column("e").to_pylist(),
            merged.column("o").to_pylist(),
            merged.column("n_sum").to_pylist(),
        ):
            cells[(int(e), int(o))] = int(n)
        a, b_ = cells[(1, 1)], cells[(1, 0)]
        c, d = cells[(0, 1)], cells[(0, 0)]
        odds = float(a * d) / float(b_ * c) if b_ * c > 0 else None
        rr = (
            float(a * (c + d)) / float(c * (a + b_))
            if c * (a + b_) > 0
            else None
        )
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "a": pa.array([a], pa.int64()),
                "b": pa.array([b_], pa.int64()),
                "c": pa.array([c], pa.int64()),
                "d": pa.array([d], pa.int64()),
                "odds_ratio": pa.array([odds], pa.float64()),
                "risk_ratio": pa.array([rr], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, exposure_col, outcome_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "a", "b", "c", "d", "odds_ratio", "risk_ratio"]
        ),
        batch_format="pyarrow",
    )


def odds_ratio_by_group_sql(
    src: str,
    group_col: str = "event_type",
    exposure_col: str = "segment",
    outcome_col: str = "hit",
) -> str:
    """DuckDB oracle for :func:`odds_ratio_by_group` — the same
    cells, the same HUGEINT products, the same NULL conventions."""
    return f"""
WITH m AS (
    SELECT {group_col} AS g,
           CAST(SUM(CASE WHEN {exposure_col} = 1 AND {outcome_col} = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN {exposure_col} = 1 AND {outcome_col} = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN {exposure_col} = 0 AND {outcome_col} = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN {exposure_col} = 0 AND {outcome_col} = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM {src} GROUP BY g
)
SELECT g AS {group_col}, a, b, c, d,
       CASE WHEN b * c > 0
            THEN CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
                 / CAST(CAST(b AS HUGEINT) * c AS DOUBLE)
       END AS odds_ratio,
       CASE WHEN c * (a + b) > 0
            THEN CAST(CAST(a AS HUGEINT) * (c + d) AS DOUBLE)
                 / CAST(CAST(c AS HUGEINT) * (a + b) AS DOUBLE)
       END AS risk_ratio
FROM m
"""


# ---------------------------------------------------------------------------
# Bowley quartile skewness per group (robust asymmetry)
# ---------------------------------------------------------------------------


def bowley_skew_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """Bowley's quartile skewness per group (Bowley 1901) — the
    ROBUST asymmetry readout ``(q3 + q1 - 2*q2) / (q3 - q1)``,
    bounded in [-1, 1] and immune to the tail outliers that swamp the
    moment-based skewness (a single 1e9 spike saturates the third
    moment; it cannot move a quartile).  The asymmetry member of the
    robust family (:func:`mad_outliers_by_group` = spread,
    :func:`gini_by_group` = concentration).

    The exactness class is all-integer until one division: cents,
    all three quartiles by the ceil-rank ORDER-STATISTIC rule
    (ranks ``ceil(n/4), ceil(n/2), ceil(3n/4)`` — actual data
    values), so numerator and denominator are exact int64 and
    ``skew = float(num) / float(den)`` is the identical expression
    both engines; a symmetric multiset measures exactly 0.0 and
    zero-IQR groups (q1 == q3) emit NULL.

    Plan: the :func:`mad_outliers_by_group` exchange — ONE group
    exchange of in-map pre-deduped (cents, count) rows; the fold is
    one sort + cumsum + three searchsorted picks.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)[
            keep
        ]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by(["g", "c"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "c"]).aggregate([("n", "sum")])
        c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        w = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(c)
        c, w = c[order], w[order]
        cum = np.cumsum(w)
        n = int(cum[-1])
        q1 = int(c[np.searchsorted(cum, (n + 3) // 4)])
        q2 = int(c[np.searchsorted(cum, (n + 1) // 2)])
        q3 = int(c[np.searchsorted(cum, (3 * n + 3) // 4)])
        num = q3 + q1 - 2 * q2
        den = q3 - q1
        skew = float(num) / float(den) if den > 0 else None
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "q1_c": pa.array([q1], pa.int64()),
                "q2_c": pa.array([q2], pa.int64()),
                "q3_c": pa.array([q3], pa.int64()),
                "skew": pa.array([skew], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n", "q1_c", "q2_c", "q3_c", "skew"]
        ),
        batch_format="pyarrow",
    )


def bowley_skew_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`bowley_skew_by_group` — the same
    cents, the same ceil-rank quartiles, the same single division."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src} WHERE {value_col} IS NOT NULL
),
nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
cnt AS (SELECT g, c, count(*) AS m FROM t GROUP BY g, c),
cum AS (
    SELECT g, c, sum(m) OVER (PARTITION BY g ORDER BY c) AS cm FROM cnt
),
q AS (
    SELECT nn.g, nn.n,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (nn.n + 3) // 4) AS q1,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (nn.n + 1) // 2) AS q2,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (3 * nn.n + 3) // 4) AS q3
    FROM nn
)
SELECT g AS {group_col}, n,
       CAST(q1 AS BIGINT) AS q1_c, CAST(q2 AS BIGINT) AS q2_c,
       CAST(q3 AS BIGINT) AS q3_c,
       CASE WHEN q3 - q1 > 0
            THEN CAST(q3 + q1 - 2 * q2 AS DOUBLE)
                 / CAST(q3 - q1 AS DOUBLE)
       END AS skew
FROM q
"""


# ---------------------------------------------------------------------------
# Index of dispersion (variance-to-mean of hourly counts) per group
# ---------------------------------------------------------------------------


def dispersion_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Index of dispersion (variance-to-mean ratio) of each group's
    hourly event counts — the Poisson overdispersion test (Fisher
    1950): a memoryless arrival process has VMR = 1; bursty traffic
    (retry storms, batch jobs) is overdispersed (VMR >> 1), a rate
    limiter underdisperses (VMR < 1).  The COUNT-level sibling of
    :func:`hour_uniformity_by_group` (which tests the 24-hour SHAPE;
    this tests the arrival PROCESS over the group's full dense hour
    range).

    The dense-histogram lesson makes this exact WITHOUT a dense join:
    empty hours inside [min_bucket, max_bucket] contribute 0 to both
    the count sum and the square sum, so only ``H = max - min + 1``
    enters as arithmetic — sparse (group, bucket, count) cells are
    sufficient statistics.  ``vmr = (H*ss - s^2) / ((H-1)*s)`` with
    s, ss exact int64 sums and the products formed as Python ints
    (the HUGEINT mirror) — ONE float division; H < 2 or s == 0 emit
    NULL.  In-map partials, one group exchange of sparse cells.
    """
    us_hour = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "g": b.column(group_col),
                "b": pa.array(us // us_hour, pa.int64()),
            }
        )
        out = t.group_by(["g", "b"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "b", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "b"]).aggregate([("n", "sum")])
        bk = merged.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        o = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = int(o.sum())
        ss = sum(int(x) * int(x) for x in o)
        h = int(bk.max() - bk.min() + 1)
        vmr = (
            float(h * ss - s * s) / float((h - 1) * s)
            if h >= 2 and s > 0
            else None
        )
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([s], pa.int64()),
                "n_hours": pa.array([h], pa.int64()),
                "vmr": pa.array([vmr], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, ts_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns([group_col, "n", "n_hours", "vmr"]),
        batch_format="pyarrow",
    )


def dispersion_by_group_sql(
    src: str,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB oracle for :func:`dispersion_by_group` — the same
    sparse sufficient statistics, the same HUGEINT products and
    single division."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, epoch_us({ts_col}) // 3600000000 AS b
    FROM {src}
),
cnt AS (SELECT g, b, CAST(count(*) AS BIGINT) AS o FROM t GROUP BY g, b),
m AS (
    SELECT g, CAST(SUM(o) AS BIGINT) AS s,
           SUM(CAST(o AS HUGEINT) * o) AS ss,
           CAST(max(b) - min(b) + 1 AS BIGINT) AS h
    FROM cnt GROUP BY g
)
SELECT g AS {group_col}, s AS n, h AS n_hours,
       CASE WHEN h >= 2 AND s > 0
            THEN CAST(CAST(h AS HUGEINT) * ss
                      - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(h - 1 AS HUGEINT) * s AS DOUBLE)
       END AS vmr
FROM m
"""


# ---------------------------------------------------------------------------
# Pareto vital-few analysis (min users covering a value share)
# ---------------------------------------------------------------------------

PARETO_NUM = 4
PARETO_DEN = 5  # 4/5 = the 80% of 80/20


def pareto_vital_few(
    ds: rd.Dataset,
    group_col: str = "user_id",
    value_col: str = "value",
    share_num: int = PARETO_NUM,
    share_den: int = PARETO_DEN,
) -> pa.Table:
    """The Pareto "vital few": the MINIMUM number of groups (users)
    whose combined value covers ``share_num/share_den`` of the total
    — "how many whales carry 80% of revenue", the concentration
    headcount :func:`gini_by_group` (a coefficient) does not answer.

    Exactness is pure integer: per-user totals fold as exact cents;
    the walk is over the HISTOGRAM of totals (value-cents ->
    (n_users, mass) buckets — the Gini device), descending; the
    80%-crossing test is the cross-multiplied ``den*cum >= num*T``
    (no division), and the partial-bucket headcount is an integer
    ceiling ``ceil((num*T - den*cum_prior) / (den*v))`` — every user
    inside a bucket has the SAME total, so the answer is independent
    of intra-bucket order (the same argument that makes the twin's
    user-id tiebreak irrelevant).  Output one row: (n_users, k,
    k_ppm).  Nothing user-sized reaches the driver — only the totals
    histogram (<= distinct totals).  Negative values refused (a
    Lorenz-style construction needs a non-negative measure); zero
    total emits NULL k.
    """
    if not (0 < share_num < share_den):
        raise ValueError("share must satisfy 0 < num < den")

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        if (v[keep] < 0).any():
            raise ValueError("pareto_vital_few: negative values")
        c = np.floor(v * 100 + 0.5).astype(np.int64)[keep]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by(["g"]).aggregate([("c", "sum")])
        return out.rename_columns(["g", "c"])

    totals = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(Sum("c", alias_name="c"))
        # materialize: the downstream groupby's schema inference would
        # otherwise re-execute this whole exchange (the region_revenue
        # lazy-rechaining stall, measured 24 s -> ~5 s here)
        .materialize()
    )

    def hist(b: pa.Table) -> pa.Table:
        vc = b.column("c").value_counts()
        return pa.table(
            {
                "c": vc.field("values").cast(pa.int64()),
                "m": vc.field("counts").cast(pa.int64()),
            }
        )

    hrows = (
        totals.map_batches(hist, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("m", alias_name="m"))
    )
    import ray as _ray

    tabs = [t for t in _ray.get(hrows.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "n_users": pa.array([0], pa.int64()),
            "k": pa.array([None], pa.int64()),
            "k_ppm": pa.array([None], pa.int64()),
        }
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    cs = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    ms = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(-cs)
    cs, ms = cs[order], ms[order]
    n_users = int(ms.sum())
    total = sum(int(c) * int(m) for c, m in zip(cs, ms))
    if total <= 0:
        return pa.table(
            {
                "n_users": pa.array([n_users], pa.int64()),
                "k": pa.array([None], pa.int64()),
                "k_ppm": pa.array([None], pa.int64()),
            }
        )
    need = share_num * total  # compare den*cum >= num*T scaled
    cum = 0
    k = 0
    for c, m in zip(cs, ms):
        c, m = int(c), int(m)
        bucket_mass = c * m
        if share_den * (cum + bucket_mass) >= need:
            remain = need - share_den * cum
            k += -(-remain // (share_den * c))  # ceil div, exact ints
            break
        cum += bucket_mass
        k += m
    k_ppm = int(np.floor(k * 1_000_000.0 / n_users + 0.5))
    return pa.table(
        {
            "n_users": pa.array([n_users], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "k_ppm": pa.array([k_ppm], pa.int64()),
        }
    )


def pareto_vital_few_sql(
    src: str,
    group_col: str = "user_id",
    value_col: str = "value",
    share_num: int = PARETO_NUM,
    share_den: int = PARETO_DEN,
) -> str:
    """DuckDB oracle for :func:`pareto_vital_few` — the explicit
    descending cumsum with the same cross-multiplied crossing test."""
    return f"""
WITH tot AS (
    SELECT {group_col} AS g,
           CAST(SUM(CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)
               AS c
    FROM {src} WHERE {value_col} IS NOT NULL
    GROUP BY g
),
ranked AS (
    SELECT c,
           SUM(c) OVER (ORDER BY c DESC, g ASC
                        ROWS UNBOUNDED PRECEDING) AS cum,
           row_number() OVER (ORDER BY c DESC, g ASC) AS rn
    FROM tot
),
tt AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
              CAST(count(*) AS BIGINT) AS n FROM tot)
SELECT tt.n AS n_users,
       CASE WHEN tt.total > 0
            THEN (SELECT CAST(min(rn) AS BIGINT) FROM ranked
                  WHERE {share_den} * cum >= {share_num} * tt.total)
       END AS k,
       CASE WHEN tt.total > 0
            THEN CAST(floor((SELECT min(rn) FROM ranked
                             WHERE {share_den} * cum
                                   >= {share_num} * tt.total)
                            * 1000000.0 / tt.n + 0.5) AS BIGINT)
       END AS k_ppm
FROM tt
"""


# ---------------------------------------------------------------------------
# Behavioral signatures (ordered string aggregation + segmentation)
# ---------------------------------------------------------------------------


def behavior_signatures(
    ds: rd.Dataset,
    group_col: str = "user_id",
    cat_col: str = "event_type",
) -> rd.Dataset:
    """Behavioral segmentation by DISTINCT-SORTED category signature —
    SQL's ``string_agg(DISTINCT x, ',' ORDER BY x)`` made a
    first-class operator: each user reduces to the comma-joined
    sorted set of event types they perform ("browser" =
    'click,view', "full-funnel" = 'click,purchase,signup,view'), and
    the output is one row per signature with its user count — the
    segmentation table every lifecycle-marketing query starts from.

    The ORDER BY inside the aggregate is the contract: an unordered
    string_agg is block-order-dependent (the mode lesson for
    strings).  Exactness: the signature is a deterministic pure
    function of the user's category SET (sorted join — no floats, no
    ambiguity), counts exact int64.  Plan: in-map (user, category)
    distinct partials, ONE user groupby whose fold emits the joined
    signature, in-map signature counts, one tiny signature groupby.
    """

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"g": b.column(group_col), "c": b.column(cat_col)}
        ).filter(pc.is_valid(b.column(cat_col)))
        return t.group_by(["g", "c"]).aggregate([]).rename_columns(
            ["g", "c"]
        )

    def fold(grp: pa.Table) -> pa.Table:
        cats = sorted(set(grp.column("c").to_pylist()))
        return pa.table(
            {
                "sig": pa.array([",".join(cats)], pa.string()),
                "n": pa.array([1], pa.int64()),
            }
        )

    def sig_partial(b: pa.Table) -> pa.Table:
        out = b.group_by(["sig"]).aggregate([("n", "sum")])
        return out.rename_columns(["sig", "n"])

    return (
        ds.select_columns([group_col, cat_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
        .map_batches(sig_partial, batch_format="pyarrow")
        .groupby("sig")
        .aggregate(Sum("n", alias_name="n_users"))
        .map_batches(
            lambda t: t.rename_columns(["signature", "n_users"]),
            batch_format="pyarrow",
        )
    )


def behavior_signatures_sql(
    src: str,
    group_col: str = "user_id",
    cat_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`behavior_signatures` — the literal
    ordered string_agg(DISTINCT) + count."""
    return f"""
WITH sig AS (
    SELECT {group_col} AS g,
           string_agg(DISTINCT {cat_col}, ',' ORDER BY {cat_col})
               AS signature
    FROM {src} WHERE {cat_col} IS NOT NULL
    GROUP BY g
)
SELECT signature, CAST(count(*) AS BIGINT) AS n_users
FROM sig GROUP BY signature
"""


# ---------------------------------------------------------------------------
# Tukey-fence (boxplot) outlier audit per group
# ---------------------------------------------------------------------------


def tukey_outliers_by_group(
    ds: rd.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
) -> rd.Dataset:
    """Tukey's boxplot-fence outlier audit per group (Tukey 1977) —
    the third member of the robust-outlier family: the z-score
    (moments), MAD (median-centered) and now the FENCES ``[q1 -
    1.5*IQR, q3 + 1.5*IQR]`` every boxplot draws.  Output per group:
    the quartiles, both fence-breach counts and n.

    The fence test is PURE INTEGER — the 1.5 factor clears by
    doubling: ``v < q1 - 1.5*IQR  <=>  2*c < 5*q1 - 3*q3`` (and
    ``2*c > 5*q3 - 3*q1`` above), so breaches compare exact int64
    cents with no float anywhere — the mad_outliers exactness class.
    Quartiles by the ceil-rank order-statistic rule; the
    :func:`bowley_skew_by_group` exchange verbatim.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        keep = ~np.isnan(v) if v.dtype.kind == "f" else np.ones(len(v), bool)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)[
            keep
        ]
        t = pa.table(
            {
                "g": b.column(group_col).filter(pa.array(keep)),
                "c": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by(["g", "c"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "c", "n"])

    def fold(grp: pa.Table) -> pa.Table:
        merged = grp.group_by(["g", "c"]).aggregate([("n", "sum")])
        c = merged.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        w = merged.column("n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(c)
        c, w = c[order], w[order]
        cum = np.cumsum(w)
        n = int(cum[-1])
        q1 = int(c[np.searchsorted(cum, (n + 3) // 4)])
        q3 = int(c[np.searchsorted(cum, (3 * n + 3) // 4)])
        low = int(w[2 * c < 5 * q1 - 3 * q3].sum())
        high = int(w[2 * c > 5 * q3 - 3 * q1].sum())
        return pa.table(
            {
                "g": grp.column("g").slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "q1_c": pa.array([q1], pa.int64()),
                "q3_c": pa.array([q3], pa.int64()),
                "n_low": pa.array([low], pa.int64()),
                "n_high": pa.array([high], pa.int64()),
            }
        )

    out = (
        ds.select_columns([group_col, value_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n", "q1_c", "q3_c", "n_low", "n_high"]
        ),
        batch_format="pyarrow",
    )


def tukey_outliers_by_group_sql(
    src: str,
    group_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB oracle for :func:`tukey_outliers_by_group` — the same
    ceil-rank quartiles, the same doubled integer fence tests."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g,
           CAST(round({value_col} * 100) AS BIGINT) AS c
    FROM {src} WHERE {value_col} IS NOT NULL
),
nn AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY g),
cnt AS (SELECT g, c, count(*) AS m FROM t GROUP BY g, c),
cum AS (
    SELECT g, c, sum(m) OVER (PARTITION BY g ORDER BY c) AS cm FROM cnt
),
q AS (
    SELECT nn.g, nn.n,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (nn.n + 3) // 4) AS q1,
           (SELECT min(c) FROM cum
            WHERE cum.g = nn.g AND cm >= (3 * nn.n + 3) // 4) AS q3
    FROM nn
)
SELECT q.g AS {group_col}, q.n,
       CAST(q.q1 AS BIGINT) AS q1_c, CAST(q.q3 AS BIGINT) AS q3_c,
       CAST((SELECT count(*) FROM t
             WHERE t.g = q.g AND 2 * t.c < 5 * q.q1 - 3 * q.q3)
            AS BIGINT) AS n_low,
       CAST((SELECT count(*) FROM t
             WHERE t.g = q.g AND 2 * t.c > 5 * q.q3 - 3 * q.q1)
            AS BIGINT) AS n_high
FROM q
"""
