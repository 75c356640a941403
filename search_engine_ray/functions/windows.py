"""Windowed aggregates + sessionization over the ``events`` table —
the time-bucketed operators a transcript/training-data pipeline needs that
the reference lacks (SURVEY.md §2.9: the reference has no streaming
features; these are the batch-equivalent window semantics, implemented
per the prompt's custom-operator recipe (a): composition of map_batches
+ groupby, with the partitioning assumption documented per op).

Scale notes:
- tumbling_window: the bucket key is computed IN-MAP (epoch // width), so
  the only shuffle is the groupby on (bucket, event_type) — pre-bucketed
  rows combine map-side via Ray's partial aggregation.
- session_windows: ONE shuffle on user_id; per-user gap-splitting is a
  vectorized map_groups (sessions never span users — the documented
  partitioning assumption; at 10^12 events a hot user needs time-range
  salting plus a driver-side merge of boundary sessions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

WINDOW_MINUTES = 60
SESSION_GAP_MINUTES = 30
_ROUND = 6


def _r(x: np.ndarray) -> np.ndarray:
    """Round half away from zero at ``_ROUND`` decimals — bit-identical
    to DuckDB ``round`` (np.round is half-even and disagrees on .5s)."""
    return np.floor(np.abs(x) * 10.0**_ROUND + 0.5) / 10.0**_ROUND * np.sign(x)


def tumbling_window(
    ds: rd.Dataset, width_minutes: int = WINDOW_MINUTES
) -> rd.Dataset:
    """Per (window, event_type) aggregates: n, sum/mean of value.
    Window start = floor(ts / width). Bucket key computed map-side."""
    width_us = width_minutes * 60 * 1_000_000

    def add_bucket(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        start = pc.multiply(pc.divide(us, width_us), width_us)
        return pa.table(
            {
                "window_start": start.cast(pa.timestamp("us")),
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="mean_value"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        for col in ("sum_value", "mean_value"):
            x = b.column(col).to_numpy(zero_copy_only=False)
            b = b.set_column(
                b.schema.get_field_index(col), col, pa.array(_r(x), pa.float64())
            )
        return b

    return out.map_batches(finish, batch_format="pyarrow")


def tumbling_window_sql(src: str, width_minutes: int = WINDOW_MINUTES) -> str:
    width_us = width_minutes * 60 * 1_000_000
    return f"""
SELECT make_timestamp((epoch_us(ts) // {width_us}) * {width_us}) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {_ROUND}) AS sum_value,
       round(avg(value), {_ROUND}) AS mean_value
FROM {src}
GROUP BY 1, 2
"""


SLIDE_WIDTH_MINUTES = 60
SLIDE_HOP_MINUTES = 15


def sliding_window(
    ds: rd.Dataset,
    width_minutes: int = SLIDE_WIDTH_MINUTES,
    hop_minutes: int = SLIDE_HOP_MINUTES,
) -> rd.Dataset:
    """Hopping-window aggregates: every event lands in width/hop
    overlapping windows (width must be a hop multiple). The k-fold
    expansion happens IN-MAP (np.repeat + tiled hop offsets), so — as
    with tumbling — the only shuffle is the (window, type) groupby and
    rows combine map-side. Payload grows k-fold; pick hop accordingly."""
    width_us = width_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    if width_us % hop_us:
        raise ValueError("width must be a multiple of hop")
    k = width_us // hop_us

    def expand(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy()
        last = (us // hop_us) * hop_us  # latest window containing ts
        idx = np.repeat(np.arange(len(us)), k)
        starts = np.repeat(last, k) - np.tile(np.arange(k) * hop_us, len(us))
        return pa.table(
            {
                "window_start": pa.array(starts, pa.int64()).cast(pa.timestamp("us")),
                "event_type": b.column("event_type").take(pa.array(idx, pa.int64())),
                "value": b.column("value").take(pa.array(idx, pa.int64())),
            }
        )

    out = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
            Mean("value", alias_name="mean_value"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        for col in ("sum_value", "mean_value"):
            x = b.column(col).to_numpy(zero_copy_only=False)
            b = b.set_column(
                b.schema.get_field_index(col), col, pa.array(_r(x), pa.float64())
            )
        return b

    return out.map_batches(finish, batch_format="pyarrow")


def sliding_window_sql(
    src: str,
    width_minutes: int = SLIDE_WIDTH_MINUTES,
    hop_minutes: int = SLIDE_HOP_MINUTES,
) -> str:
    width_us = width_minutes * 60 * 1_000_000
    hop_us = hop_minutes * 60 * 1_000_000
    k = width_us // hop_us
    return f"""
SELECT make_timestamp(s) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {_ROUND}) AS sum_value,
       round(avg(value), {_ROUND}) AS mean_value
FROM {src},
     LATERAL (SELECT unnest(generate_series(
         (epoch_us(ts) // {hop_us}) * {hop_us} - {(k - 1) * hop_us},
         (epoch_us(ts) // {hop_us}) * {hop_us},
         {hop_us})) AS s)
GROUP BY 1, 2
"""


def session_windows(
    ds: rd.Dataset, gap_minutes: int = SESSION_GAP_MINUTES
) -> rd.Dataset:
    """Per-user sessions split at inactivity gaps > ``gap_minutes``:
    (user_id, session_start, session_end, n_events, sum_value).
    One shuffle (groupby user_id); the split is vectorized per group."""
    gap_us = gap_minutes * 60 * 1_000_000

    def split(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("ts"))
        g = group.take(order)
        us = g.column("ts").cast(pa.int64()).to_numpy()
        val = g.column("value").to_numpy(zero_copy_only=False)
        new_sess = np.concatenate(([True], np.diff(us) > gap_us))
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(us))
        n = ends - starts
        return pa.table(
            {
                "user_id": pa.array(
                    np.repeat(g.column("user_id")[0].as_py(), len(starts)), pa.int64()
                ),
                "session_start": pa.array(us[starts], pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(us[ends - 1], pa.int64()).cast(pa.timestamp("us")),
                "n_events": pa.array(n, pa.int64()),
                "sum_value": pa.array(
                    _r(np.add.reduceat(val, starts)), pa.float64()
                ),
            }
        )

    return (
        ds.select_columns(["user_id", "ts", "value"])
        # parquet files carry pandas schema metadata (a dict) that Ray's
        # groupby reduce cannot hash for schema dedup — strip it so the
        # shuffle combines blocks without per-reduce warnings
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(split, batch_format="pyarrow")
    )


def session_windows_salted(
    ds: rd.Dataset,
    gap_minutes: int = SESSION_GAP_MINUTES,
    salt_hours: int = 24,
) -> rd.Dataset:
    """Hot-user-safe sessionization — the scale path the plain
    ``session_windows`` docstring promises. The shuffle key is
    ``(user_id, time bucket)`` so one hot user spreads over many groups;
    per-bucket sessions are computed as usual, then ONLY the first/last
    session of each bucket (the boundary set, O(users x buckets) rows ≪
    events) goes through a second, tiny user-keyed merge that stitches
    sessions whose cross-bucket gap is <= the threshold. Two sessions
    inside one bucket are > gap apart by construction, so the sorted
    sweep can only merge across buckets — output is EXACTLY
    ``session_windows`` (equality pinned by test and the shared SQL
    oracle). Sums stay unrounded until the final emit so merged chains
    round once, like the oracle."""
    gap_us = gap_minutes * 60 * 1_000_000
    salt_us = salt_hours * 3_600 * 1_000_000
    if salt_us <= gap_us:
        raise ValueError("salt span must exceed the session gap")

    def add_bucket(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "bucket": pc.divide(us, salt_us),
                "ts": b.column("ts"),
                "value": b.column("value"),
            }
        ).replace_schema_metadata(None)

    def split(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("ts"))
        g = group.take(order)
        us = g.column("ts").cast(pa.int64()).to_numpy()
        val = g.column("value").to_numpy(zero_copy_only=False)
        new_sess = np.concatenate(([True], np.diff(us) > gap_us))
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(us))
        k = len(starts)
        boundary = np.zeros(k, bool)
        boundary[0] = boundary[-1] = True
        return pa.table(
            {
                "user_id": pa.array(
                    np.repeat(g.column("user_id")[0].as_py(), k), pa.int64()
                ),
                "session_start": pa.array(us[starts], pa.int64()),
                "session_end": pa.array(us[ends - 1], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "sum_value": pa.array(np.add.reduceat(val, starts), pa.float64()),
                "boundary": pa.array(boundary, pa.bool_()),
            }
        )

    sess = (
        ds.select_columns(["user_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(split, batch_format="pyarrow")
        # two consumers below — materialize the (session-level, tiny
        # vs events) intermediate so the groupby doesn't execute twice
        .materialize()
    )
    def _keep(flag: bool):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("boundary"), flag))

        return f

    interior = sess.map_batches(_keep(False), batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("session_start"))
        g = group.take(order)
        s = g.column("session_start").to_numpy()
        e = g.column("session_end").to_numpy()
        n = g.column("n_events").to_numpy()
        v = g.column("sum_value").to_numpy(zero_copy_only=False)
        new_chain = np.concatenate(([True], s[1:] - e[:-1] > gap_us))
        heads = np.flatnonzero(new_chain)
        tails = np.append(heads[1:], len(s))
        return pa.table(
            {
                "user_id": pa.array(
                    np.repeat(g.column("user_id")[0].as_py(), len(heads)), pa.int64()
                ),
                "session_start": pa.array(s[heads], pa.int64()),
                "session_end": pa.array(e[tails - 1], pa.int64()),
                "n_events": pa.array(np.add.reduceat(n, heads), pa.int64()),
                "sum_value": pa.array(np.add.reduceat(v, heads), pa.float64()),
                "boundary": pa.array(np.zeros(len(heads), bool), pa.bool_()),
            }
        )

    stitched = (
        sess.map_batches(_keep(True), batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(merge, batch_format="pyarrow")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "session_start": b.column("session_start").cast(pa.timestamp("us")),
                "session_end": b.column("session_end").cast(pa.timestamp("us")),
                "n_events": b.column("n_events"),
                "sum_value": pa.array(
                    _r(b.column("sum_value").to_numpy(zero_copy_only=False)),
                    pa.float64(),
                ),
            }
        )

    return interior.union(stitched).map_batches(finish, batch_format="pyarrow")


def session_windows_sql(src: str, gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH ordered AS (
    SELECT user_id, ts, value,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts) > {gap_us}
                THEN 1 ELSE 0 END AS is_new
    FROM {src}
),
tagged AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS UNBOUNDED PRECEDING) AS sess
    FROM ordered
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {_ROUND}) AS sum_value
FROM tagged GROUP BY user_id, sess
"""


# ---------------------------------------------------------------------------
# Funnel analysis (ordered event-sequence completion per user)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "view", "purchase")


def funnel(
    ds: rd.Dataset,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Strict-sequence funnel — the product-analytics primitive (which
    users did signup THEN view THEN purchase, in order): per user, the
    GREEDY-EARLIEST chain over the (ts, event_id) total order — step 1
    matches the user's first step-1 event, step k the first step-k
    event strictly after step k-1's match.  With no conversion window,
    greedy-earliest is optimal (the minimal valid next occurrence
    maximizes what can still follow — the span_first argument), so
    "completed k steps" is a well-defined property of the event set,
    not of scan order.  -> one row per user: (user, steps_completed,
    ts_1..ts_k nullable step timestamps).

    One shuffle (groupby user — the sessionization exchange); the
    per-group scan is a k-pass flatnonzero over the sorted order, k =
    len(steps).  Repeated step names are allowed (signup -> view ->
    view = two distinct views); empty steps refused."""
    steps = tuple(steps)
    if not steps or any(not s for s in steps):
        raise ValueError("steps must be a non-empty tuple of event types")
    k = len(steps)

    def scan(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        types = np.asarray(g.column(type_col).to_pylist(), dtype=object)
        us = g.column(ts_col).cast(pa.int64()).to_numpy()
        hit_ts: list[int | None] = []
        pos = -1
        for s in steps:
            idxs = np.flatnonzero(types == s)
            idxs = idxs[idxs > pos]
            if len(idxs) == 0:
                break
            pos = int(idxs[0])
            hit_ts.append(int(us[pos]))
        done = len(hit_ts)
        cols = {
            user_col: pa.array([g.column(user_col)[0].as_py()], pa.int64()),
            "steps_completed": pa.array([done], pa.int64()),
        }
        for j in range(k):
            cols[f"ts_{j + 1}"] = pa.array(
                [hit_ts[j] if j < done else None], pa.int64()
            ).cast(pa.timestamp("us"))
        return pa.table(cols)

    return (
        ds.select_columns([user_col, ts_col, type_col, id_col])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(user_col)
        .map_groups(scan, batch_format="pyarrow")
    )


def funnel_sql(
    src: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`funnel`: chained row_number CTEs — step
    k's candidates join strictly after step k-1's match in the same
    (ts, event_id) order, rn = 1 is the greedy-earliest pick."""
    steps = tuple(steps)
    if not steps or any(not s for s in steps):
        raise ValueError("steps must be a non-empty tuple of event types")
    ctes = []
    for j, s in enumerate(steps, start=1):
        if j == 1:
            body = f"""
    SELECT {user_col}, ts, {id_col} FROM (
        SELECT {user_col}, ts, {id_col},
               row_number() OVER (
                   PARTITION BY {user_col} ORDER BY ts, {id_col}) AS rn
        FROM {src} WHERE event_type = '{s}'
    ) WHERE rn = 1"""
        else:
            body = f"""
    SELECT {user_col}, ts, {id_col} FROM (
        SELECT e.{user_col}, e.ts, e.{id_col},
               row_number() OVER (
                   PARTITION BY e.{user_col} ORDER BY e.ts, e.{id_col}) AS rn
        FROM {src} e
        JOIN s{j - 1} p ON p.{user_col} = e.{user_col}
         AND (e.ts > p.ts OR (e.ts = p.ts AND e.{id_col} > p.{id_col}))
        WHERE e.event_type = '{s}'
    ) WHERE rn = 1"""
        ctes.append(f"s{j} AS ({body}\n)")
    ts_cols = ",\n       ".join(
        f"s{j}.ts AS ts_{j}" for j in range(1, len(steps) + 1)
    )
    depth = " ".join(
        f"WHEN s{j}.{user_col} IS NOT NULL THEN {j}"
        for j in range(len(steps), 0, -1)
    )
    joins = "\n".join(
        f"LEFT JOIN s{j} ON s{j}.{user_col} = u.{user_col}"
        for j in range(1, len(steps) + 1)
    )
    return f"""
WITH {",".join(ctes)},
users AS (SELECT DISTINCT {user_col} FROM {src})
SELECT u.{user_col},
       CAST(CASE {depth} ELSE 0 END AS BIGINT) AS steps_completed,
       {ts_cols}
FROM users u
{joins}
"""


# ---------------------------------------------------------------------------
# Cohort retention (distinct active users per cohort-day x day-offset)
# ---------------------------------------------------------------------------

RETENTION_ANCHOR = "signup"
RETENTION_HORIZON_DAYS = 14


def retention(
    ds: rd.Dataset,
    anchor: str = RETENTION_ANCHOR,
    horizon_days: int = RETENTION_HORIZON_DAYS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Cohort retention — the other half of the product-analytics pair
    (:func:`funnel` answers "did the sequence happen", this answers
    "did they come back"): a user's cohort is the UTC day of their
    FIRST ``anchor`` event; for each day offset 0..horizon the user is
    RETAINED iff they have ANY event on cohort_day + offset.  -> one
    row per (cohort_day, day_offset) with the DISTINCT-user count —
    exact integers, so counts merge additively across shards (users
    are cohort-unique) and the SQL twin matches bit-for-bit.

    Shape: ONE user-key shuffle; each group reduces to its <= horizon+1
    (cohort, offset, 1) pairs in one vectorized pass (epoch-day
    arithmetic on int64 — no calendar library), then a tiny groupby
    sums — the exchange after the user shuffle is cohort x horizon
    sized, never event-sized.  Users with no anchor event contribute
    nothing (they have no cohort)."""
    from ray.data.aggregate import Sum

    h = int(horizon_days)
    if h < 0:
        raise ValueError(f"horizon_days must be >= 0, got {horizon_days}")
    if not anchor:
        raise ValueError("anchor event type must be non-empty")
    us_day = 86_400_000_000

    def per_user(group: pa.Table) -> pa.Table:
        us = group.column(ts_col).cast(pa.int64()).to_numpy()
        types = np.asarray(group.column(type_col).to_pylist(), dtype=object)
        anch = us[types == anchor]
        if len(anch) == 0:
            return pa.table({
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        cohort = int(anch.min()) // us_day
        offs = np.unique(us // us_day - cohort)
        offs = offs[(offs >= 0) & (offs <= h)]
        return pa.table({
            "cohort_day": pa.array(np.full(len(offs), cohort), pa.int64()),
            "day_offset": pa.array(offs, pa.int64()),
            "n": pa.array(np.ones(len(offs), np.int64)),
        })

    counted = (
        ds.select_columns([user_col, ts_col, type_col])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(user_col)
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_day": pc.multiply(
                b.column("cohort_day"), pa.scalar(us_day, pa.int64())
            ).cast(pa.timestamp("us")),
            "day_offset": b.column("day_offset").cast(pa.int64()),
            "n_users": b.column("n_users").cast(pa.int64()),
        })

    return counted.map_batches(finish, batch_format="pyarrow")


def retention_sql(
    src: str,
    anchor: str = RETENTION_ANCHOR,
    horizon_days: int = RETENTION_HORIZON_DAYS,
    user_col: str = "user_id",
) -> str:
    """DuckDB oracle for :func:`retention`: first-anchor epoch-day per
    user (the same int64 floor-division day rule — no calendar
    functions, so both engines share the arithmetic), day offsets via
    the same subtraction, COUNT(DISTINCT user)."""
    h = int(horizon_days)
    if h < 0:
        raise ValueError(f"horizon_days must be >= 0, got {horizon_days}")
    if not anchor:
        raise ValueError("anchor event type must be non-empty")
    return f"""
WITH cohorts AS (
    SELECT {user_col},
           min(epoch_us(ts)) // 86400000000 AS cohort_day
    FROM {src} WHERE event_type = '{anchor}' GROUP BY 1
),
hits AS (
    SELECT DISTINCT c.{user_col}, c.cohort_day,
           epoch_us(e.ts) // 86400000000 - c.cohort_day AS day_offset
    FROM {src} e JOIN cohorts c ON c.{user_col} = e.{user_col}
)
SELECT make_timestamp(CAST(cohort_day * 86400000000 AS BIGINT)) AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM hits
WHERE day_offset BETWEEN 0 AND {h}
GROUP BY 1, 2
"""


FUNNEL_WINDOW_MINUTES = 720


def funnel_windowed(
    ds: rd.Dataset,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_minutes: int = FUNNEL_WINDOW_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> rd.Dataset:
    """Conversion-window funnel (the ClickHouse ``windowFunnel``
    semantics): a user's LEVEL is the deepest k such that an ordered
    chain step_1 < ... < step_k exists with EVERY matched event inside
    ``[t_anchor, t_anchor + window]`` of its own step-1 anchor
    (inclusive edge).  Unlike :func:`funnel` (unwindowed, single
    greedy chain), every step-1 event is a candidate ANCHOR — and for
    a FIXED anchor greedy-earliest intermediate choices are optimal
    (all window constraints reference the anchor, so the minimal valid
    next event dominates), which makes per-anchor greedy EXACTLY the
    exists-a-chain semantics, order-free and well-defined.
    -> one row per user: (user, level) with level 0 when no anchor.

    Same ONE user-key shuffle; the per-group scan vectorizes across
    anchors (one searchsorted per step per group) — O(k · anchors ·
    log n) per user, never a per-event Python loop."""
    steps = tuple(steps)
    if not steps or any(not s for s in steps):
        raise ValueError("steps must be a non-empty tuple of event types")
    w_us = int(window_minutes) * 60 * 1_000_000
    if w_us <= 0:
        raise ValueError(
            f"window_minutes must be >= 1, got {window_minutes}")
    k = len(steps)

    def scan(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(order)
        types = np.asarray(g.column(type_col).to_pylist(), dtype=object)
        us = g.column(ts_col).cast(pa.int64()).to_numpy()
        uid = g.column(user_col)[0].as_py()
        anchors = np.flatnonzero(types == steps[0])
        if len(anchors) == 0:
            return pa.table({
                user_col: pa.array([uid], pa.int64()),
                "level": pa.array([0], pa.int64()),
            })
        t1 = us[anchors]
        cur = anchors.copy()
        level = np.ones(len(anchors), np.int64)
        alive = np.ones(len(anchors), bool)
        for s in steps[1:]:
            pos_s = np.flatnonzero(types == s)
            if len(pos_s) == 0:
                break
            nxt = np.searchsorted(pos_s, cur[alive], side="right")
            has = nxt < len(pos_s)
            cand = pos_s[np.minimum(nxt, len(pos_s) - 1)]
            # the EARLIEST candidate failing the window means all later
            # ones do too (us is nondecreasing in position)
            ok = has & (us[cand] <= t1[alive] + w_us)
            idx = np.flatnonzero(alive)
            cur[idx[ok]] = cand[ok]
            level[idx[ok]] += 1
            alive[idx[~ok]] = False
            if not alive.any():
                break
        return pa.table({
            user_col: pa.array([uid], pa.int64()),
            "level": pa.array([int(level.max())], pa.int64()),
        })

    return (
        ds.select_columns([user_col, ts_col, type_col, id_col])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(user_col)
        .map_groups(scan, batch_format="pyarrow")
    )


def funnel_windowed_sql(
    src: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_minutes: int = FUNNEL_WINDOW_MINUTES,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> str:
    """DuckDB oracle for :func:`funnel_windowed`: anchor CTE = every
    step-1 event; per anchor a chained greedy row_number pick per step,
    each join carrying the strictly-after (ts, id) rule AND the
    anchor-window bound; level = greatest reached depth per user."""
    steps = tuple(steps)
    if not steps or any(not s for s in steps):
        raise ValueError("steps must be a non-empty tuple of event types")
    w_us = int(window_minutes) * 60 * 1_000_000
    if w_us <= 0:
        raise ValueError(
            f"window_minutes must be >= 1, got {window_minutes}")
    ctes = [f"""c1 AS (
    SELECT {user_col}, epoch_us(ts) AS t1, {id_col} AS e1,
           epoch_us(ts) AS tp, {id_col} AS ep
    FROM {src} WHERE event_type = '{steps[0]}'
)"""]
    for j, s in enumerate(steps[1:], start=2):
        ctes.append(f"""c{j} AS (
    SELECT {user_col}, t1, e1, tp, ep FROM (
        SELECT c.{user_col}, c.t1, c.e1,
               epoch_us(e.ts) AS tp, e.{id_col} AS ep,
               row_number() OVER (
                   PARTITION BY c.{user_col}, c.t1, c.e1
                   ORDER BY e.ts, e.{id_col}) AS rn
        FROM c{j - 1} c
        JOIN {src} e ON e.{user_col} = c.{user_col}
         AND (epoch_us(e.ts) > c.tp
              OR (epoch_us(e.ts) = c.tp AND e.{id_col} > c.ep))
         AND epoch_us(e.ts) <= c.t1 + {w_us}
        WHERE e.event_type = '{s}'
    ) WHERE rn = 1
)""")
    depth = ", ".join(
        f"CASE WHEN EXISTS (SELECT 1 FROM c{j} WHERE c{j}.{user_col} = u.{user_col}) "
        f"THEN {j} ELSE 0 END"
        for j in range(1, len(steps) + 1)
    )
    return f"""
WITH {",".join(ctes)}
SELECT u.{user_col}, CAST(greatest({depth}) AS BIGINT) AS level
FROM (SELECT DISTINCT {user_col} FROM {src}) u
"""


# ---------------------------------------------------------------------------
# Per-key running window functions (SQL OVER (PARTITION BY ... ORDER BY ...))
# ---------------------------------------------------------------------------

_MICRO = 1_000_000  # run_sum quantization: micro-units -> exact int64 fold


def running_window(ds: rd.Dataset) -> rd.Dataset:
    """SQL window functions per user — ``row_number()``, ``lag(value)``,
    running ``SUM`` and running ``MAX`` over
    ``PARTITION BY user_id ORDER BY ts, event_id`` — the per-key
    sequential-state primitive (feature engineering: "events so far",
    "previous value", "best so far") that a groupby-aggregate cannot
    express because the OUTPUT is per-row, not per-group.

    Plan: ONE shuffle (``groupby(user_id)``), then each group sorts by
    ``(ts, event_id)`` (the deterministic tiebreak) and computes all
    four outputs vectorized — ``np.arange`` / slice-shift /
    ``np.cumsum`` / ``np.maximum.accumulate``; no per-row Python.  The
    partitioning assumption is the same as :func:`session_windows`
    (per-key state never spans keys); a hot key needs the salted
    time-range split + carry-in merge, which running state makes
    sequential — the documented scale path is range-partition by
    (user, ts) and fold per-range prefix states left-to-right (a
    two-pass scan, still no all-pairs).

    Exactness device: the running sum is folded in int64 MICRO-UNITS —
    ``round(value * 1e6)`` half-away-from-zero per row, then integer
    prefix sums — because float prefix sums are association-ordered and
    DuckDB's windowed SUM need not add in the same order; integers
    make both sides bit-exact.  ``lag``/``max`` pass raw doubles
    through untouched (comparison/copy only, no arithmetic).
    """

    def per_user(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = group.take(order)
        n = g.num_rows
        val = g.column("value").to_numpy(zero_copy_only=False)
        micro = (np.floor(np.abs(val) * _MICRO + 0.5) * np.sign(val)).astype(
            np.int64
        )
        lag = np.empty(n, np.float64)
        lag[1:] = val[:-1]
        lag_validity = np.ones(n, bool)
        lag_validity[0] = False
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_id": g.column("event_id"),
                "ts": g.column("ts"),
                "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "lag_value": pa.array(lag, pa.float64(), mask=~lag_validity),
                "run_sum_micro": pa.array(np.cumsum(micro), pa.int64()),
                "run_max": pa.array(
                    np.maximum.accumulate(val), pa.float64()
                ),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def running_window_sql(src: str) -> str:
    """DuckDB oracle for :func:`running_window` — the literal window
    functions, with the identical micro-unit quantization inside the
    running SUM (so integer prefix sums compare bit-exact) and an
    explicit ROWS frame (ties are impossible under the (ts, event_id)
    order, but RANGE vs ROWS must not be left to the default)."""
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return f"""
SELECT user_id, event_id, ts,
       row_number() OVER ({w}) AS rn,
       lag(value) OVER ({w}) AS lag_value,
       CAST(SUM(CAST(round(value * {_MICRO}) AS BIGINT))
            OVER ({w} {frame}) AS BIGINT) AS run_sum_micro,
       MAX(value) OVER ({w} {frame}) AS run_max
FROM {src}
"""


# ---------------------------------------------------------------------------
# Exact windowed distinct count (COUNT(DISTINCT ...) per tumbling window)
# ---------------------------------------------------------------------------


def window_distinct_users(
    ds: rd.Dataset, width_minutes: int = WINDOW_MINUTES
) -> rd.Dataset:
    """Exact distinct users per tumbling window — the de-duplicating
    sibling of :func:`tumbling_window` (a Sum of partial counts is
    additive; a COUNT(DISTINCT) is NOT, so the partial must be the
    distinct (window, user) PAIR set, not a number).

    Plan: each block reduces IN-MAP to its distinct (window_start,
    user_id) pairs (one Arrow ``group_by``), so the ONE
    ``groupby(window_start)`` exchange ships at most
    |windows x users-present-per-block| pair rows — bounded by the
    entity domain, never the event count; the per-window fold is one
    ``np.unique`` over pre-deduped ids.  At sketch-tolerant scale the
    HLL op (``text_distinct_hll``) is the constant-memory alternative;
    this is the exact one.
    """
    width_us = width_minutes * 60 * 1_000_000

    def pairs(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        start = pc.multiply(pc.divide(us, width_us), width_us)
        t = pa.table(
            {
                "window_start": start.cast(pa.timestamp("us")),
                "user_id": b.column("user_id"),
            }
        )
        return t.group_by(["window_start", "user_id"]).aggregate([])

    def fold(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "window_start": g.column("window_start").slice(0, 1),
                "n_users": pa.array([len(np.unique(uid))], pa.int64()),
            }
        )

    return (
        ds.select_columns(["user_id", "ts"])
        .map_batches(
            lambda b: pairs(b.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("window_start")
        .map_groups(fold, batch_format="pyarrow")
    )


def window_distinct_users_sql(
    src: str, width_minutes: int = WINDOW_MINUTES
) -> str:
    width_us = width_minutes * 60 * 1_000_000
    return f"""
SELECT make_timestamp((epoch_us(ts) // {width_us}) * {width_us}) AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM {src}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Rank-family window functions (rank / dense_rank / percent_rank /
# cume_dist / ntile per key)
# ---------------------------------------------------------------------------


def ranked_window(ds: rd.Dataset, tiles: int = 4) -> rd.Dataset:
    """The rank-family window functions per user — ``rank()``,
    ``dense_rank()``, ``percent_rank()``, ``cume_dist()`` over
    ``PARTITION BY user_id ORDER BY value`` and ``ntile(tiles)`` over
    the TOTAL order ``(value, event_id)`` — :func:`running_window`'s
    tie-aware siblings (rank/dense/percent/cume give EQUAL outputs to
    equal values; ntile is a row-position function, so its ORDER BY
    must be total or the assignment is engine-arbitrary — the
    event_id tiebreak makes both engines deterministic).

    Same plan as running_window: ONE ``groupby(user_id)`` exchange,
    every output vectorized per group (argsort + searchsorted against
    the sorted values for the tie-aware family, integer divmod for the
    ntile split — DuckDB's rule, first ``n % k`` tiles one row
    bigger).  ``percent_rank`` / ``cume_dist`` are the same integer
    ratios divided once in both engines — bit-exact.
    """
    if tiles < 1:
        raise ValueError(f"tiles must be >= 1, got {tiles}")

    def per_user(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group,
            sort_keys=[("value", "ascending"), ("event_id", "ascending")],
        )
        g = group.take(order)
        n = g.num_rows
        v = g.column("value").to_numpy(zero_copy_only=False)
        rnk = np.searchsorted(v, v, side="left") + 1
        cume_n = np.searchsorted(v, v, side="right")
        uniq = np.unique(v)
        dense = np.searchsorted(uniq, v) + 1
        pct = (rnk - 1) / (n - 1) if n > 1 else np.zeros(n)
        pos = np.arange(n, dtype=np.int64)
        q, r = divmod(n, tiles)
        if q == 0:  # fewer rows than tiles: one row per tile
            tile = pos + 1
        else:
            big = r * (q + 1)
            tile = np.where(
                pos < big, pos // (q + 1), r + (pos - big) // q
            ) + 1
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_id": g.column("event_id"),
                "rnk": pa.array(rnk.astype(np.int64)),
                "dense_rnk": pa.array(dense.astype(np.int64)),
                "pct_rank": pa.array(np.asarray(pct, np.float64)),
                "cume": pa.array(cume_n / n, pa.float64()),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def ranked_window_sql(src: str, tiles: int = 4) -> str:
    w = "PARTITION BY user_id ORDER BY value"
    return f"""
SELECT user_id, event_id,
       rank() OVER ({w}) AS rnk,
       dense_rank() OVER ({w}) AS dense_rnk,
       percent_rank() OVER ({w}) AS pct_rank,
       cume_dist() OVER ({w}) AS cume,
       ntile({tiles}) OVER ({w}, event_id) AS tile
FROM {src}
"""


# ---------------------------------------------------------------------------
# OHLC resample (open / high / low / close per time bucket)
# ---------------------------------------------------------------------------


def ohlc_resample(
    ds: rd.Dataset, width_minutes: int = 60
) -> rd.Dataset:
    """OHLC downsampling per tumbling window and event type — the
    financial/metrics resample primitive: ``open`` = value of the
    FIRST event in the bucket, ``close`` = the LAST, ``high``/``low``
    = max/min, plus the event count.  First/last are ordered by the
    TOTAL key ``(ts, event_id)`` — an arbitrary-tie first/last would
    be block-order-dependent, the bug class the twin could never pin.

    Plan: OHLC partials are ASSOCIATIVE — each block folds to at most
    one row per (window, type) carrying (open ts/id/value, close
    ts/id/value, low, high, n), so the ONE groupby exchange ships
    |windows x types| rows per block, never events; the per-group fold
    re-applies the same earliest/latest rule with one ``np.lexsort``
    over the partials' explicit (ts, event_id) pairs — lexicographic,
    not packed, because epoch-microsecond timestamps leave no int64
    headroom for bit-packing.
    """
    width_us = width_minutes * 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        win = (us // width_us) * width_us
        v = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "w": pa.array(win, pa.int64()),
                "et": b.column("event_type"),
                "us": pa.array(us, pa.int64()),
                "eid": pa.array(eid.astype(np.int64), pa.int64()),
                "v": pa.array(v, pa.float64()),
            }
        )
        # in-block fold: sort by (w, et, us, eid), groups become runs,
        # so open/close are the run edges and low/high are reduceat
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("w", "ascending"), ("et", "ascending"),
                ("us", "ascending"), ("eid", "ascending"),
            ],
        )
        t = t.take(idx)
        w = t.column("w").to_numpy(zero_copy_only=False)
        et = t.column("et").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        eid = t.column("eid").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        if len(w) == 0:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "et": pa.array([], pa.string()),
                    "o_us": pa.array([], pa.int64()),
                    "o_eid": pa.array([], pa.int64()),
                    "o": pa.array([], pa.float64()),
                    "c_us": pa.array([], pa.int64()),
                    "c_eid": pa.array([], pa.int64()),
                    "c": pa.array([], pa.float64()),
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        new = np.empty(len(w), bool)
        new[0] = True
        new[1:] = (w[1:] != w[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(w)]
        last = ends - 1
        return pa.table(
            {
                "w": pa.array(w[starts], pa.int64()),
                "et": pa.array(et[starts]),
                "o_us": pa.array(us[starts], pa.int64()),
                "o_eid": pa.array(eid[starts], pa.int64()),
                "o": pa.array(v[starts], pa.float64()),
                "c_us": pa.array(us[last], pa.int64()),
                "c_eid": pa.array(eid[last], pa.int64()),
                "c": pa.array(v[last], pa.float64()),
                "lo": pa.array(np.minimum.reduceat(v, starts), pa.float64()),
                "hi": pa.array(np.maximum.reduceat(v, starts), pa.float64()),
                "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        o_us = g.column("o_us").to_numpy(zero_copy_only=False)
        o_eid = g.column("o_eid").to_numpy(zero_copy_only=False)
        c_us = g.column("c_us").to_numpy(zero_copy_only=False)
        c_eid = g.column("c_eid").to_numpy(zero_copy_only=False)
        oi = int(np.lexsort((o_eid, o_us))[0])
        ci = int(np.lexsort((c_eid, c_us))[-1])
        return pa.table(
            {
                "window_start": pa.array(
                    [g.column("w")[0].as_py()], pa.int64()
                ).cast(pa.timestamp("us")),
                "event_type": g.column("et").slice(0, 1),
                "open": g.column("o").slice(oi, 1),
                "high": pa.array(
                    [pc.max(g.column("hi")).as_py()], pa.float64()
                ),
                "low": pa.array(
                    [pc.min(g.column("lo")).as_py()], pa.float64()
                ),
                "close": g.column("c").slice(ci, 1),
                "n_events": pa.array(
                    [int(pc.sum(g.column("n")).as_py())], pa.int64()
                ),
            }
        )

    return (
        ds.select_columns(["event_id", "ts", "event_type", "value"])
        .map_batches(
            lambda b: partial(b.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby(["w", "et"])
        .map_groups(fold, batch_format="pyarrow")
    )


def ohlc_resample_sql(src: str, width_minutes: int = 60) -> str:
    """DuckDB oracle for :func:`ohlc_resample` — first/last via
    row_number over the same total (ts, event_id) order, min/max/count
    plain aggregates."""
    width_us = width_minutes * 60 * 1_000_000
    w = f"make_timestamp((epoch_us(ts) // {width_us}) * {width_us})"
    return f"""
WITH e AS (
    SELECT {w} AS window_start, event_type, value,
           row_number() OVER (PARTITION BY {w}, event_type
                              ORDER BY ts, event_id) AS rn_f,
           row_number() OVER (PARTITION BY {w}, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn_l
    FROM {src}
)
SELECT window_start, event_type,
       max(CASE WHEN rn_f = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_l = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gap-filled date histogram (ES date_histogram min_doc_count=0)
# ---------------------------------------------------------------------------

HISTOGRAM_MAX_BUCKETS = 10_000_000


def date_histogram_filled(
    ds: rd.Dataset,
    width_minutes: int = WINDOW_MINUTES,
    max_buckets: int = HISTOGRAM_MAX_BUCKETS,
) -> rd.Dataset:
    """Dense date histogram — per-bucket event counts INCLUDING empty
    buckets between the global min and max (ES ``date_histogram`` with
    ``min_doc_count: 0``; a sparse groupby histogram silently hides
    outage windows, which for monitoring is the signal).

    Plan: blocks emit (bucket, n) partial counts (value_counts — the
    tumbling_window shape), ONE bucket groupby sums them; the global
    bucket range comes from a distributed Min/Max over that SMALL
    table, and the dense fill is a driver-side arange merge — bounded
    by ``max_buckets`` (refused loudly above it: a dense histogram
    wider than its dashboard is a caller bug, and the sparse sibling
    is ``tumbling_window``).  The driver pull is |distinct non-empty
    buckets| <= the cap, never events.
    """
    width_us = width_minutes * 60 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (us // width_us) * width_us
        vals, cnt = np.unique(win, return_counts=True)
        return pa.table(
            {
                "w": pa.array(vals, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    sparse = (
        ds.select_columns(["ts"])
        .map_batches(
            lambda b: partial(b.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("w")
        .aggregate(_Sum("n", alias_name="n"))
        .materialize()  # consumed twice: the range and the fill
    )
    from ray.data.aggregate import Max as _Max, Min as _Min

    rng = sparse.aggregate(_Min("w", alias_name="lo"), _Max("w", alias_name="hi"))
    lo, hi = rng["lo"], rng["hi"]
    if lo is None:  # empty input: empty histogram
        return rd.from_arrow(
            pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
    n_buckets = (int(hi) - int(lo)) // width_us + 1
    if n_buckets > max_buckets:
        raise ValueError(
            f"date_histogram_filled: {n_buckets} buckets exceed "
            f"max_buckets={max_buckets} — widen the interval or use the "
            "sparse tumbling_window"
        )
    rows = sparse.take_all()
    dense = np.arange(int(lo), int(hi) + width_us, width_us, dtype=np.int64)
    counts = np.zeros(len(dense), np.int64)
    if rows:
        w = np.array([r["w"] for r in rows], np.int64)
        n = np.array([r["n"] for r in rows], np.int64)
        counts[(w - int(lo)) // width_us] = n
    return rd.from_arrow(
        pa.table(
            {
                "window_start": pa.array(dense, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n": pa.array(counts, pa.int64()),
            }
        )
    )


def date_histogram_filled_sql(
    src: str, width_minutes: int = WINDOW_MINUTES
) -> str:
    """DuckDB oracle for :func:`date_histogram_filled` —
    generate_series over the same integer bucket range LEFT JOIN the
    sparse counts."""
    width_us = width_minutes * 60 * 1_000_000
    return f"""
WITH sparse AS (
    SELECT (epoch_us(ts) // {width_us}) * {width_us} AS w,
           CAST(count(*) AS BIGINT) AS n
    FROM {src} GROUP BY 1
),
rng AS (SELECT min(w) AS lo, max(w) AS hi FROM sparse),
dense AS (
    SELECT unnest(range(rng.lo, rng.hi + {width_us}, {width_us})) AS w
    FROM rng
)
SELECT make_timestamp(dense.w) AS window_start,
       CAST(coalesce(sparse.n, 0) AS BIGINT) AS n
FROM dense LEFT JOIN sparse ON dense.w = sparse.w
"""


# ---------------------------------------------------------------------------
# Per-user LOCF resample (forward-fill onto a dense time grid)
# ---------------------------------------------------------------------------


def locf_resample(
    ds: rd.Dataset,
    width_minutes: int = 60,
    max_grid_per_user: int = 1_000_000,
) -> rd.Dataset:
    """Per-user dense resample with last-observation-carried-forward:
    one row per (user, hour) from the user's first to last event hour,
    carrying the value of the LATEST event before the hour's end — the
    time-series regularization every metrics/feature pipeline runs
    before a model sees the data (the gap-filled sibling of
    :func:`ohlc_resample`: OHLC summarizes present events, LOCF
    answers "what was the state during the silent hours").

    Plan: ONE ``groupby(user_id)`` exchange; each group sorts by the
    TOTAL (ts, event_id) key (ties: the larger event_id is 'latest' —
    the asof convention), builds its own hour grid (group-local
    min..max — no global state), and fills with one vectorized
    ``searchsorted``; the grid is guarded per user (a sensor silent
    for a century would emit 10^6 rows — refuse loudly).
    """
    width_us = width_minutes * 60 * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(idx)
        us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        lo = (us[0] // width_us) * width_us
        hi = (us[-1] // width_us) * width_us
        n_grid = (hi - lo) // width_us + 1
        if n_grid > max_grid_per_user:
            raise ValueError(
                f"locf_resample: {n_grid} grid rows for one user exceed "
                f"{max_grid_per_user} — widen the interval"
            )
        grid = np.arange(lo, hi + width_us, width_us, dtype=np.int64)
        # latest event with ts < grid hour end; stable sort put equal-ts
        # rows in event_id order, so the rightmost match is the winner
        pos = np.searchsorted(us, grid + width_us, side="left") - 1
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(grid), g.column("user_id")[0].as_py(),
                            np.int64),
                    pa.int64(),
                ),
                "window_start": pa.array(grid, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "value_ff": pa.array(v[pos], pa.float64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def locf_resample_sql(src: str, width_minutes: int = 60) -> str:
    """DuckDB oracle for :func:`locf_resample` — per-user
    generate_series grid + the latest-(ts, event_id)-before-hour-end
    correlated pick."""
    w = width_minutes * 60 * 1_000_000
    return f"""
WITH b AS (
    SELECT user_id,
           (min(epoch_us(ts)) // {w}) * {w} AS lo,
           (max(epoch_us(ts)) // {w}) * {w} AS hi
    FROM {src} GROUP BY user_id
),
grid AS (
    SELECT user_id, unnest(range(lo, hi + {w}, {w})) AS h FROM b
)
SELECT g.user_id, make_timestamp(g.h) AS window_start,
       (SELECT e.value FROM {src} e
        WHERE e.user_id = g.user_id AND epoch_us(e.ts) < g.h + {w}
        ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS value_ff
FROM grid g
"""


# ---------------------------------------------------------------------------
# Single changepoint per key (binary segmentation, exact-int scoring)
# ---------------------------------------------------------------------------

CP_CENT = 100  # value quantization for the exact prefix sums


def changepoint_per_user(ds: rd.Dataset) -> rd.Dataset:
    """The best single mean-shift changepoint per user — binary
    segmentation's first step (Scott & Knott 1974; the op behind
    "when did this user's behavior change"): over the user's events in
    (ts, event_id) order, the split k maximizing the between-segment
    SSE reduction ``(S1*n2 - S2*n1)^2 / (n1*n2)`` (the constant-n
    factor dropped — same argmax).

    Plan: ONE user exchange (the running_window shape); per group one
    int64 cents cumsum scores EVERY split vectorized, argmax with
    first-occurrence tie-break (== SQL's score DESC, k ASC).

    Exactness device: the score numerator ``S1*n2 - S2*n1`` is exact
    int64 (prefix sums of cents x row counts), squared and divided
    once in float64 — the identical expression both engines, so the
    argmax (an equality comparison over identical doubles) agrees
    bit-for-bit even at score ties.  Output (user_id, k, n,
    score) — k = rows in the left segment; single-event users have no
    split and emit nothing.
    """

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        n = g.num_rows
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if n < 2:
            return empty
        v = g.column("value").to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * CP_CENT + 0.5) * np.sign(v)).astype(
            np.int64
        )
        s1 = np.cumsum(c)[:-1]  # splits k = 1..n-1
        stot = int(c.sum())
        n1 = np.arange(1, n, dtype=np.int64)
        n2 = n - n1
        d = (s1 * n2 - (stot - s1) * n1).astype(np.float64)
        score = d * d / (n1 * n2).astype(np.float64)
        k = int(np.argmax(score)) + 1  # first max == (score DESC, k ASC)
        return pa.table(
            {
                "user_id": pa.array(
                    [g.column("user_id")[0].as_py()], pa.int64()
                ),
                "k": pa.array([k], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "score": pa.array([float(score[k - 1])], pa.float64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def changepoint_per_user_sql(src: str) -> str:
    """DuckDB oracle for :func:`changepoint_per_user` — the identical
    cumsum score per split, winner by (score DESC, k ASC)."""
    q = CP_CENT
    return f"""
WITH e AS (
    SELECT user_id,
           CAST(round(value * {q}) AS BIGINT) AS c,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n
    FROM {src}
),
p AS (
    SELECT user_id, rn AS k, n,
           sum(c) OVER (PARTITION BY user_id ORDER BY rn) AS s1,
           sum(c) OVER (PARTITION BY user_id) AS stot
    FROM e
),
scored AS (
    SELECT user_id, k, CAST(n AS BIGINT) AS n,
           CAST(s1 * (n - k) - (stot - s1) * k AS DOUBLE)
           * CAST(s1 * (n - k) - (stot - s1) * k AS DOUBLE)
           / CAST(k * (n - k) AS DOUBLE) AS score,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY CAST(s1 * (n - k) - (stot - s1) * k
                                            AS DOUBLE)
                                       * CAST(s1 * (n - k) - (stot - s1) * k
                                              AS DOUBLE)
                                       / CAST(k * (n - k) AS DOUBLE) DESC,
                                       k ASC) AS r
    FROM p WHERE k < n AND n >= 2
)
SELECT user_id, CAST(k AS BIGINT) AS k, n, score
FROM scored WHERE r = 1
"""


# ---------------------------------------------------------------------------
# Event-type transition counts (first-order Markov / path analytics)
# ---------------------------------------------------------------------------


def transition_counts(ds: rd.Dataset) -> rd.Dataset:
    """First-order transition counts over each user's event sequence —
    "what do users do NEXT after X": for every consecutive pair in the
    user's (ts, event_id)-ordered stream, count (from_type, to_type)
    corpus-wide.  The Markov-chain / path-analytics constructor
    (funnel's exploratory sibling: funnel checks ONE prescribed path,
    this surfaces all of them).

    Plan: ONE ``groupby(user_id)`` exchange (transitions never span
    users — the sessionization assumption); each group sorts by the
    total key and emits its consecutive type pairs pre-counted (Arrow
    ``group_by`` in the fold), and a tiny ``(from, to)`` groupby sums
    — the shuffled intermediate is |type|^2-bounded per group, never
    event-sized.
    """

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        et = g.column("event_type")
        n = g.num_rows
        if n < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        t = pa.table({"from_type": et.slice(0, n - 1), "to_type": et.slice(1)})
        out = t.group_by(["from_type", "to_type"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["from_type", "to_type", "n"])

    from ray.data.aggregate import Sum as _Sum

    return (
        ds.select_columns(["user_id", "event_id", "ts", "event_type"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(_Sum("n", alias_name="n"))
    )


def transition_counts_sql(src: str) -> str:
    """DuckDB oracle for :func:`transition_counts` — lead() over the
    same total per-user order."""
    return f"""
WITH s AS (
    SELECT user_id, event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM {src}
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation per user (serial persistence)
# ---------------------------------------------------------------------------


def autocorr_per_user(ds: rd.Dataset) -> rd.Dataset:
    """Lag-1 serial autocorrelation of value per user — the
    persistence feature ("does a big event predict the NEXT event")
    that :func:`~search_engine_ray.functions.aggregates.user_trend`
    (drift over time) and :func:`changepoint_per_user` (one mean
    shift) cannot see: Pearson r over the consecutive pairs ``(v_t,
    v_{t+1})`` in total (ts, event_id) order.

    Exactness: values quantize to int64 cents; the five pair moments
    (n, Sx, Sy, Sxy, Sxx, Syy) fold as exact int64 sums (headroom:
    cents^2 x pairs, ~3.7e9 pairs/user at cents <= 5e4); numerator
    ``n*Sxy - Sx*Sy`` and both denominator factors are formed as
    arbitrary-precision Python ints and converted to float ONCE each —
    the same numbers DuckDB's HUGEINT arithmetic and HUGEINT->DOUBLE
    casts produce — and r is one identical float expression both
    engines.  Degenerate users (fewer than 2 pairs) or zero variance
    on either side emit NULL; pairs NEVER span users (the
    sessionization assumption, pinned by a crafted cross-user case).

    Plan: ONE user exchange (the :func:`changepoint_per_user` shape —
    consecutive pairs need the user's events co-located and ordered);
    the fold is one sort + shifted-slice moment sums, vectorized.
    """

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        v = g.column("value").to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        x, y = c[:-1], c[1:]
        n = len(x)
        r1 = None
        if n >= 2:
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            syy = int((y * y).sum())
            num = n * sxy - sx * sy
            dx = n * sxx - sx * sx
            dy = n * syy - sy * sy
            if dx > 0 and dy > 0:
                import math

                r1 = float(num) / math.sqrt(float(dx) * float(dy))
        return pa.table(
            {
                "user_id": pa.array(
                    [g.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_pairs": pa.array([n], pa.int64()),
                "r1": pa.array([r1], pa.float64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def autocorr_per_user_sql(src: str) -> str:
    """DuckDB oracle for :func:`autocorr_per_user` — the same cents,
    the same lead() pairs over the same total order, the same HUGEINT
    moment arithmetic with one DOUBLE cast per factor."""
    return f"""
WITH t AS (
    SELECT user_id AS u,
           CAST(round(value * 100) AS BIGINT) AS c,
           ts, event_id
    FROM {src}
),
p AS (
    SELECT u, c AS x,
           lead(c) OVER (PARTITION BY u ORDER BY ts, event_id) AS y
    FROM t
),
m AS (
    SELECT u, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM p WHERE y IS NOT NULL GROUP BY u
)
SELECT u AS user_id, n AS n_pairs,
       CASE WHEN n >= 2
             AND (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) > 0
             AND (CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) > 0
            THEN CAST(CAST(n AS HUGEINT) * sxy
                      - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * syy
                               - CAST(sy AS HUGEINT) * sy AS DOUBLE))
       END AS r1
FROM m
"""


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency over intervals
# ---------------------------------------------------------------------------


def max_concurrency(
    intervals: rd.Dataset,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> pa.Table:
    """Peak number of simultaneously-open intervals and the first
    instant it is reached — the sweep-line capacity question ("how
    many sessions were live at the busiest moment") that no groupby
    can answer, because concurrency is a property of the ORDERED
    boundary stream, not of any key.  Intervals are closed on both
    ends: a session ending at t overlaps one starting at t.

    Plan: each interval emits two boundary rows (+1 at start, -1 at
    end) with the packed sort key ``2*t + (d < 0)`` — one int64, so
    +1 sorts before -1 at equal t (the closed-interval rule) and the
    exchange is ONE range-partitioned integer sort (the stage-C
    discipline).  Each sorted block then folds to a 4-number summary
    (min key, delta sum, running-max, first argmax time): the classic
    two-pass distributed prefix — the driver combines |blocks|
    summaries with exact integer offsets, never rows.  Splitting a
    run of identical keys across blocks cannot change the result:
    equal keys carry equal deltas, so every interleaving yields the
    same block sums and the same run maxima.

    peak is an exact integer; peak_ts is the MINIMUM boundary time
    achieving it (equal to "first in sweep order" because concurrency
    only rises on +1 rows — the rule the SQL twin's ``min(t) WHERE c
    = max`` mirrors).  Empty input emits the typed NULL row the
    twin's aggregates produce.
    """
    import ray

    def deltas(b: pa.Table) -> pa.Table:
        s = b.column(start_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        e = b.column(end_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if (e < s).any():
            raise ValueError("max_concurrency: interval end before start")
        t = np.concatenate([s, e])
        d = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        return pa.table(
            {
                "k": pa.array(2 * t + (d < 0), pa.int64()),
                "t": pa.array(t, pa.int64()),
                "d": pa.array(d, pa.int64()),
            }
        )

    srt = intervals.map_batches(
        lambda b: deltas(b.replace_schema_metadata(None)),
        batch_format="pyarrow",
    ).sort("k")

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "min_k": pa.array([], pa.int64()),
                    "sum_d": pa.array([], pa.int64()),
                    "run_max": pa.array([], pa.int64()),
                    "argmax_t": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        d = b.column("d").to_numpy(zero_copy_only=False)
        t = b.column("t").to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        i = int(np.argmax(run))
        return pa.table(
            {
                "min_k": pa.array(
                    [int(b.column("k")[0].as_py())], pa.int64()
                ),
                "sum_d": pa.array([int(d.sum())], pa.int64()),
                "run_max": pa.array([int(run[i])], pa.int64()),
                "argmax_t": pa.array([int(t[i])], pa.int64()),
                "n": pa.array([b.num_rows], pa.int64()),
            }
        )

    parts = [
        x
        for x in ray.get(
            srt.map_batches(summary, batch_format="pyarrow").materialize().to_arrow_refs()
        )
        if x.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "peak": pa.array([None], pa.int64()),
                "peak_ts": pa.array([None], pa.timestamp("us")),
                "n_intervals": pa.array([0], pa.int64()),
            }
        )
    rows = sorted(pa.concat_tables(parts).to_pylist(), key=lambda r: r["min_k"])
    offset = 0
    peak = None
    peak_ts = None
    total = 0
    for r in rows:
        cand = offset + r["run_max"]
        if peak is None or cand > peak:
            peak, peak_ts = cand, r["argmax_t"]
        elif cand == peak and r["argmax_t"] < peak_ts:
            peak_ts = r["argmax_t"]
        offset += r["sum_d"]
        total += r["n"]
    return pa.table(
        {
            "peak": pa.array([peak], pa.int64()),
            "peak_ts": pa.array([peak_ts], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_intervals": pa.array([total // 2], pa.int64()),
        }
    )


def max_concurrency_sql(sessions_sql: str) -> str:
    """DuckDB oracle for :func:`max_concurrency` over the sessions
    produced by ``sessions_sql`` — the same closed-interval boundary
    order (+1 before -1 at equal t), the same min-time peak rule."""
    return f"""
WITH s AS ({sessions_sql}),
d AS (
    SELECT epoch_us(session_start) AS t, 1 AS dd FROM s
    UNION ALL
    SELECT epoch_us(session_end) AS t, -1 AS dd FROM s
),
r AS (
    SELECT t, dd,
           sum(dd) OVER (ORDER BY t, dd DESC
                         ROWS UNBOUNDED PRECEDING) AS c
    FROM d
)
SELECT CAST((SELECT max(c) FROM r) AS BIGINT) AS peak,
       make_timestamp((SELECT min(t) FROM r
                       WHERE c = (SELECT max(c) FROM r))) AS peak_ts,
       CAST((SELECT count(*) FROM s) AS BIGINT) AS n_intervals
"""


# ---------------------------------------------------------------------------
# Inter-event gap statistics per user (heartbeat monitoring)
# ---------------------------------------------------------------------------


def gap_stats_per_user(ds: rd.Dataset) -> rd.Dataset:
    """Inter-event gap statistics per user — median, p95 and max gap
    in microseconds plus the gap count: the heartbeat/liveness readout
    ("how regularly does this agent report, and how bad is its worst
    silence") behind every dead-man's-switch alert; the
    distributional sibling of :func:`autocorr_per_user`'s value
    correlation, over the TIME axis instead.

    All-integer exactness: gaps are differences of epoch-microsecond
    int64s over the total (ts, event_id) order; median and p95 are
    ceil-rank ORDER STATISTICS of the gap multiset (the
    grouped_quantiles convention — always actual gaps, no
    interpolation); no float anywhere.  Gaps never span users; single-
    event users have no gap and emit nothing (the changepoint rule).

    Plan: ONE user exchange (the transitions shape); the fold is one
    sort + diff + one more sort for the order statistics — vectorized.
    """

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "med_gap_us": pa.array([], pa.int64()),
                "p95_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
            }
        )
        if len(us) < 2:
            return empty
        gaps = np.sort(np.diff(us))
        n = len(gaps)
        med = int(gaps[(n + 1) // 2 - 1])
        p95 = int(gaps[(19 * n + 19) // 20 - 1])
        return pa.table(
            {
                "user_id": pa.array(
                    [g.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_gaps": pa.array([n], pa.int64()),
                "med_gap_us": pa.array([med], pa.int64()),
                "p95_gap_us": pa.array([p95], pa.int64()),
                "max_gap_us": pa.array([int(gaps[-1])], pa.int64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def gap_stats_per_user_sql(src: str) -> str:
    """DuckDB oracle for :func:`gap_stats_per_user` — the same lead()
    gaps over the same total order, the same ceil-rank statistics."""
    return f"""
WITH p AS (
    SELECT user_id AS u,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)
           - epoch_us(ts) AS gap
    FROM {src}
),
g AS (SELECT u, CAST(gap AS BIGINT) AS gap FROM p WHERE gap IS NOT NULL),
nn AS (SELECT u, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY u),
cnt AS (SELECT u, gap, count(*) AS m FROM g GROUP BY u, gap),
cum AS (
    SELECT u, gap, sum(m) OVER (PARTITION BY u ORDER BY gap) AS cm
    FROM cnt
)
SELECT nn.u AS user_id, nn.n AS n_gaps,
       (SELECT min(gap) FROM cum
        WHERE cum.u = nn.u AND cm >= (nn.n + 1) // 2) AS med_gap_us,
       (SELECT min(gap) FROM cum
        WHERE cum.u = nn.u AND cm >= (19 * nn.n + 19) // 20)
           AS p95_gap_us,
       (SELECT max(gap) FROM g WHERE g.u = nn.u) AS max_gap_us
FROM nn
"""


# ---------------------------------------------------------------------------
# Longest consecutive-day streak per user (gaps and islands)
# ---------------------------------------------------------------------------


def streaks_per_user(ds: rd.Dataset) -> rd.Dataset:
    """Longest run of CONSECUTIVE active UTC days per user — the
    engagement-streak feature (Duolingo's daily streak; "how many days
    in a row"), and the canonical gaps-and-islands computation: the
    twin's ``day - row_number()`` island key is the SQL folklore form,
    the engine's diff==1 run scan the vectorized one.

    All-integer exactness: days are ``epoch_us // 86_400_000_000``
    (floor division on int64 — no calendar library), streak length
    and start day are exact ints, and the winning streak is the
    (length DESC, start ASC) head — first-longest, deterministic both
    engines.  Output (user_id, n_days, longest_streak,
    streak_start_day).

    Plan: ONE user exchange; the fold dedups the user's days
    (np.unique sorts), finds diff>1 island boundaries and takes one
    lexsort head — vectorized, no Python loop.
    """
    us_day = 86_400_000_000

    def per_user(g: pa.Table) -> pa.Table:
        us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = np.unique(us // us_day)
        starts = np.flatnonzero(np.r_[True, np.diff(days) > 1])
        ends = np.r_[starts[1:], len(days)]
        lens = ends - starts
        i = int(np.lexsort((days[starts], -lens))[0])
        return pa.table(
            {
                "user_id": pa.array(
                    [g.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_days": pa.array([len(days)], pa.int64()),
                "longest_streak": pa.array([int(lens[i])], pa.int64()),
                "streak_start_day": pa.array(
                    [int(days[starts[i]])], pa.int64()
                ),
            }
        )

    return (
        ds.select_columns(["user_id", "ts"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def streaks_per_user_sql(src: str) -> str:
    """DuckDB oracle for :func:`streaks_per_user` — the classic
    day - row_number() island key, winner by (len DESC, start ASC)."""
    return f"""
WITH d AS (
    SELECT DISTINCT user_id AS u,
           epoch_us(ts) // 86400000000 AS day
    FROM {src}
),
r AS (
    SELECT u, day,
           day - row_number() OVER (PARTITION BY u ORDER BY day) AS grp
    FROM d
),
runs AS (
    SELECT u, CAST(count(*) AS BIGINT) AS len,
           CAST(min(day) AS BIGINT) AS strt
    FROM r GROUP BY u, grp
),
best AS (
    SELECT u, len, strt,
           row_number() OVER (PARTITION BY u
                              ORDER BY len DESC, strt ASC) AS rn
    FROM runs
),
nd AS (SELECT u, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY u)
SELECT nd.u AS user_id, nd.n_days,
       best.len AS longest_streak, best.strt AS streak_start_day
FROM nd JOIN best ON nd.u = best.u AND best.rn = 1
"""


# ---------------------------------------------------------------------------
# Rolling median per user (robust smoothing window)
# ---------------------------------------------------------------------------

ROLLMED_W = 5


def rolling_median_per_user(
    ds: rd.Dataset, window: int = ROLLMED_W
) -> rd.Dataset:
    """Trailing rolling MEDIAN of value-cents per user over the last
    ``window`` rows — :func:`running_window`'s robust member: a
    running mean drags for ``window`` rows after one spike, the
    rolling median simply ignores it (the median filter, signal
    processing's denoiser).  Output one row per event with the
    window median in cents.

    Exactness: cents are int64; a window's median is either an actual
    cent value (odd count) or the average of the two middles (even
    count — the leading partial windows), and ``(lo + hi) / 2.0`` on
    exact small ints is the identical double DuckDB's windowed
    ``median`` produces (probed: median over BIGINT interpolates the
    two middles in DOUBLE).

    Plan: ONE user exchange (the running_window shape); the fold
    sorts by (ts, event_id), then computes EVERY window in one
    vectorized pass — a sentinel-padded ``sliding_window_view`` +
    one row-wise sort, with the per-row middle indices adjusted for
    the leading partial windows (sentinels sort to the end, so valid
    values always occupy the first k slots).  O(n * w log w),
    no Python loop.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def per_user(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        v = g.column("value").to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        n = len(c)
        pad = np.full(window - 1, np.iinfo(np.int64).max, np.int64)
        sw = np.sort(
            np.lib.stride_tricks.sliding_window_view(
                np.concatenate([pad, c]), window
            ),
            axis=1,
        )
        k = np.minimum(np.arange(n) + 1, window)
        rows = np.arange(n)
        lo = sw[rows, (k - 1) // 2].astype(np.float64)
        hi = sw[rows, k // 2].astype(np.float64)
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "event_id": g.column("event_id"),
                "roll_med_c": pa.array((lo + hi) / 2.0, pa.float64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def rolling_median_per_user_sql(
    src: str, window: int = ROLLMED_W
) -> str:
    """DuckDB oracle for :func:`rolling_median_per_user` — native
    windowed median over the same cents and total order."""
    return f"""
SELECT user_id, event_id,
       median(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
           AS roll_med_c
FROM {src}
"""


# ---------------------------------------------------------------------------
# Interval-union busy time per user (merged coverage)
# ---------------------------------------------------------------------------


def busy_time_per_user(ds: rd.Dataset) -> rd.Dataset:
    """Total UNION length of each user's work intervals — the
    billing/utilization question ("how long was this agent actually
    busy"), where naive SUM(duration) double-counts every overlap:
    event i occupies ``[ts, ts + round(value) seconds]``, and
    overlapping intervals merge before summing (the interval-union
    sibling of :func:`max_concurrency`'s peak count).

    All-integer exactness: endpoints are epoch-microsecond int64s
    (duration = ``round(value)`` seconds — the same half-away integer
    both engines), the merge rule is ``start > running-max of prior
    ends`` (touching intervals MERGE: strictly-greater breaks — the
    same comparison the twin's window MAX uses), and the output per
    user is (n_intervals, n_islands, busy_us) — exact int64, no
    float anywhere.

    Plan: ONE user exchange; the fold sorts by (start, end, id),
    running-maxes the ends (np.maximum.accumulate), finds island
    breaks vectorized, and sums per-island spans with reduceat.
    """
    us_sec = 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        us = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = g.column("value").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        dur = (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)
        if (dur < 0).any():
            raise ValueError("busy_time_per_user: negative duration")
        s = us
        e = us + dur * us_sec
        order = np.lexsort((eid, e, s))
        s, e = s[order], e[order]
        run_end = np.maximum.accumulate(e)
        brk = np.r_[True, s[1:] > run_end[:-1]]
        starts = np.flatnonzero(brk)
        island_max_end = np.maximum.reduceat(e, starts)
        busy = int((island_max_end - s[starts]).sum())
        return pa.table(
            {
                "user_id": pa.array(
                    [g.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_intervals": pa.array([len(s)], pa.int64()),
                "n_islands": pa.array([len(starts)], pa.int64()),
                "busy_us": pa.array([busy], pa.int64()),
            }
        )

    return (
        ds.select_columns(["user_id", "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def busy_time_per_user_sql(src: str) -> str:
    """DuckDB oracle for :func:`busy_time_per_user` — the classic
    interval-islands window (running MAX of prior ends), the same
    integer endpoints and merge rule."""
    return f"""
WITH t AS (
    SELECT user_id AS u, event_id AS id,
           epoch_us(ts) AS s,
           epoch_us(ts) + CAST(round(value) AS BIGINT) * 1000000 AS e
    FROM {src}
),
r AS (
    SELECT u, id, s, e,
           CASE WHEN s > MAX(e) OVER (
                    PARTITION BY u ORDER BY s, e, id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS brk
    FROM t
),
g AS (
    SELECT u, s, e,
           SUM(brk) OVER (PARTITION BY u ORDER BY s, e, id
                          ROWS UNBOUNDED PRECEDING) AS grp
    FROM r
),
isl AS (
    SELECT u, grp, CAST(MAX(e) - MIN(s) AS BIGINT) AS len
    FROM g GROUP BY u, grp
)
SELECT u AS user_id,
       CAST((SELECT count(*) FROM t WHERE t.u = isl.u) AS BIGINT)
           AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(SUM(len) AS BIGINT) AS busy_us
FROM isl GROUP BY u
"""


# ---------------------------------------------------------------------------
# DAU / MAU stickiness per day
# ---------------------------------------------------------------------------

MAU_WINDOW_DAYS = 30


def stickiness_per_day(
    ds: rd.Dataset, window_days: int = MAU_WINDOW_DAYS
) -> pa.Table:
    """Daily DAU, trailing-``window_days`` MAU and the DAU/MAU
    stickiness ratio for every day in the corpus range — the
    product-health headline metric.  The naive MAU is a windowed
    COUNT(DISTINCT) — a range join of every day against every (user,
    day) pair, which is exactly what the SQL twin does and exactly
    what cannot run at 100 TB.

    The scale plan deletes the distinct-count entirely: a user counts
    toward MAU(d) iff d lies in the union of [active_day, active_day
    + W-1] intervals — so per user, merge those intervals (the
    :func:`busy_time_per_user` island scan over the deduped day set)
    and emit ONE +1/-1 delta pair per island; MAU(d) is then a prefix
    sum of deltas over the day domain.  The exchange carries (user,
    day) distinct pairs once, the delta/DAU rows are day-domain-sized,
    and the driver finish is one cumsum over the dense calendar range
    (bounded by CALENDAR, not events — the dense-histogram bound).
    All counts exact int64; ``stickiness = float(dau) / float(mau)``
    is one identical division; mau == 0 days (a silence longer than
    the window cannot happen inside [min, max] of the SAME user set —
    but can for gaps between different users' ranges) emit NULL.
    """
    import ray

    us_day = 86_400_000_000
    w = int(window_days)
    if w < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")

    def pairs(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "u": b.column("user_id"),
                "d": pa.array(us // us_day, pa.int64()),
            }
        )
        return t.group_by(["u", "d"]).aggregate([]).rename_columns(["u", "d"])

    def per_user(g: pa.Table) -> pa.Table:
        days = np.unique(g.column("d").to_numpy(zero_copy_only=False))
        # DAU rows: (kind=0, day, +1) per active day (already
        # user-deduped); MAU deltas: islands of [d, d+w-1] coverage
        brk = np.r_[True, days[1:] > days[:-1] + (w - 1)]
        starts = days[np.flatnonzero(brk)]
        ends = (
            np.maximum.reduceat(days, np.flatnonzero(brk)) + w
        )  # exclusive end = last_day + w
        kind = np.concatenate(
            [
                np.zeros(len(days), np.int64),
                np.ones(len(starts), np.int64),
                np.ones(len(ends), np.int64),
            ]
        )
        day = np.concatenate([days, starts, ends])
        delta = np.concatenate(
            [
                np.ones(len(days), np.int64),
                np.ones(len(starts), np.int64),
                -np.ones(len(ends), np.int64),
            ]
        )
        return pa.table(
            {
                "kind": pa.array(kind, pa.int64()),
                "day": pa.array(day, pa.int64()),
                "delta": pa.array(delta, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.select_columns(["user_id", "ts"])
        .map_batches(
            lambda b: pairs(b.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("u")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["kind", "day"])
        .aggregate(Sum("delta", alias_name="delta"))
    )
    tabs = [t for t in ray.get(rows.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "dau": pa.array([], pa.int64()),
            "mau": pa.array([], pa.int64()),
            "stickiness": pa.array([], pa.float64()),
        }
    )
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    day = t.column("day").to_numpy(zero_copy_only=False)
    delta = t.column("delta").to_numpy(zero_copy_only=False)
    act = day[kind == 0]
    lo, hi = int(act.min()), int(act.max())
    n_days = hi - lo + 1
    dau = np.zeros(n_days, np.int64)
    np.add.at(dau, act - lo, delta[kind == 0])
    deltas = np.zeros(n_days + 1, np.int64)
    m1 = kind == 1
    idx = np.clip(day[m1] - lo, 0, n_days)
    np.add.at(deltas, idx, delta[m1])
    mau = np.cumsum(deltas[:-1])
    stick = [
        float(int(a)) / float(int(m)) if m > 0 else None
        for a, m in zip(dau, mau)
    ]
    return pa.table(
        {
            "day": pa.array(np.arange(lo, hi + 1), pa.int64()),
            "dau": pa.array(dau, pa.int64()),
            "mau": pa.array(mau, pa.int64()),
            "stickiness": pa.array(stick, pa.float64()),
        }
    )


def stickiness_per_day_sql(
    src: str, window_days: int = MAU_WINDOW_DAYS
) -> str:
    """DuckDB oracle for :func:`stickiness_per_day` — the literal
    windowed COUNT(DISTINCT) range join over the dense calendar (the
    definition; quadratic-ish, oracle-scale only — the engine's
    interval-union deltas are the scale path)."""
    w = int(window_days)
    return f"""
WITH ud AS (
    SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
    FROM {src}
),
rng AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
days AS (
    SELECT unnest(range(lo, hi + 1)) AS day FROM rng
),
dau AS (
    SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d
),
mau AS (
    SELECT days.day,
           CAST(count(DISTINCT ud.u) AS BIGINT) AS mau
    FROM days LEFT JOIN ud
      ON ud.d BETWEEN days.day - {w - 1} AND days.day
    GROUP BY days.day
)
SELECT days.day, COALESCE(dau.dau, 0) AS dau,
       COALESCE(mau.mau, 0) AS mau,
       CASE WHEN COALESCE(mau.mau, 0) > 0
            THEN CAST(COALESCE(dau.dau, 0) AS DOUBLE)
                 / CAST(mau.mau AS DOUBLE)
       END AS stickiness
FROM days
LEFT JOIN dau ON days.day = dau.day
LEFT JOIN mau ON days.day = mau.day
ORDER BY days.day
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test per group (serial randomness)
# ---------------------------------------------------------------------------


def runs_test_by_group(ds: rd.Dataset,
                       group_col: str = "event_type") -> rd.Dataset:
    """Wald-Wolfowitz runs test per group (1940) — the serial-
    RANDOMNESS audit: too FEW runs of above/below-median values in
    time order means trending/sticky data, too MANY means oscillation
    — the time-ordered question the distribution tests (KS, EMD) and
    the rank correlations cannot see.  Values tie-split against the
    group's ceil-rank median (ties EXCLUDED, the classic rule).

    Exactness: R (runs), n1, n2 fold as exact ints over the total
    (ts, event_id) order; ``mu = 1 + a/N`` and ``var = a(a - N) /
    (N^2 (N-1))`` with ``a = 2 n1 n2`` have exact integer numerators
    and denominators (Python bigints, the HUGEINT mirror), and ``z =
    (R - mu)/sqrt(var)`` is the identical float expression both
    engines.  Degenerate sides (n1 == 0 or n2 == 0, or N < 2) emit
    NULL.

    Plan: ONE group exchange of (ts, id, cents) rows (run counting
    needs the group's full time order — the changepoint shape); the
    fold is one sort + a median searchsorted + one vectorized
    sign-change count.
    """

    def per_group(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        g = g.take(order)
        v = g.column("value").to_numpy(zero_copy_only=False)
        c = (np.floor(np.abs(v) * 100 + 0.5) * np.sign(v)).astype(np.int64)
        srt = np.sort(c)
        med = int(srt[(len(srt) + 1) // 2 - 1])
        keep = c != med
        s = c[keep] > med
        n1 = int(s.sum())
        n2 = int((~s).sum())
        n = n1 + n2
        runs = int(1 + (s[1:] != s[:-1]).sum()) if n > 0 else 0
        z = None
        if n1 > 0 and n2 > 0 and n >= 2:
            import math

            a = 2 * n1 * n2
            mu = 1.0 + float(a) / float(n)
            var = float(a * (a - n)) / float(n * n * (n - 1))
            if var > 0:
                z = (float(runs) - mu) / math.sqrt(var)
        return pa.table(
            {
                "g": g.column(group_col).slice(0, 1),
                "n_above": pa.array([n1], pa.int64()),
                "n_below": pa.array([n2], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "z": pa.array([z], pa.float64()),
            }
        )

    out = (
        ds.select_columns([group_col, "event_id", "ts", "value"])
        .map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n_above", "n_below", "runs", "z"]
        ),
        batch_format="pyarrow",
    )


def runs_test_by_group_sql(src: str,
                           group_col: str = "event_type") -> str:
    """DuckDB oracle for :func:`runs_test_by_group` — the same
    ceil-rank median, tie exclusion, lag()-counted runs and identical
    float z."""
    return f"""
WITH t AS (
    SELECT {group_col} AS g, event_id, ts,
           CAST(round(value * 100) AS BIGINT) AS c
    FROM {src}
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
s AS (
    SELECT t.g, t.c > med.med_c AS up,
           lag(t.c > med.med_c) OVER (
               PARTITION BY t.g ORDER BY t.ts, t.event_id) AS prev
    FROM t JOIN med ON t.g = med.g
    WHERE t.c != med.med_c
),
agg AS (
    SELECT g,
           CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN up THEN 0 ELSE 1 END) AS BIGINT) AS n2,
           CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND up != prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS runs
    FROM s GROUP BY g
)
SELECT g AS {group_col}, n1 AS n_above, n2 AS n_below, runs,
       CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 >= 2
             AND CAST(2 * n1 * n2 AS HUGEINT)
                 * (2 * n1 * n2 - n1 - n2) > 0
            THEN (CAST(runs AS DOUBLE)
                  - (1.0 + CAST(2 * n1 * n2 AS DOUBLE)
                           / CAST(n1 + n2 AS DOUBLE)))
                 / sqrt(CAST(CAST(2 * n1 * n2 AS HUGEINT)
                             * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
                        / CAST(CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                               * (n1 + n2 - 1) AS DOUBLE))
       END AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# Time-to-convert statistics over completed funnels
# ---------------------------------------------------------------------------


def funnel_time_stats(
    ds: rd.Dataset, steps: tuple[str, ...] = FUNNEL_STEPS
) -> pa.Table:
    """Time-to-convert over COMPLETED funnels — "how long does
    signup -> view -> purchase actually take": exact order statistics
    (median, p95 by the ceil-rank rule) plus min/max of ``ts_K -
    ts_1`` in microseconds, over users who completed every step.
    :func:`funnel` answers WHO converts; this answers HOW FAST —
    the composition every growth dashboard pairs.

    All-integer: durations are epoch-µs differences of the funnel's
    greedy-earliest step timestamps (a well-defined property of the
    event set — the funnel's own guarantee), and every output is an
    actual duration from the data.  Plan: the funnel exchange, then
    in-map (duration, count) partials + ONE duration groupby (the
    value-histogram device; |distinct durations| bounded by converted
    users — the grouped_quantiles honesty note applies) and a driver
    walk of the histogram.  Zero converted users -> typed NULL row.
    """
    import ray
    from ray.data.aggregate import Sum

    k = len(tuple(steps))
    fu = funnel(ds, steps=tuple(steps))

    def durations(b: pa.Table) -> pa.Table:
        done = pc.equal(b.column("steps_completed"), k)
        b = b.filter(done)
        t1 = b.column("ts_1").cast(pa.int64()).to_numpy(zero_copy_only=False)
        tk = b.column(f"ts_{k}").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = tk - t1
        t = pa.table({"d": pa.array(d, pa.int64())})
        out = t.group_by(["d"]).aggregate([([], "count_all")])
        return out.rename_columns(["d", "m"])

    hist = (
        fu.map_batches(durations, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("m", alias_name="m"))
    )
    tabs = [t for t in ray.get(hist.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table(
            {
                "n_converted": pa.array([0], pa.int64()),
                "med_us": pa.array([None], pa.int64()),
                "p95_us": pa.array([None], pa.int64()),
                "min_us": pa.array([None], pa.int64()),
                "max_us": pa.array([None], pa.int64()),
            }
        )
    t = pa.concat_tables(tabs)
    d = t.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
    m = t.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d)
    d, m = d[order], m[order]
    cum = np.cumsum(m)
    n = int(cum[-1])
    med = int(d[np.searchsorted(cum, (n + 1) // 2)])
    p95 = int(d[np.searchsorted(cum, (19 * n + 19) // 20)])
    return pa.table(
        {
            "n_converted": pa.array([n], pa.int64()),
            "med_us": pa.array([med], pa.int64()),
            "p95_us": pa.array([p95], pa.int64()),
            "min_us": pa.array([int(d[0])], pa.int64()),
            "max_us": pa.array([int(d[-1])], pa.int64()),
        }
    )


def funnel_time_stats_sql(
    src: str, steps: tuple[str, ...] = FUNNEL_STEPS
) -> str:
    """DuckDB oracle for :func:`funnel_time_stats` — the composed
    funnel twin, the same ceil-rank statistics over the duration
    histogram."""
    k = len(tuple(steps))
    return f"""
WITH f AS ({funnel_sql(src, steps=tuple(steps))}),
dur AS (
    SELECT epoch_us(ts_{k}) - epoch_us(ts_1) AS d
    FROM f WHERE steps_completed = {k}
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dur),
cnt AS (SELECT d, count(*) AS m FROM dur GROUP BY d),
cum AS (SELECT d, sum(m) OVER (ORDER BY d) AS cm FROM cnt)
SELECT nn.n AS n_converted,
       CASE WHEN nn.n > 0 THEN (SELECT CAST(min(d) AS BIGINT) FROM cum
                                WHERE cm >= (nn.n + 1) // 2) END AS med_us,
       CASE WHEN nn.n > 0 THEN (SELECT CAST(min(d) AS BIGINT) FROM cum
                                WHERE cm >= (19 * nn.n + 19) // 20)
       END AS p95_us,
       CASE WHEN nn.n > 0
            THEN (SELECT CAST(min(d) AS BIGINT) FROM dur) END AS min_us,
       CASE WHEN nn.n > 0
            THEN (SELECT CAST(max(d) AS BIGINT) FROM dur) END AS max_us
FROM nn
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier time-to-churn survival curve
# ---------------------------------------------------------------------------

KM_TARGET_TYPE = "purchase"


def km_survival(
    ds: rd.Dataset, target_type: str = KM_TARGET_TYPE
) -> pa.Table:
    """Kaplan-Meier curve for time-to-first-``target_type`` (Kaplan &
    Meier 1958) — THE censoring-correct conversion-latency analysis:
    a user's clock starts at their first event; the event of interest
    is their first ``target_type``; users who never reach it are
    CENSORED at their last observed day — and dropping them (the
    naive mistake) biases conversion latency optimistic, because the
    slowest users are exactly the not-yet-converted.  Output one row
    per event time t with the risk set, event count and ``S(t) =
    prod_{j<=t} (1 - d_j/n_j)``.

    Exactness: all times and counts are exact integer days; each KM
    factor is a ratio of exact ints, so its log quantizes by the NB
    rule (``floor(ln(x)*1e6 + 0.5)`` of the same double both
    engines) and the survival PRODUCT becomes an exact int64 SUM of
    quantized logs with one exp at the end; a zero factor (everyone
    at risk converts) pins S to exactly 0.0 from then on,
    flag-propagated identically in the twin.

    Plan: per-user (first_day, last_day, first_target_day) from
    fully ADDITIVE in-map min partials (a sentinel stands for "never
    converted" — Min-safe) + ONE user groupby — no map_groups; the KM
    table folds on the driver over the LIFETIME HISTOGRAM, bounded by
    calendar days, never users.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    us_day = 86_400_000_000
    SENT = np.iinfo(np.int64).max

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // us_day
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        tday = np.where(et == target_type, day, SENT)
        t = pa.table(
            {
                "u": b.column("user_id"),
                "d": pa.array(day, pa.int64()),
                "p": pa.array(tday, pa.int64()),
            }
        )
        out = t.group_by(["u"]).aggregate(
            [("d", "min"), ("d", "max"), ("p", "min")]
        )
        return out.rename_columns(["u", "f", "l", "p"])

    spans = (
        ds.select_columns(["user_id", "event_type", "ts"])
        .map_batches(
            lambda b: partial(b.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("u")
        .aggregate(
            Min("f", alias_name="f"),
            Max("l", alias_name="l"),
            Min("p", alias_name="p"),
        )
        .materialize()
    )

    def hist(b: pa.Table) -> pa.Table:
        f = b.column("f").to_numpy(zero_copy_only=False).astype(np.int64)
        l = b.column("l").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        conv = p != SENT
        t = np.where(conv, p - f, l - f)
        tt = pa.table(
            {
                "t": pa.array(t, pa.int64()),
                "d": pa.array(conv.astype(np.int64), pa.int64()),
                "m": pa.array(np.ones(len(t), np.int64), pa.int64()),
            }
        )
        out = tt.group_by(["t"]).aggregate([("d", "sum"), ("m", "sum")])
        return out.rename_columns(["t", "d", "m"])

    hrows = (
        spans.map_batches(hist, batch_format="pyarrow")
        .groupby("t")
        .aggregate(Sum("d", alias_name="d"), Sum("m", alias_name="m"))
    )
    tabs = [t for t in ray.get(hrows.materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table(
        {
            "t_days": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "survival": pa.array([], pa.float64()),
        }
    )
    if not tabs:
        return empty
    tb = pa.concat_tables(tabs)
    ts_ = tb.column("t").to_numpy(zero_copy_only=False).astype(np.int64)
    dd = tb.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
    mm = tb.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ts_)
    ts_, dd, mm = ts_[order], dd[order], mm[order]
    total = int(mm.sum())
    prior = np.concatenate(([0], np.cumsum(mm)[:-1]))
    import math

    rows = []
    lnsum = 0
    dead = False
    for t, d, pr in zip(ts_, dd, prior):
        n_risk = total - int(pr)
        if d == 0:
            continue
        if d >= n_risk:
            dead = True
        if not dead:
            lnsum += int(
                math.floor(
                    math.log((n_risk - int(d)) / n_risk) * 1e6 + 0.5
                )
            )
        s_ = 0.0 if dead else math.exp(lnsum / 1e6)
        rows.append((int(t), n_risk, int(d), s_))
    if not rows:
        return empty
    return pa.table(
        {
            "t_days": pa.array([r[0] for r in rows], pa.int64()),
            "n_risk": pa.array([r[1] for r in rows], pa.int64()),
            "n_events": pa.array([r[2] for r in rows], pa.int64()),
            "survival": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def km_survival_sql(src: str,
                    target_type: str = KM_TARGET_TYPE) -> str:
    """DuckDB oracle for :func:`km_survival` — the same censoring
    rule, the same quantized-log product, the same dead-flag
    propagation."""
    return f"""
WITH ud AS (
    SELECT user_id AS u,
           min(epoch_us(ts) // 86400000000) AS f,
           max(epoch_us(ts) // 86400000000) AS l,
           min(CASE WHEN event_type = '{target_type}'
                    THEN epoch_us(ts) // 86400000000 END) AS p
    FROM {src} GROUP BY u
),
obs AS (
    SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE l - f END AS t,
           CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS churn
    FROM ud
),
ev AS (
    SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS m
    FROM obs GROUP BY t
),
r AS (
    SELECT t, d, m,
           CAST((SELECT count(*) FROM obs) AS BIGINT)
           - CAST(COALESCE(SUM(m) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
    FROM ev
),
km AS (
    SELECT t, d, n_risk,
           MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
           SUM(CASE WHEN d > 0 AND d < n_risk
                    THEN CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                                       / CAST(n_risk AS DOUBLE))
                                    * 1000000.0 + 0.5) AS BIGINT)
                    ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum
    FROM r
)
SELECT t AS t_days, n_risk, d AS n_events,
       CASE WHEN dead = 1 THEN 0.0
            ELSE exp(CAST(lnsum AS DOUBLE) / 1000000.0) END AS survival
FROM km WHERE d > 0
ORDER BY t
"""
