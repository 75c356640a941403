"""Temporal joins over the ``events`` table — the as-of join a
training-data / analytics pipeline needs that neither the reference nor
Ray Data provides natively (SURVEY.md §2.9; prompt custom-operator
recipe (a): a composition of map_batches + groupby().map_groups, with
the partitioning assumption documented).

``asof_join``: for every LEFT event (e.g. each ``purchase``), the most
recent RIGHT event (e.g. the preceding ``click``) of the SAME user with
``r.ts <= l.ts``; ties on ts break by highest event_id (deterministic —
SQL ``ASOF JOIN`` leaves the tie unspecified, so the oracle uses an
explicit row_number formulation instead).

Scale notes: ONE shuffle (groupby user_id); per-user matching is a
vectorized searchsorted over that user's time-sorted right side — the
documented partitioning assumption is that a single user's events fit a
task (the same assumption as session_windows; a hot user needs
time-range salting with boundary carry-over of the last right event per
salt range).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

LEFT_TYPE = "purchase"
RIGHT_TYPE = "click"


def asof_join(
    ds: rd.Dataset,
    left_type: str = LEFT_TYPE,
    right_type: str = RIGHT_TYPE,
) -> rd.Dataset:
    """(event_id, ts, user_id, value, prior_event_id, prior_ts,
    prior_value) — left rows keep NULL prior_* when no right event
    precedes them (left-outer as-of)."""

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b.column("event_type"),
            value_set=pa.array([left_type, right_type], pa.string()),
        )
        return (
            b.filter(keep)
            .select(["event_id", "ts", "user_id", "event_type", "value"])
            .replace_schema_metadata(None)
        )

    def match(group: pa.Table) -> pa.Table:
        et = group.column("event_type")
        left = group.filter(pc.equal(et, left_type))
        right = group.filter(pc.equal(et, right_type))
        if left.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        # right sorted by (ts, event_id): searchsorted picks the
        # greatest event_id among equal-ts candidates
        r_ts = right.column("ts").cast(pa.int64()).to_numpy()
        r_id = right.column("event_id").to_numpy()
        r_val = right.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((r_id, r_ts))
        r_ts, r_id, r_val = r_ts[order], r_id[order], r_val[order]
        l_ts = left.column("ts").cast(pa.int64()).to_numpy()
        pos = np.searchsorted(r_ts, l_ts, side="right") - 1
        has = pos >= 0
        posc = np.clip(pos, 0, max(0, len(r_ts) - 1))
        return pa.table(
            {
                "event_id": left.column("event_id"),
                "ts": left.column("ts"),
                "user_id": left.column("user_id"),
                "value": left.column("value"),
                "prior_event_id": pa.array(
                    np.where(has, r_id[posc] if len(r_ts) else 0, 0),
                    pa.int64(),
                    mask=~has,
                ),
                "prior_ts": pa.array(
                    np.where(has, r_ts[posc] if len(r_ts) else 0, 0),
                    pa.int64(),
                    mask=~has,
                ).cast(pa.timestamp("us")),
                "prior_value": pa.array(
                    np.where(has, r_val[posc] if len(r_ts) else 0.0, 0.0),
                    pa.float64(),
                    mask=~has,
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(match, batch_format="pyarrow")
    )


def asof_join_salted(
    ds: rd.Dataset,
    left_type: str = LEFT_TYPE,
    right_type: str = RIGHT_TYPE,
    salt_hours: int = 24,
) -> rd.Dataset:
    """Hot-user-safe as-of join — the time-range-salted scale path the
    ``asof_join`` docstring promises. Pass 1 shuffles on
    ``(user_id, time bucket)`` and matches within the bucket; it emits
    (a) resolved left rows, (b) UNRESOLVED left rows (no in-bucket
    prior — their true prior lives in an earlier bucket), and (c) one
    per-bucket summary row: the bucket's LAST right event. Pass 2 is a
    user-keyed groupby over only (b) + (c): each unresolved left takes
    the latest summary from any earlier bucket. Row count of pass 2 is
    O(unresolved lefts + users x buckets) ≪ events when right events
    are common; when they are rare the right side is small anyway.
    Output pinned exactly equal to ``asof_join`` (shared SQL oracle)."""
    salt_us = salt_hours * 3_600 * 1_000_000

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b.column("event_type"),
            value_set=pa.array([left_type, right_type], pa.string()),
        )
        b = b.filter(keep)
        bucket = pc.divide(b.column("ts").cast(pa.int64()), salt_us)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
                "user_id": b.column("user_id"),
                "bucket": bucket,
                "event_type": b.column("event_type"),
                "value": b.column("value"),
            }
        ).replace_schema_metadata(None)

    # pass-1 output: kind 0 = resolved left, 1 = unresolved left,
    # 2 = bucket's last-right summary (prior_* carry the right event)
    def match_bucket(group: pa.Table) -> pa.Table:
        et = group.column("event_type")
        left = group.filter(pc.equal(et, left_type))
        right = group.filter(pc.equal(et, right_type))
        parts = []
        r_ts = right.column("ts").cast(pa.int64()).to_numpy()
        r_id = right.column("event_id").to_numpy()
        r_val = right.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((r_id, r_ts))
        r_ts, r_id, r_val = r_ts[order], r_id[order], r_val[order]
        if left.num_rows:
            l_ts = left.column("ts").cast(pa.int64()).to_numpy()
            pos = np.searchsorted(r_ts, l_ts, side="right") - 1
            has = pos >= 0
            posc = np.clip(pos, 0, max(0, len(r_ts) - 1))
            parts.append(
                pa.table(
                    {
                        "kind": pa.array(np.where(has, 0, 1).astype(np.int8), pa.int8()),
                        "bucket": left.column("bucket"),
                        "event_id": left.column("event_id"),
                        "ts": left.column("ts"),
                        "user_id": left.column("user_id"),
                        "value": left.column("value"),
                        "prior_event_id": pa.array(
                            np.where(has, r_id[posc] if len(r_ts) else 0, 0),
                            pa.int64(), mask=~has,
                        ),
                        "prior_ts": pa.array(
                            np.where(has, r_ts[posc] if len(r_ts) else 0, 0),
                            pa.int64(), mask=~has,
                        ),
                        "prior_value": pa.array(
                            np.where(has, r_val[posc] if len(r_ts) else 0.0, 0.0),
                            pa.float64(), mask=~has,
                        ),
                    }
                )
            )
        if len(r_ts):
            parts.append(
                pa.table(
                    {
                        "kind": pa.array([np.int8(2)], pa.int8()),
                        "bucket": pa.array([group.column("bucket")[0].as_py()], pa.int64()),
                        "event_id": pa.array([0], pa.int64()),
                        "ts": pa.array([int(r_ts[-1])], pa.int64()).cast(pa.timestamp("us")),
                        "user_id": pa.array([group.column("user_id")[0].as_py()], pa.int64()),
                        "value": pa.array([0.0], pa.float64()),
                        "prior_event_id": pa.array([int(r_id[-1])], pa.int64()),
                        "prior_ts": pa.array([int(r_ts[-1])], pa.int64()),
                        "prior_value": pa.array([float(r_val[-1])], pa.float64()),
                    }
                )
            )
        if not parts:
            return _PASS1_SCHEMA.empty_table()
        return pa.concat_tables(parts).cast(_PASS1_SCHEMA)

    pass1 = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "bucket"])
        .map_groups(match_bucket, batch_format="pyarrow")
        .materialize()  # two consumers below
    )

    def keep_kind(*kinds: int):
        ks = list(kinds)

        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column("kind"), value_set=pa.array(ks, pa.int8())))

        return f

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
                "user_id": b.column("user_id"),
                "value": b.column("value"),
                "prior_event_id": b.column("prior_event_id"),
                "prior_ts": b.column("prior_ts").cast(pa.timestamp("us")),
                "prior_value": b.column("prior_value"),
            }
        )

    resolved = pass1.map_batches(keep_kind(0), batch_format="pyarrow").map_batches(
        finish, batch_format="pyarrow"
    )

    def resolve_carry(group: pa.Table) -> pa.Table:
        kinds = group.column("kind").to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(kinds == 1))
        summ = group.filter(pa.array(kinds == 2))
        if lefts.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        s_bkt = summ.column("bucket").to_numpy()
        o = np.argsort(s_bkt, kind="stable")
        s_bkt = s_bkt[o]
        s_id = summ.column("prior_event_id").to_numpy(zero_copy_only=False)[o]
        s_ts = summ.column("prior_ts").to_numpy(zero_copy_only=False)[o]
        s_val = summ.column("prior_value").to_numpy(zero_copy_only=False)[o]
        l_bkt = lefts.column("bucket").to_numpy()
        # latest summary strictly BEFORE the left's bucket (in-bucket
        # priors were already handled in pass 1)
        pos = np.searchsorted(s_bkt, l_bkt, side="left") - 1
        has = pos >= 0
        posc = np.clip(pos, 0, max(0, len(s_bkt) - 1))
        return pa.table(
            {
                "event_id": lefts.column("event_id"),
                "ts": lefts.column("ts"),
                "user_id": lefts.column("user_id"),
                "value": lefts.column("value"),
                "prior_event_id": pa.array(
                    np.where(has, s_id[posc] if len(s_bkt) else 0, 0),
                    pa.int64(), mask=~has,
                ),
                "prior_ts": pa.array(
                    np.where(has, s_ts[posc] if len(s_bkt) else 0, 0),
                    pa.int64(), mask=~has,
                ).cast(pa.timestamp("us")),
                "prior_value": pa.array(
                    np.where(has, s_val[posc] if len(s_bkt) else 0.0, 0.0),
                    pa.float64(), mask=~has,
                ),
            }
        )

    carried = (
        pass1.map_batches(keep_kind(1, 2), batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(resolve_carry, batch_format="pyarrow")
    )
    return resolved.union(carried)


_PASS1_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),
        ("bucket", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("value", pa.float64()),
        ("prior_event_id", pa.int64()),
        ("prior_ts", pa.int64()),
        ("prior_value", pa.float64()),
    ]
)


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("value", pa.float64()),
        ("prior_event_id", pa.int64()),
        ("prior_ts", pa.timestamp("us")),
        ("prior_value", pa.float64()),
    ]
)


def asof_join_sql(
    src: str, left_type: str = LEFT_TYPE, right_type: str = RIGHT_TYPE
) -> str:
    """Explicit row_number formulation (not native ASOF JOIN) so the
    equal-ts tiebreak — highest event_id — is pinned, matching the
    engine exactly."""
    return f"""
WITH l AS (SELECT event_id, ts, user_id, value FROM {src}
           WHERE event_type = '{left_type}'),
     r AS (SELECT event_id, ts, user_id, value FROM {src}
           WHERE event_type = '{right_type}'),
     pairs AS (
        SELECT l.event_id, l.ts, l.user_id, l.value,
               r.event_id AS prior_event_id, r.ts AS prior_ts,
               r.value AS prior_value,
               row_number() OVER (
                   PARTITION BY l.event_id
                   ORDER BY r.ts DESC, r.event_id DESC) AS rn
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND r.ts <= l.ts
     )
SELECT event_id, ts, user_id, value,
       prior_event_id, prior_ts, prior_value
FROM pairs WHERE rn = 1
"""
