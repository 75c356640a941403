"""Semi-structured (JSON) column operators.

The events table carries a ``props: string`` JSON payload — the
semi-structured side-channel every real event stream has.  Extraction
is inherently per-record (a JSON document has no columnar shortcut),
so the parse is an honest batched-Python map — but it is ZERO-SHUFFLE
(the only exchange ships per-group integer moments), and the parse
cost is the documented price of schema-on-read, paid once per scan
exactly as in DuckDB/Spark's json_extract.

Extraction semantics mirror DuckDB's
``TRY_CAST(json_extract_string(j, '$.key') AS BIGINT)`` (probed, and
pinned by test): missing key, malformed JSON, NULL, booleans and
non-numeric strings -> NULL; integers pass through; floats and
numeric strings round half-away-from-zero.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


def _int64_or_none(v: int):
    """Mirror TRY_CAST's NULL on int64 overflow (Python ints are
    arbitrary precision; DuckDB's json path is not)."""
    return v if _INT64_MIN <= v <= _INT64_MAX else None


def _round_half_away(f: float):
    """DuckDB TRY_CAST(double AS BIGINT): half-away-from-zero, NULL on
    non-finite or out-of-int64-range values."""
    if not math.isfinite(f):
        return None
    return _int64_or_none(int(np.floor(abs(f) + 0.5) * np.sign(f)))


def _extract_int(s: str | None, key: str):
    """One record's ``TRY_CAST(json_extract_string(.) AS BIGINT)``.

    Divergence traps vs the DuckDB oracle, each mapped to NULL here as
    ``json_valid + TRY_CAST`` does there: Python ``json.loads`` accepts
    bare ``NaN``/``Infinity`` tokens (rejected via ``parse_constant``
    — DuckDB's json_valid refuses them) and arbitrary-precision ints
    (out-of-int64 values overflow ``pa.array`` — clamped to NULL like
    TRY_CAST).
    """
    if s is None:
        return None

    def _invalid(_tok):
        # a bare NaN/Infinity ANYWHERE makes json_valid() false — the
        # whole record is NULL, not just the extracted key
        raise ValueError("non-finite JSON constant")

    try:
        obj = json.loads(s, parse_constant=_invalid)
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict) or key not in obj:
        return None
    v = obj[key]
    if isinstance(v, bool):
        return None  # DuckDB: TRY_CAST('true') -> NULL
    if isinstance(v, int):
        return _int64_or_none(v)
    if isinstance(v, float):
        return _round_half_away(v)
    if isinstance(v, str):
        try:
            return _int64_or_none(int(v))
        except ValueError:
            try:
                f = float(v)
            except ValueError:
                return None
            return _round_half_away(f)
    return None


def json_field_stats(
    ds: rd.Dataset,
    json_col: str = "props",
    key: str = "k",
    group_col: str = "event_type",
) -> rd.Dataset:
    """Per-group statistics of an integer field extracted from a JSON
    column — the schema-on-read aggregate ("what does props.k look
    like per event type, and how often is it missing/broken"): n,
    null count (missing + malformed), exact int64 sum/min/max, and
    the mean as one identical float division.

    Plan: the parse is a zero-shuffle batched map (per-record by
    nature — module header); each batch pre-aggregates per group with
    Arrow ``group_by`` (count skips nulls, the SQL convention), so
    the ONE groupby ships five integers per group per block.
    """

    def partial(b: pa.Table) -> pa.Table:
        vals = [
            _extract_int(s, key) for s in b.column(json_col).to_pylist()
        ]
        t = pa.table(
            {
                "g": b.column(group_col),
                "k": pa.array(vals, pa.int64()),
            }
        )
        out = t.group_by(["g"]).aggregate(
            [
                ([], "count_all"),
                ("k", "count"),
                ("k", "sum"),
                ("k", "min"),
                ("k", "max"),
            ]
        )
        return out.rename_columns(["g", "n", "nk", "s", "mn", "mx"])

    rows = (
        ds.select_columns([group_col, json_col])
        .map_batches(
            lambda t: partial(t.replace_schema_metadata(None)),
            batch_format="pyarrow",
        )
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("nk", alias_name="nk"),
            Sum("s", alias_name="s"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = b.column("nk").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("s").to_pylist()
        avg = [
            float(int(si)) / int(ki) if ki and si is not None else None
            for si, ki in zip(s, nk)
        ]
        return pa.table(
            {
                "g": b.column("g"),
                "n": pa.array(n, pa.int64()),
                "n_null": pa.array(n - nk, pa.int64()),
                "sum_k": b.column("s").cast(pa.int64()),
                "min_k": b.column("mn").cast(pa.int64()),
                "max_k": b.column("mx").cast(pa.int64()),
                "avg_k": pa.array(avg, pa.float64()),
            }
        )

    out = rows.map_batches(finish, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.rename_columns(
            [group_col, "n", "n_null", "sum_k", "min_k", "max_k", "avg_k"]
        ),
        batch_format="pyarrow",
    )


def json_field_stats_sql(
    src: str,
    json_col: str = "props",
    key: str = "k",
    group_col: str = "event_type",
) -> str:
    """DuckDB oracle for :func:`json_field_stats` — the probed
    json_valid + TRY_CAST extraction, the same aggregates."""
    return f"""
WITH x AS (
    SELECT {group_col} AS g,
           CASE WHEN {json_col} IS NOT NULL AND json_valid({json_col})
                THEN TRY_CAST(json_extract_string({json_col}, '$.{key}')
                              AS BIGINT)
           END AS k
    FROM {src}
)
SELECT g AS {group_col},
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(k) AS BIGINT) AS n_null,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CASE WHEN count(k) > 0
            THEN CAST(sum(k) AS DOUBLE) / count(k)
       END AS avg_k
FROM x GROUP BY g
"""
