"""Deterministic sampling and split assignment for training-data
pipelines over the ``documents`` table: Bernoulli hash-sampling,
per-stratum rate sampling, and train/val/test split labeling.

All three are pure per-batch maps — ZERO shuffles, no driver state, no
randomness source: membership is a threshold test on the md5 of
``"{seed}:{id}"``, so a row's verdict is reproducible across runs,
cluster sizes, partitionings and engines (the DuckDB oracle computes the
SAME digest). That determinism is the point at 100 TB: a re-run or a
resumed partition samples identically, and train/test assignment can be
recomputed anywhere without carrying a membership table.

The threshold compares the first 15 hex digits of the digest (60 bits)
against ``floor(fraction * 16^15)`` rendered as a fixed-width hex
string — a lexicographic compare on lowercase fixed-length hex IS the
numeric compare, and both Python's ``hexdigest`` and DuckDB's ``md5()``
emit lowercase hex, so engine and oracle agree bit-for-bit.

The reference engine has no sampling surface (it indexes every crawled
page); this module is part of the LLM-training-data extension surface
alongside :mod:`search_engine_ray.functions.dedup`.
"""

from __future__ import annotations

import hashlib

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_HEX_DIGITS = 15  # 60 bits: fraction resolution ~1e-18, far below row counts
_SPACE = 16 ** _HEX_DIGITS


def _hex_threshold(fraction: float) -> str:
    """``floor(fraction * 16^15)`` as a 15-digit lowercase hex string.

    fraction >= 1.0 returns ``"g"``, which sorts above every hex digest
    in both Arrow and DuckDB (ASCII compare) — a true keep-all under the
    strict ``<`` the samplers use."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(min(int(f * _SPACE), _SPACE - 1), "015x")


def _digests(seed: int, ids) -> pa.Array:
    """First 15 md5 hex digits of ``"{seed}:{id}"`` per id (the id is
    rendered as a decimal string — identical to the SQL CAST)."""
    pre = f"{seed}:".encode()
    return pa.array(
        [hashlib.md5(pre + str(i).encode()).hexdigest()[:_HEX_DIGITS] for i in ids],
        pa.string(),
    )


def sample_hash(
    ds: rd.Dataset,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
    complement: bool = False,
) -> rd.Dataset:
    """Deterministic Bernoulli sample: keep rows whose id-digest falls
    below the fraction threshold (``complement=True`` keeps the rest —
    the two calls partition the input exactly). Pure map — streams at
    any scale."""
    thresh = _hex_threshold(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        d = _digests(seed, batch.column(id_col).to_pylist())
        mask = pc.less(d, pa.scalar(thresh))
        return batch.filter(pc.invert(mask) if complement else mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_hash_sql(src: str, fraction: float, id_col: str = "doc_id",
                    seed: int = 42, complement: bool = False) -> str:
    """DuckDB oracle for :func:`sample_hash` (same digest, same compare)."""
    thresh = _hex_threshold(fraction)
    op = ">=" if complement else "<"
    return f"""
SELECT * FROM {src}
WHERE substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, {_HEX_DIGITS}) {op} '{thresh}'
"""


def sample_stratified(
    ds: rd.Dataset,
    fractions: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> rd.Dataset:
    """Per-stratum deterministic sampling: each stratum keeps its own
    rate (e.g. downsample a crawl-heavy source, keep all of a curated
    one). Still a pure map — the rate table rides the closure (it is
    stratum-cardinality-sized, not data-sized); no shuffle, no groupby."""
    thresholds = {k: _hex_threshold(v) for k, v in fractions.items()}
    default_t = _hex_threshold(default_fraction)

    def keep(batch: pa.Table) -> pa.Table:
        d = _digests(seed, batch.column(id_col).to_pylist())
        strata = batch.column(stratum_col).to_pylist()
        t = pa.array([thresholds.get(s, default_t) for s in strata], pa.string())
        return batch.filter(pc.less(d, t))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_stratified_sql(src: str, fractions: dict[str, float],
                          stratum_col: str = "source", id_col: str = "doc_id",
                          seed: int = 42, default_fraction: float = 0.0) -> str:
    """DuckDB oracle for :func:`sample_stratified`."""
    cases = "\n".join(
        f"        WHEN '{k}' THEN '{_hex_threshold(v)}'" for k, v in fractions.items()
    )
    return f"""
SELECT * FROM {src}
WHERE substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, {_HEX_DIGITS}) <
    (CASE {stratum_col}
{cases}
        ELSE '{_hex_threshold(default_fraction)}'
    END)
"""


def assign_splits(
    ds: rd.Dataset,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> rd.Dataset:
    """Label every row with a deterministic train/val/test split drawn
    from ``weights`` (must sum to <= 1; remainder falls in the LAST
    split). A row's split never changes across runs or repartitionings,
    and membership needs no stored table — the property a 100 TB corpus
    split actually requires. Pure map, zero shuffle."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    cum, edges = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        edges.append(_hex_threshold(cum))

    def label(batch: pa.Table) -> pa.Table:
        d = _digests(seed, batch.column(id_col).to_pylist())
        out = pa.array([names[-1]] * batch.num_rows, pa.string())
        # assign from the last boundary down so earlier (smaller) bands win
        for name, edge in zip(reversed(names[:-1]), reversed(edges)):
            out = pc.if_else(pc.less(d, pa.scalar(edge)), pa.scalar(name), out)
        return batch.append_column("split", out)

    return ds.map_batches(label, batch_format="pyarrow")


def assign_splits_sql(src: str, weights: dict[str, float] | None = None,
                      id_col: str = "doc_id", seed: int = 42) -> str:
    """DuckDB oracle for :func:`assign_splits`."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(weights)
    cum, whens = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        whens.append(f"        WHEN h < '{_hex_threshold(cum)}' THEN '{name}'")
    body = "\n".join(whens)
    return f"""
WITH h AS (
    SELECT *, substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, {_HEX_DIGITS}) AS h
    FROM {src}
)
SELECT * EXCLUDE (h),
    CASE
{body}
        ELSE '{names[-1]}'
    END AS split
FROM h
"""


# ---------------------------------------------------------------------------
# Mixture (temperature) sampling across sources
# ---------------------------------------------------------------------------

_W_SCALE = 1 << 20  # weight quantization: makes the cross-source sum integer


def source_counts(ds: rd.Dataset, stratum_col: str = "source") -> dict[str, int]:
    """Per-stratum row counts: per-batch Arrow value_counts partials →
    one stratum-cardinality groupby → a tiny driver dict (strata are
    config-sized — sources, not rows)."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([stratum_col]).group_by([stratum_col]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([stratum_col, "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(stratum_col)
        .aggregate(Sum("n", alias_name="n"))
    )
    out: dict[str, int] = {}
    for t in ray.get(agg.materialize().to_arrow_refs()):
        for r in t.to_pylist():
            out[r[stratum_col]] = int(r["n"])
    return out


def mixture_fractions(
    counts: dict[str, int], alpha: float, total_target: int,
) -> dict[str, float]:
    """Temperature-reweighted per-source keep fractions (the mT5 /
    multilingual-mixing rule): source weight ∝ n^alpha — alpha 1.0 is
    proportional (natural mix), 0.0 is uniform (every source equal),
    between flattens the head and boosts the tail. Every step is
    reproducible by the SQL twin on this box: ``math.pow`` IS libm's
    pow (the same one DuckDB calls — numpy's SIMD power can differ by
    an ulp, so it is deliberately NOT used), weights quantize to
    integers ``floor(n^alpha * 2^20)`` so the cross-source sum is an
    ORDER-FREE integer (a float sum would inherit SQL's unspecified
    aggregation order), targets are integer ``total * s_i // W``, and
    the final fraction is one correctly-rounded division of exact
    ints. Fractions cap at 1.0 (a tail source smaller than its target
    keeps everything — no oversampling/replication here)."""
    import math

    if not counts or total_target < 0:
        return {}
    s = {k: int(math.pow(n, alpha) * _W_SCALE) for k, n in counts.items()}
    w_total = sum(s.values())
    if w_total <= 0:
        return {k: 0.0 for k in counts}
    return {
        k: min((total_target * s[k] // w_total) / counts[k], 1.0)
        if counts[k] else 0.0
        for k in counts
    }


def sample_mixture(
    ds: rd.Dataset,
    alpha: float = 0.5,
    total_target: int = 0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> rd.Dataset:
    """Deterministic mixture sampling: ONE cheap counts pass fixes the
    per-source temperature fractions driver-side, then membership is
    the stratified md5-threshold map — zero shuffles on the data pass,
    reproducible at any scale/partitioning (the property a 100 TB
    mixture re-run needs). The realized per-source count is Binomial
    around its target (hash thresholding selects by digest, not by
    rank) — exact-count quotas would need a per-source rank pass."""
    counts = source_counts(ds, stratum_col)
    fr = mixture_fractions(counts, alpha, total_target)
    return sample_stratified(ds, fr, stratum_col=stratum_col,
                             id_col=id_col, seed=seed)


def sample_mixture_sql(
    src: str,
    alpha: float = 0.5,
    total_target: int = 0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`sample_mixture` — and, unlike the
    stratified oracle (which embeds caller-chosen rates), this one
    REcomputes the whole temperature weighting in SQL: pow -> integer
    quantized weights -> order-free integer sum -> integer targets ->
    one double division -> the 60-bit hex threshold. Only the pow call
    is libm-trust (same shared library both engines); everything else
    is exact integer math."""
    space = 16 ** _HEX_DIGITS
    return f"""
WITH counts AS (
    SELECT {stratum_col} AS stratum, count(*) AS n FROM {src} GROUP BY 1
),
sw AS (
    SELECT stratum, n,
           CAST(floor(pow(CAST(n AS DOUBLE), {alpha!r}) * {_W_SCALE}) AS BIGINT) AS s
    FROM counts
),
tot AS (SELECT sum(s) AS w FROM sw),
fr AS (
    SELECT stratum,
           least(CAST(({total_target} * sw.s) // t.w AS DOUBLE) / sw.n, 1.0) AS f
    FROM sw CROSS JOIN tot t
),
th AS (
    SELECT stratum,
           CASE WHEN f >= 1.0 THEN 'g'
                ELSE printf('%015x',
                    least(CAST(floor(f * {float(space)!r}) AS BIGINT), {space - 1}))
           END AS thresh
    FROM fr
)
SELECT d.* FROM {src} d JOIN th ON th.stratum = d.{stratum_col}
WHERE substr(md5('{seed}:' || CAST(d.{id_col} AS VARCHAR)), 1, {_HEX_DIGITS})
      < th.thresh
"""


# ---------------------------------------------------------------------------
# Balanced cap sampling (keep at most N per group by hash rank)
# ---------------------------------------------------------------------------

BALANCED_BROADCAST_MAX_IDS = 2_000_000  # enforced kept-id broadcast bound


def sample_balanced(
    ds: rd.Dataset,
    n_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> rd.Dataset:
    """Group-balanced downsampling — cap every group (source, cluster,
    domain) at ``n_per_group`` rows, the curation move that stops a
    crawl-heavy source or a mega-cluster from dominating a training
    mix (the cluster-balancing step of SemDeDup-style pipelines;
    :func:`sample_stratified` is its RATE-based sibling, this one is
    COUNT-based).  Deterministic: a group keeps its ``n_per_group``
    rows of smallest ``md5(seed:id)`` digest, (digest, id)-ordered —
    reproducible at any block layout, partitioning or cluster size,
    and recomputable by the SQL twin bit-for-bit.

    Scale shape: a per-batch map prunes each (batch, group) to its
    partial top-N CANDIDATE KEYS only — (group, digest, id), never the
    rows — so the single groupby exchange carries <= N x groups x
    blocks key rows; the fold emits the global winners and the kept-id
    set broadcasts once (``ray.put``) to a membership filter map.  The
    broadcast is N x n_groups ids, bounded by construction and
    enforced at ``BALANCED_BROADCAST_MAX_IDS`` (the planner's 2M rule)
    — above it, the filter belongs in an id-keyed join, refused loudly
    rather than silently materialized."""
    import numpy as np
    import ray

    n = int(n_per_group)
    if n < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")

    def candidates(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        d = _digests(seed, ids.to_pylist())
        t = pa.table({
            "g": batch.column(group_col),
            "d": d,
            id_col: ids,
        }).sort_by([("g", "ascending"), ("d", "ascending"),
                    (id_col, "ascending")])
        g = t.column("g").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        keep = np.concatenate([
            np.arange(s, min(s + n, e)) for s, e in zip(starts, ends)
        ]) if len(g) else np.empty(0, np.int64)
        return t.take(pa.array(keep, pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        return group.sort_by(
            [("d", "ascending"), (id_col, "ascending")]
        ).slice(0, n)

    kept_tbl = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
        .select_columns([id_col])
    )
    kept_ids = set()
    for b in kept_tbl.iter_batches(batch_format="pyarrow"):
        kept_ids.update(b.column(id_col).to_pylist())
        if len(kept_ids) > BALANCED_BROADCAST_MAX_IDS:
            raise ValueError(
                f"kept-id set exceeds the {BALANCED_BROADCAST_MAX_IDS} "
                "broadcast bound — use an id-keyed join filter at this "
                "group count"
            )
    ref = ray.put(kept_ids)

    def member(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([i in ks for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(member, batch_format="pyarrow")


def sample_balanced_sql(src: str, n_per_group: int,
                        group_col: str = "source",
                        id_col: str = "doc_id", seed: int = 42) -> str:
    """DuckDB oracle for :func:`sample_balanced`: ``row_number()`` over
    the same (digest, id) order within each group, capped at N."""
    n = int(n_per_group)
    if n < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    return f"""
SELECT * EXCLUDE (rn) FROM (
    SELECT *,
           row_number() OVER (
               PARTITION BY {group_col}
               ORDER BY substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)),
                               1, {_HEX_DIGITS}),
                        {id_col}
           ) AS rn
    FROM {src}
) WHERE rn <= {n}
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------

_AES_HEX = 13  # 13 hex digits = 52 bits: exactly representable in float64
_AES_DEN = float(1 << 52)


def sample_weighted(
    ds: rd.Dataset,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    max_candidates: int = 2_000_000,
) -> rd.Dataset:
    """Weighted sampling WITHOUT replacement — ``n`` rows where each
    row's inclusion probability is proportional to its weight
    (Efraimidis & Spirakis 2006 A-ES: key = u^(1/w), keep the top-n
    keys; equivalently ln(u)/w, which is what both engines compute).
    The weight-biased sibling of :func:`sample_hash` — deterministic
    by construction: u derives from md5(seed:id), so the SAMPLE ITSELF
    is an exact function of (seed, ids, weights) and the SQL twin
    reproduces it row-for-row (the bloom-filter contract: approximate
    SEMANTICS, exact OUTPUT).

    Plan: the key map is zero-shuffle (per-row md5, the _digests
    pattern); each block keeps its partial top-n (id, key) CANDIDATE
    rows only, the driver merges <= n x blocks candidates (guarded),
    and the kept-id set broadcasts once for the membership filter —
    the sample_balanced shape with a weighted key.

    Exactness device: u = (first 52 md5 bits + 1) / 2^52 in (0, 1] —
    52 bits convert to float64 EXACTLY, +1 avoids ln(0); key =
    ln(u)/w is the identical double expression both engines; ties
    (impossible among distinct ids in practice, but pinned anyway)
    break by id ASC.  Rows with weight <= 0 are excluded (A-ES is
    undefined there), mirrored in the twin.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pre = f"{seed}:".encode()
        u = np.array(
            [
                int(hashlib.md5(pre + str(i).encode()).hexdigest()[:_AES_HEX], 16)
                for i in ids
            ],
            np.float64,
        )
        key = np.log((u + 1.0) / _AES_DEN) / w
        t = pa.table(
            {
                "id": batch.column(id_col),
                "key": pa.array(key, pa.float64()),
            }
        ).filter(pa.array(w > 0))
        # partial top-n candidates: a block can never contribute more
        # than n winners
        if t.num_rows > n:
            order = pc.sort_indices(
                t, sort_keys=[("key", "descending"), ("id", "ascending")]
            )
            t = t.take(order.slice(0, n))
        return t

    cand = ds.select_columns([id_col, weight_col]).map_batches(
        lambda b: keys(b.replace_schema_metadata(None)),
        batch_format="pyarrow",
    ).materialize()  # consumed by count + take_all: one execution
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"sample_weighted: {n_cand} candidate rows exceed "
            f"{max_candidates} — raise block size or lower n"
        )
    rows = cand.take_all()
    rows.sort(key=lambda r: (-r["key"], r["id"]))
    keep = sorted(r["id"] for r in rows[:n])
    keep_arr = np.array(keep, np.int64)
    import ray

    keep_ref = ray.put(keep_arr)

    def member(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, ids)
        pos[pos == len(ks)] = 0
        m = ks[pos] == ids if len(ks) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(m))

    return ds.map_batches(member, batch_format="pyarrow")


def sample_weighted_sql(
    src: str,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    cols: str = "*",
) -> str:
    """DuckDB oracle for :func:`sample_weighted` — the identical
    md5-derived uniform and key expression, top-n by (key DESC, id)."""
    u = (
        f"(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), "
        f"1, {_AES_HEX}))::BIGINT + 1.0) / {_AES_DEN!r}"
    )
    return f"""
SELECT {cols} FROM {src}
WHERE {weight_col} > 0
ORDER BY ln({u}) / {weight_col} DESC, {id_col}
LIMIT {n}
"""
