"""Composed training-data corpus preparation pipeline over the
``documents`` table — the flagship demonstration that the LLM-data
operators compose end-to-end the way a real 100 TB cleaning job runs:

    quality filter  ->  exact dedup (keep-first)  ->  near-dup cluster
    collapse (pairs -> connected components -> canonical only)  ->
    deterministic train/val/test split assignment

Scale shape per step:

1. quality filter — pure vectorized map (:func:`quality_features`),
   zero shuffle, prunes before anything pays a shuffle for the row.
2. exact dedup — ONE hash-partition groupby on the md5(text) key with
   the payload riding the shuffle (keep-first = min doc_id per group);
   nothing driver-sized.
3. near-dup collapse — a pair producer (default the exact n-gram
   Jaccard op; pass ``pair_fn=minhash_lsh_pairs`` at real scale) then
   :func:`dup_clusters` connected components. The DROP set (cluster
   members minus canonicals) is near-dup-loser-sized — orders of
   magnitude below the corpus — so broadcasting it as a sorted id
   array is the honest small-side pattern, not a scale hole.
4. split assignment — pure map; membership is the md5-threshold rule
   of :mod:`search_engine_ray.functions.sampling`, reproducible with no
   stored table.

The DuckDB oracle (:func:`corpus_prep_sql`) composes the SAME
building-block SQL generators, so the driver's comparison checks the
whole pipeline, not just its stages. The reference engine has no corpus
pipeline at all (it indexes every crawled page unconditionally,
/root/reference/src/main/java/searchengine/services/indexation) — this
module is the LLM-training-data extension surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from search_engine_ray.functions import sampling as _sampling
from search_engine_ray.functions.dedup import (
    _md5_col,
    dup_clusters,
    dup_clusters_sql,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_sql,
)
from search_engine_ray.functions.text_analysis import (
    quality_features,
    quality_features_sql,
)

QUALITY_MIN = 0.8
OUT_COLS = ["doc_id", "source", "lang", "split"]
# Above this deduped-doc count the default pair producer switches from
# the exact all-pairs n-gram Jaccard (quadratic in co-shingled docs; its
# own docstring says "at 100 TB use minhash_lsh_pairs") to MinHash-LSH.
# At/below it the exact producer is both faster (no signature pass) and
# an exact answer. Callers can still pass pair_fn explicitly.
EXACT_PAIRS_MAX_DOCS = 20_000


def corpus_prep(
    docs: rd.Dataset,
    quality_min: float = QUALITY_MIN,
    seed: int = 42,
    pair_fn=None,
) -> rd.Dataset:
    """Run the composed cleaning pipeline; returns ``OUT_COLS`` rows for
    every surviving document.

    ``pair_fn=None`` (default) picks the near-dup pair producer by
    deduped corpus size: exact :func:`ngram_jaccard_pairs` at/below
    ``EXACT_PAIRS_MAX_DOCS`` docs, :func:`minhash_lsh_pairs` above — so
    the pipeline a user runs unmodified at 100 TB never takes the
    all-pairs path (the LSH producer verifies candidates with exact
    Jaccard at the same threshold; equality of the two-backend pipeline
    outputs in the recall-1.0 regime is pinned by test)."""

    # 1. quality gate: compute features per batch, keep rows >= min.
    def qfilter(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)  # keep block schemas hashable
        feat = quality_features(batch)
        return batch.filter(
            pc.greater_equal(feat.column("quality_score"), pa.scalar(quality_min))
        )

    kept = docs.map_batches(qfilter, batch_format="pyarrow")

    # 2. exact keep-first dedup, payload rides the one md5 shuffle.
    def add_h(batch: pa.Table) -> pa.Table:
        return batch.append_column("h", _md5_col(batch.column("text")))

    def keep_first(group: pa.Table) -> pa.Table:
        i = int(np.argmin(group.column("doc_id").to_numpy(zero_copy_only=False)))
        return group.take([i]).drop_columns(["h"])

    uniq = (
        kept.map_batches(add_h, batch_format="pyarrow")
        .groupby("h")
        .map_groups(keep_first, batch_format="pyarrow")
    ).materialize()  # consumed twice: pair producer + final filter

    # 3. near-dup cluster collapse; drop non-canonical cluster members.
    if pair_fn is None:
        pair_fn = (
            ngram_jaccard_pairs
            if uniq.count() <= EXACT_PAIRS_MAX_DOCS
            else minhash_lsh_pairs
        )
    pairs = pair_fn(uniq)
    clusters = dup_clusters(pairs)
    drop_ids = np.sort(
        clusters.filter(pc.invert(clusters.column("keep")))
        .column("doc_id")
        .to_numpy(zero_copy_only=False)
    )
    drop_ref = ray.put(drop_ids)

    def drop_losers(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return batch
        pos = np.clip(np.searchsorted(d, ids), 0, len(d) - 1)
        return batch.filter(pa.array(d[pos] != ids))

    final = uniq.map_batches(drop_losers, batch_format="pyarrow")

    # 4. deterministic split label, then project.
    return _sampling.assign_splits(final, seed=seed).select_columns(OUT_COLS)


def corpus_prep_sql(
    src: str = "documents",
    quality_min: float = QUALITY_MIN,
    seed: int = 42,
) -> str:
    """DuckDB oracle composing the same stage oracles over ``src``."""
    q = quality_features_sql(src)
    # cluster closure over the pair SQL, nested as a derived table (its
    # own WITH RECURSIVE scope); pairs are computed over the CTE `uniq`,
    # which is visible inside the nested scope.
    clusters = dup_clusters_sql(ngram_jaccard_sql("uniq"))
    splits = _sampling.assign_splits_sql("final", seed=seed)
    return f"""
WITH qdocs AS (
    SELECT d.* FROM {src} d
    JOIN (SELECT doc_id FROM ({q}) WHERE quality_score >= {quality_min}) f
    USING (doc_id)
),
ex AS (
    SELECT min(doc_id) AS doc_id FROM qdocs GROUP BY md5(coalesce(text, ''))
),
uniq AS (SELECT d.* FROM qdocs d JOIN ex USING (doc_id)),
cl AS (SELECT * FROM ({clusters}) c),
final AS (
    SELECT doc_id, source, lang FROM uniq
    WHERE doc_id NOT IN (SELECT doc_id FROM cl WHERE NOT keep)
)
SELECT * FROM ({splits}) s
"""


# ---------------------------------------------------------------------------
# Quality-bucketed mixture (the CCNet head/middle/tail pipeline)
# ---------------------------------------------------------------------------

QUALITY_RATES = {"head": 1.0, "middle": 0.5, "tail": 0.1}
_Q_SCALE = 1_000_000  # avg_logprob is round6 — x1e6 is an exact integer


def quality_mixture(
    ds: rd.Dataset,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> rd.Dataset:
    """The CCNet quality-bucketed sampling pipeline (Wenzek et al.
    2020): score every doc with the corpus-self bigram LM
    (:func:`~.functions.text_analysis.lm_score`), split the score
    distribution into head/middle/tail terciles, and keep each bucket
    at its own rate — the canonical 'keep the fluent text, downsample
    the junk' mixture. Composed ENTIRELY from already-oracled ops:

    1. ``lm_score`` — the distributed LM (one groupby per gram order);
       its round-6 ``avg_logprob`` scales to an EXACT integer ``q``
       (x1e6 — a 6-dp double is within 1e-10 of the integer, so the
       round never sits near a half).
    2. tercile boundaries via :func:`~.functions.aggregates.
       quantile_sketch` — the bounded-memory fixed-grid sketch
       (distinct scores ~ doc count, so the exact value-counts
       quantile would shuffle a corpus-sized table; the sketch ships
       4096 rows and is still deterministic + SQL-recomputable).
    3. bucket assign — one pure VALUE-BASED compare map (tail < b1 <=
       middle < b2 <= head; value compares, never ranks, so ties are
       deterministic on both engines).
    4. membership — the zero-shuffle stratified md5 threshold.

    The scored frame MATERIALIZES once before fanning into the sketch
    and the bucket map (the region_revenue lesson: schema inference on
    a lazy all-to-all pipeline re-executes it).
    -> Dataset(id_col, bucket) of the kept docs."""
    from search_engine_ray.functions.aggregates import quantile_sketch
    from search_engine_ray.functions.text_analysis import lm_score

    rates = dict(QUALITY_RATES if rates is None else rates)

    scored = lm_score(ds, id_col=id_col, text_col=text_col)

    def add_q(b: pa.Table) -> pa.Table:
        v = b.column("avg_logprob").to_numpy(zero_copy_only=False)
        q = np.round(v * _Q_SCALE).astype(np.int64)
        return b.append_column("q", pa.array(q, pa.int64()))

    scored = scored.map_batches(add_q, batch_format="pyarrow").materialize()
    bounds = quantile_sketch(
        scored,
        lambda b: b.column("q").to_numpy(zero_copy_only=False),
        n_buckets=4096,
        quantiles=((1, 3), (2, 3)),
    )
    b1, b2 = bounds.column("value").to_pylist()

    def assign(b: pa.Table) -> pa.Table:
        q = b.column("q").to_numpy(zero_copy_only=False)
        bucket = np.where(q < b1, "tail", np.where(q < b2, "middle", "head"))
        return pa.table({
            id_col: b.column(id_col),
            "bucket": pa.array(bucket, pa.string()),
        })

    bucketed = scored.map_batches(assign, batch_format="pyarrow")
    return _sampling.sample_stratified(
        bucketed, rates, stratum_col="bucket", id_col=id_col, seed=seed,
    )


def quality_mixture_sql(
    src: str,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`quality_mixture` — composes the SAME
    building-block SQL (lm_score twin -> the sketch's integer grid ->
    value-based terciles -> md5 thresholds), so the driver checks the
    whole composition."""
    from search_engine_ray.functions.aggregates import quantile_sketch_sql
    from search_engine_ray.functions.sampling import (
        _HEX_DIGITS, _hex_threshold,
    )
    from search_engine_ray.functions.text_analysis import lm_score_sql

    rates = dict(QUALITY_RATES if rates is None else rates)
    sketch = quantile_sketch_sql(
        "scored_q", "q", n_buckets=4096, quantiles=((1, 3), (2, 3)),
    )
    cases = "\n".join(
        f"        WHEN '{k}' THEN '{_hex_threshold(v)}'"
        for k, v in rates.items()
    )
    return f"""
WITH scored AS ({lm_score_sql(src, id_col=id_col)}),
scored_q AS (
    SELECT {id_col},
           CAST(round(avg_logprob * {_Q_SCALE}) AS BIGINT) AS q
    FROM scored
),
bounds AS (SELECT * FROM ({sketch})),
b1 AS (SELECT value AS v FROM bounds WHERE abs(q - 1.0/3) < 1e-9),
b2 AS (SELECT value AS v FROM bounds WHERE abs(q - 2.0/3) < 1e-9),
bucketed AS (
    SELECT s.{id_col},
           CASE WHEN s.q < (SELECT v FROM b1) THEN 'tail'
                WHEN s.q < (SELECT v FROM b2) THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scored_q s
)
SELECT {id_col}, bucket FROM bucketed
WHERE substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, {_HEX_DIGITS}) <
    (CASE bucket
{cases}
        ELSE '{_hex_threshold(0.0)}'
    END)
"""


# ---------------------------------------------------------------------------
# Composed chunk-prep pipeline: span dedup -> chunk -> chunk-level dedup
# ---------------------------------------------------------------------------

_CHUNK_KEY_BITS = 32


def chunk_prep(
    ds: rd.Dataset,
    window: int | None = None,
    size: int | None = None,
    stride: int | None = None,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """The RAG-ingestion composition: corpus-wide duplicated-SPAN
    removal (ExactSubstr rewrite) -> overlapping fixed-size chunking ->
    chunk-level keep-first exact dedup — cut repeated regions first so
    chunk boundaries don't mask duplication, then drop the byte-equal
    chunks overlap still produces.  -> (doc_id, chunk_idx, n_copies)
    per SURVIVING chunk (the keep-first winner of each distinct chunk
    text, packed-key min = (doc, chunk) lexicographic min).

    Every stage is the already-oracled operator (span_dedup /
    chunk_documents / exact_dedup), composed by streaming — no stage
    materializes, and the chunk key packs (31-bit doc, 32-bit idx)
    into one int64 so the dedup exchange stays (hash, key) rows."""
    from search_engine_ray.functions.dedup import exact_dedup
    from search_engine_ray.functions.packing import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )
    from search_engine_ray.functions.text_analysis import (
        SPAN_DEDUP_W,
        span_dedup,
    )

    w = SPAN_DEDUP_W if window is None else int(window)
    sz = CHUNK_SIZE if size is None else int(size)
    st = CHUNK_STRIDE if stride is None else int(stride)
    rewritten = span_dedup(ds, window=w, id_col=id_col)
    chunks = chunk_documents(
        rewritten.select_columns([id_col, "text"]), size=sz, stride=st,
        id_col=id_col,
    )

    def pack(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ci = b.column("chunk_idx").to_numpy(zero_copy_only=False)
        # doc ids are 31-bit-validated by span_dedup upstream; chunk
        # idx is < 2^32 by the chunker's geometry
        return pa.table({
            "chunk_key": pa.array((ids << _CHUNK_KEY_BITS) | ci, pa.int64()),
            "text": b.column("text"),
        })

    kept = exact_dedup(
        chunks.map_batches(pack, batch_format="pyarrow"), id_col="chunk_key"
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b.column("chunk_key").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(k >> _CHUNK_KEY_BITS, pa.int64()),
            "chunk_idx": pa.array(k & ((1 << _CHUNK_KEY_BITS) - 1), pa.int64()),
            "n_copies": b.column("n_copies").cast(pa.int64()),
        })

    return kept.map_batches(unpack, batch_format="pyarrow")


def chunk_prep_sql(
    src: str,
    window: int | None = None,
    size: int | None = None,
    stride: int | None = None,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`chunk_prep` — the three stage twins
    composed by relation nesting (each stage's WITH chain scopes
    inside its parens, the reindex nesting precedent), with the same
    packed chunk key so keep-first min agrees bit-for-bit."""
    from search_engine_ray.functions.dedup import exact_dedup_sql
    from search_engine_ray.functions.packing import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents_sql,
    )
    from search_engine_ray.functions.text_analysis import (
        SPAN_DEDUP_W,
        span_dedup_sql,
    )

    w = SPAN_DEDUP_W if window is None else int(window)
    sz = CHUNK_SIZE if size is None else int(size)
    st = CHUNK_STRIDE if stride is None else int(stride)
    span = span_dedup_sql(src, window=w, id_col=id_col)
    chunk_src = f"(SELECT {id_col}, text FROM ({span}))"
    chunks = chunk_documents_sql(chunk_src, size=sz, stride=st, id_col=id_col)
    packed = (
        f"(SELECT {id_col} * {1 << _CHUNK_KEY_BITS} + chunk_idx AS chunk_key, "
        f"text FROM ({chunks}))"
    )
    dedup = exact_dedup_sql(packed, id_col="chunk_key")
    return f"""
SELECT CAST(chunk_key // {1 << _CHUNK_KEY_BITS} AS BIGINT) AS {id_col},
       CAST(chunk_key % {1 << _CHUNK_KEY_BITS} AS BIGINT) AS chunk_idx,
       n_copies
FROM ({dedup})
"""
