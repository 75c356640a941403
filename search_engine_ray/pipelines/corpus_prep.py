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
