"""Deduplication operators for training-data pipelines over the
``documents`` table: exact (hash groupby), n-gram Jaccard (exact
near-dup), MinHash+LSH (approximate near-dup, the scale path), SimHash,
and embedding-cosine near-dup.

Scale notes (each op documents its shuffle):
- exact: ONE hash-partition groupby on the md5 key (text never shipped
  twice — only (hash, id) rows shuffle).
- ngram_jaccard: explodes shingles (|corpus| x shingles rows) and
  self-joins via a shingle groupby — exact but quadratic in hot-shingle
  group size; per-group pair emission is capped (``max_group``) and the
  cap is logged, because the honest scale path is LSH below.
- minhash_lsh: signatures per batch (vectorized), explode to
  (band, band_hash) rows, ONE groupby on the band key, candidate pairs
  verified with exact Jaccard — linear in corpus size, the 100 TB path.
- simhash: 64-bit signatures per batch; candidate pairs via 4x16-bit
  band grouping (docs within Hamming distance 3 share >= 1 band),
  verified by exact Hamming distance.
- embedding: per-batch cosine vs a broadcast matrix (ray.put once).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

SHINGLE_K = 3
JACCARD_THRESHOLD = 0.6
NUM_PERM = 64
LSH_BANDS = 16  # 16 bands x 4 rows: ~Jaccard 0.5 knee
SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3
EMBEDDING_COSINE_THRESHOLD = 0.4
_MERSENNE = (1 << 61) - 1


def _md5_col(texts: list[str]) -> list[str]:
    return [hashlib.md5((t or "").encode()).hexdigest() for t in texts]


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Keep-first exact dedup: one row per distinct text with the
    minimum id and the copy count. Only (hash, id) rows shuffle."""

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "h": pa.array(_md5_col(batch.column(text_col).to_pylist()), pa.string()),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


def exact_dedup_sql(src: str, id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`exact_dedup` (same md5-of-utf8 key)."""
    return (
        f"SELECT CAST(min({id_col}) AS BIGINT) AS {id_col}, "
        f"CAST(count(*) AS BIGINT) AS n_copies "
        f"FROM {src} GROUP BY md5(coalesce(text, ''))"
    )


# ---------------------------------------------------------------------------
# Shingling (shared by ngram-Jaccard and MinHash)
# ---------------------------------------------------------------------------

def _shingles_of(text: str, k: int = SHINGLE_K) -> set[str]:
    import re

    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingle_rows(batch: pa.Table, id_col: str, k: int) -> pa.Table:
    ids, sh = [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column("text").to_pylist()):
        for s in _shingles_of(t, k):
            ids.append(i)
            sh.append(s)
    return pa.table({id_col: pa.array(ids, batch.schema.field(id_col).type),
                     "shingle": pa.array(sh, pa.string())})


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    threshold: float = JACCARD_THRESHOLD,
    max_group: int = 1000,
) -> pa.Table:
    """Exact near-dup pairs with k-gram Jaccard >= threshold.

    shingle-explode -> groupby(shingle) -> pairs -> groupby(pair) count
    -> jaccard vs broadcast per-doc shingle sizes. Shingle groups larger
    than ``max_group`` docs are dropped (a shingle shared by thousands
    of docs contributes no discriminative pairs); at 100 TB use
    :func:`minhash_lsh_pairs` instead.
    """
    shingles = ds.map_batches(
        lambda b: _shingle_rows(b, id_col, k), batch_format="pyarrow"
    )
    sizes_tbl = (
        shingles.groupby(id_col).aggregate(Count(alias_name="n_sh")).to_pandas()
    )
    sizes_ref = ray.put(dict(zip(sizes_tbl[id_col], sizes_tbl["n_sh"])))

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(group.column(id_col).to_pylist()))
        if len(ids) < 2 or len(ids) > max_group:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()), "doc_b": pa.array(ids[b], pa.int64())})

    pair_counts = (
        shingles.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        sizes = ray.get(sizes_ref)
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        inter = batch.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sizes[x] for x in a], np.float64)
        nb = np.array([sizes[x] for x in b], np.float64)
        j = inter / (na + nb - inter)
        keep = j >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(np.floor(j[keep] * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    out = pair_counts.map_batches(finish, batch_format="pyarrow")
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    t = pa.concat_tables(tabs)
    return t.take(pc.sort_indices(t, sort_keys=[("doc_a", "ascending"), ("doc_b", "ascending")]))


def ngram_jaccard_sql(src: str, id_col: str = "doc_id",
                      k: int = SHINGLE_K, threshold: float = JACCARD_THRESHOLD) -> str:
    """DuckDB oracle: same shingling, exact all-pairs Jaccard."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(1, k))
    return f"""
WITH toks AS (
    SELECT {id_col}, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS t
    FROM {src}
),
sh AS (
    SELECT DISTINCT {id_col}, t[i] || ' ' || {parts} AS shingle
    FROM toks, UNNEST(range(1, len(t) - {k - 2})) AS r(i)
    WHERE len(t) >= {k}
),
sizes AS (SELECT {id_col}, count(*) AS n FROM sh GROUP BY {id_col}),
inter AS (
    SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b, count(*) AS c
    FROM sh a JOIN sh b USING (shingle)
    WHERE a.{id_col} < b.{id_col}
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
FROM inter
JOIN sizes na ON na.{id_col} = doc_a
JOIN sizes nb ON nb.{id_col} = doc_b
WHERE c * 1.0 / (na.n + nb.n - c) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(7)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation params built once per actor;
    per-batch vectorized signatures -> (id, band, band_hash) rows."""

    def __init__(self, id_col: str = "doc_id", num_perm: int = NUM_PERM,
                 bands: int = LSH_BANDS, k: int = SHINGLE_K):
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = k
        self.a, self.b = _perm_params(num_perm)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles_of(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.uint64(_MERSENNE))
        hv = np.array(
            [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") for s in sh],
            dtype=np.uint64,
        )
        # (a * h + b) mod p for all perms x shingles, vectorized
        prod = (self.a[:, None] * (hv[None, :] % _MERSENNE)) % _MERSENNE
        return ((prod + self.b[:, None]) % _MERSENNE).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for i, t in zip(batch.column(self.id_col).to_pylist(), batch.column("text").to_pylist()):
            sig = self.signature(t)
            for bnd in range(self.bands):
                seg = sig[bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
                ids.append(i)
                bands.append(bnd)
                keys.append(hashlib.md5(seg.tobytes()).hexdigest()[:16])
        return pa.table(
            {
                self.id_col: pa.array(ids, batch.schema.field(self.id_col).type),
                "band": pa.array(bands, pa.int32()),
                "band_key": pa.array(keys, pa.string()),
            }
        )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
    k: int = SHINGLE_K,
    threshold: float = JACCARD_THRESHOLD,
    concurrency=(1, 4),
) -> pa.Table:
    """Candidate pairs from LSH band collisions, verified with EXACT
    Jaccard (candidates only — the verify set is tiny relative to the
    corpus). Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sig_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"id_col": id_col, "num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(group.column(id_col).to_pylist()))
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()), "doc_b": pa.array(ids[b], pa.int64())})

    cand = (
        sig_rows.groupby(["band", "band_key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    cand_tbl = cand.to_pandas()
    if not len(cand_tbl):
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    # exact-Jaccard verify over the candidate doc set only
    need = sorted(set(cand_tbl["doc_a"]) | set(cand_tbl["doc_b"]))
    texts = (
        ds.map_batches(
            lambda b: b.select([id_col, "text"]).filter(
                pc.is_in(b.column(id_col), value_set=pa.array(need))
            ),
            batch_format="pyarrow",
        ).to_pandas()
    )
    sh = {i: _shingles_of(t, k) for i, t in zip(texts[id_col], texts["text"])}
    rows = []
    for a, b in zip(cand_tbl["doc_a"], cand_tbl["doc_b"]):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 0.0
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """Actor-pool stage: per-doc 64-bit SimHash over token md5 hashes
    weighted by tf."""

    def __init__(self, id_col: str = "doc_id"):
        import re

        self.id_col = id_col
        self.word = re.compile(r"[a-z0-9]+")

    def simhash(self, text: str) -> int:
        toks = self.word.findall((text or "").lower())
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hv = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in uniq],
            dtype=np.uint64,
        )
        bits = ((hv[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(SIMHASH_BITS, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64), pa.int64()),
            }
        )


def simhash_pairs(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    max_hamming: int = SIMHASH_MAX_HAMMING,
    concurrency=(1, 4),
) -> pa.Table:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.
    Candidates via 4x16-bit band collision (pigeonhole: distance <= 3
    guarantees one identical band), verified exactly."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency,
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        s = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        out_i, out_b, out_k, out_s = [], [], [], []
        for bnd in range(4):
            seg = (s >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            out_i.append(ids)
            out_b.append(np.full(len(ids), bnd, np.int32))
            out_k.append(seg.astype(np.int64))
            out_s.append(s.view(np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_i)),
                "band": pa.array(np.concatenate(out_b), pa.int32()),
                "band_key": pa.array(np.concatenate(out_k), pa.int64()),
                "simhash": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        sh = group.column("simhash").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        uniq, first = np.unique(ids, return_index=True)
        sh = sh[first]
        if len(uniq) < 2:
            return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int32())})
        a, b = np.triu_indices(len(uniq), k=1)
        x = sh[a].view(np.uint64) ^ sh[b].view(np.uint64)
        ham = np.array([bin(int(v)).count("1") for v in x], np.int32)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(uniq[a[keep]], pa.int64()),
                "doc_b": pa.array(uniq[b[keep]], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int32()),
            }
        )

    pairs = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(pairs.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = EMBEDDING_COSINE_THRESHOLD,
) -> pa.Table:
    """Pairs with cosine >= threshold: the full (small-side) normalized
    matrix is broadcast once with ray.put; each batch computes its rows'
    similarities against it (numpy matmul). At larger scale switch the
    broadcast side to IVF buckets (similarity.py)."""
    all_df = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = all_df[id_col].to_numpy()
    mat = np.stack(all_df[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column(id_col).to_numpy(zero_copy_only=False)
            rows = np.array([self.pos[int(v)] for v in bids])
            sims = self.mat[rows] @ self.mat.T
            out_a, out_b, out_c = [], [], []
            for r, i in enumerate(bids):
                hits = np.flatnonzero(sims[r] >= threshold)
                hits = hits[self.ids[hits] > i]  # a < b, no self
                out_a.extend([int(i)] * len(hits))
                out_b.extend(self.ids[hits].tolist())
                out_c.extend((np.floor(sims[r][hits] * 1e6 + 0.5) / 1e6).tolist())
            return pa.table(
                {
                    "vec_a": pa.array(out_a, pa.int64()),
                    "vec_b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    out = ds.select_columns([id_col]).map_batches(
        PairFinder, batch_format="pyarrow", concurrency=(1, 4)
    )
    tbl = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows] or
                           [pa.table({"vec_a": pa.array([], pa.int64()),
                                      "vec_b": pa.array([], pa.int64()),
                                      "cosine": pa.array([], pa.float64())})])
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("vec_a", "ascending"), ("vec_b", "ascending")]))


def embedding_dup_sql(src: str, id_col: str = "vec_id", vec_col: str = "embedding",
                      threshold: float = EMBEDDING_COSINE_THRESHOLD) -> str:
    """DuckDB oracle for :func:`embedding_dup_pairs` (float64 cosine on
    the CASTed list, same rounding and threshold)."""
    return f"""
WITH e AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {src})
SELECT a.{id_col} AS vec_a, b.{id_col} AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.{id_col} < b.{id_col}
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
"""
