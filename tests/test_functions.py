"""Training-data operator tests (dedup / similarity / text analysis /
multimodal) over the driver's ``documents`` and ``embeddings`` tables at
sf0.001, each SQL-expressible op checked against its own DuckDB oracle
(the same SQL `__ray_entry__.oracle_sql()` hands the driver)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return rd.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds():
    return rd.read_parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def fduck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    yield con
    con.close()


def _table(r):
    if isinstance(r, rd.Dataset):
        tabs = [t for t in ray.get(r.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(tabs)
    return r


def _assert_matches_oracle(result, con, sql):
    t = _table(result)
    o = con.sql(sql).arrow()
    keys = [(c, "ascending") for c in t.column_names]
    ts = t.sort_by(keys)
    os_ = o.select(t.column_names).cast(ts.schema).sort_by(keys)
    assert ts.equals(os_), f"engine vs oracle mismatch ({t.num_rows} vs {o.num_rows} rows)"
    return t


# ---------------------------------------------------------------- dedup


def test_exact_dedup_oracle(docs_ds, fduck):
    from search_engine_ray.functions import dedup

    t = _assert_matches_oracle(
        dedup.exact_dedup(docs_ds), fduck, dedup.exact_dedup_sql("documents")
    )
    assert t.num_rows > 0


def test_ngram_jaccard_oracle(docs_ds, fduck):
    from search_engine_ray.functions import dedup

    t = _assert_matches_oracle(
        dedup.ngram_jaccard_pairs(docs_ds), fduck, dedup.ngram_jaccard_sql("documents")
    )
    # sf corpora carry planted near-dups; the op must find some
    assert t.num_rows > 0


def test_minhash_lsh_subset_and_recall(docs_ds, fduck):
    """Every LSH pair is exact-verified (subset of the exact oracle);
    recall vs the exact pair set must be high at this threshold."""
    from search_engine_ray.functions import dedup

    lsh = _table(dedup.minhash_lsh_pairs(docs_ds))
    exact = fduck.sql(dedup.ngram_jaccard_sql("documents")).arrow()
    exact_pairs = set(zip(exact["doc_a"].to_pylist(), exact["doc_b"].to_pylist()))
    lsh_pairs = set(zip(lsh["doc_a"].to_pylist(), lsh["doc_b"].to_pylist()))
    assert lsh_pairs <= exact_pairs
    assert exact_pairs, "oracle found no near-dup pairs — fixture assumption broken"
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8"


def test_simhash_pairs_verified(docs_ds):
    from search_engine_ray.functions import dedup

    t = _table(dedup.simhash_pairs(docs_ds))
    assert t.num_rows > 0
    assert max(t["hamming"].to_pylist()) <= dedup.SIMHASH_MAX_HAMMING
    # a < b, no dups
    pairs = list(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
    assert all(a < b for a, b in pairs)
    assert len(pairs) == len(set(pairs))


def test_embedding_dup_oracle(emb_ds, fduck):
    from search_engine_ray.functions import dedup

    t = _assert_matches_oracle(
        dedup.embedding_dup_pairs(emb_ds), fduck, dedup.embedding_dup_sql("embeddings")
    )
    assert t.num_rows > 0
    assert min(t["cosine"].to_pylist()) >= dedup.EMBEDDING_COSINE_THRESHOLD - 1e-9


def test_embedding_dup_ivf_subset_and_recall(emb_ds):
    """The IVF-bucketed scale path must be a subset of the exact pair
    set (every emitted pair re-checked the real cosine) with high
    recall at the default nassign."""
    from search_engine_ray.functions import dedup

    exact = dedup.embedding_dup_pairs(emb_ds)
    ivf = dedup.embedding_dup_pairs_ivf(emb_ds)
    se = set(zip(exact["vec_a"].to_pylist(), exact["vec_b"].to_pylist()))
    si = set(zip(ivf["vec_a"].to_pylist(), ivf["vec_b"].to_pylist()))
    assert si <= se
    assert se and len(si) / len(se) >= 0.9


# ------------------------------------------------------------ similarity


def test_knn_bruteforce_oracle(emb_ds, fduck):
    from search_engine_ray.functions import similarity

    t = _assert_matches_oracle(
        similarity.knn_bruteforce(emb_ds), fduck, similarity.knn_bruteforce_sql("embeddings")
    )
    assert t.num_rows == 8 * 5  # n_queries * k


def test_zipf_fit_oracle(docs_ds, fduck):
    """Zipf fit vs the row_number twin; block-layout invariance;
    crafted pins: natural-ish slope is negative, max_rank cap
    respected, hand-checkable 2-rank fit, single-rank NULL."""
    import math

    from search_engine_ray.functions.text_analysis import (
        zipf_fit,
        zipf_fit_sql,
    )

    t = zipf_fit(docs_ds)
    o = fduck.sql(zipf_fit_sql("documents")).arrow()
    assert t.cast(o.schema).equals(o)
    assert t.column("slope")[0].as_py() < 0
    t2 = zipf_fit(docs_ds.repartition(7))
    assert t.equals(t2)
    # crafted: 'aa' x4, 'bb' x2 -> ranks 1, 2; the 2-point fit is
    # exact: slope = (y2 - y1) / (x2 - x1) on the quantized logs
    ds = rd.from_arrow(
        pa.table({"text": pa.array(["aa aa bb", "aa aa bb"])})
    )
    r = zipf_fit(ds).to_pylist()[0]
    assert r["n_ranks"] == 2
    x2 = math.floor(math.log(2.0) * 1e6 + 0.5)
    y1 = math.floor(math.log(4.0) * 1e6 + 0.5)
    y2 = math.floor(math.log(2.0) * 1e6 + 0.5)
    want = float(2 * (0 * y1 + x2 * y2) - x2 * (y1 + y2)) / float(
        2 * x2 * x2 - x2 * x2
    )
    assert r["slope"] == want
    # max_rank cap: three distinct tokens, cap at 2
    ds = rd.from_arrow(
        pa.table({"text": pa.array(["aa aa aa bb bb cc"])})
    )
    r = zipf_fit(ds, max_rank=2).to_pylist()[0]
    assert r["n_ranks"] == 2
    # single distinct token -> one rank -> NULL slope
    r = zipf_fit(
        rd.from_arrow(pa.table({"text": pa.array(["aa aa aa"])}))
    ).to_pylist()[0]
    assert r["n_ranks"] == 1 and r["slope"] is None


def test_embed_pca(emb_ds):
    """PCA algebra pins: projections centered, per-component variance
    matches the covariance eigenvalues, components orthonormal via
    cross-covariance ~ 0, block-layout invariant, crafted 2-D line
    recovers its axis."""
    from search_engine_ray.functions.similarity import (
        embed_covariance,
        embed_pca,
    )

    t = _table(embed_pca(emb_ds)).sort_by([("vec_id", "ascending")])
    assert t.column_names == ["vec_id", "pc1", "pc2"]
    assert t.num_rows == 500
    p1 = np.asarray(t.column("pc1").to_pylist())
    p2 = np.asarray(t.column("pc2").to_pylist())
    # centered
    # centering is vs the 1e-6-quantized mean -> residual ~ quantization
    assert abs(p1.mean()) < 1e-5 and abs(p2.mean()) < 1e-5
    # variance of pc_k == k-th eigenvalue of the exact covariance
    cov_rows = embed_covariance(emb_ds).to_pylist()
    d = 64
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert abs(p1.var(ddof=1) - w[0]) < 1e-4 * max(1.0, w[0])
    assert abs(p2.var(ddof=1) - w[1]) < 1e-4 * max(1.0, w[1])
    assert p1.var(ddof=1) >= p2.var(ddof=1)
    # orthogonality: cross-covariance of the two projections ~ 0
    assert abs(np.cov(p1, p2, ddof=1)[0, 1]) < 1e-5
    # block-layout invariance (per-row arithmetic)
    t2 = _table(embed_pca(emb_ds.repartition(7))).sort_by(
        [("vec_id", "ascending")]
    )
    assert t.equals(t2)
    # crafted: points on the line y = 2x -> pc1 axis ~ (1,2)/sqrt(5),
    # pc2 variance 0
    pts = [[float(i), 2.0 * i] for i in (-2, -1, 0, 1, 2)]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(5)), pa.int64()),
                "embedding": pa.array(pts, pa.list_(pa.float32())),
            }
        )
    )
    r = _table(embed_pca(ds)).sort_by([("vec_id", "ascending")])
    q2 = np.asarray(r.column("pc2").to_pylist())
    assert np.abs(q2).max() < 1e-6
    q1 = np.asarray(r.column("pc1").to_pylist())
    assert abs(abs(q1[0]) - np.sqrt(5.0) * 2) < 1e-6


def test_compress_ratio(docs_ds):
    """Compressibility signal: repetitive text compresses far below
    varied text, determinism + block-layout exactness, empty NULL."""
    from search_engine_ray.functions.text_analysis import compress_ratio

    t = _table(compress_ratio(docs_ds)).sort_by([("doc_id", "ascending")])
    assert t.num_rows == docs_ds.count()
    t2 = _table(compress_ratio(docs_ds.repartition(7))).sort_by(
        [("doc_id", "ascending")]
    )
    assert t.equals(t2)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "spam " * 400,
                        "the quick brown fox jumps over a lazy dog and "
                        "every sentence here differs in vocabulary, "
                        "structure, rhythm and intent from the previous "
                        "one, mentioning zebras, quasars, bicycles, "
                        "parliaments and seventeen unrelated nouns",
                        "",
                    ]
                ),
            }
        )
    )
    r = {x["doc_id"]: x for x in _table(compress_ratio(ds)).to_pylist()}
    assert r[1]["ratio_q"] < r[2]["ratio_q"] // 3  # boilerplate crushes
    assert r[3]["n_bytes"] == 0 and r[3]["ratio_q"] is None


def test_lang_confusion_oracle(docs_ds, fduck):
    """Confusion matrix vs the composed langid twin; block-layout
    invariance; the total equals the corpus size and the diagonal
    dominates on the synthetic corpus."""
    from search_engine_ray.functions.text_analysis import (
        lang_confusion,
        lang_confusion_sql,
    )

    t = lang_confusion(docs_ds)
    o = fduck.sql(lang_confusion_sql("documents")).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    t2 = lang_confusion(docs_ds.repartition(7))
    assert t.equals(t2)
    rows = t.to_pylist()
    # every document lands in exactly one cell
    assert sum(r["n"] for r in rows) == docs_ds.count()
    # the matrix is a faithful report of the detector, not a quality
    # claim: declared langs on the synthetic corpus map mostly to
    # 'unknown'/'zh' cells — what matters is that the composed twin
    # agrees cell-for-cell (asserted above) and the pred domain is
    # the detector's
    preds = {r["lang_pred"] for r in rows}
    assert preds <= {"en", "de", "fr", "es", "zh", "unknown"}


def test_vocab_overlap_oracle(docs_ds, fduck):
    """Vocab Jaccard matrix vs the set self-join twin; block-layout
    invariance; crafted pins: exact inter/union, disjoint pair absent,
    identical slices jaccard 1.0."""
    from search_engine_ray.functions.text_analysis import (
        vocab_overlap,
        vocab_overlap_sql,
    )

    t = vocab_overlap(docs_ds, "lang")
    o = fduck.sql(vocab_overlap_sql("documents", "lang")).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    t2 = vocab_overlap(docs_ds.repartition(7), "lang")
    assert t.equals(t2)
    # crafted: en={aa,bb,cc}, de={bb,cc,dd}, zz={qq}:
    # (de,en) inter 2 union 4; zz pairs absent (no shared token)
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["en", "en", "de", "zz"]),
                "text": pa.array(
                    ["aa bb", "bb cc", "bb cc dd", "qq"]
                ),
            }
        )
    )
    rows = vocab_overlap(ds, "lang").to_pylist()
    assert len(rows) == 1
    r = rows[0]
    assert (r["slice_a"], r["slice_b"], r["inter"], r["uni"]) == (
        "de", "en", 2, 4,
    )
    assert r["jaccard"] == 0.5
    # identical slices -> jaccard 1.0 exactly
    ds = rd.from_arrow(
        pa.table(
            {
                "lang": pa.array(["a", "b"]),
                "text": pa.array(["xx yy", "yy xx"]),
            }
        )
    )
    r = vocab_overlap(ds, "lang").to_pylist()[0]
    assert r["jaccard"] == 1.0


def test_hapax_stats_oracle(docs_ds, fduck):
    """Hapax stats vs the count-filter twin; block-layout invariance;
    crafted pins: exact hapax/dis counts, empty corpus NULL rate."""
    from search_engine_ray.functions.text_analysis import (
        hapax_stats,
        hapax_stats_sql,
    )

    t = hapax_stats(docs_ds)
    o = fduck.sql(hapax_stats_sql("documents")).arrow()
    assert t.cast(o.schema).equals(o)
    assert t.column("vocab")[0].as_py() > 0
    t2 = hapax_stats(docs_ds.repartition(7))
    assert t.equals(t2)
    # crafted: aa x3, bb x2, cc x1, dd x1 -> vocab 4, hapax 2, dis 1
    r = hapax_stats(
        rd.from_arrow(pa.table({"text": pa.array(["aa aa aa bb", "bb cc dd"])}))
    ).to_pylist()[0]
    assert (r["vocab"], r["hapax"], r["dis"]) == (4, 2, 1)
    assert r["hapax_rate"] == 0.5
    # empty corpus -> zero vocab, NULL rate
    r = hapax_stats(
        rd.from_arrow(pa.table({"text": pa.array([""])}))
    ).to_pylist()[0]
    assert r["vocab"] == 0 and r["hapax_rate"] is None


def test_embed_covariance_oracle(emb_ds, fduck):
    """Covariance/correlation matrix vs the unnest self-join twin;
    block-layout invariance; pins: diagonal corr == 1.0 exactly,
    exact symmetry, hand-computed 2-dim covariance, zero-variance
    dim -> NULL corr."""
    from search_engine_ray.functions import similarity

    t = similarity.embed_covariance(emb_ds)
    o = fduck.sql(similarity.embed_covariance_sql("embeddings")).arrow()
    assert t.num_rows == 64 * 64
    assert t.cast(o.schema).equals(o)
    t2 = similarity.embed_covariance(emb_ds.repartition(7))
    assert t.equals(t2)
    rows = {(r["i"], r["j"]): r for r in t.to_pylist()}
    for i in (1, 17, 64):
        assert rows[(i, i)]["corr"] == 1.0
    for (i, j) in ((1, 2), (5, 40)):
        assert rows[(i, j)]["cov"] == rows[(j, i)]["cov"]
        assert rows[(i, j)]["corr"] == rows[(j, i)]["corr"]
    # crafted: dims [x, const]: var(x) for x = 1, 2, 3 is 1.0;
    # const dim -> zero variance -> NULL corr, 0 cov
    ds = rd.from_arrow(
        pa.table(
            {
                "embedding": pa.array(
                    [[1.0, 5.0], [2.0, 5.0], [3.0, 5.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    c = similarity.embed_covariance(ds)
    r = {(x["i"], x["j"]): x for x in c.to_pylist()}
    assert r[(1, 1)]["cov"] == 1.0
    assert r[(2, 2)]["cov"] == 0.0
    assert r[(1, 2)]["corr"] is None
    assert r[(1, 1)]["corr"] == 1.0


def test_range_search_oracle(emb_ds, fduck):
    """Radius search == the exact float64 cosine SQL twin; every row
    clears the threshold; a top-k row above the radius is in the range
    result (knn ∩ radius consistency); impossible radius -> empty."""
    from search_engine_ray.functions import similarity

    t = _assert_matches_oracle(
        similarity.range_search(emb_ds), fduck,
        similarity.range_search_sql("embeddings"),
    )
    assert t.num_rows > 0
    assert all(c >= 0.35 - 1e-9 for c in t["cosine"].to_pylist())
    rng = {(q, n) for q, n in zip(t["query_id"].to_pylist(),
                                  t["neighbor_id"].to_pylist())}
    bf = _table(similarity.knn_bruteforce(emb_ds))
    for q, n, c in zip(bf["query_id"].to_pylist(),
                       bf["neighbor_id"].to_pylist(),
                       bf["cosine"].to_pylist()):
        if c >= 0.36:  # clear of the rounded-boundary ulp zone
            assert (q, n) in rng
    assert similarity.range_search(emb_ds, threshold=1.01).num_rows == 0


def test_semantic_dedup_oracle(emb_ds, fduck):
    """SemDeDup labels == the SQL twin (seed-centroid assign ->
    within-cluster pairs -> recursive closure); pairs are a SUBSET of
    the unscoped all-pairs producer at the same threshold (the scoping
    approximation only ever DROPS cross-cluster pairs); keep is the
    min-id canonical; the fitted-centroid path runs end-to-end."""
    from search_engine_ray.functions import dedup, similarity

    t = _assert_matches_oracle(
        dedup.semantic_dedup(emb_ds), fduck,
        dedup.semantic_dedup_sql("embeddings"),
    )
    assert t.num_rows > 0
    by_cluster: dict[int, list] = {}
    for r in t.to_pylist():
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        assert min(x["doc_id"] for x in rows) == cid
        assert sum(x["keep"] for x in rows) == 1
        assert next(x for x in rows if x["keep"])["doc_id"] == cid
    sem_docs = {r["doc_id"] for r in t.to_pylist()}
    allp = dedup.embedding_dup_pairs(emb_ds)
    all_docs = set(allp.column("vec_a").to_pylist()) \
        | set(allp.column("vec_b").to_pylist())
    assert sem_docs <= all_docs
    cents, obj = similarity.kmeans_fit(emb_ds, k=4, iters=2)
    fitted = dedup.semantic_dedup(emb_ds, k=4, centroids=cents)
    assert set(fitted.column_names) == {"doc_id", "cluster_id", "keep"}


def test_knn_ivf_recall(emb_ds):
    """IVF is approximate; assert recall@k vs brute force."""
    from search_engine_ray.functions import similarity

    bf = _table(similarity.knn_bruteforce(emb_ds))
    ivf = _table(similarity.knn_ivf(emb_ds))
    hits = 0
    for q in set(bf["query_id"].to_pylist()):
        b = {n for qq, n in zip(bf["query_id"].to_pylist(), bf["neighbor_id"].to_pylist()) if qq == q}
        i = {n for qq, n in zip(ivf["query_id"].to_pylist(), ivf["neighbor_id"].to_pylist()) if qq == q}
        hits += len(b & i) / len(b)
    recall = hits / len(set(bf["query_id"].to_pylist()))
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


# ---------------------------------------------------------- text analysis


def test_token_counts_oracle(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    ds = docs_ds.map_batches(
        lambda b: ta.token_counts(b).select(["doc_id", "n_ws_tokens", "n_word_tokens"]),
        batch_format="pyarrow",
    )
    _assert_matches_oracle(ds, fduck, ta.token_counts_sql("documents"))


def test_quality_features_oracle(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    cols = ["doc_id", "n_chars", "n_words", "mean_word_len", "alpha_ratio",
            "punct_ratio", "stop_ratio", "quality_score"]
    ds = docs_ds.map_batches(
        lambda b: ta.quality_features(b).select(cols), batch_format="pyarrow"
    )
    t = _assert_matches_oracle(ds, fduck, ta.quality_features_sql("documents"))
    scores = t["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_fingerprint_oracle_and_rolling(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    ds = docs_ds.map_batches(
        lambda b: ta.fingerprint(b).select(["doc_id", "fp_md5"]), batch_format="pyarrow"
    )
    _assert_matches_oracle(ds, fduck, ta.fingerprint_sql("documents"))
    # rolling hash: deterministic, whitespace-insensitive, order-sensitive
    b = pa.table({"doc_id": [0, 1, 2], "text": ["a b c", "a   b\tc", "c b a"]})
    out = ta.fingerprint(b)
    r = out["fp_roll"].to_pylist()
    assert r[0] == r[1]
    assert r[0] != r[2]


def test_redact_oracle_crafted(fduck):
    """Byte-exact redaction parity on crafted strings covering every
    pattern, multiple hits per row, nulls, near-misses, and the
    documented out-of-scope uppercase case."""
    from search_engine_ray.functions import text_analysis as ta

    rows = [
        "visit https://ex.org/a?q=1 and http://b.co mail a.b+c@ex-mail.org",
        "ip 10.0.0.255 versions 1.2.3.4 call +4915112345678 or +123456789012345678",
        None,
        "no pii 1.2.3 (three octets) @not-an-email plain.text",
        "HTTPS://UPPER.org u@EX.org",  # uppercase: documented out of scope
    ]
    t = pa.table({"doc_id": list(range(len(rows))), "text": rows})
    fduck.register("redact_docs", t)
    out = _assert_matches_oracle(
        ta.redact(t).select(
            ["doc_id", "n_urls", "n_emails", "n_ips", "n_phones", "clean_text"]
        ),
        fduck,
        ta.redact_sql("redact_docs"),
    )
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[0]["n_urls"] == 2 and by_id[0]["n_emails"] == 1
    assert "<URL>" in by_id[0]["clean_text"] and "<EMAIL>" in by_id[0]["clean_text"]
    assert by_id[1]["n_ips"] == 2 and by_id[1]["n_phones"] == 2
    assert by_id[2]["clean_text"] == ""  # null text -> empty, no hits
    assert by_id[3]["clean_text"] == rows[3]  # near-misses untouched
    assert by_id[4]["clean_text"] == rows[4]  # case-sensitive by contract


def test_redact_driver_injection(fduck):
    """The driver's text_redact query (PII injected from doc_id) matches
    its oracle and actually hits every pattern on every row."""
    import __ray_entry__ as entry

    t = _table(entry._text_redact(SF_DIR))
    for col in ("n_urls", "n_emails", "n_ips", "n_phones"):
        assert min(t[col].to_pylist()) >= 1, col


def test_langid_known_languages():
    from search_engine_ray.functions import text_analysis as ta

    b = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat and the dog sat on the mat with a hat",
                "la casa de la madre es una de las mejores por el mar",
                "der Hund und die Katze sind mit der Mutter im Haus",
                "这是一个中文句子 完全是中文的内容 没有别的",
            ],
        }
    )
    out = ta.LangId()(b)
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "zh"]


# ------------------------------------------------------------ multimodal


def test_multimodal_feature_stage(docs_ds):
    from search_engine_ray.stages import multimodal as mm

    texts = [r["text"] for r in docs_ds.take(50)]
    media = mm.synth_media_table(texts)
    assert media.schema.equals(mm.MEDIA_SCHEMA)
    out1 = _table(
        rd.from_arrow(media).map_batches(
            mm.MediaFeatureExtractor, batch_format="pyarrow", batch_size=16,
            concurrency=(1, 2),
        )
    ).sort_by("media_id")
    out2 = _table(
        rd.from_arrow(media).map_batches(
            mm.MediaFeatureExtractor, batch_format="pyarrow", batch_size=7,
            concurrency=(1, 2),
        )
    ).sort_by("media_id")
    # deterministic across runs, batch sizes and actors
    assert out1.equals(out2)
    feats = out1["feature"].to_pylist()
    assert all(len(f) == mm.FEATURE_DIM for f in feats)
    assert out1.num_rows == 50


def test_image_codec_roundtrip_and_golden():
    """PPM round-trips exactly; BMP decodes the same pixels; features
    are the real luma-grid means, not the stub."""
    import numpy as np

    from search_engine_ray.stages import multimodal as mm

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(px)), px)

    # hand-rolled uncompressed 24-bit bottom-up BMP of the same pixels
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in px[::-1]:  # bottom-up, BGR
        r = row[:, ::-1].tobytes()
        body += r + b"\x00" * (stride - len(r))
    header = (
        b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + b"\x00" * 24
    )
    assert np.array_equal(mm.decode_bmp(bytes(header + body)), px)

    # golden: uniform grey image -> every luma-grid feature == grey/255
    grey = np.full((16, 16, 3), 100, np.uint8)
    feats = mm.image_features(grey, mm.FEATURE_DIM)
    assert np.allclose(feats, 100.0 / 255.0, atol=1e-6)
    # the extractor really decodes PPM payloads (not the md5 stub)
    ext = mm.MediaFeatureExtractor()
    got = ext._decode(mm.encode_ppm(grey), "image")
    assert np.allclose(got, 100.0 / 255.0, atol=1e-6)
    # non-image payloads stay on the deterministic stub
    s1 = ext._decode(b"not an image", "audio")
    s2 = ext._decode(b"not an image", "audio")
    assert np.array_equal(s1, s2) and not np.allclose(s1, s1[0])


def test_audio_video_codecs_roundtrip_and_golden():
    """WAV PCM-16 round-trips; y4m yields the encoded luma frames; the
    extractor's audio/video paths are the real decoders, not the stub."""
    import numpy as np

    from search_engine_ray.stages import multimodal as mm

    # WAV: samples round-trip through encode/decode (mono PCM-16)
    rng = np.random.default_rng(5)
    s16 = ((rng.random(1000) * 2 - 1) * 30000).astype(np.int16)
    wave, rate = mm.decode_wav(mm.encode_wav(s16, rate=16000))
    assert rate == 16000
    assert np.allclose(wave, s16.astype(np.float64) / 32768.0)
    # golden: constant-amplitude signal -> every RMS window == amplitude
    const = np.full(640, 8192, np.int16)
    feats = mm.audio_features(mm.decode_wav(mm.encode_wav(const))[0], 8)
    assert np.allclose(feats, 8192 / 32768.0, atol=1e-6)

    # y4m: luma planes round-trip frame by frame
    frames = rng.integers(0, 256, size=(5, 12, 16), dtype=np.uint8)
    got = list(mm.iter_y4m_frames(mm.encode_y4m(frames)))
    assert len(got) == 5 and all(np.array_equal(a, b) for a, b in zip(got, frames))
    # stride frame-sampling: 5 frames, max 2 -> frames 0 and 3
    vf = mm.sample_video_features(mm.encode_y4m(frames), mm.FEATURE_DIM, max_frames=2)
    expect = np.mean(
        [mm.luma_features(frames[i].astype(np.float64), mm.FEATURE_DIM) for i in (0, 3)],
        axis=0,
    )
    assert np.allclose(vf, expect, atol=1e-6)

    # the extractor routes media types to the real codecs
    ext = mm.MediaFeatureExtractor()
    assert np.allclose(ext._decode(mm.encode_wav(const), "audio"), 8192 / 32768.0, atol=1e-6)
    assert np.allclose(
        ext._decode(mm.encode_y4m(frames), "video"),
        mm.sample_video_features(mm.encode_y4m(frames), mm.FEATURE_DIM),
        atol=1e-6,
    )
    with pytest.raises(ValueError):
        mm.MediaFeatureExtractor(backend="ppm")._decode(b"mp3junk", "audio")


# ----------------------------------------------------------- windows


@pytest.fixture(scope="module")
def events_ds():
    return rd.read_parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="module")
def educk():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    yield con
    con.close()


def test_tumbling_window_oracle(events_ds, educk):
    from search_engine_ray.functions import windows as W

    t = _assert_matches_oracle(
        W.tumbling_window(events_ds), educk, W.tumbling_window_sql("events")
    )
    assert t.num_rows > 0


def test_session_windows_oracle(events_ds, educk):
    from search_engine_ray.functions import windows as W

    t = _assert_matches_oracle(
        W.session_windows(events_ds), educk, W.session_windows_sql("events")
    )
    assert t.num_rows > 0
    assert min(t["n_events"].to_pylist()) >= 1


def test_knn_ivf_prebuilt_index_matches(emb_ds):
    """The persisted-cell index path must return the same neighbors as
    the inline-assignment path (same centroids, same probes)."""
    from search_engine_ray.functions import similarity

    inline = similarity.knn_ivf(emb_ds)
    indexed = similarity.build_ivf_index(emb_ds)
    via_index = similarity.knn_ivf(emb_ds, indexed=indexed)
    assert via_index.equals(inline)


def test_sliding_window_oracle(events_ds, educk):
    from search_engine_ray.functions import windows as W

    t = _assert_matches_oracle(
        W.sliding_window(events_ds), educk, W.sliding_window_sql("events")
    )
    assert t.num_rows > 0
    # width == hop degenerates to the tumbling window exactly
    slid = W.sliding_window(events_ds, width_minutes=60, hop_minutes=60).to_arrow_refs()
    tumb = W.tumbling_window(events_ds, width_minutes=60).to_arrow_refs()
    import ray as _ray

    key = ["window_start", "event_type"]
    a = pa.concat_tables([_ray.get(r) for r in slid]).sort_by([(k, "ascending") for k in key])
    b = pa.concat_tables([_ray.get(r) for r in tumb]).sort_by([(k, "ascending") for k in key])
    assert a.equals(b)
    with pytest.raises(ValueError):
        W.sliding_window(events_ds, width_minutes=50, hop_minutes=15)


def test_asof_join_oracle(events_ds, educk):
    from search_engine_ray.functions import joins as J

    t = _assert_matches_oracle(
        J.asof_join(events_ds), educk, J.asof_join_sql("events")
    )
    # every left event appears exactly once (left-outer), priors never
    # postdate their event
    n_left = educk.execute(
        "SELECT count(*) FROM events WHERE event_type='purchase'"
    ).fetchone()[0]
    assert t.num_rows == n_left
    import pyarrow.compute as pc

    have = t.filter(pc.is_valid(t["prior_ts"]))
    assert pc.all(pc.less_equal(have["prior_ts"], have["ts"])).as_py()


def test_session_windows_salted_equals_plain(events_ds, educk):
    from search_engine_ray.functions import windows as W

    t = _assert_matches_oracle(
        W.session_windows_salted(events_ds, salt_hours=6),
        educk,
        W.session_windows_sql("events"),
    )
    assert t.num_rows > 0
    # a salt span at the legal minimum still stitches exactly
    t2 = _assert_matches_oracle(
        W.session_windows_salted(events_ds, salt_hours=1),
        educk,
        W.session_windows_sql("events"),
    )
    assert t2.num_rows == t.num_rows
    with pytest.raises(ValueError):
        W.session_windows_salted(events_ds, gap_minutes=120, salt_hours=1)


def test_interval_join_oracle_and_bucket_invariance(events_ds, educk):
    """Range join vs the integer-bound SQL twin; the bucket size is a
    pure distribution knob — results identical across bucket choices
    (incl. a bucket smaller than the window, where every interval
    replicates 3+ times); inclusive bounds at both edges."""
    from search_engine_ray.functions import joins as J

    t = _assert_matches_oracle(
        J.interval_join(events_ds), educk, J.interval_join_sql("events")
    )
    assert t.num_rows > 0
    # many-to-many: at least one purchase inside two click intervals
    import collections
    c = collections.Counter(t.column("event_id").to_pylist())
    assert max(c.values()) >= 2
    for bh in (1, 24):
        t2 = _table(J.interval_join(events_ds, bucket_hours=bh))
        keys = [(c_, "ascending") for c_ in t.column_names]
        assert t.sort_by(keys).equals(t2.sort_by(keys)), bh
    # inclusive containment: every pair satisfies the bounds
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    st = t.column("interval_start").cast(pa.int64()).to_numpy()
    win = 2 * 3_600 * 1_000_000
    assert ((st <= ts) & (ts <= st + win)).all()


def test_asof_join_salted_equals_plain(events_ds, educk):
    from search_engine_ray.functions import joins as J

    t = _assert_matches_oracle(
        J.asof_join_salted(events_ds, salt_hours=6),
        educk,
        J.asof_join_sql("events"),
    )
    assert t.num_rows > 0
    # tiny salt span maximizes cross-bucket carries; still exact
    _assert_matches_oracle(
        J.asof_join_salted(events_ds, salt_hours=1),
        educk,
        J.asof_join_sql("events"),
    )


def test_dup_clusters_graph_shapes():
    """Hash-min label propagation: chain (multi-round propagation),
    star, clique and singleton-pair components all collapse to the
    component-minimum canonical id."""
    from search_engine_ray.functions import dedup

    pairs = pa.table(
        {
            # chain 1-2-3-4-5 (diameter 4: needs >1 round past the seed),
            # star 10-{11,12,13}, pair {20,21}
            "doc_a": pa.array([1, 2, 3, 4, 10, 10, 10, 20], pa.int64()),
            "doc_b": pa.array([2, 3, 4, 5, 11, 12, 13, 21], pa.int64()),
        }
    )
    t = dedup.dup_clusters(pairs)  # driver union-find path (small edges)
    got = dict(zip(t.column("doc_id").to_pylist(), t.column("cluster_id").to_pylist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}
    keep = dict(zip(t.column("doc_id").to_pylist(), t.column("keep").to_pylist()))
    assert [d for d, k in keep.items() if k] == [1, 10, 20]
    # the distributed label-propagation path must emit the same table
    td = dedup.dup_clusters(pairs, driver_max_edges=0)
    assert td.equals(t)


def test_dup_clusters_oracle(docs_ds, fduck):
    """Cluster collapse over the exact n-gram pair set matches the
    recursive-CTE closure over the same pairs."""
    from search_engine_ray.functions import dedup

    pairs = dedup.ngram_jaccard_pairs(docs_ds)
    t = _assert_matches_oracle(
        dedup.dup_clusters(pairs),
        fduck,
        dedup.dup_clusters_sql(dedup.ngram_jaccard_sql("documents")),
    )
    assert t.num_rows > 0
    # every doc in a pair is clustered; canonical == component min
    nodes = set(pairs.column("doc_a").to_pylist()) | set(pairs.column("doc_b").to_pylist())
    assert set(t.column("doc_id").to_pylist()) == nodes
    # distributed path == driver union-find path on real pairs
    assert dedup.dup_clusters(pairs, driver_max_edges=0).equals(t)


# ------------------------------------------------------------- sampling


def test_sample_hash_oracle(docs_ds, fduck):
    from search_engine_ray.functions import sampling

    t = _assert_matches_oracle(
        sampling.sample_hash(docs_ds, 0.3),
        fduck,
        sampling.sample_hash_sql("documents", 0.3),
    )
    # Bernoulli(0.3) over 500 docs: loose bounds, deterministic anyway
    assert 80 < t.num_rows < 220


def test_sample_hash_keep_all_and_none(docs_ds, fduck):
    from search_engine_ray.functions import sampling

    assert sampling.sample_hash(docs_ds, 1.0).count() == docs_ds.count()
    assert sampling.sample_hash(docs_ds, 0.0).count() == 0


def test_sample_stratified_oracle(docs_ds, fduck):
    from search_engine_ray.functions import sampling

    fr = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    t = _assert_matches_oracle(
        sampling.sample_stratified(docs_ds, fr, default_fraction=0.1),
        fduck,
        sampling.sample_stratified_sql("documents", fr, default_fraction=0.1),
    )
    import pyarrow.compute as pc2

    per = dict(zip(*[c.to_pylist() for c in t.group_by("source").aggregate(
        [("doc_id", "count")]).select(["source", "doc_id_count"]).columns]))
    assert per["src0"] == 25  # keep-all stratum is exact


def test_assign_splits_oracle(docs_ds, fduck):
    from search_engine_ray.functions import sampling

    t = _assert_matches_oracle(
        sampling.assign_splits(docs_ds),
        fduck,
        sampling.assign_splits_sql("documents"),
    )
    assert t.num_rows == docs_ds.count()  # every row labeled exactly once
    splits = set(t.column("split").to_pylist())
    assert splits == {"train", "val", "test"}


def test_corpus_prep_pipeline_oracle(docs_ds, fduck):
    """The composed cleaning pipeline (quality gate -> exact dedup ->
    near-dup cluster collapse -> split assignment) matches the composed
    SQL oracle end-to-end, and each gate provably removed something."""
    from search_engine_ray.pipelines import corpus_prep as cp

    t = _assert_matches_oracle(
        cp.corpus_prep(docs_ds), fduck, cp.corpus_prep_sql("documents")
    )
    n_docs = docs_ds.count()
    assert 0 < t.num_rows < n_docs  # gates actually filtered
    assert set(t.column_names) == {"doc_id", "source", "lang", "split"}
    assert set(t.column("split").to_pylist()) <= {"train", "val", "test"}


def test_ngram_counts_oracle(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    t = _assert_matches_oracle(
        ta.ngram_counts(docs_ds), fduck, ta.ngram_counts_sql("documents")
    )
    assert t.num_rows > 0
    assert min(t["n"].to_pylist()) >= ta.NGRAM_MIN_COUNT


def test_ngram_counts_trigram_oracle(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    _assert_matches_oracle(
        ta.ngram_counts(docs_ds, n=3, min_count=2),
        fduck,
        ta.ngram_counts_sql("documents", n=3, min_count=2),
    )


def test_tfidf_keywords_oracle(docs_ds, fduck):
    from search_engine_ray.functions import text_analysis as ta

    t = _assert_matches_oracle(
        ta.tfidf_keywords(docs_ds), fduck, ta.tfidf_keywords_sql("documents")
    )
    assert t.num_rows > 0
    # every non-empty doc contributes at most k keyword rows
    import collections

    per = collections.Counter(t["doc_id"].to_pylist())
    assert max(per.values()) <= ta.KEYWORDS_K


def test_ngram_contamination_oracle(docs_ds, fduck):
    """Contamination check of the hash-sampled train split against the
    complementary eval split, engine vs the composed SQL oracle."""
    from search_engine_ray.functions import sampling
    from search_engine_ray.functions import text_analysis as ta

    ev = sampling.sample_hash(docs_ds, 0.1, seed=7)
    tr = sampling.sample_hash(docs_ds, 0.1, seed=7, complement=True)
    ev_sql = f"({sampling.sample_hash_sql('documents', 0.1, seed=7)})"
    tr_sql = f"({sampling.sample_hash_sql('documents', 0.1, seed=7, complement=True)})"
    t = _assert_matches_oracle(
        ta.ngram_contamination(tr, ev),
        fduck,
        ta.ngram_contamination_sql(tr_sql, ev_sql),
    )
    assert t.num_rows > 0
    # the corpus plants near-dups, so some train docs must be flagged
    # against an eval split that contains their twins
    assert any(t["contaminated"].to_pylist())
    assert not all(t["contaminated"].to_pylist())


def test_ngram_contamination_self_is_total():
    """A doc checked against an eval set containing itself is 100%
    contaminated; a disjoint doc is 0%."""
    import ray.data as rd2

    from search_engine_ray.functions import text_analysis as ta

    tr = rd2.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["alpha beta gamma delta", "zz yy xx ww vv"],
    }))
    ev = rd2.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": ["alpha beta gamma delta epsilon"],
    }))
    t = _table(ta.ngram_contamination(tr, ev)).sort_by("doc_id")
    assert t["overlap_frac"].to_pylist() == [1.0, 0.0]
    assert t["contaminated"].to_pylist() == [True, False]


# ------------------------------------------------------------- relational


@pytest.fixture(scope="module")
def rduck():
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_pricing_summary_oracle(rduck):
    from search_engine_ray.functions import relational as rel

    li = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    t = _assert_matches_oracle(
        rel.pricing_summary(li), rduck, rel.pricing_summary_sql()
    )
    assert 0 < t.num_rows <= 8  # |returnflag| x |linestatus| groups


def test_top_unshipped_orders_oracle(rduck):
    from search_engine_ray.functions import relational as rel

    cust = rd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )
    li = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    t = rel.top_unshipped_orders(cust, orders, li)
    o = rduck.sql(rel.top_unshipped_orders_sql()).arrow()
    assert t.cast(o.schema).equals(o)  # ORDER MATTERS for top-k
    assert t.num_rows == rel.TOPK_K
    revs = t["revenue"].to_pylist()
    assert revs == sorted(revs, reverse=True)


def _sorted(t: pa.Table) -> pa.Table:
    return t.sort_by([(c, "ascending") for c in t.column_names])


def _bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """From-scratch BPE reference (the Sennrich 2016 pseudocode,
    independent of the module's implementation)."""
    words = {tuple(w) + ("</w>",): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        words = new
    return merges


def test_quality_mixture_oracle_and_buckets(docs_ds, fduck):
    """CCNet quality mixture: membership == the fully-recomposed SQL
    twin (LM twin -> sketch grid -> value terciles -> md5 thresholds);
    rate-1.0 head keeps every head doc; all three buckets occur; the
    composition is invariant to block layout."""
    from search_engine_ray.pipelines import corpus_prep as cp

    t = _assert_matches_oracle(
        cp.quality_mixture(docs_ds), fduck,
        cp.quality_mixture_sql("documents"),
    )
    buckets = set(t.column("bucket").to_pylist())
    assert buckets == {"head", "middle", "tail"}
    # head rate is 1.0: every head doc of the full bucketing survives
    n_head = len([b for b in t.column("bucket").to_pylist() if b == "head"])
    full = _table(cp.quality_mixture(
        docs_ds, rates={"head": 1.0, "middle": 1.0, "tail": 1.0}))
    n_head_full = len(
        [b for b in full.column("bucket").to_pylist() if b == "head"])
    assert n_head == n_head_full
    assert full.num_rows == docs_ds.count()  # rate-1 everywhere keeps all
    t2 = _table(cp.quality_mixture(docs_ds.repartition(7)))
    assert _sorted(t).equals(_sorted(t2))


def test_bpe_fit_reference_invariance_and_encode(docs_ds):
    """BPE: (1) the distributed fit equals a from-scratch reference on
    the same word frequencies; (2) merges are invariant to block
    layout; (3) the classic low/lower/newest example produces the
    textbook merges; (4) the encoder applies merges in learned-rank
    order (a fully-merged word is ONE token; token counts shrink as
    merges grow); (5) the count-1 early stop."""
    from search_engine_ray.functions import bpe

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["low low low lower lower", "newest newest widest",
                 "low newest"],
    })
    ds = rd.from_arrow(tbl)
    m = bpe.bpe_fit(ds, n_merges=10)
    got = list(zip(m.column("left").to_pylist(), m.column("right").to_pylist(),
                   m.column("pair_count").to_pylist()))
    ref = _bpe_reference({"low": 4, "lower": 2, "newest": 3, "widest": 1}, 10)
    assert got == ref
    assert got[0] == ("l", "o", 6)  # the textbook first merge
    m2 = bpe.bpe_fit(ds.repartition(3), n_merges=10)
    assert m.equals(m2)

    rank = {(l, r): k for k, l, r in zip(m.column("rank").to_pylist(),
                                         m.column("left").to_pylist(),
                                         m.column("right").to_pylist())}
    assert bpe.encode_word("low", rank) == ["low</w>"]
    assert bpe.encode_word("lower", rank) == ["low", "er", "</w>"]
    enc = _table(bpe.bpe_token_counts(ds, m)).sort_by("doc_id")
    assert enc.column("n_bpe_tokens").to_pylist() == [9, 6, 2]
    few = bpe.bpe_fit(ds, n_merges=2)
    enc2 = _table(bpe.bpe_token_counts(ds, few)).sort_by("doc_id")
    assert all(a >= b for a, b in zip(enc2.column("n_bpe_tokens").to_pylist(),
                                      enc.column("n_bpe_tokens").to_pylist()))
    # count-1 early stop: a corpus of singleton words learns nothing...
    single = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()), "text": ["ab cd ef"]}))
    assert bpe.bpe_fit(single, n_merges=5).num_rows == 0
    # ...and the real corpus learns a full table
    big = bpe.bpe_fit(docs_ds, n_merges=30)
    assert big.num_rows == 30
    pcs = big.column("pair_count").to_pylist()
    assert min(pcs) >= 2


def test_sample_mixture_skewed_oracle_and_temperature(docs_ds, fduck):
    """Mixture sampling on a SKEWED synthetic table: (1) membership ==
    the SQL twin that recomputes the whole temperature weighting in
    SQL; (2) alpha=1 keeps the natural mix (equal fractions across
    sources); (3) alpha=0 targets equal counts (the small source keeps
    ALL its rows, the big one downsamples hard); (4) fractions cap at
    1.0; (5) realized counts sit near their targets; plus the exact
    documents-table twin (equal sources — the driver row's shape)."""
    import duckdb

    from search_engine_ray.functions import sampling as sp

    n_big, n_small = 1600, 100
    tbl = pa.table({
        "doc_id": pa.array(list(range(n_big + n_small)), pa.int64()),
        "source": pa.array(["big"] * n_big + ["small"] * n_small),
    })
    ds = rd.from_arrow(tbl)
    counts = sp.source_counts(ds)
    assert counts == {"big": n_big, "small": n_small}

    # alpha=1: proportional — both sources keep the same fraction
    fr1 = sp.mixture_fractions(counts, 1.0, 850)
    assert abs(fr1["big"] - fr1["small"]) < 0.01
    # alpha=0: uniform targets — small keeps all, big downsamples to ~425
    fr0 = sp.mixture_fractions(counts, 0.0, 850)
    assert fr0["small"] == 1.0 and 0.2 < fr0["big"] < 0.3
    # engine == SQL twin on the skewed table, alpha=0.5
    con = duckdb.connect()
    con.register("skewed", tbl)
    got = _sorted(_table(sp.sample_mixture(ds, alpha=0.5, total_target=850)))
    exp = _sorted(con.sql(
        sp.sample_mixture_sql("skewed", alpha=0.5, total_target=850)).arrow())
    assert got.equals(exp.cast(got.schema))
    # realized counts near the integer targets (binomial realization)
    fr = sp.mixture_fractions(counts, 0.5, 850)
    by_src = got.to_pandas().groupby("source").size()
    for s in ("big", "small"):
        target = fr[s] * counts[s]
        assert abs(by_src.get(s, 0) - target) < 4 * (target ** 0.5) + 3, s
    con.close()
    # the documents-table twin (the driver row's shape)
    t = _assert_matches_oracle(
        sp.sample_mixture(docs_ds, alpha=0.5, total_target=250),
        fduck,
        sp.sample_mixture_sql("documents", alpha=0.5, total_target=250),
    )
    assert 0 < t.num_rows < 500


def test_quantile_sketch_oracle_error_bound_and_invariance(docs_ds, fduck):
    """The fixed-width-histogram sketch: (1) exactly equals its SQL
    twin (deterministic bucket grid); (2) every estimate is within
    err_bound of the EXACT quantile and never above it (lower-bound
    bias by construction); (3) invariant to block layout; (4) the
    known-domain path (vmin/vmax passed) skips the range scan and
    matches; (5) finer grids shrink err_bound."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions import aggregates as agg

    expr = lambda b: _pc.utf8_length(
        _pc.fill_null(b.column("text"), "")).to_numpy(zero_copy_only=False)
    t = _assert_matches_oracle(
        agg.quantile_sketch(docs_ds, expr), fduck,
        agg.quantile_sketch_sql("documents", "length(coalesce(text, ''))"),
    )
    exact = {r["q"]: r["value"]
             for r in agg.column_quantiles(docs_ds, expr).to_pylist()}
    for r in t.to_pylist():
        assert 0 <= exact[r["q"]] - r["value"] <= r["err_bound"], r
    t2 = _table(agg.quantile_sketch(docs_ds.repartition(7), expr))
    assert _sorted(t) .equals(_sorted(t2))
    df = docs_ds.to_pandas()
    lo, hi = int(df["text"].str.len().min()), int(df["text"].str.len().max())
    t3 = _table(agg.quantile_sketch(docs_ds, expr, vmin=lo, vmax=hi))
    assert _sorted(t3).equals(_sorted(t))
    fine = _table(agg.quantile_sketch(docs_ds, expr, n_buckets=4096))
    assert fine.column("err_bound")[0].as_py() <= t.column("err_bound")[0].as_py()


def test_hash_join_plans_equal_and_oracle(rduck):
    """The broadcast and partitioned-shuffle plans of hash_join are
    pinned equal to each other and to the SQL join, for inner and for
    left-outer (with genuinely unmatched left rows)."""
    from search_engine_ray.functions.joins import hash_join

    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    cols = "o_orderkey, o_custkey, o_totalprice, c_nationkey, c_mktsegment"
    inner_sql = (f"SELECT {cols} FROM orders "
                 "JOIN customer ON o_custkey = c_custkey")
    got = {}
    for mode in ("broadcast", "shuffle"):
        got[mode] = _sorted(_table(
            hash_join(orders, cust, "o_custkey", "c_custkey",
                      how="inner", mode=mode, n_buckets=8)))
    assert got["broadcast"].equals(got["shuffle"])
    o = rduck.sql(inner_sql).arrow()
    assert got["shuffle"].equals(_sorted(o.cast(got["shuffle"].schema)))

    import pyarrow.compute as _pc

    csub = cust.map_batches(
        lambda b: b.filter(_pc.equal(b.column("c_nationkey"), 7)),
        batch_format="pyarrow")
    left_sql = (f"SELECT {cols} FROM orders LEFT JOIN "
                "(SELECT * FROM customer WHERE c_nationkey = 7) c "
                "ON o_custkey = c_custkey")
    for mode in ("broadcast", "shuffle"):
        t = _sorted(_table(
            hash_join(orders, csub, "o_custkey", "c_custkey",
                      how="left", mode=mode, n_buckets=8)))
        assert t.column("c_mktsegment").null_count > 0  # real unmatched rows
        o = rduck.sql(left_sql).arrow()
        assert t.equals(_sorted(o.cast(t.schema))), mode


def test_hash_join_many_to_many_null_keys_and_auto():
    """Duplicate keys on BOTH sides produce the full per-key cartesian;
    null keys match nothing on either plan (SQL semantics); auto mode
    picks broadcast under the bound."""
    import duckdb

    from search_engine_ray.functions.joins import hash_join

    lt = pa.table({
        "k": pa.array([1, 1, 2, None, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
    })
    rt = pa.table({
        "k2": pa.array([1, 1, 1, None, 4], pa.int64()),
        "rv": pa.array([10, 11, 12, 13, 14], pa.int64()),
    })
    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)
    for how, sqlhow in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        exp = _sorted(con.sql(
            f"SELECT k, lv, rv FROM lt {sqlhow} rt ON k = k2").arrow())
        for mode in ("broadcast", "shuffle", "auto"):
            t = _sorted(_table(hash_join(
                rd.from_arrow(lt), rd.from_arrow(rt), "k", "k2",
                how=how, mode=mode, n_buckets=4)))
            assert t.equals(exp.cast(t.schema)), (how, mode)
    con.close()


def test_hash_join_guards():
    """Loud failures: bad how/mode, missing keys, overlapping non-key
    columns, non-integer shuffle key, broadcast side over the bound."""
    from search_engine_ray.functions.joins import hash_join

    lt = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": ["x"]}))
    rs = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "w": ["y"]}))
    rstr = rd.from_arrow(pa.table({"k": pa.array(["a"]), "w": ["y"]}))
    rdup = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "v": ["y"]}))
    with pytest.raises(ValueError, match="how"):
        hash_join(lt, rs, "k", how="outer")
    with pytest.raises(ValueError, match="mode"):
        hash_join(lt, rs, "k", mode="sort")
    with pytest.raises(ValueError, match="not in"):
        hash_join(lt, rs, "missing")
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(lt, rdup, "k")
    with pytest.raises(ValueError, match="integer keys"):
        hash_join(lt, rstr, "k", mode="shuffle")
    with pytest.raises(ValueError, match="broadcast side"):
        hash_join(lt, rs, "k", mode="broadcast", broadcast_max_rows=0)


def test_semi_join_plans_equal_and_oracle(rduck):
    """Exact semi AND anti join: the broadcast and shuffle plans are
    pinned equal to each other and to the SQL EXISTS / NOT EXISTS, with
    a right side that has duplicate keys (they must not multiply left
    rows — the semi-join contract)."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.joins import semi_join, semi_join_sql

    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    ret = li.map_batches(
        lambda b: b.filter(_pc.equal(b.column("l_returnflag"), "R")),
        batch_format="pyarrow")
    rsrc = "(SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"
    n_orders = orders.count()
    for anti in (False, True):
        sql = semi_join_sql(
            "orders", rsrc, "o_orderkey", "l_orderkey", anti=anti,
            cols="l.o_orderkey, l.o_custkey, l.o_totalprice")
        exp = _sorted(rduck.sql(sql).arrow())
        got = {}
        for mode in ("broadcast", "shuffle"):
            got[mode] = _sorted(_table(semi_join(
                orders, ret, "o_orderkey", "l_orderkey", anti=anti,
                mode=mode, n_buckets=8)))
            assert got[mode].equals(exp.cast(got[mode].schema)), (anti, mode)
        assert got["broadcast"].equals(got["shuffle"])
        # no row widening ever: output row count bounded by the left side
        assert got["shuffle"].num_rows < n_orders
    # semi + anti partition the left side exactly


def test_semi_join_null_keys_and_guards():
    """EXISTS null semantics (null left key: semi drops, anti KEEPS —
    not the NOT IN poison), auto-mode plan pick, loud guards."""
    from search_engine_ray.functions.joins import semi_join

    lt = pa.table({
        "k": pa.array([1, 1, 2, None, 3], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
    })
    rt = pa.table({"k2": pa.array([1, None, 4, 4], pa.int64())})
    lds, rds = rd.from_arrow(lt), rd.from_arrow(rt)
    for mode in ("broadcast", "shuffle", "auto"):
        s = _sorted(_table(semi_join(lds, rds, "k", "k2", mode=mode)))
        assert s.column("lv").to_pylist() == ["a", "b"], mode
        a = _sorted(_table(semi_join(lds, rds, "k", "k2", anti=True,
                                     mode=mode)))
        # null left key KEPT by anti (EXISTS semantics), 4 unmatched
        assert sorted(a.column("lv").to_pylist()) == ["c", "d", "e"], mode
        assert s.num_rows + a.num_rows == lt.num_rows
    rstr = rd.from_arrow(pa.table({"k2": pa.array(["x"])}))
    with pytest.raises(ValueError, match="mode"):
        semi_join(lds, rds, "k", "k2", mode="sort")
    with pytest.raises(ValueError, match="not in"):
        semi_join(lds, rds, "missing", "k2")
    with pytest.raises(ValueError, match="integer keys"):
        semi_join(lds, rstr, "k", "k2")
    with pytest.raises(ValueError, match="use mode='shuffle'"):
        semi_join(lds, rds, "k", "k2", mode="broadcast",
                  broadcast_max_rows=1)
    # empty right side: semi keeps nothing, anti keeps non-null-handled all
    empty = rd.from_arrow(pa.table({"k2": pa.array([], pa.int64())}))
    assert semi_join(lds, empty, "k", "k2").count() == 0
    assert semi_join(lds, empty, "k", "k2", anti=True).count() == 5


def test_order_priority_oracle(rduck):
    """Q4 analog vs the SQL oracle — exact counts, priority-ordered."""
    from search_engine_ray.functions import relational as rel

    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"])
    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])
    t = _table(rel.order_priority(orders, li))
    o = rduck.sql(rel.order_priority_sql()).arrow()
    assert t.equals(o.cast(t.schema))
    assert t.num_rows > 0
    # ORDER MATTERS: priority ascending
    pr = t.column("o_orderpriority").to_pylist()
    assert pr == sorted(pr)


def test_region_revenue_oracle(rduck):
    """Q5 analog vs the SQL oracle — ORDER MATTERS (revenue DESC,
    name ASC), exact by per-row int64 quantization; and the all-shuffle
    plan equals the all-broadcast plan."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{SF_DIR}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/nation.parquet"),
        rd.read_parquet(f"{SF_DIR}/region.parquet"),
    )
    t = rel.region_revenue(*args)
    o = rduck.sql(rel.region_revenue_sql()).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    assert rel.region_revenue(*args, join_mode="broadcast").cast(o.schema).equals(o)
    # unknown region -> empty, schema intact
    e = rel.region_revenue(*args, region_name="ATLANTIS")
    assert e.num_rows == 0 and e.column_names == ["n_name", "revenue"]


def test_connected_components():
    """General CC wrapper: crafted two-component graph labels by min
    node id, roots flagged, isolated nodes absent, negative refused."""
    from search_engine_ray.functions.graph import connected_components

    edges = pa.table(
        {
            "a": pa.array([1, 2, 10, 11], pa.int64()),
            "b": pa.array([2, 3, 11, 12], pa.int64()),
        }
    )
    t = connected_components(edges).sort_by([("node", "ascending")])
    rows = t.to_pylist()
    assert [r["node"] for r in rows] == [1, 2, 3, 10, 11, 12]
    assert [r["component"] for r in rows] == [1, 1, 1, 10, 10, 10]
    assert [r["is_root"] for r in rows] == [True, False, False, True, False, False]
    with pytest.raises(Exception, match="non-negative"):
        connected_components(
            pa.table(
                {"a": pa.array([-1], pa.int64()), "b": pa.array([2], pa.int64())}
            )
        )


def test_returned_customers_oracle(rduck):
    """Q10 analog vs the SQL oracle — ORDER MATTERS (revenue DESC,
    custkey ASC), k-cap respected, every row's lineitems are returned
    ones; impossible window -> typed empty."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_name", "c_acctbal",
                                 "c_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_orderkey", "l_returnflag",
                                 "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{SF_DIR}/nation.parquet"),
    )
    t = rel.returned_customers(*args)
    o = rduck.sql(rel.returned_customers_sql()).arrow()
    assert 0 < t.num_rows <= 20
    assert t.cast(o.schema).equals(o)
    revs = t.column("revenue").to_pylist()
    assert revs == sorted(revs, reverse=True)
    e = rel.returned_customers(*args, date_from="2030-01-01",
                               date_to="2030-04-01")
    assert e.num_rows == 0 and e.column_names == [
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
    ]


def test_disjunctive_revenue_oracle(rduck):
    """Q19 analog vs the OR-of-ANDs twin; nonzero on the default
    clauses; shuffle == broadcast; an impossible clause set -> 0.0."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_partkey", "l_quantity",
                                 "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{SF_DIR}/part.parquet",
                        columns=["p_partkey", "p_brand", "p_size"]),
    )
    t = rel.disjunctive_revenue(*args)
    o = rduck.sql(rel.disjunctive_revenue_sql()).arrow()
    assert t.column("revenue")[0].as_py() > 0
    assert t.cast(o.schema).equals(o)
    assert rel.disjunctive_revenue(*args, join_mode="shuffle").cast(
        o.schema
    ).equals(o)
    impossible = (("Brand#1", 99, 99, 0.0, 0.0),)
    e = rel.disjunctive_revenue(*args, clauses=impossible)
    oe = rduck.sql(rel.disjunctive_revenue_sql(clauses=impossible)).arrow()
    assert e.column("revenue")[0].as_py() == 0.0
    assert e.cast(oe.schema).equals(oe)


def test_yoy_growth_oracle(rduck):
    """YoY growth vs the lag() twin — ORDER MATTERS (nation, year);
    first year per nation NULL; shuffle == broadcast plans."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_suppkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{SF_DIR}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/nation.parquet"),
    )
    t = rel.yoy_growth(*args)
    o = rduck.sql(rel.yoy_growth_sql()).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    # first year of every nation has NULL growth
    first_seen = set()
    for r in t.to_pylist():
        if r["n_name"] not in first_seen:
            assert r["growth"] is None
            first_seen.add(r["n_name"])
    assert rel.yoy_growth(*args, join_mode="shuffle").cast(
        o.schema
    ).equals(o)


def test_forecast_revenue_oracle(rduck):
    """Q6 analog vs the SQL oracle; inclusive discount band; empty
    window -> 0.0 (the COALESCE convention both sides)."""
    from search_engine_ray.functions import relational as rel

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount",
                                  "l_quantity", "l_extendedprice"])
    t = rel.forecast_revenue(li)
    o = rduck.sql(rel.forecast_revenue_sql()).arrow()
    assert t.column("revenue")[0].as_py() > 0
    assert t.cast(o.schema).equals(o)
    e = rel.forecast_revenue(li, date_from="2030-01-01",
                             date_to="2030-02-01")
    oe = rduck.sql(
        rel.forecast_revenue_sql(date_from="2030-01-01",
                                 date_to="2030-02-01")
    ).arrow()
    assert e.column("revenue")[0].as_py() == 0.0
    assert e.cast(oe.schema).equals(oe)


def test_nation_volume_oracle(rduck):
    """Q7 analog vs the SQL oracle — both directions present, shuffle
    == broadcast plans, unknown nation -> typed empty."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"]),
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{SF_DIR}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        rd.read_parquet(f"{SF_DIR}/nation.parquet"),
    )
    # sf0.001 has 10 suppliers; (18, 19) is a pair with volume in BOTH
    # directions inside the window (the default (1, 2) driver pair has
    # volume at sf0.01 where the gate checks it)
    pair = {"nation_a": "NATION_18", "nation_b": "NATION_19"}
    t = rel.nation_volume(*args, **pair)
    o = rduck.sql(rel.nation_volume_sql(**pair)).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    # the pair filter is asymmetric-inclusive: both directions appear
    dirs = {(r["supp_nation"], r["cust_nation"]) for r in t.to_pylist()}
    assert len(dirs) == 2
    assert rel.nation_volume(*args, join_mode="broadcast", **pair).cast(
        o.schema
    ).equals(o)
    e = rel.nation_volume(*args, nation_a="ATLANTIS")
    assert e.num_rows == 0 and e.column_names == [
        "supp_nation", "cust_nation", "l_year", "revenue",
    ]


def test_customer_distribution_oracle(rduck):
    """Q13 analog (no-join plan) vs the LEFT JOIN twin — ORDER MATTERS
    (custdist DESC, c_count DESC); the zero bucket equals the
    unreferenced-customer count; FK violation refused loudly."""
    from search_engine_ray.functions import relational as rel

    cust = rd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    ords = rd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_custkey"])
    t = rel.customer_distribution(cust, ords)
    o = rduck.sql(rel.customer_distribution_sql()).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    # zero bucket arithmetic: |customer| - |distinct custkeys in orders|
    want_zero = rduck.sql(
        "SELECT (SELECT count(*) FROM customer) - "
        "(SELECT count(DISTINCT o_custkey) FROM orders)"
    ).fetchone()[0]
    zero_rows = [
        r["custdist"] for r in t.to_pylist() if r["c_count"] == 0
    ]
    assert (zero_rows[0] if zero_rows else 0) == want_zero
    # FK violation: an order custkey no customer has -> loud refusal
    bad_c = rd.from_arrow(
        pa.table({"c_custkey": pa.array([1], pa.int64())})
    )
    bad_o = rd.from_arrow(
        pa.table({"o_custkey": pa.array([1, 2, 3], pa.int64())})
    )
    with pytest.raises(ValueError, match="FK violation"):
        rel.customer_distribution(bad_c, bad_o)


def test_big_orders_oracle(rduck):
    """Q18 analog vs the SQL oracle — ORDER MATTERS (total_qty DESC,
    orderkey ASC); every returned order exceeds the HAVING threshold;
    an impossible threshold returns the empty frame with schema."""
    from search_engine_ray.functions import relational as rel

    args = (
        rd.read_parquet(f"{SF_DIR}/customer.parquet",
                        columns=["c_custkey", "c_name"]),
        rd.read_parquet(f"{SF_DIR}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_orderdate", "o_totalprice"]),
        rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                        columns=["l_orderkey", "l_quantity"]),
    )
    t = rel.big_orders(*args)
    o = rduck.sql(rel.big_orders_sql()).arrow()
    assert t.num_rows == rel.Q18_K
    assert t.cast(o.schema).equals(o)
    assert min(t.column("total_qty").to_pylist()) > rel.Q18_QTY
    e = rel.big_orders(*args, qty_threshold=1e9)
    assert e.num_rows == 0 and "c_name" in e.column_names


def test_tfidf_join_path_equals_broadcast(docs_ds):
    """Forcing broadcast_max_terms below the vocabulary size must route
    through the term-keyed join path and produce the identical result
    (the 100 TB-vocabulary regime, exercised at test scale)."""
    from search_engine_ray.functions import text_analysis as ta

    base = _table(ta.tfidf_keywords(docs_ds))
    joined = _table(ta.tfidf_keywords(docs_ds, broadcast_max_terms=1))
    keys = [(c, "ascending") for c in base.column_names]
    assert base.sort_by(keys).equals(joined.select(base.column_names).sort_by(keys))
    assert base.num_rows > 0


def test_corpus_prep_lsh_backend_equals_exact(docs_ds):
    """The LSH-backed pipeline (what the size-adaptive default picks
    above EXACT_PAIRS_MAX_DOCS) equals the exact-backed one in the
    recall-1.0 regime, and the adaptive default picks LSH when the
    threshold is forced to zero."""
    from search_engine_ray.functions.dedup import minhash_lsh_pairs
    from search_engine_ray.pipelines import corpus_prep as cp

    exact = _table(cp.corpus_prep(docs_ds))  # auto: exact at this scale
    lsh = _table(cp.corpus_prep(docs_ds, pair_fn=minhash_lsh_pairs))
    keys = [(c, "ascending") for c in exact.column_names]
    assert exact.sort_by(keys).equals(lsh.select(exact.column_names).sort_by(keys))


def test_dup_clusters_rejects_negative_ids():
    """Negative doc ids would collide with the -1 label-row sentinel of
    the distributed propagation — entry must reject them loudly."""
    from search_engine_ray.functions import dedup

    pairs = pa.table(
        {"doc_a": pa.array([1, -2], pa.int64()), "doc_b": pa.array([2, 3], pa.int64())}
    )
    with pytest.raises(Exception, match="non-negative"):
        dedup.dup_clusters(pairs)


def test_top_unshipped_orders_keeps_zero_revenue_order():
    """An order whose qualifying lineitems all quantize to zero revenue
    (discount = 1.0) still has lineitems — the inner-join semantics keep
    it with revenue 0, exactly like the SQL oracle."""
    import datetime as dt

    from search_engine_ray.functions import relational as rel

    before = dt.datetime.fromisoformat("1998-01-01")
    after = dt.datetime.fromisoformat("1998-12-31")
    cust = rd.from_arrow(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array([rel.TOPK_SEGMENT], pa.string()),
    }))
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([100, 200], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderdate": pa.array([before, before], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
    }))
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([100, 200], pa.int64()),
        "l_extendedprice": pa.array([1000.0, 1000.0], pa.float64()),
        "l_discount": pa.array([1.0, 0.5], pa.float64()),  # 100 -> revenue 0
        "l_shipdate": pa.array([after, after], pa.timestamp("us")),
    }))
    t = rel.top_unshipped_orders(cust, orders, li)
    got = dict(zip(t["l_orderkey"].to_pylist(), t["revenue"].to_pylist()))
    assert got == {100: 0.0, 200: 500.0}


def test_knn_filtered_oracle_and_ivf_paths(emb_ds, fduck):
    """Filtered ANN: exact filtered brute force matches the SQL oracle;
    the IVF-pruned path with nprobe == nlist is pinned exactly equal;
    nprobe < nlist keeps recall >= 0.8 (same contract as unfiltered IVF)."""
    from search_engine_ray.functions import similarity

    exact = _assert_matches_oracle(
        similarity.knn_filtered(emb_ds), fduck,
        similarity.knn_filtered_sql("embeddings"),
    )
    assert exact.num_rows > 0
    indexed = similarity.build_ivf_index(emb_ds, nlist=8)
    full = similarity.knn_filtered(emb_ds, indexed=indexed, nprobe=8)
    assert exact.equals(full)  # full probe == exact, including order
    # filtered search needs a larger probe set than unfiltered for the
    # same recall (a label's neighbors may cluster in unprobed cells):
    # measured 0.675/0.775/0.85/0.9 at nprobe 3/4/5/6 of 8 on this data
    approx = similarity.knn_filtered(emb_ds, indexed=indexed, nprobe=5)
    want = set(zip(exact["query_id"].to_pylist(), exact["neighbor_id"].to_pylist()))
    got = set(zip(approx["query_id"].to_pylist(), approx["neighbor_id"].to_pylist()))
    assert len(want & got) / len(want) >= 0.8


def test_repetition_features_crafted_and_oracle(docs_ds, fduck):
    """Duplicate-bigram ratio: crafted strings with known repetition,
    plus oracle parity over the documents table."""
    from search_engine_ray.functions import text_analysis as ta

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a1 b2 a1 b2 a1 b2",   # grams: 5 total, 2 distinct -> 0.6
            "w x y z",             # all distinct -> 0.0
            "solo",                # < 2 tokens -> zeros
            None,                  # null text -> zeros
        ], pa.string()),
    })
    t = ta.repetition_features(batch)
    assert t["n_ngrams"].to_pylist() == [5, 3, 0, 0]
    assert t["n_distinct_ngrams"].to_pylist() == [2, 3, 0, 0]
    assert t["dup_ngram_ratio"].to_pylist() == [0.6, 0.0, 0.0, 0.0]
    got = _assert_matches_oracle(
        docs_ds.map_batches(lambda b: ta.repetition_features(b), batch_format="pyarrow"),
        fduck, ta.repetition_features_sql("documents"),
    )
    assert got.num_rows == docs_ds.count()
    # the Zipfian corpus has real repetition to exercise the signal
    assert max(got["dup_ngram_ratio"].to_pylist()) > 0


# --------------------------- k-means clustering ---------------------------


def test_kmeans_assign_matches_oracle(emb_ds, fduck):
    from search_engine_ray.functions import similarity

    cents = similarity.seed_centroids(emb_ds, 4)
    got = similarity.kmeans_assign(emb_ds, cents).to_pandas()
    exp = fduck.execute(
        similarity.kmeans_assign_sql("embeddings", 4)
    ).fetch_df()
    got = got.sort_values("vec_id").reset_index(drop=True)
    exp = exp.sort_values("vec_id").reset_index(drop=True)
    assert (got["vec_id"] == exp["vec_id"]).all()
    assert (got["cluster"].astype("int64") == exp["cluster"].astype("int64")).all()
    assert np.allclose(got["cosine"], exp["cosine"], atol=2e-6)


def test_kmeans_fit_invariants(emb_ds):
    """Distributed Lloyd's: (1) the spherical objective is monotonically
    non-decreasing across iterations; (2) the distributed fit matches a
    driver-side numpy reference with the same seed-centroid init (the
    corpus is small enough to hold, so the partial-sum machinery itself
    is what's under test); (3) the returned centroids are a fixpoint for
    assignment (re-assigning against them reproduces the last
    iteration's assignment)."""
    from search_engine_ray.functions import similarity
    from search_engine_ray.functions.similarity import _normalize

    k, iters = 4, 5
    cents, obj = similarity.kmeans_fit(emb_ds, k=k, iters=iters)
    assert len(obj) == iters
    assert all(b >= a - 1e-9 for a, b in zip(obj, obj[1:])), obj

    # driver-side reference run (same init, exact means)
    df = emb_ds.to_pandas().sort_values("vec_id")
    x = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    c = x[:k].copy()
    for _ in range(iters):
        a = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    # same assignment (argmax gaps dwarf float64 summation-order drift)
    got = np.argmax(x @ cents.T, axis=1)
    ref = np.argmax(x @ c.T, axis=1)
    assert (got == ref).all()
    assert np.allclose(cents, c, atol=1e-9)

    # fixpoint: one more assignment pass against the returned centroids
    # is exactly what kmeans_assign computes
    assigned = similarity.kmeans_assign(emb_ds, cents).to_pandas().sort_values("vec_id")
    assert (assigned["cluster"].to_numpy() == got).all()
    assert len(set(assigned["cluster"])) > 1  # corpus isn't degenerate


# --------------------------- corpus aggregates ----------------------------


def test_column_quantiles_exact_rule():
    """The rank rule (value at 1-based rank ceil(q*n)) on a crafted
    multiset, checked against a direct sorted-array lookup, including
    fractions whose float form straddles integer boundaries."""
    from search_engine_ray.functions import aggregates

    vals = np.repeat(np.arange(10, dtype=np.int64), [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    qs = ((1, 4), (1, 2), (3, 4), (9, 10), (99, 100), (1, 1))
    got = aggregates.column_quantiles(
        ds, lambda b: b.column("v").to_numpy(zero_copy_only=False), qs
    ).to_pylist()
    s = np.sort(vals)
    n = len(s)
    for row, (num, den) in zip(got, qs):
        rank = (num * n + den - 1) // den
        assert row["value"] == int(s[rank - 1]), (num, den)
        assert row["q"] == num / den


def test_conv_stats_invariants(tiny_corpus):
    from search_engine_ray.functions import aggregates
    from search_engine_ray.sources.transcripts import read_transcripts

    ds = read_transcripts(tiny_corpus)
    total = ds.count()
    t = aggregates.conv_stats(ds).to_pandas()
    assert int(t["n_turns"].sum()) == total
    assert (t["n_tool_turns"] <= t["n_turns"]).all()
    assert (t["first_ts"] <= t["last_ts"]).all()
    assert t["conv_id"].is_unique


def test_role_top_lemmas_shape(tiny_corpus):
    from search_engine_ray.functions import aggregates
    from search_engine_ray.sources.transcripts import read_transcripts

    t = aggregates.role_top_lemmas(
        read_transcripts(tiny_corpus, columns=["role", "text"]), k=5
    ).to_pandas()
    for role, g in t.groupby("role"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        df = g.sort_values("rank")["df"].to_numpy()
        assert (df[:-1] >= df[1:]).all()
        assert len(g) <= 5


# ---------------------------------------------------------------------------
# Bigram LM quality score
# ---------------------------------------------------------------------------


def test_lm_score_vs_oracle(docs_ds, fduck):
    from search_engine_ray.functions.text_analysis import lm_score, lm_score_sql

    got = (
        _table(lm_score(docs_ds))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        fduck.execute(lm_score_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert (got["n_tokens"].values == exp["n_tokens"].values).all()
    assert np.abs(got["avg_logprob"].values - exp["avg_logprob"].values).max() <= 2e-6


def test_lm_score_joined_path_pinned_equal(docs_ds):
    from search_engine_ray.functions.text_analysis import lm_score

    a = (
        _table(lm_score(docs_ds))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        _table(lm_score(docs_ds, broadcast_max_grams=10))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (a["doc_id"].values == b["doc_id"].values).all()
    assert (a["n_tokens"].values == b["n_tokens"].values).all()
    assert np.abs(a["avg_logprob"].values - b["avg_logprob"].values).max() == 0.0


def test_dsir_weights_vs_oracle(docs_ds, fduck):
    from search_engine_ray.functions.text_analysis import (
        dsir_weights,
        dsir_weights_sql,
    )

    got = (
        _table(dsir_weights(docs_ds))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        fduck.execute(dsir_weights_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert (got["n_feats"].values == exp["n_feats"].values).all()
    assert np.abs(got["dsir_logratio"].values - exp["dsir_logratio"].values).max() <= 2e-6


def test_quantize_embeddings_and_knn_recall(emb_ds, fduck):
    """int8 scalar quantization: codes equal the SQL oracle exactly and
    are invariant to block layout; dequantized brute-force knn keeps
    high recall vs the exact float path (the compression is 4x, the
    synthetic embeddings are well-separated)."""
    from search_engine_ray.functions.similarity import (
        knn_bruteforce,
        knn_quantized,
        quantize_embeddings,
        quantize_embeddings_sql,
    )

    got = (_table(quantize_embeddings(emb_ds)).to_pandas()
           .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    exp = (fduck.execute(quantize_embeddings_sql("embeddings")).df()
           .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert (got["code"].values == exp["code"].values).all()
    assert got["code"].min() >= 0 and got["code"].max() <= 255
    rep = (_table(quantize_embeddings(emb_ds.repartition(7))).to_pandas()
           .sort_values(["vec_id", "dim"]).reset_index(drop=True))
    assert (rep["code"].values == got["code"].values).all()

    exact = knn_bruteforce(emb_ds, k=5).to_pandas()
    quant = knn_quantized(emb_ds, k=5).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_id"):
        e = set(g["neighbor_id"])
        qn = set(quant[quant["query_id"] == qid]["neighbor_id"])
        hits += len(e & qn)
        total += len(e)
    assert total and hits / total >= 0.8, f"SQ8 recall {hits}/{total}"


def test_pq_codes_fit_and_adc_recall(emb_ds, fduck):
    """Product quantization: (1) seed-codebook codes equal the SQL
    oracle exactly (left-to-right op order mirrored) and are invariant
    to block layout; (2) the distributed per-subspace Lloyd's fit has a
    non-increasing SSE and matches a driver-side numpy reference; (3)
    ADC top-k over the fitted codes keeps high recall vs the exact
    float path (m=8 lookups replace d=64 multiply-adds)."""
    from search_engine_ray.functions.similarity import (
        _normalize_seq,
        _pq_dists,
        knn_bruteforce,
        knn_pq,
        pq_encode,
        pq_encode_sql,
        pq_fit,
        pq_seed_codebooks,
    )

    seeds = pq_seed_codebooks(emb_ds)
    got = (_table(pq_encode(emb_ds, seeds)).to_pandas()
           .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    exp = (fduck.execute(pq_encode_sql("embeddings")).df()
           .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert (got["code"].values == exp["code"].values).all()
    assert got["code"].min() >= 0 and got["code"].max() <= 15
    rep = (_table(pq_encode(emb_ds.repartition(7), seeds)).to_pandas()
           .sort_values(["vec_id", "sub"]).reset_index(drop=True))
    assert (rep["code"].values == got["code"].values).all()

    m, n_cents, iters = 16, 64, 4
    cents, sse = pq_fit(emb_ds, m=m, n_cents=n_cents, iters=iters)
    assert len(sse) == iters
    assert all(b <= a + 1e-9 for a, b in zip(sse, sse[1:])), sse
    # driver-side reference fit (same seeds, exact means per subspace)
    df = emb_ds.to_pandas().sort_values("vec_id")
    x = _normalize_seq(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    dsub = x.shape[1] // m
    subs = x.reshape(len(x), m, dsub)
    ref = pq_seed_codebooks(emb_ds, m=m, n_cents=n_cents).copy()
    for _ in range(iters):
        new = ref.copy()
        for s in range(m):
            a = np.argmin(_pq_dists(subs[:, s, :], ref[s]), axis=1)
            for j in range(n_cents):
                sel = a == j
                if sel.any():
                    new[s, j] = subs[sel, s, :].mean(axis=0)
        ref = new
    assert np.allclose(cents, ref, atol=1e-9)

    exact = knn_bruteforce(emb_ds, k=5).to_pandas()
    adc = knn_pq(emb_ds, k=5).to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_id"):
        e = set(g["neighbor_id"])
        qn = set(adc[adc["query_id"] == qid]["neighbor_id"])
        hits += len(e & qn)
        total += len(e)
    # 0.5 bar: the synthetic corpus's true top-10 cosines cluster within
    # ~0.01-0.05 while mean ADC reconstruction error is ~0.036 — neighbor
    # order is partly unresolvable at ANY practical code size (see the
    # knn_pq docstring's measured sweep); the bar pins the math works,
    # not that this data is PQ-friendly
    assert total and hits / total >= 0.5, f"PQ recall {hits}/{total}"


def test_ivfpq_full_probe_identity_and_recall(emb_ds):
    """IVF-PQ composition: (1) nprobe == nlist prunes nothing, so the
    result is EXACTLY knn_pq (the composition identity — cell assign
    and code assign are independent); (2) pruned probes keep useful
    recall vs the exact float path (IVF loss stacks on the corpus's
    PQ near-tie bound — see test_pq_codes_fit_and_adc_recall); (3)
    results are invariant to block layout (per-block partial top-k
    merge loses nothing)."""
    from search_engine_ray.functions.similarity import (
        knn_bruteforce,
        knn_ivfpq,
        knn_pq,
    )

    full = knn_ivfpq(emb_ds, k=5, nlist=8, nprobe=8)
    plain = knn_pq(emb_ds, k=5)
    assert full.equals(plain)

    pruned = knn_ivfpq(emb_ds, k=5, nlist=8, nprobe=3)
    rep = knn_ivfpq(emb_ds.repartition(7), k=5, nlist=8, nprobe=3)
    assert pruned.equals(rep)

    exact = knn_bruteforce(emb_ds, k=5).to_pandas()
    apq = pruned.to_pandas()
    hits = total = 0
    for qid, g in exact.groupby("query_id"):
        e = set(g["neighbor_id"])
        qn = set(apq[apq["query_id"] == qid]["neighbor_id"])
        hits += len(e & qn)
        total += len(e)
    # PQ alone pins >= 0.5 on this corpus; 3/8 cell pruning loses more
    # by design — the bar pins the composition finds real neighbors,
    # not that the synthetic near-tie corpus is IVF-PQ-friendly
    assert total and hits / total >= 0.35, f"IVF-PQ recall {hits}/{total}"


def test_dsir_resample_vs_oracle_and_block_invariance(docs_ds, fduck):
    """The Gumbel-top-k draw is a deterministic function of (weights,
    ids): identical to the SQL oracle's draw (same md5-uniform noise),
    and invariant to block structure (the per-block partial top-k merge
    loses nothing)."""
    from search_engine_ray.functions.text_analysis import (
        dsir_resample,
        dsir_resample_sql,
    )

    got = dsir_resample(docs_ds, k=25).to_pandas()
    exp = fduck.execute(dsir_resample_sql("documents", k=25)).df()
    assert len(got) == len(exp) == 25
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert (got["rank"].values == exp["rank"].values).all()
    assert np.abs(got["resample_key"].values - exp["resample_key"].values).max() <= 2e-6
    assert len(set(got["doc_id"])) == 25  # without replacement
    rep = dsir_resample(docs_ds.repartition(7), k=25).to_pandas()
    assert (rep["doc_id"].values == got["doc_id"].values).all()


def test_pack_sequences_semantics_and_oracle(docs_ds, fduck):
    """Concat-and-chunk packing: crafted boundary cases (doc spanning a
    sequence boundary, empty doc at a boundary, group restart) plus the
    exact SQL oracle over the documents table, invariant to block
    structure."""
    from search_engine_ray.functions.packing import (
        pack_sequences,
        pack_sequences_sql,
    )

    rows = [
        {"doc_id": 0, "text": "a b c d"},        # 4 toks: seq 0 [0,4)
        {"doc_id": 1, "text": "e f g"},          # start 4, spans seq 0->1
        {"doc_id": 2, "text": ""},               # empty: sits at offset 7
        {"doc_id": 3, "text": "h i j k l"},      # start 7, spans 1->2
        {"doc_id": 10, "text": "m n"},           # NEW group (group_size 10)
    ]
    got = {r["doc_id"]: r for r in _table(
        pack_sequences(rd.from_items(rows), max_len=5, group_size=10)
    ).to_pylist()}
    assert got[0] == {"doc_id": 0, "n_tokens": 4, "pack_group": 0,
                      "start_offset": 0, "first_seq": 0, "last_seq": 0}
    assert got[1]["start_offset"] == 4 and (got[1]["first_seq"], got[1]["last_seq"]) == (0, 1)
    assert got[2]["n_tokens"] == 0 and got[2]["first_seq"] == got[2]["last_seq"] == 1
    assert (got[3]["first_seq"], got[3]["last_seq"]) == (1, 2)
    assert got[10]["pack_group"] == 1 and got[10]["start_offset"] == 0

    a = (_table(pack_sequences(docs_ds)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (fduck.execute(pack_sequences_sql("documents")).df()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(a) == len(b)
    for col in ("doc_id", "n_tokens", "pack_group", "start_offset",
                "first_seq", "last_seq"):
        assert (a[col].values == b[col].values).all(), col
    c = (_table(pack_sequences(docs_ds.repartition(7))).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert (c["start_offset"].values == a["start_offset"].values).all()

    import pytest as _pytest

    # Ray wraps the worker-side ValueError in RayTaskError
    with _pytest.raises(Exception, match="non-negative"):
        _table(pack_sequences(rd.from_items([{"doc_id": -1, "text": "x"}])))
    with _pytest.raises(ValueError, match="positive"):
        pack_sequences(docs_ds, max_len=0)


def test_distinct_tokens_and_hll(docs_ds, fduck):
    """Exact distinct == COUNT(DISTINCT); HLL registers == the SQL
    register table bit-for-bit; the estimate lands within the 3-sigma
    HLL band of the exact count; registers invariant to block layout."""
    from search_engine_ray.functions.text_analysis import (
        HLL_P,
        distinct_tokens,
        distinct_tokens_sql,
        hll_estimate,
        hll_registers,
        hll_registers_sql,
    )

    exact = distinct_tokens(docs_ds).column("n_distinct")[0].as_py()
    sql_exact = fduck.execute(distinct_tokens_sql("documents")).df()
    assert exact == int(sql_exact["n_distinct"][0]) > 0

    regs = _table(hll_registers(docs_ds))
    sql_regs = fduck.execute(hll_registers_sql("documents")).df()
    got = regs.to_pandas()
    assert (got["bucket"].values == sql_regs["bucket"].values).all()
    assert (got["register"].values == sql_regs["register"].values).all()
    rep = _table(hll_registers(docs_ds.repartition(7))).to_pandas()
    assert (rep["register"].values == got["register"].values).all()

    est = hll_estimate(regs)
    sigma = 1.04 / np.sqrt(1 << HLL_P)
    assert abs(est - exact) <= max(3 * sigma * exact, 2.0)


def test_hll_high_cardinality_regime():
    """20k distinct synthetic tokens — well past linear counting — stay
    inside the 3-sigma band, and the register table equals a pure-python
    bit_length reference (pins the float-log2 boundary correction)."""
    import hashlib as _hl

    from search_engine_ray.functions.text_analysis import (
        HLL_P,
        hll_estimate,
        hll_registers,
    )

    n = 20_000
    rows = [
        {"doc_id": i, "text": " ".join(f"tok{i}x{j}" for j in range(20))}
        for i in range(n // 20)
    ]
    ds = rd.from_items(rows)
    regs = _table(hll_registers(ds))
    # pure-python reference registers
    m, wbits = 1 << HLL_P, 64 - HLL_P
    ref = [0] * m
    for i in range(n // 20):
        for j in range(20):
            h = int(_hl.md5(f"tok{i}x{j}".encode()).hexdigest()[:16], 16)
            b, w = h >> wbits, h & ((1 << wbits) - 1)
            ref[b] = max(ref[b], wbits - w.bit_length() + 1)
    got = {r["bucket"]: r["register"] for r in regs.to_pylist()}
    assert got == {b: r for b, r in enumerate(ref) if r}
    est = hll_estimate(regs)
    sigma = 1.04 / np.sqrt(m)
    assert abs(est - n) <= 3 * sigma * n


def test_dsir_weights_semantics():
    """Feature count = 2T-1 (uni+bi), empty/null docs 0, and docs made
    of target-dominant tokens outrank raw-dominant ones (the resampling
    direction the operator exists for)."""
    from search_engine_ray.functions import sampling
    from search_engine_ray.functions.text_analysis import dsir_weights

    # ids whose md5 digest puts them in / out of the 50% target split
    digs = sampling._digests(11, list(range(20))).to_pylist()
    thresh = sampling._hex_threshold(0.5)
    in_t = [i for i in range(20) if digs[i] < thresh]
    out_t = [i for i in range(20) if digs[i] >= thresh]
    assert in_t and out_t
    rows = [{"doc_id": i, "text": "zzz zzz" if i in in_t else "qqq qqq"}
            for i in range(20)]
    rows += [{"doc_id": 100, "text": ""}, {"doc_id": 101, "text": None},
             {"doc_id": 102, "text": "a b c"}]
    ds = rd.from_items(rows)
    got = {r["doc_id"]: r for r in _table(
        dsir_weights(ds, target_fraction=0.5)
    ).to_pylist()}
    assert got[102]["n_feats"] == 5  # 3 unigrams + 2 bigrams
    for i in (100, 101):
        assert got[i]["n_feats"] == 0 and got[i]["dsir_logratio"] == 0.0
    # target-looking docs carry strictly higher importance weights
    assert got[in_t[0]]["dsir_logratio"] > got[out_t[0]]["dsir_logratio"]
    # deterministic across runs
    again = {r["doc_id"]: r for r in _table(
        dsir_weights(ds, target_fraction=0.5)
    ).to_pylist()}
    assert again == got


def test_pmi_collocations_vs_oracle(docs_ds, fduck):
    from search_engine_ray.functions.text_analysis import (
        pmi_collocations,
        pmi_collocations_sql,
    )

    got = pmi_collocations(docs_ds).to_pandas()
    exp = fduck.execute(pmi_collocations_sql("documents")).df()
    assert len(got) == len(exp)
    for c in ("rank", "bigram", "n_pair", "n_w1", "n_w2"):
        assert (got[c].values == exp[c].values).all(), c
    assert np.abs(got["pmi"].values - exp["pmi"].values).max() <= 2e-6


def test_regex_scan_crafted():
    """Crafted strings: boundary, case-insensitive flag, digit runs,
    null text; plus sf0.001 oracle parity on the documents table."""
    from search_engine_ray.functions.text_analysis import regex_scan

    ds = rd.from_items(
        [
            {"conv_id": "a", "turn_idx": 0, "text": "walked fast"},
            {"conv_id": "a", "turn_idx": 1, "text": "walk now"},
            {"conv_id": "b", "turn_idx": 0, "text": "WALKED 1234"},
            {"conv_id": "b", "turn_idx": 1, "text": None},
        ]
    )
    got = regex_scan(
        ds, {"q1": r"\bwalked\b", "q2": r"(?i)walked", "q3": r"[0-9]{3,}"}
    ).to_pandas()
    rows = {(r.query_id, r.conv_id, r.turn_idx) for r in got.itertuples()}
    assert rows == {
        ("q1", "a", 0),
        ("q2", "a", 0), ("q2", "b", 0),
        ("q3", "b", 0),
    }


def test_regex_scan_vs_oracle(docs_ds, fduck):
    from search_engine_ray.functions.text_analysis import regex_scan, regex_scan_sql

    pats = {"q1": r"(?i)the", "q2": r"[a-z]+ing\b"}
    got = regex_scan(
        docs_ds, pats, keep_cols=("doc_id",)
    ).to_pandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    exp = (
        fduck.execute(regex_scan_sql("documents", pats, keep_cols=("doc_id",)))
        .df().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    assert (got["query_id"].values == exp["query_id"].values).all()
    assert (got["doc_id"].values == exp["doc_id"].values).all()


def test_dup_window_ratio_vs_oracle(docs_ds, fduck):
    from search_engine_ray.functions.text_analysis import (
        dup_window_ratio,
        dup_window_ratio_sql,
    )

    got = (
        dup_window_ratio(docs_ds).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    exp = (
        fduck.execute(dup_window_ratio_sql("documents")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("doc_id", "n_windows", "n_dup_windows"):
        assert (got[c].values == exp[c].values).all(), c
    assert np.abs(
        got["dup_window_ratio"].values - exp["dup_window_ratio"].values
    ).max() <= 2e-6
    assert (got["n_dup_windows"] > 0).any()  # the synthetic dups register


def test_dup_window_ratio_crafted():
    """Two docs sharing one exact 5-token span are both flagged for
    exactly that window; intra-doc repetition of a window counts as
    duplication too; sub-window docs have zero windows."""
    from search_engine_ray.functions.text_analysis import dup_window_ratio

    shared = "alpha beta gamma delta epsilon"
    ds = rd.from_items(
        [
            {"doc_id": 0, "text": f"{shared} unique0 tail0"},
            {"doc_id": 1, "text": f"lead1 {shared} unique1"},
            {"doc_id": 2, "text": "totally different words here now indeed"},
            {"doc_id": 3, "text": "tiny doc"},
            # 'x y z w v' appears twice WITHIN one doc
            {"doc_id": 4, "text": "x y z w v x y z w v"},
        ]
    )
    rows = {r["doc_id"]: r for r in dup_window_ratio(ds).to_pandas().to_dict("records")}
    assert rows[0]["n_windows"] == 3 and rows[0]["n_dup_windows"] == 1
    assert rows[1]["n_windows"] == 3 and rows[1]["n_dup_windows"] == 1
    assert rows[2]["n_dup_windows"] == 0
    assert rows[3]["n_windows"] == 0 and rows[3]["dup_window_ratio"] == 0.0
    # doc 4: 10 tokens -> 6 windows; 'x y z w v' occurs at pos 0 and 5;
    # windows 1..4 are unique singletons
    assert rows[4]["n_windows"] == 6 and rows[4]["n_dup_windows"] == 2
    assert rows[4]["dup_window_ratio"] == round(2 / 6, 6)


def test_heavy_hitters_vs_oracle(docs_ds, fduck):
    """Certified two-pass path AND the forced full-groupby fallback both
    equal the exact SQL top-k."""
    from search_engine_ray.functions.text_analysis import (
        heavy_hitters,
        heavy_hitters_sql,
    )

    exp = fduck.execute(heavy_hitters_sql("documents")).df()
    for n_cand in (256, 2):  # 2 can't certify -> fallback
        got = heavy_hitters(docs_ds, n_candidates=n_cand).to_pandas()
        assert len(got) == len(exp)
        assert (got["rank"].values == exp["rank"].values).all()
        assert (got["token"].values == exp["token"].values).all(), n_cand
        assert (got["n"].values == exp["n"].values).all(), n_cand


def test_heavy_hitters_crafted_skew():
    """A block with more distinct tokens than the MG parameter forces
    per-block truncation; the dominant token must still come out with
    its EXACT count (the recount pass), and empty corpora degenerate."""
    from search_engine_ray.functions.text_analysis import heavy_hitters

    filler = " ".join(f"tok{i:03d}" for i in range(300))
    ds = rd.from_items(
        [{"doc_id": 0, "text": ("hot " * 500) + filler},
         {"doc_id": 1, "text": "hot hot cold"}]
    )
    t = heavy_hitters(ds, k=2, n_candidates=16).to_pylist()
    assert t[0] == {"rank": 1, "token": "hot", "n": 502}
    assert heavy_hitters(
        rd.from_items([{"doc_id": 0, "text": None}])
    ).num_rows == 0


def test_pmi_collocations_crafted():
    """Hand-checkable: 5x 'p q' -> one surviving bigram with
    pmi = ln((5/5) / ((5/10) * (5/10))) = ln 4."""
    import math

    from search_engine_ray.functions.text_analysis import pmi_collocations

    ds = rd.from_items([{"doc_id": i, "text": "p q"} for i in range(5)])
    t = pmi_collocations(ds).to_pylist()
    assert len(t) == 1
    r = t[0]
    assert r["rank"] == 1 and r["bigram"] == "p q"
    assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (5, 5, 5)
    assert abs(r["pmi"] - round(math.log(4), 6)) <= 1e-9
    # below the min_count floor nothing survives
    ds2 = rd.from_items([{"doc_id": i, "text": "p q"} for i in range(4)])
    assert pmi_collocations(ds2).num_rows == 0
    # empty corpus degenerates cleanly
    ds3 = rd.from_items([{"doc_id": 0, "text": ""}])
    assert pmi_collocations(ds3).num_rows == 0


def test_lm_score_crafted():
    """Hand-checkable corpus: 'a b a b' + 'a b' + '' under add-0.5.
    Unigrams: a:3 b:3 (N=6, V=2); bigrams: 'a b':3, 'b a':1."""
    import math

    from search_engine_ray.functions.text_analysis import lm_score

    ds = rd.from_items(
        [
            {"doc_id": 0, "text": "a b a b"},
            {"doc_id": 1, "text": "A   b!"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": None},
        ]
    )
    rows = {
        r["doc_id"]: r
        for r in _table(lm_score(ds)).to_pylist()
    }
    a = 0.5
    p_first = math.log((3 + a) / (6 + a * 2))   # c1[a]=3
    p_ab = math.log((3 + a) / (3 + a * 2))      # c2[a b]=3, c1[a]=3
    p_ba = math.log((1 + a) / (3 + a * 2))      # c2[b a]=1, c1[b]=3
    exp0 = (p_first + p_ab + p_ba + p_ab) / 4
    exp1 = (p_first + p_ab) / 2
    assert rows[0]["n_tokens"] == 4 and abs(rows[0]["avg_logprob"] - round(exp0, 6)) <= 1e-9
    assert rows[1]["n_tokens"] == 2 and abs(rows[1]["avg_logprob"] - round(exp1, 6)) <= 1e-9
    assert rows[2]["n_tokens"] == 0 and rows[2]["avg_logprob"] == 0.0
    assert rows[3]["n_tokens"] == 0 and rows[3]["avg_logprob"] == 0.0


# ------------------------------------------------------- line dedup


def test_line_dedup_crafted_vs_oracle():
    """Keep-globally-first semantics on crafted docs: within-doc dup
    cut, cross-doc dup cut at the later (doc, line) key, short lines
    immune, empty text survives as one (kept) empty line."""
    import duckdb

    from search_engine_ray.functions.text_analysis import (
        line_dedup,
        line_dedup_sql,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "the quick brown fox jumps\nshort\nthe quick brown fox jumps"
            "\nunique first-doc line here",
            "the quick brown fox jumps\nanother unique line here\nshort",
            "",
            "unique first-doc line here\nshort\nshort",
        ],
    })
    got = (
        line_dedup(rd.from_arrow(docs)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("crafted", docs)
    exp = (
        con.execute(line_dedup_sql("crafted")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    assert got[exp.columns.tolist()].equals(exp)
    r = {x["doc_id"]: x for x in got.to_dict("records")}
    assert r[0]["text"].count("the quick brown fox jumps") == 1
    assert "the quick brown fox jumps" not in r[1]["text"]
    assert r[3]["text"] == "short\nshort"  # cross-doc dup cut, shorts kept
    assert (r[2]["text"], r[2]["n_lines"], r[2]["n_kept"]) == ("", 1, 1)


def test_line_dedup_corpus_vs_oracle_and_block_invariance(docs_ds, fduck):
    """The full lineified-documents pipeline == the SQL twin at
    sf0.001 (text byte-equal), and the result is invariant to block
    layout (the keep-first rule is a global property, not an
    artifact of batch boundaries)."""
    from search_engine_ray.functions.text_analysis import (
        line_dedup,
        line_dedup_sql,
        lineify_words,
        lineify_words_rel,
    )

    got = _assert_matches_oracle(
        line_dedup(lineify_words(docs_ds)),
        fduck,
        line_dedup_sql(lineify_words_rel("documents")),
    )
    assert got.num_rows > 0
    dropped = pa.compute.sum(
        pa.compute.subtract(got.column("n_lines"), got.column("n_kept"))
    ).as_py()
    assert dropped > 0  # the synthetic corpus does contain dup lines
    rechunked = line_dedup(lineify_words(docs_ds.repartition(7)))
    a = _table(rechunked).sort_by([("doc_id", "ascending")])
    assert a.equals(got.sort_by([("doc_id", "ascending")]))


def test_line_dedup_guards():
    from search_engine_ray.functions.text_analysis import line_dedup

    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64()),
        "text": ["x" * 20],
    }))
    with pytest.raises(Exception, match="doc_id outside"):
        line_dedup(bad).to_pandas()


def test_gopher_rules_crafted_vs_oracle(fduck):
    """Gopher quality rules (Rae et al. 2021 A1.1) on crafted texts
    exercising EVERY branch: a clean keeper, too-short, mean-word-len
    bounds, symbol (# / ...) ratio, bullet lines, ellipsis lines,
    non-alpha words, missing required stopwords, null/empty text."""
    from search_engine_ray.functions import text_analysis as ta

    keeper = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"] * 7
    )  # 56 words, all alpha, mean len ~3.2, no symbols
    rows = [
        keeper,                                          # 0: keep
        "the be short doc",                              # 1: < 50 words
        " ".join(["ab"] * 60) + " the be",               # 2: mean word len < 3
        " ".join(["w" * 12] * 60) + " the be",           # 3: mean word len > 10
        keeper + " " + " ".join(["#"] * 10),             # 4: symbol ratio >= 0.1
        "\n".join(["- " + keeper[:20]] * 10) + "\n" + keeper,  # 5: bullets (10/11)
        "\n".join([keeper[:30] + "..."] * 5) + "\n" + keeper,  # 6: ellipsis (5/6)
        " ".join(["1234"] * 40) + " " + keeper,          # 7: alpha ratio <= 0.8
        " ".join(["xray"] * 60),                         # 8: no stopwords
        None,                                            # 9: null text
        "",                                              # 10: empty
        keeper + " line…\nmore " + keeper,               # 11: unicode ellipsis line
    ]
    t = pa.table({"doc_id": list(range(len(rows))), "text": rows})
    fduck.register("gopher_docs", t)
    cols = ["doc_id", "n_words", "mean_word_len", "symbol_ratio",
            "bullet_ratio", "ellipsis_ratio", "alpha_word_ratio",
            "n_stop_hits", "gopher_keep"]
    out = _assert_matches_oracle(
        ta.gopher_rules(t).select(cols),
        fduck,
        ta.gopher_rules_sql("gopher_docs", id_col="doc_id"),
    )
    by = {r["doc_id"]: r for r in out.to_pylist()}
    assert by[0]["gopher_keep"] is True
    for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10):
        assert by[i]["gopher_keep"] is False, i
    assert by[1]["n_words"] == 4
    assert by[4]["symbol_ratio"] >= 0.1
    assert by[5]["bullet_ratio"] > 0.9
    assert by[6]["ellipsis_ratio"] > 0.3
    assert by[7]["alpha_word_ratio"] <= 0.8
    assert by[8]["n_stop_hits"] == 0
    assert by[9]["n_words"] == 0 and by[10]["n_words"] == 0
    assert by[11]["ellipsis_ratio"] > 0.0  # unicode … counted as a line end


def test_gopher_rules_corpus_vs_oracle(docs_ds, fduck):
    """Full-corpus Gopher frame == the SQL twin over the documents
    table (the driver query's exact shape), block-layout invariant."""
    from search_engine_ray.functions import text_analysis as ta

    cols = ["doc_id", "n_words", "mean_word_len", "symbol_ratio",
            "bullet_ratio", "ellipsis_ratio", "alpha_word_ratio",
            "n_stop_hits", "gopher_keep"]
    _assert_matches_oracle(
        docs_ds.map_batches(
            lambda b: ta.gopher_rules(b).select(cols), batch_format="pyarrow"
        ),
        fduck,
        ta.gopher_rules_sql("documents"),
    )
    _assert_matches_oracle(
        docs_ds.repartition(7).map_batches(
            lambda b: ta.gopher_rules(b).select(cols), batch_format="pyarrow"
        ),
        fduck,
        ta.gopher_rules_sql("documents"),
    )


def test_winnow_crafted_vs_oracle_and_guarantee(fduck):
    """Winnowing (Schleimer 2003): crafted docs pin the SQL twin, the
    w+k-1 shared-substring guarantee, the rightmost-min tie rule (a
    repeated gram ties with itself), short-doc fallback, density."""
    from search_engine_ray.functions import text_analysis as ta

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = w + k - 1 tokens
    rows = [
        f"one two three {shared} four five six",       # 0: shares with 1
        f"{shared} nine ten eleven twelve thirteen",   # 1: shares with 0
        "only three tokens here",                      # 2: 4 toks, 1 gram
        "tok",                                         # 3: < k tokens, no grams
        None,                                          # 4: null
        "rep rep rep rep rep rep rep rep rep rep",     # 5: all grams identical
    ]
    t = pa.table({"doc_id": list(range(len(rows))), "text": rows})
    fduck.register("winnow_docs", t)
    import ray.data as rd

    out = _assert_matches_oracle(
        ta.winnow_fingerprints(rd.from_arrow(t)),
        fduck,
        ta.winnow_fingerprints_sql("winnow_docs"),
    )
    rows_out = out.to_pylist()
    by_doc: dict[int, list] = {}
    for r in rows_out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # guarantee: docs 0 and 1 share a 7-token run -> share a fingerprint
    fp0 = {r["fp"] for r in by_doc[0]}
    fp1 = {r["fp"] for r in by_doc[1]}
    assert fp0 & fp1
    # short doc (1 gram < w): exactly its one gram selected at pos 0
    assert [(r["pos"]) for r in by_doc[2]] == [0]
    # no-gram docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc
    # all-identical grams: ONE fingerprint value; rightmost-min tie rule
    # means each window selects its last slot -> every pos from w-1 on
    assert len({r["fp"] for r in by_doc[5]}) == 1
    assert sorted(r["pos"] for r in by_doc[5]) == [3, 4, 5, 6]
    # density sanity: selections are a strict subset of all grams
    assert len(by_doc[0]) < len(rows[0].split()) - 3


def test_winnow_corpus_block_invariance(docs_ds, fduck):
    """Full-corpus winnowing == the SQL twin, invariant under block
    layout (each row is a doc, so windows never cross batches)."""
    from search_engine_ray.functions import text_analysis as ta

    _assert_matches_oracle(
        ta.winnow_fingerprints(docs_ds), fduck,
        ta.winnow_fingerprints_sql("documents"),
    )
    _assert_matches_oracle(
        ta.winnow_fingerprints(docs_ds.repartition(7)), fduck,
        ta.winnow_fingerprints_sql("documents"),
    )


def test_winnow_guards():
    from search_engine_ray.functions import text_analysis as ta

    with pytest.raises(ValueError):
        ta.winnow_fingerprints(None, k=0)
    with pytest.raises(ValueError):
        ta.winnow_fingerprints(None, w=0)


def test_nb_classify_vs_oracle(docs_ds, fduck):
    """NB self-classification == the SQL twin that recomputes the
    whole model (counts, totals, vocab, priors, the half-up 1e-6
    quantized log-probs, the argmax) — all compared values integers;
    block-layout invariant; training accuracy is far above the 1/20
    chance floor (the model actually separates the sources)."""
    from search_engine_ray.functions import classify

    out = _assert_matches_oracle(
        classify.nb_classify(docs_ds), fduck,
        classify.nb_classify_sql("documents"),
    )
    _assert_matches_oracle(
        classify.nb_classify(docs_ds.repartition(7)), fduck,
        classify.nb_classify_sql("documents"),
    )
    truth = {
        r["doc_id"]: r["source"]
        for r in _table(docs_ds).select(["doc_id", "source"]).to_pylist()
    }
    got = out.to_pylist()
    acc = sum(truth[r["doc_id"]] == r["label_pred"] for r in got) / len(got)
    # 20 balanced classes -> chance is 0.05; the synthetic corpus'
    # text is only weakly source-conditioned (measured ~0.23), so pin
    # "clearly above chance" (3x), not a separability the data lacks
    assert acc > 0.15, acc


def test_nb_model_and_unseen_semantics(ray_session):
    """Crafted two-class corpus: hand-checkable priors/argmax, the
    unseen-token smoothing path (scoring a NOVEL corpus), empty-text
    docs score by prior alone, and the broadcast bound refuses."""
    import ray.data as rd

    from search_engine_ray.functions import classify

    train = pa.table({
        "doc_id": [0, 1, 2, 3],
        "source": ["spam", "spam", "ham", "ham"],
        "text": ["buy pills now", "buy cheap pills", "meeting at noon",
                 "lunch meeting tomorrow"],
    })
    model = classify.nb_fit(rd.from_arrow(train))
    assert model["n_docs"] == 4 and model["label_docs"] == {"spam": 2, "ham": 2}
    # distinct tokens: buy pills now cheap meeting at noon lunch tomorrow
    assert model["vocab"] == 9
    novel = pa.table({
        "doc_id": [10, 11, 12],
        "text": ["cheap pills zzz", "noon meeting qqq", ""],
    })
    scored = {r["doc_id"]: r for r in _table(
        classify.nb_score(rd.from_arrow(novel), model)).to_pylist()}
    assert scored[10]["label_pred"] == "spam"
    assert scored[11]["label_pred"] == "ham"
    # empty doc: prior-only scores tie across balanced classes -> the
    # (score DESC, label ASC) tie-break picks the first label
    assert scored[12]["label_pred"] == "ham"
    # enforced broadcast bound
    import search_engine_ray.functions.classify as cl
    old = cl.NB_BROADCAST_MAX_ROWS
    try:
        cl.NB_BROADCAST_MAX_ROWS = 3
        with pytest.raises(ValueError, match="broadcast bound"):
            cl.nb_fit(rd.from_arrow(train))
    finally:
        cl.NB_BROADCAST_MAX_ROWS = old


def test_span_dedup_crafted_vs_oracle():
    """Keep-globally-first semantics on crafted docs: cross-doc dup
    span cut at the later (doc, pos) key, within-doc overlapping
    duplicate run collapses to the first window, empty text and
    shorter-than-window docs unchanged, and the space split/join round
    trip is lossless on runs of spaces."""
    import duckdb

    from search_engine_ray.functions.text_analysis import (
        span_dedup,
        span_dedup_sql,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": [
            "a b c d e f g h tail one two",        # first occurrence
            "x y a b c d e f g h z",               # later occurrence cut
            "p p p p p p p p p p",                 # overlapping self-run
            "",                                     # empty
            "double  space   run a b c d e f g h",  # space runs + dup
        ],
    })
    got = (
        span_dedup(rd.from_arrow(docs)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("crafted", docs)
    exp = (
        con.execute(span_dedup_sql("crafted")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    assert got[exp.columns.tolist()].equals(exp)
    r = {x["doc_id"]: x for x in got.to_dict("records")}
    assert r[0]["text"] == "a b c d e f g h tail one two"  # survivor intact
    assert r[1]["text"] == "x y z"
    # the 10-token all-p run: windows at 0,1,2 share one key; the first
    # survives, windows 1 and 2 drop positions 1..9 -> one token left
    assert (r[2]["text"], r[2]["n_kept"]) == ("p", 1)
    assert (r[3]["text"], r[3]["n_tokens"], r[3]["n_kept"]) == ("", 1, 1)
    assert r[4]["text"] == "double  space   run"  # space runs preserved


def test_span_dedup_corpus_vs_oracle_and_block_invariance(docs_ds, fduck):
    """Full documents corpus == the SQL twin at sf0.001 (text
    byte-equal), invariant to block layout, and the synthetic corpus
    does contain duplicated 8-token spans (the transform is
    substantive, not a no-op)."""
    from search_engine_ray.functions.text_analysis import (
        span_dedup,
        span_dedup_sql,
    )

    got = _assert_matches_oracle(
        span_dedup(docs_ds), fduck, span_dedup_sql("documents")
    )
    assert got.num_rows > 0
    dropped = pa.compute.sum(
        pa.compute.subtract(got.column("n_tokens"), got.column("n_kept"))
    ).as_py()
    assert dropped > 0
    rechunked = span_dedup(docs_ds.repartition(7))
    a = _table(rechunked).sort_by([("doc_id", "ascending")])
    assert a.equals(got.sort_by([("doc_id", "ascending")]))


def test_span_dedup_guards():
    from search_engine_ray.functions.text_analysis import (
        span_dedup,
        span_dedup_sql,
    )

    with pytest.raises(ValueError, match="window"):
        span_dedup(None, window=1)
    with pytest.raises(ValueError, match="window"):
        span_dedup_sql("documents", window=0)
    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64()),
        "text": ["a b c d e f g h"],
    }))
    with pytest.raises(Exception, match="2\\*\\*31"):
        span_dedup(bad).materialize()


def test_chunk_documents_crafted_vs_oracle():
    """Chunk geometry on crafted docs: overlap windows, the
    first-window-always rule (empty and shorter-than-size docs emit
    exactly one chunk), space runs preserved inside a chunk, and the
    1 + ceil((n-size)/stride) count formula."""
    import duckdb

    from search_engine_ray.functions.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            " ".join(f"t{i}" for i in range(150)),
            "short doc",
            "",
            "a  b   c " * 30,
        ],
    })
    got = (
        chunk_documents(rd.from_arrow(docs), size=16, stride=12).to_pandas()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("crafted", docs)
    exp = (
        con.execute(chunk_documents_sql("crafted", size=16, stride=12)).df()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    con.close()
    assert got[exp.columns.tolist()].equals(exp)
    per_doc = got.groupby("doc_id").size().to_dict()
    # doc0: n=150 -> 1 + ceil(134/12) = 13 chunks; empties/shorts: 1
    assert per_doc == {0: 13, 1: 1, 2: 1, 3: 15}
    d0 = got[got.doc_id == 0].reset_index(drop=True)
    # overlap: chunk 1 starts at token 12 and re-carries tokens 12..15
    assert d0.loc[0, "text"].split(" ")[12:] == d0.loc[1, "text"].split(" ")[:4]
    assert (got[got.doc_id == 2].n_tokens == 1).all()  # the [''] token


def test_chunk_documents_corpus_and_guards(docs_ds, fduck):
    """Full corpus == the twin at sf0.001 (text byte-equal), block
    layout invariant; reassembling non-overlapped chunk prefixes
    reproduces every doc; bad geometry refused."""
    from search_engine_ray.functions.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    got = _assert_matches_oracle(
        chunk_documents(docs_ds), fduck, chunk_documents_sql("documents")
    )
    assert got.num_rows > 0
    rechunked = chunk_documents(docs_ds.repartition(7))
    a = _table(rechunked).sort_by(
        [("doc_id", "ascending"), ("chunk_idx", "ascending")])
    assert a.equals(got.sort_by(
        [("doc_id", "ascending"), ("chunk_idx", "ascending")]))
    # stride-prefix reassembly: joining each chunk's first `stride`
    # tokens (all of the last chunk) rebuilds the original text
    import collections

    from search_engine_ray.functions.packing import CHUNK_STRIDE

    parts = collections.defaultdict(dict)
    for r in got.to_pylist():
        parts[r["doc_id"]][r["chunk_idx"]] = r["text"]
    texts = {
        r["doc_id"]: r["text"] or ""
        for r in _table(docs_ds).select(["doc_id", "text"]).to_pylist()
    }
    for d, ch in parts.items():
        toks = []
        for k in sorted(ch):
            w = ch[k].split(" ")
            toks.extend(w[:CHUNK_STRIDE] if k < max(ch) else w)
        assert " ".join(toks) == texts[d], d
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs_ds, size=8, stride=9)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents_sql("documents", size=0, stride=0)


def test_sample_balanced_vs_oracle(docs_ds, fduck):
    """Count-based group cap == the row_number-over-(digest, id) SQL
    twin (exact row set, all columns); every group capped at N; block
    layout invariant; a cap above every group size is the identity;
    guards refuse bad N and an exceeded broadcast bound."""
    from search_engine_ray.functions import sampling

    got = _assert_matches_oracle(
        sampling.sample_balanced(docs_ds, 7), fduck,
        sampling.sample_balanced_sql("documents", 7),
    )
    import collections

    per = collections.Counter(got.column("source").to_pylist())
    assert per and max(per.values()) <= 7
    total = _table(docs_ds).num_rows
    # some group exceeds the cap at sf0.001 (25 docs/source) -> shrinks
    assert got.num_rows < total
    rechunked = sampling.sample_balanced(docs_ds.repartition(7), 7)
    a = _table(rechunked).sort_by([("doc_id", "ascending")])
    assert a.equals(got.sort_by([("doc_id", "ascending")]))
    # cap >= max group size: identity row set
    all_kept = _table(sampling.sample_balanced(docs_ds, 10_000))
    assert all_kept.num_rows == total
    with pytest.raises(ValueError, match="n_per_group"):
        sampling.sample_balanced(docs_ds, 0)
    old = sampling.BALANCED_BROADCAST_MAX_IDS
    try:
        sampling.BALANCED_BROADCAST_MAX_IDS = 3
        with pytest.raises(ValueError, match="broadcast bound"):
            sampling.sample_balanced(docs_ds, 7).materialize()
    finally:
        sampling.BALANCED_BROADCAST_MAX_IDS = old


def test_funnel_vs_oracle(events_ds, educk):
    """Greedy-earliest strict-sequence funnel == the chained-row_number
    SQL twin on the events corpus (one row per user, step timestamps
    exact), block-layout invariant, with the repeated-step chain
    exercising the strictly-after rule."""
    from search_engine_ray.functions import windows

    steps = ("signup", "view", "purchase") * 3
    got = _assert_matches_oracle(
        windows.funnel(events_ds, steps=steps), educk,
        windows.funnel_sql("events", steps),
    )
    assert got.num_rows > 0
    rechunked = windows.funnel(events_ds.repartition(5), steps=steps)
    a = _table(rechunked).sort_by([("user_id", "ascending")])
    assert a.equals(got.sort_by([("user_id", "ascending")]))


def test_funnel_crafted_semantics(ray_session):
    """Hand-checkable chains: order matters (view before signup does
    not count), ties at equal ts break by event_id, a user with no
    step-1 event completes 0, repeated steps need DISTINCT later
    events, and every user gets exactly one row."""
    import duckdb

    from search_engine_ray.functions import windows

    ev = pa.table({
        "event_id": pa.array(list(range(10)), pa.int64()),
        "ts": pa.array([1000, 2000, 3000, 400, 500, 1000, 1000, 7000,
                        600, 800], pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 4, 4], pa.int64()),
        "event_type": [
            "signup", "view", "purchase",       # u1: full chain
            "view", "signup",                    # u2: view BEFORE signup
            "signup", "view", "view",            # u3: tie -> eid order
            "view", "purchase",                  # u4: no signup at all
        ],
        "value": pa.array([0.0] * 10, pa.float64()),
        "props": pa.array([""] * 10, pa.string()),
    })
    steps = ("signup", "view", "view")
    got = {
        r["user_id"]: r
        for r in _table(
            windows.funnel(rd.from_arrow(ev), steps=steps)).to_pylist()
    }
    assert len(got) == 4
    assert got[1]["steps_completed"] == 2  # one view only, second missing
    assert got[2]["steps_completed"] == 1  # the later signup matches...
    assert got[2]["ts_1"] is not None and got[2]["ts_2"] is None
    # u3: signup at ts=1000/eid=5, the SAME-ts view eid=6 is strictly
    # after by the event_id tie-break, then the ts=7000 view
    assert got[3]["steps_completed"] == 3
    assert got[3]["ts_2"] == got[3]["ts_1"]  # same-ts view, eid-after
    assert got[3]["ts_3"] is not None
    assert got[4]["steps_completed"] == 0
    assert got[4]["ts_1"] is None
    con = duckdb.connect()
    con.register("crafted", ev)
    exp = con.execute(windows.funnel_sql("crafted", steps)).df()
    con.close()
    assert len(exp) == 4
    for r in exp.to_dict("records"):
        assert got[r["user_id"]]["steps_completed"] == r["steps_completed"]
    with pytest.raises(ValueError, match="steps"):
        windows.funnel(None, steps=())
    with pytest.raises(ValueError, match="steps"):
        windows.funnel_sql("events", steps=("a", ""))


def test_retention_vs_oracle(events_ds, educk):
    """Cohort retention == the epoch-day-arithmetic SQL twin (exact
    distinct-user counts per (cohort_day, day_offset)); block layout
    invariant; offset 0 counts every cohorted user (their anchor day
    is active by definition); horizon clips offsets."""
    from search_engine_ray.functions import windows

    got = _assert_matches_oracle(
        windows.retention(events_ds), educk, windows.retention_sql("events")
    )
    assert got.num_rows > 0
    rechunked = windows.retention(events_ds.repartition(5))
    a = _table(rechunked).sort_by(
        [("cohort_day", "ascending"), ("day_offset", "ascending")])
    assert a.equals(got.sort_by(
        [("cohort_day", "ascending"), ("day_offset", "ascending")]))
    rows = got.to_pylist()
    offs = {r["day_offset"] for r in rows}
    assert offs and max(offs) <= 14 and 0 in offs
    # offset-0 totals == number of distinct cohorted (signup) users
    n0 = sum(r["n_users"] for r in rows if r["day_offset"] == 0)
    n_sig = educk.execute(
        "SELECT count(DISTINCT user_id) FROM events "
        "WHERE event_type = 'signup'").fetchone()[0]
    assert n0 == n_sig
    with pytest.raises(ValueError, match="horizon"):
        windows.retention(events_ds, horizon_days=-1)
    with pytest.raises(ValueError, match="anchor"):
        windows.retention_sql("events", anchor="")


def test_pipeline_chunk_prep_vs_composed_twin(docs_ds, fduck):
    """The chunk-prep composition (span dedup -> chunking ->
    chunk-level exact dedup) == the three stage twins composed by
    relation nesting; chunk-level duplicates exist (the overlap makes
    some) and the survivor of each dup group is the packed-key min;
    block layout invariant."""
    from search_engine_ray.pipelines.corpus_prep import (
        chunk_prep,
        chunk_prep_sql,
    )

    got = _assert_matches_oracle(
        chunk_prep(docs_ds), fduck, chunk_prep_sql("documents")
    )
    assert got.num_rows > 0
    n_dup_groups = sum(
        1 for r in got.to_pylist() if r["n_copies"] > 1
    )
    assert n_dup_groups > 0
    rechunked = chunk_prep(docs_ds.repartition(7))
    key = [("doc_id", "ascending"), ("chunk_idx", "ascending")]
    assert _table(rechunked).sort_by(key).equals(got.sort_by(key))


def test_incremental_dedup_crafted_and_corpus(docs_ds, fduck):
    """Crafted two-snapshot semantics: base-colliding new docs drop
    entirely, novel texts keep the min new id with within-increment
    copy counts, negative new ids refused; plus the corpus-scale
    parity with the derived increment (the driver query's shape)."""
    import duckdb

    from search_engine_ray.functions import dedup

    base = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["old text one", "old text two"],
    })
    new = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": ["old text one",      # base collision -> dropped
                 "fresh text",        # novel, dup of 12
                 "fresh text",        # non-first -> folded into 11
                 "another fresh"],    # novel singleton
    })
    got = _table(dedup.incremental_dedup(
        rd.from_arrow(base), rd.from_arrow(new))).to_pylist()
    got = {r["doc_id"]: r["n_copies"] for r in got}
    assert got == {11: 2, 13: 1}
    con = duckdb.connect()
    con.register("b", base)
    con.register("n", new)
    exp = {r[0]: r[1] for r in con.execute(
        dedup.incremental_dedup_sql("b", "n")).fetchall()}
    con.close()
    assert exp == got
    bad = pa.table({"doc_id": pa.array([-5], pa.int64()), "text": ["x"]})
    with pytest.raises(Exception, match="non-negative"):
        dedup.incremental_dedup(
            rd.from_arrow(base), rd.from_arrow(bad)).materialize()
    # corpus scale: documents base vs the reversed/re-id'd increment
    import __ray_entry__ as E

    got2 = _assert_matches_oracle(
        dedup.incremental_dedup(docs_ds, E._increment_ds(SF_DIR)),
        fduck,
        dedup.incremental_dedup_sql("documents", E._INCREMENT_SQL),
    )
    assert got2.num_rows > 0
    # every unchanged-text re-id (the +1M band) must have been dropped
    assert all(r["doc_id"] >= 2_000_000 for r in got2.to_pylist())


def test_pagerank_crafted_and_corpus(docs_ds, fduck):
    """Integer PageRank == the chained-CTE SQL twin on a crafted graph
    (star hub highest, chain middle above ends, isolated node at the
    exact (1-d)Q base) and on the corpus near-dup pair graph; block
    layout invariant; iters guard."""
    import duckdb

    from search_engine_ray.functions import dedup, graph

    nodes = pa.table({"doc_id": pa.array(range(8), pa.int64())})
    pairs = pa.table({
        "doc_a": pa.array([0, 1, 4, 4, 4], pa.int64()),
        "doc_b": pa.array([1, 2, 5, 6, 7], pa.int64()),
    })
    got = (
        _table(graph.pagerank(rd.from_arrow(nodes), pairs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("nodes_rel", nodes)
    con.register("pairs_rel", pairs)
    exp = (
        con.execute(graph.pagerank_sql("nodes_rel", "pairs_rel")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    assert got[exp.columns.tolist()].equals(exp)
    r = dict(zip(got.doc_id, got.rank_q))
    assert r[3] == graph._BASE                 # isolated: exact base
    assert r[4] == max(r.values())             # star hub dominates
    assert r[1] > r[0] == r[2] > r[3]          # chain middle > ends
    # corpus graph (3 iterations — the driver query's depth)
    pairs2 = dedup.ngram_jaccard_pairs(docs_ds)
    got2 = _assert_matches_oracle(
        graph.pagerank(docs_ds, pairs2, iters=3), fduck,
        graph.pagerank_sql(
            "documents", f"({dedup.ngram_jaccard_sql('documents')})",
            iters=3),
    )
    ranks = {x["rank_q"] for x in got2.to_pylist()}
    assert len(ranks) > 1  # the pair graph actually moves some ranks
    with pytest.raises(ValueError, match="iters"):
        graph.pagerank(None, pairs, iters=0)
    with pytest.raises(ValueError, match="iters"):
        graph.pagerank_sql("documents", "p", iters=0)


def test_hash_embed_vs_oracle(docs_ds, fduck):
    """Feature-hashed doc vectors == the nibble-arithmetic SQL twin
    (including sign-canceled zero coordinates — presence, not value,
    decides emission); block layout invariant; per-doc total |val|
    mass is bounded by token count; dim guard."""
    from search_engine_ray.functions import text_analysis as ta

    got = _assert_matches_oracle(
        ta.hash_embed(docs_ds), fduck, ta.hash_embed_sql("documents")
    )
    assert got.num_rows > 0
    vals = got.column("val").to_numpy(zero_copy_only=False)
    assert (vals == 0).any()  # sign cancellation really occurs
    rechunked = ta.hash_embed(docs_ds.repartition(7))
    key = [("doc_id", "ascending"), ("dim", "ascending")]
    assert _table(rechunked).sort_by(key).equals(got.sort_by(key))
    # |sum of signed coords| per doc <= its token count
    import collections

    mass = collections.Counter()
    for r in got.to_pylist():
        mass[r["doc_id"]] += abs(r["val"])
    toks = {
        r["doc_id"]: r["n_word_tokens"]
        for r in ta.token_counts(_table(docs_ds)).to_pylist()
    }
    assert all(mass[d] <= max(toks.get(d, 0), 1) for d in mass)
    with pytest.raises(ValueError, match="dim"):
        ta.hash_embed(docs_ds, dim=0)
    with pytest.raises(ValueError, match="dim"):
        ta.hash_embed_sql("documents", dim=-1)


def test_funnel_windowed_vs_oracle_and_semantics(events_ds, educk):
    """Window-funnel == the anchored chained-greedy SQL twin; the
    window binds (a huge window reproduces plain-funnel depth; a tiny
    window collapses levels); crafted anchors show a LATER anchor
    rescuing a chain the first anchor's window kills."""
    from search_engine_ray.functions import windows

    got = _assert_matches_oracle(
        windows.funnel_windowed(events_ds), educk,
        windows.funnel_windowed_sql("events"),
    )
    lv = {r["user_id"]: r["level"] for r in got.to_pylist()}
    assert len(set(lv.values())) > 1  # real depth variance
    # a window covering the whole span == the unwindowed funnel depth
    wide = {
        r["user_id"]: r["level"]
        for r in _table(
            windows.funnel_windowed(events_ds, window_minutes=10**7)
        ).to_pylist()
    }
    plain = {
        r["user_id"]: r["steps_completed"]
        for r in _table(windows.funnel(events_ds)).to_pylist()
    }
    assert wide == plain
    # crafted: anchor at t=0 can't finish inside W, anchor at t=100 can
    ev = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([0, 100_000_000, 150_000_000, 199_000_000],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "event_type": ["signup", "signup", "view", "purchase"],
        "value": pa.array([0.0] * 4, pa.float64()),
        "props": pa.array([""] * 4, pa.string()),
    })
    # window = 2 min = 120s: anchor@0 reaches only itself (view at 150s
    # is outside), anchor@100s fits view@150s and purchase@199s
    out = _table(windows.funnel_windowed(
        rd.from_arrow(ev), window_minutes=2)).to_pylist()
    assert out == [{"user_id": 7, "level": 3}]
    with pytest.raises(ValueError, match="window"):
        windows.funnel_windowed(events_ds, window_minutes=0)
    with pytest.raises(ValueError, match="steps"):
        windows.funnel_windowed_sql("events", steps=())


def test_normalize_text_crafted_and_corpus(docs_ds, fduck):
    """NFC composition (combining acute == precomposed; NFKC ligature
    folds deliberately NOT applied), control strip, whitespace
    collapse, trim — engine == DuckDB twin byte-for-byte on crafted
    unicode and on the corpus; codepoint counts exact."""
    import duckdb

    from search_engine_ray.functions import text_analysis as ta

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": [
            "cafe\u0301  du\tmonde\n",  # combining acute + ws runs
            "éclair ﬁsh",            # precomposed + fi ligature
            "a\x00b\x07c\x7fd",               # control chars
            "",
            None,
        ],
    })
    got = (
        _table(ta.normalize_text(rd.from_arrow(docs))).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("crafted", docs)
    exp = (
        con.execute(ta.normalize_text_sql("crafted")).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con.close()
    assert got[exp.columns.tolist()].equals(exp)
    r = dict(zip(got.doc_id, got.text))
    assert r[0] == "caf\u00e9 du monde"  # composed PRECOMPOSED, collapsed
    assert r[1] == "éclair ﬁsh"     # ligature SURVIVES (NFC only)
    assert r[2] == "abcd"
    assert r[3] == "" and r[4] == ""
    nb = dict(zip(got.doc_id, got.n_before))
    assert nb[0] == 16  # combining mark counts as its own codepoint
    got2 = _assert_matches_oracle(
        ta.normalize_text(docs_ds), fduck, ta.normalize_text_sql("documents")
    )
    assert got2.num_rows > 0


def test_bloom_semi_join_oracle(events_ds, educk):
    """Engine == SQL twin exactly (false positives included) at two
    (m, k) configurations; the bloom result is a SUPERSET of the exact
    semi-join and every true member passes (no false negatives)."""
    from search_engine_ray.functions import joins as J

    keys_pred = "SELECT user_id FROM events WHERE event_type='purchase' AND value > 200"

    def keysel(batch):
        import pyarrow.compute as pc

        return batch.filter(
            pc.and_(
                pc.equal(batch.column("event_type"), pa.scalar("purchase")),
                pc.greater(batch.column("value"), pa.scalar(200.0)),
            )
        ).select(["user_id"])

    keys = events_ds.map_batches(keysel, batch_format="pyarrow")
    member = set(
        r[0] for r in educk.execute(f"SELECT DISTINCT user_id FROM ({keys_pred})").fetchall()
    )
    cols = "b.*"
    for m_bits, k in ((2048, 3), (64, 2), (8, 1)):
        t = _assert_matches_oracle(
            J.bloom_semi_join(events_ds, keys, "user_id", m_bits=m_bits, k=k),
            educk,
            J.bloom_semi_join_sql("events", keys_pred, on="user_id",
                                  m_bits=m_bits, k=k, cols=cols),
        )
        got = set(t["user_id"].to_pylist())
        assert member <= got, "false negative: a true member failed the filter"
    # m=8 saturates the bitmap at this key count — false positives MUST
    # appear (that configuration passes everything or nearly so),
    # proving the oracle matches the approximate semantics, not an
    # exact join
    assert got - member, "expected false positives at m_bits=8"


def test_bloom_semi_join_null_and_guards(ray_session):
    from search_engine_ray.functions import joins as J

    big = rd.from_arrow(pa.table({
        "user_id": pa.array([1, None, 2, 3], pa.int64()),
        "v": pa.array([10, 20, 30, 40], pa.int64()),
    }))
    keys = rd.from_arrow(pa.table({"user_id": pa.array([1, None], pa.int64())}))
    out = _table(J.bloom_semi_join(big, keys, "user_id", m_bits=256, k=4))
    got = sorted(out["user_id"].to_pylist())
    assert 1 in got and None not in got, "null keys must never pass"
    with pytest.raises(ValueError):
        J.bloom_semi_join(big, keys, "user_id", m_bits=100, k=4)  # not /8
    with pytest.raises(ValueError):
        J.bloom_semi_join(big, keys, "user_id", m_bits=256, k=0)
    with pytest.raises(ValueError):
        J.bloom_semi_join_sql("events", "SELECT 1", k=65)


def test_bloom_semi_join_block_layout_invariant(events_ds, ray_session):
    """Same result at any partitioning of either side — the bitmap OR
    is associative and the probe map is per-row."""
    from search_engine_ray.functions import joins as J

    def keysel(batch):
        import pyarrow.compute as pc

        return batch.filter(
            pc.equal(batch.column("event_type"), pa.scalar("signup"))
        ).select(["user_id"])

    keys = events_ds.map_batches(keysel, batch_format="pyarrow")
    a = _table(J.bloom_semi_join(events_ds, keys, "user_id", m_bits=512, k=3))
    b = _table(J.bloom_semi_join(
        events_ds.repartition(7), keys.repartition(5), "user_id",
        m_bits=512, k=3,
    ))
    key = [("event_id", "ascending")]
    assert a.sort_by(key).equals(b.select(a.column_names).sort_by(key))


# ---------------------------------------------------------------- layout


def test_zorder_key_oracle(events_ds, educk):
    from search_engine_ray.functions import layout as L

    t = _assert_matches_oracle(
        L.zorder_key(events_ds, ("user_id", "ts")), educk,
        L.zorder_sql("events"),
    )
    assert t.num_rows == events_ds.count()
    # layout path: same rows, sorted by zval
    laid = _table(L.zorder_layout(events_ds, ("user_id", "ts")))
    zs = laid["zval"].to_numpy()
    assert (zs[1:] >= zs[:-1]).all()
    assert laid.sort_by([("event_id", "ascending")]).equals(
        t.sort_by([("event_id", "ascending")])
    )


def test_zorder_prunes_2d_boxes(events_ds, educk):
    """The point of the layout: per-block min-max envelopes after the
    z-order sort prune a 2-D box query strictly better than a
    single-column (ts) sort does — on every quartile box."""
    import numpy as np

    from search_engine_ray.functions import layout as L

    ev = _table(events_ds).select(["event_id", "user_id", "ts"])
    u = ev["user_id"].to_numpy()
    ts = ev["ts"].to_numpy().astype("datetime64[us]").view(np.int64)

    zt = _table(L.zorder_layout(events_ds, ("user_id", "ts")))
    order_z = zt["event_id"].to_numpy()
    order_ts = ev.sort_by([("ts", "ascending")])["event_id"].to_numpy()
    by_id = {int(e): i for i, e in enumerate(ev["event_id"].to_numpy())}

    def blocks_hit(order, lo_u, hi_u, lo_t, hi_t, bs=50):
        idx = np.array([by_id[int(e)] for e in order])
        uu, tt = u[idx], ts[idx]
        hits = 0
        for s in range(0, len(idx), bs):
            ub, tb = uu[s:s + bs], tt[s:s + bs]
            if ub.min() <= hi_u and ub.max() >= lo_u \
                    and tb.min() <= hi_t and tb.max() >= lo_t:
                hits += 1
        return hits

    uq = np.quantile(np.unique(u), [0, .25, .5, .75, 1.0])
    tq = np.quantile(ts, [0, .25, .5, .75, 1.0])
    z_total = ts_total = 0
    for i in range(4):
        for j in range(4):
            z_total += blocks_hit(order_z, uq[i], uq[i + 1], tq[j], tq[j + 1])
            ts_total += blocks_hit(order_ts, uq[i], uq[i + 1], tq[j], tq[j + 1])
    assert z_total < ts_total, (z_total, ts_total)


def test_zorder_guards(events_ds, ray_session):
    from search_engine_ray.functions import layout as L

    with pytest.raises(ValueError):
        L.zorder_key(events_ds, ("user_id",))
    with pytest.raises(ValueError):
        L.zorder_key(events_ds, ("user_id", "ts"), bits_per_dim=0)
    with pytest.raises(ValueError):
        L.zorder_sql("events", bits_per_dim=32)
    # nulls are refused loudly
    bad = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "a": pa.array([1, None], pa.int64()),
        "b": pa.array([5, 6], pa.int64()),
    }))
    with pytest.raises(Exception, match="nulls"):
        _table(L.zorder_key(bad, ("a", "b"), id_col="event_id"))
    # constant column degenerates to the other dimension's order
    const = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([7, 7, 7], pa.int64()),
        "b": pa.array([3, 1, 2], pa.int64()),
    }))
    t = _table(L.zorder_layout(const, ("a", "b"), id_col="event_id"))
    assert t["event_id"].to_pylist() == [2, 3, 1]


def test_zorder_block_layout_invariant(events_ds, ray_session):
    from search_engine_ray.functions import layout as L

    a = _table(L.zorder_key(events_ds, ("user_id", "ts")))
    b = _table(L.zorder_key(events_ds.repartition(7), ("user_id", "ts")))
    key = [("event_id", "ascending")]
    assert a.sort_by(key).equals(b.sort_by(key))


def test_running_window_oracle(events_ds, educk):
    """Per-key window functions vs the literal SQL OVER twin — rn, lag,
    micro-unit running sum, running max, bit-exact; plus structural
    pins (rn dense per user, run_max monotone, lag null exactly at
    rn=1)."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.windows import (
        running_window,
        running_window_sql,
    )

    t = _table(running_window(events_ds))
    o = educk.sql(running_window_sql("events")).arrow()
    sk = [("user_id", "ascending"), ("event_id", "ascending")]
    ts, os_ = t.sort_by(sk), o.cast(t.schema).sort_by(sk)
    assert ts.equals(os_)
    # structural pins on one user
    uid0 = ts.column("user_id")[0]
    g = ts.filter(_pc.equal(ts.column("user_id"), uid0)).sort_by(
        [("rn", "ascending")]
    )
    rn = g.column("rn").to_pylist()
    assert rn == list(range(1, len(rn) + 1))
    rm = g.column("run_max").to_numpy()
    assert (np.diff(rm) >= 0).all()
    lag_null = g.column("lag_value").is_null().to_pylist()
    assert lag_null[0] and not any(lag_null[1:])
    rs = g.column("run_sum_micro").to_pylist()
    assert rs == sorted(rs)  # values are positive in this corpus


def test_rollup_orders_oracle(rduck):
    """ROLLUP vs the literal GROUP BY ROLLUP twin — and the additive
    consistency pins: the grand total equals the sum of the year
    subtotals, and each year subtotal equals the sum of its finest
    rows (subtotals fold from the level below)."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions import relational as rel

    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    t = _assert_matches_oracle(
        rel.rollup_orders(orders), rduck, rel.rollup_orders_sql()
    )
    fine = t.filter(
        _pc.and_(
            t.column("year").is_valid(), t.column("o_orderpriority").is_valid()
        )
    )
    yr = t.filter(
        _pc.and_(
            t.column("year").is_valid(),
            _pc.invert(t.column("o_orderpriority").is_valid()),
        )
    )
    total = t.filter(_pc.invert(t.column("year").is_valid()))
    assert total.num_rows == 1
    for col in ("n_orders", "sum_cents"):
        assert (
            _pc.sum(fine.column(col)).as_py()
            == _pc.sum(yr.column(col)).as_py()
            == total.column(col)[0].as_py()
        )
    # every year subtotal folds from its finest rows
    for y in yr.column("year").to_pylist():
        fy = fine.filter(_pc.equal(fine.column("year"), y))
        ry = yr.filter(_pc.equal(yr.column("year"), y))
        assert _pc.sum(fy.column("n_orders")).as_py() == ry.column("n_orders")[0].as_py()


def test_pivot_events_oracle(events_ds, educk):
    """Pivot vs DuckDB's dynamic PIVOT — identical data-derived column
    set, one row per user, row sums equal per-user event counts."""
    from search_engine_ray.functions import relational as rel

    t = _table(rel.pivot_events(events_ds))
    o = educk.sql(rel.pivot_events_sql("events")).arrow()
    assert t.column_names == o.column_names  # sorted type domain on both sides
    sk = [("user_id", "ascending")]
    ts, os_ = t.sort_by(sk), o.cast(t.schema).sort_by(sk)
    assert ts.equals(os_)
    n_users = educk.sql("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert ts.num_rows == n_users
    total = educk.sql("SELECT count(*) FROM events").fetchone()[0]
    wide_sum = sum(
        sum(ts.column(c).to_pylist()) for c in ts.column_names if c != "user_id"
    )
    assert wide_sum == total


def test_merge_upsert_plans_and_semantics(docs_ds, fduck):
    """CDC MERGE: broadcast == shuffle == the SQL anti-join+union twin
    on a crafted I/U/D change set; MERGE cardinality violations and op
    typos raise; D of an absent key is a no-op; I of an existing key
    replaces (idempotent re-application)."""
    from search_engine_ray.functions.merge import merge_upsert, merge_upsert_sql

    base = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
        }
    )
    ch = pa.table(
        {
            "doc_id": pa.array([2, 3, 5, 99], pa.int64()),
            "text": pa.array(["B2", "gone", "E-new", "ghost"]),
            "op": pa.array(["U", "D", "I", "D"]),  # 99-D = absent-key no-op
        }
    )
    bds, cds = rd.from_arrow(base), rd.from_arrow(ch)
    fduck.execute("CREATE OR REPLACE VIEW mbase AS SELECT 1 AS doc_id, 'a' AS text UNION ALL SELECT 2, 'b' UNION ALL SELECT 3, 'c' UNION ALL SELECT 4, 'd'")
    fduck.execute(
        "CREATE OR REPLACE VIEW mch AS SELECT 2 AS doc_id, 'B2' AS text, 'U' AS op "
        "UNION ALL SELECT 3, 'gone', 'D' UNION ALL SELECT 5, 'E-new', 'I' "
        "UNION ALL SELECT 99, 'ghost', 'D'"
    )
    exp = _sorted(
        fduck.sql(
            merge_upsert_sql("mbase", "mch", cols="b.doc_id, b.text")
        ).arrow()
    )
    for mode in ("broadcast", "shuffle", "auto"):
        got = _sorted(_table(merge_upsert(bds, cds, mode=mode, n_buckets=4)))
        assert got.equals(exp.cast(got.schema)), mode
        assert got.column("doc_id").to_pylist() == [1, 2, 4, 5]
        assert got.column("text").to_pylist() == ["a", "B2", "d", "E-new"]
    # I of an EXISTING key replaces, exactly like U
    ch_i = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2], pa.int64()),
                "text": pa.array(["replaced"]),
                "op": pa.array(["I"]),
            }
        )
    )
    for mode in ("broadcast", "shuffle"):
        got = _sorted(_table(merge_upsert(bds, ch_i, mode=mode)))
        assert got.column("text").to_pylist() == ["a", "replaced", "c", "d"]
    # guards
    dup = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2, 2], pa.int64()),
                "text": pa.array(["x", "y"]),
                "op": pa.array(["U", "U"]),
            }
        )
    )
    for mode in ("broadcast", "shuffle"):
        with pytest.raises(Exception, match="cardinality"):
            _table(merge_upsert(bds, dup, mode=mode))
    bad_op = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2], pa.int64()),
                "text": pa.array(["x"]),
                "op": pa.array(["UPSERT"]),
            }
        )
    )
    with pytest.raises(Exception, match="op outside"):
        _table(merge_upsert(bds, bad_op, mode="broadcast"))
    with pytest.raises(ValueError, match="lack base columns"):
        merge_upsert(
            bds,
            rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                    "op": pa.array(["D"])})),
        )
    with pytest.raises(ValueError, match="integer key"):
        merge_upsert(
            rd.from_arrow(pa.table({"doc_id": pa.array(["s"]),
                                    "text": pa.array(["x"])})),
            cds, on="doc_id")


def test_merge_upsert_corpus_oracle(fduck):
    """The driver's table_merge change set (D %13 / U %7 / I %17) vs
    the SQL twin over the sf0.001 documents corpus, both plans."""
    import __ray_entry__ as E

    t = _table(E.queries()["table_merge"](SF_DIR))
    fduck.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/documents.parquet')")
    o = fduck.sql(E.oracle_sql()["table_merge"]).arrow()
    ts, os_ = _sorted(t), _sorted(o.cast(t.schema))
    assert ts.equals(os_)
    assert ts.num_rows > 0


def test_hash_join_outer_modes(rduck):
    """RIGHT and FULL outer joins (shuffle plan) vs the literal SQL,
    keys coalesced under the left name; broadcast mode refuses them
    loudly (a streaming broadcast can't emit unmatched right rows
    exactly once)."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.joins import hash_join

    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = rd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(_pc.equal(b.column("c_mktsegment"), "BUILDING")),
        batch_format="pyarrow")
    for how, sql_kw in (("right", "RIGHT JOIN"), ("full", "FULL JOIN")):
        got = _sorted(_table(hash_join(orders, cust, "o_custkey",
                                       "c_custkey", how=how, mode="shuffle",
                                       n_buckets=8)))
        exp = _sorted(rduck.sql(
            "SELECT coalesce(o_custkey, c_custkey) AS o_custkey, o_orderkey,"
            " o_totalprice, c_mktsegment FROM orders "
            f"{sql_kw} (SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_mktsegment = 'BUILDING') c ON o_custkey = c_custkey"
        ).arrow().select(got.column_names))
        assert got.equals(exp.cast(got.schema)), how
        with pytest.raises(ValueError, match="shuffle"):
            hash_join(orders, cust, "o_custkey", "c_custkey", how=how,
                      mode="broadcast")


def test_skew_join_equals_plain(rduck):
    """Hot-key-split join == the plain partitioned join on the corpus
    (lineitem x part, threshold forcing a real hot set) AND on a
    crafted power-law table; empty hot set falls through; the hot-list
    cap raises loudly."""
    from search_engine_ray.functions.joins import hash_join, skew_join

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_partkey", "l_orderkey", "l_quantity"])
    part_ds = rd.read_parquet(f"{SF_DIR}/part.parquet",
                              columns=["p_partkey", "p_brand"])
    ref = _sorted(_table(hash_join(li, part_ds, "l_partkey", "p_partkey",
                                   mode="shuffle", n_buckets=8)))
    got = _sorted(_table(skew_join(li, part_ds, "l_partkey", "p_partkey",
                                   hot_threshold=5, n_buckets=8)))
    assert got.equals(ref)
    exp = _sorted(rduck.sql(
        "SELECT l_partkey, l_orderkey, l_quantity, p_brand "
        "FROM lineitem JOIN part ON l_partkey = p_partkey"
    ).arrow().select(got.column_names))
    assert got.equals(exp.cast(got.schema))
    # crafted: one huge key + a left-outer null-key row, exactly once
    lk = pa.table({
        "k": pa.array([7] * 200 + [1, 2, None], pa.int64()),
        "lv": pa.array(range(203), type=pa.int64()),
    })
    rk = pa.table({"k2": pa.array([7, 1, 9], pa.int64()),
                   "rv": pa.array(["h", "a", "x"])})
    lds, rds = rd.from_arrow(lk).repartition(4), rd.from_arrow(rk)
    for how in ("inner", "left"):
        a = _sorted(_table(skew_join(lds, rds, "k", "k2", how=how,
                                     hot_threshold=50, n_buckets=4)))
        b = _sorted(_table(hash_join(lds, rds, "k", "k2", how=how,
                                     mode="shuffle", n_buckets=4)))
        assert a.equals(b), how
        if how == "left":
            assert a.num_rows == 203  # null-key row exactly once
    with pytest.raises(ValueError, match="max_hot_keys"):
        _table(skew_join(lds, rds, "k", "k2", hot_threshold=0,
                         max_hot_keys=1))
    with pytest.raises(ValueError, match="inner"):
        skew_join(lds, rds, "k", "k2", how="full")


def test_shipmode_priority_oracle(rduck):
    """Q12 analog vs the SQL twin — exact conditional counts."""
    from search_engine_ray.functions import relational as rel

    t = _assert_matches_oracle(
        rel.shipmode_priority(
            rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                            columns=["l_orderkey", "l_linestatus",
                                     "l_shipdate"]),
            rd.read_parquet(f"{SF_DIR}/orders.parquet",
                            columns=["o_orderkey", "o_orderpriority"]),
        ),
        rduck, rel.shipmode_priority_sql())
    assert t.num_rows > 0


def test_promo_revenue_oracle(rduck):
    """Q14 analog vs the SQL twin — exact cents, round-6 share from
    the same ints."""
    from search_engine_ray.functions import relational as rel

    t = _assert_matches_oracle(
        rel.promo_revenue(
            rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_discount", "l_shipdate"]),
            rd.read_parquet(f"{SF_DIR}/part.parquet",
                            columns=["p_partkey", "p_type"]),
        ),
        rduck, rel.promo_revenue_sql())
    assert t.num_rows == 1
    assert 0.0 < t.column("promo_share")[0].as_py() < 1.0


def test_top_n_per_group_oracle(events_ds, educk):
    """Grouped top-n vs the literal row_number twin; block-layout
    invariance (the per-block partial selection must not change the
    answer); rank dense 1..n per user."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.aggregates import (
        top_n_per_group,
        top_n_per_group_sql,
    )

    t = _sorted(_table(top_n_per_group(events_ds)))
    o = educk.sql(top_n_per_group_sql("events")).arrow()
    assert t.equals(_sorted(o.select(t.column_names).cast(t.schema)))
    t2 = _sorted(_table(top_n_per_group(events_ds.repartition(13))))
    assert t.equals(t2)
    # each user contributes exactly min(3, n_events) rows, ranks 1..k
    per = t.group_by("user_id").aggregate([("rank", "max"), ("rank", "count")])
    assert per.column("rank_max").equals(per.column("rank_count").cast(pa.int64())) or (
        _pc.equal(per.column("rank_max").cast(pa.int64()),
                  per.column("rank_count").cast(pa.int64())).to_pylist()
        == [True] * per.num_rows
    )
    with pytest.raises(ValueError, match="n must be"):
        top_n_per_group(events_ds, n=0)


# ----------------------------------------------------------- set ops


def _setop_halves(events_ds):
    """events split into two (user_id, event_type, vb) row streams at
    the corpus time midpoint — the same operand shape the driver query
    uses (vb = floor(value/100) makes EXCEPT non-empty)."""
    import datetime as dt

    import pyarrow.compute as _pc

    mid = dt.datetime(2024, 1, 15)

    def half(first):
        def f(b):
            ts = b.column("ts")
            keep = (
                _pc.less(ts, pa.scalar(mid))
                if first
                else _pc.greater_equal(ts, pa.scalar(mid))
            )
            b = b.filter(keep)
            vb = _pc.cast(_pc.floor(_pc.divide(b.column("value"), 100.0)), pa.int64())
            return pa.table(
                {
                    "user_id": b.column("user_id"),
                    "event_type": b.column("event_type"),
                    "vb": vb,
                }
            )

        return events_ds.map_batches(f, batch_format="pyarrow")

    return half(True), half(False)


_SETOP_HALF_SQL = (
    "(SELECT user_id, event_type, CAST(FLOOR(value/100) AS BIGINT) AS vb "
    "FROM events WHERE ts {} TIMESTAMP '2024-01-15')"
)


def test_set_op_oracle(events_ds, educk):
    """EXCEPT / INTERSECT vs the literal DuckDB set operators on the
    corpus, plus block-layout invariance (the in-map pre-dedup and
    bucket exchange must not change the answer)."""
    from search_engine_ray.functions.setops import set_op, set_op_sql

    a, b = _setop_halves(events_ds)
    for op in ("except", "intersect", "union"):
        got = _sorted(_table(set_op(a, b, op=op)))
        sql = set_op_sql(
            _SETOP_HALF_SQL.format("<"), _SETOP_HALF_SQL.format(">="), op=op
        )
        want = educk.sql(sql).arrow()
        assert got.num_rows > 0, op  # non-vacuous operands
        assert got.equals(_sorted(want.select(got.column_names).cast(got.schema))), op
        # block layout must be invisible
        a13, b7 = _setop_halves(events_ds.repartition(13))
        got2 = _sorted(_table(set_op(a13, b7, op=op, n_buckets=7)))
        assert got.equals(got2), op


def test_set_op_null_semantics_and_guards(ray_session):
    """SQL set-op NULL rule: NULL = NULL (unlike joins).  A row whose
    key is NULL in both operands is IN the intersection and OUT of the
    difference; output is DISTINCT; schema mismatch and reserved
    column names refuse loudly."""
    from search_engine_ray.functions.setops import set_op

    a = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([None, None, "x", "y", "y"], pa.string()),
                "v": pa.array([1, 1, 2, None, None], pa.int64()),
            }
        )
    )
    b = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([None, "x"], pa.string()),
                "v": pa.array([1, 99], pa.int64()),
            }
        )
    )
    inter = _sorted(_table(set_op(a, b, op="intersect")))
    # (NULL, 1) appears in both -> kept exactly once
    assert inter.to_pylist() == [{"k": None, "v": 1}]
    exc = _sorted(_table(set_op(a, b, op="except")))
    # distinct A rows not in B: (x,2), (y,NULL) — (NULL,1) matched
    assert exc.to_pylist() == [{"k": "x", "v": 2}, {"k": "y", "v": None}]
    # empty B: EXCEPT = distinct(A)
    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    )
    exc_all = _sorted(_table(set_op(a, empty, op="except")))
    assert exc_all.num_rows == 3  # 5 rows, dups (NULL,1) and (y,NULL)
    with pytest.raises(ValueError, match="identical schemas"):
        set_op(a, rd.from_arrow(pa.table({"k": pa.array(["z"])})))
    with pytest.raises(ValueError, match="except"):
        set_op(a, b, op="minus")
    # UNION = distinct rows of either side
    uni = _sorted(_table(set_op(a, b, op="union")))
    assert uni.num_rows == 4  # {(N,1),(x,2),(y,N),(x,99)}
    bad = rd.from_arrow(pa.table({"__tag": pa.array([1])}))
    with pytest.raises(ValueError, match="reserved"):
        set_op(bad, bad)


def test_set_op_single_column(ray_session):
    """The 1-column serialization fast path (no element-wise join)."""
    from search_engine_ray.functions.setops import set_op

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, None], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": pa.array([2, None], pa.int64())}))
    assert _sorted(_table(set_op(a, b, op="except"))).to_pylist() == [
        {"k": 1},
        {"k": 3},
    ]
    assert sorted(
        r["k"] if r["k"] is not None else -1
        for r in _table(set_op(a, b, op="intersect")).to_pylist()
    ) == [-1, 2]


# ------------------------------------------- windowed distinct count


def test_window_distinct_users_oracle(events_ds, educk):
    """Exact COUNT(DISTINCT user_id) per tumbling hour vs the SQL twin;
    the (window,user) pair partial must be block-layout invariant
    (distinct counts are NOT additive — summing per-block counts would
    overcount, which the repartition pin would catch)."""
    from search_engine_ray.functions.windows import (
        window_distinct_users,
        window_distinct_users_sql,
    )

    got = _sorted(_table(window_distinct_users(events_ds)))
    want = educk.sql(window_distinct_users_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(window_distinct_users(events_ds.repartition(17))))
    assert got.equals(got2)


def test_small_qty_revenue_oracle(rduck):
    """Q17 analog vs the literal integer-inequality twin; block-layout
    invariance; the empty-brand edge returns a 0 row; the 2M broadcast
    bound refuses loudly."""
    from search_engine_ray.functions.relational import (
        small_qty_revenue,
        small_qty_revenue_sql,
    )

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pt = rd.read_parquet(f"{SF_DIR}/part.parquet")
    got = _table(small_qty_revenue(li, pt))
    want = rduck.sql(small_qty_revenue_sql()).arrow()
    assert got.num_rows == 1 and got.column("small_cents")[0].as_py() > 0
    assert got.equals(want.select(got.column_names).cast(got.schema))
    got2 = _table(small_qty_revenue(li.repartition(9), pt))
    assert got.equals(got2)
    none = _table(small_qty_revenue(li, pt, brand="Brand#nope"))
    assert none.column("small_cents")[0].as_py() == 0


def test_sales_opportunity_oracle(rduck):
    """Q22 analog vs the literal NOT-EXISTS twin; block-layout
    invariance; a threshold above every order price reduces to the
    no-orders-at-all case (here: every rich customer qualifies)."""
    from search_engine_ray.functions.relational import (
        sales_opportunity,
        sales_opportunity_sql,
    )

    cu = rd.read_parquet(f"{SF_DIR}/customer.parquet")
    od = rd.read_parquet(f"{SF_DIR}/orders.parquet")
    got = _sorted(_table(sales_opportunity(cu, od)))
    want = rduck.sql(sales_opportunity_sql()).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(sales_opportunity(cu.repartition(7), od.repartition(5))))
    assert got.equals(got2)
    # threshold above max price: NOT EXISTS is vacuous -> every
    # above-average customer counts; twin agrees
    hi = _sorted(_table(sales_opportunity(cu, od, big_order_min=1e12)))
    want_hi = rduck.sql(sales_opportunity_sql(big_order_min=1e12)).arrow()
    assert hi.num_rows > got.num_rows
    assert hi.equals(_sorted(want_hi.select(hi.column_names).cast(hi.schema)))


def test_top_supplier_oracle(rduck):
    """Q15 analog vs the view + max-subquery twin; ties KEPT (pinned on
    a crafted corpus where two suppliers tie exactly); empty window
    returns a typed empty table."""
    from search_engine_ray.functions.relational import (
        top_supplier,
        top_supplier_sql,
    )

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    su = rd.read_parquet(f"{SF_DIR}/supplier.parquet")
    got = _sorted(_table(top_supplier(li, su)))
    want = rduck.sql(top_supplier_sql()).arrow()
    assert got.num_rows >= 1
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(top_supplier(li.repartition(11), su)))
    assert got.equals(got2)
    # crafted exact tie: suppliers 1 and 2 both sum to 30.00
    import datetime as dt

    ts = dt.datetime(1996, 2, 1)
    li_c = rd.from_arrow(
        pa.table(
            {
                "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0, 5.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
                "l_shipdate": pa.array([ts] * 4, pa.timestamp("us")),
            }
        )
    )
    su_c = rd.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["a", "b", "c"]),
            }
        )
    )
    tie = _sorted(_table(top_supplier(li_c, su_c)))
    assert tie.column("s_suppkey").to_pylist() == [1, 2]
    assert tie.column("total_cents").to_pylist() == [3000, 3000]
    # empty window: typed empty table
    empty_ds = top_supplier(li_c, su_c, start="2030-01-01", end="2030-02-01")
    assert empty_ds.count() == 0
    assert empty_ds.schema().names == ["s_suppkey", "s_name", "total_cents"]


def test_grouped_quantiles_oracle(events_ds, educk):
    """Per-group exact quantiles vs the explicit rank-rule twin;
    block-layout invariance; crafted pins: quantile is always an actual
    data value, ceil-rank rule at exact boundaries, NULL values skipped
    like SQL aggregates."""
    from search_engine_ray.functions.aggregates import (
        grouped_quantiles,
        grouped_quantiles_sql,
    )

    got = _sorted(_table(grouped_quantiles(events_ds, "event_type", "value")))
    want = educk.sql(
        grouped_quantiles_sql("events", "event_type", "value")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(grouped_quantiles(events_ds.repartition(13), "event_type", "value"))
    )
    assert got.equals(got2)
    # crafted: 4 values, p50 = rank ceil(0.5*4)=2 -> 20.0; null skipped
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["a"] * 5),
                "v": pa.array([10.0, 20.0, 30.0, 40.0, None]),
            }
        )
    )
    t = _table(grouped_quantiles(ds, "g", "v", quantiles=((1, 2), (1, 1))))
    assert t.column("value").to_pylist() == [20.0, 40.0]
    with pytest.raises(ValueError, match="outside"):
        grouped_quantiles(ds, "g", "v", quantiles=((0, 1),))


def test_ranked_window_oracle(events_ds, educk):
    """Rank family vs DuckDB window functions; block-layout invariance;
    crafted tie pins (equal values share rank/dense/pct/cume; ntile
    follows the total order) and the n<tiles edge."""
    from search_engine_ray.functions.windows import (
        ranked_window,
        ranked_window_sql,
    )

    got = _sorted(_table(ranked_window(events_ds)))
    want = educk.sql(ranked_window_sql("events")).arrow()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(ranked_window(events_ds.repartition(9))))
    assert got.equals(got2)
    # crafted ties: values [5,5,7] -> rnk [1,1,3], dense [1,1,2],
    # cume [2/3,2/3,1]; ntile(2) over total order -> [1,1,2]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_id": pa.array([10, 11, 12], pa.int64()),
                "value": pa.array([5.0, 5.0, 7.0]),
            }
        )
    )
    t = _table(ranked_window(ds, tiles=2)).sort_by("event_id")
    assert t.column("rnk").to_pylist() == [1, 1, 3]
    assert t.column("dense_rnk").to_pylist() == [1, 1, 2]
    assert t.column("cume").to_pylist() == [2 / 3, 2 / 3, 1.0]
    assert t.column("tile").to_pylist() == [1, 1, 2]
    # n < tiles: one row per tile, in total order
    t2 = _table(ranked_window(ds, tiles=5)).sort_by("event_id")
    assert t2.column("tile").to_pylist() == [1, 2, 3]
    with pytest.raises(ValueError, match="tiles"):
        ranked_window(ds, tiles=0)


def test_corpus_js_divergence_oracle(docs_ds, fduck):
    """JS drift vs the twin on the even/odd doc split; block-layout
    invariance; crafted pins: identical corpora -> js == 0, disjoint
    vocabularies -> js == ln 2 (quantized), symmetry, empty-side
    guard."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.text_analysis import (
        corpus_js_divergence,
        corpus_js_divergence_sql,
    )

    def half(parity):
        return docs_ds.map_batches(
            lambda b: b.filter(
                _pc.equal(
                    _pc.bit_wise_and(b.column("doc_id"), pa.scalar(1, pa.int64())),
                    pa.scalar(parity, pa.int64()),
                )
            ).select(["text"]),
            batch_format="pyarrow",
        )

    got = _table(corpus_js_divergence(half(0), half(1)))
    want = fduck.sql(
        corpus_js_divergence_sql(
            "(SELECT text FROM documents WHERE doc_id % 2 = 0)",
            "(SELECT text FROM documents WHERE doc_id % 2 = 1)",
        )
    ).arrow()
    assert got.equals(want.select(got.column_names).cast(got.schema))
    assert 0.0 < got.column("js")[0].as_py() < np.log(2)
    got2 = _table(corpus_js_divergence(half(0).repartition(7), half(1)))
    assert got.equals(got2)
    # symmetry: JS(a, b) == JS(b, a) with sides' stats swapped
    rev = _table(corpus_js_divergence(half(1), half(0)))
    assert rev.column("js")[0].as_py() == got.column("js")[0].as_py()
    assert rev.column("tokens_a")[0].as_py() == got.column("tokens_b")[0].as_py()
    # identical corpora: every token ratio is 1, js exactly 0
    same = _table(corpus_js_divergence(half(0), half(0)))
    assert same.column("js")[0].as_py() == 0.0
    # disjoint vocabularies: js == ln 2 exactly (each side's ratio is 2)
    a = rd.from_arrow(pa.table({"text": pa.array(["aaa bbb aaa"])}))
    b = rd.from_arrow(pa.table({"text": pa.array(["ccc ddd"])}))
    dis = _table(corpus_js_divergence(a, b))
    q = np.floor(np.log(2.0) * 1_000_000 + 0.5) / 1_000_000
    assert abs(dis.column("js")[0].as_py() - q) < 1e-12
    assert dis.column("vocab_shared")[0].as_py() == 0
    with pytest.raises(ValueError, match="empty side"):
        corpus_js_divergence(
            a, rd.from_arrow(pa.table({"text": pa.array([""])}))
        )


def test_ohlc_resample_oracle(events_ds, educk):
    """OHLC per hour+type vs the row_number twin; block-layout
    invariance (the associative partial must re-fold identically);
    crafted pin: open/close follow the (ts, event_id) TOTAL order even
    when two events share a timestamp."""
    import datetime as dt

    from search_engine_ray.functions.windows import (
        ohlc_resample,
        ohlc_resample_sql,
    )

    got = _sorted(_table(ohlc_resample(events_ds)))
    want = educk.sql(ohlc_resample_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(ohlc_resample(events_ds.repartition(17))))
    assert got.equals(got2)
    # crafted: same-ts tie broken by event_id; open=1st, close=last
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([7, 3, 9], pa.int64()),
                "ts": pa.array([t0, t0, t0], pa.timestamp("us")),
                "event_type": pa.array(["x"] * 3),
                "value": pa.array([70.0, 30.0, 90.0]),
            }
        )
    )
    r = _table(ohlc_resample(ds))
    assert r.num_rows == 1
    assert r.column("open").to_pylist() == [30.0]   # event_id 3 first
    assert r.column("close").to_pylist() == [90.0]  # event_id 9 last
    assert r.column("high").to_pylist() == [90.0]
    assert r.column("low").to_pylist() == [30.0]
    assert r.column("n_events").to_pylist() == [3]


def test_date_histogram_filled_oracle(events_ds, educk):
    """Dense histogram vs the generate_series twin on a sparse slice
    (empty buckets MUST exist or the fill is untested); block-layout
    invariance; crafted gap pin; bucket-cap and empty-input edges."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.windows import (
        date_histogram_filled,
        date_histogram_filled_sql,
    )

    sparse = events_ds.map_batches(
        lambda t: t.filter(_pc.greater(t.column("value"), pa.scalar(200.0))),
        batch_format="pyarrow",
    )
    got = _sorted(_table(date_histogram_filled(sparse)))
    want = educk.sql(
        date_histogram_filled_sql("(SELECT * FROM events WHERE value > 200)")
    ).arrow()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    n_zero = got.filter(
        _pc.equal(got.column("n"), pa.scalar(0, pa.int64()))
    ).num_rows
    assert n_zero > 0  # the fill is actually exercised
    got2 = _sorted(_table(date_histogram_filled(sparse.repartition(7))))
    assert got.equals(got2)
    # crafted: two events 3 hours apart -> 4 buckets, middle two empty
    import datetime as dt

    ds = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1, 0, 5), dt.datetime(2024, 1, 1, 3, 5)],
                    pa.timestamp("us"),
                )
            }
        )
    )
    t = _table(date_histogram_filled(ds)).sort_by("window_start")
    assert t.column("n").to_pylist() == [1, 0, 0, 1]
    with pytest.raises(ValueError, match="max_buckets"):
        date_histogram_filled(ds, max_buckets=2)
    empty = date_histogram_filled(
        rd.from_arrow(pa.table({"ts": pa.array([], pa.timestamp("us"))}))
    )
    assert empty.count() == 0 and empty.schema().names == ["window_start", "n"]


def test_cooccurrence_and_triangles_oracle(rduck):
    """Co-order pair counts and per-node triangle counts vs their
    literal twins; block-layout invariance; crafted pins: K4 gives
    every node 3 triangles, a path graph gives none, duplicate and
    reversed edges collapse, self-loops drop; guards refuse loudly."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.graph import (
        cooccurrence_pairs,
        cooccurrence_pairs_sql,
        triangle_counts,
        triangle_counts_sql,
    )

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet").map_batches(
        lambda t: t.filter(
            _pc.greater_equal(t.column("l_quantity"), pa.scalar(40.0))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )
    src = "(SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40)"
    co = _sorted(_table(cooccurrence_pairs(li, "l_orderkey", "l_partkey")))
    want = rduck.sql(
        cooccurrence_pairs_sql(src, "l_orderkey", "l_partkey")
    ).arrow()
    assert co.num_rows > 0
    assert co.equals(_sorted(want.select(co.column_names).cast(co.schema)))
    co2 = _sorted(
        _table(cooccurrence_pairs(li.repartition(7), "l_orderkey", "l_partkey"))
    )
    assert co.equals(co2)

    tri = _sorted(_table(triangle_counts(
        cooccurrence_pairs(li, "l_orderkey", "l_partkey"))))
    want_t = rduck.sql(
        triangle_counts_sql(
            f"({cooccurrence_pairs_sql(src, 'l_orderkey', 'l_partkey')})"
        )
    ).arrow()
    assert tri.num_rows > 0
    assert tri.equals(_sorted(want_t.select(tri.column_names).cast(tri.schema)))

    # crafted: K4 on {1,2,3,4} with dup + reversed edges + self-loop
    k4 = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 1, 2, 2, 3, 3, 4, 5], pa.int64()),
                "b": pa.array([2, 3, 4, 3, 4, 4, 2, 1, 5], pa.int64()),
            }
        )
    )
    t = _table(triangle_counts(k4)).sort_by("node")
    assert t.column("node").to_pylist() == [1, 2, 3, 4]
    assert t.column("n_triangles").to_pylist() == [3, 3, 3, 3]
    # path graph: no triangles
    path = rd.from_arrow(
        pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([2, 3, 4], pa.int64())})
    )
    assert triangle_counts(path).count() == 0
    # Ray wraps worker-side ValueErrors in RayTaskError
    with pytest.raises(Exception, match="ids must be"):
        _table(triangle_counts(rd.from_arrow(
            pa.table({"a": pa.array([-1], pa.int64()),
                      "b": pa.array([2], pa.int64())}))))
    with pytest.raises(Exception, match="max_basket"):
        _table(cooccurrence_pairs(
            rd.from_arrow(pa.table({
                "g": pa.array([1] * 5, pa.int64()),
                "i": pa.array([1, 2, 3, 4, 5], pa.int64()),
            })), "g", "i", max_basket=3))


def test_association_rules_oracle(rduck):
    """Market-basket rules vs the literal distinct-basket twin;
    block-layout invariance (the bug class: per-block item dedup
    overcounts supports of pairs spanning blocks); crafted pins for
    confidence asymmetry and lift."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.graph import (
        association_rules,
        association_rules_sql,
    )

    def li(reparts=None):
        d = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
        if reparts:
            d = d.repartition(reparts)
        return d.map_batches(
            lambda t: t.filter(
                _pc.greater_equal(t.column("l_quantity"), pa.scalar(30.0))
            ).select(["l_orderkey", "l_partkey"]),
            batch_format="pyarrow",
        )

    src = "(SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 30)"
    got = _sorted(_table(association_rules(li(), "l_orderkey", "l_partkey")))
    want = rduck.sql(
        association_rules_sql(src, "l_orderkey", "l_partkey")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(association_rules(li(reparts=13), "l_orderkey", "l_partkey"))
    )
    assert got.equals(got2)
    # crafted: baskets {1,2},{1,2},{1,3},{1} over 4 baskets; pair (1,2)
    # support 2; conf 1->2 = 2/4, conf 2->1 = 2/2 = 1; lift = 2*4/(4*2)
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([10, 10, 11, 11, 12, 12, 13], pa.int64()),
                "i": pa.array([1, 2, 1, 2, 1, 3, 1], pa.int64()),
            }
        )
    )
    t = _table(association_rules(ds, "g", "i")).sort_by(
        [("lhs", "ascending"), ("rhs", "ascending")]
    )
    assert t.column("lhs").to_pylist() == [1, 2]
    assert t.column("rhs").to_pylist() == [2, 1]
    assert t.column("support").to_pylist() == [2, 2]
    assert t.column("confidence_q").to_pylist() == [500000, 1000000]
    assert t.column("lift_q").to_pylist() == [1000000, 1000000]


def test_grouped_outliers_oracle(events_ds, educk):
    """Z-score outlier rows vs the identical-float-predicate twin;
    block-layout invariance; crafted pins: a constant group flags
    nothing (sigma 0), a planted spike IS flagged, strict inequality
    at the exact boundary."""
    from search_engine_ray.functions.aggregates import (
        grouped_outliers,
        grouped_outliers_sql,
    )

    ev = events_ds.select_columns(["event_id", "user_id", "event_type", "value"])
    got = _sorted(_table(grouped_outliers(ev)))
    want = educk.sql(
        grouped_outliers_sql(
            "(SELECT event_id, user_id, event_type, value FROM events)",
            cols="event_id, user_id, event_type, value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(grouped_outliers(ev.repartition(11))))
    assert got.equals(got2)
    # crafted: group "c" constant -> no outliers; group "s" has a spike
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(list(range(8)), pa.int64()),
                "event_type": pa.array(["c"] * 4 + ["s"] * 4),
                "value": pa.array([5.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 100.0]),
            }
        )
    )
    t = _table(grouped_outliers(ds, value_col="value"))
    assert t.column("event_id").to_pylist() == [7]  # only the spike
    with pytest.raises(ValueError, match="positive"):
        grouped_outliers(ds, z_num=0)


def test_cube_orders_oracle(rduck):
    """CUBE vs the literal twin; the four grouping sets partition into
    additive levels (grand total == sum of year subtotals == sum of
    priority subtotals)."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.relational import (
        cube_orders,
        cube_orders_sql,
    )

    od = rd.read_parquet(f"{SF_DIR}/orders.parquet")
    got = _sorted(_table(cube_orders(od)))
    want = rduck.sql(cube_orders_sql()).arrow()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    finest = got.filter(
        _pc.and_(
            _pc.is_valid(got.column("year")),
            _pc.is_valid(got.column("o_orderpriority")),
        )
    )
    years = got.filter(
        _pc.and_(
            _pc.is_valid(got.column("year")),
            _pc.is_null(got.column("o_orderpriority")),
        )
    )
    prios = got.filter(
        _pc.and_(
            _pc.is_null(got.column("year")),
            _pc.is_valid(got.column("o_orderpriority")),
        )
    )
    grand = got.filter(
        _pc.and_(
            _pc.is_null(got.column("year")),
            _pc.is_null(got.column("o_orderpriority")),
        )
    )
    assert grand.num_rows == 1
    g = grand.column("sum_cents")[0].as_py()
    for t in (finest, years, prios):
        assert _pc.sum(t.column("sum_cents")).as_py() == g


def test_sample_weighted_oracle(docs_ds, fduck):
    """A-ES weighted sample vs the identical-expression twin (the
    sample is a deterministic function of seed/ids/weights — exact
    row-set oracle); n >= corpus keeps every positive-weight row;
    heavier rows win more often on a crafted two-weight corpus."""
    from search_engine_ray.functions.sampling import (
        sample_weighted,
        sample_weighted_sql,
    )

    got = _sorted(_table(sample_weighted(docs_ds, n=50, weight_col="n_chars")))
    want = fduck.sql(
        sample_weighted_sql(
            "documents", n=50, weight_col="n_chars",
            cols="doc_id, text, lang, source, n_chars",
        )
    ).arrow()
    assert got.num_rows == 50
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(sample_weighted(docs_ds.repartition(9), n=50, weight_col="n_chars"))
    )
    assert got.equals(got2)
    # n >= corpus: identity on positive weights
    total = docs_ds.count()
    allr = _table(sample_weighted(docs_ds, n=total + 10, weight_col="n_chars"))
    assert allr.num_rows == total
    # heavy rows dominate: weight 1000 vs 1, sample half
    ids = list(range(200))
    w = [1000 if i < 100 else 1 for i in ids]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "w": pa.array(w, pa.int64())})
    )
    t = _table(sample_weighted(ds, n=100, weight_col="w", seed=3))
    heavy = sum(1 for i in t.column("doc_id").to_pylist() if i < 100)
    assert heavy > 85  # odds ratio 1000:1
    with pytest.raises(ValueError, match="n must be"):
        sample_weighted(ds, n=0, weight_col="w")


def test_winsorize_by_group_oracle(events_ds, educk):
    """Grouped winsorization vs the rank-rule + least/greatest twin;
    clipped values are always actual group order statistics; interior
    rows pass through unchanged."""
    from search_engine_ray.functions.aggregates import (
        winsorize_by_group,
        winsorize_by_group_sql,
    )

    ev = events_ds.select_columns(["event_id", "user_id", "event_type", "value"])
    got = _sorted(_table(winsorize_by_group(ev)))
    want = educk.sql(
        winsorize_by_group_sql(
            "(SELECT event_id, user_id, event_type, value FROM events)",
            cols="s.event_id, s.user_id, s.event_type, s.value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(winsorize_by_group(ev.repartition(9))))
    assert got.equals(got2)
    # every winsorized value is an actual value from its group, and
    # clip actually fired on the tails
    v = got.column("value").to_pylist()
    w = got.column("value_w").to_pylist()
    assert any(a != b for a, b in zip(v, w))  # tails clipped
    assert set(w) <= set(v)  # boundaries are order statistics
    with pytest.raises(ValueError, match="bad band"):
        winsorize_by_group(ev, lo=(3, 4), hi=(1, 4))


def test_target_encode_loo_oracle(events_ds, educk):
    """LOO target encoding vs the twin; crafted pins: the leakage
    guard (a row's own target is excluded — encode differs from the
    plain category mean), singleton categories encode NULL."""
    from search_engine_ray.functions.aggregates import (
        target_encode_loo,
        target_encode_loo_sql,
    )

    ev = events_ds.select_columns(["event_id", "user_id", "event_type", "value"])
    got = _sorted(_table(target_encode_loo(ev)))
    want = educk.sql(
        target_encode_loo_sql(
            "(SELECT event_id, user_id, event_type, value FROM events)",
            cols="c.event_id, c.user_id, c.event_type, c.value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(target_encode_loo(ev.repartition(7))))
    assert got.equals(got2)
    # crafted: category "a" = [10, 20, 30]; LOO of the 10-row is
    # mean(20, 30) = 25.00 = 2500 cents -> 2.5e9 micro-cents;
    # singleton "b" -> NULL; tail rows differ from the plain mean
    # (2e9) in opposite directions — the leakage guard visible
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "a", "b"]),
                "value": pa.array([10.0, 20.0, 30.0, 99.0]),
            }
        )
    )
    t = _table(target_encode_loo(ds)).sort_by("value")
    assert t.column("te_loo_q").to_pylist() == [
        2_500_000_000, 2_000_000_000, 1_500_000_000, None,
    ]


def test_locf_resample_oracle(events_ds, educk):
    """LOCF dense resample vs the correlated-pick twin; block-layout
    invariance; crafted pins: silent hours carry the last value
    forward, same-timestamp ties resolve to the larger event_id."""
    import datetime as dt

    from search_engine_ray.functions.windows import (
        locf_resample,
        locf_resample_sql,
    )

    got = _sorted(_table(locf_resample(events_ds)))
    want = educk.sql(locf_resample_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(locf_resample(events_ds.repartition(13))))
    assert got.equals(got2)
    # crafted: events at 00:10 (v=1), 00:10 (v=2, higher id), 03:40
    # (v=9) -> grid 00..03 carries 2,2,2,9
    t0 = dt.datetime(2024, 1, 1)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([5, 5, 5], pa.int64()),
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(minutes=10),
                     t0 + dt.timedelta(minutes=10),
                     t0 + dt.timedelta(hours=3, minutes=40)],
                    pa.timestamp("us"),
                ),
                "value": pa.array([1.0, 2.0, 9.0]),
            }
        )
    )
    t = _table(locf_resample(ds)).sort_by("window_start")
    assert t.column("value_ff").to_pylist() == [2.0, 2.0, 2.0, 9.0]
    with pytest.raises(Exception, match="grid rows"):
        _table(locf_resample(ds, width_minutes=1, max_grid_per_user=10))


def test_user_features_composed_oracle(events_ds, educk):
    """Composed pivot ⋈ per-user median vs the relation-nested twin;
    one row per user; the median column matches the standalone
    grouped_quantiles on the same key."""
    from search_engine_ray.functions.relational import (
        user_features,
        user_features_sql,
    )

    got = _sorted(_table(user_features(events_ds)))
    want = educk.sql(user_features_sql("events")).arrow()
    assert got.num_rows == events_ds.unique("user_id").__len__()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(user_features(events_ds.repartition(7))))
    assert got.equals(got2)


# ----------------------------------------------------------- privacy


def test_pseudonymize_oracle(events_ds, educk):
    """Pseudonymization vs the identical-digest twin; referential
    integrity (same id -> same token, groups preserved); NULL stays
    NULL; independent token spaces per column; guards."""
    from search_engine_ray.functions.privacy import (
        pseudonymize,
        pseudonymize_sql,
    )

    ev = events_ds.select_columns(["event_id", "user_id", "event_type"])
    got = _sorted(_table(pseudonymize(ev, cols=["user_id"])))
    want = educk.sql(
        pseudonymize_sql(
            "(SELECT event_id, user_id, event_type FROM events)",
            cols=["user_id"],
            all_cols=["event_id", "user_id", "event_type"],
        )
    ).arrow()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    # referential integrity: token cardinality == id cardinality
    n_ids = events_ds.unique("user_id").__len__()
    assert len(set(got.column("user_id").to_pylist())) == n_ids
    # crafted: NULL passthrough + per-column independence
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", None], pa.string()),
                "b": pa.array(["x", "x"], pa.string()),
            }
        )
    )
    t = _table(pseudonymize(ds, cols=["a", "b"])).sort_by("b")
    a0 = [v for v in t.column("a").to_pylist()]
    b0 = t.column("b").to_pylist()
    assert None in a0  # NULL stays NULL
    ax = [v for v in a0 if v is not None][0]
    assert ax != b0[0]  # same value, different columns -> different tokens
    assert b0[0] == b0[1]  # same value, same column -> same token
    with pytest.raises(ValueError, match="not in schema"):
        pseudonymize(ds, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        pseudonymize(ds, cols=[])


def test_k_anonymity_audit_oracle(events_ds, educk):
    """k-anonymity audit vs the HAVING twin; block-layout invariance;
    crafted pins: a k-anonymous table audits empty, NULL quasi values
    group together, counts are exact."""
    from search_engine_ray.functions.privacy import (
        k_anonymity_audit,
        k_anonymity_audit_sql,
    )

    def quasi_ds(d):
        def quasi(t):
            us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            hour = (us % 86_400_000_000) // 3_600_000_000
            vb = np.floor(
                t.column("value").to_numpy(zero_copy_only=False) / 50.0
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": t.column("event_type"),
                    "hour": pa.array(hour, pa.int64()),
                    "vb": pa.array(vb, pa.int64()),
                }
            )

        return d.map_batches(quasi, batch_format="pyarrow")

    got = _sorted(_table(k_anonymity_audit(
        quasi_ds(events_ds), ["event_type", "hour", "vb"], k=5)))
    want = educk.sql(
        k_anonymity_audit_sql(
            "(SELECT event_type, "
            "(epoch_us(ts) % 86400000000) // 3600000000 AS hour, "
            "CAST(FLOOR(value / 50) AS BIGINT) AS vb FROM events)",
            ["event_type", "hour", "vb"], k=5,
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(k_anonymity_audit(
        quasi_ds(events_ds.repartition(9)), ["event_type", "hour", "vb"], k=5)))
    assert got.equals(got2)
    # crafted: 5 copies of one combo (k=5 -> safe), 1 of another + NULLs
    ds = rd.from_arrow(
        pa.table(
            {
                "q1": pa.array(["a"] * 5 + ["b"] + [None, None]),
                "q2": pa.array([1] * 5 + [2] + [3, 3], pa.int64()),
            }
        )
    )
    t = _table(k_anonymity_audit(ds, ["q1", "q2"], k=5)).sort_by("q2")
    assert t.column("q2").to_pylist() == [2, 3]  # NULLs grouped: count 2
    assert t.column("n").to_pylist() == [1, 2]
    safe = k_anonymity_audit(
        rd.from_arrow(pa.table({"q": pa.array(["x"] * 7)})), ["q"], k=5
    )
    assert safe.count() == 0
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_audit(ds, ["q1"], k=1)


def test_k_suppress_oracle(events_ds, educk):
    """k-suppression vs the NULL-safe anti-join twin; the released
    subset audits clean (audit(k_suppress) is empty — the closure
    pin); NULL-combo rows suppress together."""
    from search_engine_ray.functions.privacy import (
        k_anonymity_audit,
        k_suppress,
        k_suppress_sql,
    )

    def quasi_aug(t):
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us % 86_400_000_000) // 3_600_000_000
        vb = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) / 50.0
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
                "hour": pa.array(hour, pa.int64()),
                "vb": pa.array(vb, pa.int64()),
            }
        )

    ev = events_ds.map_batches(quasi_aug, batch_format="pyarrow")
    q = ["event_type", "hour", "vb"]
    got = _sorted(_table(k_suppress(ev, q, k=5)))
    want = educk.sql(
        k_suppress_sql(
            "(SELECT event_id, event_type, "
            "(epoch_us(ts) % 86400000000) // 3600000000 AS hour, "
            "CAST(FLOOR(value / 50) AS BIGINT) AS vb FROM events)",
            q, k=5, cols="s.event_id, s.event_type, s.hour, s.vb",
        )
    ).arrow()
    assert 0 < got.num_rows < ev.count()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    # closure: the released subset is 5-anonymous
    released = rd.from_arrow(got)
    assert k_anonymity_audit(released, q, k=5).count() == 0
    # crafted: NULL combos suppress together (2 NULL rows < k=3 -> gone)
    ds = rd.from_arrow(
        pa.table(
            {
                "q1": pa.array(["a"] * 3 + [None, None]),
                "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
    )
    t = _table(k_suppress(ds, ["q1"], k=3))
    assert sorted(t.column("id").to_pylist()) == [1, 2, 3]


def test_skyline2d_oracle(events_ds, educk):
    """2-D skyline vs the NOT EXISTS dominance twin; block-layout
    invariance (the distributive local-frontier reduction must not
    change the answer); crafted pins: exact duplicate frontier points
    all survive, same-x strict-y dominance, NULL coordinates drop."""
    from search_engine_ray.functions.aggregates import (
        skyline2d,
        skyline2d_sql,
    )

    ev = events_ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    got = _sorted(_table(skyline2d(ev, "ts_us", "value")))
    want = educk.sql(
        skyline2d_sql(
            "(SELECT event_id, epoch_us(ts) AS ts_us, value FROM events)",
            "ts_us", "value", cols="event_id, ts_us, value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(skyline2d(ev.repartition(17), "ts_us", "value")))
    assert got.equals(got2)
    # crafted: (5,5) dup x2 both survive; (5,4) dominated same-x;
    # (6,1) survives (best x); (4,9) survives (best y); (4,8) dominated
    ds = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
                "x": pa.array([5.0, 5.0, 5.0, 6.0, 4.0, 4.0, None]),
                "y": pa.array([5.0, 5.0, 4.0, 1.0, 9.0, 8.0, 99.0]),
            }
        )
    )
    t = _table(skyline2d(ds, "x", "y"))
    assert sorted(t.column("id").to_pylist()) == [1, 2, 4, 5]


def test_changepoint_per_user_oracle(events_ds, educk):
    """Changepoint vs the cumsum-window twin; block-layout invariance;
    crafted pins: a clean step lands the split at the step, a
    constant series scores 0 at k=1 (tie-break), single-event users
    emit nothing."""
    from search_engine_ray.functions.windows import (
        changepoint_per_user,
        changepoint_per_user_sql,
    )

    got = _sorted(_table(changepoint_per_user(events_ds)))
    want = educk.sql(changepoint_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(changepoint_per_user(events_ds.repartition(13))))
    assert got.equals(got2)
    # crafted: user 1 steps 10->50 after 3 rows -> k=3; user 2 constant
    # -> score 0, k=1; user 3 single event -> absent
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([10.0, 10.0, 10.0, 50.0, 50.0]):
        rows.append((1, i, t0 + dt.timedelta(minutes=i), v))
    for i, v in enumerate([7.0, 7.0, 7.0]):
        rows.append((2, 10 + i, t0 + dt.timedelta(minutes=i), v))
    rows.append((3, 99, t0, 1.0))
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows]),
            }
        )
    )
    t = _table(changepoint_per_user(ds)).sort_by("user_id")
    assert t.column("user_id").to_pylist() == [1, 2]
    assert t.column("k").to_pylist() == [3, 1]
    assert t.column("score").to_pylist()[1] == 0.0


def test_user_trend_oracle(events_ds, educk):
    """Grouped OLS slope vs the identical-moments twin; block-layout
    invariance; crafted pins: a perfect 2-cents/hour line recovers
    slope exactly, zero x-variance -> NULL."""
    import datetime as dt

    from search_engine_ray.functions.aggregates import (
        user_trend,
        user_trend_sql,
    )

    got = _sorted(_table(user_trend(events_ds)))
    want = educk.sql(user_trend_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(user_trend(events_ds.repartition(13))))
    assert got.equals(got2)
    # crafted: user 1 on an exact 2-cents/hour line; user 2 one hour
    t0 = dt.datetime(2024, 1, 1)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "ts": pa.array(
                    [t0, t0 + dt.timedelta(hours=1),
                     t0 + dt.timedelta(hours=2), t0,
                     t0 + dt.timedelta(minutes=5)],
                    pa.timestamp("us"),
                ),
                "value": pa.array([1.00, 1.02, 1.04, 5.0, 9.0]),
            }
        )
    )
    t = _table(user_trend(ds)).sort_by("user_id")
    assert t.column("slope_cents_per_hour").to_pylist() == [2.0, None]


def test_ab_test_oracle(events_ds, educk):
    """Welch's t per group vs the identical-expression twin; crafted
    pins: a planted mean shift yields a large |t| with the right sign,
    identical segments give t == 0 exactly, degenerate cells NULL,
    non-binary segments refused."""
    from search_engine_ray.functions.aggregates import ab_test, ab_test_sql

    def seg(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
                "value": t.column("value"),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _sorted(_table(ab_test(ev)))
    want = educk.sql(
        ab_test_sql("(SELECT event_type, user_id % 2 AS segment, value FROM events)")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(ab_test(ev.repartition(11))))
    assert got.equals(got2)
    # crafted: seg0 ~ 10, seg1 ~ 20 with tiny jitter -> strongly negative t
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 8),
                "segment": pa.array([0, 0, 0, 0, 1, 1, 1, 1], pa.int64()),
                "value": pa.array(
                    [10.0, 10.01, 9.99, 10.0, 20.0, 20.01, 19.99, 20.0]
                ),
            }
        )
    )
    t = _table(ab_test(ds))
    assert t.column("t_stat")[0].as_py() < -100
    # identical segments: t == 0 exactly (same ints both sides)
    same = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 4),
                "segment": pa.array([0, 0, 1, 1], pa.int64()),
                "value": pa.array([3.0, 7.0, 3.0, 7.0]),
            }
        )
    )
    assert _table(ab_test(same)).column("t_stat")[0].as_py() == 0.0
    # degenerate: one-row segment -> NULL
    tiny = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 3),
                "segment": pa.array([0, 0, 1], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0]),
            }
        )
    )
    assert _table(ab_test(tiny)).column("t_stat")[0].as_py() is None
    bad = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"]),
                "segment": pa.array([2], pa.int64()),
                "value": pa.array([1.0]),
            }
        )
    )
    with pytest.raises(Exception, match="segment must be"):
        _table(ab_test(bad))


def test_mann_whitney_oracle(events_ds, educk):
    """Mann-Whitney U vs the integer-midrank twin; block-layout
    invariance; crafted pins: hand-computed U with ties, the U1+U2 =
    n1*n2 identity, segment guard."""
    from search_engine_ray.functions.aggregates import (
        mann_whitney,
        mann_whitney_sql,
    )

    def seg(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
                "value": t.column("value"),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _sorted(_table(mann_whitney(ev)))
    want = educk.sql(
        mann_whitney_sql(
            "(SELECT event_type, user_id % 2 AS segment, value FROM events)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(mann_whitney(ev.repartition(11))))
    assert got.equals(got2)
    # the identity: U1 + U2 == n1*n2  <=>  u2_a + u2_b == 2*n1*n2
    # (check via swapped segments)
    swapped = ev.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array(
                    1 - t.column("segment").to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
                "value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    sw = _sorted(_table(mann_whitney(swapped)))
    for r1, r2 in zip(got.to_pylist(), sw.to_pylist()):
        assert r1["u2"] + r2["u2"] == 2 * r1["n_a"] * r1["n_b"]
    # crafted with ties: seg0 = [1, 2, 2], seg1 = [2, 3]
    # ranks: 1->1; the three 2s midrank (2+3+4)/3 = 3; 3->5
    # R1 = 1 + 3 + 3 = 7, U1 = 7 - 3*4/2 = 1 -> u2 = 2
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 5),
                "segment": pa.array([0, 0, 0, 1, 1], pa.int64()),
                "value": pa.array([1.0, 2.0, 2.0, 2.0, 3.0]),
            }
        )
    )
    t = _table(mann_whitney(ds))
    assert t.column("u2").to_pylist() == [2]
    with pytest.raises(Exception, match="segment must be"):
        _table(mann_whitney(rd.from_arrow(pa.table(
            {"event_type": pa.array(["x"]),
             "segment": pa.array([5], pa.int64()),
             "value": pa.array([1.0])}))))


def test_pythagorean_means_oracle(events_ds, educk):
    """AM/GM/HM vs the quantized-moment twin; block-layout invariance;
    pins: AM >= GM >= HM on every group, constant group AM == GM ==
    HM == the value, non-positive refused."""
    from search_engine_ray.functions.aggregates import (
        pythagorean_means,
        pythagorean_means_sql,
    )

    got = _sorted(_table(pythagorean_means(events_ds)))
    want = educk.sql(pythagorean_means_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(pythagorean_means(events_ds.repartition(11))))
    assert got.equals(got2)
    for r in got.to_pylist():
        assert r["am"] >= r["gm"] >= r["hm"] > 0
    # constant group: all three means equal the value (up to the
    # documented quantizations, which are exact for 4.0: ln/inv of a
    # round cent value)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 3),
                "value": pa.array([4.0, 4.0, 4.0]),
            }
        )
    )
    t = _table(pythagorean_means(ds))
    r = t.to_pylist()[0]
    assert r["am"] == 4.0
    assert abs(r["gm"] - 4.0) < 1e-5
    assert abs(r["hm"] - 4.0) < 1e-9
    with pytest.raises(Exception, match="positive"):
        _table(
            pythagorean_means(
                rd.from_arrow(
                    pa.table(
                        {
                            "event_type": pa.array(["x"]),
                            "value": pa.array([-1.0]),
                        }
                    )
                )
            )
        )


def test_benford_oracle(events_ds, educk):
    """Benford audit vs the integer-print twin; block-layout
    invariance; crafted pins: digit comes from cents (0.05 -> 5,
    999.996 -> cents 100000 -> digit 1), zeros drop, ppm arithmetic."""
    from search_engine_ray.functions.aggregates import (
        benford_by_group,
        benford_by_group_sql,
    )

    got = _sorted(_table(benford_by_group(events_ds)))
    want = educk.sql(benford_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(benford_by_group(events_ds.repartition(11))))
    assert got.equals(got2)
    # digit from CENTS: 0.05 -> 5 cents -> digit 5; 999.996 rounds to
    # 100000 cents -> digit 1 (float log10 of 999.996 would say 9);
    # 0.001 rounds to 0 cents -> drops
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 3),
                "value": pa.array([0.05, 999.996, 0.001]),
            }
        )
    )
    t = _sorted(_table(benford_by_group(ds)))
    assert t.column("digit").to_pylist() == [1, 5]
    assert t.column("n").to_pylist() == [1, 1]
    assert t.column("actual_ppm").to_pylist() == [500000, 500000]
    # expected_ppm for digit 1 is the quantized log10(2)
    assert t.column("expected_ppm").to_pylist()[0] == 301030


def test_unpivot_oracle(events_ds, educk):
    """UNPIVOT(PIVOT) vs DuckDB's dynamic pair; zeros survive; the
    n > 0 filter recovers exactly the pre-pivot groupby counts."""
    from search_engine_ray.functions.relational import (
        pivot_events,
        unpivot_events,
        unpivot_events_sql,
    )

    long = unpivot_events(pivot_events(events_ds))
    got = _sorted(_table(long))
    want = educk.sql(unpivot_events_sql("events")).arrow()
    assert got.num_rows == want.num_rows
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    # n > 0 recovers the sparse groupby counts exactly
    import pyarrow.compute as _pc

    sparse = got.filter(_pc.greater(got.column("n"), 0))
    counts = educk.sql(
        "SELECT user_id, event_type, CAST(count(*) AS BIGINT) n "
        "FROM events GROUP BY 1, 2"
    ).arrow()
    assert _sorted(sparse).equals(
        _sorted(counts.select(sparse.column_names).cast(sparse.schema))
    )


def test_seasonal_outliers_composition(events_ds, educk):
    """Seasonal (composite-key) outliers vs the composed twin; the
    motivating pin: a value NORMAL for the type overall but anomalous
    for its hour flags seasonally, not globally."""
    from search_engine_ray.functions.aggregates import (
        grouped_outliers,
        grouped_outliers_sql,
    )

    def seg(t):
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3_600_000_000) % 24
        et = t.column("event_type").to_pylist()
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "seg": pa.array(
                    [f"{e}|{int(x)}" for e, x in zip(et, h)], pa.string()
                ),
                "value": t.column("value"),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _sorted(_table(grouped_outliers(ev, "seg", "value", 3, 2)))
    want = educk.sql(
        grouped_outliers_sql(
            "(SELECT event_id, event_type || '|' || CAST("
            "(epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS seg, "
            "value FROM events)",
            "seg", "value", 3, 2,
            cols="event_id, c.seg, value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    # motivating pin: hour-3 cell runs at 1.0 with one 10.0 inside it;
    # every other hour runs at 10.0 — globally 10.0 is the NORM (the
    # global z-test flags the 1.0s, never the 10.0), but within the
    # hour-3 cell the 10.0 is the anomaly
    hour = 3_600_000_000
    rows_h, rows_v, rows_i = [], [], []
    i = 0
    for h in range(24):
        for _ in range(30):
            rows_h.append(h * hour)
            rows_v.append(1.0 if h == 3 else 10.0)
            rows_i.append(i); i += 1
    rows_h.append(3 * hour); rows_v.append(10.0); rows_i.append(i)
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(rows_i, pa.int64()),
                "ts": pa.array(rows_h, pa.timestamp("us")),
                "event_type": pa.array(["x"] * len(rows_v)),
                "value": pa.array(rows_v, pa.float64()),
            }
        )
    )
    seasonal = _table(grouped_outliers(
        ds.map_batches(seg, batch_format="pyarrow"), "seg", "value", 3, 2
    ))
    assert seasonal.num_rows == 1
    assert seasonal.column("value").to_pylist() == [10.0]
    assert seasonal.column("seg").to_pylist() == ["x|3"]
    globally = _table(grouped_outliers(ds, "event_type", "value", 3, 2))
    assert 10.0 not in globally.column("value").to_pylist()


def test_dispersion_oracle(events_ds, educk):
    """VMR vs the sparse-sufficient-statistics twin; block-layout
    invariance; pins: one-event-per-hour (deterministic arrivals)
    underdisperses toward 0... exactly (1 - n/H form), an all-in-one-
    hour burst overdisperses to exactly s, degenerate NULL."""
    from search_engine_ray.functions.aggregates import (
        dispersion_by_group,
        dispersion_by_group_sql,
    )

    got = _sorted(_table(dispersion_by_group(events_ds)))
    want = educk.sql(dispersion_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(dispersion_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    hour = 3_600_000_000

    def mk(hours):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(hours)),
                    "ts": pa.array([h * hour + 5 for h in hours],
                                   pa.timestamp("us")),
                }
            )
        )

    # exactly one event in each of 4 consecutive hours: counts all 1,
    # variance 0 -> vmr 0.0 exactly
    r = _table(dispersion_by_group(mk([0, 1, 2, 3]))).to_pylist()[0]
    assert (r["n"], r["n_hours"], r["vmr"]) == (4, 4, 0.0)
    # 10 events in hour 0, none in hours 1..4 (range via one event at
    # hour 4): burst overdispersion; H=5, s=11, ss=101:
    # vmr = (5*101 - 121)/(4*11) = 384/44
    r = _table(dispersion_by_group(mk([0] * 10 + [4]))).to_pylist()[0]
    assert r["vmr"] == 384.0 / 44.0
    # single hour -> H == 1 -> NULL
    r = _table(dispersion_by_group(mk([7, 7]))).to_pylist()[0]
    assert r["vmr"] is None


def test_tukey_outliers_oracle(events_ds, educk):
    """Tukey fences vs the doubled-integer twin; block-layout
    invariance; crafted pins: a spike breaches the high fence,
    uniform data breaches nothing, boundary-exact (fence value itself
    does NOT breach — strict inequality)."""
    from search_engine_ray.functions.aggregates import (
        tukey_outliers_by_group,
        tukey_outliers_by_group_sql,
    )

    got = _sorted(_table(tukey_outliers_by_group(events_ds)))
    want = educk.sql(tukey_outliers_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(tukey_outliers_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(vals):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(vals)),
                    "value": pa.array([float(v) for v in vals]),
                }
            )
        )

    # {1..8, 100}: q1 = 3, q3 = 7 (ceil ranks 3 and 7 of 9), IQR 4;
    # high fence 7 + 6 = 13 -> only the 100 breaches
    r = _table(tukey_outliers_by_group(mk(list(range(1, 9)) + [100]))).to_pylist()[0]
    assert (r["q1_c"], r["q3_c"], r["n_low"], r["n_high"]) == (300, 700, 0, 1)
    # exact fence value does NOT breach (strict): add 13.0 itself
    r = _table(
        tukey_outliers_by_group(mk(list(range(1, 9)) + [13]))
    ).to_pylist()[0]
    assert (r["n_low"], r["n_high"]) == (0, 0)
    # uniform block breaches nothing
    r = _table(tukey_outliers_by_group(mk([5, 5, 5, 5]))).to_pylist()[0]
    assert (r["n_low"], r["n_high"]) == (0, 0)


def test_bowley_skew_oracle(events_ds, educk):
    """Bowley skew vs the ceil-rank twin; block-layout invariance;
    pins: symmetric multiset exactly 0.0, right-skewed positive, a
    1e9 spike cannot move it (robustness), zero-IQR NULL."""
    from search_engine_ray.functions.aggregates import (
        bowley_skew_by_group,
        bowley_skew_by_group_sql,
    )

    got = _sorted(_table(bowley_skew_by_group(events_ds)))
    want = educk.sql(bowley_skew_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(bowley_skew_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(vals):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(vals)),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )

    # symmetric {1..7}: q1=2, q2=4, q3=6 -> skew 0.0 exactly
    r = _table(
        bowley_skew_by_group(mk([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]))
    ).to_pylist()[0]
    assert (r["q1_c"], r["q2_c"], r["q3_c"], r["skew"]) == (200, 400, 600, 0.0)
    # right-skewed {1,1,1,2,10}: q1=1, q2=1, q3=2 -> skew 1.0
    r = _table(bowley_skew_by_group(mk([1.0, 1.0, 1.0, 2.0, 10.0]))).to_pylist()[0]
    assert r["skew"] == 1.0
    # robustness: replacing the 10 with 1e6 changes NOTHING
    r2 = _table(bowley_skew_by_group(mk([1.0, 1.0, 1.0, 2.0, 1e6]))).to_pylist()[0]
    assert (r2["q1_c"], r2["q2_c"], r2["q3_c"], r2["skew"]) == (
        r["q1_c"], r["q2_c"], r["q3_c"], r["skew"],
    )
    # zero IQR -> NULL
    r = _table(bowley_skew_by_group(mk([5.0, 5.0, 5.0]))).to_pylist()[0]
    assert r["skew"] is None


def test_odds_ratio_oracle(events_ds, educk):
    """OR/RR vs the 2x2 twin; block-layout invariance; crafted pins:
    hand-computed OR/RR, zero-cell NULL, guard."""
    from search_engine_ray.functions.aggregates import (
        odds_ratio_by_group,
        odds_ratio_by_group_sql,
    )
    from search_engine_ray.functions.jsonops import _extract_int

    def prep(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ks = [_extract_int(s, "k") for s in t.column("props").to_pylist()]
        keep = pa.array([k is not None for k in ks])
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
                "hit": pa.array(
                    [1 if (k is not None and k >= 50) else 0 for k in ks],
                    pa.int64(),
                ),
            }
        ).filter(keep)

    ev = events_ds.map_batches(prep, batch_format="pyarrow")
    got = _sorted(_table(odds_ratio_by_group(ev, "event_type", "segment", "hit")))
    want = educk.sql(
        odds_ratio_by_group_sql(
            "(SELECT event_type, user_id % 2 AS segment, "
            "CASE WHEN TRY_CAST(json_extract_string(props, '$.k') "
            "AS BIGINT) >= 50 THEN 1 ELSE 0 END AS hit "
            "FROM events WHERE props IS NOT NULL AND json_valid(props) "
            "AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) "
            "IS NOT NULL)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(
            odds_ratio_by_group(
                ev.repartition(11), "event_type", "segment", "hit"
            )
        )
    )
    assert got.equals(got2)

    def mk(es, os_):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(es)),
                    "segment": pa.array(es, pa.int64()),
                    "hit": pa.array(os_, pa.int64()),
                }
            )
        )

    # a=3 b=1 c=1 d=3: OR = 9, RR = 3*(4)/(1*4) = 3
    t = _table(
        odds_ratio_by_group(
            mk([1] * 4 + [0] * 4, [1, 1, 1, 0, 1, 0, 0, 0]),
            "event_type", "segment", "hit",
        )
    )
    r = t.to_pylist()[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (3, 1, 1, 3)
    assert r["odds_ratio"] == 9.0 and r["risk_ratio"] == 3.0
    # zero cell: b = 0 -> OR NULL, RR still defined
    t = _table(
        odds_ratio_by_group(
            mk([1, 1, 0, 0], [1, 1, 1, 0]),
            "event_type", "segment", "hit",
        )
    )
    r = t.to_pylist()[0]
    assert r["odds_ratio"] is None and r["risk_ratio"] == 2.0
    with pytest.raises(Exception, match="must be 0 or 1"):
        _table(
            odds_ratio_by_group(
                mk([2], [1]), "event_type", "segment", "hit"
            )
        )


def test_pareto_oracle(events_ds, educk):
    """Vital-few k vs the descending-cumsum twin; block-layout
    invariance; crafted pins: one whale covering 80%+ gives k == 1,
    uniform users give k == ceil(0.8 n), partial-bucket ceiling,
    negative guard."""
    from search_engine_ray.functions.aggregates import (
        pareto_vital_few,
        pareto_vital_few_sql,
    )

    t = pareto_vital_few(events_ds)
    o = educk.sql(pareto_vital_few_sql("events")).arrow()
    assert t.cast(o.schema).equals(o)
    t2 = pareto_vital_few(events_ds.repartition(11))
    assert t.equals(t2)

    def mk(user_vals):
        us, vs = zip(*user_vals)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(list(us), pa.int64()),
                    "value": pa.array([float(v) for v in vs]),
                }
            )
        )

    # one whale: 80 of 100 total -> k == 1
    r = pareto_vital_few(
        mk([(1, 80.0)] + [(i, 2.0) for i in range(2, 12)])
    ).to_pylist()[0]
    assert r["k"] == 1
    # ten equal users: k == ceil(0.8 * 10) == 8 (partial-bucket ceil)
    r = pareto_vital_few(mk([(i, 5.0) for i in range(10)])).to_pylist()[0]
    assert (r["n_users"], r["k"], r["k_ppm"]) == (10, 8, 800000)
    with pytest.raises(Exception, match="negative"):
        pareto_vital_few(mk([(1, -1.0)]))


def test_behavior_signatures_oracle(events_ds, educk):
    """Signatures vs the ordered string_agg(DISTINCT) twin;
    block-layout invariance; crafted pins: sorted-set determinism
    (duplicates and arrival order irrelevant), user counts."""
    from search_engine_ray.functions.aggregates import (
        behavior_signatures,
        behavior_signatures_sql,
    )

    got = _sorted(_table(behavior_signatures(events_ds)))
    want = educk.sql(
        behavior_signatures_sql("events", "user_id", "event_type")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(behavior_signatures(events_ds.repartition(11))))
    assert got.equals(got2)
    # crafted: user 1 does {b, a, a}, user 2 does {a, b}, user 3 {c}:
    # signatures 'a,b' x2 and 'c' x1 — arrival order and repeats
    # cannot matter (the sorted-set contract)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "event_type": pa.array(["b", "a", "a", "a", "b", "c"]),
            }
        )
    )
    t = _sorted(_table(behavior_signatures(ds)))
    assert t.column("signature").to_pylist() == ["a,b", "c"]
    assert t.column("n_users").to_pylist() == [2, 1]


def test_hhi_oracle(events_ds, educk):
    """HHI vs the square-sum twin; block-layout invariance; pins:
    single category exactly 1.0, uniform k-way exactly 1/k, the 90/10
    near-monopoly reading entropy would miss."""
    from search_engine_ray.functions.aggregates import (
        hhi_by_group,
        hhi_by_group_sql,
    )

    got = _sorted(_table(hhi_by_group(events_ds)))
    want = educk.sql(hhi_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(hhi_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(cats):
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1] * len(cats), pa.int64()),
                    "event_type": pa.array(cats),
                }
            )
        )

    assert _table(mk_out := hhi_by_group(mk(["a"] * 7))).column(
        "hhi"
    ).to_pylist() == [1.0]
    assert _table(hhi_by_group(mk(["a", "b", "c", "d"]))).column(
        "hhi"
    ).to_pylist() == [0.25]
    # 90/10: hhi = 0.81 + 0.01 = 0.82 (near-monopoly)
    t = _table(hhi_by_group(mk(["a"] * 9 + ["b"])))
    assert t.column("hhi").to_pylist() == [0.82]


def test_wilson_oracle(events_ds, educk):
    """Wilson lower bound vs the token-identical twin; block-layout
    invariance; the small-sample pin: 1/1 does NOT outrank 95/100
    though its raw rate does; flag guard."""
    from search_engine_ray.functions.aggregates import (
        wilson_lower_bound,
        wilson_lower_bound_sql,
    )

    def flag(t):
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "is_hit": pa.array(
                    (et == "purchase").astype(np.int64), pa.int64()
                ),
            }
        )

    ev = events_ds.map_batches(flag, batch_format="pyarrow")
    got = _sorted(_table(wilson_lower_bound(ev, "user_id", "is_hit")))
    want = educk.sql(
        wilson_lower_bound_sql(
            "(SELECT user_id, CASE WHEN event_type = 'purchase' THEN 1 "
            "ELSE 0 END AS is_hit FROM events)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(wilson_lower_bound(ev.repartition(11), "user_id", "is_hit"))
    )
    assert got.equals(got2)
    # the ranking pin: user 1 = 1/1, user 2 = 95/100
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1] + [2] * 100, pa.int64()),
                "is_hit": pa.array([1] + [1] * 95 + [0] * 5, pa.int64()),
            }
        )
    )
    t = _table(wilson_lower_bound(ds, "user_id", "is_hit")).sort_by(
        [("user_id", "ascending")]
    )
    r1, r2 = t.to_pylist()
    assert r1["rate"] > r2["rate"]           # raw rate lies
    assert r1["wilson_lb"] < r2["wilson_lb"]  # the bound does not
    with pytest.raises(Exception, match="flag must be"):
        _table(
            wilson_lower_bound(
                rd.from_arrow(
                    pa.table(
                        {
                            "user_id": pa.array([1], pa.int64()),
                            "is_hit": pa.array([2], pa.int64()),
                        }
                    )
                ),
                "user_id",
                "is_hit",
            )
        )


def test_hour_uniformity_oracle(events_ds, educk):
    """Seasonality chi2 vs the dense-grid twin; block-layout
    invariance; pins: perfectly uniform 24-hour profile chi2 == 0
    exactly, single-spike profile chi2 == 23*n exactly."""
    from search_engine_ray.functions.aggregates import (
        hour_uniformity_by_group,
        hour_uniformity_by_group_sql,
    )

    got = _sorted(_table(hour_uniformity_by_group(events_ds)))
    want = educk.sql(hour_uniformity_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(hour_uniformity_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    hour = 3_600_000_000

    def mk(hours):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(hours)),
                    "ts": pa.array(
                        [h * hour for h in hours], pa.timestamp("us")
                    ),
                }
            )
        )

    # one event in every hour -> 24*o - n = 0 everywhere -> chi2 0.0
    r = _table(hour_uniformity_by_group(mk(list(range(24))))).to_pylist()[0]
    assert (r["chi2_num"], r["chi2"]) == (0, 0.0)
    # all n events in ONE hour: chi2 = ((24n-n)^2 + 23*n^2)/(24n) = 23n
    r = _table(hour_uniformity_by_group(mk([5] * 10))).to_pylist()[0]
    assert r["chi2"] == 230.0


def test_minmax_scale_oracle(events_ds, educk):
    """Min-max scaling vs the aggregate-rejoin twin; block-layout
    invariance; pins: group min 0.0 / max 1.0 exactly, constant group
    NULL, range within [0, 1]."""
    from search_engine_ray.functions.aggregates import (
        minmax_scale_by_group,
        minmax_scale_by_group_sql,
    )

    got = _sorted(_table(minmax_scale_by_group(events_ds)))
    want = educk.sql(minmax_scale_by_group_sql("events")).arrow()
    assert got.num_rows == events_ds.count()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(minmax_scale_by_group(events_ds.repartition(11))))
    assert got.equals(got2)
    sc = [x for x in got.column("scaled").to_pylist() if x is not None]
    assert min(sc) == 0.0 and max(sc) == 1.0
    # crafted: [2, 4, 6] -> [0, 0.5, 1]; constant group -> NULL
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "b", "b"]),
                "value": pa.array([2.0, 4.0, 6.0, 9.0, 9.0]),
            }
        )
    )
    t = _table(minmax_scale_by_group(ds)).sort_by([("event_id", "ascending")])
    assert t.column("scaled").to_pylist() == [0.0, 0.5, 1.0, None, None]


def test_mad_outliers_oracle(events_ds, educk):
    """MAD audit vs the ceil-rank twin; block-layout invariance;
    crafted pins: masking case (one spike hides another from the
    z-score but not from MAD), zero-MAD majority behavior, all-integer
    output."""
    from search_engine_ray.functions.aggregates import (
        mad_outliers_by_group,
        mad_outliers_by_group_sql,
    )

    got = _sorted(_table(mad_outliers_by_group(events_ds)))
    want = educk.sql(mad_outliers_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(mad_outliers_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(vals):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(vals)),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )

    # masking: [1..9, 1000, 1000]: sigma is spike-inflated (z-score at
    # 3-sigma flags NOTHING: max z ~ 1.9), but med=6, mad=3 -> both
    # spikes flagged (dev 99400 > 900)
    r = _table(
        mad_outliers_by_group(
            mk([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0, 1000.0])
        )
    ).to_pylist()[0]
    assert (r["med_c"], r["mad_c"], r["n_out"]) == (600, 300, 2)
    # zero MAD: majority at one value -> every off-median row flags
    r = _table(
        mad_outliers_by_group(mk([5.0, 5.0, 5.0, 7.0]))
    ).to_pylist()[0]
    assert (r["med_c"], r["mad_c"], r["n_out"]) == (500, 0, 1)


def test_peak_rate_composition(events_ds, educk):
    """Peak per-minute rate (mode over minute buckets) vs the same
    twin; crafted pin: the busiest minute's count, earliest on tie."""
    from search_engine_ray.functions.aggregates import (
        mode_by_group,
        mode_by_group_sql,
    )

    ev = events_ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "minute": pa.array(
                    t.column("ts").cast(pa.int64()).to_numpy(
                        zero_copy_only=False
                    ) // 60_000_000,
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    got = _sorted(_table(mode_by_group(ev, "event_type", "minute")))
    want = educk.sql(
        mode_by_group_sql(
            "(SELECT event_type, epoch_us(ts) // 60000000 AS minute "
            "FROM events)", "event_type", "minute"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    # crafted: minute 7 has 3 events, minutes 2 and 9 have 1
    m = 60_000_000
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 5),
                "minute": pa.array([7, 2, 7, 9, 7], pa.int64()),
            }
        )
    )
    t = _table(mode_by_group(ds, "event_type", "minute"))
    assert t.column("mode").to_pylist() == [7]
    assert t.column("n").to_pylist() == [3]
    del m


def test_mode_by_group_oracle(events_ds, educk):
    """Grouped mode vs the row_number twin; block-layout invariance;
    crafted pins: count ties resolve to the SMALLER value, NULLs
    excluded."""
    from search_engine_ray.functions.aggregates import (
        mode_by_group,
        mode_by_group_sql,
    )

    got = _sorted(_table(mode_by_group(events_ds, "user_id", "event_type")))
    want = educk.sql(mode_by_group_sql("events", "user_id", "event_type")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(mode_by_group(events_ds.repartition(11), "user_id", "event_type"))
    )
    assert got.equals(got2)
    # tie: 'a' x2, 'b' x2 -> mode 'a' (count DESC, value ASC)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1], pa.int64()),
                "event_type": pa.array(["b", "a", "b", "a"]),
            }
        )
    )
    t = _table(mode_by_group(ds, "user_id", "event_type"))
    assert t.column("mode").to_pylist() == ["a"]
    assert t.column("n").to_pylist() == [2]
    # NULL values excluded even when most frequent
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array([None, None, "z"]),
            }
        )
    )
    t = _table(mode_by_group(ds, "user_id", "event_type"))
    assert t.column("mode").to_pylist() == ["z"]


def test_percentile_cont_oracle(events_ds, educk):
    """PERCENTILE_CONT vs native quantile_cont (bit-exact lerp);
    block-layout invariance; crafted pins: exact midpoint
    interpolation, single-value group constant across qs."""
    from search_engine_ray.functions.aggregates import (
        percentile_cont_by_group,
        percentile_cont_by_group_sql,
    )

    got = _sorted(_table(percentile_cont_by_group(events_ds)))
    want = educk.sql(percentile_cont_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(percentile_cont_by_group(events_ds.repartition(11))))
    assert got.equals(got2)
    # two values -> p50 is the exact midpoint lerp
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x", "x"]),
                "value": pa.array([1.0, 2.0]),
            }
        )
    )
    t = _table(percentile_cont_by_group(ds))
    assert t.column("p50").to_pylist() == [1.5]
    assert t.column("p95").to_pylist() == [1.0 * (1.0 - 0.95) + 2.0 * 0.95]
    # single value -> every percentile is that value
    ds = rd.from_arrow(
        pa.table(
            {"event_type": pa.array(["y"]), "value": pa.array([7.25])}
        )
    )
    t = _table(percentile_cont_by_group(ds))
    for c in ("p25", "p50", "p75", "p95"):
        assert t.column(c).to_pylist() == [7.25]


def test_json_field_stats_oracle(events_ds, educk):
    """JSON extraction stats vs the json_valid + TRY_CAST twin;
    block-layout invariance; crafted edge pins (each probed against
    DuckDB): int passes, '7' parses, 12.5 rounds away, true/missing/
    malformed/NULL -> null."""
    from search_engine_ray.functions.jsonops import (
        json_field_stats,
        json_field_stats_sql,
    )

    got = _sorted(_table(json_field_stats(events_ds)))
    want = educk.sql(json_field_stats_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(json_field_stats(events_ds.repartition(11))))
    assert got.equals(got2)
    # crafted edge battery vs a DuckDB twin over the same literals
    import duckdb

    props = ['{"k": 69}', '{"x": 1}', "not json", '{"k": 12.5}',
             '{"k": "7"}', '{"k": true}', None, '{"k": -3}']
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * len(props)),
                "props": pa.array(props, pa.string()),
            }
        )
    )
    t = _table(json_field_stats(ds))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM (VALUES "
        + ", ".join(
            "('x', " + ("NULL" if p is None else "'" + p.replace("'", "''") + "'") + ")"
            for p in props
        )
        + ") t(event_type, props)"
    )
    o = con.sql(json_field_stats_sql("ev")).arrow()
    con.close()
    assert t.cast(o.schema).equals(o)
    r = t.to_pylist()[0]
    # 69, 13 (12.5 away), 7, -3 extract; 4 nulls
    assert (r["n"], r["n_null"], r["sum_k"], r["min_k"], r["max_k"]) == (
        8, 4, 86, -3, 69,
    )


def test_rolling_median_oracle(events_ds, educk):
    """Rolling median vs native windowed median; block-layout
    invariance; crafted pins: spike-immunity (median flat where a
    mean would drag), partial leading windows interpolate."""
    from search_engine_ray.functions.windows import (
        rolling_median_per_user,
        rolling_median_per_user_sql,
    )

    got = _sorted(_table(rolling_median_per_user(events_ds)))
    want = educk.sql(rolling_median_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(rolling_median_per_user(events_ds.repartition(11))))
    assert got.equals(got2)
    # crafted: [1, 1, 1000, 1, 1]: the window-5 median at the end is 1
    # (spike ignored); leading window of 2 interpolates (1+1)/2 = 1
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_id": pa.array(list(range(5)), pa.int64()),
                "ts": pa.array(list(range(5)), pa.timestamp("us")),
                "value": pa.array([1.0, 1.0, 1000.0, 1.0, 1.0]),
            }
        )
    )
    t = _table(rolling_median_per_user(ds)).sort_by(
        [("event_id", "ascending")]
    )
    assert t.column("roll_med_c").to_pylist() == [
        100.0, 100.0, 100.0, 100.0, 100.0,
    ]


def test_streaks_oracle(events_ds, educk):
    """Streaks vs the day - row_number() islands twin; block-layout
    invariance; crafted pins: known streak structure, tie resolves to
    the EARLIEST streak, same-day repeats dedup."""
    from search_engine_ray.functions.windows import (
        streaks_per_user,
        streaks_per_user_sql,
    )

    got = _sorted(_table(streaks_per_user(events_ds)))
    want = educk.sql(streaks_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(streaks_per_user(events_ds.repartition(11))))
    assert got.equals(got2)

    day = 86_400_000_000

    def mk(days):
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1] * len(days), pa.int64()),
                    "ts": pa.array([d * day + 7 for d in days],
                                   pa.timestamp("us")),
                }
            )
        )

    # days {3,4,5, 9,10}: longest 3 starting day 3; 5 distinct days
    r = _table(streaks_per_user(mk([4, 3, 5, 9, 10]))).to_pylist()[0]
    assert (r["n_days"], r["longest_streak"], r["streak_start_day"]) == (5, 3, 3)
    # tie {1,2} and {5,6}: earliest wins
    r = _table(streaks_per_user(mk([5, 6, 1, 2]))).to_pylist()[0]
    assert (r["longest_streak"], r["streak_start_day"]) == (2, 1)
    # same-day repeats dedup: {7,7,7} is a 1-day streak
    r = _table(streaks_per_user(mk([7, 7, 7]))).to_pylist()[0]
    assert (r["n_days"], r["longest_streak"]) == (1, 1)


def test_km_survival_oracle(events_ds, educk):
    """KM curve vs the quantized-log twin; block-layout invariance;
    crafted pins: censoring keeps the risk set honest (S = exp of the
    quantized ln(1/3)), dropping the censored user collapses S to
    exactly 0.0 (the naive bias), total-conversion dead flag."""
    import math

    from search_engine_ray.functions.windows import (
        km_survival,
        km_survival_sql,
    )

    t = km_survival(events_ds)
    o = educk.sql(km_survival_sql("events")).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    t2 = km_survival(events_ds.repartition(11))
    assert t.equals(t2)
    surv = t.column("survival").to_pylist()
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # monotone

    day = 86_400_000_000

    def mk(rows):
        n = len(rows)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_type": pa.array([r[1] for r in rows]),
                    "ts": pa.array([r[2] * day for r in rows],
                                   pa.timestamp("us")),
                }
            )
        )

    # A and C convert on day 2; B never converts, censored at day 9:
    # t=2: n_risk 3, d 2 -> S = exp(quantized ln(1/3))
    ev = mk([
        (1, "view", 0), (1, "purchase", 2),
        (2, "view", 0), (2, "view", 9),
        (3, "view", 0), (3, "purchase", 2),
    ])
    r = km_survival(ev).to_pylist()
    assert len(r) == 1
    want = math.exp(math.floor(math.log(1 / 3) * 1e6 + 0.5) / 1e6)
    assert (r[0]["t_days"], r[0]["n_risk"], r[0]["n_events"]) == (2, 3, 2)
    assert r[0]["survival"] == want
    # drop the censored user (the naive mistake): everyone at risk
    # converts -> the dead flag pins S to exactly 0.0
    ev2 = mk([
        (1, "view", 0), (1, "purchase", 2),
        (3, "view", 0), (3, "purchase", 2),
    ])
    r = km_survival(ev2).to_pylist()
    assert r[0]["survival"] == 0.0


def test_funnel_time_oracle(events_ds, educk):
    """Time-to-convert vs the composed funnel twin; crafted pins:
    exact durations from greedy-earliest matches, non-completers
    excluded, empty typed NULL."""
    from search_engine_ray.functions.windows import (
        funnel_time_stats,
        funnel_time_stats_sql,
    )

    t = funnel_time_stats(events_ds)
    o = educk.sql(funnel_time_stats_sql("events")).arrow()
    assert t.cast(o.schema).equals(o)
    t2 = funnel_time_stats(events_ds.repartition(11))
    assert t.equals(t2)

    def mk(rows):
        n = len(rows)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "event_id": pa.array(list(range(n)), pa.int64()),
                    "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                    "event_type": pa.array([r[1] for r in rows]),
                }
            )
        )

    # user 1 converts in 100 us, user 2 in 50, user 3 stalls at view
    ev = mk([
        (1, "signup", 0), (1, "view", 30), (1, "purchase", 100),
        (2, "signup", 1000), (2, "view", 1010), (2, "purchase", 1050),
        (3, "signup", 0), (3, "view", 10),
    ])
    r = funnel_time_stats(ev).to_pylist()[0]
    assert (r["n_converted"], r["min_us"], r["max_us"]) == (2, 50, 100)
    assert r["med_us"] == 50  # ceil-rank median of {50, 100} is rank 1
    # nobody converts -> typed NULL row
    r = funnel_time_stats(mk([(1, "signup", 0)])).to_pylist()[0]
    assert r["n_converted"] == 0 and r["med_us"] is None


def test_runs_test_oracle(events_ds, educk):
    """Runs test vs the lag() twin; block-layout invariance; crafted
    pins: oscillation maximizes runs (z > 0), a trend gives 2 runs
    (z < 0), median ties excluded, one-sided NULL."""
    from search_engine_ray.functions.windows import (
        runs_test_by_group,
        runs_test_by_group_sql,
    )

    got = _sorted(_table(runs_test_by_group(events_ds)))
    want = educk.sql(runs_test_by_group_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(runs_test_by_group(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(vals):
        n = len(vals)
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * n),
                    "event_id": pa.array(list(range(n)), pa.int64()),
                    "ts": pa.array(list(range(n)), pa.timestamp("us")),
                    "value": pa.array([float(v) for v in vals]),
                }
            )
        )

    # oscillation (median 3 ties out; kept signs b a b a a): runs 4
    # > mu = 3.4 -> z > 0
    r = _table(runs_test_by_group(mk([1, 9, 2, 8, 3, 7]))).to_pylist()[0]
    assert (r["n_above"], r["n_below"], r["runs"]) == (3, 2, 4)
    assert r["z"] > 0
    # perfect trend: exactly 2 runs, z < 0
    r = _table(runs_test_by_group(mk([1, 2, 3, 4, 6, 7, 8, 9]))).to_pylist()[0]
    assert r["runs"] == 2 and r["z"] < 0
    # median ties excluded: [1, 5, 5, 9] -> med 5, kept [1, 9]
    r = _table(runs_test_by_group(mk([1, 5, 5, 9]))).to_pylist()[0]
    assert (r["n_above"], r["n_below"], r["runs"]) == (1, 1, 2)
    # one-sided: all equal -> everything ties out -> NULL
    r = _table(runs_test_by_group(mk([5, 5, 5]))).to_pylist()[0]
    assert r["z"] is None


def test_stickiness_oracle(events_ds, educk):
    """DAU/MAU vs the literal range-join twin; block-layout
    invariance; crafted pins: coverage islands, a silence longer than
    the window yields mau == 0 -> NULL, dau <= mau everywhere."""
    from search_engine_ray.functions.windows import (
        stickiness_per_day,
        stickiness_per_day_sql,
    )

    t = stickiness_per_day(events_ds)
    o = educk.sql(stickiness_per_day_sql("events")).arrow()
    assert t.num_rows > 0
    assert t.cast(o.schema).equals(o)
    t2 = stickiness_per_day(events_ds.repartition(11))
    assert t.equals(t2)
    for r in t.to_pylist():
        assert r["dau"] <= r["mau"]

    day = 86_400_000_000

    def mk(user_days):
        us, ds_ = [], []
        for u, d in user_days:
            us.append(u)
            ds_.append(d * day + 123)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(us, pa.int64()),
                    "ts": pa.array(ds_, pa.timestamp("us")),
                }
            )
        )

    # one user active on days 0 and 40 (w=30): day 10 mau 1 dau 0;
    # days 30..39 fall outside both coverage islands -> mau 0 -> NULL
    t = stickiness_per_day(mk([(1, 0), (1, 40)]))
    rows = {r["day"]: r for r in t.to_pylist()}
    assert rows[0]["dau"] == 1 and rows[0]["mau"] == 1
    assert rows[0]["stickiness"] == 1.0
    assert rows[10]["dau"] == 0 and rows[10]["mau"] == 1
    assert rows[35]["mau"] == 0 and rows[35]["stickiness"] is None
    assert rows[40]["dau"] == 1 and rows[40]["mau"] == 1
    # two users: day 5 dau 1 (only u2), mau 2 (u1 day-0 coverage)
    t = stickiness_per_day(mk([(1, 0), (2, 5)]))
    rows = {r["day"]: r for r in t.to_pylist()}
    assert rows[5]["dau"] == 1 and rows[5]["mau"] == 2
    assert rows[5]["stickiness"] == 0.5


def test_busy_time_oracle(events_ds, educk):
    """Interval-union busy time vs the islands twin; block-layout
    invariance; crafted pins: overlap merges (union < naive sum),
    touching intervals merge, disjoint ones don't, negative guard."""
    from search_engine_ray.functions.windows import (
        busy_time_per_user,
        busy_time_per_user_sql,
    )

    got = _sorted(_table(busy_time_per_user(events_ds)))
    want = educk.sql(busy_time_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(busy_time_per_user(events_ds.repartition(11))))
    assert got.equals(got2)

    sec = 1_000_000

    def mk(pairs):
        n = len(pairs)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1] * n, pa.int64()),
                    "event_id": pa.array(list(range(n)), pa.int64()),
                    "ts": pa.array([p[0] * sec for p in pairs],
                                   pa.timestamp("us")),
                    "value": pa.array([float(p[1]) for p in pairs]),
                }
            )
        )

    # [0,10] + [5,15]: union 15s, naive 20s
    r = _table(busy_time_per_user(mk([(0, 10), (5, 10)]))).to_pylist()[0]
    assert (r["n_islands"], r["busy_us"]) == (1, 15 * sec)
    # touching [0,10] + [10,20] merge (strictly-greater breaks)
    r = _table(busy_time_per_user(mk([(0, 10), (10, 10)]))).to_pylist()[0]
    assert (r["n_islands"], r["busy_us"]) == (1, 20 * sec)
    # disjoint [0,10] + [20,30]
    r = _table(busy_time_per_user(mk([(0, 10), (20, 10)]))).to_pylist()[0]
    assert (r["n_islands"], r["busy_us"]) == (2, 20 * sec)
    with pytest.raises(Exception, match="negative duration"):
        _table(busy_time_per_user(mk([(0, -5)])))


def test_gap_stats_oracle(events_ds, educk):
    """Gap order statistics vs the lead() + ceil-rank twin;
    block-layout invariance; crafted pins: exact median/p95/max on a
    known gap multiset, single-event absence, cross-user isolation."""
    from search_engine_ray.functions.windows import (
        gap_stats_per_user,
        gap_stats_per_user_sql,
    )

    got = _sorted(_table(gap_stats_per_user(events_ds)))
    want = educk.sql(gap_stats_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(gap_stats_per_user(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(users, tss):
        n = len(users)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(users, pa.int64()),
                    "event_id": pa.array(list(range(n)), pa.int64()),
                    "ts": pa.array(tss, pa.timestamp("us")),
                }
            )
        )

    # gaps [10, 20, 30, 40]: median = rank ceil(4/2)=2 -> 20;
    # p95 = rank ceil(3.8)=4 -> 40; max 40
    t = mk([1] * 5, [0, 10, 30, 60, 100])
    r = _table(gap_stats_per_user(t)).to_pylist()[0]
    assert (r["n_gaps"], r["med_gap_us"], r["p95_gap_us"], r["max_gap_us"]) == (
        4, 20, 40, 40,
    )
    # single-event user emits nothing; gaps never span users
    t = mk([1, 2], [0, 1000])
    assert gap_stats_per_user(t).count() == 0


def test_max_concurrency_oracle(events_ds, educk):
    """Sweep-line peak vs the window-cumsum twin over the composed
    sessions; block-layout invariance; crafted pins: closed-interval
    touch counts as overlap, peak value + first-peak time, guard."""
    from search_engine_ray.functions.windows import (
        max_concurrency,
        max_concurrency_sql,
        session_windows,
        session_windows_sql,
    )

    t = max_concurrency(session_windows(events_ds))
    o = educk.sql(max_concurrency_sql(session_windows_sql("events"))).arrow()
    assert t.column("peak")[0].as_py() >= 1
    assert t.cast(o.schema).equals(o)
    t2 = max_concurrency(session_windows(events_ds.repartition(11)))
    assert t.equals(t2)

    def mk(iv):
        return rd.from_arrow(
            pa.table(
                {
                    "session_start": pa.array(
                        [a for a, _ in iv], pa.timestamp("us")
                    ),
                    "session_end": pa.array(
                        [b for _, b in iv], pa.timestamp("us")
                    ),
                }
            )
        )

    # [0,10], [5,15], [12,20]: peak 2, first reached at t=5
    r = max_concurrency(mk([(0, 10), (5, 15), (12, 20)])).to_pylist()[0]
    assert r["peak"] == 2
    assert r["peak_ts"].timestamp() * 1e6 == 5
    assert r["n_intervals"] == 3
    # closed intervals: touching at t=10 IS overlap
    r = max_concurrency(mk([(0, 10), (10, 20)])).to_pylist()[0]
    assert r["peak"] == 2 and r["peak_ts"].timestamp() * 1e6 == 10
    # end before start refused
    with pytest.raises(Exception, match="end before start"):
        max_concurrency(mk([(10, 0)]))
    # empty -> typed NULL row
    r = max_concurrency(mk([])).to_pylist()[0]
    assert r["peak"] is None and r["n_intervals"] == 0


def test_autocorr_oracle(events_ds, educk):
    """Lag-1 autocorrelation vs the lead()-pairs twin; block-layout
    invariance; crafted pins: perfect ramp r1 == 1.0 exactly,
    alternating series r1 == -1.0 exactly, pairs never span users,
    degenerate users NULL."""
    from search_engine_ray.functions.windows import (
        autocorr_per_user,
        autocorr_per_user_sql,
    )

    got = _sorted(_table(autocorr_per_user(events_ds)))
    want = educk.sql(autocorr_per_user_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(autocorr_per_user(events_ds.repartition(11))))
    assert got.equals(got2)

    def mk(users, vals):
        n = len(users)
        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array(users, pa.int64()),
                    "event_id": pa.array(list(range(n)), pa.int64()),
                    "ts": pa.array(
                        list(range(n)), pa.timestamp("us")
                    ),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )

    # monotone ramp -> consecutive pairs perfectly correlated -> 1.0
    t = _table(autocorr_per_user(mk([1] * 4, [1.0, 2.0, 3.0, 4.0])))
    assert t.column("r1").to_pylist() == [1.0]
    # alternating series -> each pair flips -> -1.0 EXACTLY
    t = _table(autocorr_per_user(mk([1] * 5, [1.0, 2.0, 1.0, 2.0, 1.0])))
    assert t.column("r1").to_pylist() == [-1.0]
    # pairs never span users: interleaved constant-per-user series;
    # a user-spanning pair stream would alternate (r defined), but each
    # user alone is constant -> zero variance -> NULL for both
    t = _sorted(_table(autocorr_per_user(mk([1, 2, 1, 2], [1.0, 2.0, 1.0, 2.0]))))
    assert t.column("n_pairs").to_pylist() == [1, 1]
    assert t.column("r1").to_pylist() == [None, None]
    # single event -> zero pairs, NULL
    t = _table(autocorr_per_user(mk([9], [5.0])))
    assert t.column("n_pairs").to_pylist() == [0]
    assert t.column("r1").to_pylist() == [None]


def test_emd_oracle(events_ds, educk):
    """EMD vs the cumulative-gap twin; block-layout invariance;
    crafted pins: identical segments 0.0 exactly, constant shift of d
    measures exactly d, the broad-shift case KS underweights."""
    from search_engine_ray.functions.aggregates import (
        emd_by_group,
        emd_by_group_sql,
        ks_test,
    )

    def seg(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
                "value": t.column("value"),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _sorted(_table(emd_by_group(ev)))
    want = educk.sql(
        emd_by_group_sql(
            "(SELECT event_type, user_id % 2 AS segment, value FROM events)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(emd_by_group(ev.repartition(11))))
    assert got.equals(got2)

    def mk(s0, s1):
        vals = s0 + s1
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(vals)),
                    "segment": pa.array(
                        [0] * len(s0) + [1] * len(s1), pa.int64()
                    ),
                    "value": pa.array(vals, pa.float64()),
                }
            )
        )

    # identical segments -> 0.0 exactly
    t = _table(emd_by_group(mk([1.0, 5.0], [1.0, 5.0])))
    assert t.column("emd").to_pylist() == [0.0]
    # constant shift: s1 = s0 + 3 -> EMD exactly 3.0
    t = _table(emd_by_group(mk([1.0, 5.0], [4.0, 8.0])))
    assert t.column("emd").to_pylist() == [3.0]
    # broad small shift: every point moved by 1 -> EMD 1.0, while the
    # KS height stays at a single-step 1/n — EMD sees the area
    s0 = [float(i) for i in range(1, 11)]
    s1 = [float(i + 1) for i in range(1, 11)]
    t = _table(emd_by_group(mk(s0, s1)))
    assert t.column("emd").to_pylist() == [1.0]
    k = _table(ks_test(mk(s0, s1)))
    assert k.column("d").to_pylist()[0] <= 0.2


def test_kendall_oracle(events_ds, educk):
    """Kendall tau-b vs the all-pairs SIGN-product twin; block-layout
    invariance; crafted pins: perfect monotone tau == +-1.0 exactly,
    a hand-computed tie case (s = 5, tau = 5/sqrt(30) bit-exact),
    all-tied side NULL."""
    import math

    from search_engine_ray.functions.aggregates import (
        kendall_by_group,
        kendall_by_group_sql,
    )

    ev = events_ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    got = _sorted(_table(kendall_by_group(ev, "event_type", "ts_us", "value")))
    want = educk.sql(
        kendall_by_group_sql(
            "(SELECT event_type, event_id, epoch_us(ts) AS ts_us, value "
            "FROM events)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(kendall_by_group(ev.repartition(11), "event_type", "ts_us", "value"))
    )
    assert got.equals(got2)

    def mk(xs, ys):
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array(["x"] * len(xs)),
                    "ts_us": pa.array(xs, pa.int64()),
                    "value": pa.array(ys, pa.float64()),
                }
            )
        )

    # perfect monotone map -> every pair concordant -> tau == 1.0 EXACTLY
    t = _table(kendall_by_group(mk([1, 2, 3, 4], [10.0, 20.0, 30.0, 40.0])))
    assert t.column("tau").to_pylist() == [1.0]
    t = _table(kendall_by_group(mk([1, 2, 3, 4], [40.0, 30.0, 20.0, 10.0])))
    assert t.column("tau").to_pylist() == [-1.0]
    # hand-computed tie case: x = 1..4, y = [1, 2, 2, 4]:
    # 5 concordant, 0 discordant, one y-tie pair ->
    # s = 5, n0 = 6, n1 = 0, n2 = 1, tau = 5/sqrt(6*5)
    t = _table(kendall_by_group(mk([1, 2, 3, 4], [1.0, 2.0, 2.0, 4.0])))
    assert t.column("s").to_pylist() == [5]
    assert t.column("tau")[0].as_py() == 5.0 / math.sqrt(30.0)
    # all-tied x side -> den == 0 -> NULL
    t = _table(kendall_by_group(mk([7, 7, 7], [1.0, 2.0, 3.0])))
    assert t.column("tau")[0].as_py() is None


def test_mk_trend_composition(events_ds, educk):
    """Per-user Mann-Kendall (kendall re-keyed by user, x = time) vs
    the same twin; a strictly increasing user pins tau == 1.0."""
    from search_engine_ray.functions.aggregates import (
        kendall_by_group,
        kendall_by_group_sql,
    )

    ev = events_ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    got = _sorted(_table(kendall_by_group(ev, "user_id", "ts_us", "value")))
    want = educk.sql(
        kendall_by_group_sql(
            "(SELECT user_id, event_id, epoch_us(ts) AS ts_us, value "
            "FROM events)", "user_id"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_id": pa.array([0, 1, 2, 3], pa.int64()),
                "ts_us": pa.array([10, 20, 30, 40], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    t = _table(kendall_by_group(ds, "user_id", "ts_us", "value"))
    assert t.column("tau").to_pylist() == [1.0]


def test_ks_test_oracle(events_ds, educk):
    """Two-sample KS vs the window-cumsum twin; block-layout
    invariance; crafted pins: identical segments d == 0.0 exactly,
    disjoint supports d == 1.0 exactly, a variance-only shift that
    Mann-Whitney cannot see, segment guard."""
    from search_engine_ray.functions.aggregates import ks_test, ks_test_sql

    def seg(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
                "value": t.column("value"),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _sorted(_table(ks_test(ev)))
    want = educk.sql(
        ks_test_sql(
            "(SELECT event_type, user_id % 2 AS segment, value FROM events)"
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(ks_test(ev.repartition(11))))
    assert got.equals(got2)
    # identical segments -> every CDF gap is 0 -> d == 0.0 EXACTLY
    same = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 4),
                "segment": pa.array([0, 1, 0, 1], pa.int64()),
                "value": pa.array([3.0, 3.0, 7.0, 7.0]),
            }
        )
    )
    t = _table(ks_test(same))
    assert t.column("ks_num").to_pylist() == [0]
    assert t.column("d").to_pylist() == [0.0]
    # disjoint supports -> at the boundary ca == na, cb == 0 ->
    # ks_num == na*nb -> d == 1.0 EXACTLY
    dis = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 5),
                "segment": pa.array([0, 0, 0, 1, 1], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0, 8.0, 9.0]),
            }
        )
    )
    t = _table(ks_test(dis))
    assert t.column("ks_num").to_pylist() == [6]
    assert t.column("d").to_pylist() == [1.0]
    # variance-only shift: seg0 = [1, 5], seg1 = [3, 3] — equal means
    # AND equal rank sums (U = n1*n2/2), but the CDFs split: at v=1
    # |1*2 - 0*2| = 2 -> d = 0.5
    var = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 4),
                "segment": pa.array([0, 0, 1, 1], pa.int64()),
                "value": pa.array([1.0, 5.0, 3.0, 3.0]),
            }
        )
    )
    t = _table(ks_test(var))
    assert t.column("d").to_pylist() == [0.5]
    with pytest.raises(Exception, match="segment must be"):
        _table(ks_test(rd.from_arrow(pa.table(
            {"event_type": pa.array(["x"]),
             "segment": pa.array([7], pa.int64()),
             "value": pa.array([1.0])}))))


def test_chi2_independence_oracle(events_ds, educk):
    """Chi-square vs the full-cross-product twin; block-layout
    invariance; crafted pins: perfectly independent table gives
    chi2 == 0 exactly, absent cells contribute, dof arithmetic."""
    from search_engine_ray.functions.aggregates import (
        chi2_independence,
        chi2_independence_sql,
    )

    def seg(t):
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "segment": pa.array((u & 1).astype(np.int64), pa.int64()),
            }
        )

    ev = events_ds.map_batches(seg, batch_format="pyarrow")
    got = _table(chi2_independence(ev, "event_type", "segment"))
    want = educk.sql(
        chi2_independence_sql(
            "(SELECT event_type, user_id % 2 AS segment FROM events)",
            "event_type", "segment",
        )
    ).arrow()
    assert got.num_rows == 1
    g, w = got.to_pylist()[0], want.to_pylist()[0]
    assert g["n"] == w["n"] and g["dof"] == w["dof"]
    assert abs(g["chi2"] - w["chi2"]) < 1e-9
    got2 = _table(chi2_independence(
        ev.repartition(9), "event_type", "segment"))
    assert got.to_pylist()[0]["chi2"] == got2.to_pylist()[0]["chi2"]
    # crafted independence: counts proportional -> chi2 == 0
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(["x"] * 6 + ["y"] * 3),
                "b": pa.array([0, 0, 0, 0, 1, 1, 0, 0, 1], pa.int64()),
            }
        )
    )
    t = _table(chi2_independence(ds, "a", "b")).to_pylist()[0]
    assert t["chi2"] == 0.0 and t["dof"] == 1
    # absent cell: all of y in segment 0 -> positive chi2
    ds2 = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", "x", "y", "y"]),
                "b": pa.array([0, 1, 0, 0], pa.int64()),
            }
        )
    )
    assert _table(chi2_independence(ds2, "a", "b")).to_pylist()[0]["chi2"] > 0
    with pytest.raises(ValueError, match="empty"):
        chi2_independence(
            rd.from_arrow(pa.table({"a": pa.array([], pa.string()),
                                    "b": pa.array([], pa.int64())})),
            "a", "b",
        )


def test_spearman_by_group_oracle(events_ds, educk):
    """Spearman rho vs the integer-midrank twin; block-layout
    invariance; crafted pins: a perfect monotone map gives rho == 1.0
    exactly, a reversed one -1.0, an all-tied side NULL."""
    from search_engine_ray.functions.aggregates import (
        spearman_by_group,
        spearman_by_group_sql,
    )

    ev = events_ds.map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "ts_us": t.column("ts").cast(pa.int64()),
                "value": t.column("value"),
            }
        ),
        batch_format="pyarrow",
    )
    got = _sorted(_table(spearman_by_group(ev, "event_type", "ts_us", "value")))
    want = educk.sql(
        spearman_by_group_sql(
            "(SELECT event_type, epoch_us(ts) AS ts_us, value FROM events)",
            "event_type", "ts_us", "value",
        )
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(spearman_by_group(ev.repartition(9), "event_type", "ts_us", "value"))
    )
    assert got.equals(got2)
    # crafted: monotone increasing -> 1.0; reversed -> -1.0; ties -> NULL
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["up"] * 4 + ["down"] * 4 + ["flat"] * 3),
                "x": pa.array(
                    [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3], pa.int64()
                ),
                "y": pa.array(
                    [10.0, 20.0, 25.0, 99.0, 99.0, 25.0, 20.0, 10.0,
                     7.0, 7.0, 7.0]
                ),
            }
        )
    )
    t = _table(spearman_by_group(ds, "g", "x", "y")).sort_by("g")
    by = dict(zip(t.column("g").to_pylist(), t.column("rho").to_pylist()))
    assert by["up"] == 1.0 and by["down"] == -1.0 and by["flat"] is None


def test_transition_counts_oracle(events_ds, educk):
    """Transition counts vs the lead() twin; block-layout invariance;
    crafted pins: the chain a->b->b->c counts (a,b),(b,b),(b,c),
    transitions never span users, single-event users contribute
    nothing, total transitions == rows - users."""
    import datetime as dt

    from search_engine_ray.functions.windows import (
        transition_counts,
        transition_counts_sql,
    )

    got = _sorted(_table(transition_counts(events_ds)))
    want = educk.sql(transition_counts_sql("events")).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(transition_counts(events_ds.repartition(13))))
    assert got.equals(got2)
    n_events = events_ds.count()
    n_users = events_ds.unique("user_id").__len__()
    assert sum(got.column("n").to_pylist()) == n_events - n_users
    # crafted: user 1 chain a,b,b,c; user 2 single event (nothing);
    # the c->a "transition" across users must NOT appear
    t0 = dt.datetime(2024, 1, 1)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array(
                    [t0 + dt.timedelta(minutes=i) for i in range(5)],
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(["a", "b", "b", "c", "a"]),
            }
        )
    )
    t = _sorted(_table(transition_counts(ds)))
    assert t.to_pylist() == [
        {"from_type": "a", "to_type": "b", "n": 1},
        {"from_type": "b", "to_type": "b", "n": 1},
        {"from_type": "b", "to_type": "c", "n": 1},
    ]


def test_gini_by_group_oracle(events_ds, educk):
    """Gini vs the row_number twin; block-layout invariance; crafted
    pins: perfect equality -> 0 exactly, one-whale concentration ->
    (n-1)/n exactly, all-zero group NULL, negative values refused."""
    from search_engine_ray.functions.aggregates import (
        gini_by_group,
        gini_by_group_sql,
    )

    got = _sorted(_table(gini_by_group(events_ds, "event_type", "value")))
    want = educk.sql(
        gini_by_group_sql("events", "event_type", "value")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(gini_by_group(events_ds.repartition(9), "event_type", "value"))
    )
    assert got.equals(got2)
    # crafted: equal values -> 0; one whale of 4 -> (4-1)/4 = 0.75;
    # all-zero -> NULL
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array(["eq"] * 4 + ["whale"] * 4 + ["zero"] * 2),
                "v": pa.array(
                    [5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 80.0, 0.0, 0.0]
                ),
            }
        )
    )
    t = _table(gini_by_group(ds, "g", "v")).sort_by("g")
    by = dict(zip(t.column("g").to_pylist(), t.column("gini").to_pylist()))
    assert by["eq"] == 0.0 and by["whale"] == 0.75 and by["zero"] is None
    with pytest.raises(Exception, match="negative"):
        _table(gini_by_group(
            rd.from_arrow(pa.table({"g": pa.array(["x"]),
                                    "v": pa.array([-1.0])})), "g", "v"))


def test_entropy_by_group_oracle(events_ds, educk):
    """Entropy vs the quantized-log twin; block-layout invariance;
    crafted pins: single-category group == 0.0 exactly, a uniform
    4-way mix == quantized ln 4, skew strictly below uniform."""
    from search_engine_ray.functions.aggregates import (
        entropy_by_group,
        entropy_by_group_sql,
    )

    got = _sorted(_table(entropy_by_group(events_ds, "user_id", "event_type")))
    want = educk.sql(
        entropy_by_group_sql("events", "user_id", "event_type")
    ).arrow()
    assert got.num_rows > 0
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(
        _table(entropy_by_group(events_ds.repartition(11), "user_id", "event_type"))
    )
    assert got.equals(got2)
    # crafted
    ds = rd.from_arrow(
        pa.table(
            {
                "g": pa.array([1] * 3 + [2] * 4 + [3] * 4, pa.int64()),
                "c": pa.array(
                    ["a", "a", "a", "w", "x", "y", "z", "w", "w", "w", "x"]
                ),
            }
        )
    )
    t = _table(entropy_by_group(ds, "g", "c")).sort_by("g")
    e = t.column("entropy").to_pylist()
    assert e[0] == 0.0  # single category
    q4 = -4 * 1 * np.floor(np.log(0.25) * 1_000_000 + 0.5) / (4 * 1_000_000)
    assert abs(e[1] - q4) < 1e-12  # uniform 4-way == quantized ln 4
    assert 0.0 < e[2] < e[1]  # skewed mix strictly between


def test_quantile_bin_oracle(events_ds, educk):
    """Quartile binning vs the rank-rule twin; block-layout
    invariance; crafted pins: equal-frequency counts on a uniform
    ramp, tied boundary values share the boundary's bucket, guard."""
    from search_engine_ray.functions.aggregates import (
        quantile_bin,
        quantile_bin_sql,
    )

    ev = events_ds.select_columns(["event_id", "event_type", "value"])
    got = _sorted(_table(quantile_bin(ev, "event_type", "value")))
    want = educk.sql(
        quantile_bin_sql(
            "(SELECT event_id, event_type, value FROM events)",
            "event_type", "value",
            cols="s.event_id, s.event_type, s.value",
        )
    ).arrow()
    assert got.equals(_sorted(want.select(got.column_names).cast(got.schema)))
    got2 = _sorted(_table(quantile_bin(ev.repartition(9), "event_type", "value")))
    assert got.equals(got2)
    # crafted ramp 1..8: quartiles 2/4/6 -> bins [1,1,2,2,3,3,4,4];
    # tie group: all rows equal -> everyone bucket 1
    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["r"] * 8 + ["t"] * 3),
                "value": pa.array(
                    [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 9.0, 9.0]
                ),
            }
        )
    )
    t = _table(quantile_bin(ds, "event_type", "value")).sort_by(
        [("event_type", "ascending"), ("value", "ascending")]
    )
    assert t.column("bin").to_pylist() == [1, 1, 2, 2, 3, 3, 4, 4, 1, 1, 1]
    with pytest.raises(ValueError, match="bins"):
        quantile_bin(ds, "event_type", "value", bins=1)


# ------------------------------------------- scale-fallback two-path pins


def test_k_suppress_shuffle_path_pinned(events_ds):
    """The shuffle (groupby-census) k-suppression plan == the broadcast
    (audit + membership filter) plan, row for row — and auto falls over
    to it when the combo bound is forced low, instead of raising."""
    from search_engine_ray.functions.privacy import k_anonymity_audit, k_suppress

    def quasi(t):
        vb = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) / 50.0
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "vb": pa.array(vb, pa.int64()),
                "user_id": t.column("user_id"),
            }
        )

    ds = events_ds.map_batches(quasi, batch_format="pyarrow")
    cols = ["event_type", "vb"]
    key = [("user_id", "ascending"), ("event_type", "ascending"),
           ("vb", "ascending")]
    bc = _table(k_suppress(ds, cols, k=50, mode="broadcast")).sort_by(key)
    sh = _table(k_suppress(ds, cols, k=50, mode="shuffle")).sort_by(key)
    assert bc.num_rows > 0
    assert bc.equals(sh.select(bc.column_names).cast(bc.schema))
    # auto + forced-low bound routes to shuffle (no raise), same rows
    auto = _table(
        k_suppress(ds, cols, k=50, mode="auto", max_combos_broadcast=1)
    ).sort_by(key)
    assert bc.equals(auto.select(bc.column_names).cast(bc.schema))
    # the released subset still audits clean on the shuffle path
    from ray.data import from_arrow as _fa

    assert k_anonymity_audit(_fa(sh), cols, k=50).count() == 0


def test_small_qty_revenue_semijoin_path_pinned():
    """The key-partitioned semi-join Q17 plan (forced by a low
    broadcast bound) == the broadcast-key plan, bit for bit."""
    from search_engine_ray.functions.relational import small_qty_revenue

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pt = rd.read_parquet(f"{SF_DIR}/part.parquet")
    bc = _table(small_qty_revenue(li, pt))
    sj = _table(small_qty_revenue(li, pt, max_keys_broadcast=1))
    assert bc.column("small_cents")[0].as_py() > 0
    assert bc.equals(sj)


def test_triangle_counts_join_orientation_pinned():
    """The two-round degree-JOIN orientation (forced by a low node
    bound) == the degree-broadcast orientation on both a real co-order
    graph and crafted K4; explicit broadcast over the bound still
    refuses loudly."""
    import pyarrow.compute as _pc

    from search_engine_ray.functions.graph import (
        cooccurrence_pairs,
        triangle_counts,
    )

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet").map_batches(
        lambda t: t.filter(
            _pc.greater_equal(t.column("l_quantity"), pa.scalar(40.0))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )
    pairs = cooccurrence_pairs(li, "l_orderkey", "l_partkey").materialize()
    bc = _sorted(_table(triangle_counts(pairs)))
    jn = _sorted(_table(triangle_counts(pairs, max_nodes_broadcast=1)))
    assert bc.num_rows > 0
    assert bc.equals(jn)
    k4 = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "b": pa.array([2, 3, 4, 3, 4, 4], pa.int64()),
            }
        )
    )
    t = _table(triangle_counts(k4, orient_mode="join")).sort_by("node")
    assert t.column("n_triangles").to_pylist() == [3, 3, 3, 3]
    with pytest.raises(ValueError, match="exceed the degree"):
        triangle_counts(k4, max_nodes_broadcast=1, orient_mode="broadcast")


def test_bpe_fit_sql_oracle(docs_ds, fduck):
    """The unrolled-CTE SQL twin of the BPE merge loop == bpe_fit on
    the real documents corpus, plus crafted pins for the three traps:
    left-to-right non-overlap ('aaa' + (a,a) -> [aa, a]), the
    max_words cap tie-break, and early stop at the first sub-2 pair."""
    import duckdb as _duckdb

    from search_engine_ray.functions import bpe

    got = bpe.bpe_fit(docs_ds, n_merges=15)
    want = fduck.sql(bpe.bpe_fit_sql("documents", n_merges=15)).arrow()
    assert got.num_rows == 15
    assert got.equals(want.cast(got.schema))

    con = _duckdb.connect()
    crafted = pa.table(
        {"text": ["aaa aaa aaa aa ab", "zzz yy xx qq unique1 unique2"]}
    )
    con.register("crafted", crafted)
    want2 = con.sql(bpe.bpe_fit_sql("crafted", n_merges=20, max_words=5)).arrow()
    wc = bpe.word_counts(rd.from_arrow(crafted))
    got2 = bpe.bpe_fit_counts(wc, n_merges=20, max_words=5)
    assert got2.num_rows < 20  # early stop engaged
    assert got2.equals(want2.cast(got2.schema))
    con.close()


def test_nb_classify_join_path_pinned(docs_ds):
    """The token-keyed join NB scorer (no driver-side model anywhere)
    == the broadcast scorer, row for row — and auto falls over to it
    when the model bound is forced low, instead of raising."""
    from search_engine_ray.functions import classify

    key = [("doc_id", "ascending")]
    bc = _table(classify.nb_classify(docs_ds, mode="broadcast")).sort_by(key)
    jn = _table(classify.nb_classify(docs_ds, mode="join")).sort_by(key)
    assert bc.num_rows > 0
    assert bc.equals(jn.select(bc.column_names).cast(bc.schema))
    auto = _table(
        classify.nb_classify(docs_ds, mode="auto", broadcast_max_rows=1)
    ).sort_by(key)
    assert bc.equals(auto.select(bc.column_names).cast(bc.schema))
