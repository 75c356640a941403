"""Hypothesis property tests: codec round-trips for arbitrary inputs,
analyzer batch/scalar equivalence for arbitrary text, and the zero-copy
range decoder against the per-block decoder."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_ray import analyzer
from search_engine_ray.state import codec

uint64s = st.integers(min_value=0, max_value=2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(uint64s, max_size=300))
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v), len(v)) == v).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=300))
def test_delta_varint_roundtrip_sorted_ids(gaps):
    ids = np.cumsum(np.array(gaps, np.uint64)).astype(np.uint64)
    enc = codec.varint_encode(codec.delta_encode(ids))
    assert (codec.delta_decode(codec.varint_decode(enc, len(ids))) == ids).all()


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_analyze_batch_matches_scalar(text):
    """The vectorized Arrow batch path computes exactly the per-doc
    {lemma: tf} map of the scalar path (the golden-test analyzer)."""
    expected = analyzer.analyze(text)
    doc_idx, lemmas, tf, doc_len, _pos = analyzer.analyze_batch(pa.array([text, text]), {})
    for d in (0, 1):
        m = doc_idx == d
        got = dict(zip(np.asarray(lemmas)[m].tolist(), tf[m].tolist()))
        assert got == expected
        assert doc_len[d] == sum(expected.values())


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),  # block length
        ),
        min_size=1,
        max_size=12,
    ),
    st.randoms(use_true_random=False),
)
def test_decode_block_range_matches_per_block(blocks, rnd):
    """decode_block_range over a binary column == per-block decode."""
    from search_engine_ray.stages.encode import (
        binary_column_buffers,
        decode_block,
        decode_block_range,
    )

    rng = np.random.default_rng(rnd.randrange(2**32))
    gaps_cells, tfs_cells, dls_cells, ns, truth = [], [], [], [], []
    docid0 = 0
    for (n,) in blocks:
        gaps = rng.integers(1, 10_000, size=n).astype(np.uint64)
        ids = docid0 + np.cumsum(gaps)
        docid0 = int(ids[-1]) + int(rng.integers(1, 100))
        tf = rng.integers(1, 50, size=n).astype(np.uint64)
        dl = rng.integers(1, 500, size=n).astype(np.uint64)
        # encode exactly like the stage: first value absolute, rest gaps
        enc_gaps = gaps.copy()
        enc_gaps[0] = ids[0]
        gaps_cells.append(codec.varint_encode(enc_gaps))
        tfs_cells.append(codec.varint_encode(tf))
        dls_cells.append(codec.varint_encode(dl))
        ns.append(n)
        truth.append((ids.astype(np.int64), tf.astype(np.int64), dl.astype(np.int64)))

    gcol = pa.array(gaps_cells, pa.binary())
    tcol = pa.array(tfs_cells, pa.binary())
    dcol = pa.array(dls_cells, pa.binary())
    cum = np.concatenate(([0], np.cumsum(ns))).astype(np.int64)
    got = decode_block_range(
        binary_column_buffers(gcol),
        binary_column_buffers(tcol),
        binary_column_buffers(dcol),
        cum,
        0,
        len(ns),
    )
    exp = tuple(np.concatenate([t[i] for t in truth]) for i in range(3))
    for g_, e_ in zip(got, exp):
        assert (g_ == e_).all()
    # and per-block equality
    for j, (n, (ids, tf, dl)) in enumerate(zip(ns, truth)):
        d1 = decode_block(gaps_cells[j], tfs_cells[j], dls_cells[j], n)
        assert (d1[0] == ids).all() and (d1[1] == tf).all() and (d1[2] == dl).all()


# ---------------------------------------------------------------------------
# Random-corpus engine == SQL-twin pins for the rewrite/chunk operators
# ---------------------------------------------------------------------------

_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_tok, max_size=24).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)


def _duck_vs_engine(docs_texts, engine_ds_fn, sql_fn):
    import duckdb

    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(len(docs_texts)), pa.int64()),
        "text": pa.array(docs_texts, pa.string()),
    })
    got = engine_ds_fn(rd.from_arrow(tbl)).to_pandas()
    con = duckdb.connect()
    con.register("corpus", tbl)
    exp = con.execute(sql_fn("corpus")).df()
    con.close()
    cols = list(exp.columns)
    key = [c for c in ("doc_id", "chunk_idx") if c in cols]
    got = got[cols].sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert got.equals(exp), (got, exp)


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_span_dedup_random_corpus_matches_twin(ray_session, texts):
    """span_dedup == its DuckDB twin on ARBITRARY small corpora over a
    5-token alphabet (dense duplicate collisions by construction):
    keep-globally-first, overlap collapse, short/empty docs — the
    whole semantics, not just the crafted cases."""
    from search_engine_ray.functions.text_analysis import (
        span_dedup,
        span_dedup_sql,
    )

    _duck_vs_engine(
        texts,
        lambda ds: span_dedup(ds, window=3),
        lambda src: span_dedup_sql(src, window=3),
    )


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_chunk_documents_random_corpus_matches_twin(ray_session, texts):
    from search_engine_ray.functions.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    _duck_vs_engine(
        texts,
        lambda ds: chunk_documents(ds, size=5, stride=3),
        lambda src: chunk_documents_sql(src, size=5, stride=3),
    )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _doc),
        min_size=2, max_size=10,
    )
)
def test_nb_classify_random_corpus_matches_twin(ray_session, rows):
    """nb_classify == its model-recomputing SQL twin on arbitrary
    labeled corpora — priors, smoothing denominators, the quantized
    log-prob sums and the argmax tie-break all mirror exactly."""
    import duckdb

    import ray.data as rd

    from search_engine_ray.functions.classify import (
        nb_classify,
        nb_classify_sql,
    )

    tbl = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    got = nb_classify(rd.from_arrow(tbl)).to_pandas()
    con = duckdb.connect()
    con.register("corpus", tbl)
    exp = con.execute(nb_classify_sql("corpus")).df()
    con.close()
    cols = list(exp.columns)
    got = got[cols].sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    assert got.equals(exp), (got, exp)
