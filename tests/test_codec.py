"""Compression property tests (FIXTURES.md §6): seeded random posting
lists -> delta+varint encode -> decode -> identical; block metadata
equals true block stats."""

import numpy as np
import pytest

from search_engine_ray.state import codec


@pytest.mark.parametrize("seed", range(5))
def test_varint_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 10_000))
    # mix of magnitudes incl. >2^56 (10-byte varints)
    v = rng.integers(0, 1 << 62, size=n).astype(np.uint64) >> rng.integers(
        0, 60, size=n
    ).astype(np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v), n) == v).all()


def test_varint_edge_values():
    edges = [0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**32, 2**56, 2**63, 2**64 - 1]
    v = np.array(edges, dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v)) == v).all()
    assert codec.varint_encode(np.empty(0, np.uint64)) == b""
    assert len(codec.varint_decode(b"")) == 0


def test_varint_nbytes_matches_encoding():
    v = np.array([0, 127, 128, 16383, 16384, 2**21 - 1, 2**21], np.uint64)
    nb = codec.varint_nbytes(v)
    assert list(nb) == [1, 1, 2, 2, 3, 3, 4]
    assert len(codec.varint_encode(v)) == nb.sum()


@pytest.mark.parametrize("seed", range(5))
def test_posting_block_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 100_000))
    gaps = rng.integers(1, 1_000_000, size=n).astype(np.uint64)
    ids = np.cumsum(gaps).astype(np.uint64)
    tfs = rng.integers(1, 255, size=n).astype(np.uint64)
    dls = rng.integers(1, 4096, size=n).astype(np.uint64)
    blob = codec.encode_posting_block(ids, tfs, dls)
    d_ids, d_tfs, d_dls = codec.decode_posting_block(blob, n)
    assert (d_ids == ids).all() and (d_tfs == tfs).all() and (d_dls == dls).all()


def test_delta_roundtrip():
    ids = np.array([5, 6, 100, 2**40, 2**40 + 1], np.uint64)
    assert (codec.delta_decode(codec.delta_encode(ids)) == ids).all()


def test_block_encoder_stage(tiny_index):
    """Every block in the built index decodes to strictly-increasing
    docids matching its skip metadata, and bmw >= every true weight."""
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines import build
    from search_engine_ray.stages.encode import decode_block

    m = tiny_index["manifest"]
    k1, b = m["config"]["k1"], m["config"]["b"]
    avgdl = m["stats"]["avgdl"]
    idx = pq.read_table(build.index_dir(tiny_index["out_dir"]))
    total = 0
    for row in idx.to_pylist():
        d, tf, dl = decode_block(row["gaps"], row["tfs"], row["dls"], row["n"])
        assert d[0] == row["first_docid"] and d[-1] == row["last_docid"]
        assert (np.diff(d) > 0).all()
        w = tf / (tf + k1 * (1 - b + b * dl / avgdl))
        assert np.float32(w.max()) <= np.float32(row["bmw"]) * (1 + 1e-6)
        total += row["n"]
    assert total == m["stats"]["n_postings"]
