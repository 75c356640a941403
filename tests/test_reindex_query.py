"""Reindex-by-query (the ES _reindex-with-a-query parity op,
pipelines/reindex.py): the extracted index serves the probe set
rank/score-identically to BM25 over the SQL-filtered corpus (the shared
analyzer CTE chain deciding the same membership), the extract is
idempotent and resumable, scope narrows the slice, and the guards
refuse empty queries / empty results."""

import os

import pytest

from search_engine_ray import datagen, oracle
from search_engine_ray.pipelines.reindex import (
    reindex_by_query,
    reindexed_src_sql,
)
from search_engine_ray.search import SearchEngine


@pytest.fixture(scope="module")
def reindexed(ray_session, tiny_corpus, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("reix") / "idx")
    fq = datagen.stem(3)
    r = reindex_by_query(tiny_corpus, fq, dest)
    assert r["result"] and r["n_turns"] > 0
    return {"dest": dest, "fq": fq, "n_turns": r["n_turns"],
            "files": tiny_corpus}


def test_reindexed_matches_filtered_oracle(reindexed, duck):
    src = oracle.transcripts_rel("sf0.001")
    fsrc = reindexed_src_sql(src, reindexed["fq"])
    # slice membership: engine n_turns == SQL membership count
    n_sql = duck.execute(f"SELECT count(*) FROM {fsrc}").fetchone()[0]
    assert n_sql == reindexed["n_turns"]
    qs = datagen.reference_queries()
    exp_rows = duck.execute(oracle.bm25_topk_sql(fsrc, qs)).fetch_arrow_table().to_pylist()
    by_q: dict[str, list] = {}
    for r in exp_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for v in by_q.values():
        v.sort(key=lambda r: r["rank"])
    eng = SearchEngine(reindexed["dest"])
    n_hits = 0
    for q in qs:
        got = eng.search(q["query_text"], scope=q["scope"], limit=q["k"])["data"].to_pylist()
        exp = by_q.get(q["query_id"], [])
        assert len(got) == len(exp), q["query_id"]
        for g, e in zip(got, exp):
            assert (g["conv_id"], g["turn_idx"]) == (e["conv_id"], e["turn_idx"])
            assert abs(round(g["score"], 6) - e["score"]) <= 2e-6
            n_hits += 1
    assert n_hits > 0


def test_reindex_idempotent_and_scoped(reindexed, tmp_path, duck):
    # re-run: slice marker + build manifest skip everything, same counts
    r2 = reindex_by_query(reindexed["files"], reindexed["fq"], reindexed["dest"])
    assert r2["result"] and r2["n_turns"] == reindexed["n_turns"]
    # scoped extract is a strict subset with the scope applied
    dest2 = str(tmp_path / "scoped")
    r3 = reindex_by_query(reindexed["files"], reindexed["fq"], dest2,
                          scope="assistant")
    assert r3["result"] and 0 < r3["n_turns"] < reindexed["n_turns"]
    src = oracle.transcripts_rel("sf0.001")
    fsrc = reindexed_src_sql(src, reindexed["fq"])
    n_sql = duck.execute(
        f"SELECT count(*) FROM {fsrc} WHERE role = 'assistant'"
    ).fetchone()[0]
    assert n_sql == r3["n_turns"]


def test_reindex_guards(reindexed, tmp_path):
    r = reindex_by_query(reindexed["files"], "", str(tmp_path / "e1"))
    assert not r["result"] and r["error"] == "empty_query"
    r = reindex_by_query(reindexed["files"], "wqxqzq", str(tmp_path / "e2"))
    assert not r["result"] and r["error"] == "empty_result"
    with pytest.raises(ValueError):
        reindexed_src_sql("x", "")
