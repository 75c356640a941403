"""Delete-by-query (the Elasticsearch ``_delete_by_query`` lifecycle
operation — the surgical sibling of the reference's truncate-all,
SURVEY.md §2.1 S7): every turn matching the query is tombstoned via a
delta generation carrying the affected conversations' SURVIVING turns,
so search over base+delete-generation must be RANK-IDENTICAL to a full
rebuild of the corpus minus the matched turns, the matched set must
equal an independent analyzer-side scan, deletes must stack on prior
generations, and compaction must fold the delete away."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from search_engine_ray import analyzer, datagen
from search_engine_ray.config import BuildConfig
from search_engine_ray.pipelines import build, delta
from search_engine_ray.search import SearchEngine


def _matched_rows(files, qtext, scope=None):
    """Independent (analyzer-side, no index) matched-turn set: rows whose
    analyzed lemmas intersect the analyzed query (disjunctive), optional
    role scope — the semantics delete_by_query promises."""
    qset = set(analyzer.analyze_query(qtext))
    out = set()
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text"])
        got = analyzer.analyze_batch(t.column("text"), {})
        doc_idx, lemmas = got[0], got[1]
        hit_docs = {int(d) for d, lem in zip(doc_idx, lemmas) if lem in qset}
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        role = t.column("role").to_pylist()
        for d in hit_docs:
            if scope is None or role[d] == scope:
                out.add((conv[d], int(turn[d])))
    return out


def _filter_corpus(files, out_dir, drop):
    """Corpus copy with the (conv_id, turn_idx) rows in ``drop`` removed."""
    os.makedirs(out_dir, exist_ok=True)
    out_files = []
    for f in files:
        t = pq.read_table(f)
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        keep = pa.array([(c, int(x)) not in drop for c, x in zip(conv, turn)])
        out = os.path.join(out_dir, os.path.basename(f))
        pq.write_table(t.filter(keep), out)
        out_files.append(out)
    return out_files


def _compare_engines(a, b, modes=(("bm25", "blockmax"), ("bm25", "exhaustive"),
                                  ("reference", "blockmax"))):
    for q in datagen.reference_queries():
        for mode, method in modes:
            ra = a.search(q["query_text"], scope=q["scope"], limit=q["k"],
                          mode=mode, method=method)
            rb = b.search(q["query_text"], scope=q["scope"], limit=q["k"],
                          mode=mode, method=method)
            assert ra["result"] == rb["result"], (q["query_id"], mode, method)
            assert ra["count"] == rb["count"], (q["query_id"], mode, method)
            assert ra["data"].equals(rb["data"]), (q["query_id"], mode, method)


@pytest.fixture(scope="module")
def del_env(tmp_path_factory, tiny_corpus, ray_session):
    root = tmp_path_factory.mktemp("delete")
    base_out = str(root / "base")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=base_out, n_partitions=2, concurrency=2
    ))
    # a mid-frequency lemma so the delete is real but conversation-bounded
    qtext = datagen.stem(40)
    matched = _matched_rows(tiny_corpus, qtext)
    assert matched, "fixture query must match something"
    resp = delta.delete_by_query(base_out, qtext)
    assert resp["result"] and resp["generations"] == [1]
    assert resp["deleted"] == len(matched)
    filt_files = _filter_corpus(tiny_corpus, str(root / "filtered"), matched)
    rebuilt_out = str(root / "rebuilt")
    build.build_index(BuildConfig(
        input_paths=filt_files, out_dir=rebuilt_out, n_partitions=2, concurrency=2
    ))
    return {"root": root, "base_out": base_out, "rebuilt_out": rebuilt_out,
            "qtext": qtext, "matched": matched, "filt_files": filt_files}


def test_delete_rank_identical_to_filtered_rebuild(del_env):
    overlay = SearchEngine(del_env["base_out"])
    rebuilt = SearchEngine(del_env["rebuilt_out"])
    assert overlay._has_deltas
    assert overlay.n_docs == rebuilt.n_docs
    assert overlay.avgdl == pytest.approx(rebuilt.avgdl, abs=0.0)
    _compare_engines(overlay, rebuilt)
    # the deleted lemma itself now matches exactly what the filtered
    # corpus still contains (inflected forms of the stem survive only
    # where they lemmatize differently — both engines agree)
    ra = overlay.search(del_env["qtext"], limit=10)
    rb = rebuilt.search(del_env["qtext"], limit=10)
    assert ra["count"] == rb["count"] == 0
    # facets / counts ride the same overlay-folded matching frame
    for q in datagen.reference_queries():
        fa = overlay.facets(q["query_text"], scope=q["scope"])
        fb = rebuilt.facets(q["query_text"], scope=q["scope"])
        assert fa["count"] == fb["count"], q["query_id"]
        assert fa["data"].equals(fb["data"]), q["query_id"]
    # significant_terms folds the delete overlay (tombstone-masked scan
    # + driver re-score of touched lemmas) — identical to the rebuild
    sa = overlay.significant_terms(datagen.stem(0), k=10)
    sb = rebuilt.significant_terms(datagen.stem(0), k=10)
    assert sa["count"] == sb["count"]
    assert sa["data"].equals(sb["data"])


def test_delete_stacks_on_prior_delete(del_env, tiny_corpus):
    """A second delete over conversations already carrying a delete
    generation must start from the CURRENT live turn set (winning
    generation), not the base — result equals one rebuild minus the
    union of both matched sets."""
    qtext2 = datagen.stem(41)
    matched2 = _matched_rows(tiny_corpus, qtext2)
    assert matched2
    resp = delta.delete_by_query(del_env["base_out"], qtext2)
    assert resp["result"]
    # turns already deleted by round 1 cannot be deleted again
    live_matched2 = matched2 - del_env["matched"]
    assert resp["deleted"] == len(live_matched2)
    filt2 = _filter_corpus(
        tiny_corpus, str(del_env["root"] / "filtered2"),
        del_env["matched"] | matched2,
    )
    rebuilt2 = str(del_env["root"] / "rebuilt2")
    build.build_index(BuildConfig(
        input_paths=filt2, out_dir=rebuilt2, n_partitions=2, concurrency=2
    ))
    _compare_engines(SearchEngine(del_env["base_out"]), SearchEngine(rebuilt2))
    del_env["matched2"] = matched2
    del_env["rebuilt2"] = rebuilt2


def test_delete_no_match_is_a_noop(del_env):
    before = len(delta.list_generations(del_env["base_out"]))
    r = delta.delete_by_query(del_env["base_out"], "wqxqzq")  # absent lemma
    assert r["result"] and r["deleted"] == 0 and r["generations"] == []
    r2 = delta.delete_by_query(del_env["base_out"], "")
    assert not r2["result"] and r2["error"] == "empty_query"
    r3 = delta.delete_by_query(del_env["base_out"], datagen.stem(0), scope="nosuchrole")
    assert not r3["result"] and r3["error"] == "bad_scope"
    assert len(delta.list_generations(del_env["base_out"])) == before


def test_delete_compacts_away(del_env):
    """Compaction folds delete generations like any re-index: the
    generation-free index is rank-identical to the filtered rebuild and
    serves the segment-scan surfaces again."""
    from search_engine_ray.pipelines import compact as compact_mod

    r = compact_mod.compact(del_env["base_out"])
    assert r["result"], r
    eng = SearchEngine(del_env["base_out"])
    assert not eng._has_deltas
    _compare_engines(eng, SearchEngine(del_env["rebuilt2"]))
    assert eng.significant_terms(datagen.stem(0))["result"]


def test_scoped_delete_keeps_out_of_scope_turns(tmp_path, tiny_corpus):
    qtext = datagen.stem(42)
    out = str(tmp_path / "scoped")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2
    ))
    matched_user = _matched_rows(tiny_corpus, qtext, scope="user")
    matched_all = _matched_rows(tiny_corpus, qtext)
    assert matched_user and matched_all - matched_user  # both sides populated
    resp = delta.delete_by_query(out, qtext, scope="user")
    assert resp["result"] and resp["deleted"] == len(matched_user)
    filt = _filter_corpus(tiny_corpus, str(tmp_path / "filt"), matched_user)
    rebuilt = str(tmp_path / "rebuilt")
    build.build_index(BuildConfig(
        input_paths=filt, out_dir=rebuilt, n_partitions=2, concurrency=2
    ))
    _compare_engines(SearchEngine(out), SearchEngine(rebuilt))
    # out-of-scope matches still searchable
    r = SearchEngine(out).search(qtext, limit=5)
    assert r["count"] == 0 or all(
        row["role"] != "user" for row in r["data"].to_pylist()
    )
    assert r["count"] > 0


def test_delete_whole_conversation(tmp_path, ray_session):
    """A conversation whose every turn matches disappears entirely: the
    generation carries zero surviving rows for it, corpus stats drop it
    exactly, and phrase/positional queries survive the overlay."""
    files = []
    rows = {
        "conv_id": ["c-a", "c-a", "c-b", "c-b", "c-c"],
        "turn_idx": [0, 1, 0, 1, 0],
        "role": ["user", "assistant", "user", "assistant", "user"],
        "text": [
            "zapruder film zapruder",          # c-a: every turn matches
            "the zapruder archive",
            "ordinary words only here",         # c-b: no match
            "zapruder mentioned once",          # c-b turn 1 matches
            "nothing relevant at all",          # c-c: no match
        ],
        "tool": ["", "", "", "", ""],
        "ts": pa.array([1_700_000_000_000_000 + i * 60_000_000 for i in range(5)],
                       pa.timestamp("us")),
    }
    f = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.table(rows), f)
    files = [f]
    out = str(tmp_path / "idx")
    build.build_index(BuildConfig(
        input_paths=files, out_dir=out, n_partitions=1, concurrency=1
    ))
    resp = delta.delete_by_query(out, "zapruder")
    assert resp["result"] and resp["deleted"] == 3
    eng = SearchEngine(out)
    assert eng.search("zapruder", limit=10)["count"] == 0
    # c-a gone, c-b keeps only turn 0, c-c intact
    r = eng.search("ordinary words", limit=10)
    got = {(x["conv_id"], x["turn_idx"]) for x in r["data"].to_pylist()}
    assert ("c-b", 0) in got
    drop = {("c-a", 0), ("c-a", 1), ("c-b", 1)}
    filt = _filter_corpus(files, str(tmp_path / "filt"), drop)
    rebuilt = str(tmp_path / "rebuilt")
    build.build_index(BuildConfig(
        input_paths=filt, out_dir=rebuilt, n_partitions=1, concurrency=1
    ))
    reng = SearchEngine(rebuilt)
    assert eng.n_docs == reng.n_docs == 2
    assert eng.avgdl == pytest.approx(reng.avgdl, abs=0.0)
    for q in ("ordinary", "nothing relevant", "words"):
        ra, rb = eng.search(q, limit=10), reng.search(q, limit=10)
        assert ra["count"] == rb["count"], q
        assert ra["data"].equals(rb["data"]), q
    pa_, pb_ = eng.search("ordinary words", mode="phrase"), \
        reng.search("ordinary words", mode="phrase")
    assert pa_["count"] == pb_["count"]
    assert pa_["data"].equals(pb_["data"])
    # sig_terms over the overlay: c-a's fully-tombstoned vocabulary must
    # never surface (pure scan-mask path — the conv has NO delta rows),
    # and the fold equals the rebuild exactly
    sa = eng.significant_terms("ordinary", k=10)
    sb = reng.significant_terms("ordinary", k=10)
    assert sa["data"].equals(sb["data"])
    assert "zapruder" not in sa["data"].column("lemma").to_pylist()


def test_delete_after_reindex_uses_fresh_text(del_env, tiny_corpus, tmp_path):
    """Deleting from a conversation that was re-indexed from MODIFIED
    text matches against the modified content (the conv's current text
    source), not the stale base input."""
    out = str(tmp_path / "mixed")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2
    ))
    eng0 = SearchEngine(out)
    conv = eng0.search(datagen.stem(0), limit=1)["data"].column("conv_id")[0].as_py()
    # rewrite the conv: turn 0 gains a unique token, other turns dropped
    mod_dir = str(tmp_path / "mod")
    os.makedirs(mod_dir)
    mod_files = []
    for f in tiny_corpus:
        t = pq.read_table(f)
        mask = pc.equal(t.column("conv_id"), conv)
        others = t.filter(pc.invert(mask))
        mine = t.filter(mask).sort_by("turn_idx")
        if mine.num_rows:
            keep = mine.slice(0, 2)
            keep = keep.set_column(
                keep.schema.get_field_index("text"), "text",
                pa.array(["xylocarp unique marker", "plain second turn"][: keep.num_rows],
                         pa.string()),
            )
            others = pa.concat_tables([others, keep]).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        p = os.path.join(mod_dir, os.path.basename(f))
        pq.write_table(others, p)
        mod_files.append(p)
    assert delta.reindex_conversations(out, [conv], input_paths=mod_files)["result"]
    # 'xylocarp' exists only in the modified text of turn 0
    resp = delta.delete_by_query(out, "xylocarp")
    assert resp["result"] and resp["deleted"] == 1
    eng = SearchEngine(out)
    assert eng.search("xylocarp", limit=5)["count"] == 0
    r = eng.search("plain second turn", limit=5)
    assert any(x["conv_id"] == conv and x["turn_idx"] == 1
               for x in r["data"].to_pylist())
    # rank-identity vs a rebuild of (modified corpus minus the turn)
    filt = _filter_corpus(mod_files, str(tmp_path / "filt"), {(conv, 0)})
    rebuilt = str(tmp_path / "rebuilt")
    build.build_index(BuildConfig(
        input_paths=filt, out_dir=rebuilt, n_partitions=2, concurrency=2
    ))
    _compare_engines(eng, SearchEngine(rebuilt))
