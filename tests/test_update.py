"""Update-by-query (the ES ``_update_by_query`` lifecycle parity,
pipelines/delta.update_by_query — the retroactive-redaction primitive):
matched turns' text is regex-rewritten, the affected conversations are
re-analyzed from the transformed text, and the transformed slice is
STORED INSIDE the generation as its text source — so search must be
rank-identical to a full rebuild over the rewritten corpus, snippets
must serve rewritten text, updates must stack on deletes (and vice
versa), and compaction must fold the update away."""

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
    qset = set(analyzer.analyze_query(qtext))
    out = set()
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "role", "text"])
        got = analyzer.analyze_batch(t.column("text"), {})
        doc_idx, lemmas = got[0], got[1]
        hit = {int(d) for d, lem in zip(doc_idx, lemmas) if lem in qset}
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        role = t.column("role").to_pylist()
        for d in hit:
            if scope is None or role[d] == scope:
                out.add((conv[d], int(turn[d])))
    return out


def _rewrite_corpus(files, out_dir, matched, pattern, replacement):
    """Corpus copy with matched turns' text regex-rewritten (the
    rebuild-side ground truth, same RE2 kernel)."""
    os.makedirs(out_dir, exist_ok=True)
    out_files = []
    for f in files:
        t = pq.read_table(f)
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        mask = pa.array(
            [(c, int(x)) in matched for c, x in zip(conv, turn)]
        )
        orig = t.column("text").combine_chunks()
        rewritten = pc.replace_substring_regex(
            pc.fill_null(orig, ""), pattern, replacement
        )
        t = t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.if_else(mask, rewritten, orig),
        )
        out = os.path.join(out_dir, os.path.basename(f))
        pq.write_table(t, out)
        out_files.append(out)
    return out_files


def _compare_engines(a, b):
    for q in datagen.reference_queries():
        for mode, method in (("bm25", "blockmax"), ("bm25", "exhaustive")):
            ra = a.search(q["query_text"], scope=q["scope"], limit=q["k"],
                          mode=mode, method=method)
            rb = b.search(q["query_text"], scope=q["scope"], limit=q["k"],
                          mode=mode, method=method)
            assert ra["count"] == rb["count"], (q["query_id"], mode, method)
            assert ra["data"].equals(rb["data"]), (q["query_id"], mode, method)


@pytest.fixture(scope="module")
def upd_env(tmp_path_factory, tiny_corpus, ray_session):
    root = tmp_path_factory.mktemp("update")
    base_out = str(root / "base")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=base_out, n_partitions=2, concurrency=2
    ))
    s = datagen.stem(45)
    pattern, repl = r"(?i)\b" + s + r"\w*", "xrewrittentok"
    matched = _matched_rows(tiny_corpus, s)
    assert matched
    resp = delta.update_by_query(base_out, s, pattern, repl)
    assert resp["result"] and resp["generations"] == [1]
    assert resp["updated"] == len(matched)
    rw_files = _rewrite_corpus(tiny_corpus, str(root / "rewritten"),
                               matched, pattern, repl)
    rebuilt_out = str(root / "rebuilt")
    build.build_index(BuildConfig(
        input_paths=rw_files, out_dir=rebuilt_out, n_partitions=2, concurrency=2
    ))
    return {"root": root, "base_out": base_out, "rebuilt_out": rebuilt_out,
            "stem": s, "pattern": pattern, "repl": repl, "matched": matched,
            "rw_files": rw_files}


def test_update_rank_identical_to_rewritten_rebuild(upd_env):
    overlay = SearchEngine(upd_env["base_out"])
    rebuilt = SearchEngine(upd_env["rebuilt_out"])
    assert overlay._has_deltas
    assert overlay.n_docs == rebuilt.n_docs  # update never drops turns
    assert overlay.avgdl == pytest.approx(rebuilt.avgdl, abs=0.0)
    _compare_engines(overlay, rebuilt)
    # the rewritten-away stem matches nothing; the fresh token matches
    assert overlay.search(upd_env["stem"], limit=1)["count"] == \
        rebuilt.search(upd_env["stem"], limit=1)["count"] == 0
    ra = overlay.search("xrewrittentok", limit=10)
    rb = rebuilt.search("xrewrittentok", limit=10)
    assert ra["count"] == rb["count"] > 0
    assert ra["data"].equals(rb["data"])


def test_update_snippets_serve_rewritten_text(upd_env):
    overlay = SearchEngine(upd_env["base_out"])
    r = overlay.search("xrewrittentok", limit=5, with_snippets=True)
    assert r["count"] > 0
    for row in r["data"].to_pylist():
        assert "xrewrittentok" in row["snippet"].replace("<b>", "").replace("</b>", "")


def test_update_stacks_with_delete_and_compacts(upd_env, tiny_corpus):
    """A delete stacking on the update starts from the REWRITTEN text
    (the stored generation source); compaction folds both."""
    from search_engine_ray.pipelines import compact as compact_mod

    out = upd_env["base_out"]
    # delete the rewritten token: exactly the updated turns disappear
    resp = delta.delete_by_query(out, "xrewrittentok")
    assert resp["result"] and resp["deleted"] == len(upd_env["matched"])
    eng = SearchEngine(out)
    assert eng.search("xrewrittentok", limit=1)["count"] == 0
    # ground truth: rewritten corpus minus the matched turns
    drop = upd_env["matched"]
    filt_dir = str(upd_env["root"] / "filt")
    os.makedirs(filt_dir, exist_ok=True)
    filt = []
    for f in upd_env["rw_files"]:
        t = pq.read_table(f)
        conv = t.column("conv_id").to_pylist()
        turn = t.column("turn_idx").to_pylist()
        keep = pa.array([(c, int(x)) not in drop for c, x in zip(conv, turn)])
        p = os.path.join(filt_dir, os.path.basename(f))
        pq.write_table(t.filter(keep), p)
        filt.append(p)
    rebuilt2 = str(upd_env["root"] / "rebuilt2")
    build.build_index(BuildConfig(
        input_paths=filt, out_dir=rebuilt2, n_partitions=2, concurrency=2
    ))
    _compare_engines(eng, SearchEngine(rebuilt2))
    r = compact_mod.compact(out)
    assert r["result"], r
    eng2 = SearchEngine(out)
    assert not eng2._has_deltas
    _compare_engines(eng2, SearchEngine(rebuilt2))


def test_update_snippets_survive_compaction(tmp_path, tiny_corpus, ray_session):
    """Regression: update_by_query stores its transformed slice INSIDE
    the generation (gen-xxxx/source.parquet); compaction deletes the
    delta dir, so the source must be persisted into <out>/sources/ and
    text_overrides repointed — otherwise every post-compaction snippet
    of an updated turn raises FileNotFoundError."""
    from search_engine_ray.pipelines import compact as compact_mod

    out = str(tmp_path / "idx")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2
    ))
    s = datagen.stem(45)
    resp = delta.update_by_query(out, s, r"(?i)\b" + s + r"\w*", "xrewrittentok")
    assert resp["result"] and resp["updated"] > 0
    assert compact_mod.compact(out)["result"]
    eng = SearchEngine(out)
    assert not eng._has_deltas
    r = eng.search("xrewrittentok", limit=3, with_snippets=True)
    assert r["count"] > 0
    for row in r["data"].to_pylist():
        assert "xrewrittentok" in row["snippet"].replace("<b>", "").replace("</b>", "")


def test_persisted_sources_survive_repeated_compactions(tmp_path, tiny_corpus, ray_session):
    """Regression: delta generation numbering RESTARTS at gen-0001
    after each compaction, so persisted-source filenames must carry the
    compaction cycle — a bare gen-relative name lets a later fold
    overwrite an earlier conv's source while its carried-forward
    text_override still points there (stale/empty snippets)."""
    from search_engine_ray.pipelines import compact as compact_mod

    out = str(tmp_path / "idx")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2
    ))
    s1, s2 = datagen.stem(45), datagen.stem(46)
    r = delta.update_by_query(out, s1, r"(?i)\b" + s1 + r"\w*", "xfirsttok")
    assert r["result"] and r["updated"] > 0
    assert compact_mod.compact(out)["result"]
    r = delta.update_by_query(out, s2, r"(?i)\b" + s2 + r"\w*", "xsecondtok")
    assert r["result"] and r["updated"] > 0
    res = compact_mod.compact(out)
    assert res["result"] and res.get("aux_rebuilt") is None  # no aux here
    eng = SearchEngine(out)
    for tok in ("xfirsttok", "xsecondtok"):
        hits = eng.search(tok, limit=3, with_snippets=True)
        assert hits["count"] > 0, tok
        for row in hits["data"].to_pylist():
            assert tok in row["snippet"].replace("<b>", "").replace("</b>", ""), tok


def test_update_no_match_and_guards(tmp_path, tiny_corpus):
    out = str(tmp_path / "idx")
    build.build_index(BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2
    ))
    r = delta.update_by_query(out, "wqxqzq", r"x", "y")
    assert r["result"] and r["updated"] == 0 and r["generations"] == []
    r2 = delta.update_by_query(out, "", r"x", "y")
    assert not r2["result"] and r2["error"] == "empty_query"
    r3 = delta.update_by_query(out, datagen.stem(0), r"x", "y", scope="nope")
    assert not r3["result"] and r3["error"] == "bad_scope"
    assert not delta.list_generations(out)
