"""HTTP/JSON serving layer (server.py — the reference ApiController
analog): search, statistics, indexPage (live reload), stopIndexing."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest

from search_engine_ray import datagen
from search_engine_ray.server import make_server


@pytest.fixture(scope="module")
def served(ray_session, tiny_index, tmp_path_factory):
    import shutil

    # serve a COPY: the indexPage test appends a delta generation and
    # must not mutate the session-shared index
    out = str(tmp_path_factory.mktemp("served-idx"))
    shutil.copytree(tiny_index["out_dir"], out, dirs_exist_ok=True)
    srv = make_server(out, port=0)  # ephemeral port
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, out
    srv.shutdown()
    srv.server_close()


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_search_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/search?query={hot}&limit=3&snippets=1")
    assert code == 200 and got["result"] and got["count"] > 0
    assert len(got["data"]) == 3
    assert {"conv_id", "turn_idx", "role", "score", "snippet"} <= set(got["data"][0])
    # boosting query: a demoted result set has the same count
    code, ng = _get(f"{base}/api/search?query={hot}&limit=3"
                    f"&negative={datagen.stem(120)}&negative_boost=0.5")
    assert code == 200 and ng["result"] and ng["count"] == got["count"]
    # scope + phrase mode round-trip the query params
    code, got = _get(f"{base}/api/search?query={hot}+{datagen.stem(1)}&mode=phrase&limit=2")
    assert code == 200 and got["result"] and got["count"] > 0
    # fuzzy mode + edit budget round-trip (deletion typo of a mid stem)
    typo = datagen.stem(4000)[:-1]
    code, got = _get(f"{base}/api/search?query={typo}&mode=fuzzy&fuzzy=1&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    # wildcard mode round-trips (the metachars are URL-safe enough for
    # a bare query param: * is unreserved, ? only terminates the PATH)
    code, got = _get(f"{base}/api/search?query={hot[:4]}*&mode=wildcard&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    # regexp mode round-trips (class brackets URL-encoded)
    code, got = _get(
        f"{base}/api/search?query={hot[:4]}%5Ba-z%5D%2B&mode=regexp&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    # function-score decay round-trips (the ; and = are URL-encoded)
    dec = "origin%3D2026-01-02T00%3A00%3A00%3Bscale%3D86400%3Bshape%3Dexp"
    code, got = _get(f"{base}/api/search?query={hot}&limit=3&decay={dec}")
    assert code == 200 and got["result"] and got["count"] > 0
    # two-phase rescore round-trips
    rsq = f"query%3D{hot}%20{datagen.stem(1)}%3Bwindow%3D50"
    code, got = _get(f"{base}/api/search?query={hot}&limit=3&rescore={rsq}")
    assert code == 200 and got["result"] and got["count"] > 0
    # ordered proximity round-trips &in_order=1
    code, got = _get(f"{base}/api/search?query={hot}+{datagen.stem(1)}"
                     f"&mode=near&window=4&in_order=1&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    # cursor pagination round-trips &after=score,conv,turn == offset page 2
    code, p1 = _get(f"{base}/api/search?query={hot}&limit=3")
    lastrow = p1["data"][-1]
    after = f"{lastrow['score']!r},{lastrow['conv_id']},{lastrow['turn_idx']}"
    code, got = _get(f"{base}/api/search?query={hot}&limit=3&after={after}")
    code, off = _get(f"{base}/api/search?query={hot}&limit=3&offset=3")
    assert code == 200 and got["result"]
    assert [(r["conv_id"], r["turn_idx"]) for r in got["data"]] == [
        (r["conv_id"], r["turn_idx"]) for r in off["data"]
    ]
    # more-like-this endpoint: probe excluded, standard result shape
    probe = got["data"][0] if got["data"] else p1["data"][0]
    code, ml = _get(f"{base}/api/mlt?conv={probe['conv_id']}&turn={probe['turn_idx']}&limit=3")
    assert code == 200 and ml["result"] and ml["count"] > 0
    assert all(
        (r["conv_id"], r["turn_idx"]) != (probe["conv_id"], probe["turn_idx"])
        for r in ml["data"]
    )
    # synonym expansion round-trips &synonyms= (absent term rescued)
    code, sy = _get(
        f"{base}/api/search?query=wqxqzq&limit=3&synonyms=wqxqzq%3D{hot}"
    )
    assert code == 200 and sy["result"] and sy["count"] == p1["count"]
    # field collapsing caps per-conversation rows
    code, got = _get(f"{base}/api/search?query={hot}&collapse=1&limit=50")
    assert code == 200 and got["result"]
    convs = [r["conv_id"] for r in got["data"]]
    assert len(convs) == len(set(convs))
    # conversation grouping returns the conv-level schema
    code, got = _get(f"{base}/api/search?query={hot}&group=conv&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    assert {"conv_id", "n_turns", "best_turn_idx", "score"} <= set(got["data"][0])


def test_search_endpoint_bad_scope(served):
    base, _ = served
    try:
        urllib.request.urlopen(f"{base}/api/search?query={datagen.stem(0)}&site=nope")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "bad_scope"


def test_statistics_endpoint(served):
    base, _ = served
    code, got = _get(f"{base}/api/statistics")
    assert code == 200
    assert got["total"]["docs"] > 0 and got["per_scope"]


def test_significant_endpoint(served):
    """Significant-terms over live HTTP: standard row shape, query
    lemma excluded, count == the facets matching frame (the surface is
    overlay-aware, so later lifecycle tests don't disturb it)."""
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/significant?query={hot}&limit=5")
    assert code == 200 and got["result"] and got["count"] > 0
    assert got["data"] and len(got["data"]) <= 5
    assert {"rank", "lemma", "fg_docs", "bg_docs", "score"} <= set(got["data"][0])
    code, fc = _get(f"{base}/api/facets?query={hot}")
    assert got["count"] == fc["count"]
    # rare-terms endpoint: same matching frame, all bg under the ceiling
    code, rt = _get(f"{base}/api/rareTerms?query={hot}&max_doc_count=20&limit=5")
    assert code == 200 and rt["result"] and rt["count"] == fc["count"]
    assert all(x["bg_docs"] <= 20 for x in rt["data"])
    # msearch: JSON-array POST body, line-level errors in place
    body = json.dumps([
        {"query": hot, "limit": 2},
        {"nope": 1},
    ]).encode()
    req = urllib.request.Request(
        f"{base}/api/msearch", data=body, method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        ms = json.loads(r.read())
    assert ms["result"] and len(ms["responses"]) == 2
    assert ms["responses"][0]["count"] == fc["count"]
    assert ms["responses"][1]["error"] == "bad_request"


def test_stop_indexing_endpoint(served):
    import os

    base, out = served
    code, got = _get(f"{base}/api/stopIndexing")
    assert code == 200 and got["result"]
    from search_engine_ray.pipelines import build

    assert os.path.exists(build.stop_flag_path(out))
    build.clear_stop(out)


def test_index_page_endpoint_reloads_engine(served):
    base, out = served
    # re-index an existing conversation from the build's own inputs
    conv = "conv-00000000"
    req = urllib.request.Request(f"{base}/api/indexPage?conv={conv}", method="POST")
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got["result"] and got["generation"] >= 1
    # served engine reloaded: statistics shows the generation
    _, st = _get(f"{base}/api/statistics")
    assert any(g["conv_ids"] == [conv] for g in st["delta_generations"])
    # unknown conv -> 400, reference-style error body
    req = urllib.request.Request(f"{base}/api/indexPage?conv=conv-zzz", method="POST")
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "rebuild" in json.loads(e.read())["error"]


def test_dashboard_page(served):
    """GET / serves the statistics-dashboard + search page (the
    reference templates/index.html analog)."""
    base, _ = served
    with urllib.request.urlopen(f"{base}/") as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        body = r.read().decode()
    assert "ray-transcript-search" in body and "/api/search" in body


def test_facets_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/facets?query={hot}")
    assert code == 200 and got["result"] and got["count"] > 0
    assert {"facet", "value", "n_docs"} <= set(got["data"][0])
    role_total = sum(r["n_docs"] for r in got["data"] if r["facet"] == "role")
    assert role_total == got["count"]
    code2, scoped = _get(f"{base}/api/facets?query={hot}&site=user")
    assert code2 == 200 and scoped["count"] <= got["count"]


def test_metrics_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/metrics?query={hot}")
    assert code == 200 and got["result"] and got["count"] > 0
    assert {x["field"] for x in got["data"]} == {"doc_len", "ts"}
    row = next(x for x in got["data"] if x["field"] == "ts")
    assert row["v_min"] <= row["p50"] <= row["p99"] <= row["v_max"]
    code, fc = _get(f"{base}/api/facets?query={hot}")
    assert got["count"] == fc["count"]


def test_cardinality_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/cardinality?query={hot}&fields=conv,tool")
    assert code == 200 and got["result"] and got["count"] > 0
    assert [x["field"] for x in got["data"]] == ["conv", "tool"]
    assert all(0 < x["n_distinct"] <= got["count"] for x in got["data"])
    try:
        _get(f"{base}/api/cardinality?query={hot}&fields=nope")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_explain_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, sr = _get(f"{base}/api/search?query={hot}&limit=1")
    assert code == 200 and sr["data"]
    conv, turn = sr["data"][0]["conv_id"], sr["data"][0]["turn_idx"]
    code, got = _get(f"{base}/api/explain?query={hot}&conv={conv}&turn={turn}")
    assert code == 200 and got["result"] and got["count"] == 1
    assert got["total"] == sr["data"][0]["score"]
    assert {"lemma", "df", "tf", "dl", "idf", "weight"} <= set(got["data"][0])
    try:
        _get(f"{base}/api/explain?query={hot}&conv=nope&turn=0")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "not_found"


def test_complete_endpoint(served):
    base, _ = served
    pre = datagen.stem(0)[:4]
    code, got = _get(f"{base}/api/complete?prefix={pre}&k=5")
    assert code == 200 and got["result"] and got["data"]
    assert all(x["lemma"].startswith(pre) for x in got["data"])
    try:
        _get(f"{base}/api/complete?prefix=w")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_analyze_endpoint(served):
    base, _ = served
    code, got = _get(f"{base}/api/analyze?text=The%20Quick%20FOXES%20ran!")
    assert code == 200 and got["result"] and got["count"] == 3
    assert [x["lemma"] for x in got["data"]] == ["quick", "fox", "ran"]


def test_histogram_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/histogram?query={hot}&interval=16")
    assert code == 200 and got["result"] and got["count"] > 0
    assert sum(x["n_docs"] for x in got["data"]) == got["count"]
    assert all(x["bucket"] % 16 == 0 for x in got["data"])


def test_filter_agg_endpoints(served):
    base, _ = served
    import json as _json
    from urllib.parse import quote

    hot, other = datagen.stem(0), datagen.stem(1)
    flt = quote(_json.dumps({"h": hot, "o": other, "n": "wqxqzq"}))
    code, got = _get(f"{base}/api/filtersAgg?filters={flt}")
    assert code == 200 and got["result"]
    d = {x["key"]: x["n_docs"] for x in got["data"]}
    assert set(d) == {"h", "o", "n"} and d["n"] == 0 and d["h"] > 0
    code, got = _get(f"{base}/api/adjacencyMatrix?filters={flt}")
    assert code == 200 and got["result"]
    keys = {x["key"] for x in got["data"]}
    assert "h&o" in keys and "n" not in keys  # zero buckets omitted
    code, got = _get(
        f"{base}/api/histogramPipeline?query={hot}&interval=8&window=3")
    assert code == 200 and got["result"]
    assert got["data"][0]["deriv"] is None
    assert got["data"][-1]["cum_docs"] == got["count"]
    code, got = _get(
        f"{base}/api/search?query={hot}&mode=phrase&within_first=4&limit=3")
    assert code == 200 and got["result"] and got["count"] > 0
    from urllib.parse import quote as _quote

    docs = _quote('[["conv-00000000", 0], ["conv-99999999", 0]]')
    code, got = _get(f"{base}/api/mget?docs={docs}")
    assert code == 200 and got["result"] and got["count"] == 1
    assert got["data"][0]["found"] and not got["data"][1]["found"]
    rngs = _quote('[[null, 12], [12, null]]')
    code, got = _get(f"{base}/api/rangeAgg?query={hot}&ranges={rngs}")
    assert code == 200 and got["result"] and len(got["data"]) == 2
    assert sum(x["n_docs"] for x in got["data"]) == got["count"]
    code, got = _get(f"{base}/api/matrixStats?query={hot}")
    assert code == 200 and got["result"]
    assert got["data"][0]["n_docs"] == got["count"]
    code, got = _get(
        f"{base}/api/percentileRanks?query={hot}&values=0,16,10000")
    assert code == 200 and got["result"]
    assert got["data"][0]["n_le"] == 0
    assert got["data"][-1]["n_le"] == got["count"]
    try:
        _get(f"{base}/api/filtersAgg?filters=notjson")
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert not json.loads(e.read())["result"]


def test_didyoumean_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/didYouMean?query={hot}x%20{datagen.stem(11)}")
    assert code == 200 and got["result"] and got["changed"]
    assert hot in got["corrected"]
    assert {"pos", "token", "suggestion", "df", "dist"} <= set(got["data"][0])


def test_composite_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/composite?query={hot}&size=2")
    assert code == 200 and got["result"] and got["count"] > 0
    assert len(got["data"]) <= 2
    keys = [(x["role"], x["tool"]) for x in got["data"]]
    assert keys == sorted(keys)
    if got["after_key"]:
        ar, at = got["after_key"]
        code, nxt = _get(
            f"{base}/api/composite?query={hot}&size=2&after_role={ar}&after_tool={at}"
        )
        assert code == 200
        nkeys = [(x["role"], x["tool"]) for x in nxt["data"]]
        assert all(k > (ar, at) for k in nkeys)


def test_export_endpoint(served, tmp_path):
    base, _ = served
    hot = datagen.stem(0)
    dest = str(tmp_path / "srv_export")
    code, got = _get(f"{base}/api/export?query={hot}&dest={dest}")
    assert code == 200 and got["result"] and got["count"] > 0
    import pyarrow.dataset as pads
    assert pads.dataset(dest).count_rows() == got["count"]
    try:
        _get(f"{base}/api/export?query={hot}&dest={dest}")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "dest_exists"


def test_termvectors_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, sr = _get(f"{base}/api/search?query={hot}&limit=1")
    conv, turn = sr["data"][0]["conv_id"], sr["data"][0]["turn_idx"]
    code, got = _get(f"{base}/api/termvectors?conv={conv}&turn={turn}")
    assert code == 200 and got["result"] and got["count"] == 1
    assert {"lemma", "tf", "df", "dl"} <= set(got["data"][0])
    assert any(x["lemma"] == hot for x in got["data"])
    try:
        _get(f"{base}/api/termvectors?conv=nope&turn=0")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"] == "not_found"


def test_rank_eval_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/rankEval?query={hot}&k=5")
    assert code == 200 and got["result"] and got["count"] > 0
    row = got["data"][0]
    assert row["k"] == 5 and row["n_hits"] <= 5
    assert got["precision"] == row["n_rel_ret"] / 5
    assert row["gain_top"] <= row["gain_ideal"]
    try:
        _get(f"{base}/api/rankEval?query={hot}&scope=no-such-role")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_tophits_endpoint(served):
    base, _ = served
    hot = datagen.stem(0)
    code, got = _get(f"{base}/api/tophits?query={hot}&per_group=2")
    assert code == 200 and got["result"] and got["count"] > 0
    groups = {x["group"] for x in got["data"]}
    assert groups  # at least one role bucket
    for g in groups:
        ranks = [x["grank"] for x in got["data"] if x["group"] == g]
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 2


def test_update_by_query_endpoint(served):
    """POST /api/updateByQuery (ES _update_by_query parity): matched
    turns' text is regex-rewritten, the old term stops matching, the
    replacement becomes searchable, and the served engine reloads.
    Runs late in the module — it mutates the served index."""
    base, _ = served
    probe = datagen.stem(43)
    _, before = _get(f"{base}/api/search?query={probe}&limit=1")
    assert before["count"] > 0
    pattern = urllib.parse.quote(r"(?i)\b" + probe + r"\w*")
    req = urllib.request.Request(
        f"{base}/api/updateByQuery?query={probe}&pattern={pattern}"
        f"&replacement=xupdhttp", method="POST"
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got["result"] and got["updated"] == before["count"]
    _, after = _get(f"{base}/api/search?query={probe}&limit=1")
    assert after["count"] == 0
    _, neu = _get(f"{base}/api/search?query=xupdhttp&limit=1")
    assert neu["count"] == before["count"]


def test_delete_by_query_endpoint(served):
    """POST /api/deleteByQuery (ES _delete_by_query parity): matching
    turns disappear from search, the served engine reloads, and an
    empty/no-match query degrades gracefully. Runs LAST in the module —
    it tombstones real turns."""
    base, _ = served
    probe = datagen.stem(40)
    _, before = _get(f"{base}/api/search?query={probe}&limit=1")
    assert before["count"] > 0
    req = urllib.request.Request(
        f"{base}/api/deleteByQuery?query={probe}", method="POST"
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got["result"] and got["deleted"] == before["count"]
    assert got["generations"]
    _, after = _get(f"{base}/api/search?query={probe}&limit=1")
    assert after["count"] == 0
    # no-match delete: result true, zero generations, engine untouched
    req = urllib.request.Request(
        f"{base}/api/deleteByQuery?query=wqxqzq", method="POST"
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())
    assert got["result"] and got["deleted"] == 0 and got["generations"] == []
    # empty query -> 400
    req = urllib.request.Request(f"{base}/api/deleteByQuery", method="POST")
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_dis_max_endpoint(served):
    base, _ = served
    hot, second = datagen.stem(0), datagen.stem(1)
    code, got = _get(f"{base}/api/disMax?q={hot}&q={second}&tie=0.3&limit=5")
    assert code == 200 and got["result"] and got["count"] > 0
    assert len(got["data"]) <= 5
    assert {"conv_id", "turn_idx", "score"} <= set(got["data"][0])
    code2, single = _get(f"{base}/api/disMax?q={hot}&limit=5")
    assert code2 == 200 and single["result"]
    for bad_url in (f"{base}/api/disMax?q={hot}&tie=1.5",
                    f"{base}/api/disMax?tie=0.2"):
        try:
            urllib.request.urlopen(bad_url)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["error"] == "bad_dis_max"
