"""HTTP/JSON serving layer — the analog of the reference's REST surface
(``/root/reference/src/main/java/searchengine/controllers/ApiController.java:20-47``)
as a dependency-free stdlib ``http.server`` wrapper over the Python API:

- ``GET /api/search?query=...[&site=<scope>][&offset=N][&limit=N]
  [&mode=bm25|reference|phrase|phrase_prefix|near|prefix|wildcard|regexp|fuzzy|auto][&window=W][&fuzzy=D][&within_first=N]
  [&after=<score>,<conv_id>,<turn_idx>][&snippets=1]
  [&collapse=M][&group=conv][&negative=...&negative_boost=0.5]
  [&decay=origin%3DISO%3Bscale%3DSECONDS[%3Bshape%3D...][%3Brate%3D...]]``
  — ``SearchEngine.search``
  (the reference's ``site`` parameter maps to this engine's ``scope``:
  a role value or ``tool:<name>``; ``collapse=M`` keeps at most M turns
  per conversation; ``group=conv`` ranks conversations by their best
  matching turn via ``SearchEngine.search_conversations``).
- ``GET /api/mlt?conv=<conv_id>&turn=<turn_idx>[&site=<scope>][&limit=N]
  [&max_terms=M]`` — ``SearchEngine.more_like_this``: rank documents
  similar to one turn (its top tf·idf lemmas as a disjunctive BM25
  query, probe excluded).
- ``GET /api/facets?query=...[&site=<scope>][&conjunctive=1][&by=role,tool,day]``
  — ``SearchEngine.facets``: per-role/per-tool matching-doc counts over
  the FULL result set (faceted navigation); ``by=day`` adds the
  per-UTC-calendar-day date histogram.
- ``GET /api/metrics?query=...[&site=<scope>][&conjunctive=1]
  [&exclude=...][&ts_min=&ts_max=][&fields=doc_len,ts]`` —
  ``SearchEngine.metrics``: stats + exact nearest-rank percentiles of
  doc_len / epoch-µs ts over the query's FULL matching set (the ES
  ``stats`` / ``percentiles`` aggregations on a query).
- ``GET /api/cardinality?query=...[&fields=conv,role][&site=][&conjunctive=1]
  [&exclude=][&ts_min=&ts_max=]`` — ``SearchEngine.cardinality``: exact
  distinct-value counts (ES ``cardinality`` aggregation) over the
  matching set; fields conv / role / tool / day / doc_len / ts.
- ``GET /api/disMax?q=<sub1>&q=<sub2>...[&tie=T][&site=<scope>][&offset=N][&limit=N]``
- ``GET /api/tophits?query=...[&by=role|tool][&per_group=M]
  [&site=<scope>][&conjunctive=1][&exclude=...][&ts_min=&ts_max=]`` —
  ``SearchEngine.top_hits``: the M best-scoring matching turns per
  role/tool value (the ES ``top_hits`` sub-aggregation under a
  ``terms`` bucket).
- ``GET /api/explain?query=...&conv=<conv_id>&turn=<turn_idx>`` —
  ``SearchEngine.explain``: per-term BM25 score breakdown for ONE
  document (the ES ``_explain`` API); ``total`` is bit-identical to
  ``search()``'s score for that doc.
- ``GET /api/complete?prefix=...[&k=K]`` — ``SearchEngine.complete``:
  completion suggester (suggest-as-you-type) — top-k vocabulary lemmas
  for the prefix, ranked (df DESC, lemma ASC).
- ``GET /api/analyze?text=...`` — ``SearchEngine.analyze``: analysis
  introspection (the ES ``_analyze`` API) — (pos, token, lemma) per
  surviving token of the index's analyzer chain.
- ``GET /api/histogram?query=...[&field=doc_len|ts][&interval=N]
  [&site=<scope>][&conjunctive=1]`` — ``SearchEngine.histogram``:
  fixed-interval numeric bucket counts over the matching set (the ES
  ``histogram`` aggregation).
- ``GET /api/percentileRanks?query=...&values=8,16[&field=]`` — inverse
  percentiles (ES ``percentile_ranks``).
- ``GET /api/rangeAgg?query=...&ranges=<json [[from,to],...]>[&field=]``
  — custom-boundary bucket counts (ES ``range``/``date_range`` agg);
  ``null`` = open side, ``to`` exclusive, all buckets emitted.
- ``GET /api/extendedStats?query=...[&site=]`` — per-field extended stats
- ``GET /api/matrixStats?query=...[&site=]`` — doc_len x ts
  covariance/correlation over the matching set (ES ``matrix_stats``).
- ``GET /api/mget?docs=<json [[conv,turn],...]>`` — batch point fetch
  (ES ``_mget``); misses echo the key with found=false.
- ``GET /api/histogramPipeline?query=...[&field=][&interval=][&window=]`` —
  cumulative_sum / derivative / moving-avg pipeline aggs over the
  gap-filled histogram.
- ``GET /api/filtersAgg?filters=<json>[&query=base][&site=]`` — named
  filter bucket counts (ES ``filters`` agg).
- ``GET /api/adjacencyMatrix?filters=<json>[&site=]`` — filter
  co-occurrence counts (ES ``adjacency_matrix``).
- ``GET /api/didYouMean?query=...[&max_dist=D]`` —
  ``SearchEngine.suggest_query``: whole-query did-you-mean (the ES
  phrase-suggester shape) — per-token best vocabulary suggestion plus
  the joined ``corrected`` query.
- ``GET /api/composite?query=...[&size=N][&after_role=&after_tool=]
  [&site=<scope>][&conjunctive=1]`` — ``SearchEngine.facets_composite``:
  paged (role, tool) pair buckets of the matching set in composite key
  order (the ES ``composite`` aggregation); ``after_key`` resumes.
- ``GET /api/export?query=...&dest=<dir>[&site=<scope>][&conjunctive=1]
  [&exclude=...][&ts_min=&ts_max=]`` — ``SearchEngine.export``: stream
  every matching turn to partitioned Parquet under ``dest`` (the ES
  scroll + reindex shape; a distributed Ray Data broadcast-semi-join
  scan of the generation-correct text sources).
- ``GET /api/termvectors?conv=<conv_id>&turn=<turn_idx>`` —
  ``SearchEngine.termvectors``: per-document term statistics (the ES
  ``_termvectors`` API) — every distinct lemma of the doc's current
  text with tf, corpus df and doc length.
- ``GET /api/rankEval?query=...[&site=<scope>][&k=K]`` —
  ``SearchEngine.rank_eval``: the served top-k page scored against the
  deterministic pseudo-assessor grading of the matching set (the ES
  ``_rank_eval`` API) — integer metric cores plus P/R/MRR.
- ``GET /api/significant?query=...[&site=<scope>][&conjunctive=1]
  [&exclude=...][&ts_min=&ts_max=][&limit=K]`` —
  ``SearchEngine.significant_terms``: lemmas most overrepresented in the
  query's matching set vs the corpus background (JLH score; the fg scan
  is a Ray Data job over the index segments; Ray auto-initialises in the
  serving process on first use).
- ``GET /api/rareTerms?query=...[&site=<scope>][&conjunctive=1]
  [&max_doc_count=N][&limit=K]`` — ``SearchEngine.rare_terms``: the
  matching set's long-tail lemmas with global df <= N, ranked df ASC
  (the ES ``rare_terms`` bucket; same distributed scan as
  /api/significant).
- ``GET /api/statistics`` — :func:`search_engine_ray.stats.statistics`.
- ``POST /api/msearch`` (JSON array body of search-request dicts) —
  ``SearchEngine.msearch``: the ES ``_msearch`` batch surface; one
  standard response per request, line-level errors in place.
- ``POST /api/indexPage?conv=<conv_id>`` — incremental re-index
  (``pipelines/delta.reindex_conversations``); the served engine reloads
  on success so the new generation is visible to the next query.
- ``POST /api/updateByQuery?query=...&pattern=...&replacement=...
  [&site=<scope>][&conjunctive=1]`` — update-by-query
  (``pipelines/delta.update_by_query``; ES ``_update_by_query`` parity):
  every matching turn's text is regex-rewritten via a delta generation
  whose stored ``source.parquet`` becomes the convs' text source; the
  served engine reloads on success.
- ``POST /api/deleteByQuery?query=...[&site=<scope>][&conjunctive=1]``
  — delete-by-query (``pipelines/delta.delete_by_query``; the ES
  ``_delete_by_query`` parity op): every matching turn is tombstoned via
  a delta generation and the served engine reloads on success; the next
  compaction folds the delete into the base.
- ``GET /api/stopIndexing`` — cooperative build cancel: writes the stop
  flag that a running ``build_index`` on the same out_dir honors between
  batches (``IndexationServiceImpl.java:52-63`` semantics; in-flight
  partitions mark FAILED and the build stays resumable).

``startIndexing`` is deliberately NOT served: a full build is a cluster
job (the ``build`` CLI / ``pipelines.build.build_index``), not something
to fork from a request thread — the reference's in-process crawl thread
(``IndexationServiceImpl.java:38-50``) has no safe analog on Ray.

The server owns no Ray session; ``SearchEngine`` reads parquet footers
and decodes blocks in-process. Handler threads share one engine: its
post-init state is read-mostly (block/decode caches are idempotent
per-key dict inserts, atomic under the GIL), and the engine swap after a
re-index is a single attribute store.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .search import (
    SearchEngine, parse_boosts_arg, parse_kv_arg, parse_synonyms_arg,
)
from .stats import statistics

# Minimal statistics-dashboard + search page (the reference's
# ``templates/index.html`` analog) — dependency-free, served at GET /;
# all data comes from the JSON endpoints below.
_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>ray-transcript-search</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:60rem}
 input,select{padding:.3rem;margin-right:.4rem}
 table{border-collapse:collapse;margin-top:1rem;width:100%}
 td,th{border:1px solid #ccc;padding:.3rem .5rem;text-align:left;font-size:.9rem}
 .stat{display:inline-block;margin-right:2rem}
 b.hl{background:#ffec99}
</style></head><body>
<h1>ray-transcript-search</h1>
<div id="stats">loading statistics…</div>
<form id="f">
 <input id="q" size="40" placeholder="query text" autofocus>
 <select id="mode"><option>bm25</option><option>auto</option>
  <option>phrase</option><option>near</option><option>prefix</option>
  <option>fuzzy</option><option>reference</option></select>
 <input id="scope" size="12" placeholder="scope (role / tool:x)">
 <input id="limit" size="3" value="10">
 <button>Search</button>
</form>
<div id="count"></div><table id="res"></table>
<script>
async function loadStats(){
 const s = await (await fetch('/api/statistics')).json();
 const per = Object.entries(s.per_scope).map(([k,v])=>k+': '+v).join(' · ');
 document.getElementById('stats').innerHTML =
  '<span class=stat><b>docs</b> '+s.total.docs+'</span>'+
  '<span class=stat><b>lemmas</b> '+s.total.lemmas+'</span>'+
  '<span class=stat><b>postings</b> '+s.total.postings+'</span>'+
  '<span class=stat><b>generations</b> '+s.delta_generations.length+'</span>'+
  '<div>'+per+'</div>';
}
document.getElementById('f').onsubmit = async (e)=>{
 e.preventDefault();
 const q=encodeURIComponent(document.getElementById('q').value);
 const mode=document.getElementById('mode').value;
 const scope=document.getElementById('scope').value;
 const limit=document.getElementById('limit').value;
 let u=`/api/search?query=${q}&mode=${mode}&limit=${limit}&snippets=1`;
 if(scope) u+=`&site=${encodeURIComponent(scope)}`;
 const r=await (await fetch(u)).json();
 let facetLine='';
 if(r.result && mode==='bm25'){
  let fu=`/api/facets?query=${q}`;
  if(scope) fu+=`&site=${encodeURIComponent(scope)}`;
  const f=await (await fetch(fu)).json();
  if(f.result) facetLine=' — '+(f.data||[]).map(x=>
    `${x.facet}:${x.value||'(none)'} ${x.n_docs}`).join(' · ');
 }
 document.getElementById('count').innerHTML =
   r.result ? r.count+' results'+facetLine+(mode==='bm25'&&r.count>0?
     ` — <a href="#" onclick="return sig('${q}','${encodeURIComponent(scope)}')">significant terms</a>`:'')
   : 'error: '+r.error;
 const rows=(r.data||[]).map(d=>
  `<tr><td>${d.conv_id}/${d.turn_idx}</td><td>${d.role}</td>`+
  `<td>${d.score.toFixed(4)}</td><td>${d.snippet||''}</td>`+
  `<td><a href="#" onclick="return mlt('${d.conv_id}',${d.turn_idx})">similar</a></td></tr>`).join('');
 document.getElementById('res').innerHTML =
  rows?'<tr><th>doc</th><th>role</th><th>score</th><th>snippet</th><th></th></tr>'+rows:'';
};
async function sig(q, scope){
 document.getElementById('count').textContent='computing significant terms…';
 let u=`/api/significant?query=${q}&limit=10`;
 if(scope) u+=`&site=${scope}`;
 const r=await (await fetch(u)).json();
 document.getElementById('count').textContent =
   r.result ? 'terms overrepresented in '+r.count+' matching docs' : 'error: '+r.error;
 const rows=(r.data||[]).map(d=>
  `<tr><td>${d.rank}</td><td>${d.lemma}</td><td>${d.fg_docs}</td>`+
  `<td>${d.bg_docs}</td><td>${d.score.toFixed(4)}</td></tr>`).join('');
 document.getElementById('res').innerHTML =
  rows?'<tr><th>#</th><th>lemma</th><th>fg docs</th><th>bg docs</th><th>JLH</th></tr>'+rows:'';
 return false;
}
async function mlt(conv, turn){
 const r=await (await fetch(`/api/mlt?conv=${encodeURIComponent(conv)}&turn=${turn}&limit=10`)).json();
 document.getElementById('count').textContent =
   r.result ? r.count+' similar to '+conv+'/'+turn : 'error: '+r.error;
 const rows=(r.data||[]).map(d=>
  `<tr><td>${d.conv_id}/${d.turn_idx}</td><td>${d.role}</td>`+
  `<td>${d.score.toFixed(4)}</td><td></td>`+
  `<td><a href="#" onclick="return mlt('${d.conv_id}',${d.turn_idx})">similar</a></td></tr>`).join('');
 document.getElementById('res').innerHTML =
  rows?'<tr><th>doc</th><th>role</th><th>score</th><th></th><th></th></tr>'+rows:'';
 return false;
}
loadStats();
</script></body></html>
"""


def make_server(out_dir: str, host: str = "127.0.0.1", port: int = 8080):
    """Build (without starting) a ThreadingHTTPServer serving ``out_dir``."""
    state = {"engine": SearchEngine(out_dir)}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            # global malformed-parameter net: a garbage ts bound, a
            # wrong-shaped cursor, a non-numeric size must produce a
            # JSON error response, never a crashed connection
            try:
                self._do_get_inner()
            except Exception as e:  # noqa: BLE001 — surface, don't die
                try:
                    self._send(
                        400,
                        {"result": False,
                         "error": f"bad_request: {type(e).__name__}"},
                    )
                except Exception:  # noqa: BLE001 — client went away
                    pass

        def _do_get_inner(self):
            u = urlparse(self.path)
            q = parse_qs(u.query)
            if u.path == "/":
                body = _INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/api/search":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                collapse_s = (q.get("collapse") or [None])[0]
                if (q.get("group") or ["turn"])[0] in ("conv", "conversation"):
                    resp = state["engine"].search_conversations(
                        query,
                        scope=(q.get("site") or q.get("scope") or [None])[0],
                        offset=int((q.get("offset") or ["0"])[0]),
                        limit=int((q.get("limit") or ["10"])[0]),
                    )
                else:
                    resp = state["engine"].search(
                        query,
                        scope=(q.get("site") or q.get("scope") or [None])[0],
                        offset=int((q.get("offset") or ["0"])[0]),
                        limit=int((q.get("limit") or ["10"])[0]),
                        mode=(q.get("mode") or ["bm25"])[0],
                        with_snippets=(
                            "full"
                            if (q.get("snippets") or ["0"])[0] == "full"
                            else (q.get("snippets") or ["0"])[0] in ("1", "true")
                        ),
                        near_window=int((q.get("window") or ["8"])[0]),
                        in_order=(q.get("in_order") or ["0"])[0] in ("1", "true"),
                        within_first=(
                            int((q.get("within_first") or ["0"])[0]) or None
                        ),
                        fuzzy_dist=int((q.get("fuzzy") or ["1"])[0]),
                        exclude=(q.get("exclude") or [None])[0],
                        negative=(q.get("negative") or [None])[0],
                        negative_boost=float(
                            (q.get("negative_boost") or ["0.5"])[0]
                        ),
                        ts_min=(q.get("ts_min") or [None])[0],
                        ts_max=(q.get("ts_max") or [None])[0],
                        collapse=int(collapse_s) if collapse_s else None,
                        order_by=(q.get("order") or ["score"])[0],
                        search_after=(
                            tuple((q.get("after") or [""])[0].split(",", 2))
                            if q.get("after") else None
                        ),
                        synonyms=parse_synonyms_arg(
                            (q.get("synonyms") or [None])[0]
                        ),
                        boosts=parse_boosts_arg(
                            (q.get("boost") or [None])[0]
                        ),
                        decay=parse_kv_arg(
                            (q.get("decay") or [None])[0]
                        ),
                        rescore=parse_kv_arg(
                            (q.get("rescore") or [None])[0]
                        ),
                    )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/mlt":
                conv = (q.get("conv") or [""])[0]
                if not conv:
                    self._send(400, {"result": False, "error": "not_found"})
                    return
                resp = state["engine"].more_like_this(
                    conv,
                    int((q.get("turn") or ["0"])[0]),
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    offset=int((q.get("offset") or ["0"])[0]),
                    limit=int((q.get("limit") or ["10"])[0]),
                    max_terms=int((q.get("max_terms") or ["25"])[0]),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/facets":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].facets(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                    by=(q.get("by") or ["role,tool"])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/metrics":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].metrics(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                    fields=(q.get("fields") or ["doc_len,ts"])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/cardinality":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].cardinality(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                    fields=(q.get("fields") or ["conv"])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/disMax":
                # repeated &q= params are the subqueries
                subs = q.get("q") or []
                try:
                    tb = float((q.get("tie") or ["0.0"])[0])
                except ValueError:
                    self._send(400, {"result": False, "error": "bad_dis_max"})
                    return
                resp = state["engine"].dis_max(
                    subs,
                    tie_breaker=tb,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    offset=int((q.get("offset") or ["0"])[0]),
                    limit=int((q.get("limit") or ["10"])[0]),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/tophits":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].top_hits(
                    query,
                    by=(q.get("by") or ["role"])[0],
                    per_group=int((q.get("per_group") or ["3"])[0]),
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/explain":
                query = (q.get("query") or [""])[0]
                conv = (q.get("conv") or [""])[0]
                if not query or not conv:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].explain(
                    query, conv, int((q.get("turn") or ["0"])[0])
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "total": resp["total"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/complete":
                prefix = (q.get("prefix") or [""])[0]
                resp = state["engine"].complete(
                    prefix, k=int((q.get("k") or ["10"])[0])
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/analyze":
                text = (q.get("text") or [""])[0]
                resp = state["engine"].analyze(text)
                self._send(
                    200,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/histogram":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].histogram(
                    query,
                    field=(q.get("field") or ["doc_len"])[0],
                    interval=int((q.get("interval") or ["10"])[0]),
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/mget":
                import json as _json

                try:
                    docs = _json.loads((q.get("docs") or ["[]"])[0])
                    assert isinstance(docs, list) and docs
                except Exception:
                    self._send(400, {"result": False, "error": "bad_docs"})
                    return
                resp = state["engine"].mget(docs)
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/rangeAgg":
                import json as _json

                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                try:
                    ranges = _json.loads((q.get("ranges") or ["[]"])[0])
                    assert isinstance(ranges, list) and ranges
                except Exception:
                    self._send(400, {"result": False, "error": "bad_ranges"})
                    return
                resp = state["engine"].range_agg(
                    query,
                    ranges,
                    field=(q.get("field") or ["doc_len"])[0],
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/matrixStats":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].matrix_stats(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/extendedStats":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].extended_stats(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/percentileRanks":
                query = (q.get("query") or [""])[0]
                vals = [v for v in (q.get("values") or [""])[0].split(",") if v]
                if not query or not vals:
                    self._send(400, {"result": False, "error": "bad_values"})
                    return
                resp = state["engine"].percentile_ranks(
                    query, vals,
                    field=(q.get("field") or ["doc_len"])[0],
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/histogramPipeline":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].histogram_pipeline(
                    query,
                    field=(q.get("field") or ["doc_len"])[0],
                    interval=int((q.get("interval") or ["10"])[0]),
                    window=int((q.get("window") or ["3"])[0]),
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path in ("/api/filtersAgg", "/api/adjacencyMatrix"):
                import json as _json

                try:
                    flt = _json.loads((q.get("filters") or ["{}"])[0])
                    assert isinstance(flt, dict) and flt
                except Exception:
                    self._send(400, {"result": False, "error": "bad_filters"})
                    return
                scope = (q.get("site") or q.get("scope") or [None])[0]
                conj = (q.get("conjunctive") or ["0"])[0] in ("1", "true")
                if u.path == "/api/filtersAgg":
                    resp = state["engine"].filters_agg(
                        flt, query_text=(q.get("query") or [None])[0],
                        scope=scope, conjunctive=conj,
                    )
                else:
                    resp = state["engine"].adjacency_matrix(
                        flt, scope=scope, conjunctive=conj,
                    )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/didYouMean":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].suggest_query(
                    query, max_dist=int((q.get("max_dist") or ["2"])[0])
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "corrected": resp["corrected"],
                        "changed": resp["changed"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/composite":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                ar = (q.get("after_role") or [None])[0]
                after = (ar, (q.get("after_tool") or [""])[0]) if ar is not None else None
                resp = state["engine"].facets_composite(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    size=int((q.get("size") or ["10"])[0]),
                    after=after,
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "after_key": resp["after_key"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/export":
                query = (q.get("query") or [""])[0]
                dest = (q.get("dest") or [""])[0]
                if not query or not dest:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].export(
                    query, dest,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "path": resp["path"],
                        "error": resp["error"],
                    },
                )
            elif u.path == "/api/termvectors":
                conv = (q.get("conv") or [""])[0]
                if not conv:
                    self._send(400, {"result": False, "error": "not_found"})
                    return
                resp = state["engine"].termvectors(
                    conv, int((q.get("turn") or ["0"])[0])
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/rankEval":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].rank_eval(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    k=int((q.get("k") or ["10"])[0]),
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "precision": resp["precision"],
                        "recall": resp["recall"],
                        "mrr": resp["mrr"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/significant":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].significant_terms(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    k=int((q.get("limit") or ["10"])[0]),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/rareTerms":
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                resp = state["engine"].rare_terms(
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                    k=int((q.get("limit") or ["10"])[0]),
                    max_doc_count=int((q.get("max_doc_count") or ["10"])[0]),
                    exclude=(q.get("exclude") or [None])[0],
                    ts_min=(q.get("ts_min") or [None])[0],
                    ts_max=(q.get("ts_max") or [None])[0],
                )
                self._send(
                    200 if resp["result"] else 400,
                    {
                        "result": resp["result"],
                        "count": resp["count"],
                        "error": resp["error"],
                        "data": resp["data"].to_pylist(),
                    },
                )
            elif u.path == "/api/statistics":
                self._send(200, statistics(out_dir))
            elif u.path == "/api/stopIndexing":
                from .pipelines import build as build_mod

                self._send(200, build_mod.request_stop(out_dir))
            else:
                self._send(404, {"result": False, "error": "unknown_endpoint"})

        def do_POST(self):  # noqa: N802
            try:
                self._do_post_inner()
            except Exception as e:  # noqa: BLE001 — surface, don't die
                try:
                    self._send(
                        400,
                        {"result": False,
                         "error": f"bad_request: {type(e).__name__}"},
                    )
                except Exception:  # noqa: BLE001 — client went away
                    pass

        def _do_post_inner(self):
            u = urlparse(self.path)
            q = parse_qs(u.query)
            if u.path == "/api/msearch":
                # ES POST _msearch parity: JSON array body of request
                # dicts ({"query": ..., plus any search() parameter});
                # line-level errors come back in place, the batch never
                # aborts
                try:
                    n = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(n) or b"[]")
                    assert isinstance(body, list)
                except Exception:
                    self._send(400, {"result": False, "error": "bad_body"})
                    return
                resps = state["engine"].msearch(body)
                self._send(
                    200,
                    {
                        "result": True,
                        "responses": [
                            {
                                "result": r["result"],
                                "count": r["count"],
                                "error": r["error"],
                                "data": r["data"].to_pylist(),
                            }
                            for r in resps
                        ],
                    },
                )
            elif u.path == "/api/indexPage":
                convs = q.get("conv") or []
                if not convs:
                    self._send(400, {"result": False, "error": "missing conv parameter"})
                    return
                from .pipelines import delta as delta_mod

                resp = delta_mod.reindex_conversations(out_dir, convs)
                if resp["result"]:
                    with lock:  # new generation -> reload overlay state
                        state["engine"] = SearchEngine(out_dir)
                self._send(200 if resp["result"] else 400, resp)
            elif u.path == "/api/updateByQuery":
                # ES POST _update_by_query parity: regex-rewrite every
                # matching turn's text (delta generation; compaction folds)
                query = (q.get("query") or [""])[0]
                pattern = (q.get("pattern") or [""])[0]
                if not query or not pattern:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                from .pipelines import delta as delta_mod

                resp = delta_mod.update_by_query(
                    out_dir,
                    query,
                    pattern,
                    (q.get("replacement") or [""])[0],
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                if resp["result"] and resp["generations"]:
                    with lock:  # new generation -> reload overlay state
                        state["engine"] = SearchEngine(out_dir)
                self._send(200 if resp["result"] else 400, resp)
            elif u.path == "/api/deleteByQuery":
                # ES POST _delete_by_query parity: tombstone every turn
                # matching the query (delta generation; compaction folds)
                query = (q.get("query") or [""])[0]
                if not query:
                    self._send(400, {"result": False, "error": "empty_query"})
                    return
                from .pipelines import delta as delta_mod

                resp = delta_mod.delete_by_query(
                    out_dir,
                    query,
                    scope=(q.get("site") or q.get("scope") or [None])[0],
                    conjunctive=(q.get("conjunctive") or ["0"])[0] in ("1", "true"),
                )
                if resp["result"] and resp["generations"]:
                    with lock:  # new generation -> reload overlay state
                        state["engine"] = SearchEngine(out_dir)
                self._send(200 if resp["result"] else 400, resp)
            else:
                self._send(404, {"result": False, "error": "unknown_endpoint"})

    return ThreadingHTTPServer((host, port), Handler)


def serve(out_dir: str, host: str = "127.0.0.1", port: int = 8080) -> None:
    srv = make_server(out_dir, host, port)
    print(json.dumps({"serving": f"http://{host}:{srv.server_address[1]}", "index": out_dir}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
