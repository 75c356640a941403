"""Query engine — the analog of ``GET /api/search`` (SURVEY.md §3.2).

Reference flow (``/root/reference/src/main/java/searchengine/services/search/SearchServiceImpl.java:35-101``):
analyze query -> dictionary lookup df-ascending -> candidate retrieval ->
score -> sort desc -> offset/limit. The reference's query-independent
relevance (page Σtf / global max Σtf,
``repositories/IndexRepository.java:14-20``) is kept as the parity scorer
(``mode='reference'``); the default scorer is real BM25 top-k over the
compressed block index with **block-max pruning** (north rule).

Block-max evaluation here is the windowed exact variant of block-max
WAND: docid space is partitioned into windows at every block boundary of
every query term, so each window's full document scores are computable
locally (every posting of a doc falls in exactly one window). Windows
are processed in descending upper-bound order (UB = Σ_t idf_t·(k1+1)·
bmw_block) and evaluation stops at the first window whose UB is strictly
below the current top-k threshold — pruning is lossless: a skipped
window cannot contain a doc scoring ≥ threshold, and ties (UB ==
threshold) are still processed so the deterministic tie-break
(score DESC, docid ASC) == (score DESC, conv_id ASC, turn_idx ASC) holds
exactly. Skip pointers = the per-block ``first_docid``/``last_docid``
metadata consumed via ``np.searchsorted``.

Reference semantics preserved:
- any query lemma absent from the dictionary -> empty result
  (``SearchServiceImpl.java:57-64``);
- empty analyzed query -> empty result with an error flag (:45-48);
- scope filter (``role``, the ``site`` analog, :41-44);
- ``mode='reference'`` additionally drops df >= 250 lemmas and
  intersects candidates conjunctively rarest-first (:155-178).

Everything in this module is driver-side: the index is partition-pruned
Parquet (footer min/max on the sorted ``lemma`` column), so a query
reads only the row groups covering its lemmas — no cluster round-trip,
matching the reference's single-request query path.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from . import analyzer
from .config import DEFAULT_PAGE_SIZE, REFERENCE_DF_CUTOFF, TURN_BITS

# reciprocal-rank-fusion constant (order_by='rrf'): the standard k=60
# from Cormack/Clarke/Büttcher (2009), the Elasticsearch default
RRF_K = 60
from .docid import make_docid_attacher, split_docids
from .pipelines import build as build_mod
from .stages.encode import (
    binary_column_buffers,
    decode_block_range,
    decode_poss_range,
    decode_scps_range,
    scope_code_space,
)
from .state.manifest import load_json


def _decode_pos_blobs(blobs, tf: np.ndarray) -> np.ndarray:
    """Flat absolute positions from per-posting delta+varint blobs
    (``tf`` values per blob) — the delta-generation postings side."""
    from .state import codec

    buf = b"".join(b or b"" for b in blobs)
    total = int(tf.sum())
    deltas = codec.varint_decode(buf, total)
    cum = np.cumsum(deltas, dtype=np.uint64).view(np.int64)
    seg = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))[:-1]
    corr = cum[seg] - deltas[seg].astype(np.int64)
    return cum - np.repeat(corr, tf)


_QUOTE_RE = re.compile(r'"([^"]*)"')


def parse_synonyms_arg(s: str | None) -> dict[str, list[str]] | None:
    """CLI/HTTP synonym-mapping syntax: ``key=v1|v2;key2=v3`` ->
    {key: [v1, v2], key2: [v3]}. Empty/None -> None (no expansion)."""
    if not s:
        return None
    out: dict[str, list[str]] = {}
    for part in s.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        key, _, vals = part.partition("=")
        out[key.strip()] = [v.strip() for v in vals.split("|") if v.strip()]
    return out or None


def parse_boosts_arg(s: str | None) -> dict[str, float] | None:
    """CLI/HTTP boost syntax: ``term=2.5;other=0.5`` -> {term: 2.5,
    other: 0.5}. Empty/None -> None (no boosting); unparseable weights
    are kept as strings so ``search`` reports ``bad_boosts`` instead of
    silently dropping them."""
    if not s:
        return None
    out: dict[str, object] = {}
    for part in s.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        key, _, val = part.partition("=")
        try:
            out[key.strip()] = float(val.strip())
        except ValueError:
            out[key.strip()] = val.strip()
    return out or None


def decay_params(decay, ts_us_fn) -> tuple | None:
    """Validate a ``search(decay=...)`` spec and fold its shape constant
    to one float64 — ``(shape, origin_f, c1, off_s)`` — or None when
    malformed (the caller's ``bad_decay``). Shared by the single-index
    engine and the federated fan-out (the constants are GLOBAL, so a
    per-shard multiply merges exactly)."""
    if not isinstance(decay, dict):
        return None
    try:
        origin_us = ts_us_fn(decay["origin"])
        scale_s = float(decay["scale"])
        rate = float(decay.get("rate", 0.5))
        off_s = float(decay.get("offset", 0.0))
        shape = decay.get("shape", "gauss")
    except (KeyError, TypeError, ValueError):
        return None
    if (origin_us is None or not scale_s > 0.0 or not 0.0 < rate < 1.0
            or off_s < 0.0 or shape not in ("gauss", "exp", "linear")):
        return None
    c1 = (-(scale_s * scale_s) / math.log(rate) if shape == "gauss"
          else math.log(rate) / scale_s if shape == "exp"
          else scale_s / (1.0 - rate))
    return (shape, float(origin_us), c1, off_s)


def decay_factor(tss: np.ndarray, decay_t: tuple) -> np.ndarray:
    """The per-doc decay multiplier for epoch-µs timestamps ``tss`` —
    x in SECONDS (float64) with the exact op order the SQL twin
    mirrors: abs(ts_f - origin_f)/1e6, minus offset, clamp, shape."""
    shape, origin_f, c1, off_s = decay_t
    x = np.abs(tss.astype(np.float64) - origin_f) / 1e6
    x = np.maximum(x - off_s, 0.0)
    if shape == "gauss":
        return np.exp(-(x * x) / c1)
    if shape == "exp":
        return np.exp(c1 * x)
    return np.maximum((c1 - x) / c1, 0.0)


def parse_agg_ranges(ranges, field: str, ts_us_fn):
    """Validate/normalize a range-aggregation spec: [(from, to) | {'from':
    , 'to':}] with None = open side, from < to, ts bounds via the shared
    ISO/epoch-µs normalizer. -> list[(lo, hi)] ints-or-None, or None if
    malformed (the caller's ``bad_ranges``). Shared by the single-index
    and federated engines."""
    bounds: list[tuple[int | None, int | None]] = []
    try:
        for r in ranges:
            if isinstance(r, dict):
                r = (r.get("from"), r.get("to"))
            if not isinstance(r, (list, tuple)) or len(r) != 2:
                return None
            lo, hi = (
                None if v is None
                else int(ts_us_fn(v)) if field == "ts"
                else int(v)
                for v in r
            )
            if lo is not None and hi is not None and lo >= hi:
                return None
            bounds.append((lo, hi))
    except (TypeError, ValueError):
        return None
    return bounds


def parse_kv_arg(s: str | None) -> dict | None:
    """CLI/HTTP decay syntax:
    ``origin=2026-01-02T00:00:00;scale=86400;shape=gauss;rate=0.5;offset=0``
    -> the ``search(decay=...)`` dict. Empty/None -> None (no decay);
    values pass through as strings (``search`` validates and reports
    ``bad_decay`` for anything malformed — scale/rate/offset accept
    numeric strings there via ``float()``)."""
    if not s:
        return None
    out: dict[str, str] = {}
    for part in s.split(";"):
        part = part.strip()
        if not part or "=" not in part:
            continue
        key, _, val = part.partition("=")
        out[key.strip()] = val.strip()
    return out or None


def parse_boolean_query(text: str) -> tuple[list[str], str, str]:
    """Search-box boolean syntax -> (quoted phrases, loose-term text,
    NOT-term text). Double-quoted segments are exact-phrase constraints;
    bare tokens prefixed ``-`` are NOT terms; everything else is loose
    disjunctive text. ``-"..."`` (negated phrases) is not supported —
    the minus binds to bare tokens only."""
    phrases = [m.group(1) for m in _QUOTE_RE.finditer(text or "")]
    rest = _QUOTE_RE.sub(" ", text or "").split()
    exclude = " ".join(t[1:] for t in rest if t.startswith("-") and len(t) > 1)
    loose = " ".join(t for t in rest if not (t.startswith("-") and len(t) > 1))
    return phrases, loose, exclude


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein with early exit; returns cap+1 when exceeded.
    Matches DuckDB's ``levenshtein`` (unit insert/delete/substitute)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        ca = a[i - 1]
        cur = [i] + [0] * lb
        lo = cap + 1
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
            if cur[j] < lo:
                lo = cur[j]
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def _lev(a: str, b: str) -> int:
    """Exact unbounded Levenshtein (unit costs) — the dist column's
    contract; DuckDB's ``levenshtein`` is the same DP."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _suggest_scan(tok: str, vocab_items, max_dist: int) -> list[tuple[str, int, int]]:
    """(lemma, df, dist) rows within max_dist of tok — the shared sweep
    of both suggest paths (in-memory dict / distributed parquet scan)."""
    out = []
    lt = len(tok)
    for lemma, df in vocab_items:
        if abs(len(lemma) - lt) > max_dist:
            continue
        d = _levenshtein_capped(tok, lemma, max_dist)
        if d <= max_dist:
            out.append((lemma, int(df), int(d)))
    return out


def _take_pos_groups(pos_flat: np.ndarray, tf: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Segmented gather: select posting-position groups ``idx`` (in that
    order) from a flat position array grouped by per-posting counts
    ``tf``. Pure numpy — the overlay's filter/reorder primitive."""
    starts = np.concatenate(([0], np.cumsum(tf, dtype=np.int64)))[:-1]
    cnt = np.asarray(tf, np.int64)[idx]
    tot = int(cnt.sum())
    out_off = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    within = np.arange(tot, dtype=np.int64) - np.repeat(out_off, cnt)
    return pos_flat[np.repeat(starts[idx], cnt) + within]


def _pair_adjacency(
    di_a: np.ndarray, tf_a: np.ndarray, pos_a: np.ndarray,
    di_b: np.ndarray, tf_b: np.ndarray, pos_b: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact bigram adjacency of two posting lists -> the aux-payload
    triple ``(docids, cnts, starts)``: docs containing lemma A at some
    position p AND lemma B at p+1, with the per-doc start positions.
    Inputs are docid-ascending postings with flat positions (tf values
    per posting) — the shape both the delta overlay and the decoded
    base term share. Vectorized: one docid intersect, one segmented
    gather per side, one key intersect ((doc_idx << 32) | position)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    common = np.intersect1d(di_a, di_b, assume_unique=True)
    if not len(common):
        return empty
    shift = np.int64(1) << np.int64(32)
    ia = np.searchsorted(di_a, common)
    ib = np.searchsorted(di_b, common)
    pa_ = _take_pos_groups(pos_a, tf_a, ia)
    pb_ = _take_pos_groups(pos_b, tf_b, ib)
    tfa = np.asarray(tf_a, np.int64)[ia]
    tfb = np.asarray(tf_b, np.int64)[ib]
    ca = np.repeat(np.arange(len(common), dtype=np.int64), tfa)
    cb = np.repeat(np.arange(len(common), dtype=np.int64), tfb)
    ka = ca * shift + pa_
    okb = pb_ >= 1  # B at position 0 can't follow anything
    kb = cb[okb] * shift + (pb_[okb] - np.int64(1))
    inter = np.intersect1d(ka, kb, assume_unique=True)
    if not len(inter):
        return empty
    uniq, ucnt = np.unique(inter >> np.int64(32), return_counts=True)
    return (
        common[uniq],
        ucnt.astype(np.int64),
        (inter & (shift - np.int64(1))).astype(np.int64),
    )


# registered ranking strategies (protocols.Scorer) — the formal scorer
# extension seam (reference analog: the SearchService interface,
# ``services/search/SearchService.java:5-15``). Built-in modes 'bm25'
# and 'reference' are handled natively; ``search(mode=<name>)``
# dispatches to a registered scorer for any other mode.
SCORERS: dict[str, object] = {}


def register_scorer(name: str):
    """Decorator: register a ``(engine, terms, k, scope, conjunctive) ->
    (ids, scores, count)`` ranking strategy under ``mode=name``."""

    def deco(fn):
        SCORERS[name] = fn
        return fn

    return deco


class SearchEngine:
    """Loaded-once query-side state (the analog of the reference's
    singleton services + cached global scalar, ``SearchServiceImpl.java:25,147-153``
    — but computed at build time and persisted in the manifest)."""

    def __init__(self, out_dir: str, transcripts_paths: list[str] | None = None):
        self.out_dir = out_dir
        jp = os.path.join(out_dir, "compact.journal.json")
        if os.path.exists(jp) and (load_json(jp) or {}).get("state") == "SWAPPING":
            raise RuntimeError(
                f"index at {out_dir} has a half-swapped compaction; run "
                "pipelines.compact.compact(out_dir, resume=True) first"
            )
        m = load_json(build_mod.build_manifest_path(out_dir))
        if not m:
            raise FileNotFoundError(f"no build manifest under {out_dir}")
        self.manifest = m
        # query analysis uses the SAME analyzer module the index was
        # built with (protocols.Analyzer; rank-identity requires it)
        amod = m["config"].get("analyzer_module")
        if amod:
            import importlib

            self._analyzer = importlib.import_module(amod)
        else:
            self._analyzer = analyzer
        # token-level helpers for the expansion surfaces (suggest /
        # prefix / wildcard / fuzzy / analyze): use the BOUND analyzer's
        # exports when present (a custom module folds/normalizes its own
        # way — default-module calls would expand lemmas the index never
        # produced), falling back per attribute to the default module
        self._norm_text = getattr(
            self._analyzer, "normalize_text", analyzer.normalize_text
        )
        self._lemmatize_token = getattr(
            self._analyzer, "lemmatize_token", analyzer.lemmatize_token
        )
        self._stopset = getattr(self._analyzer, "_STOPSET", analyzer._STOPSET)
        self._min_token_len = int(getattr(
            self._analyzer, "MIN_TOKEN_LEN", analyzer.MIN_TOKEN_LEN
        ))
        self.k1: float = m["config"]["k1"]
        self.b: float = m["config"]["b"]
        self.n_docs: int = m["stats"]["n_docs"]
        self.avgdl: float = m["stats"]["avgdl"] or 1.0
        self.transcripts_paths = transcripts_paths or m["config"]["input_paths"]
        # compaction-recorded per-conv text sources (re-indexed convs read
        # snippet text from their generation's inputs even after the
        # generation itself is folded into the base); live delta
        # generations update on top of this in _load_deltas
        self._delta_text_paths: dict[str, list[str]] = dict(
            m.get("text_overrides") or {}
        )
        # the term dictionary (J2): lemma -> df. Preloaded as a dict only
        # while the vocabulary is small; above the threshold each query
        # point-reads its lemmas via row-group stats on the lemma-sorted
        # dictionary parquet (memoized — no vocab-sized driver state at
        # 10^8+ terms).
        if m["stats"].get("n_lemmas", 0) <= self._DF_PRELOAD_MAX_LEMMAS:
            t = pq.read_table(build_mod.lemma_dict_path(out_dir), columns=["lemma", "df"])
            self._df = dict(
                zip(t.column("lemma").to_pylist(), t.column("df").to_pylist())
            )
        else:
            self._df = None
        self._df_point_cache: dict[str, int | None] = {}
        self._index = pads.dataset(build_mod.index_dir(out_dir))
        self._poss_in_schema = "poss" in self._index.schema.names
        self._intervals: list[tuple[int, int, str]] | None = None
        # scope filtering is per-posting: every block carries a scope-code
        # stream (doc-level (role, tool) -> dense code, a pure function of
        # the manifest's roles/tools lists) — no driver-side scope docid
        # list at ANY corpus size. _scope_luts caches scope -> bool LUT.
        self._scope_luts: dict[str, np.ndarray] = {}
        self._extra_pairs: dict[tuple[str, str], int] = {}  # delta-only (role, tool)
        self._block_cache: dict[str, dict] = {}  # lemma -> block arrays
        self._fwd: tuple | None = None  # lazy (docids, role_codes, roles, convs)
        self._ref_max_relevance: float | None = None
        # hot-bigram aux phrase index (pipelines/phrase_aux.py):
        # (lemma_a, lemma_b) -> pair_id for the precomputed adjacency
        # lists; empty when absent or stale (build.json md5 mismatch)
        self._aux_pairs: dict[tuple[str, str], int] = {}
        self._aux_cache: dict[tuple[str, str], tuple] = {}
        # on-demand adjacency cache for hot-hot bigrams OUTSIDE the aux
        # budget: the first worst-case query pays the positions-bound
        # intersection it would pay anyway, the payload (same triple an
        # aux pair stores) is kept in a byte-bounded LRU, and every
        # repeat becomes a point lookup. Per-instance — a new engine
        # (new manifest / new deltas) starts cold, so no explicit
        # invalidation is needed (the _aux_cache convention).
        from collections import OrderedDict as _OD

        self._pair_lru: "dict[tuple[str, str], tuple]" = _OD()
        self._pair_lru_bytes = 0
        try:
            from .pipelines import phrase_aux as _aux_mod

            _am = _aux_mod.load_aux(out_dir)
            if _am:
                self._aux_pairs = {
                    (p["a"], p["b"]): int(p["pair_id"]) for p in _am["pairs"]
                }
        except (OSError, KeyError, ValueError):
            self._aux_pairs = {}
        self._load_deltas()

    # caching pays once the pair's combined postings reach this size
    # (below it the exact path is already fast); byte budget bounds the
    # resident payloads, LRU-evicted. Tests shrink MIN_COST to exercise
    # the path at toy scale.
    PAIR_CACHE_MIN_COST = 200_000
    PAIR_CACHE_MAX_BYTES = 256 << 20

    def _pair_lru_get(self, pr: tuple[str, str]) -> tuple:
        payload = self._pair_lru.pop(pr)
        self._pair_lru[pr] = payload  # move to MRU end
        return payload

    def _pair_cache_put(self, pr: tuple[str, str], payload: tuple) -> None:
        nbytes = sum(int(x.nbytes) for x in payload)
        if nbytes <= self.PAIR_CACHE_MAX_BYTES:
            old = self._pair_lru.pop(pr, None)
            if old is not None:  # re-put: release the displaced bytes
                self._pair_lru_bytes -= sum(int(x.nbytes) for x in old)
            self._pair_lru[pr] = payload
            self._pair_lru_bytes += nbytes
        while self._pair_lru_bytes > self.PAIR_CACHE_MAX_BYTES and self._pair_lru:
            _, old = self._pair_lru.popitem(last=False)
            self._pair_lru_bytes -= sum(int(x.nbytes) for x in old)

    def _build_pair_cache(
        self, a: str, b: str, blocks: dict, data: dict
    ) -> tuple:
        """Full adjacency list of (a, b) from the (possibly overlaid)
        decoded postings — identical payload shape to an aux pair —
        stored in the LRU and returned."""
        docid_a, tf_a, _dl_a, _sc_a = data[a]
        docid_b, tf_b, _dl_b, _sc_b = data[b]
        pos_a = self._term_positions_full(blocks[a], tf_a)
        pos_b = self._term_positions_full(blocks[b], tf_b)
        payload = _pair_adjacency(docid_a, tf_a, pos_a, docid_b, tf_b, pos_b)
        self._pair_cache_put((a, b), payload)
        return payload

    def _aux_pair(self, pr: tuple[str, str]):
        """Decode-once cache of one aux pair's (docids, cnts, starts);
        composed with the delta overlay when generations are live."""
        got = self._aux_cache.get(pr)
        if got is None:
            from .pipelines import phrase_aux as _aux_mod

            got = _aux_mod.read_pair(self.out_dir, self._aux_pairs[pr])
            if self._has_deltas:
                got = self._aux_overlay(pr, got)
            self._aux_cache[pr] = got
        return got

    def _aux_overlay(self, pr: tuple[str, str], payload: tuple) -> tuple:
        """Compose one BASE aux pair list with live delta generations —
        the merge-on-read the posting overlay (``_overlay_delta``) does
        for single terms, applied to a precomputed bigram adjacency:

        1. DROP entries of tombstoned docids. Relying on the candidate
           intersection is NOT enough: a re-indexed conv re-populates
           the SAME docid range with new content, so a stale aux entry
           could collide with a live delta docid and assert adjacency
           the new text no longer has.
        2. APPEND the pair's adjacency computed exactly from the delta
           overlay's pre-decoded positions (``_delta_lemma``) — a doc is
           wholly base- or delta-resident, so adjacency never straddles
           the two, and the delta side is reindexed-conv-sized work.

        Only reached when ``_delta_positions_ok`` (the phrase path's own
        precondition), so both delta lemmas carry positions."""
        d_e, cnts, starts = payload
        if len(d_e):
            keep = self._tomb_keep_mask(d_e)
            if not keep.all():
                starts = _take_pos_groups(starts, cnts, np.flatnonzero(keep))
                d_e, cnts = d_e[keep], cnts[keep]
        da = self._delta_lemma.get(pr[0])
        db = self._delta_lemma.get(pr[1])
        if da is None or db is None or da[4] is None or db[4] is None:
            return d_e, cnts, starts
        d2, c2, s2 = _pair_adjacency(
            da[0], da[1], da[4], db[0], db[1], db[4]
        )
        if not len(d2):
            return d_e, cnts, starts
        # no docid collides between the two parts: delta docs live only
        # inside tombstoned ranges, whose base entries were dropped above
        return (
            np.concatenate([d_e, d2]),
            np.concatenate([cnts, c2]),
            np.concatenate([starts, s2]),
        )

    # ---------------- incremental delta overlay (S4 / SURVEY §3.3) ----

    def _load_deltas(self) -> None:
        """Overlay state for incremental re-index generations (LSM-style
        merge-on-read; see pipelines/delta.py). With no deltas this is a
        no-op and every query path is untouched. With deltas, N / avgdl /
        per-term df are adjusted EXACTLY, stale base postings are masked
        by tombstoned docid ranges, and affected lemmas merge base+delta
        postings at block load — so search over base+delta is
        rank-identical to a full rebuild of the modified corpus."""
        from .pipelines import delta as delta_mod

        gens = delta_mod.list_generations(self.out_dir)
        self._has_deltas = bool(gens)
        if not gens:
            return
        latest: dict[str, dict] = {}
        for g in gens:  # ascending: later generations win per conv
            for cid, rng in zip(g["conv_ids"], g["tombstones"]):
                latest[cid] = {
                    "range": tuple(rng),
                    "dir": g["_dir"],
                    "input_paths": g.get("input_paths"),
                }
        self._delta_text_paths.update(
            {cid: info["input_paths"] for cid, info in latest.items() if info["input_paths"]}
        )
        # per-conv old counts vs the immutable base doc store. Read
        # ONLY the tombstoned docid ranges (the doc store is
        # docid-sorted, so the DNF filter prunes to the touched row
        # groups) — a full docid/doc_len column pull is corpus-sized at
        # 100 TB. Beyond ~1024 ranges the filter expression itself gets
        # expensive; fall back to the full column read (that many live
        # deltas means a compaction is overdue anyway).
        rngs = [info["range"] for info in latest.values()]
        base = pq.read_table(
            build_mod.docs_dir(self.out_dir),
            columns=["docid", "doc_len"],
            **(
                {"filters": [
                    [("docid", ">=", int(lo)), ("docid", "<", int(hi))]
                    for lo, hi in rngs
                ]}
                if 0 < len(rngs) <= 1024
                else {}
            ),
        )
        bdoc = base.column("docid").to_numpy()
        bdl = base.column("doc_len").to_numpy()
        n_eff, len_eff = self.n_docs, int(self.manifest["stats"]["total_len"])
        d_docid, d_tf, d_dl, d_lemma, d_pos = [], [], [], [], []
        # positions survive the overlay only if EVERY generation carries
        # them (a pre-positions generation would leave holes)
        self._delta_positions_ok = bool(self.manifest["stats"].get("positions"))
        dd_docid, dd_role, dd_dl, dd_tool, dd_ts, dd_conv = [], [], [], [], [], []
        for cid, info in latest.items():
            lo, hi = info["range"]
            a, b = np.searchsorted(bdoc, lo), np.searchsorted(bdoc, hi)
            n_eff -= int(b - a)
            len_eff -= int(bdl[a:b].sum())
            docs = pq.read_table(os.path.join(info["dir"], "docs.parquet"))
            dmask = (docs.column("docid").to_numpy() >= lo) & (
                docs.column("docid").to_numpy() < hi
            )
            docs = docs.filter(pa.array(dmask))
            n_eff += docs.num_rows
            len_eff += int(pc.sum(docs.column("doc_len")).as_py() or 0)
            dd_docid.append(docs.column("docid").to_numpy())
            dd_role.extend(docs.column("role").to_pylist())
            dd_dl.append(docs.column("doc_len").to_numpy(zero_copy_only=False))
            dd_tool.extend(docs.column("tool").to_pylist())
            dd_ts.append(
                docs.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
            dd_conv.extend(docs.column("conv_id").to_pylist())
            posts = pq.read_table(os.path.join(info["dir"], "postings.parquet"))
            pmask = (posts.column("docid").to_numpy() >= lo) & (
                posts.column("docid").to_numpy() < hi
            )
            posts = posts.filter(pa.array(pmask))
            d_lemma.extend(posts.column("lemma").to_pylist())
            d_docid.append(posts.column("docid").to_numpy())
            d_tf.append(posts.column("tf").to_numpy(zero_copy_only=False))
            d_dl.append(posts.column("doc_len").to_numpy(zero_copy_only=False))
            if "pos" in posts.column_names and posts.column("pos").null_count == 0:
                d_pos.extend(posts.column("pos").to_pylist())
            else:  # pre-positions or positionless-analyzer generation
                self._delta_positions_ok = False
        ranges = sorted(info["range"] for info in latest.values())
        self._tomb_starts = np.array([r[0] for r in ranges], np.int64)
        self._tomb_ends = np.array([r[1] for r in ranges], np.int64)
        # delta postings grouped per lemma, docid-ascending
        self._delta_lemma: dict[str, tuple] = {}
        if d_lemma:
            lem_arr = np.asarray(d_lemma, dtype=object)
            docid = np.concatenate(d_docid).astype(np.int64)
            tf = np.concatenate(d_tf).astype(np.int64)
            dl = np.concatenate(d_dl).astype(np.int64)
            order = np.lexsort((docid, lem_arr))
            lem_arr, docid, tf, dl = lem_arr[order], docid[order], tf[order], dl[order]
            with_pos = self._delta_positions_ok and len(d_pos) == len(lem_arr)
            pos_blobs = (
                np.asarray(d_pos, dtype=object)[order] if with_pos else None
            )
            bounds = np.flatnonzero(
                np.concatenate(([True], lem_arr[1:] != lem_arr[:-1]))
            )
            for i, s in enumerate(bounds):
                e = bounds[i + 1] if i + 1 < len(bounds) else len(lem_arr)
                pos_flat = (
                    _decode_pos_blobs(pos_blobs[s:e], tf[s:e]) if with_pos else None
                )
                self._delta_lemma[lem_arr[s]] = (docid[s:e], tf[s:e], dl[s:e], pos_flat)
        self._delta_docs = {
            "docid": np.concatenate(dd_docid).astype(np.int64) if dd_docid else np.empty(0, np.int64),
            "role": dd_role,
            "dl": np.concatenate(dd_dl).astype(np.int64) if dd_dl else np.empty(0, np.int64),
            "tool": dd_tool,
            "ts": np.concatenate(dd_ts).astype(np.int64) if dd_ts else np.empty(0, np.int64),
            "conv_id": dd_conv,
        }
        # per-posting scope codes for the delta overlay: delta docs may
        # carry (role, tool) pairs unseen at base-build time — those get
        # codes appended after the base code space (_pair_code), so base
        # block codes never renumber. Delta postings inherit their doc's
        # code via binary search (delta volume is reindexed-conv-sized).
        dd0 = self._delta_docs
        doc_codes = np.fromiter(
            (self._pair_code(r, t) for r, t in zip(dd0["role"], dd0["tool"])),
            np.int64,
            count=len(dd0["role"]),
        )
        dd0["scope_code"] = doc_codes
        if self._delta_lemma:
            order_d = np.argsort(dd0["docid"], kind="stable")
            sorted_ids = dd0["docid"][order_d]
            code_sorted = doc_codes[order_d]
            for lem, (di, tfv, dlv, posf) in list(self._delta_lemma.items()):
                sc = code_sorted[np.searchsorted(sorted_ids, di)]
                self._delta_lemma[lem] = (di, tfv, dlv, sc, posf)
        # exact corpus-stat adjustments + a safe block-max inflation for
        # unaffected lemmas. Their stored bmw used the base avgdl; the
        # weight tf/(tf + k1*(1-b+b*dl/avgdl)) INCREASES when avgdl grows
        # (the dl term shrinks), and (A+x)/(A+y) <= x/y for A >= 0 bounds
        # the growth: w_eff <= w_base * avgdl_eff/avgdl_base. Scaling by
        # that ratio keeps pruning lossless; if avgdl shrank, stored
        # bounds already over-estimate and no inflation is needed.
        avgdl_base = self.avgdl
        self.n_docs = n_eff
        self.avgdl = (len_eff / n_eff) if n_eff else 1.0
        self._bmw_scale = max(1.0, self.avgdl / avgdl_base) if avgdl_base else 1.0

    def _tomb_keep_mask(self, docid: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self._tomb_starts, docid, side="right") - 1
        idxc = np.clip(idx, 0, len(self._tomb_starts) - 1)
        return ~((idx >= 0) & (docid < self._tomb_ends[idxc]))

    def _overlay_delta(self, lem: str) -> None:
        """Merge-on-read for one lemma: mask tombstoned base postings,
        splice in delta postings, rebuild synthetic block metadata with
        the effective avgdl. Untouched lemmas only get the bmw scale."""
        bl = self._block_cache[lem]
        delta = self._delta_lemma.get(lem)
        affected = delta is not None
        if not affected and len(bl["first"]):
            lo, hi = int(bl["first"][0]), int(bl["last"][-1])
            i = np.searchsorted(self._tomb_ends, lo, side="right")
            affected = i < len(self._tomb_starts) and int(self._tomb_starts[i]) <= hi
        if not affected:
            if self._bmw_scale > 1.0:
                bl["bmw"] = bl["bmw"] * self._bmw_scale
            return
        docid, tf, dl, sc = self._decode_term(
            bl, 0, len(bl["first"]), bl.setdefault("chunks", {})
        )
        want_pos = bool(
            self.manifest["stats"].get("positions")
        ) and self._delta_positions_ok and bl.get("poss") is not None
        pos_flat = (
            self._term_positions_full(bl, tf) if want_pos and len(docid) else None
        )
        if len(docid):
            keep = self._tomb_keep_mask(docid)
            if pos_flat is not None:
                pos_flat = _take_pos_groups(pos_flat, tf, np.flatnonzero(keep))
            docid, tf, dl, sc = docid[keep], tf[keep], dl[keep], sc[keep]
        if delta is not None:
            dpos = delta[4]
            cat_tf = np.concatenate([tf, delta[1]])
            if want_pos and dpos is not None:
                cat_pos = np.concatenate([pos_flat if pos_flat is not None else np.empty(0, np.int64), dpos])
            else:
                cat_pos = None
            docid = np.concatenate([docid, delta[0]])
            dl = np.concatenate([dl, delta[2]])
            sc = np.concatenate([sc, delta[3]])
            order = np.argsort(docid, kind="stable")
            if cat_pos is not None:
                pos_flat = _take_pos_groups(cat_pos, cat_tf, order)
            else:
                pos_flat = None
            docid, dl, sc = docid[order], dl[order], sc[order]
            tf = cat_tf[order]
        self._block_cache[lem] = self._synth_blocks(docid, tf, dl, sc, pos_flat)

    def _synth_blocks(
        self,
        docid: np.ndarray,
        tf: np.ndarray,
        dl: np.ndarray,
        sc: np.ndarray,
        pos_flat: np.ndarray | None = None,
    ) -> dict:
        """Block dict equivalent to a freshly-encoded term: synthetic
        skip metadata + pre-decoded chunk cache (no varint payloads;
        ``pos_flat`` = pre-decoded positions, tf values per posting)."""
        bs = int(self.manifest["config"]["block_size"])
        n = len(docid)
        nblk = (n + bs - 1) // bs
        starts = np.arange(nblk, dtype=np.int64) * bs
        ends = np.minimum(starts + bs, n)
        w = tf.astype(np.float64) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl.astype(np.float64) / self.avgdl)
        )
        bmw = np.maximum.reduceat(w, starts) if nblk else np.empty(0, np.float64)
        cum_n = np.concatenate(([0], ends)).astype(np.int64)
        ch = self._DECODE_CHUNK
        chunks = {}
        for ci in range((nblk + ch - 1) // ch):
            a, b = ci * ch, min((ci + 1) * ch, nblk)
            ps, pe = int(cum_n[a]), int(cum_n[b])
            chunks[ci] = (docid[ps:pe], tf[ps:pe], dl[ps:pe], sc[ps:pe])
        return {
            "first": docid[starts] if n else np.empty(0, np.int64),
            "last": docid[ends - 1] if n else np.empty(0, np.int64),
            "n": (ends - starts).astype(np.int32),
            "cum_n": cum_n,
            "bmw": bmw,
            "gaps": None,
            "tfs": None,
            "dls": None,
            "scps": None,
            "poss": None,
            "pos_flat": pos_flat,
            "chunks": chunks,
        }

    # ---------------- planning (J2/T1) --------------------------------

    _DF_PRELOAD_MAX_LEMMAS = 2_000_000

    def _df_of(self, lem: str) -> int | None:
        """df of one lemma (None = absent). Dict hit below the preload
        threshold; pruned parquet point-read (lemma-sorted row-group
        stats) above it, memoized per engine."""
        if self._df is not None:
            return self._df.get(lem)
        if lem in self._df_point_cache:
            return self._df_point_cache[lem]
        t = pq.read_table(
            build_mod.lemma_dict_path(self.out_dir),
            columns=["lemma", "df"],
            filters=[("lemma", "==", lem)],
        )
        got = int(t.column("df")[0].as_py()) if t.num_rows else None
        self._df_point_cache[lem] = got
        return got

    def idf(self, df: int) -> float:
        return math.log1p((self.n_docs - df + 0.5) / (df + 0.5))

    def plan(self, query_text: str) -> tuple[list[tuple[str, int]], str | None]:
        """-> (terms df-ascending then lemma lexical, error_flag)."""
        lemmas = self._analyzer.analyze_query(query_text)
        if not lemmas:
            return [], "empty_query"
        terms = []
        for lem in lemmas:
            df = self._df_of(lem)
            if df is None and self._has_deltas and lem in self._delta_lemma:
                df = 0  # delta-only lemma; exact df resolved below
            if df is None:
                # reference: any missing lemma -> no results
                return [], "no_results"
            terms.append((lem, df))
        if self._has_deltas:
            # exact effective df = merged posting count (base dict df is
            # stale for lemmas touched by tombstones/deltas)
            blocks = self._term_blocks([t[0] for t in terms])
            terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
            if any(df == 0 for _, df in terms):
                return [], "no_results"
        terms.sort(key=lambda t: (t[1], t[0]))
        return terms, None

    # ---------------- posting access (J3, partition-pruned) -----------

    def _file_intervals(self) -> list[tuple[int, int, str]]:
        """(min_lemma_h, max_lemma_h, path) per index file, from parquet
        footer stats — read once (~ms for hundreds of files). The index
        is lemma_h-sorted, so intervals are tight and a term maps to one
        or two files; pyarrow's dataset scan does NOT do this pruning
        (measured: full 64-file scan 140ms vs pruned read 5ms)."""
        if self._intervals is None:
            ivs = []
            for frag in self._index.get_fragments():
                md = frag.metadata
                mn = mx = None
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    idx = next(
                        i for i in range(rg.num_columns)
                        if rg.column(i).path_in_schema == "lemma_h"
                    )
                    s = rg.column(idx).statistics
                    if s is None or s.min is None:
                        mn = None
                        break
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
                if mn is None:  # no stats -> never prune this file
                    ivs.append((-(1 << 63), (1 << 63) - 1, frag.path))
                else:
                    ivs.append((mn, mx, frag.path))
            self._intervals = ivs
        return self._intervals

    _BLOCK_META_COLS = [
        "lemma", "lemma_h", "first_docid", "last_docid", "n", "bmw",
        "block_cf", "block_max_tf", "gaps", "tfs", "dls", "scps",
    ]

    def _term_blocks(
        self, lemmas: list[str], need_positions: bool = False
    ) -> dict[str, dict]:
        # positions load policy: term queries skip the poss column
        # entirely (~25-30% of index bytes); phrase/near queries load it
        # with the term; a delta-overlaid positional engine always loads
        # it (the merge-on-read overlay must fold positions exactly once,
        # at block load)
        load_poss = (
            self._poss_in_schema
            and (
                need_positions
                or (self._has_deltas and bool(self.manifest["stats"].get("positions")))
            )
        )
        missing = [l for l in lemmas if l not in self._block_cache]
        if missing:
            # footer-stats file pruning on the integer cluster key, then
            # row-group filters inside the chosen file(s), exact string
            # match last
            hs = [analyzer.lemma_hash64(l) for l in missing]
            paths = sorted(
                {p for mn, mx, p in self._file_intervals() if any(mn <= h <= mx for h in hs)}
            )
            cols = self._BLOCK_META_COLS + (["poss"] if load_poss else [])
            if paths:
                tbl = pq.read_table(
                    paths,
                    columns=cols,
                    filters=[("lemma_h", "in", hs), ("lemma", "in", missing)],
                )
            else:
                from .stages.encode import INDEX_SCHEMA

                tbl = INDEX_SCHEMA.empty_table().select(cols)
            lem_arr = tbl.column("lemma")
            for lem in missing:
                sub = tbl.filter(pc.equal(lem_arr, lem))
                order = pc.sort_indices(sub.column("first_docid"))
                sub = sub.take(order).combine_chunks()
                n = sub.column("n").to_numpy()
                cf = sub.column("block_cf").to_numpy()
                self._block_cache[lem] = {
                    "first": sub.column("first_docid").to_numpy(),
                    "last": sub.column("last_docid").to_numpy(),
                    "n": n,
                    "cum_n": np.concatenate(([0], np.cumsum(n, dtype=np.int64))),
                    # cumulative per-block POSITION counts (= Σtf): the
                    # slicing key of the poss stream (phrase queries)
                    "cum_cf": np.concatenate(([0], np.cumsum(cf, dtype=np.int64))),
                    "bmw": sub.column("bmw").to_numpy().astype(np.float64),
                    "gaps": binary_column_buffers(sub.column("gaps")),
                    "tfs": binary_column_buffers(sub.column("tfs")),
                    "dls": binary_column_buffers(sub.column("dls")),
                    "scps": binary_column_buffers(sub.column("scps")),
                    "poss": (
                        binary_column_buffers(sub.column("poss"))
                        if "poss" in sub.column_names
                        else None
                    ),
                }
                if self._has_deltas:
                    self._overlay_delta(lem)
        if need_positions:
            self._attach_poss(lemmas)
        return {l: self._block_cache[l] for l in lemmas}

    def _attach_poss(self, lemmas: list[str]) -> None:
        """Upgrade cached block entries loaded WITHOUT the poss column
        (a term query warmed them) — targeted re-read of just
        (lemma, first_docid, poss) for the upgrade set. Synthetic
        overlay entries carry pre-decoded ``pos_flat`` instead."""
        todo = [
            l for l in lemmas
            if self._block_cache[l].get("poss") is None
            and self._block_cache[l].get("pos_flat") is None
            and self._block_cache[l].get("gaps") is not None
            and len(self._block_cache[l]["first"])
        ]
        if not todo or not self._poss_in_schema:
            return
        hs = [analyzer.lemma_hash64(l) for l in todo]
        paths = sorted(
            {p for mn, mx, p in self._file_intervals() if any(mn <= h <= mx for h in hs)}
        )
        tbl = pq.read_table(
            paths,
            columns=["lemma", "first_docid", "poss"],
            filters=[("lemma_h", "in", hs), ("lemma", "in", todo)],
        )
        lem_arr = tbl.column("lemma")
        for lem in todo:
            sub = tbl.filter(pc.equal(lem_arr, lem))
            order = pc.sort_indices(sub.column("first_docid"))
            sub = sub.take(order).combine_chunks()
            self._block_cache[lem]["poss"] = binary_column_buffers(sub.column("poss"))

    _DECODE_CHUNK = 128  # blocks per cached decode unit

    def _decode_term(self, blocks: dict, lo: int, hi: int, cache: dict):
        """Decode blocks lo..hi (exclusive) -> (docid, tf, dl,
        scope_code). Decoding runs in chunk units of ``_DECODE_CHUNK``
        blocks — each chunk is a single vectorized varint pass over a
        contiguous buffer slice — memoized in ``cache`` because the
        windowed block-max path revisits neighbouring blocks."""
        if hi <= lo:
            z = np.empty(0, np.int64)
            return z, z, z, z
        ch = self._DECODE_CHUNK
        cum = blocks["cum_n"]
        nb = len(blocks["n"])
        full_span = lo == 0 and hi >= nb
        if full_span:
            got_full = cache.get("full")
            if got_full is not None:
                return got_full
        out = ([], [], [], [])
        for ci in range(lo // ch, (hi - 1) // ch + 1):
            a, b = ci * ch, min((ci + 1) * ch, nb)
            got = cache.get(ci)
            if got is None:
                got = decode_block_range(
                    blocks["gaps"], blocks["tfs"], blocks["dls"], cum, a, b,
                    scps_buf=blocks["scps"],
                )
                cache[ci] = got
            s, e = max(lo, a), min(hi, b)
            ps, pe = int(cum[s] - cum[a]), int(cum[e] - cum[a])
            for k in range(4):
                out[k].append(got[k][ps:pe])
        if len(out[0]) == 1:
            got = (out[0][0], out[1][0], out[2][0], out[3][0])
        else:
            got = tuple(np.concatenate(o) for o in out)
        if full_span:
            # hot terms are re-decoded whole by every warm query; the
            # concatenation of chunk entries is itself ~0.07s at sf1
            cache["full"] = got
        return got

    def _decode_term_docids(self, blocks: dict, cache: dict) -> np.ndarray:
        """Gaps-only decode of a term's FULL docid list (for counting:
        tf/dl varint passes are skipped — ~3x less decode work). Reuses
        full-decode chunk entries when the scoring path already paid for
        them; caches under ('g', ci) otherwise."""
        from .stages.encode import decode_gaps_range

        cum = blocks["cum_n"]
        nb = len(blocks["n"])
        if nb == 0:
            return np.empty(0, np.int64)
        ch = self._DECODE_CHUNK
        out = []
        for ci in range((nb - 1) // ch + 1):
            a, b = ci * ch, min((ci + 1) * ch, nb)
            full = cache.get(ci)
            if full is not None:
                out.append(full[0])
                continue
            got = cache.get(("g", ci))
            if got is None:
                if blocks["gaps"] is None:  # synthetic delta-overlay blocks
                    got = self._decode_term(blocks, a, b, cache)[0]
                else:
                    got = decode_gaps_range(blocks["gaps"], cum, a, b)
                cache[("g", ci)] = got
            out.append(got)
        return out[0] if len(out) == 1 else np.concatenate(out)

    def _decode_term_docids_sc(self, blocks: dict, cache: dict):
        """(docid, scope_code) full decode for the SCOPED counting path —
        gaps + scps streams only (tf/dl skipped). Chunk-memoized like
        the gaps-only variant; reuses full-decode entries when present."""
        cum = blocks["cum_n"]
        nb = len(blocks["n"])
        if nb == 0:
            z = np.empty(0, np.int64)
            return z, z
        ch = self._DECODE_CHUNK
        out_d, out_s = [], []
        for ci in range((nb - 1) // ch + 1):
            a, b = ci * ch, min((ci + 1) * ch, nb)
            full = cache.get(ci)
            if full is not None:
                out_d.append(full[0])
                out_s.append(full[3])
                continue
            docid = self._decode_term_docids_chunk(blocks, cache, ci, a, b)
            sc = cache.get(("s", ci))
            if sc is None:
                if blocks["scps"] is None:  # synthetic delta-overlay blocks
                    sc = self._decode_term(blocks, a, b, cache)[3]
                else:
                    sc = decode_scps_range(blocks["scps"], cum, a, b)
                cache[("s", ci)] = sc
            out_d.append(docid)
            out_s.append(sc)
        if len(out_d) == 1:
            return out_d[0], out_s[0]
        return np.concatenate(out_d), np.concatenate(out_s)

    def _decode_term_docids_chunk(self, blocks, cache, ci, a, b) -> np.ndarray:
        from .stages.encode import decode_gaps_range

        got = cache.get(("g", ci))
        if got is None:
            if blocks["gaps"] is None:
                got = self._decode_term(blocks, a, b, cache)[0]
            else:
                got = decode_gaps_range(blocks["gaps"], blocks["cum_n"], a, b)
            cache[("g", ci)] = got
        return got

    # ---------------- scope (site-analog) filter ----------------------

    @staticmethod
    def _parse_scope(scope: str) -> tuple[str, str]:
        """'user' -> ('role', 'user'); 'tool:tool-search' -> ('tool',
        'tool-search'). The reference's ``site`` filter maps to role,
        optionally tool (SURVEY §1.2; ``SearchServiceImpl.java:41-44``)."""
        if scope.startswith("tool:"):
            return "tool", scope[len("tool:"):]
        return "role", scope

    def _pair_code(self, role: str | None, tool: str | None) -> int:
        """Dense scope code of a (role, tool) pair: the base formula over
        the manifest's roles/tools lists, or an appended code for pairs
        first seen in a delta generation (base block codes never
        renumber)."""
        roles = self.manifest["stats"].get("roles", [])
        tools = self.manifest["stats"].get("tools", [])
        r, t = role or "", tool or ""
        ri = 0 if r == "" else (roles.index(r) + 1 if r in roles else None)
        ti = 0 if t == "" else (tools.index(t) + 1 if t in tools else None)
        if ri is not None and ti is not None:
            return ri * (len(tools) + 1) + ti
        pair = (r, t)
        c = self._extra_pairs.get(pair)
        if c is None:
            c = scope_code_space(roles, tools) + len(self._extra_pairs)
            self._extra_pairs[pair] = c
        return c

    def _scope_lut(self, scope: str) -> np.ndarray:
        """Scope value -> bool lookup table over the dense scope-code
        space; per-posting filtering is ``lut[scope_codes]``. O(#role x
        #tool values) — independent of corpus size (the 10^12-doc answer
        to the reference's site filter: no scope docid list ever
        materializes)."""
        lut = self._scope_luts.get(scope)
        if lut is None:
            col, value = self._parse_scope(scope)
            roles = self.manifest["stats"].get("roles", [])
            tools = self.manifest["stats"].get("tools", [])
            nt = len(tools) + 1
            base = scope_code_space(roles, tools)
            lut = np.zeros(base + len(self._extra_pairs), bool)
            if col == "role":
                if value in roles:
                    rc = roles.index(value) + 1
                    lut[rc * nt : (rc + 1) * nt] = True
            else:
                if value in tools:
                    tc = tools.index(value) + 1
                    lut[tc:base:nt] = True
            for (r, t), c in self._extra_pairs.items():
                lut[c] = (r == value) if col == "role" else (t == value)
            self._scope_luts[scope] = lut
        return lut

    def valid_scope(self, scope: str | None) -> bool:
        """Scope validity is derived from the BUILT index (manifest
        scope-value lists + any delta additions), never hardcoded — a
        corpus with arbitrary role values stays scopable."""
        if scope is None:
            return True
        col, value = self._parse_scope(scope)
        known = set(self.manifest["stats"].get(col + "s", ()))
        if self._has_deltas:
            known.update(v for v in self._delta_docs[col] if v)
        return value in known

    # ---------------- BM25 scorers ------------------------------------

    def _contributions(self, term_data, lut):
        """Per term (fixed df-asc order): (docid, float64 contribution).
        ``lut`` is the scope bool LUT (or None): per-posting filtering on
        the decoded scope-code stream."""
        k1, b = self.k1, self.b
        for idf, (docid, tf, dl, sc) in term_data:
            if lut is not None:
                keep = lut[sc]
                docid, tf, dl = docid[keep], tf[keep], dl[keep]
            tff = tf.astype(np.float64)
            contrib = idf * (tff * (k1 + 1.0)) / (
                tff + k1 * (1.0 - b + b * dl.astype(np.float64) / self.avgdl)
            )
            yield docid, contrib

    @staticmethod
    def _aggregate(doc_parts, contrib_parts, conjunctive: bool, n_terms: int,
                   min_match: int | None = None):
        """Sum contributions per docid in fixed term order. Stable
        (radix) argsort keeps each doc's contributions in concatenation
        order == term order, and ``np.add.reduceat`` sums them left to
        right — the same deterministic float64 summation order as a
        bincount, at radix-sort speed on int64 keys."""
        if not doc_parts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(doc_parts)
        if not len(ids):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        contribs = np.concatenate(contrib_parts)
        order = np.argsort(ids, kind="stable")
        sids = ids[order]
        sc = contribs[order]
        # group boundaries via bool not_equal (no int64 diff allocation —
        # measured ~3x cheaper on multi-million-row hot unions)
        neq = np.empty(len(sids), bool)
        neq[0] = True
        np.not_equal(sids[1:], sids[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        uniq = sids[starts]
        scores = np.add.reduceat(sc, starts)
        if conjunctive or min_match:
            cnt = np.diff(np.append(starts, len(sids)))
            need = n_terms if conjunctive else int(min_match)
            keep = cnt >= need
            return uniq[keep], scores[keep]
        return uniq, scores

    @staticmethod
    def _topk(ids: np.ndarray, scores: np.ndarray, k: int):
        """Top-k by (score DESC, docid ASC) without sorting the full
        array: an O(n) partition finds the k-th largest score, every doc
        at-or-above it survives (ties included, so the docid tie-break
        stays exact), and only the survivors are lexsorted. On all-hot
        queries the result set is ~n_docs and a full lexsort dominated
        the warm query (~0.5 s at sf1); this is ~10x cheaper."""
        n = len(ids)
        if n <= k:
            sel = np.lexsort((ids, -scores))
            return ids[sel], scores[sel]
        kth = np.partition(scores, n - k)[n - k]
        cand = np.flatnonzero(scores >= kth)
        sel = cand[np.lexsort((ids[cand], -scores[cand]))[:k]]
        return ids[sel], scores[sel]

    @staticmethod
    def _collapse_per_conv(ids: np.ndarray, scores: np.ndarray, m: int):
        """Field collapsing: keep each conversation's top-``m`` turns by
        (score DESC, turn_idx ASC). ``ids`` arrive docid-sorted (the
        exhaustive scorer's output), so conversations are contiguous
        runs — one lexsort re-orders within runs by score, a boundary
        scan numbers each turn's within-conversation rank, survivors
        restore docid order for the downstream top-k tie-break."""
        if not len(ids):
            return ids, scores
        cr = ids >> np.int64(TURN_BITS)
        o = np.lexsort((ids, -scores, cr))
        crs = cr[o]
        neq = np.empty(len(crs), bool)
        neq[0] = True
        np.not_equal(crs[1:], crs[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        occ = np.arange(len(o)) - np.repeat(
            starts, np.diff(np.append(starts, len(o)))
        )
        keep = np.sort(o[occ < m])
        return ids[keep], scores[keep]

    @staticmethod
    def _union_count(parts: list[np.ndarray]) -> int:
        """|union| of docid arrays via radix sort (no quicksort unique)."""
        if not parts:
            return 0
        allv = np.concatenate(parts)
        if not len(allv):
            return 0
        s = np.sort(allv, kind="stable")
        return int(1 + np.count_nonzero(np.diff(s)))

    def score_exhaustive(self, terms, scope=None, conjunctive=False,
                         min_match: int | None = None,
                         boosts: dict | None = None):
        """Brute-force vectorized scorer (the oracle form: decode every
        posting of every query term, fixed-order float64 sums).
        ``min_match`` keeps only docs containing at least that many
        DISTINCT query terms (Lucene minimum-should-match semantics;
        ``conjunctive`` == min_match = n_terms). ``boosts`` is a
        query-time per-lemma multiplicative weight (the Lucene
        ``term^w`` boost): applied as a pre-scaled idf — ONE float64
        multiply per term before any posting work, so a boost of 1.0 is
        an exact no-op (x*1.0 == x bit-for-bit)."""
        blocks = self._term_blocks([t[0] for t in terms])
        lut = self._scope_lut(scope) if scope else None
        term_data = []
        for lem, df in terms:
            bl = blocks[lem]
            idf = self.idf(df)
            if boosts and lem in boosts:
                idf = idf * float(boosts[lem])
            term_data.append((idf, self._decode_term(bl, 0, len(bl["first"]), bl.setdefault("chunks", {}))))
        doc_parts, contrib_parts = [], []
        for docid, contrib in self._contributions(term_data, lut):
            doc_parts.append(docid)
            contrib_parts.append(contrib)
        return self._aggregate(
            doc_parts, contrib_parts, conjunctive, len(terms), min_match=min_match
        )

    _CAND_DRIVER_MAX = 4096  # max Σdf of candidate-driving terms

    def _contrib_at(self, bl: dict, cache: dict, cand: np.ndarray, idf: float):
        """Per-candidate BM25 contribution of ONE term via sparse
        per-block decode: only the blocks whose [first, last] docid range
        contains a candidate are decoded (single-block varint passes —
        no 128-block chunk inflation), then candidates are matched by
        binary search. Returns float64 contributions aligned to ``cand``
        (0.0 where the term is absent — adding 0.0 is a float64 no-op,
        so summation order semantics match the exhaustive scorer)."""
        out = np.zeros(len(cand), np.float64)
        first, last = bl["first"], bl["last"]
        if not len(first):
            return out
        j = np.searchsorted(first, cand, side="right") - 1
        jc = np.clip(j, 0, len(first) - 1)
        valid = (j >= 0) & (last[jc] >= cand)
        if not valid.any():
            return out
        k1, b = self.k1, self.b
        cum = bl["cum_n"]
        for blk in np.unique(jc[valid]):
            if bl["gaps"] is None:  # synthetic delta-overlay blocks
                d, tf, dl, _sc = self._decode_term(bl, int(blk), int(blk) + 1, cache)
            else:
                d, tf, dl, _sc = decode_block_range(
                    bl["gaps"], bl["tfs"], bl["dls"], cum, int(blk), int(blk) + 1
                )
            sel = np.flatnonzero(valid & (jc == blk))
            pos = np.searchsorted(d, cand[sel])
            pos_c = np.clip(pos, 0, len(d) - 1)
            hit = d[pos_c] == cand[sel]
            hs = sel[hit]
            tff = tf[pos_c[hit]].astype(np.float64)
            dlf = dl[pos_c[hit]].astype(np.float64)
            out[hs] = idf * (tff * (k1 + 1.0)) / (
                tff + k1 * (1.0 - b + b * dlf / self.avgdl)
            )
        return out

    def _score_candidate_driven(self, terms, term_list, k, lut, scope):
        """MaxScore-style essential-terms evaluation: when the rare
        (df-ascending prefix) terms' postings fit a small candidate set
        and the remaining terms' summed upper bound cannot reach the
        candidate top-k threshold, every result doc must contain a rare
        term — so scoring the candidates fully (sparse block lookups
        into the hot terms) IS the exact answer, and the hot posting
        lists are never weight-decoded. Returns (ids, scores, count) or
        None when the bound does not separate (windowed evaluation takes
        over). The windowed decomposition cannot prune this query shape:
        a rare term's single block spans nearly the whole docid space,
        so every window's UB includes the rare upper bound."""
        n_drv, cum_df = 0, 0
        for _, df in terms:
            if cum_df + df > self._CAND_DRIVER_MAX:
                break
            cum_df += df
            n_drv += 1
        if n_drv == 0 or n_drv == len(terms):
            return None
        k1 = self.k1
        rest = term_list[n_drv:]
        bound_rest = sum(
            idf * (k1 + 1.0) * float(bl["bmw"].max(initial=0.0)) for idf, bl, _ in rest
        )
        drv_ids = []
        for idf, bl, cache in term_list[:n_drv]:
            if lut is not None:
                docid, sc = self._decode_term_docids_sc(bl, cache)
                docid = docid[lut[sc]]
            else:
                docid = self._decode_term_docids(bl, cache)
            drv_ids.append(docid)
        cand = np.unique(np.concatenate(drv_ids)) if drv_ids else np.empty(0, np.int64)
        if len(cand) < k:
            return None  # top-k could include rest-only docs: no bound
        # full scores at candidates, fixed df-ascending term order
        score = np.zeros(len(cand), np.float64)
        for t, (idf, bl, cache) in enumerate(term_list):
            if t < n_drv:
                contrib = np.zeros(len(cand), np.float64)
                docid, tf, dl, _sc = self._decode_term(bl, 0, len(bl["first"]), cache)
                pos = np.searchsorted(docid, cand)
                pos_c = np.clip(pos, 0, max(len(docid) - 1, 0))
                hit = docid[pos_c] == cand if len(docid) else np.zeros(len(cand), bool)
                tff = tf[pos_c[hit]].astype(np.float64)
                dlf = dl[pos_c[hit]].astype(np.float64)
                contrib[hit] = idf * (tff * (k1 + 1.0)) / (
                    tff + k1 * (1.0 - self.b + self.b * dlf / self.avgdl)
                )
            else:
                contrib = self._contrib_at(bl, cache, cand, idf)
            score += contrib
        sel = np.lexsort((cand, -score))[:k]
        threshold = score[sel][-1]
        if bound_rest >= threshold:
            return None  # a rest-only doc could reach the top-k
        # exact: count = |union| with the hot terms' gaps(+scps) decode
        parts = [cand]
        for _, bl, cache in rest:
            if lut is not None:
                docid, sc = self._decode_term_docids_sc(bl, cache)
                docid = docid[lut[sc]]
            else:
                docid = self._decode_term_docids(bl, cache)
            parts.append(docid)
        return cand[sel], score[sel], self._union_count(parts)

    def score_blockmax(self, terms, k, scope=None, conjunctive=False):
        """Windowed exact block-max evaluation -> (docids, scores, count).

        Returns the top-k by (score DESC, docid ASC) plus the exact match
        count (union of term postings [within scope]).
        """
        blocks = self._term_blocks([t[0] for t in terms])
        lut = self._scope_lut(scope) if scope else None
        k1 = self.k1
        term_list = []
        for lem, df in terms:
            bl = blocks[lem]
            term_list.append((self.idf(df), bl, bl.setdefault("chunks", {})))

        if not conjunctive and len(terms) > 1:
            got = self._score_candidate_driven(terms, term_list, k, lut, scope)
            if got is not None:
                return got

        if len(terms) > 1 and min(df for _, df in terms) >= 0.05 * self.n_docs:
            # every term is hot: every window keeps every term alive with
            # near-uniform UBs, so the windowed evaluation cannot prune
            # (the bail-out would fire after wasting several group scans
            # — measured ~2x the query on two-hot terms). Term-at-a-time
            # exhaustive scoring is the optimal exact plan here and
            # produces identical results.
            ids, scores = self.score_exhaustive(terms, scope, conjunctive)
            n = len(ids)
            ids, scores = self._topk(ids, scores, k)
            return ids, scores, n

        # window boundaries: every block first_docid of every term
        starts = np.unique(np.concatenate([bl["first"] for _, bl, _ in term_list]))
        W = len(starts)
        ends = np.append(starts[1:], np.iinfo(np.int64).max)
        # per-term upper bound per window
        wub = np.zeros(W, np.float64)
        covers = []
        for idf, bl, _ in term_list:
            j = np.searchsorted(bl["first"], starts, side="right") - 1
            j = np.clip(j, 0, len(bl["first"]) - 1)
            alive = (bl["first"][j] <= starts) & (bl["last"][j] >= starts)
            ub = idf * (k1 + 1.0) * bl["bmw"][j]
            wub += np.where(alive, ub, 0.0)
            covers.append((j, alive))

        order = np.argsort(-wub, kind="stable")
        wub_desc = wub[order]  # descending — bail-out estimates below
        top_ids = np.empty(0, np.int64)
        top_scores = np.empty(0, np.float64)
        threshold = -np.inf
        count = 0
        count_ids: list[np.ndarray] = []
        processed_all = True
        # j1 per (term, window): first block index with first_docid >= end
        j1s = [
            np.maximum(covers[t][0] + 1, np.searchsorted(term_list[t][1]["first"], ends))
            for t in range(len(term_list))
        ]
        # windows are evaluated in groups of GROUP (descending UB):
        # per group each term decodes ONE contiguous block span (chunk-
        # memoized) and postings are masked to the union of the group's
        # [start, end) intervals — every posting of a doc falls in
        # exactly one window, so group scores are complete doc scores.
        # Pruning stays lossless: the group is entered only while its
        # best window UB >= threshold, and within a group only windows
        # with UB >= threshold are evaluated (ties still processed, so
        # the (score DESC, docid ASC) tie-break is exact).
        GROUP = 512
        g0 = 0
        while g0 < W:
            grp = order[g0 : g0 + GROUP]
            g0 += GROUP
            if len(top_scores) >= k:
                if wub[grp[0]] < threshold:
                    processed_all = False
                    break
                kept = grp[wub[grp] >= threshold]
                if len(kept) < len(grp):
                    processed_all = False
                grp = kept
                # adaptive bail-out (the WAND worst case: near-uniform
                # UBs across high-df terms -> the threshold prunes
                # almost nothing and every UB-ordered group re-scans
                # nearly the full decoded span). Expected pruning is a
                # binary search away because windows are UB-desc sorted:
                # `alive` = remaining windows the threshold cannot skip.
                # Term-at-a-time exhaustive scoring is strictly cheaper
                # when almost everything stays alive, and produces
                # identical results (the window decomposition is exact,
                # so full scores match window-sum scores).
                remaining = W - g0
                alive = (
                    int(np.searchsorted(-wub_desc, -threshold, side="right")) - g0
                )
                if remaining > GROUP and alive > 0.9 * remaining:
                    ids, scores = self.score_exhaustive(terms, scope, conjunctive)
                    n = len(ids)
                    ids, scores = self._topk(ids, scores, k)
                    return ids, scores, n
            s_arr, e_arr = starts[grp], ends[grp]
            o2 = np.argsort(s_arr)
            s_sorted, e_sorted = s_arr[o2], e_arr[o2]
            term_data = []
            for t, ((idf, bl, cache), (jarr, alive)) in enumerate(zip(term_list, covers)):
                aw = alive[grp]
                if not aw.any():
                    continue
                j0 = int(jarr[grp][aw].min())
                j1 = int(j1s[t][grp][aw].max())
                docid, tf, dl, sc = self._decode_term(bl, j0, j1, cache)
                # mask to the union of the group's windows
                idx = np.searchsorted(s_sorted, docid, side="right") - 1
                idx_c = np.clip(idx, 0, len(s_sorted) - 1)
                m = (idx >= 0) & (docid < e_sorted[idx_c])
                term_data.append((idf, (docid[m], tf[m], dl[m], sc[m])))
            doc_parts, contrib_parts = [], []
            for docid, contrib in self._contributions(term_data, lut):
                doc_parts.append(docid)
                contrib_parts.append(contrib)
            ids, scores = self._aggregate(
                doc_parts, contrib_parts, conjunctive, len(terms)
            )
            count_ids.append(ids)
            # merge into running top-k with (score DESC, docid ASC)
            all_ids = np.concatenate([top_ids, ids])
            all_scores = np.concatenate([top_scores, scores])
            top_ids, top_scores = self._topk(all_ids, all_scores, k)
            if len(top_scores) >= k:
                threshold = top_scores[-1]
        if len(terms) == 1 and lut is None and not conjunctive:
            count = terms[0][1]  # single unscoped term: count == df, no decode
        elif processed_all:
            count = self._union_count(count_ids)
        else:
            count = self._exact_count(term_list, lut, conjunctive)
        return top_ids, top_scores, count

    def _exact_count(self, term_list, lut, conjunctive) -> int:
        """Exact result count (G6) via a gaps(+scps when scoped) union
        pass — tf/dl never decoded."""
        parts = []
        for _, bl, cache in term_list:
            if lut is not None:
                docid, sc = self._decode_term_docids_sc(bl, cache)
                docid = docid[lut[sc]]
            else:
                docid = self._decode_term_docids(bl, cache)
            parts.append(docid)
        if not parts:
            return 0
        if conjunctive:
            inter = parts[0]
            for p in parts[1:]:
                inter = np.intersect1d(inter, p, assume_unique=True)
            return int(len(inter))
        return self._union_count(parts)

    # ---------------- timestamp-range filter ----------------------------

    @staticmethod
    def _ts_us(v) -> int | None:
        """Normalize a ts bound to int64 epoch microseconds: int passes
        through, ISO-8601 strings and datetimes are interpreted as UTC
        when naive (the corpus ts column is tz-naive UTC)."""
        if v is None:
            return None
        if isinstance(v, (int, np.integer)):
            return int(v)
        from datetime import datetime, timedelta, timezone

        if isinstance(v, str):
            v = datetime.fromisoformat(v)  # ValueError -> caller's bad_ts
        if not isinstance(v, datetime):
            raise ValueError(f"unsupported ts bound {v!r}")
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        # INTEGER epoch-µs: float64 timestamp() rounds ~1% of
        # microsecond values 1 µs low, breaking the inclusive-bound /
        # oracle-exact contract at the boundary (measured 2489/200000
        # round-trip mismatches) — timedelta floor-division is exact
        return (v - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
            microseconds=1
        )

    def _ts_of_ids(self, ids: np.ndarray) -> np.ndarray:
        """Epoch-µs ts per (live) docid, vectorized. Below the enrichment
        point-read threshold this is a searchsorted against the preloaded
        forward index (which already folds the delta overlay); above it,
        a row-group-pruned (docid, ts) column read of the docid-sorted
        doc store bounded by the matched docid range — 16 B/doc of IO,
        never the whole store. At 10^12 docs a standing time predicate
        should instead ride the BUILD as a partition key (date-sharded
        index segments pruned at plan time); this engine-side filter is
        the exact generic fallback."""
        if not len(ids):
            return np.empty(0, np.int64)
        if self._has_deltas or self.n_docs <= self._POINT_READ_MIN_DOCS:
            fwd = self._forward()
            docids, ts = fwd[0], fwd[6]
            pos = np.searchsorted(docids, ids)
            return ts[pos]
        lo, hi = int(ids.min()), int(ids.max())
        t = pq.read_table(
            build_mod.docs_dir(self.out_dir),
            columns=["docid", "ts"],
            filters=[("docid", ">=", lo), ("docid", "<=", hi)],
        )
        docids = t.column("docid").to_numpy()
        ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(docids, ids)
        return ts[pos]

    def _dl_of_ids(self, ids: np.ndarray) -> np.ndarray:
        """doc_len per (live) docid — the doc_len twin of
        :meth:`_ts_of_ids`: a row-group-pruned (docid, doc_len) column
        read bounded by the matched docid range; under a delta overlay
        the read folds tombstones and splices the delta doc rows (delta
        volume is reindexed-conv-sized)."""
        if not len(ids):
            return np.empty(0, np.int64)
        lo, hi = int(ids.min()), int(ids.max())
        t = pq.read_table(
            build_mod.docs_dir(self.out_dir),
            columns=["docid", "doc_len"],
            filters=[("docid", ">=", lo), ("docid", "<=", hi)],
        )
        docids = t.column("docid").to_numpy()
        dl = t.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
        if self._has_deltas:
            keep = self._tomb_keep_mask(docids)
            dd = self._delta_docs
            docids = np.concatenate([docids[keep], dd["docid"]])
            dl = np.concatenate([dl[keep], dd["dl"]])
            order = np.argsort(docids, kind="stable")
            docids, dl = docids[order], dl[order]
        pos = np.searchsorted(docids, ids)
        return dl[pos]

    def metrics(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
        fields=("doc_len", "ts"),
        percentiles=(50, 90, 99),
    ) -> dict:
        """Stats + exact percentiles aggregation over the FULL matching
        set (the Elasticsearch ``stats`` / ``percentiles`` aggregations
        on a query): per field, (n_docs, min, max, avg, p50, p90, p99)
        of the matching docs' values. Fields: ``doc_len`` (indexed
        token count) and ``ts`` (epoch-µs). All outputs are EXACT
        integers: percentile = nearest-rank, the value at 1-based rank
        ``(q*n + 99) // 100`` of the ascending values, and ``v_avg`` is
        the floor mean over the EXACT big-integer sum (epoch-µs sums
        overflow int64 — the engine accumulates chunked Python ints,
        the oracle sums HUGEINT; a float mean would instead inherit
        engine-specific summation-order rounding). ES defaults to
        t-digest approximation for percentiles; exactness is cheap here
        because the values ride the same matching-set-sized driver
        frame ``facets`` already uses — at corpus-sized standing
        aggregations swap in a fixed-width histogram sketch, the same
        note as the HLL cardinality sibling. Composes with all the
        filtering surfaces.

        -> {'result', 'count', 'data': pa.Table(field, n_docs, v_min,
        v_max, v_avg, p50, p90, p99), 'error'}"""
        if isinstance(fields, str):
            fields = tuple(v.strip() for v in fields.split(",") if v.strip())
        fields = tuple(fields)
        empty = METRICS_SCHEMA.empty_table()
        if not fields or not set(fields) <= {"doc_len", "ts"}:
            return {**self._resp(error="bad_field"), "data": empty}
        try:
            percentiles = tuple(int(q) for q in percentiles)
        except (TypeError, ValueError):
            return {**self._resp(error="bad_percentiles"), "data": empty}
        if any(not 1 <= q <= 100 for q in percentiles):
            # q=0 would index v[-1] (the MAX labelled as p0), q>100
            # would IndexError — validate like the sibling surfaces
            return {**self._resp(error="bad_percentiles"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, codes = self._matching_set(terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        rows = []
        for field in fields:
            v = np.sort(
                self._dl_of_ids(uniq) if field == "doc_len" else self._ts_of_ids(uniq)
            )
            n = len(v)
            # exact big-int sum: chunked int64 partials of (v - base)
            # with the chunk size derived from the VALUE SPAN so a
            # chunk sum can never reach 2^62 — a fixed 10k chunk wraps
            # silently once the span passes ~9.2e14 (a ts span of ~29
            # years) and numpy does not raise
            base = int(v[0])
            span = int(v[-1]) - base
            chunk = 10_000 if span == 0 else max(
                1, min(10_000, (1 << 62) // span)
            )
            total = base * n + sum(
                int((v[i: i + chunk] - base).sum())
                for i in range(0, n, chunk)
            )
            pcts = [int(v[(q * n + 99) // 100 - 1]) for q in percentiles]
            rows.append((field, n, base, int(v[-1]), total // n, *pcts))
        rows.sort()
        tbl = pa.table(
            {
                "field": pa.array([r[0] for r in rows], pa.string()),
                "n_docs": pa.array([r[1] for r in rows], pa.int64()),
                "v_min": pa.array([r[2] for r in rows], pa.int64()),
                "v_max": pa.array([r[3] for r in rows], pa.int64()),
                "v_avg": pa.array([r[4] for r in rows], pa.int64()),
                "p50": pa.array([r[5] for r in rows], pa.int64()),
                "p90": pa.array([r[6] for r in rows], pa.int64()),
                "p99": pa.array([r[7] for r in rows], pa.int64()),
            }
        )
        return {"result": True, "count": int(len(uniq)), "data": tbl, "error": None}

    MAX_MGET = 1024

    def mget(self, docs) -> dict:
        """Batch point fetch (the Elasticsearch ``_mget`` API): one row
        per requested (conv_id, turn_idx) IN REQUEST ORDER, each either
        found=True with the doc's enrichment columns and CURRENT text
        (overlay-aware — update-by-query rewrites and delta re-indexes
        included, tombstoned docs are not found; the termvectors
        aliveness rule) or found=False with the echoed key and nulls
        (ES echoes the _id of misses). Cost: one docid resolve + one
        batched enrichment lookup + one point text read per found doc —
        nothing corpus-sized. -> {'result', 'count' (found docs),
        'data': pa.Table(conv_id, turn_idx, found, role, tool, ts,
        text), 'error'}"""
        empty = MGET_SCHEMA.empty_table()
        if not isinstance(docs, (list, tuple)) or not docs \
                or len(docs) > self.MAX_MGET:
            return {**self._resp(error="bad_docs"), "data": empty}
        pairs = []
        for d in docs:
            if isinstance(d, dict):
                d = (d.get("conv_id"), d.get("turn_idx"))
            if (not isinstance(d, (list, tuple)) or len(d) != 2
                    or not isinstance(d[0], str)):
                return {**self._resp(error="bad_docs"), "data": empty}
            try:
                pairs.append((d[0], int(d[1])))
            except (TypeError, ValueError):
                return {**self._resp(error="bad_docs"), "data": empty}
        dids = [self._cursor_docid(c, t) for c, t in pairs]
        cand = np.array(sorted({int(x) for x in dids if x is not None}),
                        np.int64)
        alive: set[int] = set()
        if len(cand):
            if self._has_deltas:
                keep = self._tomb_keep_mask(cand)
                alive |= {int(x) for x in cand[keep]}
                dead = cand[~keep]
                if len(dead):
                    alive |= {
                        int(x) for x in
                        dead[np.isin(dead, self._delta_docs["docid"])]
                    }
            else:
                t = pq.read_table(
                    build_mod.docs_dir(self.out_dir), columns=["docid"],
                    filters=[("docid", "in", [int(x) for x in cand])],
                )
                alive |= {int(x) for x in t.column("docid").to_pylist()}
        found_ids = np.array(
            sorted({int(x) for x in dids if x is not None and int(x) in alive}),
            np.int64,
        )
        meta: dict[int, tuple] = {}
        if len(found_ids):
            enr = self._enrich(found_ids, np.zeros(len(found_ids)), [], False)
            for did, r in zip(found_ids, enr.to_pylist()):
                meta[int(did)] = (r["role"], r["tool"], r["ts"])
        rows = []
        n_found = 0
        for (c, t), did in zip(pairs, dids):
            if did is None or int(did) not in meta:
                rows.append((c, t, False, None, None, None, None))
                continue
            role, tool, ts = meta[int(did)]
            rows.append((c, t, True, role, tool, ts,
                         self._text_of(c, t) or ""))
            n_found += 1
        tbl = pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "found": pa.array([r[2] for r in rows], pa.bool_()),
            "role": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
            "text": pa.array([r[6] for r in rows], pa.string()),
        })
        return {"result": True, "count": n_found, "data": tbl, "error": None}

    def matrix_stats(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Covariance/correlation between doc_len and ts over the FULL
        matching set (the Elasticsearch ``matrix_stats`` aggregation on
        two fields — "do longer turns cluster later?"). The
        driver-hashed frame carries EXACT INTEGER cores only: n and the
        sums of x, y, x², y², x·y over values SHIFTED by the matching
        set's own minima (covariance/correlation are shift-invariant,
        and shifting keeps the squared epoch-µs sums finite — raw ts²
        sums overflow even HUGEINT at corpus counts). The quadratic
        sums exceed int64, so they travel as DECIMAL STRINGS (exact on
        both engines — a float column would round and a BIGINT would
        overflow); the engine accumulates chunked Python ints (the
        ``metrics`` device). The derived ``cov``/``corr`` floats ride
        the response only (pytest-pinned), never the hash — the
        percentile_ranks precedent.
        -> {'result', 'count', 'data': pa.Table(n_docs, sum_x, sum_y,
        sum_xx, sum_yy, sum_xy, cov, corr), 'error'}"""
        empty = MATRIX_STATS_SCHEMA.empty_table()
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        x = self._dl_of_ids(uniq).astype(np.int64)
        y = self._ts_of_ids(uniq).astype(np.int64)
        x = x - x.min()
        y = y - y.min()
        n = len(x)

        def exact_dot(u: np.ndarray, v: np.ndarray) -> int:
            # arbitrary-precision Σ u_i·v_i: squared shifted-µs values
            # exceed int64, so the products are Python ints (tolist
            # materializes ints once; matching-set-sized driver work —
            # the same cost class as metrics' percentile sort)
            return sum(a * b for a, b in zip(u.tolist(), v.tolist()))

        sx, sy = int(x.sum()), int(y.sum())
        sxx = exact_dot(x, x)
        syy = exact_dot(y, y)
        sxy = exact_dot(x, y)
        # derived floats: ONE fixed op sequence, response-only
        mean_x, mean_y = sx / n, sy / n
        cov = sxy / n - mean_x * mean_y
        var_x = sxx / n - mean_x * mean_x
        var_y = syy / n - mean_y * mean_y
        denom = math.sqrt(var_x) * math.sqrt(var_y)
        corr = cov / denom if denom > 0 else 0.0
        tbl = pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xx": pa.array([str(sxx)], pa.string()),
            "sum_yy": pa.array([str(syy)], pa.string()),
            "sum_xy": pa.array([str(sxy)], pa.string()),
            "cov": pa.array([round(cov, 6)], pa.float64()),
            "corr": pa.array([round(corr, 6)], pa.float64()),
        })
        return {"result": True, "count": n, "data": tbl, "error": None}

    def extended_stats(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Extended-stats aggregation over the matching set (the
        Elasticsearch ``extended_stats`` shape: count/min/max/avg/sum/
        sum_of_squares/variance/std_deviation + the avg±2σ bounds) for
        BOTH integer fields (doc_len, epoch-µs ts), one row per field.
        The driver-hashed frame carries EXACT INTEGER cores only —
        n/vmin/vmax plus SHIFT-BY-MIN sum and square-sum (variance is
        shift-invariant and shifting keeps squared-µs sums inside
        HUGEINT; the square sums travel as DECIMAL STRINGS, the
        ``matrix_stats`` device) — while avg/variance/std/bounds ride
        the response only (the percentile_ranks precedent). Composes
        with every filtering surface via the shared ``_matching_set``
        frame; the delta overlay folds through ``_dl_of_ids`` /
        ``_ts_of_ids`` like ``metrics``."""
        empty = EXT_STATS_SCHEMA.empty_table()
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        n = len(uniq)
        rows: dict[str, list] = {k: [] for k in EXT_STATS_SCHEMA.names}
        for field, vals in (
            ("doc_len", self._dl_of_ids(uniq).astype(np.int64)),
            ("ts", self._ts_of_ids(uniq).astype(np.int64)),
        ):
            vmin, vmax = int(vals.min()), int(vals.max())
            sh = vals - vmin
            s = int(sh.sum(dtype=object)) if n else 0
            # arbitrary-precision Σ v², the matrix_stats exact_dot device
            ss = sum(a * a for a in sh.tolist())
            mean_sh = s / n
            var = ss / n - mean_sh * mean_sh
            std = math.sqrt(var) if var > 0 else 0.0
            avg = vmin + mean_sh
            rows["field"].append(field)
            rows["n_docs"].append(n)
            rows["vmin"].append(vmin)
            rows["vmax"].append(vmax)
            rows["sum_shift"].append(str(s))
            rows["sumsq_shift"].append(str(ss))
            rows["avg"].append(round(avg, 6))
            rows["variance"].append(round(var, 6))
            rows["std_deviation"].append(round(std, 6))
            rows["std_upper"].append(round(avg + 2.0 * std, 6))
            rows["std_lower"].append(round(avg - 2.0 * std, 6))
        tbl = pa.table(rows, schema=EXT_STATS_SCHEMA)
        return {"result": True, "count": n, "data": tbl, "error": None}

    MAX_RANK_VALUES = 100

    def percentile_ranks(
        self,
        query_text: str,
        values,
        field: str = "doc_len",
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Inverse percentiles over the FULL matching set (the
        Elasticsearch ``percentile_ranks`` aggregation): for each probe
        value, how many matching docs' ``field`` values are <= it —
        one vectorized ``searchsorted`` against the same sorted
        matching-set frame ``metrics`` uses. The driver-hashed frame
        is INTEGER-ONLY (value, n_le, n_docs): the percent itself
        (``pct`` in the response rows) is 100*n_le/n, whose 6-dp
        rounding CAN land an exact half-tie (e.g. 100/512 =
        0.1953125), where numpy (half-even) and DuckDB (half-away)
        legitimately disagree — so the float is a derived convenience,
        never a compared column. ``field`` is doc_len or ts (probe
        values in epoch-µs / ISO / datetime for ts). Composes with
        all the filtering surfaces.
        -> {'result', 'count', 'data': pa.Table(value, n_le, n_docs,
        pct), 'error'}"""
        empty = PRANKS_SCHEMA.empty_table()
        if field not in ("doc_len", "ts"):
            return {**self._resp(error="bad_field"), "data": empty}
        if not isinstance(values, (list, tuple)) or not values \
                or len(values) > self.MAX_RANK_VALUES:
            return {**self._resp(error="bad_values"), "data": empty}
        try:
            vals = [
                int(self._ts_us(v)) if field == "ts" else int(v)
                for v in values
            ]
        except (TypeError, ValueError):
            return {**self._resp(error="bad_values"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        v = np.sort(
            self._dl_of_ids(uniq) if field == "doc_len"
            else self._ts_of_ids(uniq)
        ).astype(np.int64)
        n = len(v)
        probes = np.array(sorted(set(vals)), np.int64)
        n_le = np.searchsorted(v, probes, side="right").astype(np.int64)
        tbl = pa.table({
            "value": pa.array(probes, pa.int64()),
            "n_le": pa.array(n_le, pa.int64()),
            "n_docs": pa.array(np.full(len(probes), n), pa.int64()),
            "pct": pa.array(np.round(100.0 * n_le / n, 6), pa.float64()),
        })
        return {"result": True, "count": n, "data": tbl, "error": None}

    DIS_MAX_MAX_QUERIES = 8

    def dis_max(
        self,
        queries: list[str],
        tie_breaker: float = 0.0,
        scope: str | None = None,
        offset: int = 0,
        limit: int = DEFAULT_PAGE_SIZE,
    ) -> dict:
        """Disjunction-max compound query (Lucene DisjunctionMaxQuery /
        the Elasticsearch ``dis_max`` compound): every subquery is a
        standard disjunctive BM25 query evaluated on the exhaustive
        frame; a doc's combined score is ``best_sub + tie_breaker *
        (sum of its OTHER sub scores)`` — ``tie_breaker=0`` is the pure
        best-field max, ``tie_breaker=1`` degenerates to the plain sum
        of sub scores. The matching set is the UNION of the subquery
        matching sets (the exact pre-pagination count).

        Missing-lemma semantics are PER SUBQUERY: a sub containing any
        corpus-absent lemma matches nothing (the reference rule applied
        to that sub alone — ES: that clause simply has no matches) and
        the other subs still contribute; a subquery that analyzes to no
        lemmas at all is ``bad_dis_max`` (ES rejects an empty clause
        body). Per-sub scores are the engine's exact BM25 float64s and
        the combine accumulates sums in subquery order; the SQL twin's
        SUM order is unspecified, so the driver-compared score column
        is round-6 (the ``search_boosted`` 6-dp protocol)."""
        if (
            not isinstance(queries, (list, tuple))
            or not 1 <= len(queries) <= self.DIS_MAX_MAX_QUERIES
            or not all(isinstance(q, str) for q in queries)
        ):
            return self._resp(error="bad_dis_max")
        try:
            tb = float(tie_breaker)
        except (TypeError, ValueError):
            return self._resp(error="bad_dis_max")
        if not (0.0 <= tb <= 1.0) or tb != tb:
            return self._resp(error="bad_dis_max")
        if not self.valid_scope(scope):
            return self._resp(error="bad_scope")
        sub_frames: list[tuple[np.ndarray, np.ndarray]] = []
        all_terms: dict[str, int] = {}
        for qt in queries:
            lemmas = self._analyzer.analyze_query(qt or "")
            if not lemmas:
                return self._resp(error="bad_dis_max")
            terms, ok = [], True
            for lem in lemmas:
                df = self._df_of(lem)
                if df is None and self._has_deltas and lem in self._delta_lemma:
                    df = 0
                if df is None:
                    ok = False
                    break
                terms.append((lem, df))
            if ok and self._has_deltas:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                ok = all(df > 0 for _, df in terms)
            if not ok:
                continue  # this sub matches nothing; others still count
            terms = sorted(terms, key=lambda t: (t[1], t[0]))
            ids_i, scores_i = self.score_exhaustive(terms, scope)
            if len(ids_i):
                sub_frames.append((ids_i, scores_i))
            for lem, df in terms:
                all_terms.setdefault(lem, df)
        if not sub_frames:
            return self._resp(count=0)
        ids = np.concatenate([f[0] for f in sub_frames])
        sc = np.concatenate([f[1] for f in sub_frames])
        order = np.argsort(ids, kind="stable")
        sids, ssc = ids[order], sc[order]
        neq = np.empty(len(sids), bool)
        neq[0] = True
        np.not_equal(sids[1:], sids[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        uniq = sids[starts]
        sums = np.add.reduceat(ssc, starts)
        maxs = np.maximum.reduceat(ssc, starts)
        score = maxs + tb * (sums - maxs)
        top_ids, top_sc = self._topk(uniq, score, offset + limit)
        top_ids, top_sc = top_ids[offset:], top_sc[offset:]
        terms_sorted = sorted(all_terms.items(), key=lambda t: (t[1], t[0]))
        tbl = self._enrich(top_ids, top_sc, terms_sorted, False)
        return {"result": True, "count": int(len(uniq)), "data": tbl, "error": None}

    def top_hits(
        self,
        query_text: str,
        by: str = "role",
        per_group: int = 3,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Top hits per bucket (the Elasticsearch ``top_hits``
        sub-aggregation under a ``terms`` bucket): the ``per_group``
        best-scoring matching turns for EVERY value of ``by`` ('role'
        or 'tool') in one pass — \"show me the best match per role\".
        Scores are the exhaustive BM25 frame (same float64 summation
        order as the oracle); the matching set and its per-doc scope
        codes come from the shared ``_matching_set`` frame, so every
        filtering surface composes; grouping is a vectorized lexsort +
        boundary scan (the ``_collapse_per_conv`` device generalized to
        arbitrary group keys). Ties (score DESC, conv_id, turn_idx);
        groups ascending. -> {'result', 'count' (matching docs),
        'data': pa.Table(group, grank, conv_id, turn_idx, role, tool,
        ts, score), 'error'}"""
        empty = TOP_HITS_SCHEMA.empty_table()
        if by not in ("role", "tool"):
            return {**self._resp(error="bad_group"), "data": empty}
        try:
            per_group = int(per_group)
        except (TypeError, ValueError):
            return {**self._resp(error="bad_per_group"), "data": empty}
        if per_group < 1:
            return {**self._resp(error="bad_per_group"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, codes = self._matching_set(terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        ids2, scores2 = self.score_exhaustive(terms, scope, conjunctive)
        scores_u = scores2[np.searchsorted(ids2, uniq)]
        pairs = self._code_pairs()
        vals = np.array([p[0 if by == "role" else 1] for p in pairs], object)[codes]
        guniq, ginv = np.unique(vals, return_inverse=True)
        o = np.lexsort((uniq, -scores_u, ginv))
        gs = ginv[o]
        neq = np.empty(len(gs), bool)
        neq[0] = True
        np.not_equal(gs[1:], gs[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        occ = np.arange(len(o)) - np.repeat(
            starts, np.diff(np.append(starts, len(o)))
        )
        sel = occ < int(per_group)
        osel = o[sel]
        tbl = self._enrich(uniq[osel], scores_u[osel], terms, False)
        tbl = pa.table(
            {
                "group": pa.array(vals[osel], pa.string()),
                "grank": pa.array((occ[sel] + 1).astype(np.int32), pa.int32()),
                **{c: tbl.column(c) for c in tbl.column_names},
            }
        )
        return {"result": True, "count": int(len(uniq)), "data": tbl, "error": None}

    def explain(self, query_text: str, conv_id: str, turn_idx: int) -> dict:
        """Score breakdown for ONE document (the Elasticsearch
        ``_explain`` API): per query term, in plan order (df-ascending
        then lemma), the tuple (lemma, df, tf, dl, idf, weight) where
        ``weight`` is the exact BM25 contribution —

            idf = ln(1 + (N - df + 0.5)/(df + 0.5))
            weight = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

        (0.0 where the doc lacks the term) — and ``total`` is the
        float64 sum in that same order, bit-identical to the exhaustive
        scorer and therefore to ``search()``'s score for this doc.
        Decodes only the query terms' postings (overlay-folded), one
        searchsorted per term; the doc's existence is validated against
        the live doc store (overlay-aware). -> {'result', 'count' (1|0),
        'data': pa.Table(lemma, df, tf, dl, idf, weight), 'total',
        'error'}"""
        empty = EXPLAIN_SCHEMA.empty_table()
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty, "total": 0.0}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty,
                    "total": 0.0, "error": None}
        did = self._cursor_docid(conv_id, turn_idx)
        if did is None:
            return {**self._resp(error="not_found"), "data": empty, "total": 0.0}
        docid = np.int64(did)
        ids = np.array([docid], np.int64)
        alive = True
        if self._has_deltas and not self._tomb_keep_mask(ids)[0]:
            alive = bool(np.isin(ids, self._delta_docs["docid"])[0])
        else:
            t = pq.read_table(
                build_mod.docs_dir(self.out_dir),
                columns=["docid"],
                filters=[("docid", "==", int(docid))],
            )
            alive = t.num_rows > 0
        if not alive:
            return {**self._resp(error="not_found"), "data": empty, "total": 0.0}
        dl = float(self._dl_of_ids(ids)[0])
        blocks = self._term_blocks([t[0] for t in terms])
        k1, b = self.k1, self.b
        rows, total = [], 0.0
        for lem, df in terms:
            bl = blocks[lem]
            d, tf_arr, _dl, _sc = self._decode_term(
                bl, 0, len(bl["first"]), bl.setdefault("chunks", {})
            )
            pos = int(np.searchsorted(d, docid))
            tf = int(tf_arr[pos]) if pos < len(d) and d[pos] == docid else 0
            idf = self.idf(df)
            w = (
                idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                if tf
                else 0.0
            )
            total += w
            rows.append((lem, int(df), tf, int(dl), idf, w))
        tbl = pa.table(
            {
                "lemma": pa.array([r0[0] for r0 in rows], pa.string()),
                "df": pa.array([r0[1] for r0 in rows], pa.int64()),
                "tf": pa.array([r0[2] for r0 in rows], pa.int64()),
                "dl": pa.array([r0[3] for r0 in rows], pa.int64()),
                "idf": pa.array([r0[4] for r0 in rows], pa.float64()),
                "weight": pa.array([r0[5] for r0 in rows], pa.float64()),
            }
        )
        return {"result": True, "count": 1, "data": tbl,
                "total": float(total), "error": None}

    def rank_eval(
        self,
        query_text: str,
        scope: str | None = None,
        k: int = 10,
        rating_of=None,
    ) -> dict:
        """Ranked-retrieval evaluation for ONE query (the Elasticsearch
        ``_rank_eval`` API): score the SERVED top-k page (the real
        ``search()`` path, block-max and all) against a rated judgment
        set and report the classic metrics. The judgment set is the
        query's full matching set (the candidate pool an assessor would
        be shown) graded by ``rating_of`` — default grade
        ``(turn_idx + len(conv_id)) % 3`` in {0,1,2}, a deterministic
        pseudo-assessor both this engine and the SQL oracle can compute
        exactly. All hash-compared outputs are INTEGERS (gain
        ``2^rating - 1`` per doc, the standard graded-relevance gain);
        the float conveniences (precision@k, recall@k, MRR) are derived
        from them and returned alongside, never compared:

        - ``n_hits``      — retrieved rows (≤ k)
        - ``n_rel``       — judged-relevant docs (rating > 0) in the pool
        - ``n_rel_ret``   — of those, how many the page retrieved
        - ``first_rel_rank`` — 1-based rank of the first relevant hit
          (0 = none); MRR = 1/first_rel_rank
        - ``gain_top``    — Σ gain over the retrieved page
        - ``gain_ideal``  — Σ gain over the k best-rated pool docs (the
          DCG numerator pair without the log discount, which would drag
          float summation order into the comparison; ties at the cut
          share a rating, so the sum needs no tie-break)

        Cost: one served search + the matching-set frame ``facets``
        already carries (gaps+scps decode, no tf/dl pass) + an
        O(#convs) sidecar length pass — nothing corpus-row-sized on the
        driver beyond the documented matching-set regime.
        -> {'result', 'count' (pool size), 'data': 1-row pa.Table,
        'precision', 'recall', 'mrr', 'error'}"""
        empty = RANK_EVAL_SCHEMA.empty_table()
        zero = {"precision": 0.0, "recall": 0.0, "mrr": 0.0}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty, **zero}
        if k <= 0:
            return {**self._resp(error="bad_k"), "data": empty, **zero}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty, **zero}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty,
                    "error": None, **zero}
        uniq, _codes = self._matching_set(terms, scope)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty,
                    "error": None, **zero}
        convs = (
            self._fwd[3] if self._fwd is not None
            else build_mod._load_sorted_convs(self.out_dir)
        )
        conv_len = pc.utf8_length(convs).to_numpy().astype(np.int64)
        conv_rank, turn = split_docids(uniq)
        if rating_of is None:
            pool_rating = (turn.astype(np.int64) + conv_len[conv_rank]) % 3
        else:
            pool_rating = np.asarray(
                rating_of(convs.take(pa.array(conv_rank)), turn), np.int64
            )
        pool_gain = (np.int64(1) << pool_rating) - 1
        n_rel = int((pool_rating > 0).sum())
        top = np.sort(pool_gain)[::-1][:k]
        gain_ideal = int(top.sum())
        served = self.search(query_text, scope=scope, limit=k)
        if not served["result"]:
            return {**self._resp(error=served["error"]), "data": empty, **zero}
        hits = served["data"]
        n_hits = hits.num_rows
        if rating_of is None:
            hit_rating = (
                hits.column("turn_idx").to_numpy().astype(np.int64)
                + pc.utf8_length(hits.column("conv_id")).to_numpy().astype(np.int64)
            ) % 3
        else:
            hit_rating = np.asarray(
                rating_of(hits.column("conv_id"),
                          hits.column("turn_idx").to_numpy()), np.int64
            )
        gain_top = int(((np.int64(1) << hit_rating) - 1).sum())
        rel_ranks = np.flatnonzero(hit_rating > 0)
        n_rel_ret = int(len(rel_ranks))
        first_rel = int(rel_ranks[0]) + 1 if n_rel_ret else 0
        tbl = pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n_hits": pa.array([n_hits], pa.int64()),
                "n_rel": pa.array([n_rel], pa.int64()),
                "n_rel_ret": pa.array([n_rel_ret], pa.int64()),
                "first_rel_rank": pa.array([first_rel], pa.int64()),
                "gain_top": pa.array([gain_top], pa.int64()),
                "gain_ideal": pa.array([gain_ideal], pa.int64()),
            }
        )
        return {
            "result": True,
            "count": int(len(uniq)),
            "data": tbl,
            "precision": n_rel_ret / k,
            "recall": n_rel_ret / n_rel if n_rel else 0.0,
            "mrr": 1.0 / first_rel if first_rel else 0.0,
            "error": None,
        }

    def analyze(self, text: str) -> dict:
        """Analysis introspection (the Elasticsearch ``_analyze`` API):
        run arbitrary text through the index's OWN analyzer chain and
        return one row per SURVIVING token — (pos, token, lemma) where
        ``pos`` is the surviving-token ordinal, the exact coordinate
        the positional index stores (phrase/near queries match on it).
        Pure per-call compute, no index access beyond the analyzer
        module binding. -> {'result', 'count', 'data': pa.Table(pos,
        token, lemma), 'error'}"""
        toks = [
            t for t in self._norm_text(text or "").split()
            if len(t) >= self._min_token_len and t not in self._stopset
        ]
        lems = [self._analyzer.analyze_query(t) or [t] for t in toks]
        tbl = pa.table(
            {
                "pos": pa.array(range(len(toks)), pa.int32()),
                "token": pa.array(toks, pa.string()),
                "lemma": pa.array([l[0] for l in lems], pa.string()),
            }
        )
        return {"result": True, "count": len(toks), "data": tbl,
                "error": None}

    def termvectors(self, conv_id: str, turn_idx: int) -> dict:
        """Per-document term statistics (the Elasticsearch
        ``_termvectors`` API with ``term_statistics=true``): one row per
        distinct lemma of the document's CURRENT text — (lemma, tf, df,
        dl) sorted by lemma. tf and dl come from re-analyzing the
        overlay-aware text source with the index's own analyzer (the ES
        behavior for non-stored fields), so they always reflect the
        served index view — update-by-query rewrites and delta
        re-indexes included; df is the overlay-exact merged posting
        count (the query planner's rule). Cost: one point text read +
        one single-doc analyzer pass + one dictionary lookup per
        distinct lemma — nothing corpus-sized. -> {'result', 'count'
        (1|0), 'data': pa.Table(lemma, tf, df, dl), 'error'}"""
        empty = TERMVECTORS_SCHEMA.empty_table()
        did = self._cursor_docid(conv_id, turn_idx)
        if did is None:
            return {**self._resp(error="not_found"), "data": empty}
        ids = np.array([np.int64(did)], np.int64)
        if self._has_deltas and not self._tomb_keep_mask(ids)[0]:
            alive = bool(np.isin(ids, self._delta_docs["docid"])[0])
        else:
            t = pq.read_table(
                build_mod.docs_dir(self.out_dir),
                columns=["docid"],
                filters=[("docid", "==", int(did))],
            )
            alive = t.num_rows > 0
        if not alive:
            return {**self._resp(error="not_found"), "data": empty}
        text = self._text_of(conv_id, turn_idx) or ""
        res = self._analyzer.analyze_batch(pa.array([text], pa.string()), {})
        _idx, lemmas, tfs, dlen = res[0], res[1], res[2], res[3]
        if not len(lemmas):
            return {"result": True, "count": 1, "data": empty, "error": None}
        dl = int(dlen[0])
        order = np.argsort(lemmas, kind="stable")
        lemmas, tfs = lemmas[order], tfs[order]
        if self._has_deltas:
            blocks = self._term_blocks([str(x) for x in lemmas])
            dfs = [int(blocks[str(x)]["cum_n"][-1]) for x in lemmas]
        else:
            dfs = [int(self._df_of(str(x)) or 0) for x in lemmas]
        tbl = pa.table(
            {
                "lemma": pa.array([str(x) for x in lemmas], pa.string()),
                "tf": pa.array(tfs.astype(np.int64), pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "dl": pa.array([dl] * len(lemmas), pa.int64()),
            }
        )
        return {"result": True, "count": 1, "data": tbl, "error": None}

    def export(
        self,
        query_text: str,
        dest: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
        columns: list[str] | None = None,
        slice_id: int | None = None,
        slice_max: int | None = None,
    ) -> dict:
        """Matching-set export (the Elasticsearch scroll + reindex
        shape): stream EVERY turn whose doc matches the query to
        partitioned Parquet under ``dest`` — the corpus-slice
        extraction a training-data pipeline runs after retrieval-style
        filtering ("give me all turns mentioning X as a dataset").

        ``slice_id``/``slice_max`` (both or neither; ``0 <= id < max``,
        ``max >= 2``) select ONE slice of the matching set — the ES
        *sliced scroll*: membership is ``docid % slice_max ==
        slice_id``, a pure function of the deterministic docid, so the
        S slices are disjoint, their union is exactly the full export,
        and each can run (or RE-run, after a failure) in its own
        process with no coordination — the resumable-parallel-extract
        primitive for corpus-sized exports. Per-slice counts are
        near-uniform because docids stripe conversations' turns across
        residues.

        The matching docids come from the overlay-folded postings
        (gaps+scps decode — the ``facets`` frame, matching-set-sized);
        the text/metadata rows are then scanned DISTRIBUTED from the
        generation-correct text sources with a map-side broadcast
        semi-join (the sorted id set rides ONE ``ray.put``; membership
        is a C-level searchsorted per batch — no shuffle, no driver
        materialization of the exported text, Ray's streaming executor
        writes as it scans). Re-indexed conversations read from their
        delta generation's sources, so exported text == served text;
        tombstoned docs are absent from the overlay-folded matching
        set. Scale note: the broadcast id set is matching-set-sized —
        at a corpus-sized matching set swap the broadcast for a hash
        semi-join against a docid-keyed Dataset (the build's stage-C
        exchange shape); same documented threshold regime as the other
        matching-set surfaces. ``columns`` projects the exported schema
        (the ES reindex ``_source`` filtering — column pruning starts
        at the read, so dropped columns never leave storage); conv_id
        and turn_idx are always read for the semi-join and included in
        the output. -> {'result', 'count', 'path', 'error'};
        refuses an existing non-empty ``dest`` (the snapshot guard)."""
        import ray

        from .sources.transcripts import TRANSCRIPT_COLUMNS, read_transcripts

        if columns is None:
            columns = list(TRANSCRIPT_COLUMNS)
        else:
            if not set(columns) <= set(TRANSCRIPT_COLUMNS):
                return {**self._resp(error="bad_columns"), "path": dest}
            columns = ["conv_id", "turn_idx"] + [
                c for c in TRANSCRIPT_COLUMNS
                if c in columns and c not in ("conv_id", "turn_idx")
            ]
        if os.path.exists(dest) and (
            not os.path.isdir(dest) or os.listdir(dest)
        ):
            return {**self._resp(error="dest_exists"), "path": dest}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "path": dest}
        if (slice_id is None) != (slice_max is None):
            return {**self._resp(error="bad_slice"), "path": dest}
        if slice_max is not None and not (
            isinstance(slice_id, int) and isinstance(slice_max, int)
            and slice_max >= 2 and 0 <= slice_id < slice_max
        ):
            return {**self._resp(error="bad_slice"), "path": dest}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "path": dest}
        if err == "no_results":
            return {"result": True, "count": 0, "path": dest, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if slice_max is not None and len(uniq):
            uniq = uniq[(uniq % slice_max) == slice_id]
        if not len(uniq):
            return {"result": True, "count": 0, "path": dest, "error": None}
        convs = (
            self._fwd[3] if self._fwd is not None
            else build_mod._load_sorted_convs(self.out_dir)
        )
        conv_rank, _turn = split_docids(uniq)
        dpaths = getattr(self, "_delta_text_paths", {})
        groups: dict[tuple, list[int]] = {}
        if dpaths:
            id_convs = convs.take(pa.array(conv_rank)).to_pylist()
            for did, c in zip(uniq, id_convs):
                key = tuple(dpaths.get(c) or self.transcripts_paths)
                groups.setdefault(key, []).append(int(did))
        else:
            groups[tuple(self.transcripts_paths)] = [int(x) for x in uniq]
        convs_ref = ray.put(convs)
        parts = []
        for paths, ids in groups.items():
            ids_ref = ray.put(np.sort(np.array(ids, np.int64)))

            def member(batch: pa.Table, ref=ids_ref) -> pa.Table:
                ids_sorted = ray.get(ref)
                d = batch.column("docid").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ids_sorted, d)
                pos[pos >= len(ids_sorted)] = 0
                keep = ids_sorted[pos] == d
                return batch.filter(pa.array(keep)).drop_columns(["docid"])

            ds = (
                read_transcripts(list(paths), columns=columns)
                .map_batches(
                    make_docid_attacher(convs_ref), batch_format="pyarrow"
                )
                .map_batches(member, batch_format="pyarrow")
            )
            parts.append(ds)
        out = parts[0]
        for ds in parts[1:]:
            out = out.union(ds)
        os.makedirs(dest, exist_ok=True)
        out.write_parquet(dest)
        return {"result": True, "count": int(len(uniq)), "path": dest,
                "error": None}

    # ---------------- NOT-term exclusion --------------------------------

    def _exclusion_docids(self, exclude_text: str) -> np.ndarray | None:
        """Sorted unique docids containing ANY lemma of ``exclude_text``
        (the NOT side of a boolean query). None = exclusion analyzes to
        nothing (pure stopwords/punct) and the query runs unmodified;
        lemmas absent from the corpus exclude nothing (no reference
        missing-lemma semantics here — NOT of an absent term is a no-op,
        mirroring the SQL ``NOT EXISTS``). Gaps-only decode (tf/dl varint
        passes skipped), same cost shape as scoring the excluded terms."""
        lemmas = self._analyzer.analyze_query(exclude_text)
        if not lemmas:
            return None
        present = [
            lem
            for lem in dict.fromkeys(lemmas)
            if self._df_of(lem) is not None
            or (self._has_deltas and lem in self._delta_lemma)
        ]
        if not present:
            return np.empty(0, np.int64)
        blocks = self._term_blocks(present)
        parts = [
            self._decode_term_docids(blocks[lem], blocks[lem].setdefault("chunks", {}))
            for lem in present
        ]
        allv = np.concatenate(parts)
        if not len(allv):
            return allv
        return np.unique(allv)

    # ---------------- faceted result counts -----------------------------

    def _code_pairs(self) -> list[tuple[str, str]]:
        """Dense scope code -> (role, tool) decode table: the inverse of
        ``_pair_code``. O(#roles x #tools + #delta pairs) — independent
        of corpus size (same scale argument as ``_scope_lut``)."""
        roles = self.manifest["stats"].get("roles", [])
        tools = self.manifest["stats"].get("tools", [])
        nt = len(tools) + 1
        pairs = [
            ("" if ri == 0 else roles[ri - 1], "" if ti == 0 else tools[ti - 1])
            for ri in range(len(roles) + 1)
            for ti in range(nt)
        ]
        extra = sorted(self._extra_pairs.items(), key=lambda kv: kv[1])
        pairs.extend(p for p, _ in extra)
        return pairs

    def _matching_set(
        self,
        terms: list[tuple[str, int]],
        scope: str | None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Unique matching docids (ascending) + each doc's dense scope
        code, after ALL the composable filtering surfaces (scope LUT,
        conjunctive floor, NOT-term exclusion, inclusive ts bounds) —
        the shared matching frame behind ``facets`` and
        ``significant_terms``. Gaps+scps decode only (no tf/dl varint
        pass); a doc's scope code rides the first posting seen for it."""
        blocks = self._term_blocks([t[0] for t in terms])
        lut = self._scope_lut(scope) if scope else None
        d_parts, s_parts = [], []
        for lem, _df in terms:
            bl = blocks[lem]
            docid, sc = self._decode_term_docids_sc(bl, bl.setdefault("chunks", {}))
            if lut is not None:
                keep = lut[sc]
                docid, sc = docid[keep], sc[keep]
            d_parts.append(docid)
            s_parts.append(sc)
        ids = np.concatenate(d_parts) if d_parts else np.empty(0, np.int64)
        if not len(ids):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        scs = np.concatenate(s_parts)
        order = np.argsort(ids, kind="stable")
        sids = ids[order]
        neq = np.empty(len(sids), bool)
        neq[0] = True
        np.not_equal(sids[1:], sids[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        codes = scs[order][starts]
        uniq = sids[starts]
        if conjunctive:
            cnt = np.diff(np.append(starts, len(sids)))
            keep = cnt >= len(terms)
            codes, uniq = codes[keep], uniq[keep]
        if exclude is not None and len(uniq):
            excl = self._exclusion_docids(exclude)
            if excl is not None and len(excl):
                keep = ~np.isin(uniq, excl, assume_unique=False)
                codes, uniq = codes[keep], uniq[keep]
        if (ts_min is not None or ts_max is not None) and len(uniq):
            tss = self._ts_of_ids(uniq)
            m = np.ones(len(uniq), bool)
            if ts_min is not None:
                m &= tss >= self._ts_us(ts_min)
            if ts_max is not None:
                m &= tss <= self._ts_us(ts_max)
            codes, uniq = codes[m], uniq[m]
        return uniq, codes

    def facets(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
        by=("role", "tool"),
    ) -> dict:
        """Faceted navigation over the reference's site-filter analog:
        per-role and per-tool document counts over the FULL matching set
        (not just the returned page) — the grouped generalization of the
        exact result count (G6). Uses the same gaps+scps decode as the
        scoped counting path: a doc's scope code is a doc property, so
        the first posting seen for each unique doc carries its (role,
        tool); counts are a bincount over the dense code space and the
        code->value decode is O(#roles x #tools), never corpus-sized.
        Composes with the other filtering surfaces: ``exclude`` NOT
        terms and inclusive ``ts_min``/``ts_max`` bounds apply to the
        matching set before grouping (pinned equal to the search-path
        filters by test).

        ``by`` selects the groupings: any subset of 'role', 'tool' and
        'day' (a comma-joined string is accepted). 'day' is the date
        histogram — matching-doc counts per UTC calendar day
        (``floor(epoch_us / 86_400e6)``, rendered YYYY-MM-DD), the
        Elasticsearch ``date_histogram`` shape; its per-doc ts lookup
        rides the same two-regime path as the ts-range filter
        (forward-index searchsorted below the enrichment threshold, a
        row-group-pruned (docid, ts) read above it — at 10^12 docs a
        standing date facet should instead ride a build-time date
        partition key, same note as the ts filter).

        -> {'result': bool, 'count': int (matching docs), 'data':
        pa.Table(facet, value, n_docs), 'error': str|None}. ``value`` ==
        '' groups docs with no tool (every doc has a role in practice).
        """
        if isinstance(by, str):
            by = tuple(v.strip() for v in by.split(",") if v.strip())
        by = tuple(by)
        if not by or not set(by) <= {"role", "tool", "day"}:
            return {**self._resp(error="bad_facet"), "data": FACETS_SCHEMA.empty_table()}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": FACETS_SCHEMA.empty_table()}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": FACETS_SCHEMA.empty_table()}
        if err == "no_results":
            return {"result": True, "count": 0, "data": FACETS_SCHEMA.empty_table(), "error": None}
        uniq, codes = self._matching_set(terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": FACETS_SCHEMA.empty_table(), "error": None}
        rows: list[tuple[str, str, int]] = []
        if "role" in by or "tool" in by:
            pairs = self._code_pairs()
            per_code = np.bincount(codes, minlength=len(pairs))
            role_counts: dict[str, int] = {}
            tool_counts: dict[str, int] = {}
            for code in np.flatnonzero(per_code):
                r, t = pairs[code]
                n = int(per_code[code])
                role_counts[r] = role_counts.get(r, 0) + n
                tool_counts[t] = tool_counts.get(t, 0) + n
            if "role" in by:
                rows += [("role", v, n) for v, n in role_counts.items()]
            if "tool" in by:
                rows += [("tool", v, n) for v, n in tool_counts.items()]
        if "day" in by and len(uniq):
            # date histogram: one bucket per UTC calendar day of the
            # matching docs' ts (epoch-µs floor-division — exact for the
            # naive-UTC timestamps the corpus carries)
            tss = self._ts_of_ids(uniq)
            days = (tss // 86_400_000_000).astype(np.int64)
            du, dc = np.unique(days, return_counts=True)
            rows += [
                ("day", str(v), int(n))
                for v, n in zip(du.astype("datetime64[D]").astype(str), dc)
            ]
        rows.sort()
        tbl = pa.table(
            {
                "facet": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([r[1] for r in rows], pa.string()),
                "n_docs": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        return {"result": True, "count": int(len(codes)), "data": tbl, "error": None}

    def histogram(
        self,
        query_text: str,
        field: str = "doc_len",
        interval: int = 10,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Fixed-interval numeric bucket counts over the FULL matching
        set (the Elasticsearch ``histogram`` aggregation; on ``ts`` it
        is the fixed-interval ``date_histogram`` — the calendar-day
        variant lives in ``facets(by=('day',))``). ``bucket = (v //
        interval) * interval`` — pure integer math, so every count is
        hash-exact; empty buckets are omitted (ES ``min_doc_count=1``
        semantics). Values ride the same matching-set frames ``metrics``
        uses (``_dl_of_ids`` / ``_ts_of_ids``, overlay-aware); composes
        with every filtering surface. -> {'result', 'count', 'data':
        pa.Table(bucket, n_docs), 'error'}"""
        empty = HISTOGRAM_SCHEMA.empty_table()
        if field not in ("doc_len", "ts"):
            return {**self._resp(error="bad_field"), "data": empty}
        if not isinstance(interval, int) or interval <= 0:
            return {**self._resp(error="bad_interval"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        v = (
            self._dl_of_ids(uniq) if field == "doc_len"
            else self._ts_of_ids(uniq)
        ).astype(np.int64)
        buckets = (v // interval) * interval
        bu, bc = np.unique(buckets, return_counts=True)
        tbl = pa.table(
            {
                "bucket": pa.array(bu, pa.int64()),
                "n_docs": pa.array(bc.astype(np.int64), pa.int64()),
            }
        )
        return {"result": True, "count": int(len(uniq)), "data": tbl,
                "error": None}

    CARDINALITY_FIELDS = ("conv", "role", "tool", "day", "doc_len", "ts")

    def _cardinality_values(self, uniq: np.ndarray, codes: np.ndarray,
                            field: str) -> np.ndarray:
        """The matching set's per-doc values for one cardinality field,
        as int64 codes whose distinctness equals the surface value's
        distinctness (role/tool ride the dense scope-code decode — the
        code->value map is injective per axis only after decoding, so
        each axis projects its own index stream)."""
        if field == "conv":
            return split_docids(uniq)[0]
        if field in ("role", "tool"):
            pairs = self._code_pairs()
            vals = np.array(
                [p[0] if field == "role" else p[1] for p in pairs],
                dtype=object,
            )[codes]
            _, inv = np.unique(vals, return_inverse=True)
            return inv.astype(np.int64)
        v = (
            self._dl_of_ids(uniq) if field == "doc_len"
            else self._ts_of_ids(uniq)
        ).astype(np.int64)
        return v // 86_400_000_000 if field == "day" else v

    def cardinality(
        self,
        query_text: str,
        fields=("conv",),
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Distinct-value counts over the FULL matching set (the
        Elasticsearch ``cardinality`` aggregation, exact): per field,
        ``n_distinct`` = COUNT(DISTINCT value) among matching docs.
        Fields: ``conv`` (conversations), ``role``/``tool`` (dense
        scope-code decode — ``''`` is a value, matching SQL's
        COUNT(DISTINCT) over the stored empty string), ``day`` (UTC
        epoch-day of ts), ``doc_len``, ``ts``. Exactness is cheap here
        because the values ride the same matching-set-sized frames
        ``metrics``/``facets`` use; ES defaults to HLL approximation —
        at corpus-sized standing aggregations the repo's HLL sibling is
        ``text_analysis.distinct_hll`` (same sketch, register-merge).
        Composes with every filtering surface. -> {'result', 'count',
        'data': pa.Table(field, n_distinct, n_docs), 'error'}"""
        if isinstance(fields, str):
            fields = tuple(v.strip() for v in fields.split(",") if v.strip())
        fields = tuple(fields)
        empty = CARDINALITY_SCHEMA.empty_table()
        if not fields or not set(fields) <= set(self.CARDINALITY_FIELDS):
            return {**self._resp(error="bad_field"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        rows = sorted(
            (f, int(len(np.unique(self._cardinality_values(uniq, codes, f)))))
            for f in set(fields)
        )
        tbl = pa.table({
            "field": pa.array([r[0] for r in rows], pa.string()),
            "n_distinct": pa.array([r[1] for r in rows], pa.int64()),
            "n_docs": pa.array([len(uniq)] * len(rows), pa.int64()),
        })
        return {"result": True, "count": int(len(uniq)), "data": tbl,
                "error": None}

    MAX_AGG_RANGES = 100

    def range_agg(
        self,
        query_text: str,
        ranges,
        field: str = "doc_len",
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Arbitrary-boundary bucket counts over the FULL matching set
        (the Elasticsearch ``range`` aggregation; on ``ts`` it is
        ``date_range`` with ISO/epoch-µs bounds). Each range is
        ``(from_, to)`` — from INCLUSIVE, to EXCLUSIVE, either side
        open with ``None`` (ES half-open semantics: a value on a shared
        boundary lands in exactly one of two adjacent buckets).
        Overlapping ranges are legal and count independently (ES
        allows them). ALL requested buckets are emitted IN REQUEST
        ORDER, zero or not (ES emits every range); ``ridx`` pins the
        order through the driver's column-sorted hash. Cost: one sort
        of the matching-set values + two ``searchsorted`` probes per
        range — the same frame ``metrics``/``histogram`` ride,
        overlay-aware, composing with every filtering surface.
        -> {'result', 'count', 'data': pa.Table(ridx, key, range_from,
        range_to, n_docs), 'error'}"""
        empty = RANGE_AGG_SCHEMA.empty_table()
        if field not in ("doc_len", "ts"):
            return {**self._resp(error="bad_field"), "data": empty}
        if not isinstance(ranges, (list, tuple)) or not ranges \
                or len(ranges) > self.MAX_AGG_RANGES:
            return {**self._resp(error="bad_ranges"), "data": empty}
        bounds = parse_agg_ranges(ranges, field, self._ts_us)
        if bounds is None:
            return {**self._resp(error="bad_ranges"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max)
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        v = np.sort(
            self._dl_of_ids(uniq) if field == "doc_len"
            else self._ts_of_ids(uniq)
        ).astype(np.int64)
        n = len(v)
        rows = []
        for i, (lo, hi) in enumerate(bounds):
            a = 0 if lo is None else int(np.searchsorted(v, lo, "left"))
            b = n if hi is None else int(np.searchsorted(v, hi, "left"))
            key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
            rows.append((i, key, lo, hi, max(0, b - a)))
        tbl = pa.table({
            "ridx": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.string()),
            "range_from": pa.array([r[2] for r in rows], pa.int64()),
            "range_to": pa.array([r[3] for r in rows], pa.int64()),
            "n_docs": pa.array([r[4] for r in rows], pa.int64()),
        })
        return {"result": True, "count": n, "data": tbl, "error": None}

    MAX_AGG_FILTERS = 100        # the ES adjacency_matrix default cap
    MAX_PIPELINE_BUCKETS = 65_536  # the ES search.max_buckets default

    def filters_agg(
        self,
        filters: dict[str, str],
        query_text: str | None = None,
        scope: str | None = None,
        conjunctive: bool = False,
    ) -> dict:
        """Named-filter bucket counts (the Elasticsearch ``filters``
        aggregation): each entry of ``filters`` is an independent query
        over this view; its bucket counts the docs matching it — ALL
        named buckets are emitted, zero or not (ES semantics), in key
        order. With ``query_text`` the buckets count within the BASE
        query's matching set (|filter ∩ base| — the agg-under-a-query
        shape ES runs it in). ``scope``/``conjunctive`` apply to every
        matching set. A filter whose text analyzes to nothing is
        ``bad_filter`` (ES rejects an empty filter body); a filter
        whose lemmas are absent from the corpus counts 0. Matching
        sets ride the memoized gaps-only decode — lemmas shared
        between filters (or with the base) decode once per view.
        -> {'result', 'count' (base matching docs; 0 with no base),
        'data': pa.Table(key, n_docs), 'error'}"""
        empty = FILTERS_AGG_SCHEMA.empty_table()
        if not isinstance(filters, dict) or not filters:
            return {**self._resp(error="bad_filter"), "data": empty}
        if len(filters) > self.MAX_AGG_FILTERS:
            return {**self._resp(error="too_many_filters"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        base_ids = None
        n_base = 0
        if query_text is not None:
            terms, err = self.plan(query_text)
            if err == "empty_query":
                return {**self._resp(error="empty_query"), "data": empty}
            if err == "no_results":
                base_ids = np.empty(0, np.int64)
            else:
                base_ids, _ = self._matching_set(terms, scope, conjunctive)
            n_base = int(len(base_ids))
        rows = []
        for key in sorted(filters):
            terms, err = self.plan(str(filters[key]))
            if err == "empty_query":
                return {**self._resp(error="bad_filter"), "data": empty}
            if err == "no_results":
                rows.append((key, 0))
                continue
            ids, _ = self._matching_set(terms, scope, conjunctive)
            if base_ids is not None and len(ids):
                ids = ids[np.isin(ids, base_ids, assume_unique=True)]
            rows.append((key, int(len(ids))))
        tbl = pa.table({
            "key": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        })
        return {"result": True, "count": n_base, "data": tbl, "error": None}

    def adjacency_matrix(
        self,
        filters: dict[str, str],
        scope: str | None = None,
        conjunctive: bool = False,
    ) -> dict:
        """Filter co-occurrence counts (the Elasticsearch
        ``adjacency_matrix`` aggregation): one bucket per named filter
        and one per pair ``a&b`` (a < b, the ES key separator) counting
        docs matching BOTH — the upper-triangular intersection matrix.
        Buckets with zero docs are omitted entirely (ES semantics —
        the response carries only occurring cells). Matching sets are
        ascending-unique docid arrays, so each intersection is one
        vectorized ``np.isin`` over already-decoded frames.
        -> {'result', 'count' (docs in the union), 'data':
        pa.Table(key, n_docs), 'error'}"""
        empty = FILTERS_AGG_SCHEMA.empty_table()
        if not isinstance(filters, dict) or not filters:
            return {**self._resp(error="bad_filter"), "data": empty}
        if len(filters) > self.MAX_AGG_FILTERS:
            return {**self._resp(error="too_many_filters"), "data": empty}
        if any("&" in k for k in filters):
            return {**self._resp(error="bad_filter"), "data": empty}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        sets: dict[str, np.ndarray] = {}
        for key in sorted(filters):
            terms, err = self.plan(str(filters[key]))
            if err == "empty_query":
                return {**self._resp(error="bad_filter"), "data": empty}
            if err == "no_results":
                sets[key] = np.empty(0, np.int64)
                continue
            ids, _ = self._matching_set(terms, scope, conjunctive)
            sets[key] = ids
        keys = sorted(sets)
        rows = [(k, int(len(sets[k]))) for k in keys if len(sets[k])]
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                sa, sb = sets[a], sets[b]
                if len(sa) and len(sb):
                    n = int(np.isin(sa, sb, assume_unique=True).sum())
                    if n:
                        rows.append((f"{a}&{b}", n))
        rows.sort()
        union = (
            np.unique(np.concatenate([s for s in sets.values() if len(s)]))
            if any(len(s) for s in sets.values()) else ()
        )
        tbl = pa.table({
            "key": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
        })
        return {"result": True, "count": int(len(union)), "data": tbl,
                "error": None}

    def histogram_pipeline(
        self,
        query_text: str,
        field: str = "doc_len",
        interval: int = 10,
        window: int = 3,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Pipeline aggregations over the fixed-interval histogram (the
        Elasticsearch ``cumulative_sum`` / ``derivative`` / ``moving_fn``
        bucket post-transforms): the sparse histogram is first
        GAP-FILLED to the full min..max bucket axis with zero counts
        (ES pipeline aggs require ``min_doc_count=0`` for exactly this
        reason), then per bucket:

        - ``cum_docs`` — running sum of counts (cumulative_sum),
        - ``deriv`` — count minus the previous bucket's (derivative;
          NULL on the first bucket, matching ES emitting none),
        - ``mavg`` — trailing-window mean INCLUDING the current bucket
          (moving_fn unweightedAvg with the window clamped at the
          axis start), rounded to 6 dp. The rounded value is
          tie-free for any window < 128: a half-tie at the 6th
          decimal needs the reduced denominator divisible by 2^7, so
          engine/SQL round-half direction can never diverge.

        Bounded by ``MAX_PIPELINE_BUCKETS`` filled buckets (the ES
        ``search.max_buckets`` guard — a microsecond-interval ts
        histogram would otherwise materialize an unbounded axis).
        -> {'result', 'count', 'data': pa.Table(bucket, n_docs,
        cum_docs, deriv, mavg), 'error'}"""
        empty = HISTOGRAM_PIPELINE_SCHEMA.empty_table()
        if not isinstance(window, int) or not 1 <= window < 128:
            return {**self._resp(error="bad_window"), "data": empty}
        base = self.histogram(query_text, field=field, interval=interval,
                              scope=scope, conjunctive=conjunctive,
                              exclude=exclude, ts_min=ts_min, ts_max=ts_max)
        if not base["result"]:
            return {**base, "data": empty}
        hb = base["data"]
        if hb.num_rows == 0:
            return {**base, "data": empty}
        bu = hb.column("bucket").to_numpy()
        bc = hb.column("n_docs").to_numpy()
        n_axis = (int(bu[-1]) - int(bu[0])) // interval + 1
        if n_axis > self.MAX_PIPELINE_BUCKETS:
            return {**self._resp(error="too_many_buckets"), "data": empty}
        axis = bu[0] + np.arange(n_axis, dtype=np.int64) * interval
        filled = np.zeros(n_axis, np.int64)
        filled[(bu - bu[0]) // interval] = bc
        cum = np.cumsum(filled)
        deriv = np.empty(n_axis, np.int64)
        deriv[1:] = np.diff(filled)
        deriv[0] = 0
        shifted = np.zeros(n_axis, np.int64)
        if n_axis > window:
            shifted[window:] = cum[:-window]
        win_sum = cum - shifted
        width = np.minimum(np.arange(1, n_axis + 1), window)
        mavg = np.round(win_sum / width, 6)
        tbl = pa.table({
            "bucket": pa.array(axis, pa.int64()),
            "n_docs": pa.array(filled, pa.int64()),
            "cum_docs": pa.array(cum, pa.int64()),
            "deriv": pa.array(deriv, pa.int64(),
                              mask=np.arange(n_axis) == 0),
            "mavg": pa.array(mavg, pa.float64()),
        })
        return {"result": True, "count": base["count"], "data": tbl,
                "error": None}

    def facets_composite(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
        size: int = 10,
        after: tuple | list | None = None,
    ) -> dict:
        """Paginated multi-source bucket aggregation (the Elasticsearch
        ``composite`` aggregation): the (role, tool) PAIR buckets that
        actually occur in the FULL matching set, in the deterministic
        composite key order (role ASC, tool ASC), one page of ``size``
        buckets per call, resuming STRICTLY AFTER the ``after`` key —
        the aggregation analog of ``search_after``, the shape that lets
        a consumer stream an unbounded bucket space page by page
        without deep-offset re-aggregation. Unlike ``facets`` (two
        independent one-source groupings), composite emits occurring
        pairs. Same cost shape as ``facets``: a bincount over the dense
        scope-code space + an O(#roles x #tools) decode — the bucket
        space never exceeds the code space, so pagination here is an
        API contract, not a memory need (at 10^12 docs with
        high-cardinality sources the per-page cut is what keeps the
        response bounded). Composes with every filtering surface.
        -> {'result', 'count' (matching docs), 'data': pa.Table(role,
        tool, n_docs), 'after_key': (role, tool) | None, 'error'}"""
        empty = COMPOSITE_SCHEMA.empty_table()
        if size <= 0:
            return {**self._resp(error="bad_size"), "data": empty,
                    "after_key": None}
        if after is not None and (
            not isinstance(after, (tuple, list)) or len(after) != 2
        ):
            # a malformed resume key must be an error response, not an
            # IndexError (the bad_cursor convention)
            return {**self._resp(error="bad_after"), "data": empty,
                    "after_key": None}
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty,
                    "after_key": None}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty,
                    "after_key": None}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty,
                    "after_key": None, "error": None}
        uniq, codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty,
                    "after_key": None, "error": None}
        pairs = self._code_pairs()
        per_code = np.bincount(codes, minlength=len(pairs))
        buckets = sorted(
            (pairs[c][0], pairs[c][1], int(per_code[c]))
            for c in np.flatnonzero(per_code)
        )
        if after is not None:
            ak = (str(after[0]), str(after[1]))
            buckets = [b for b in buckets if (b[0], b[1]) > ak]
        page = buckets[:size]
        tbl = pa.table(
            {
                "role": pa.array([b[0] for b in page], pa.string()),
                "tool": pa.array([b[1] for b in page], pa.string()),
                "n_docs": pa.array([b[2] for b in page], pa.int64()),
            }
        )
        after_key = (page[-1][0], page[-1][1]) if len(page) == size else None
        return {"result": True, "count": int(len(uniq)), "data": tbl,
                "after_key": after_key, "error": None}

    def _fg_bg_grouped(self, uniq: np.ndarray):
        """ONE distributed Ray Data scan of the CURRENT index segments
        -> a grouped Dataset of exact (lemma, fg, bg) rows: fg = the
        lemma's LIVE postings inside the broadcast matching-docid set
        ``uniq`` (ray.put once, zero-copy per batch), bg = the lemma's
        LIVE df (overlay tombstone ranges ride as a second broadcast and
        mask stale base postings on BOTH counts). Each batch decodes its
        gaps stream only (tf/dl/poss column-pruned out of the read) and
        emits vocabulary-bounded partials into one groupby. Lemmas the
        overlay TOUCHES (``_delta_lemma``) are not corrected here — the
        caller must skip them in its final map and fold them driver-side
        via ``_touched_fg_bg`` (delta-sized work). Shared by
        ``significant_terms`` and ``rare_terms`` — the matching-set
        term-aggregation family."""
        import ray
        import ray.data as rd
        from ray.data.aggregate import Sum

        m_ref = ray.put(np.ascontiguousarray(uniq))
        overlay = self._has_deltas
        tomb_ref = (
            ray.put((np.ascontiguousarray(self._tomb_starts),
                     np.ascontiguousarray(self._tomb_ends)))
            if overlay else None
        )
        touched = sorted(self._delta_lemma) if overlay else []

        def fg_partials(batch: pa.Table) -> pa.Table:
            import ray as _ray

            from search_engine_ray.stages.encode import (
                binary_column_buffers,
                decode_gaps_range,
            )

            n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(n):
                return pa.table(
                    {
                        "lemma": pa.array([], pa.string()),
                        "fg": pa.array([], pa.int64()),
                        "bg": pa.array([], pa.int64()),
                    }
                )
            cum = np.concatenate(([0], np.cumsum(n)))
            docids = decode_gaps_range(
                binary_column_buffers(batch.column("gaps")), cum, 0, len(n)
            )
            m = _ray.get(m_ref)  # zero-copy plasma view, shared per node
            pos = np.searchsorted(m, docids)
            member = np.zeros(len(docids), bool)
            inb = pos < len(m)
            member[inb] = m[pos[inb]] == docids[inb]
            ts, te = _ray.get(tomb_ref) if tomb_ref is not None else (None, None)
            if ts is not None and len(ts):
                # overlay: count LIVE postings only — stale base postings
                # of re-indexed/deleted conversations are masked by the
                # broadcast tombstone ranges (the _tomb_keep_mask rule)
                idx = np.searchsorted(ts, docids, side="right") - 1
                idxc = np.clip(idx, 0, len(ts) - 1)
                live = ~((idx >= 0) & (docids < te[idxc]))
                member &= live
                bg = np.add.reduceat(live.astype(np.int64), cum[:-1])
            else:
                bg = n
            fg = np.add.reduceat(member.astype(np.int64), cum[:-1])
            t = pa.table(
                {
                    "lemma": batch.column("lemma"),
                    "fg": pa.array(fg, pa.int64()),
                    "bg": pa.array(bg, pa.int64()),
                }
            )
            g = t.group_by("lemma").aggregate([("fg", "sum"), ("bg", "sum")])
            return g.rename_columns(["lemma", "fg", "bg"])

        ds = (
            rd.read_parquet(
                build_mod.index_dir(self.out_dir), columns=["lemma", "n", "gaps"]
            )
            .map_batches(fg_partials, batch_format="pyarrow")
            .groupby("lemma")
            .aggregate(Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg"))
        )
        return ds, touched

    def _touched_fg_bg(self, touched: list[str], uniq: np.ndarray):
        """Exact (lemma, fg, bg) rows for overlay-touched lemmas from
        their merged (overlay-folded) posting decode — delta-sized lemma
        set, df-bounded work per lemma (the frames the query path
        memoizes). Lemmas with no live postings are dropped."""
        if not touched:
            return []
        blocks = self._term_blocks(touched)
        rows = []
        for lem in touched:
            bl = blocks[lem]
            d = self._decode_term_docids(bl, bl.setdefault("chunks", {}))
            if not len(d):
                continue
            p2 = np.searchsorted(uniq, d)
            inb2 = p2 < len(uniq)
            fg_v = int((uniq[p2[inb2]] == d[inb2]).sum())
            rows.append((lem, fg_v, len(d)))
        return rows

    def significant_terms(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        k: int = 10,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Significant-terms aggregation (the Elasticsearch
        ``significant_terms`` shape): vocabulary lemmas most
        OVERREPRESENTED in the query's matching set vs the whole-corpus
        background, ranked by the JLH score ``(fg% - bg%) * (fg% / bg%)``
        (fg% = fg_docs / |matching set|, bg% = df / n_docs), ties broken
        (score DESC, lemma ASC); the query's own lemmas are excluded.

        Foreground counts come from ONE distributed Ray Data scan of the
        CURRENT index segments: each batch of posting blocks decodes its
        gaps stream only (the counting decode — tf/dl/poss untouched and
        column-pruned out of the read), marks members of the broadcast
        matching-docid set with one searchsorted, per-block member
        counts fold by ``reduceat`` (encoder invariant: every block has
        n >= 1), and the batch emits vocabulary-bounded (lemma, fg, bg)
        partials into ONE groupby — bg = Σ block n IS the lemma's df, so
        no dictionary broadcast and nothing corpus-sized anywhere.
        Per-block partial top-k keeps the driver merge at k rows per
        grouped block. The matching-docid set is the documented
        broadcast side (``ray.put`` once, zero-copy ``ray.get`` per
        batch); a standing significant-terms surface over corpus-sized
        matching sets should semi-join on a docid-bucketed key instead.

        Delta overlays fold exactly: the base-segment scan carries the
        tombstone ranges as a second broadcast and counts only LIVE
        postings (both fg membership and the per-block df partial), so
        re-indexed conversations' stale base postings never contribute;
        lemmas the overlay touches (``_delta_lemma``) are excluded from
        the distributed top-k and re-scored driver-side from their
        merged (overlay-folded) posting decode — delta-sized work, the
        same frames the query path already memoizes. Results are pinned
        identical to a fresh rebuild of the modified corpus. Composes
        with the other filtering surfaces like ``facets``.

        -> {'result', 'count' (matching docs), 'data':
        pa.Table(rank, lemma, fg_docs, bg_docs, score), 'error'}
        """
        empty = SIG_TERMS_SCHEMA.empty_table()
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        grouped, touched_all = self._fg_bg_grouped(uniq)
        n_fg = float(len(uniq))
        n_docs = float(self.n_docs)
        qlems = sorted({t[0] for t in terms})
        kk = int(k)
        touched = sorted(set(touched_all) - set(qlems))
        skip_lems = sorted(set(qlems) | set(touched))

        _empty_scored = pa.schema(
            [
                ("lemma", pa.string()),
                ("fg", pa.int64()),
                ("bg", pa.int64()),
                ("score", pa.float64()),
            ]
        ).empty_table()

        def score_topk(batch: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.invert(
                    pc.is_in(
                        batch.column("lemma"),
                        value_set=pa.array(skip_lems, pa.string()),
                    )
                ),
                pc.greater(batch.column("fg"), 0),
            )
            b = batch.filter(keep)
            if not b.num_rows:
                return _empty_scored
            fg = b.column("fg").to_numpy(zero_copy_only=False).astype(np.float64)
            bg = b.column("bg").to_numpy(zero_copy_only=False).astype(np.float64)
            # the exact op sequence the SQL oracle mirrors: one division
            # per rate, then (fgp - bgp) * (fgp / bgp) — IEEE-identical
            fgp = fg / n_fg
            bgp = bg / n_docs
            score = (fgp - bgp) * (fgp / bgp)
            lem = b.column("lemma").to_numpy(zero_copy_only=False)
            sel = np.lexsort((lem, -score))[:kk]
            return pa.table(
                {
                    "lemma": pa.array(lem[sel], pa.string()),
                    "fg": pa.array(
                        b.column("fg").to_numpy(zero_copy_only=False)[sel], pa.int64()
                    ),
                    "bg": pa.array(
                        b.column("bg").to_numpy(zero_copy_only=False)[sel], pa.int64()
                    ),
                    "score": pa.array(score[sel], pa.float64()),
                }
            )

        parts = grouped.map_batches(score_topk, batch_format="pyarrow").to_pandas()
        if parts.empty:
            # an all-empty Ray Data result drops the schema entirely —
            # reinstate the columns so the fold/sort below stays typed
            import pandas as _pd

            parts = _pd.DataFrame(columns=["lemma", "fg", "bg", "score"])
        if touched:
            # overlay-touched lemmas folded driver-side from the merged
            # (overlay-folded) decode, scored with the same op sequence
            import pandas as pd

            rows = []
            for lem, fg_v, bg_v in self._touched_fg_bg(touched, uniq):
                if not fg_v:
                    continue
                fgp = fg_v / n_fg
                bgp = bg_v / n_docs
                rows.append(
                    (lem, fg_v, bg_v, (fgp - bgp) * (fgp / bgp))
                )
            if rows:
                parts = pd.concat(
                    [parts, pd.DataFrame(rows, columns=["lemma", "fg", "bg", "score"])],
                    ignore_index=True,
                )
        parts = parts.sort_values(
            ["score", "lemma"], ascending=[False, True], kind="mergesort"
        ).head(kk)
        data = pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(parts) + 1, dtype=np.int32), pa.int32()
                ),
                "lemma": pa.array(parts["lemma"].tolist(), pa.string()),
                "fg_docs": pa.array(
                    parts["fg"].to_numpy().astype(np.int64), pa.int64()
                ),
                "bg_docs": pa.array(
                    parts["bg"].to_numpy().astype(np.int64), pa.int64()
                ),
                "score": pa.array(parts["score"].to_numpy(), pa.float64()),
            }
        )
        return {"result": True, "count": int(len(uniq)), "data": data, "error": None}

    def rare_terms(
        self,
        query_text: str,
        scope: str | None = None,
        conjunctive: bool = False,
        k: int = 10,
        max_doc_count: int = 10,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
    ) -> dict:
        """Rare-terms aggregation (the Elasticsearch ``rare_terms``
        bucket): vocabulary lemmas occurring in the query's matching
        set whose GLOBAL (live) df is at most ``max_doc_count`` —
        long-tail terms ordinary ``terms`` buckets bury — ranked
        (bg ASC, lemma ASC), top-``k``; the query's own lemmas are
        excluded. Rides the same ONE-distributed-scan frame as
        ``significant_terms`` (``_fg_bg_grouped``): per-block gaps-only
        decode, broadcast matching set, vocabulary-bounded partials
        into one groupby, per-block partial top-k, tombstone-masked
        with overlay-touched lemmas folded driver-side — so the delta
        overlay is exact. Composes with the filtering surfaces like
        ``facets``. All compared columns are integers.

        -> {'result', 'count' (matching docs), 'data':
        pa.Table(rank, lemma, fg_docs, bg_docs), 'error'}"""
        empty = RARE_TERMS_SCHEMA.empty_table()
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": empty}
        if k < 1 or max_doc_count < 1:
            return {**self._resp(error="bad_k" if k < 1 else "bad_max_doc_count"),
                    "data": empty}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": empty}
        if err == "no_results":
            return {"result": True, "count": 0, "data": empty, "error": None}
        uniq, _codes = self._matching_set(
            terms, scope, conjunctive, exclude, ts_min, ts_max
        )
        if not len(uniq):
            return {"result": True, "count": 0, "data": empty, "error": None}
        import pandas as pd

        grouped, touched_all = self._fg_bg_grouped(uniq)
        qlems = sorted({t[0] for t in terms})
        kk, maxdc = int(k), int(max_doc_count)
        touched = sorted(set(touched_all) - set(qlems))
        skip_lems = sorted(set(qlems) | set(touched))

        _empty_rare = pa.schema(
            [("lemma", pa.string()), ("fg", pa.int64()), ("bg", pa.int64())]
        ).empty_table()

        def rare_topk(batch: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.and_(
                    pc.invert(
                        pc.is_in(
                            batch.column("lemma"),
                            value_set=pa.array(skip_lems, pa.string()),
                        )
                    ),
                    pc.greater(batch.column("fg"), 0),
                ),
                pc.less_equal(batch.column("bg"), maxdc),
            )
            b = batch.filter(keep)
            if not b.num_rows:
                return _empty_rare
            lem = b.column("lemma").to_numpy(zero_copy_only=False)
            bg = b.column("bg").to_numpy(zero_copy_only=False)
            sel = np.lexsort((lem, bg))[:kk]
            return pa.table(
                {
                    "lemma": pa.array(lem[sel], pa.string()),
                    "fg": pa.array(
                        b.column("fg").to_numpy(zero_copy_only=False)[sel],
                        pa.int64(),
                    ),
                    "bg": pa.array(bg[sel], pa.int64()),
                }
            )

        parts = grouped.map_batches(rare_topk, batch_format="pyarrow").to_pandas()
        if parts.empty:
            # an all-empty Ray Data result drops the schema entirely —
            # reinstate the columns so the fold/sort below stays typed
            parts = pd.DataFrame(columns=["lemma", "fg", "bg"])
        rows = [
            (lem, fg_v, bg_v)
            for lem, fg_v, bg_v in self._touched_fg_bg(touched, uniq)
            if fg_v > 0 and bg_v <= maxdc
        ]
        if rows:
            parts = pd.concat(
                [parts, pd.DataFrame(rows, columns=["lemma", "fg", "bg"])],
                ignore_index=True,
            )
        parts = parts.sort_values(
            ["bg", "lemma"], ascending=[True, True], kind="mergesort"
        ).head(kk)
        data = pa.table(
            {
                "rank": pa.array(
                    np.arange(1, len(parts) + 1, dtype=np.int32), pa.int32()
                ),
                "lemma": pa.array(parts["lemma"].tolist(), pa.string()),
                "fg_docs": pa.array(
                    parts["fg"].to_numpy().astype(np.int64), pa.int64()
                ),
                "bg_docs": pa.array(
                    parts["bg"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )
        return {"result": True, "count": int(len(uniq)), "data": data, "error": None}

    def _cursor_docid(self, conv_id, turn_idx) -> int | None:
        """(conv_id, turn_idx) -> docid for the search_after cursor, or
        None when the conversation is unknown / turn_idx out of range.
        Resolves the conv rank from the loaded forward index when
        present, else the conv sidecar (rank order == sorted conv_id
        order, so this is a binary-searchable list; at 10^12 docs the
        lookup becomes a row-group-pruned read of the same sorted
        sidecar instead of a full load — one string per conversation is
        the documented small side everywhere else too)."""
        try:
            turn_idx = int(turn_idx)
        except (TypeError, ValueError):
            return None
        if not 0 <= turn_idx < (1 << TURN_BITS):
            return None
        convs = (
            self._fwd[3] if self._fwd is not None
            else build_mod._load_sorted_convs(self.out_dir)
        )
        idx = pc.index(convs, pa.scalar(str(conv_id))).as_py()
        if idx < 0:
            return None
        return (idx << TURN_BITS) | turn_idx

    def _text_of(self, conv_id: str, turn_idx: int) -> str | None:
        """One turn's text, or None when absent — a predicate-pushdown
        point read of the transcripts parquet (the snippet path's
        lookup, narrowed to one (conv, turn)); re-indexed conversations
        read from their delta generation's input files, so the text
        always matches the CURRENT index view."""
        dpaths = getattr(self, "_delta_text_paths", {})
        paths = list(dpaths.get(conv_id) or self.transcripts_paths)
        t = pads.dataset(paths).to_table(
            filter=(pads.field("conv_id") == str(conv_id))
            & (pads.field("turn_idx") == int(turn_idx)),
            columns=["text"],
        )
        if not t.num_rows:
            return None
        return t.column("text")[0].as_py() or ""

    MLT_MAX_TERMS = 25

    def more_like_this(
        self,
        conv_id: str,
        turn_idx: int,
        scope: str | None = None,
        offset: int = 0,
        limit: int = DEFAULT_PAGE_SIZE,
        max_terms: int = MLT_MAX_TERMS,
    ) -> dict:
        """More-like-this (the Elasticsearch ``more_like_this`` shape):
        rank documents similar to one probe turn. The probe's analyzed
        lemma sequence yields per-lemma tf; each corpus-present lemma is
        weighted ``tf * idf`` (the BM25 idf, ``ln(1+(N-df+0.5)/(df+0.5))``
        — one consistent idf across the engine) and the top
        ``max_terms`` by (weight DESC, lemma ASC) become a standard
        disjunctive BM25 query, with the probe turn itself excluded
        from the results and the exact count.

        Term selection reflects tf over the probe's analyzed token
        stream — identical to the indexed tf, so the SQL oracle derives
        the same selection from its analyzer CTEs. Routed through the
        exhaustive scorer (MLT is a discovery surface, not the hot
        path; block-max applies unchanged if needed — the selected
        terms are ordinary dictionary terms). With a live delta overlay
        the df lookups reflect the BASE dictionary (the suggest/fuzzy
        boundary: a probe lemma first introduced by a delta generation
        is skipped until compaction), while the selected terms' postings
        and df DO fold through the overlay.

        -> the standard search response; ``error='not_found'`` when the
        probe (conv_id, turn_idx) has no text in the current view."""
        if not self.valid_scope(scope):
            return self._resp(error="bad_scope")
        text = self._text_of(conv_id, turn_idx)
        if text is None:
            return self._resp(error="not_found")
        analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
        seq = (
            analyze_phrase(text)
            if analyze_phrase is not None
            else self._analyzer.analyze_query(text)
        )
        if not seq:
            return self._resp(count=0)
        from collections import Counter

        weighted = []
        for lem, tf in Counter(seq).items():
            df = self._df_of(lem)
            if df:
                weighted.append((-tf * self.idf(df), lem, df))
        weighted.sort()
        sel = [(lem, df) for _w, lem, df in weighted[:max_terms]]
        if not sel:
            return self._resp(count=0)
        terms = sorted(sel, key=lambda t: (t[1], t[0]))
        if self._has_deltas:
            blocks = self._term_blocks([t[0] for t in terms])
            terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
            terms = [(lem, df) for lem, df in terms if df > 0]
            if not terms:
                return self._resp(count=0)
        src = self._cursor_docid(conv_id, turn_idx)
        ids, scores = self.score_exhaustive(terms, scope, False)
        if src is not None and len(ids):
            keep = ids != src
            ids, scores = ids[keep], scores[keep]
        count = len(ids)
        ids, scores = self._topk(ids, scores, offset + limit)
        ids, scores = ids[offset:], scores[offset:]
        tbl = self._enrich(ids, scores, terms, False)
        return {"result": True, "count": int(count), "data": tbl, "error": None}

    def search_conversations(
        self,
        query_text: str,
        scope: str | None = None,
        offset: int = 0,
        limit: int = DEFAULT_PAGE_SIZE,
        conjunctive: bool = False,
    ) -> dict:
        """Conversation-level ranking: group the turn-level BM25 matching
        set by conversation and rank conversations by their best turn's
        score (max-passage aggregation — the standard passage-to-document
        rule), carrying the matching-turn count and the best turn's
        index. The analog of grouping the reference's page results by
        site; Elasticsearch ships the same shape as a ``top_hits``
        collapse.

        Evaluation rides the exhaustive scorer's sorted full matching
        set: docid order IS (conv_id, turn_idx) order, so grouping is a
        boundary scan (``reduceat`` max / count per contiguous conv run
        — no shuffle, no hash map) and the best turn is the FIRST
        turn-index position achieving the group max (deterministic at
        exact float ties; both engines compute bit-identical sums for
        identical (tf, dl) turn pairs, so the tie-break agrees).
        Conversation tie-break: (score DESC, conv_id ASC) — conv_rank
        ascending is conv_id-lexicographic by construction (docid.py).

        -> {'result', 'count' (matching CONVERSATIONS), 'data':
        pa.Table(conv_id, n_turns, best_turn_idx, score), 'error'}.
        Missing-lemma semantics match every other mode (any absent query
        lemma -> zero results)."""
        if not self.valid_scope(scope):
            return {**self._resp(error="bad_scope"), "data": CONV_RESULT_SCHEMA.empty_table()}
        terms, err = self.plan(query_text)
        if err == "empty_query":
            return {**self._resp(error="empty_query"), "data": CONV_RESULT_SCHEMA.empty_table()}
        empty_ok = {"result": True, "count": 0, "data": CONV_RESULT_SCHEMA.empty_table(), "error": None}
        if err == "no_results":
            return empty_ok
        ids, scores = self.score_exhaustive(terms, scope, conjunctive)
        if not len(ids):
            return empty_ok
        cr = ids >> np.int64(TURN_BITS)
        neq = np.empty(len(cr), bool)
        neq[0] = True
        np.not_equal(cr[1:], cr[:-1], out=neq[1:])
        starts = np.flatnonzero(neq)
        counts = np.diff(np.append(starts, len(cr)))
        cmax = np.maximum.reduceat(scores, starts)
        is_max = scores == np.repeat(cmax, counts)
        pos = np.where(is_max, np.arange(len(cr), dtype=np.int64), len(cr))
        best_pos = np.minimum.reduceat(pos, starts)
        count = len(starts)
        k = offset + limit
        win_rank, win_scores = self._topk(cr[starts], cmax, k)
        gi = np.searchsorted(cr[starts], win_rank)
        win_rank, win_scores, gi = win_rank[offset:], win_scores[offset:], gi[offset:]
        best_doc = ids[best_pos[gi]]
        et = self._enrich(best_doc, win_scores, terms, False)
        tbl = pa.table(
            {
                "conv_id": et.column("conv_id"),
                "n_turns": pa.array(counts[gi].astype(np.int64), pa.int64()),
                "best_turn_idx": et.column("turn_idx"),
                "score": et.column("score"),
            }
        )
        return {"result": True, "count": int(count), "data": tbl, "error": None}

    # ---------------- reference-parity scorer (G3/G4, D4, J4) ----------

    def _max_relevance(self) -> float:
        """Global max per-doc Σtf — the reference's cached denominator
        (``SearchServiceImpl.java:25,147-153``; ``IndexRepository.java:14-16``).
        doc_len == Σtf per doc, so this is max(doc_len)."""
        if self._ref_max_relevance is None:
            if self._has_deltas:
                t = pq.read_table(
                    build_mod.docs_dir(self.out_dir), columns=["docid", "doc_len"]
                )
                keep = self._tomb_keep_mask(t.column("docid").to_numpy())
                dls = t.column("doc_len").to_numpy()[keep]
                ddl = self._delta_docs["dl"]
                m = max(
                    int(dls.max()) if len(dls) else 0,
                    int(ddl.max()) if len(ddl) else 0,
                )
            else:
                # max(doc_len) from parquet ROW-GROUP STATISTICS — zero
                # data read (exact for int columns written by arrow); a
                # full doc_len column pull is corpus-sized at scale
                d = build_mod.docs_dir(self.out_dir)

                def _stats_max() -> int | None:
                    mx = 0
                    for f in sorted(os.listdir(d)):
                        if not f.endswith(".parquet"):
                            continue
                        md = pq.ParquetFile(os.path.join(d, f)).metadata
                        ci = md.schema.to_arrow_schema().get_field_index(
                            "doc_len"
                        )
                        for rg in range(md.num_row_groups):
                            st = md.row_group(rg).column(ci).statistics
                            if st is None or not st.has_min_max:
                                return None  # stats absent: full read
                            mx = max(mx, int(st.max))
                    return mx

                m = _stats_max()
                if m is None:
                    t = pq.read_table(d, columns=["doc_len"])
                    m = pc.max(t.column("doc_len")).as_py()
            self._ref_max_relevance = float(m or 1)
        return self._ref_max_relevance

    # ---------------- prefix (wildcard) term expansion -----------------

    PREFIX_MIN_LEN = 2
    PREFIX_MAX_EXPANSION = 32
    FUZZY_MAX_EXPANSION = 16

    def expand_prefix(self, prefix: str, max_expansion: int = PREFIX_MAX_EXPANSION):
        """Vocabulary lemmas starting with ``prefix`` (analyzer-folded),
        capped at ``max_expansion`` by (df DESC, lemma ASC) — the
        wildcard-query expansion step. Below the preload threshold this
        scans the in-memory dict; above it the LEMMA-SORTED dictionary
        parquet makes the prefix a contiguous row-group range —
        ``filters=[('lemma','>=',p),('lemma','<',p+chr(0x10FFFF))]``
        prunes to the matching groups (no vocabulary-sized driver
        state). Returns [(lemma, df), ...]."""
        toks = self._norm_text(prefix or "").split()
        if not toks or len(toks[0]) < self.PREFIX_MIN_LEN:
            return []
        p = toks[0]
        if self._df is not None:
            hits = [(l, int(d)) for l, d in self._df.items() if l.startswith(p)]
        else:
            t = pq.read_table(
                build_mod.lemma_dict_path(self.out_dir),
                columns=["lemma", "df"],
                filters=[("lemma", ">=", p), ("lemma", "<", p + chr(0x10FFFF))],
            )
            hits = [
                (l, int(d))
                for l, d in zip(t.column("lemma").to_pylist(), t.column("df").to_pylist())
                if l.startswith(p)
            ]
        hits.sort(key=lambda r: (-r[1], r[0]))
        return hits[:max_expansion]

    WILDCARD_MAX_EXPANSION = 32

    def expand_wildcard(self, pattern: str,
                        max_expansion: int = WILDCARD_MAX_EXPANSION):
        """Vocabulary lemmas matching a Lucene-style wildcard pattern
        (``*`` any run, ``?`` one char; anchored over the whole lemma),
        capped at ``max_expansion`` by (df DESC, lemma ASC) — the same
        rewrite cap rule as ``expand_prefix``. Below the preload
        threshold the match is one vectorized RE2 pass over the
        in-memory vocabulary (pyarrow ``match_substring_regex`` with
        explicit anchors); above it the lemma-sorted dictionary parquet
        is range-pruned to the pattern's literal prefix (a leading
        wildcard scans the whole dictionary — bounded by the dictionary,
        never the corpus) and the same kernel filters the pruned read.
        Returns ``[(lemma, df), ...]``, or None for an unparseable /
        under-literal pattern (``analyzer.wildcard_parse``'s guard)."""
        parsed = analyzer.wildcard_parse(pattern)
        if parsed is None:
            return None
        rx, lit = parsed
        anchored = "^(?:" + rx + ")$"
        if self._df is not None:
            keys = pa.array(list(self._df.keys()), pa.string())
            mask = pc.match_substring_regex(keys, anchored)
            hits = [(l, int(self._df[l]))
                    for l in pc.filter(keys, mask).to_pylist()]
        else:
            filters = None
            if lit:
                filters = [("lemma", ">=", lit),
                           ("lemma", "<", lit + chr(0x10FFFF))]
            t = pq.read_table(
                build_mod.lemma_dict_path(self.out_dir),
                columns=["lemma", "df"], filters=filters,
            )
            t = t.filter(pc.match_substring_regex(t.column("lemma"), anchored))
            hits = [(l, int(d))
                    for l, d in zip(t.column("lemma").to_pylist(),
                                    t.column("df").to_pylist())]
        hits.sort(key=lambda r: (-r[1], r[0]))
        return hits[:max_expansion]

    REGEXP_MAX_EXPANSION = 32

    def expand_regexp(self, pattern: str,
                      max_expansion: int = REGEXP_MAX_EXPANSION):
        """Vocabulary lemmas matching a Lucene-RegexpQuery-style
        pattern (anchored over the whole lemma), capped at
        ``max_expansion`` by (df DESC, lemma ASC) — the same rewrite
        cap rule as ``expand_wildcard``, and the same two dictionary
        regimes: one vectorized RE2 pass over the in-memory vocabulary
        below the preload threshold, a literal-prefix range-pruned
        scan of the lemma-sorted dictionary parquet above it (a
        pattern opening with syntax scans the whole dictionary —
        bounded by the dictionary, never the corpus). Returns
        ``[(lemma, df), ...]``, or None for an invalid pattern
        (``analyzer.regexp_parse``'s charset/RE2-compile guard)."""
        parsed = analyzer.regexp_parse(pattern)
        if parsed is None:
            return None
        rx, lit = parsed
        anchored = "^(?:" + rx + ")$"
        if self._df is not None:
            keys = pa.array(list(self._df.keys()), pa.string())
            mask = pc.match_substring_regex(keys, anchored)
            hits = [(l, int(self._df[l]))
                    for l in pc.filter(keys, mask).to_pylist()]
        else:
            filters = None
            if lit:
                filters = [("lemma", ">=", lit),
                           ("lemma", "<", lit + chr(0x10FFFF))]
            t = pq.read_table(
                build_mod.lemma_dict_path(self.out_dir),
                columns=["lemma", "df"], filters=filters,
            )
            t = t.filter(pc.match_substring_regex(t.column("lemma"), anchored))
            hits = [(l, int(d))
                    for l, d in zip(t.column("lemma").to_pylist(),
                                    t.column("df").to_pylist())]
        hits.sort(key=lambda r: (-r[1], r[0]))
        return hits[:max_expansion]

    def complete(self, prefix: str, k: int = 10) -> dict:
        """Completion suggester (the Elasticsearch suggest-as-you-type
        shape, df-weighted): the top-``k`` vocabulary lemmas starting
        with the analyzer-folded prefix, ranked (df DESC, lemma ASC) —
        a public surface over ``expand_prefix``'s contiguous
        lemma-sorted dictionary range (row-group-pruned above the
        preload threshold, nothing vocabulary-sized on the driver).
        -> {'result', 'count' (matches before the cap), 'data':
        pa.Table(lemma, df), 'error'}"""
        empty = COMPLETE_SCHEMA.empty_table()
        if k <= 0:
            return {**self._resp(error="bad_k"), "data": empty}
        toks = self._norm_text(prefix or "").split()
        if not toks or len(toks[0]) < self.PREFIX_MIN_LEN:
            return {**self._resp(error="short_prefix"), "data": empty}
        hits = self.expand_prefix(prefix, max_expansion=1 << 30)
        page = hits[:k]
        tbl = pa.table(
            {
                "lemma": pa.array([h[0] for h in page], pa.string()),
                "df": pa.array([h[1] for h in page], pa.int64()),
            }
        )
        return {"result": True, "count": len(hits), "data": tbl,
                "error": None}

    # ---------------- fuzzy term suggestions (did-you-mean) -----------

    def suggest(self, term: str, max_dist: int = 2, k: int = 5) -> pa.Table:
        """Vocabulary terms within ``max_dist`` edits of ``term`` (after
        the analyzer's charset fold), ranked (distance ASC, df DESC,
        lemma ASC), top-``k`` — the did-you-mean primitive the reference
        lacks entirely. Below the dictionary-preload threshold the sweep
        runs over the in-memory lemma->df dict (banded Levenshtein with
        a length prefilter — |len diff| > max_dist can never match);
        above it the SAME per-batch function maps over the
        lemma-dictionary parquet as a distributed scan with per-block
        partial top-k (nothing vocabulary-sized on the driver). Both
        paths are pinned equal by test at a forced low threshold.

        Returns ``(suggestion, df, dist)``. Suggestions reflect the BASE
        dictionary: delta-only lemmas join at the next compaction, and a
        lemma whose every posting was tombstoned by a live delta may
        still be suggested with its stale df until then (a vocabulary
        hint, not a result set — searching it simply returns 0 docs;
        drift is bounded by the delta volume)."""
        toks = self._norm_text(term or "").split()
        if not toks:
            return pa.table(
                {"suggestion": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.int32())}
            )
        tok = toks[0]
        if self._df is not None:
            rows = _suggest_scan(tok, self._df.items(), max_dist)
            rows.sort(key=lambda r: (r[2], -r[1], r[0]))
            rows = rows[:k]
        else:  # distributed dictionary sweep (vocab > preload threshold)
            import ray.data as _rd

            def part(batch: pa.Table) -> pa.Table:
                got = _suggest_scan(
                    tok,
                    zip(batch.column("lemma").to_pylist(),
                        batch.column("df").to_pylist()),
                    max_dist,
                )
                got.sort(key=lambda r: (r[2], -r[1], r[0]))
                got = got[:k]
                return pa.table(
                    {"suggestion": pa.array([g[0] for g in got], pa.string()),
                     "df": pa.array([g[1] for g in got], pa.int64()),
                     "dist": pa.array([g[2] for g in got], pa.int32())}
                )

            parts = _rd.read_parquet(
                build_mod.lemma_dict_path(self.out_dir), columns=["lemma", "df"]
            ).map_batches(part, batch_format="pyarrow")
            import ray as _ray

            tabs = [t for t in _ray.get(parts.materialize().to_arrow_refs()) if t.num_rows]
            rows = []
            for t in tabs:
                rows.extend(
                    zip(t.column("suggestion").to_pylist(),
                        t.column("df").to_pylist(),
                        t.column("dist").to_pylist())
                )
            rows.sort(key=lambda r: (r[2], -r[1], r[0]))
            rows = rows[:k]
        return pa.table(
            {
                "suggestion": pa.array([r[0] for r in rows], pa.string()),
                "df": pa.array([int(r[1]) for r in rows], pa.int64()),
                "dist": pa.array([int(r[2]) for r in rows], pa.int32()),
            }
        )

    def suggest_query(self, query_text: str, max_dist: int = 2) -> dict:
        """Whole-query did-you-mean (the Elasticsearch phrase-suggester
        shape, one candidate per token): normalize + stopword/length
        filter the raw query with the index's analyzer rules, then per
        surviving token — if its LEMMA is in the dictionary the token
        needs no rescue (the lemma is the suggestion, its own df rides
        along); otherwise the ``suggest`` rule picks the best
        vocabulary candidate by (distance ASC, df DESC, lemma ASC)
        within ``max_dist`` edits of the normalized token; a token with
        no candidate at all keeps itself (dist -1, df 0 — visible but
        unfixable). ``dist`` is always the EXACT unbounded edit
        distance between suggestion and token (an inflected present
        token legitimately shows dist > 0: 'running' -> lemma 'run').
        ``corrected`` joins the suggestions in token order — feed it
        back to ``search``. Base-dictionary semantics like ``suggest``
        (delta drift bounded, documented there). -> {'result',
        'corrected', 'changed': bool, 'count' (surviving tokens),
        'data': pa.Table(pos, token, suggestion, df, dist), 'error'}"""
        toks = [
            t for t in self._norm_text(query_text or "").split()
            if len(t) >= self._min_token_len and t not in self._stopset
        ]
        empty = SUGGEST_QUERY_SCHEMA.empty_table()
        if not toks:
            return {**self._resp(error="empty_query"), "data": empty,
                    "corrected": "", "changed": False}
        rows = []
        for pos, tok in enumerate(toks):
            lem = self._lemmatize_token(tok)
            df = self._df_of(lem)
            if df is not None:
                rows.append((pos, tok, lem, int(df), _lev(lem, tok)))
                continue
            cand = self.suggest(tok, max_dist=max_dist, k=1)
            if cand.num_rows:
                rows.append((
                    pos, tok,
                    cand.column("suggestion")[0].as_py(),
                    int(cand.column("df")[0].as_py()),
                    _lev(cand.column("suggestion")[0].as_py(), tok),
                ))
            else:
                rows.append((pos, tok, tok, 0, -1))
        corrected = " ".join(r[2] for r in rows)
        tbl = pa.table(
            {
                "pos": pa.array([r[0] for r in rows], pa.int32()),
                "token": pa.array([r[1] for r in rows], pa.string()),
                "suggestion": pa.array([r[2] for r in rows], pa.string()),
                "df": pa.array([r[3] for r in rows], pa.int64()),
                "dist": pa.array([r[4] for r in rows], pa.int32()),
            }
        )
        return {
            "result": True,
            "count": len(rows),
            "corrected": corrected,
            "changed": any(r[1] != r[2] for r in rows),
            "data": tbl,
            "error": None,
        }

    # ---------------- phrase queries (positions) -----------------------

    @property
    def has_positions(self) -> bool:
        """Phrase queries need the per-posting position stream — built
        into the index when ``BuildConfig.store_positions`` (default)
        and the analyzer emits positions; with live delta generations
        every generation must carry them too."""
        if not self.manifest["stats"].get("positions", False):
            return False
        return (not self._has_deltas) or self._delta_positions_ok

    def _term_positions_full(self, bl: dict, tf_full: np.ndarray) -> np.ndarray:
        """Flat absolute positions of a term's FULL posting list
        (``tf_full`` = the already-decoded tf stream; posting i owns
        ``pos[cumsum(tf)[i] : cumsum(tf)[i+1]]``). Memoized per term —
        ONE varint pass over the poss column."""
        if bl.get("pos_flat") is not None:  # synthetic overlay blocks
            return bl["pos_flat"]
        got = bl.get("pos_full")
        if got is None:
            got = decode_poss_range(
                bl["poss"], bl["cum_cf"], 0, len(bl["first"]), tf_full
            )
            bl["pos_full"] = got
        return got

    def score_phrase(self, phrase: list[str], k: int, scope: str | None = None,
                     within_first: int | None = None):
        """Exact phrase match + BM25 ranking: a doc matches iff the
        phrase lemmas appear at CONSECUTIVE positions of its
        surviving-token sequence (the generalization of the reference's
        only adjacency-aware code, the snippet best-window scan —
        ``services/search/SnippetCreator.java:84-102``); matches are
        ranked by BM25 over the phrase's distinct lemmas with the
        standard (score DESC, docid ASC) tie-break.

        Returns ``(ids, scores, count)`` or ``None`` for no-results
        (a phrase lemma absent from the corpus)."""
        got = self._phrase_matches(phrase, scope, within_first=within_first)
        if got is None:
            return None
        matched, terms, data = got
        empty = (np.empty(0, np.int64), np.empty(0, np.float64), 0)
        if not len(matched):
            return empty
        score = self._bm25_at(terms, data, matched, present=True)
        ids, scores = self._topk(matched, score, len(matched) if k is None else k)
        return ids, scores, len(matched)

    def score_phrase_prefix(self, phrase: list[str], alts: list[str], k: int,
                            scope: str | None = None):
        """Match-phrase-prefix (the Elasticsearch ``match_phrase_prefix``
        / Lucene MultiPhraseQuery rewrite): a doc matches iff the fixed
        lemma sequence appears at consecutive positions with ANY of the
        ``alts`` lemmas (the prefix expansion) at the following
        position. The prefix slot FILTERS, the fixed lemmas SCORE —
        ``score_auto``'s phrase-as-filter precedent keeps the score a
        pure function of the fixed phrase, so typing one more prefix
        character never re-ranks the already-typed words.

        Returns ``(ids, scores, count)`` or ``None`` when a FIXED lemma
        is absent (reference missing-lemma semantics; a dead expansion
        lemma just drops from the alternatives)."""
        got = self._phrase_matches(phrase, scope, last_alts=alts)
        if got is None:
            return None
        matched, terms, data = got
        empty = (np.empty(0, np.int64), np.empty(0, np.float64), 0)
        if not len(matched):
            return empty
        score = self._bm25_at(terms, data, matched, present=True)
        ids, scores = self._topk(matched, score, len(matched) if k is None else k)
        return ids, scores, len(matched)

    def _bm25_at(self, terms, data, matched: np.ndarray, present: bool = False):
        """BM25 sum over ``terms`` at the sorted docids ``matched``
        (df-asc term order — the deterministic summation order of every
        mode). ``present=True`` asserts matched ⊆ each term's posting
        list (phrase AND guarantees it); otherwise absent terms add 0.0
        (a float64 no-op, same as the candidate-driven scorer)."""
        score = np.zeros(len(matched), np.float64)
        k1, b = self.k1, self.b
        for lem, df in sorted(terms, key=lambda t: (t[1], t[0])):
            docid, tf, dl, _sc = data[lem]
            if not len(docid):
                continue
            pidx = np.searchsorted(docid, matched)
            if present:
                sel = slice(None)
                pc_ = pidx
            else:
                pc_ = np.clip(pidx, 0, len(docid) - 1)
                hit = docid[pc_] == matched
                sel = np.flatnonzero(hit)
                pc_ = pc_[sel]
            tff = tf[pc_].astype(np.float64)
            dlf = dl[pc_].astype(np.float64)
            contrib = self.idf(df) * (tff * (k1 + 1.0)) / (
                tff + k1 * (1.0 - b + b * dlf / self.avgdl)
            )
            if present:
                score += contrib
            else:
                score[sel] += contrib
        return score

    def score_auto(
        self,
        phrases: list[list[str]],
        loose: list[str],
        exclude_text: str | None,
        k: int,
        scope: str | None = None,
    ):
        """Boolean search-box evaluation (mode='auto'): candidates =
        docs matching EVERY quoted phrase (AND of exact-phrase match
        sets) — or, with no phrases, the disjunctive union of the loose
        lemmas' docs — minus the NOT-term docs; score = BM25 over ALL
        distinct positive lemmas (phrase + loose) at the candidates,
        loose lemmas adding 0.0 where absent (phrases act as FILTERS,
        loose terms as ranking signals — Lucene's quoted-clause
        semantics). Any positive lemma absent from the corpus -> no
        results (reference missing-lemma semantics, every mode).
        Returns ``(ids, scores, count)`` or ``None``."""
        empty = (np.empty(0, np.int64), np.empty(0, np.float64), 0)
        all_terms: dict[str, int] = {}
        matched = None
        data_all: dict[str, tuple] = {}
        for ph in phrases:
            got = self._phrase_matches(ph, scope)
            if got is None:
                return None
            m, terms, data = got
            all_terms.update(dict(terms))
            data_all.update(data)
            matched = m if matched is None else np.intersect1d(
                matched, m, assume_unique=True
            )
            if not len(matched):
                return empty
        if loose:
            lterms = []
            for lem in dict.fromkeys(loose):
                df = self._df_of(lem)
                if df is None and self._has_deltas and lem in self._delta_lemma:
                    df = 0
                if df is None:
                    return None
                lterms.append((lem, df))
            blocks = self._term_blocks([t[0] for t in lterms])
            if self._has_deltas:
                lterms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in lterms]
                if any(df == 0 for _, df in lterms):
                    return None
            lut = self._scope_lut(scope) if scope else None
            parts = []
            for lem, df in lterms:
                bl = blocks[lem]
                dec = self._decode_term(bl, 0, len(bl["first"]), bl.setdefault("chunks", {}))
                data_all[lem] = dec
                all_terms[lem] = df
                if matched is None:  # no phrases: loose docs are the candidates
                    docid, _tf, _dl, sc = dec
                    parts.append(docid[lut[sc]] if lut is not None else docid)
            if matched is None:
                if not parts:
                    return empty
                allv = np.concatenate(parts)
                if not len(allv):
                    return empty
                matched = np.unique(allv)
        if matched is None or not len(matched):
            return empty
        if exclude_text:
            excl = self._exclusion_docids(exclude_text)
            if excl is not None and len(excl):
                keep = ~np.isin(matched, excl, assume_unique=False)
                matched = matched[keep]
                if not len(matched):
                    return empty
        terms = sorted(all_terms.items(), key=lambda t: (t[1], t[0]))
        score = self._bm25_at(terms, data_all, matched, present=False)
        ids, scores = self._topk(matched, score, k)
        return ids, scores, len(matched)

    def _phrase_matches(self, phrase: list[str], scope: str | None = None,
                        within_first: int | None = None,
                        last_alts: list[str] | None = None):
        """Match side of the phrase operator: ``(matched_docids, terms,
        data)`` with ``matched`` sorted, ``terms`` = distinct (lemma,
        effective df), ``data`` = full per-lemma decodes (chunk-memoized
        in the block cache — callers scoring afterwards pay no second
        varint pass). ``None`` = a phrase lemma is absent (reference
        missing-lemma semantics). Evaluation is slot-at-a-time set
        intersection: docid AND-intersection first (rarest term first —
        candidates shrink before any position work), then per-slot
        position keys ``(cand_idx << 32) | (pos - slot_offset)``
        intersected across slots; positions decode ONLY for the
        intersected candidates' postings.

        ``within_first`` (Lucene SpanFirstQuery): the matched phrase
        span must END within the doc's first N surviving-token
        positions — start + len(phrase) <= N, one vectorized mask over
        the already-intersected start-position keys (zero extra decode
        work; the low 32 key bits ARE the start positions)."""
        distinct = list(dict.fromkeys(phrase))
        terms = []
        for lem in distinct:
            df = self._df_of(lem)
            if df is None and self._has_deltas and lem in self._delta_lemma:
                df = 0
            if df is None:
                return None  # reference semantics: missing lemma -> none
            terms.append((lem, df))
        alts = [a for a in (last_alts or []) if a not in set(distinct)]
        blocks = self._term_blocks(distinct + alts, need_positions=True)
        if self._has_deltas:
            terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
            if any(df == 0 for _, df in terms):
                return None

        # full (docid, tf, dl, sc) decode per distinct lemma
        data: dict[str, tuple] = {}
        for lem, _df in terms:
            bl = blocks[lem]
            data[lem] = self._decode_term(
                bl, 0, len(bl["first"]), bl.setdefault("chunks", {})
            )
        alive_alts: list[str] = []
        if last_alts is not None:
            # the final slot matches ANY of the alternative lemmas
            # (match_phrase_prefix's expansion set). Dead alternatives
            # (overlay-tombstoned) drop silently — unlike a missing
            # FIXED lemma, one dead expansion doesn't kill the query.
            for lem in dict.fromkeys(last_alts):
                bl = blocks[lem]
                if self._has_deltas and int(bl["cum_n"][-1]) == 0:
                    continue
                if lem not in data:
                    data[lem] = self._decode_term(
                        bl, 0, len(bl["first"]), bl.setdefault("chunks", {})
                    )
                alive_alts.append(lem)

        lut = self._scope_lut(scope) if scope else None
        empty = (np.empty(0, np.int64), terms, data)
        shift = np.int64(1) << np.int64(32)
        df_of = dict(terms)
        # hot-bigram aux (pipelines/phrase_aux.py): adjacent slot pairs
        # with a precomputed adjacency list become ONE pseudo slot keyed
        # at the LEFT offset with the pair's start positions — exact,
        # because "a@p and b@p+1" is precisely the pair entry, and
        # intersecting its (cand_idx, start - j) keys with the other
        # slots' keys enforces the rest of the phrase. Greedy
        # left-to-right cover; under live delta generations each pair
        # list is composed with the overlay (_aux_overlay: tombstoned
        # entries dropped, delta adjacency appended) — exact, pinned
        # against the no-aux path by test.
        covered: set[int] = set()
        pseudo: list[tuple[int, int, tuple]] = []  # (df_rank, j, payload)
        pos_ok = not self._has_deltas or self._delta_positions_ok
        if (self._aux_pairs or self._pair_lru) and pos_ok:
            jj = 0
            while jj + 1 < len(phrase):
                pr = (phrase[jj], phrase[jj + 1])
                if jj not in covered and pr in self._aux_pairs:
                    payload = self._aux_pair(pr)
                elif jj not in covered and pr in self._pair_lru:
                    payload = self._pair_lru_get(pr)
                else:
                    jj += 1
                    continue
                pseudo.append((len(payload[0]), jj, payload))
                covered.update((jj, jj + 1))
                jj += 2
        if (
            pos_ok
            and not covered
            and len(phrase) == 2
            and scope is None
            and last_alts is None
            and df_of[phrase[0]] + df_of[phrase[1]] >= self.PAIR_CACHE_MIN_COST
        ):
            # unindexed hot-hot bigram: an UNSCOPED query's adjacency
            # work below is the full pair intersection anyway — do it
            # ONCE as the complete pair list, cache it, and serve this
            # query from the payload. SCOPED queries never trigger the
            # build (a selective scope bounds the exact path's work far
            # below full-pair cost) but DO serve from a cached payload
            # via the cover loop above (payloads are scope-agnostic;
            # the full-cover shortcut applies the scope mask).
            payload = self._build_pair_cache(
                phrase[0], phrase[1], blocks, data
            )
            pseudo.append((len(payload[0]), 0, payload))
            covered.update((0, 1))

        # candidate docids: AND over distinct lemmas, scope-masked.
        # When pseudo units cover EVERY slot, the smallest payload's
        # docids already are a complete candidate superset (each match
        # contains that pair adjacently), so the full-posting-list AND
        # pre-intersection — the dominant cost of a warm cached hot-hot
        # query (a 2x|postings| sort) — is skipped; scope masks via one
        # member lemma's per-posting codes (scope is doc-level).
        if pseudo and len(covered) == len(phrase):
            smallest = min(pseudo, key=lambda u: (u[0], u[1]))
            cand = np.unique(smallest[2][0])
            if lut is not None and len(cand):
                docid0, _t0, _d0, sc0 = data[phrase[smallest[1]]]
                cand = cand[lut[sc0[np.searchsorted(docid0, cand)]]]
        else:
            cand = None
            for lem, _df in sorted(terms, key=lambda t: (t[1], t[0])):
                docid, _tf, _dl, sc = data[lem]
                d = docid[lut[sc]] if lut is not None else docid
                cand = d if cand is None else np.intersect1d(
                    cand, d, assume_unique=True
                )
                if not len(cand):
                    break
        if cand is None or not len(cand):
            return empty
        if last_alts is not None:
            # shrink candidates to docs containing SOME alternative
            # before any position work (the fixed slots' AND precedent);
            # cand is already scope-masked by the fixed slots, so the
            # union needs no LUT pass of its own
            if not alive_alts:
                return empty
            union = np.unique(np.concatenate([data[a][0] for a in alive_alts]))
            cand = np.intersect1d(cand, union, assume_unique=True)
            if not len(cand):
                return empty

        # adjacency: per slot j, keys (cand_idx << 32) | (pos - j).
        # Slots evaluate in ASCENDING-df order (intersection is
        # commutative over slots), and the candidate set SHRINKS after
        # every slot — a hot slot then gathers/keys positions only for
        # docs still alive after the rare slots, so a rare+hot phrase
        # pays rare-sized position work, not hot-sized (hot-hot phrases
        # are inherently positions-bound; measured at sf1 in
        # BENCH/BASELINE.md).
        slot_order = sorted(
            (j for j in range(len(phrase)) if j not in covered),
            key=lambda j: (df_of[phrase[j]], j),
        )
        units: list[tuple[int, int, tuple | None]] = sorted(
            [(df_of[phrase[j]], j, None) for j in slot_order]
            + [(rank, j, payload) for rank, j, payload in pseudo],
            key=lambda u: (u[0], u[1]),
        )
        cur = None
        for _rank, j, payload in units:
            if payload is None:
                lem = phrase[j]
                docid, tf, _dl, _sc = data[lem]
                pos_flat = self._term_positions_full(blocks[lem], tf)
                pidx = np.searchsorted(docid, cand)  # cand ⊆ docid by AND
                p = _take_pos_groups(pos_flat, tf, pidx)
                cnt = tf[pidx].astype(np.int64)
                cidx = np.repeat(np.arange(len(cand), dtype=np.int64), cnt)
            else:
                d_e, cnts, starts = payload
                if not len(cand):
                    return empty
                pidx = np.searchsorted(cand, d_e)
                pidx_c = np.minimum(pidx, len(cand) - 1)
                mask = cand[pidx_c] == d_e
                sel = np.flatnonzero(mask)
                if not len(sel):
                    return empty
                p = _take_pos_groups(starts, cnts, sel)
                cnt = cnts[sel]
                cidx = np.repeat(pidx_c[sel].astype(np.int64), cnt)
            ok = p >= j
            keys = cidx[ok] * shift + (p[ok] - np.int64(j))
            if payload is not None:
                # fragmented aux block rows can repeat a docid; keys
                # stay distinct (distinct starts) but arrive unsorted
                keys = np.unique(keys)
            cur = keys if cur is None else np.intersect1d(cur, keys, assume_unique=True)
            if not len(cur):
                return empty
            alive = np.unique(cur >> np.int64(32))
            if len(alive) < len(cand):  # shrink + remap key doc-indices
                cur = (
                    np.searchsorted(alive, cur >> np.int64(32)) * shift
                    + (cur & (shift - 1))
                )
                cand = cand[alive]
        if last_alts is not None:
            # the alternatives slot evaluates LAST — after every fixed
            # slot has shrunk the candidates, each alternative gathers
            # positions only for still-alive docs (a broad expansion
            # pays shrunk-candidate position work, not expansion-df
            # work). Keys across alternatives are naturally disjoint
            # (one lemma per position), unioned and sorted once.
            j = np.int64(len(phrase))
            alt_parts = []
            for lem in alive_alts:
                docid, tf, _dl, _sc = data[lem]
                if not len(docid):
                    continue
                pidx = np.searchsorted(docid, cand)
                pc_ = np.clip(pidx, 0, len(docid) - 1)
                hit = np.flatnonzero(docid[pc_] == cand)
                if not len(hit):
                    continue
                sel = pc_[hit]
                pos_flat = self._term_positions_full(blocks[lem], tf)
                p = _take_pos_groups(pos_flat, tf, sel)
                cnt = tf[sel].astype(np.int64)
                cidx = np.repeat(hit.astype(np.int64), cnt)
                ok = p >= j
                alt_parts.append(cidx[ok] * shift + (p[ok] - j))
            if not alt_parts:
                return empty
            keys = np.unique(np.concatenate(alt_parts))
            if cur is None:
                cur = keys
            else:
                cur = np.intersect1d(cur, keys, assume_unique=True)
            if not len(cur):
                return empty
        if within_first is not None:
            keep = (cur & (shift - 1)) <= np.int64(within_first - len(phrase))
            cur = cur[keep]
            if not len(cur):
                return empty
        matched = cand[np.unique(cur >> np.int64(32))]
        return matched, terms, data

    def score_near(
        self, lemmas: list[str], window: int, k: int, scope: str | None = None,
        in_order: bool = False,
    ):
        """Proximity match + BM25 ranking: a doc matches iff EVERY
        distinct query lemma occurs within some ``window`` consecutive
        surviving-token positions (unordered — the slop generalization
        of the phrase operator; window = len(lemmas) admits any
        permutation-adjacent cluster).

        ``in_order=True`` (Lucene SpanNearQuery in_order): the lemmas
        must additionally appear in the GIVEN sequence order — a doc
        matches iff some strictly-increasing position chain p_0 < p_1 <
        ... < p_{m-1} follows ``lemmas`` with p_{m-1} <= p_0+window-1
        (``lemmas`` is then the ordered, duplicate-keeping sequence).
        The matcher is the greedy smallest-next chain, exact because
        taking the minimal valid next occurrence always preserves
        feasibility (it maximizes the remaining window); ordered
        matching with window == len(lemmas) and no repeats degenerates
        toward phrase (adjacent == a chain of consecutive positions).

        Exactness argument for the anchor scan: if a window ``[w, w+W-1]``
        covers one occurrence of every lemma, then anchoring at the
        MINIMUM chosen occurrence ``p* >= w`` also works (every chosen
        occurrence lies in ``[p*, w+W-1] ⊆ [p*, p*+W-1]``), and ``p*``
        is some lemma's occurrence — so testing every candidate-doc
        occurrence as an anchor and asking each lemma for an occurrence
        in ``[anchor, anchor+W-1]`` (one global searchsorted per lemma
        over doc-major position keys) is exact and fully vectorized.

        Returns ``(ids, scores, count)`` or ``None`` for no-results."""
        distinct = list(dict.fromkeys(lemmas))
        terms = []
        for lem in distinct:
            df = self._df_of(lem)
            if df is None and self._has_deltas and lem in self._delta_lemma:
                df = 0
            if df is None:
                return None
            terms.append((lem, df))
        blocks = self._term_blocks(distinct, need_positions=True)
        if self._has_deltas:
            terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
            if any(df == 0 for _, df in terms):
                return None
        data: dict[str, tuple] = {}
        for lem, _df in terms:
            bl = blocks[lem]
            data[lem] = self._decode_term(
                bl, 0, len(bl["first"]), bl.setdefault("chunks", {})
            )
        lut = self._scope_lut(scope) if scope else None
        cand = None
        for lem, _df in sorted(terms, key=lambda t: (t[1], t[0])):
            docid, _tf, _dl, sc = data[lem]
            d = docid[lut[sc]] if lut is not None else docid
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
            if not len(cand):
                break
        empty = (np.empty(0, np.int64), np.empty(0, np.float64), 0)
        if cand is None or not len(cand):
            return empty

        if len(lemmas) == 1 or (not in_order and len(distinct) == 1):
            matched = cand  # one lemma: any occurrence is its own window
        else:
            shift = np.int64(1) << np.int64(32)
            term_keys: dict[str, np.ndarray] = {}
            for lem, _df in terms:
                docid, tf, _dl, _sc = data[lem]
                pos_flat = self._term_positions_full(blocks[lem], tf)
                pidx = np.searchsorted(docid, cand)
                p = _take_pos_groups(pos_flat, tf, pidx)
                cnt = tf[pidx].astype(np.int64)
                cidx = np.repeat(np.arange(len(cand), dtype=np.int64), cnt)
                term_keys[lem] = cidx * shift + p  # doc-major, sorted
            if in_order:
                # greedy smallest-next chain from every occurrence of
                # the FIRST sequence lemma; key arithmetic keeps the
                # doc prefix, so nxt <= hi simultaneously enforces
                # same-doc and within-window; ok is AND-sticky (a dead
                # chain never revives on garbage cur values)
                anchors = term_keys[lemmas[0]]
                ok = np.ones(len(anchors), bool)
                hi = anchors + np.int64(window - 1)
                cur = anchors
                for lem in lemmas[1:]:
                    tk = term_keys[lem]
                    idx = np.searchsorted(tk, cur, side="right")
                    idxc = np.clip(idx, 0, max(len(tk) - 1, 0))
                    nxt = tk[idxc]
                    ok &= (idx < len(tk)) & (nxt <= hi)
                    if not ok.any():
                        return empty
                    cur = nxt
                matched = cand[np.unique(anchors[ok] >> np.int64(32))]
            else:
                anchors = np.sort(np.concatenate(list(term_keys.values())))
                ok = np.ones(len(anchors), bool)
                hi = anchors + np.int64(window - 1)
                for lem, _df in terms:
                    tk = term_keys[lem]
                    lo = np.searchsorted(tk, anchors)
                    loc = np.clip(lo, 0, max(len(tk) - 1, 0))
                    ok &= (lo < len(tk)) & (tk[loc] <= hi)
                    if not ok.any():
                        return empty
                matched = cand[np.unique(anchors[ok] >> np.int64(32))]
        count = len(matched)
        score = np.zeros(count, np.float64)
        k1, b = self.k1, self.b
        for lem, df in sorted(terms, key=lambda t: (t[1], t[0])):
            docid, tf, dl, _sc = data[lem]
            pidx = np.searchsorted(docid, matched)
            tff = tf[pidx].astype(np.float64)
            dlf = dl[pidx].astype(np.float64)
            score += self.idf(df) * (tff * (k1 + 1.0)) / (
                tff + k1 * (1.0 - b + b * dlf / self.avgdl)
            )
        ids, scores = self._topk(matched, score, k)
        return ids, scores, count

    def score_reference(self, terms, scope=None):
        """Reference semantics: drop df>=250 lemmas (D4; all dropped ->
        'too frequent' error), conjunctive AND over the rest (J4),
        relevance = doc Σtf / max doc Σtf (G3/G4) — query-independent."""
        kept = [(l, df) for l, df in terms if df < REFERENCE_DF_CUTOFF]
        if not kept:
            return None, None, "too_frequent"
        blocks = self._term_blocks([t[0] for t in kept])
        lut = self._scope_lut(scope) if scope else None
        inter = None
        first_docid = first_dl = None
        for lem, _df in kept:  # rarest-first iteration order preserved
            bl = blocks[lem]
            docid, _tf, dl, sc = self._decode_term(bl, 0, len(bl["first"]), bl.setdefault("chunks", {}))
            if lut is not None:
                keep = lut[sc]
                docid, dl = docid[keep], dl[keep]
            if inter is None:
                first_docid, first_dl = docid, dl
                inter = docid
            else:
                inter = np.intersect1d(inter, docid, assume_unique=True)
        if inter is None or len(inter) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64), None
        # dl per surviving doc via binary search into the (sorted) first
        # term's decode — doc_len is term-independent, no dict build
        rel = first_dl[np.searchsorted(first_docid, inter)].astype(np.float64) / self._max_relevance()
        return inter, rel, None

    # ---------------- public API (S8 analog) ---------------------------

    def search(
        self,
        query_text: str,
        scope: str | None = None,
        offset: int = 0,
        limit: int = DEFAULT_PAGE_SIZE,
        mode: str = "bm25",
        method: str = "blockmax",
        conjunctive: bool = False,
        with_snippets: bool | str = False,
        near_window: int = 8,
        in_order: bool = False,
        within_first: int | None = None,
        fuzzy_dist: int = 1,
        min_match: int | None = None,
        exclude: str | None = None,
        ts_min=None,
        ts_max=None,
        collapse: int | None = None,
        order_by: str = "score",
        search_after: tuple | list | None = None,
        synonyms: dict | None = None,
        boosts: dict | None = None,
        decay: dict | None = None,
        rescore: dict | None = None,
        negative: str | None = None,
        negative_boost: float = 0.5,
    ) -> dict:
        """-> {'result': bool, 'count': int, 'data': pa.Table, 'error': str|None}

        ``data`` columns: (conv_id, turn_idx, role, tool, ts, score
        [, snippet | highlighted]). ``scope`` is a role value or
        ``"tool:<name>"``. ``with_snippets``: True = 240-char
        best-window snippet; ``"full"`` = ES highlight with
        ``number_of_fragments: 0`` — the whole cleaned text with every
        query-lemma word wrapped in <b></b> (column ``highlighted``).
        ``exclude`` is NOT-term text: docs containing ANY of its analyzed
        lemmas are dropped from the result set (and the exact count)
        BEFORE top-k — supported for the bm25 mode (composes with
        ``conjunctive``/``min_match``; like min_match it routes through
        the exhaustive scorer: threading an exclusion mask into block-max
        candidate windows is out of scope for a filtering surface).
        ``ts_min``/``ts_max`` (int epoch-µs, ISO-8601 string, or
        datetime; INCLUSIVE bounds, SQL ``BETWEEN`` semantics) keep only
        turns whose ``ts`` falls in the range — same exhaustive routing,
        applied to the full matching set before the count and top-k.
        ``collapse`` is field collapsing on the conversation (the
        Elasticsearch ``collapse`` shape): at most that many turns per
        conversation survive into the count and top-k, chosen per
        conversation by (score DESC, turn_idx ASC) — result
        diversification; same exhaustive routing, applied AFTER the
        other filters. ``order_by`` = 'score' (default) | 'ts_desc' |
        'ts_asc' sorts the result page by turn timestamp instead of
        relevance ("latest matching turns", the canonical transcript
        ordering) — ranking key only; ``score`` still carries BM25.
        ``order_by='rrf'`` is hybrid relevance+recency: reciprocal-rank
        fusion (k=60) of the BM25 and ts-descending rankings of the
        same matching set — there ``score`` carries the fused value.
        ``synonyms`` (bm25 mode only) is a query-time synonym mapping
        {word: [synonym, ...]} — both sides pass through the analyzer,
        each query lemma expands to itself plus its mapped synonyms,
        and ranking is standard disjunctive BM25 over the deduplicated
        expansion union (the Lucene SynonymQuery "expand" rewrite);
        expansion lemmas absent from the corpus are dropped (an
        all-absent expansion returns count 0, not the reference's
        missing-lemma empty result — the mapping exists to RESCUE
        misses). Composes with every exhaustive-routed filter since it
        only rewrites the term set.
        ``boosts`` (bm25 mode only) is query-time per-term boosting
        {word: weight} — the Lucene ``term^w`` weight: each boosted
        lemma's idf is pre-scaled by its positive factor (ONE float64
        multiply per term, so weight 1.0 is an exact bitwise no-op),
        then standard disjunctive BM25; keys pass through the analyzer
        (each must analyze to exactly one lemma). Routes through the
        exhaustive scorer like the other filtering surfaces (block-max
        upper bounds are computed for unboosted idf) and composes with
        them.
        ``rescore`` (bm25 mode only) is two-phase query rescoring (the
        Elasticsearch ``rescore`` window shape): ``{"query": text,
        "window": 50, "query_weight": 1.0, "rescore_weight": 1.0}`` —
        phase one ranks the matching set by standard disjunctive BM25
        and takes the top-``window``; phase two re-ranks ONLY that
        window by ``qw*bm25 + rw*phrase_score``, where ``phrase_score``
        is the exact-phrase BM25 of the rescore query's lemma sequence
        (``mode='phrase'`` semantics over the window docs; a window doc
        without the adjacent phrase adds 0). Needs a positions build; a
        rescore-phrase lemma absent from the corpus boosts nothing
        (base order stands, scaled by ``query_weight``); ``count``
        stays the full matching count. Requires ``window >= offset +
        limit`` (the page must come from the reordered window — the
        beyond-window tail keeps base order in ES and is out of scope
        here) and does not compose with the other rewrite/filter
        surfaces (synonyms/boosts/decay/min_match/exclude/ts/collapse/
        order_by/search_after) — ``bad_rescore`` otherwise.
        ``decay`` (bm25 mode only) is function-score recency decay (the
        Elasticsearch ``function_score`` decay shape, boost_mode
        multiply): ``{"origin": ts, "scale": seconds, "shape":
        "gauss"|"exp"|"linear", "rate": 0.5, "offset": seconds}`` —
        each matching turn's BM25 score is multiplied by a factor of
        its ts distance ``x = max(|ts - origin|sec - offset, 0)``:
        gauss ``exp(-x²/c)`` (c = -scale²/ln rate), exp ``exp(λx)``
        (λ = ln rate / scale), linear ``max((L-x)/L, 0)``
        (L = scale/(1-rate)); at distance ``scale`` the factor is
        exactly ``rate``. ``origin`` is explicit (int epoch-µs / ISO /
        datetime — no hidden "now", so results are reproducible);
        constants are folded driver-side into ONE float64 each, and
        the factor is a single multiply on the summed BM25 score, so
        the SQL twin inlining the same constants matches to float64
        rounding. Routes through the exhaustive scorer like the other
        filtering surfaces and composes with them (applied AFTER
        exclusion/ts filters, BEFORE collapse — collapse diversifies
        by the FINAL score); linear's zero tail keeps rows (score 0),
        it never changes ``count``.
        ``negative``/``negative_boost`` (bm25 mode only) is the ES
        ``boosting`` compound query: docs containing ANY analyzed lemma
        of ``negative`` stay in the result set but their score is
        multiplied by ``negative_boost`` in [0, 1] — demotion, the
        middle ground ``exclude`` can't express. Absent-lemma negatives
        demote nothing (exclude's no-op rule); a negative that analyzes
        to nothing is ``bad_negative`` (ES rejects an empty negative
        body). Never changes ``count``; composes with the other
        exhaustive-routed surfaces.
        ``search_after`` = (score, conv_id, turn_idx) is cursor (deep)
        pagination: return results STRICTLY AFTER that row in the
        relevance total order (score DESC, conv_id, turn_idx) — the
        Elasticsearch ``search_after`` shape. Feed it the last row of
        the previous page; page N+1 via cursor is pinned identical to
        ``offset=N*limit`` (the offset route re-ranks the whole result
        prefix every page — at deep offsets the cursor is what scales).
        Requires ``offset == 0`` and the default score order; composes
        with the other exhaustive-routed filters; ``count`` stays the
        full matching count.
        """
        if not self.valid_scope(scope):
            return self._resp(error="bad_scope")
        if search_after is not None and (
            offset != 0 or order_by != "score"
            or not isinstance(search_after, (tuple, list))
            or len(search_after) != 3
        ):
            return self._resp(error="bad_cursor")
        if collapse is not None and collapse < 1:
            return self._resp(error="bad_collapse")
        if order_by not in ("score", "ts_desc", "ts_asc", "rrf"):
            return self._resp(error="bad_order")
        # page sanity: Python slicing makes ids[-1:] the LAST row, so a
        # negative offset would silently return a wrong page as success
        try:
            offset, limit = int(offset), int(limit)
        except (TypeError, ValueError):
            return self._resp(error="bad_page")
        if offset < 0 or limit < 0:
            return self._resp(error="bad_page")
        # ts bounds validate ONCE up front — garbage must be a bad_ts
        # response, not an exception escaping to the HTTP layer — and
        # pass down as exact int epoch-µs
        try:
            ts_min = self._ts_us(ts_min)
            ts_max = self._ts_us(ts_max)
        except (ValueError, TypeError, OverflowError):
            return self._resp(error="bad_ts")
        # the filtering surfaces route through the exhaustive bm25
        # scorer ONLY; every other mode returns before that gate, so
        # accepting the combination would report success on silently
        # UNFILTERED results (the synonyms/boosts/decay convention:
        # reject, don't ignore)
        if mode != "bm25" and (
            exclude is not None or ts_min is not None or ts_max is not None
            or collapse is not None or min_match is not None
            or order_by != "score" or search_after is not None
        ):
            return self._resp(error="bad_filter_mode")
        if synonyms is not None and mode != "bm25":
            return self._resp(error="bad_synonyms")
        if negative is not None:
            # boosting query (the ES `boosting` compound): docs matching
            # the negative query stay IN the result set but their score
            # is multiplied by negative_boost in [0, 1] — demotion, the
            # middle ground exclude= can't express. bm25 mode only; the
            # negative side must analyze to >= 1 token (ES rejects an
            # empty negative body); absent-lemma negatives demote
            # nothing (exclude's no-op rule, NOT the missing-lemma
            # rule — the negative side is a filter, not the query).
            try:
                negative_boost = float(negative_boost)
            except (TypeError, ValueError):
                return self._resp(error="bad_negative")
            if (mode != "bm25" or not isinstance(negative, str)
                    or not (0.0 <= negative_boost <= 1.0)):
                return self._resp(error="bad_negative")
            if not self._analyzer.analyze_query(negative):
                return self._resp(error="bad_negative")
        if boosts is not None:
            # query-time term boosting (the Lucene term^w weight):
            # analyzer-normalize the keys, require positive finite
            # factors; bm25 mode only (a boost rewrites idf, which the
            # reference scorer and positional modes do not carry)
            if mode != "bm25":
                return self._resp(error="bad_boosts")
            norm_boosts: dict[str, float] = {}
            for key, w in boosts.items():
                try:
                    w = float(w)
                except (TypeError, ValueError):
                    return self._resp(error="bad_boosts")
                if not (w > 0.0 and math.isfinite(w)):
                    return self._resp(error="bad_boosts")
                klems = self._analyzer.analyze_query(str(key))
                if len(klems) != 1:
                    return self._resp(error="bad_boosts")
                norm_boosts[klems[0]] = w
            boosts = norm_boosts
        decay_t: tuple | None = None
        if decay is not None:
            # function-score recency decay: validate + fold the shape
            # constant to ONE float64 driver-side (the SQL twin inlines
            # the same repr-round-tripped constant)
            if mode != "bm25":
                return self._resp(error="bad_decay")
            decay_t = decay_params(decay, self._ts_us)
            if decay_t is None:
                return self._resp(error="bad_decay")
        rescore_t: tuple | None = None
        if rescore is not None:
            # two-phase rescore: validate the window/weights, analyze
            # the rescore query as an ORDERED phrase (its exact-match
            # BM25 is the phase-two signal)
            if (mode != "bm25" or not isinstance(rescore, dict)
                    or min_match is not None or exclude is not None
                    or ts_min is not None or ts_max is not None
                    or collapse is not None or order_by != "score"
                    or search_after is not None or boosts is not None
                    or synonyms is not None or decay is not None
                    or negative is not None):
                return self._resp(error="bad_rescore")
            if not self.has_positions:
                return self._resp(error="no_positions")
            try:
                rq = str(rescore["query"])
                window = int(rescore.get("window", 50))
                qw = float(rescore.get("query_weight", 1.0))
                rw = float(rescore.get("rescore_weight", 1.0))
            except (KeyError, TypeError, ValueError):
                return self._resp(error="bad_rescore")
            if (window < 1 or window < offset + limit
                    or not (math.isfinite(qw) and math.isfinite(rw))):
                return self._resp(error="bad_rescore")
            analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
            rphrase = analyze_phrase(rq) if analyze_phrase is not None else None
            if not rphrase:
                return self._resp(error="bad_rescore")
            rescore_t = (rphrase, window, qw, rw)
        k = offset + limit
        if within_first is not None and (
            mode != "phrase"
            or not isinstance(within_first, int) or within_first < 1
        ):
            # SpanFirstQuery composes with the phrase span only (a
            # single-term phrase IS the classic term form)
            return self._resp(error="bad_within_first")
        if mode == "phrase":
            if not self.has_positions:
                return self._resp(error="no_positions")
            analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
            if analyze_phrase is None:
                return self._resp(error="no_positions")
            phrase = analyze_phrase(query_text)
            if not phrase:
                return self._resp(error="empty_query")
            got = self.score_phrase(phrase, k, scope,
                                    within_first=within_first)
            if got is None:
                return self._resp(count=0)
            ids, scores, count = got
            ids, scores = ids[offset:], scores[offset:]
            terms = [(lem, self._df_of(lem) or 0) for lem in dict.fromkeys(phrase)]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "phrase_prefix":
            # match-phrase-prefix (ES match_phrase_prefix — the
            # search-as-you-type surface): the query's LAST whitespace
            # token is a prefix that expands to at most
            # PREFIX_MAX_EXPANSION vocabulary lemmas by the
            # (df DESC, lemma ASC) cap rule (expand_prefix — mode
            # 'prefix''s exact expansion, shared code, both dictionary
            # regimes); the preceding tokens are an exact phrase, and a
            # doc matches iff that fixed lemma sequence appears
            # consecutively with ANY expansion lemma at the following
            # position. The prefix slot filters, the fixed lemmas score
            # (BM25) — a single-token query is mode='prefix''s job.
            if not self.has_positions:
                return self._resp(error="no_positions")
            analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
            if analyze_phrase is None:
                return self._resp(error="no_positions")
            toks = (query_text or "").split()
            if len(toks) < 2:
                return self._resp(error="bad_query")
            phrase = analyze_phrase(" ".join(toks[:-1]))
            if not phrase:
                return self._resp(error="empty_query")
            norm_last = self._norm_text(toks[-1]).split()
            if not norm_last or len(norm_last[0]) < self.PREFIX_MIN_LEN:
                return self._resp(error="empty_query")
            exp = self.expand_prefix(norm_last[0])
            if not exp:
                return self._resp(count=0)
            got = self.score_phrase_prefix(phrase, [l for l, _ in exp], k, scope)
            if got is None:
                return self._resp(count=0)
            ids, scores, count = got
            ids, scores = ids[offset:], scores[offset:]
            terms = [(lem, self._df_of(lem) or 0) for lem in dict.fromkeys(phrase)]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "prefix":
            # wildcard search: expand the prefix to vocabulary terms
            # (df-desc capped), then standard disjunctive BM25 over the
            # expansion — block-max pruning applies unchanged
            exp = self.expand_prefix(query_text)
            if not exp:
                toks = self._norm_text(query_text or "").split()
                if not toks or len(toks[0]) < self.PREFIX_MIN_LEN:
                    return self._resp(error="empty_query")
                return self._resp(count=0)
            terms = sorted(exp, key=lambda t: (t[1], t[0]))
            if self._has_deltas:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                terms = [(lem, df) for lem, df in terms if df > 0]
                if not terms:
                    return self._resp(count=0)
            ids, scores, count = self.score_blockmax(terms, k, scope, False)
            ids, scores = ids[offset:], scores[offset:]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "wildcard":
            # wildcard term query (Lucene WildcardQuery rewrite): the
            # pattern expands to at most WILDCARD_MAX_EXPANSION
            # vocabulary lemmas by (df DESC, lemma ASC) — prefix's cap
            # rule — then standard disjunctive block-max BM25 over the
            # expansion. A pattern with no metachars degenerates to an
            # exact dictionary-term query (Lucene semantics).
            exp = self.expand_wildcard(query_text)
            if exp is None:
                return self._resp(error="bad_pattern")
            if not exp:
                return self._resp(count=0)
            terms = sorted(exp, key=lambda t: (t[1], t[0]))
            if self._has_deltas:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                terms = [(lem, df) for lem, df in terms if df > 0]
                if not terms:
                    return self._resp(count=0)
            ids, scores, count = self.score_blockmax(terms, k, scope, False)
            ids, scores = ids[offset:], scores[offset:]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "regexp":
            # regexp term query (Lucene RegexpQuery rewrite): the
            # pattern expands to at most REGEXP_MAX_EXPANSION
            # vocabulary lemmas by (df DESC, lemma ASC) — wildcard's
            # cap rule — then standard disjunctive block-max BM25 over
            # the expansion. Invalid patterns (charset / RE2 compile)
            # are bad_pattern, like wildcard's guard.
            exp = self.expand_regexp(query_text)
            if exp is None:
                return self._resp(error="bad_pattern")
            if not exp:
                return self._resp(count=0)
            terms = sorted(exp, key=lambda t: (t[1], t[0]))
            if self._has_deltas:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                terms = [(lem, df) for lem, df in terms if df > 0]
                if not terms:
                    return self._resp(count=0)
            ids, scores, count = self.score_blockmax(terms, k, scope, False)
            ids, scores = ids[offset:], scores[offset:]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "fuzzy":
            # fuzzy term search (Lucene FuzzyQuery rewrite semantics):
            # each analyzer-normalized query token expands to at most
            # FUZZY_MAX_EXPANSION vocabulary lemmas within ``fuzzy_dist``
            # Levenshtein edits, ranked (dist ASC, df DESC, lemma ASC) —
            # exactly the suggest() rule, so BOTH dictionary regimes
            # (in-memory preload / distributed parquet sweep) ride the
            # already-pinned-equal scan — then standard disjunctive
            # block-max BM25 over the deduplicated expansion union.
            # Tokens are charset-folded but NOT lemmatized (the probe is
            # matched against the lemma vocabulary directly, like
            # suggest); a token with no expansion contributes nothing.
            # With a live delta overlay the expansion reflects the BASE
            # dictionary (suggest's documented boundary — delta-only
            # lemmas join at the next compaction); expanded terms' df
            # and postings DO fold through the overlay below.
            if not 0 <= fuzzy_dist <= 3:
                return self._resp(error="bad_fuzzy_dist")
            toks = self._norm_text(query_text or "").split()
            if not toks:
                return self._resp(error="empty_query")
            seen: dict[str, int] = {}
            for tok in toks:
                t = self.suggest(tok, max_dist=fuzzy_dist,
                                 k=self.FUZZY_MAX_EXPANSION)
                for lem, df in zip(t.column("suggestion").to_pylist(),
                                   t.column("df").to_pylist()):
                    seen.setdefault(lem, int(df))
            if not seen:
                return self._resp(count=0)
            terms = sorted(seen.items(), key=lambda t: (t[1], t[0]))
            if self._has_deltas:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                terms = [(lem, df) for lem, df in terms if df > 0]
                if not terms:
                    return self._resp(count=0)
            ids, scores, count = self.score_blockmax(terms, k, scope, False)
            ids, scores = ids[offset:], scores[offset:]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "near":
            if not self.has_positions:
                return self._resp(error="no_positions")
            if in_order:
                # ordered proximity (Lucene SpanNearQuery in_order):
                # the ORDERED, duplicate-keeping lemma sequence — query
                # order is the matching constraint, so the sorted-dedup
                # analyze_query would destroy the semantics
                analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
                if analyze_phrase is None:
                    return self._resp(error="no_positions")
                lemmas = analyze_phrase(query_text)
            else:
                lemmas = self._analyzer.analyze_query(query_text)
            if not lemmas:
                return self._resp(error="empty_query")
            if near_window < 1:
                return self._resp(error="bad_window")
            got = self.score_near(lemmas, near_window, k, scope,
                                  in_order=in_order)
            if got is None:
                return self._resp(count=0)
            ids, scores, count = got
            ids, scores = ids[offset:], scores[offset:]
            terms = [(lem, self._df_of(lem) or 0) for lem in lemmas]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if mode == "auto":
            # boolean search-box syntax: "quoted phrases" are AND
            # filters, -tokens are NOT terms, the rest is loose
            # disjunctive BM25 text (parse_boolean_query)
            phrases_raw, loose_text, excl_text = parse_boolean_query(query_text)
            analyze_phrase = getattr(self._analyzer, "analyze_phrase", None)
            phrases = []
            for p in phrases_raw:
                ph = analyze_phrase(p) if analyze_phrase is not None else None
                if ph is None and p.strip():
                    return self._resp(error="no_positions")
                if ph:
                    phrases.append(ph)
            if phrases and not self.has_positions:
                return self._resp(error="no_positions")
            loose = self._analyzer.analyze_query(loose_text) if loose_text else []
            if not phrases and not loose:
                return self._resp(error="empty_query")
            if not phrases:
                # no phrase filters: the query IS disjunctive BM25 (+
                # optional NOT) — ride the block-max path (or the
                # exhaustive exclusion route), don't full-decode here
                return self.search(
                    loose_text, scope=scope, offset=offset, limit=limit,
                    with_snippets=with_snippets, exclude=excl_text or None,
                )
            got = self.score_auto(phrases, loose, excl_text or None, k, scope)
            if got is None:
                return self._resp(count=0)
            ids, scores, count = got
            ids, scores = ids[offset:], scores[offset:]
            pos_lemmas = dict.fromkeys([l for ph in phrases for l in ph] + loose)
            terms = [(lem, self._df_of(lem) or 0) for lem in pos_lemmas]
            tbl = self._enrich(ids, scores, terms, with_snippets)
            return {"result": True, "count": int(count), "data": tbl, "error": None}
        if synonyms is not None:
            # query-time synonym expansion: analyzer-normalize BOTH
            # mapping sides, expand each query lemma to itself + its
            # synonyms, drop expansion lemmas absent from the corpus,
            # dedupe, df-ascending — then fall through to the standard
            # bm25 routing (blockmax or the exhaustive filter route)
            lemmas = self._analyzer.analyze_query(query_text)
            if not lemmas:
                return self._resp(error="empty_query")
            norm_map: dict[str, list[str]] = {}
            for key, vals in synonyms.items():
                klems = self._analyzer.analyze_query(str(key))
                if len(klems) != 1:
                    return self._resp(error="bad_synonyms")
                exp = []
                for v in vals if isinstance(vals, (list, tuple)) else (vals,):
                    exp.extend(self._analyzer.analyze_query(str(v)))
                norm_map[klems[0]] = exp
            seen: dict[str, None] = {}
            for lem in lemmas:
                seen.setdefault(lem)
                for s in norm_map.get(lem, ()):
                    seen.setdefault(s)
            terms = []
            for lem in seen:
                df = self._df_of(lem)
                if df is None and self._has_deltas and lem in self._delta_lemma:
                    df = 0
                if df is not None:
                    terms.append((lem, df))
            if self._has_deltas and terms:
                blocks = self._term_blocks([t[0] for t in terms])
                terms = [(lem, int(blocks[lem]["cum_n"][-1])) for lem, _ in terms]
                terms = [(lem, df) for lem, df in terms if df > 0]
            if not terms:
                return self._resp(count=0)
            terms.sort(key=lambda t: (t[1], t[0]))
            err = None
        else:
            terms, err = self.plan(query_text)
        if err == "empty_query":
            return self._resp(error="empty_query")
        if err == "no_results":
            return self._resp(count=0)
        if mode == "reference":
            ids, scores, err = self.score_reference(terms, scope)
            if err:
                return self._resp(error=err)
            count = len(ids)
            ids, scores = self._topk(ids, scores, k)
        elif mode != "bm25":
            scorer = SCORERS.get(mode)
            if scorer is None:
                return self._resp(error="unknown_mode")
            ids, scores, count = scorer(self, terms, k, scope, conjunctive)
        elif rescore_t is not None:
            # two-phase rescore: phase one = standard disjunctive
            # block-max BM25 top-WINDOW (the full count rides along);
            # phase two = one vectorized searchsorted of the window ids
            # into the rescore phrase's match set (decoded once via the
            # memoized term blocks) + a BM25-at-docs pass over the hits
            # — nothing beyond the window is ever rescored
            rphrase, window, qw, rw = rescore_t
            ids, scores, count = self.score_blockmax(
                terms, window, scope, conjunctive
            )
            final = qw * scores
            got = self._phrase_matches(rphrase, scope)
            if got is not None and len(ids):
                matched, pterms, pdata = got
                if len(matched):
                    order = np.argsort(ids)
                    sids = ids[order]
                    pos = np.clip(
                        np.searchsorted(matched, sids), 0, len(matched) - 1
                    )
                    hit = matched[pos] == sids
                    if hit.any():
                        ps = self._bm25_at(pterms, pdata, sids[hit], present=True)
                        add = np.zeros(len(sids), np.float64)
                        add[hit] = rw * ps
                        final[order] += add
            ids, scores = self._topk(ids, final, k)
        elif (min_match is not None or exclude is not None or ts_min is not None
              or ts_max is not None or collapse is not None or order_by != "score"
              or search_after is not None or boosts is not None
              or decay_t is not None or negative is not None):
            # minimum-should-match / NOT-exclusion / ts-range route
            # through the exhaustive scorer (block-max pruning with an
            # msm floor or a filter mask would need per-window per-term
            # presence bounds — out of scope; these are filtering
            # surfaces, not the hot path)
            if min_match is not None and not 1 <= min_match <= len(terms):
                return self._resp(count=0) if min_match > len(terms) else self._resp(error="bad_min_match")
            ids, scores = self.score_exhaustive(
                terms, scope, conjunctive, min_match=min_match, boosts=boosts
            )
            excl = self._exclusion_docids(exclude) if exclude is not None else None
            if excl is not None and len(excl) and len(ids):
                keep = ~np.isin(ids, excl, assume_unique=False)
                ids, scores = ids[keep], scores[keep]
            if (ts_min is not None or ts_max is not None) and len(ids):
                tss = self._ts_of_ids(ids)
                m = np.ones(len(ids), bool)
                if ts_min is not None:
                    m &= tss >= self._ts_us(ts_min)
                if ts_max is not None:
                    m &= tss <= self._ts_us(ts_max)
                ids, scores = ids[m], scores[m]
            if decay_t is not None and len(ids):
                # one multiply per matching doc (decay_factor mirrors
                # the SQL twin's op order exactly)
                scores = scores * decay_factor(self._ts_of_ids(ids), decay_t)
            if negative is not None and len(ids):
                # boosting-query demotion: one conditional multiply per
                # matching doc (commutes with decay — both are score
                # multiplies; the SQL twin runs the same CASE)
                neg = self._exclusion_docids(negative)
                if neg is not None and len(neg):
                    demoted = np.isin(ids, neg, assume_unique=False)
                    scores = np.where(
                        demoted, scores * negative_boost, scores)
            if collapse is not None:
                ids, scores = self._collapse_per_conv(ids, scores, collapse)
            count = len(ids)
            if search_after is not None:
                # cursor pagination: keep rows STRICTLY AFTER the cursor
                # in the (score DESC, docid ASC) total order. The cursor
                # score is the engine's own float64 from the previous
                # page (JSON round-trips it exactly), so equality at the
                # boundary is bit-exact; ties resolve on the docid.
                s0, conv0, turn0 = search_after
                d0 = self._cursor_docid(conv0, turn0)
                try:
                    s0 = float(s0)
                except (TypeError, ValueError):
                    d0 = None
                if d0 is None:
                    return self._resp(error="bad_cursor")
                keep = (scores < s0) | ((scores == s0) & (ids > d0))
                ids, scores = ids[keep], scores[keep]
            if order_by in ("ts_desc", "ts_asc"):
                # rank by turn timestamp: top-k on the ts key (exact in
                # float64 — epoch-µs < 2^53), ties by docid ASC ==
                # (conv_id, turn_idx) ASC; BM25 scores re-attached to
                # the winners by position (ids stay docid-sorted through
                # every filter above)
                tss = self._ts_of_ids(ids).astype(np.float64)
                key = tss if order_by == "ts_desc" else -tss
                sel_ids, _ = self._topk(ids, key, k)
                scores = scores[np.searchsorted(ids, sel_ids)]
                ids = sel_ids
            elif order_by == "rrf":
                # hybrid relevance+recency: reciprocal-rank fusion of
                # the BM25 ranking and the ts-descending ranking of the
                # SAME filtered matching set (the Elasticsearch RRF
                # retriever shape): fused = 1/(K + r_rel) + 1/(K + r_ts)
                # with dense 1-based ranks and docid-ASC ties. Ranks are
                # integers, each term is ONE IEEE division, and the sum
                # is commutative at swapped ranks — bit-identical to the
                # SQL oracle; the fused value IS the returned score.
                n = len(ids)
                tss = self._ts_of_ids(ids).astype(np.float64)
                rel = np.empty(n, np.int64)
                rel[np.lexsort((ids, -scores))] = np.arange(1, n + 1)
                rec = np.empty(n, np.int64)
                rec[np.lexsort((ids, -tss))] = np.arange(1, n + 1)
                fused = 1.0 / (RRF_K + rel) + 1.0 / (RRF_K + rec)
                ids, scores = self._topk(ids, fused, k)
            else:
                ids, scores = self._topk(ids, scores, k)
        elif method == "blockmax":
            ids, scores, count = self.score_blockmax(terms, k, scope, conjunctive)
        else:
            ids, scores = self.score_exhaustive(terms, scope, conjunctive)
            count = len(ids)
            ids, scores = self._topk(ids, scores, k)
        ids, scores = ids[offset:], scores[offset:]
        tbl = self._enrich(ids, scores, terms, with_snippets)
        return {"result": True, "count": int(count), "data": tbl, "error": None}

    def msearch(self, requests: list[dict]) -> list[dict]:
        """Multi-search (the Elasticsearch ``_msearch`` batch surface):
        run a list of search requests against ONE engine view and
        return one standard ``search()`` response per request,
        order-preserving. Line-level error semantics: an invalid
        request yields its error response IN PLACE and the batch never
        aborts (the ES per-line failure shape). Each request is a
        kwargs dict with ``query`` plus any ``search()`` parameter.
        Batch amortization is structural: term block decodes, scope
        LUTs, the forward index and enrichment frames are all memoized
        per engine, so lemmas shared across the batch decode ONCE —
        the per-request HTTP path pays that cache warm-up per process
        lifetime, msearch guarantees it within the batch."""
        out = []
        for req in requests:
            if not isinstance(req, dict) or "query" not in req:
                out.append(self._resp(error="bad_request"))
                continue
            kw = dict(req)
            qtext = kw.pop("query")
            try:
                out.append(self.search(qtext, **kw))
            except TypeError:
                # unknown parameter name — a malformed line, not a batch
                # failure
                out.append(self._resp(error="bad_request"))
        return out

    def _resp(self, count: int = 0, error: str | None = None) -> dict:
        return {
            "result": error is None,
            "count": count,
            "data": RESULT_SCHEMA.empty_table(),
            "error": error,
        }

    def _forward(self):
        """Lazy forward index for J6 result enrichment: docid-sorted
        (docid, role_code, tool_code, ts) arrays + the dictionary-encoded
        role/tool values + the sorted conv_id list (docid's conv_rank
        indexes it directly). A few bytes per doc driver-side at bench
        scale; at 10^12 docs this becomes a pruned point-read of the
        docid-sorted doc store (same data, same sort key)."""
        if self._fwd is None:
            t = pq.read_table(
                build_mod.docs_dir(self.out_dir), columns=["docid", "role", "tool", "ts"]
            )
            role_dict = t.column("role").combine_chunks().dictionary_encode()
            tool_dict = pc.fill_null(t.column("tool").combine_chunks(), "").dictionary_encode()
            # rank -> conv_id via the compaction sidecar when present (a
            # conv compacted away to zero turns keeps its rank; the doc
            # store alone would shift every later rank down by one)
            convs = build_mod._load_sorted_convs(self.out_dir)
            docids = t.column("docid").to_numpy()
            codes = role_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            tcodes = tool_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            ts = t.column("ts").combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            role_values = role_dict.dictionary.to_pylist()
            tool_values = tool_dict.dictionary.to_pylist()
            if self._has_deltas:  # overlay: drop tombstoned, splice delta
                keep = self._tomb_keep_mask(docids)
                docids, codes, tcodes, ts = docids[keep], codes[keep], tcodes[keep], ts[keep]
                dd = self._delta_docs

                def splice_codes(values: list, items: list) -> np.ndarray:
                    code_of = {r: i for i, r in enumerate(values)}
                    out = np.empty(len(items), np.int64)
                    for i, r in enumerate(items):
                        r = r or ""
                        c = code_of.get(r)
                        if c is None:
                            c = len(values)
                            values.append(r)
                            code_of[r] = c
                        out[i] = c
                    return out

                d_codes = splice_codes(role_values, dd["role"])
                d_tcodes = splice_codes(tool_values, dd["tool"])
                docids = np.concatenate([docids, dd["docid"]])
                codes = np.concatenate([codes, d_codes])
                tcodes = np.concatenate([tcodes, d_tcodes])
                ts = np.concatenate([ts, dd["ts"]])
                order = np.argsort(docids, kind="stable")
                docids, codes, tcodes, ts = (
                    docids[order], codes[order], tcodes[order], ts[order]
                )
            self._fwd = (docids, codes, role_values, convs, tcodes, tool_values, ts)
        return self._fwd

    # above this corpus size the forward index is not preloaded: the k
    # winners are fetched with a filtered point-read of the docid-sorted
    # doc store instead (row-group stats on docid prune to a few groups)
    _POINT_READ_MIN_DOCS = 2_000_000

    def _lookup_rows_point(self, ids: np.ndarray):
        """(conv_id, role, tool, ts) per winner docid via a pruned read
        of the doc store + delta overlay — O(k) rows driver-side, never
        the whole forward index. Rows are memoized across queries (hot
        winners recur)."""
        cache = getattr(self, "_point_cache", None)
        if cache is None:
            cache = self._point_cache = {}
        missing = [int(x) for x in ids if int(x) not in cache]
        if missing:
            t = pq.read_table(
                build_mod.docs_dir(self.out_dir),
                columns=["docid", "conv_id", "role", "tool", "ts"],
                filters=[("docid", "in", missing)],
            )
            for d, c, r, to, ts in zip(
                t.column("docid").to_pylist(),
                t.column("conv_id").to_pylist(),
                t.column("role").to_pylist(),
                t.column("tool").to_pylist(),
                t.column("ts").combine_chunks().cast(pa.int64()).to_pylist(),
            ):
                cache[int(d)] = (c, r, to, ts)
            if self._has_deltas:
                dd = self._delta_docs
                dmap = {int(d): i for i, d in enumerate(dd["docid"])}
                ms = np.array(missing, np.int64)
                tomb = ~self._tomb_keep_mask(ms)
                for d, is_tomb in zip(missing, tomb):
                    i = dmap.get(d)
                    if i is not None:  # delta row wins over masked base
                        cache[d] = (
                            dd["conv_id"][i], dd["role"][i], dd["tool"][i] or "", int(dd["ts"][i])
                        )
                    elif is_tomb:  # a tombstoned docid can never win
                        cache.pop(d, None)
        rows = [cache[int(d)] for d in ids]
        return (
            [r[0] for r in rows],
            [r[1] for r in rows],
            [r[2] or "" for r in rows],
            np.array([r[3] for r in rows], np.int64),
        )

    def _enrich(self, ids: np.ndarray, scores: np.ndarray, terms,
                with_snippets: bool | str) -> pa.Table:
        """J6: broadcast-small-side join of the k winners back to the
        doc store / transcripts source for (conv_id, role, tool, ts
        [, text]) — the analog of the reference enriching every result
        with site url/name/title (``SearchServiceImpl.java:117-133``)."""
        conv_rank, turn_idx = split_docids(ids)
        if len(ids) and self.n_docs >= self._POINT_READ_MIN_DOCS:
            conv_ids, roles, tools, tss = self._lookup_rows_point(ids)
        elif len(ids):
            docids, role_codes, role_values, convs, tool_codes, tool_values, ts_arr = (
                self._forward()
            )
            pos = np.searchsorted(docids, ids)
            conv_ids = convs.take(pa.array(conv_rank)).to_pylist()
            roles = [role_values[role_codes[p]] for p in pos]
            tools = [tool_values[tool_codes[p]] for p in pos]
            tss = ts_arr[pos]
        else:
            conv_ids, roles, tools = [], [], []
            tss = np.empty(0, np.int64)
        cols = {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
            "score": pa.array(scores, pa.float64()),
        }
        tbl = pa.table(cols)
        if with_snippets and len(ids):
            # True -> 240-char best-window snippet (the reference's
            # SnippetCreator presentation rule); "full" -> ES highlight
            # with number_of_fragments=0 (the whole cleaned field
            # highlighted — a pure per-word function, SQL-twin-able)
            from .functions.snippets import create_snippets, highlight_full

            # re-indexed convs read their text from their delta's input
            # paths; everything else from the build's inputs
            dpaths = getattr(self, "_delta_text_paths", {})
            groups: dict[tuple, list[str]] = {}
            for c in set(conv_ids):
                groups.setdefault(tuple(dpaths.get(c) or self.transcripts_paths), []).append(c)
            tlut: dict[tuple, str] = {}
            for paths, cids in groups.items():
                texts = pads.dataset(list(paths)).to_table(
                    filter=pads.field("conv_id").isin(cids),
                    columns=["conv_id", "turn_idx", "text"],
                )
                tlut.update(
                    {
                        (c, t): x
                        for c, t, x in zip(
                            texts.column("conv_id").to_pylist(),
                            texts.column("turn_idx").to_pylist(),
                            texts.column("text").to_pylist(),
                        )
                    }
                )
            lemmas = {t[0] for t in terms}
            if with_snippets == "full":
                vals = [
                    highlight_full(tlut.get((c, int(t)), ""), lemmas)
                    for c, t in zip(conv_ids, turn_idx)
                ]
                tbl = tbl.append_column(
                    "highlighted", pa.array(vals, pa.string()))
            else:
                snips = [
                    create_snippets(tlut.get((c, int(t)), ""), lemmas)
                    for c, t in zip(conv_ids, turn_idx)
                ]
                tbl = tbl.append_column(
                    "snippet", pa.array(snips, pa.string()))
        return tbl


FACETS_SCHEMA = pa.schema(
    [("facet", pa.string()), ("value", pa.string()), ("n_docs", pa.int64())]
)

TOP_HITS_SCHEMA = pa.schema(
    [
        ("group", pa.string()),
        ("grank", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("score", pa.float64()),
    ]
)

METRICS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("n_docs", pa.int64()),
        ("v_min", pa.int64()),
        ("v_max", pa.int64()),
        ("v_avg", pa.int64()),
        ("p50", pa.int64()),
        ("p90", pa.int64()),
        ("p99", pa.int64()),
    ]
)

SIG_TERMS_SCHEMA = pa.schema(
    [
        ("rank", pa.int32()),
        ("lemma", pa.string()),
        ("fg_docs", pa.int64()),
        ("bg_docs", pa.int64()),
        ("score", pa.float64()),
    ]
)

RARE_TERMS_SCHEMA = pa.schema(
    [
        ("rank", pa.int32()),
        ("lemma", pa.string()),
        ("fg_docs", pa.int64()),
        ("bg_docs", pa.int64()),
    ]
)

CONV_RESULT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("best_turn_idx", pa.int32()),
        ("score", pa.float64()),
    ]
)

RESULT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("score", pa.float64()),
    ]
)

COMPLETE_SCHEMA = pa.schema(
    [
        ("lemma", pa.string()),
        ("df", pa.int64()),
    ]
)

HISTOGRAM_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)

CARDINALITY_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("n_distinct", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)

RANGE_AGG_SCHEMA = pa.schema(
    [
        ("ridx", pa.int64()),
        ("key", pa.string()),
        ("range_from", pa.int64()),
        ("range_to", pa.int64()),
        ("n_docs", pa.int64()),
    ]
)

MGET_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("found", pa.bool_()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)

EXT_STATS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("n_docs", pa.int64()),
        ("vmin", pa.int64()),
        ("vmax", pa.int64()),
        ("sum_shift", pa.string()),
        ("sumsq_shift", pa.string()),
        ("avg", pa.float64()),
        ("variance", pa.float64()),
        ("std_deviation", pa.float64()),
        ("std_upper", pa.float64()),
        ("std_lower", pa.float64()),
    ]
)

MATRIX_STATS_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("sum_x", pa.int64()),
        ("sum_y", pa.int64()),
        ("sum_xx", pa.string()),
        ("sum_yy", pa.string()),
        ("sum_xy", pa.string()),
        ("cov", pa.float64()),
        ("corr", pa.float64()),
    ]
)

PRANKS_SCHEMA = pa.schema(
    [
        ("value", pa.int64()),
        ("n_le", pa.int64()),
        ("n_docs", pa.int64()),
        ("pct", pa.float64()),
    ]
)

FILTERS_AGG_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("n_docs", pa.int64()),
    ]
)

HISTOGRAM_PIPELINE_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n_docs", pa.int64()),
        ("cum_docs", pa.int64()),
        ("deriv", pa.int64()),
        ("mavg", pa.float64()),
    ]
)

SUGGEST_QUERY_SCHEMA = pa.schema(
    [
        ("pos", pa.int32()),
        ("token", pa.string()),
        ("suggestion", pa.string()),
        ("df", pa.int64()),
        ("dist", pa.int32()),
    ]
)

COMPOSITE_SCHEMA = pa.schema(
    [
        ("role", pa.string()),
        ("tool", pa.string()),
        ("n_docs", pa.int64()),
    ]
)

TERMVECTORS_SCHEMA = pa.schema(
    [
        ("lemma", pa.string()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
        ("dl", pa.int64()),
    ]
)

RANK_EVAL_SCHEMA = pa.schema(
    [
        ("k", pa.int64()),
        ("n_hits", pa.int64()),
        ("n_rel", pa.int64()),
        ("n_rel_ret", pa.int64()),
        ("first_rel_rank", pa.int64()),
        ("gain_top", pa.int64()),
        ("gain_ideal", pa.int64()),
    ]
)

EXPLAIN_SCHEMA = pa.schema(
    [
        ("lemma", pa.string()),
        ("df", pa.int64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
        ("idf", pa.float64()),
        ("weight", pa.float64()),
    ]
)
