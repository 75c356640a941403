"""Byte-pair-encoding vocabulary induction over the ``documents``
table — the tokenizer-training op every LLM data pipeline runs before
anything else (Sennrich, Haddow & Birch 2016; the GPT-2/SentencePiece
trainer shape).

The scale structure is the one real trainers (fastBPE, HuggingFace
tokenizers) use: BPE never needs the corpus during the merge loop, only
the WORD-FREQUENCY table — so ONE distributed pass builds (word, count)
(vectorized regex fold + per-batch value_counts partials into a single
groupby; the shuffle ships distinct words, never tokens), and the
iterative merge learning runs driver-side over that vocabulary-sized
frame. At 100 TB the distinct-word table is the honest "small side"
(capped at ``max_words`` by (count DESC, word ASC) with the truncation
logged — the standard trainer move); the corpus-sized work is exactly
one map + one groupby.

Encoding (:func:`BpeEncoder` / :func:`bpe_token_counts`) is the
stateful-stage pattern: merges broadcast once, per-ACTOR word cache —
each distinct word is segmented once per actor, batches look up
vectorized. BPE's merge application is inherently per-word sequential
(real encoders are per-word C++ loops with caches too); the cache makes
the Python cost O(distinct words per actor), not O(tokens).

The merge loop has a real SQL twin after all (:func:`bpe_fit_sql`):
the rounds unroll into chained MATERIALIZED CTEs — pair-count, argmax,
one boundary-safe string replace per round — so the driver row carries
a three-boolean oracle check; the math is additionally pinned by pytest
against a from-scratch reference implementation, plus block-layout
invariance.
"""

from __future__ import annotations

from search_engine_ray.functions import actor_pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

EOW = "</w>"  # end-of-word marker: merges never cross word boundaries
DEFAULT_MERGES = 50
MAX_WORDS = 200_000


def word_counts(ds: rd.Dataset, text_col: str = "text") -> pa.Table:
    """Distributed (word, n) over the ``[a-z0-9]+`` word tokens of the
    lowercased text (the module's pre-tokenization rule, shared with
    ``text_analysis.token_counts``): per-batch vectorized fold + split
    + value_counts partials, ONE groupby, driver-side fold of the
    (distinct-word-sized) result."""

    def partial(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        folded = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        flat = pc.list_flatten(pc.split_pattern(folded, " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({
            "word": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    tabs = [t for t in ray.get(agg.materialize().to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    return pa.concat_tables(tabs).combine_chunks()


def bpe_fit_counts(
    wc: pa.Table, n_merges: int = DEFAULT_MERGES, max_words: int = MAX_WORDS,
) -> pa.Table:
    """Merge learning over a (word, n) frame — driver-side, bounded by
    the vocabulary: each round counts adjacent symbol pairs weighted by
    word frequency and merges the best pair; deterministic tie-break
    (count DESC, left ASC, right ASC). Stops early when no pair occurs
    at least twice (merging a count-1 pair memorizes a single word).
    -> pa.Table(rank, left, right, pair_count)."""
    rows = sorted(
        zip(wc.column("word").to_pylist(), wc.column("n").to_pylist()),
        key=lambda r: (-r[1], r[0]),
    )[:max_words]
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (EOW,), int(n)) for w, n in rows if w
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        joined = left + right
        new_words = []
        for syms, n in words:
            if left in syms:  # cheap containment prefilter
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(joined)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            new_words.append((syms, n))
        words = new_words
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })


def bpe_fit(ds: rd.Dataset, n_merges: int = DEFAULT_MERGES,
            text_col: str = "text", max_words: int = MAX_WORDS) -> pa.Table:
    """One distributed word-count pass + the driver merge loop."""
    return bpe_fit_counts(word_counts(ds, text_col), n_merges, max_words)


def encode_word(word: str, merge_rank: dict[tuple[str, str], int]) -> list[str]:
    """Segment ONE word by applying merges in LEARNED-RANK order (the
    canonical BPE encoder rule: repeatedly merge the lowest-rank
    adjacent pair present) — deterministic for any merge table."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        ranked = [
            (merge_rank[p], p)
            for p in zip(syms, syms[1:])
            if p in merge_rank
        ]
        if not ranked:
            break
        # ranks are unique, so min is unambiguous; merge EVERY
        # occurrence of that pair left-to-right this round
        _r, target = min(ranked)
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms) and (syms[i], syms[i + 1]) == target):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BpeEncoder:
    """Actor-pool encode stage: merges land once per actor in
    ``__init__`` (ray.put broadcast), and a per-actor word->len cache
    makes repeated words free. Adds ``n_bpe_tokens`` per row."""

    def __init__(self, merges_ref, text_col: str = "text"):
        t = ray.get(merges_ref)
        self.rank = {
            (l, r): int(k)
            for k, l, r in zip(t.column("rank").to_pylist(),
                               t.column("left").to_pylist(),
                               t.column("right").to_pylist())
        }
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(
            pc.fill_null(batch.column(self.text_col), "").combine_chunks()
        )
        folded = pc.replace_substring_regex(low, "[^a-z0-9]+", " ")
        lists = pc.split_pattern(folded, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists).to_pylist()
        offs = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.zeros(len(flat), np.int64)
        for i, w in enumerate(flat):
            if not w:
                continue
            n = self.cache.get(w)
            if n is None:
                n = len(encode_word(w, self.rank))
                self.cache[w] = n
            lens[i] = n
        csum = np.concatenate(([0], np.cumsum(lens)))
        per_doc = csum[offs[1:]] - csum[offs[:-1]]
        return batch.append_column(
            "n_bpe_tokens", pa.array(per_doc.astype(np.int64), pa.int64())
        )


def bpe_token_counts(ds: rd.Dataset, merges: pa.Table,
                     text_col: str = "text") -> rd.Dataset:
    """Per-doc BPE token counts under a learned merge table — the
    broadcast + actor-cache encode stage."""
    ref = ray.put(merges)
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(ref, text_col),
        batch_format="pyarrow", concurrency=actor_pool(), max_restarts=0,
    )


def bpe_fit_sql(
    src: str,
    n_merges: int = DEFAULT_MERGES,
    max_words: int = MAX_WORDS,
    text_col: str = "text",
) -> str:
    """DuckDB oracle for :func:`bpe_fit` — the merge loop UNROLLED into
    ``n_merges`` chained CTE stages, so the "iterative state is not a
    query" objection falls: each stage counts adjacent symbol pairs,
    takes the (count DESC, left ASC, right ASC) argmax, and applies the
    merge to every word.

    The exactness device is the symbol encoding: each word is the
    concatenation of ``chr(1) || symbol || chr(2)`` cells (characters +
    the ``</w>`` terminal).  Applying merge (a, b) is then ONE SQL
    ``replace(s, \\x01 a \\x02 \\x01 b \\x02, \\x01 ab \\x02)`` — SQL
    ``replace`` scans left-to-right non-overlapping, which is exactly
    BPE's within-word merge rule (the "aaa" + (a,a) -> [aa, a] case),
    and the cell delimiters make a prefix of a longer symbol unmatchable
    (pattern ``(x)(a)`` cannot hit ``(x)(ab)``).  Pair counting splits
    the cells back out and zips adjacent symbols.  Early-stop semantics
    (stop at the first best-pair count < 2) are applied in the final
    projection by truncating at the first sub-2 rank.  Tokenization,
    the ``max_words`` cap and every tie-break mirror the engine
    verbatim (ASCII symbols, so DuckDB's binary collation == Python
    string order).
    """
    stages = [
        f"""
tok AS (
    SELECT unnest(str_split(regexp_replace(lower(coalesce({text_col}, '')),
                                           '[^a-z0-9]+', ' ', 'g'),
                  ' ')) AS w
    FROM {src}
),
wc AS MATERIALIZED (
    SELECT w AS word, CAST(count(*) AS BIGINT) AS n
    FROM tok WHERE w <> ''
    GROUP BY w ORDER BY n DESC, word LIMIT {max_words}
),
w0 AS MATERIALIZED (
    SELECT list_aggregate(
               list_transform(range(1, length(word) + 1),
                              i -> chr(1) || word[i] || chr(2)),
               'string_agg', '')
           || chr(1) || '{EOW}' || chr(2) AS s,
           n
    FROM wc
)"""
    ]
    for k in range(n_merges):
        stages.append(f"""
p{k} AS MATERIALIZED (
    SELECT z[1] AS a, z[2] AS b, CAST(sum(n) AS BIGINT) AS cnt
    FROM (
        SELECT unnest(list_zip(sy[1:len(sy) - 1], sy[2:len(sy)])) AS z, n
        FROM (
            SELECT str_split(substr(s, 2, length(s) - 2),
                             chr(2) || chr(1)) AS sy, n
            FROM w{k} WHERE s IS NOT NULL
        )
        WHERE len(sy) > 1
    )
    GROUP BY 1, 2
),
b{k} AS MATERIALIZED (
    SELECT CAST({k} AS BIGINT) AS rank, a AS l, b AS r, cnt
    FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
),
w{k + 1} AS MATERIALIZED (
    SELECT replace(s,
                   chr(1) || (SELECT l FROM b{k}) || chr(2)
                          || chr(1) || (SELECT r FROM b{k}) || chr(2),
                   chr(1) || (SELECT l FROM b{k})
                          || (SELECT r FROM b{k}) || chr(2)) AS s,
           n
    FROM w{k}
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM b{k}" for k in range(n_merges)
    )
    return f"""
WITH {','.join(stages)},
allb AS ({union}),
stop AS (SELECT coalesce(min(rank), {n_merges}) AS at FROM allb WHERE cnt < 2)
SELECT rank, l AS "left", r AS "right", cnt AS pair_count
FROM allb WHERE cnt >= 2 AND rank < (SELECT at FROM stop)
ORDER BY rank
"""
