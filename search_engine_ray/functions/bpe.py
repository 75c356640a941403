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

No SQL twin for the merge loop (iterative state is not a query); the
driver row is rows-only and the math is pinned by pytest against a
from-scratch reference implementation, plus block-layout invariance.
"""

from __future__ import annotations

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
    tabs = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
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
        batch_format="pyarrow", concurrency=(1, 4), max_restarts=0,
    )
