"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, quality scoring, language ID,
document fingerprinting. All are stateless vectorized ``map_batches``
transforms (Arrow in / Arrow out). The SQL-expressible ones (token
counts, quality features, md5 fingerprint) have DuckDB oracles generated
from the SAME regex/constant tables (both engines use RE2, so the
patterns behave identically); language ID and the rolling hash are
rows-only checked + unit-tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WS_TOKEN_REGEX = r"\S+"
WORD_REGEX = r"[a-z0-9]+"
ALNUM_CHAR_REGEX = r"[a-z0-9]"
PUNCT_CHAR_REGEX = r"[.,;:!?]"

# frozen per-language stopword profiles for the language heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"),
    "es": ("de", "la", "que", "el", "en", "los", "del", "las", "por", "con", "una", "es"),
    "de": ("der", "die", "und", "das", "von", "den", "mit", "ist", "des", "ein", "im", "nicht"),
    "fr": ("de", "la", "le", "les", "des", "est", "une", "dans", "que", "pour", "qui", "sur"),
}

QUALITY_STOPWORDS: tuple[str, ...] = LANG_PROFILES["en"]
STOPWORD_REGEX = r"\b(" + "|".join(QUALITY_STOPWORDS) + r")\b"

QUALITY_ROUND = 6
FP_HASH_BASE = 1_000_003  # odd multiplier; fold is mod 2^64 (uint64 wrap)


def _lower(batch: pa.Table, text_col: str) -> pa.Array:
    return pc.utf8_lower(pc.fill_null(batch.column(text_col).combine_chunks(), ""))


def _round6(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero at 6 decimals (DuckDB ``round``
    semantics; ``np.round`` is half-even and disagrees on exact .5s)."""
    return np.floor(x * 10.0**QUALITY_ROUND + 0.5) / 10.0**QUALITY_ROUND


def _count(arr: pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(arr, pattern)


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``n_ws_tokens`` (whitespace-delimited) and ``n_word_tokens``
    (regex ``[a-z0-9]+`` over lowercased text — BPE-ish word
    pre-tokenization count)."""
    low = _lower(batch, text_col)
    return batch.append_column(
        "n_ws_tokens", _count(low, WS_TOKEN_REGEX).cast(pa.int64())
    ).append_column("n_word_tokens", _count(low, WORD_REGEX).cast(pa.int64()))


def quality_features(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword-ratio quality features + a
    composite ``quality_score`` in [0, 1]."""
    low = _lower(batch, text_col)
    n_chars = pc.utf8_length(low).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    n_words = _count(low, WORD_REGEX).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alnum = _count(low, ALNUM_CHAR_REGEX).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = _count(low, PUNCT_CHAR_REGEX).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    n_stop = _count(low, STOPWORD_REGEX).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)

    denom_c = np.maximum(n_chars, 1.0)
    denom_w = np.maximum(n_words, 1.0)
    mean_word_len = _round6(n_alnum / denom_w)
    alpha_ratio = _round6(n_alnum / denom_c)
    punct_ratio = _round6(n_punct / denom_c)
    stop_ratio = _round6(n_stop / denom_w)
    score = _round6(
        0.3 * (n_alnum / denom_c)
        + 0.3 * (1.0 - n_punct / denom_c)
        + 0.2 * (1.0 - n_stop / denom_w)
        + 0.2 * np.minimum(n_words / 100.0, 1.0)
    )
    out = batch
    for name, arr in (
        ("n_chars", n_chars.astype(np.int64)),
        ("n_words", n_words.astype(np.int64)),
        ("mean_word_len", mean_word_len),
        ("alpha_ratio", alpha_ratio),
        ("punct_ratio", punct_ratio),
        ("stop_ratio", stop_ratio),
        ("quality_score", score),
    ):
        col = pa.array(arr)
        if name in out.column_names:  # input may carry e.g. its own n_chars
            out = out.set_column(out.column_names.index(name), name, col)
        else:
            out = out.append_column(name, col)
    return out


def quality_features_sql(src: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`quality_features` (same regexes, RE2)."""
    low = "lower(coalesce(text, ''))"
    n_chars, n_words = f"length({low})", f"len(regexp_extract_all({low}, '{WORD_REGEX}'))"
    n_alnum = f"len(regexp_extract_all({low}, '{ALNUM_CHAR_REGEX}'))"
    n_punct = f"len(regexp_extract_all({low}, '{PUNCT_CHAR_REGEX}'))"
    n_stop = f"len(regexp_extract_all({low}, '{STOPWORD_REGEX}'))"
    dc, dw = f"greatest({n_chars}, 1)", f"greatest({n_words}, 1)"
    r = QUALITY_ROUND
    return f"""
SELECT {id_col},
       CAST({n_chars} AS BIGINT) AS n_chars,
       CAST({n_words} AS BIGINT) AS n_words,
       round({n_alnum} * 1.0 / {dw}, {r}) AS mean_word_len,
       round({n_alnum} * 1.0 / {dc}, {r}) AS alpha_ratio,
       round({n_punct} * 1.0 / {dc}, {r}) AS punct_ratio,
       round({n_stop} * 1.0 / {dw}, {r}) AS stop_ratio,
       round(0.3 * ({n_alnum} * 1.0 / {dc})
           + 0.3 * (1.0 - {n_punct} * 1.0 / {dc})
           + 0.2 * (1.0 - {n_stop} * 1.0 / {dw})
           + 0.2 * least({n_words} / 100.0, 1.0), {r}) AS quality_score
FROM {src}
"""


def token_counts_sql(src: str, id_col: str = "doc_id") -> str:
    low = "lower(coalesce(text, ''))"
    return (
        f"SELECT {id_col}, "
        f"CAST(len(regexp_extract_all({low}, '{WS_TOKEN_REGEX}')) AS BIGINT) AS n_ws_tokens, "
        f"CAST(len(regexp_extract_all({low}, '{WORD_REGEX}')) AS BIGINT) AS n_word_tokens "
        f"FROM {src}"
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

# per-worker-process token -> md5-uint64 memo for the rolling hash
_FP_TOKEN_MEMO: dict[str, int] = {}


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Adds ``fp_md5`` (md5 hex of whitespace-normalized lowercase text —
    byte-identical to DuckDB's ``md5()``) and ``fp_roll`` (64-bit
    polynomial rolling hash over whitespace tokens — the
    streaming-friendly content fingerprint; rows-only checked).

    fp_roll is FULLY VECTORIZED: token md5s run once per unique token per
    process (memo), the polynomial fold ``h = Σ t_j·B^(n-1-j)`` (uint64
    wraparound) is one power-table gather + one ``np.add.reduceat``."""
    low = _lower(batch, text_col)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(low, r"\s+", " ")
    )
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in norm.to_pylist()]

    n = batch.num_rows
    toks = pc.split_pattern(norm, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)[keep_np]
    flat = flat.filter(keep)
    rolls = np.zeros(n, np.uint64)
    if len(flat):
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        memo = _FP_TOKEN_MEMO
        get = memo.get
        uniq_h = np.empty(len(uniq), np.uint64)
        for i, s in enumerate(uniq):
            h = get(s)
            if h is None:
                h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
                memo[s] = h
            uniq_h[i] = h
        th = uniq_h[d.indices.to_numpy(zero_copy_only=False)]
        # exponent of each token = tokens-after-it within its doc
        starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
        seg_len = np.diff(np.append(starts, len(doc_idx)))
        ends = np.repeat(np.cumsum(seg_len), seg_len)
        exp = ends - 1 - np.arange(len(doc_idx))
        maxlen = int(seg_len.max())
        pw = np.concatenate(
            ([np.uint64(1)], np.full(maxlen - 1, FP_HASH_BASE, np.uint64))
        ).cumprod()
        acc = np.add.reduceat(th * pw[exp], starts)
        rolls[doc_idx[starts]] = acc
    return batch.append_column("fp_md5", pa.array(md5s, pa.string())).append_column(
        "fp_roll", pa.array(rolls.view(np.int64), pa.int64())
    )


def fingerprint_sql(src: str, id_col: str = "doc_id") -> str:
    norm = "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"
    return f"SELECT {id_col}, md5({norm}) AS fp_md5 FROM {src}"


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — rows-only oracle
# ---------------------------------------------------------------------------

def langid_sql(src: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of :class:`LangId` — the heuristic is pure regex
    counting, so the SAME profile tables generate an exact oracle
    (argmax tie-break = profile declaration order, mirroring the
    first-max-wins Python loop; float divisions are identical IEEE
    ops on identical integers)."""
    low = "lower(coalesce(text, ''))"
    n_words = f"greatest(len(regexp_extract_all({low}, '{WORD_REGEX}')), 1)"
    scores = {
        lang: f"(len(regexp_extract_all({low}, '\\b({'|'.join(ws)})\\b')) * 1.0 / {n_words})"
        for lang, ws in LANG_PROFILES.items()
    }
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PROFILES) + ")"
    first_max = " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in LANG_PROFILES
    )
    score_cols = ", ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    return f"""
WITH s AS (
    SELECT {id_col}, lang,
           len(regexp_extract_all({low}, '[一-鿿]')) AS n_cjk,
           greatest(length({low}), 1) AS n_chars,
           {score_cols}
    FROM {src}
),
sm AS (SELECT *, {m} AS m FROM s)
SELECT {id_col}, lang,
       CASE WHEN n_cjk > 0.2 * n_chars THEN 'zh'
            WHEN m < 0.05 THEN 'unknown'
            {first_max}
            ELSE 'unknown' END AS lang_pred
FROM sm
"""


class LangId:
    """Actor-pool language classifier: profile patterns built once per
    actor (``__init__``), FULLY VECTORIZED scoring per batch — one
    ``pc.count_substring_regex`` pass (RE2, C level) per language plus
    CJK/word-count passes; the per-row work is a numpy argmax. Scores
    each language by standalone-stopword hit rate; 'zh' by CJK char
    ratio. Exact SQL oracle: :func:`langid_sql` (generated from the same
    profiles — both sides run RE2 on identical patterns)."""

    CJK_REGEX = r"[一-鿿]"
    MIN_SCORE = 0.05
    CJK_RATIO = 0.2

    def __init__(self):
        self.patterns = {
            lang: r"\b(" + "|".join(ws) + r")\b" for lang, ws in LANG_PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = _lower(batch, "text")
        n_chars = np.maximum(
            pc.utf8_length(low).to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        n_cjk = _count(low, self.CJK_REGEX).to_numpy(zero_copy_only=False)
        n_words = np.maximum(
            _count(low, WORD_REGEX).to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        langs = list(self.patterns)
        scores = np.stack(
            [
                _count(low, p).to_numpy(zero_copy_only=False) / n_words
                for p in self.patterns.values()
            ]
        )  # (n_langs, n)
        best = np.argmax(scores, axis=0)  # first max wins (profile order)
        best_s = scores[best, np.arange(scores.shape[1])]
        lang_arr = np.asarray(langs, dtype=object)[best]
        lang_arr[best_s < self.MIN_SCORE] = "unknown"
        lang_arr[n_cjk > self.CJK_RATIO * n_chars] = "zh"
        return batch.append_column(
            "lang_pred", pa.array(lang_arr, pa.string())
        )
