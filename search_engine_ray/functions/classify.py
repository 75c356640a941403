"""Multinomial Naive Bayes document classification — the
classifier-based quality/domain-filter family (the GPT-3 data-quality
classifier shape, Brown et al. 2020 App. A; CCNet's linear filters):
train a per-class token model in ONE distributed counting pass, then
score/route the whole corpus with a pure broadcast map.

Exactness device: every log-probability is QUANTIZED to 1e-6 with the
half-up rule ``floor(x * 1e6 + 0.5)`` shared verbatim with the SQL twin
(ln is the one libm-trust op — the ``sample_mixture`` precedent), so a
document's per-class score is a SUM OF INT64s — order-free, exact at
any block layout, partitioning or cluster size — and prediction is an
integer argmax with the (score DESC, label ASC) tie-break.

Scale shape: the train pass emits map-side-combined (label, token)
partial counts and ONE bucket groupby folds them — the exchange is
model-sized (vocab x n_classes), never corpus-sized. The fitted model
broadcasts below ``NB_BROADCAST_MAX_ROWS`` (the planner's enforced 2M
bound, the tfidf rule); above it the fit REFUSES loudly — the scale
path is a token-keyed join of the flat token stream against the count
table (the ``_tfidf_topk_joined`` shape), deliberately not silently
materialized on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text_analysis import WORD_REGEX

NB_ALPHA = 1.0  # Laplace smoothing
NB_Q = 1_000_000  # log-prob quantization (1e-6, half-up)
NB_BROADCAST_MAX_ROWS = 2_000_000  # enforced model-broadcast bound
_SEP = "\x1f"


def nb_fit(ds, label_col: str = "source", text_col: str = "text") -> dict:
    """One counting pass over the corpus -> the NB model:
    ``{"counts": pa.Table(label, token, cnt), "label_docs":
    {label: n_docs}, "n_docs": int, "vocab": int}``. Token counts
    combine INSIDE each map task (an Arrow group_by per batch), so the
    groupby exchange ships per-batch distinct (label, token) rows —
    model-sized, not corpus-sized."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(
            pc.fill_null(batch.column(text_col).combine_chunks(), "")
        )
        toks = _token_lists(low)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        lab_rep = pa.array(np.repeat(labels, counts)).cast(pa.string())
        # map-side combine: an Arrow group_by INSIDE the task, so the
        # exchange ships per-batch distinct (label, token) rows
        t = pa.table({"label": lab_rep, "token": flat})
        g = t.group_by(["label", "token"]).aggregate([([], "count_all")])
        # doc-count rows ride the same schema with token='' (never a
        # WORD_REGEX token), so ONE exchange carries counts AND priors
        return pa.concat_tables([
            pa.table({
                "key": pc.binary_join_element_wise(
                    g.column("label").combine_chunks(),
                    g.column("token").combine_chunks(), _SEP,
                ),
                "cnt": g.column("count_all").cast(pa.int64()),
            }),
            pa.table({
                "key": pa.array(
                    [f"{l}{_SEP}" for l in labels], pa.string()
                ),
                "cnt": pa.array(np.ones(len(labels), np.int64)),
            }),
        ])

    folded = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))
    ).take_all()
    if len(folded) > NB_BROADCAST_MAX_ROWS:
        raise ValueError(
            f"NB model has {len(folded)} (label, token) rows — above the "
            f"enforced {NB_BROADCAST_MAX_ROWS} broadcast bound; at this "
            "vocabulary use a token-keyed join scorer "
            "(the _tfidf_topk_joined shape), not a driver model"
        )
    labels_l, tokens_l, cnts_l = [], [], []
    label_docs: dict[str, int] = {}
    vocab: set[str] = set()
    for row in folded:
        lab, tok = row["key"].split(_SEP, 1)
        if tok == "":
            label_docs[lab] = int(row["cnt"])
            continue
        labels_l.append(lab)
        tokens_l.append(tok)
        cnts_l.append(int(row["cnt"]))
        vocab.add(tok)
    return {
        "counts": pa.table(
            {
                "label": pa.array(labels_l, pa.string()),
                "token": pa.array(tokens_l, pa.string()),
                "cnt": pa.array(cnts_l, pa.int64()),
            }
        ),
        "label_docs": label_docs,
        "n_docs": sum(label_docs.values()),
        "vocab": len(vocab),
    }


def _token_lists(low: pa.Array):
    """Lowercased WORD_REGEX token lists (pyarrow has no extract-all
    kernel, so split on the complement then drop empties — RE2, same
    token set as ``regexp_extract_all(low, WORD_REGEX)``)."""
    parts = pc.split_pattern_regex(low, "[^a-z0-9]+")
    # drop empty strings produced by leading/trailing separators
    flat = pc.list_flatten(parts)
    keep = pc.greater(pc.utf8_length(flat), 0)
    # rebuild list structure with empties removed
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(parts), dtype=np.int64), counts)[keep_np]
    kept = flat.filter(keep)
    n = len(parts)
    lens = np.bincount(doc_of, minlength=n).astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)


def _quantize_logs(model: dict):
    """-> (labels sorted ASC, {token -> int64[n_labels] q-logprob rows},
    unseen q row, prior q row). The quantization is
    ``floor(ln(x) * 1e6 + 0.5)`` — the exact expression the SQL twin
    inlines."""
    labels = sorted(model["label_docs"])
    lab_idx = {l: i for i, l in enumerate(labels)}
    v = model["vocab"]
    tot = np.zeros(len(labels), np.float64)
    c = model["counts"]
    lab_col = c.column("label").to_pylist()
    tok_col = c.column("token").to_pylist()
    cnt_col = c.column("cnt").to_numpy(zero_copy_only=False)
    for lab, cnt in zip(lab_col, cnt_col):
        tot[lab_idx[lab]] += cnt

    def q(x: np.ndarray) -> np.ndarray:
        return np.floor(np.log(x) * NB_Q + 0.5).astype(np.int64)

    denom = tot + NB_ALPHA * v
    # v == 0 (a corpus with no tokens at all): no token rows exist, so
    # the unseen row is unreachable — zeros instead of log(alpha/0)
    unseen = q(NB_ALPHA / denom) if v else np.zeros(len(labels), np.int64)
    qrows: dict[str, np.ndarray] = {}
    for lab, tok, cnt in zip(lab_col, tok_col, cnt_col):
        row = qrows.get(tok)
        if row is None:
            row = qrows[tok] = unseen.copy()
        li = lab_idx[lab]
        row[li] = q(np.array([(cnt + NB_ALPHA) / denom[li]]))[0]
    n_docs = model["n_docs"]
    prior = q(np.array(
        [model["label_docs"][l] * 1.0 / n_docs for l in labels]
    ))
    return labels, qrows, unseen, prior


def nb_score(ds, model: dict, id_col: str = "doc_id",
             text_col: str = "text"):
    """Score every document against the fitted model: one broadcast
    map. Per doc and class the score is ``q_prior + Σ_occurrence
    q_logprob(token, class)`` — int64 sums, order-free — and the
    prediction is the (score DESC, label ASC) argmax (labels are
    scored in ASC order, so numpy's first-max IS the tie-break).
    -> Dataset(id, label_pred, score_q)."""
    import ray

    labels, qrows, unseen, prior = _quantize_logs(model)
    ref = ray.put((labels, qrows, unseen, prior))

    def score(batch: pa.Table) -> pa.Table:
        labels_, qrows_, unseen_, prior_ = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        low = pc.utf8_lower(
            pc.fill_null(batch.column(text_col).combine_chunks(), "")
        )
        toks = _token_lists(low)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        nl = len(labels_)
        scores = np.tile(prior_, (len(ids), 1))
        if len(flat):
            d = flat.dictionary_encode()
            uniq = d.dictionary.to_pylist()
            rows = np.empty((len(uniq), nl), np.int64)
            for i, t in enumerate(uniq):
                rows[i] = qrows_.get(t, unseen_)
            tok_rows = rows[d.indices.to_numpy(zero_copy_only=False)]
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
            starts = np.flatnonzero(np.diff(doc_of, prepend=-1))
            sums = np.add.reduceat(tok_rows, starts, axis=0)
            scores[doc_of[starts]] += sums
        best = np.argmax(scores, axis=1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "label_pred": pa.array([labels_[b] for b in best], pa.string()),
                "score_q": pa.array(
                    scores[np.arange(len(ids)), best], pa.int64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def nb_classify(ds, label_col: str = "source", id_col: str = "doc_id",
                text_col: str = "text"):
    """Fit on the corpus' own labels, score the same corpus — the
    driver-checkable self-classification round trip (training rows ==
    scoring rows, so no unseen-token path fires and the SQL twin can
    recompute the whole model inline)."""
    model = nb_fit(ds, label_col=label_col, text_col=text_col)
    return nb_score(ds, model, id_col=id_col, text_col=text_col)


def nb_classify_sql(src: str, label_col: str = "source",
                    id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`nb_classify`: recomputes per-(label,
    token) counts, totals, vocabulary, priors and the SAME half-up
    1e-6 quantized log-probs, then the per-doc int64 score sum and the
    (score DESC, label ASC) argmax. Every compared value is an
    integer; ln is the one shared-libm op (the mixture precedent), and
    the quantization expression ``floor(ln(x) * 1e6 + 0.5)`` is
    mirrored verbatim."""
    a, qn = NB_ALPHA, NB_Q
    return f"""
WITH toks AS (
    SELECT {id_col}, {label_col} AS label,
           unnest(regexp_extract_all(lower(coalesce(text, '')), '{WORD_REGEX}')) AS token
    FROM {src}
),
cnts AS (SELECT label, token, count(*) AS c FROM toks GROUP BY 1, 2),
ldocs AS (SELECT {label_col} AS label, count(*) AS nd FROM {src} GROUP BY 1),
tots AS (
    SELECT l.label, coalesce(sum(c.c), 0) AS tot
    FROM ldocs l LEFT JOIN cnts c ON c.label = l.label GROUP BY 1
),
voc AS (SELECT count(DISTINCT token) AS v FROM toks),
nall AS (SELECT count(*) AS n FROM {src}),
-- the smoothed log-prob exists for EVERY (label, token-in-vocab) pair
-- (labels that never saw a token score its alpha-smoothed value — the
-- engine's unseen row), so qlp is the labels x vocab cross
qlp AS (
    SELECT l.label, tk.token,
           CAST(floor(ln((coalesce(c.c, 0) + {a}) / (t.tot + {a} * voc.v))
                      * {qn} + 0.5) AS BIGINT) AS q
    FROM (SELECT DISTINCT token FROM toks) tk
    CROSS JOIN ldocs l
    LEFT JOIN cnts c ON c.token = tk.token AND c.label = l.label
    JOIN tots t ON t.label = l.label
    CROSS JOIN voc
),
qprior AS (
    SELECT l.label,
           CAST(floor(ln(l.nd * 1.0 / nall.n) * {qn} + 0.5) AS BIGINT) AS q
    FROM ldocs l CROSS JOIN nall
),
docsum AS (
    SELECT tk.{id_col}, p.label, sum(p.q) AS s
    FROM toks tk JOIN qlp p ON p.token = tk.token
    GROUP BY 1, 2
),
scores AS (
    SELECT d.{id_col}, qp.label,
           qp.q + coalesce(ds.s, 0) AS score_q
    FROM {src} d
    CROSS JOIN qprior qp
    LEFT JOIN docsum ds ON ds.{id_col} = d.{id_col} AND ds.label = qp.label
),
ranked AS (
    SELECT {id_col}, label, score_q,
           row_number() OVER (
               PARTITION BY {id_col} ORDER BY score_q DESC, label ASC
           ) AS rn
    FROM scores
)
SELECT {id_col}, label AS label_pred, CAST(score_q AS BIGINT) AS score_q
FROM ranked WHERE rn = 1
"""
