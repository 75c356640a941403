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


def _nb_counts_ds(ds, label_col: str, text_col: str):
    """The distributed counting pass shared by both physical plans ->
    Dataset(key, cnt) where key = label SEP token (token '' rows carry
    per-label doc counts). Map-side combined; the exchange is
    model-sized, never corpus-sized."""
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

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def nb_fit(ds, label_col: str = "source", text_col: str = "text") -> dict:
    """One counting pass over the corpus -> the NB model:
    ``{"counts": pa.Table(label, token, cnt), "label_docs":
    {label: n_docs}, "n_docs": int, "vocab": int}``. Refuses loudly
    above the model-broadcast bound — the scale plan is
    :func:`nb_classify` ``mode='join'``."""
    folded = _nb_counts_ds(ds, label_col, text_col).take_all()
    if len(folded) > NB_BROADCAST_MAX_ROWS:
        raise ValueError(
            f"NB model has {len(folded)} (label, token) rows — above the "
            f"enforced {NB_BROADCAST_MAX_ROWS} broadcast bound; use "
            "nb_classify(mode='join') (the token-keyed join scorer)"
        )
    return _nb_model_from_rows(folded)


def _nb_model_from_rows(folded: list[dict]) -> dict:
    """Assemble the broadcastable model dict from folded count rows."""
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


def _nb_score_joined(ds, folded_ds, id_col: str, text_col: str):
    """The scale plan: score WITHOUT a driver-side model. The folded
    (label, token) counts stay a Dataset; label-sized state (doc
    counts, per-label token totals, priors, unseen rows) is the only
    driver pull, the vocabulary size is one model-sized count, and the
    token stream meets the model in a key-partitioned hash join.

    Exactness device vs :func:`nb_score`: score(doc, L) = q_prior[L] +
    total_occ * q_unseen[L] + SUM over SEEN occurrences of
    (q(token, L) - q_unseen[L]) — all int64, so only rows for seen
    (token, label) pairs ever ship and absent pairs contribute exactly
    their unseen value with no labels x vocab cross anywhere. Joins go
    through an md5-int64 token key with an exact string post-filter
    (hash-equal-but-different strings drop), so a collision cannot
    merge two tokens' probabilities."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..analyzer import lemma_hash64
    from .joins import hash_join

    folded_ds = folded_ds.materialize()  # consumed three times below

    def _split(b: pa.Table):
        key = b.column("key").combine_chunks()
        # tokens are [a-z0-9]+ and labels never contain the separator,
        # so one max_splits=1 split recovers (label, token) exactly
        parts = pc.split_pattern(key, _SEP, max_splits=1)
        lab = pc.list_element(parts, 0)
        tok = pc.list_element(parts, 1)
        return lab, tok, b.column("cnt").combine_chunks().cast(pa.int64())

    # ---- label-sized driver state (|labels| rows) + vocab size ----
    def lab_partial(b: pa.Table) -> pa.Table:
        lab, tok, cnt = _split(b)
        is_doc = pc.equal(tok, "")
        t = pa.table({"lab": lab, "is_doc": is_doc, "cnt": cnt})
        g = t.group_by(["lab", "is_doc"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["lab", "is_doc", "cnt"])

    import ray as _ray

    lab_rows = pa.concat_tables([
        t for t in _ray.get(
            folded_ds.map_batches(lab_partial, batch_format="pyarrow")
            .groupby(["lab", "is_doc"]).aggregate(Sum("cnt", alias_name="cnt"))
            .materialize().to_arrow_refs())
        if t.num_rows
    ])
    label_docs: dict[str, int] = {}
    tok_tot: dict[str, int] = {}
    for r in lab_rows.to_pylist():
        (label_docs if r["is_doc"] else tok_tot)[r["lab"]] = int(r["cnt"])
    labels = sorted(label_docs)
    nl = len(labels)
    lab_idx = {l: i for i, l in enumerate(labels)}

    def tok_marker(b: pa.Table) -> pa.Table:
        _lab, tok, _cnt = _split(b)
        t = pa.table({"tok": tok}).filter(pc.not_equal(tok, ""))
        return t.group_by(["tok"]).aggregate([])

    from ray.data.aggregate import Count as _Count

    v = (
        folded_ds.map_batches(tok_marker, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(_Count())
        .count()  # rows of the groupby == distinct tokens
    )

    def q(x: np.ndarray) -> np.ndarray:
        return np.floor(np.log(x) * NB_Q + 0.5).astype(np.int64)

    denom = np.array(
        [tok_tot.get(l, 0) + NB_ALPHA * v for l in labels], np.float64
    )
    unseen = (
        q(NB_ALPHA / denom) if v else np.zeros(nl, np.int64)
    )
    n_docs = sum(label_docs.values())
    prior = q(np.array([label_docs[l] * 1.0 / n_docs for l in labels]))

    # ---- model delta rows: (th, m_token, label, dq) ----
    def deltas(b: pa.Table) -> pa.Table:
        lab, tok, cnt = _split(b)
        keep = pc.not_equal(tok, "")
        lab, tok = lab.filter(keep), tok.filter(keep)
        cnt_np = cnt.filter(keep).to_numpy(zero_copy_only=False)
        li = np.array([lab_idx[x] for x in lab.to_pylist()], np.int64)
        qv = q((cnt_np + NB_ALPHA) / denom[li])
        toks = tok.to_pylist()
        th = np.array([lemma_hash64(t) for t in toks], np.int64)
        return pa.table({
            "th": pa.array(th, pa.int64()),
            "m_token": tok,
            "label": lab,
            "dq": pa.array(qv - unseen[li], pa.int64()),
        })

    model_ds = folded_ds.map_batches(deltas, batch_format="pyarrow")

    # ---- doc token stream: (doc_id, th, token, n_occ) + totals ----
    def doc_tokens(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(b.column(text_col).combine_chunks(), ""))
        toks = _token_lists(low)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id_": pa.array(np.repeat(ids, counts), pa.int64()),
            "token": flat,
        })
        g = t.group_by(["doc_id_", "token"]).aggregate([([], "count_all")])
        gt = g.column("token").combine_chunks()
        th = np.array([lemma_hash64(x) for x in gt.to_pylist()], np.int64)
        return pa.table({
            "doc_id_": g.column("doc_id_"),
            "th": pa.array(th, pa.int64()),
            "token": gt,
            "n_occ": g.column("count_all").cast(pa.int64()),
        })

    def doc_totals(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(b.column(text_col).combine_chunks(), ""))
        toks = _token_lists(low)
        return pa.table({
            "doc_id_": b.column(id_col).cast(pa.int64()),
            "total": pc.list_value_length(toks).cast(pa.int64()),
        })

    tok_ds = ds.map_batches(doc_tokens, batch_format="pyarrow")
    tot_ds = ds.map_batches(doc_totals, batch_format="pyarrow")

    j = hash_join(tok_ds, model_ds, left_on="th", mode="shuffle")

    def sdq_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("token"), b.column("m_token")))
        if not b.num_rows:
            return pa.table({
                "doc_id_": pa.array([], pa.int64()),
                "label": pa.array([], pa.string()),
                "s": pa.array([], pa.int64()),
            })
        part = (
            b.column("n_occ").to_numpy(zero_copy_only=False)
            * b.column("dq").to_numpy(zero_copy_only=False)
        )
        t = pa.table({
            "doc_id_": b.column("doc_id_"),
            "label": b.column("label"),
            "s": pa.array(part, pa.int64()),
        })
        g = t.group_by(["doc_id_", "label"]).aggregate([("s", "sum")])
        return g.rename_columns(["doc_id_", "label", "s"])

    sdq = (
        j.map_batches(sdq_partial, batch_format="pyarrow")
        .groupby(["doc_id_", "label"])
        .aggregate(Sum("s", alias_name="s"))
    )

    final = hash_join(tot_ds, sdq, left_on="doc_id_", how="left", mode="shuffle")

    def finish(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "label_pred": pa.array([], pa.string()),
                "score_q": pa.array([], pa.int64()),
            })
        did = b.column("doc_id_").to_numpy(zero_copy_only=False)
        tot = b.column("total").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(did, return_inverse=True)
        nd = len(uniq)
        tot_per = np.zeros(nd, np.int64)
        tot_per[inv] = tot  # all rows of a doc share total
        scores = prior[None, :] + np.outer(tot_per, unseen)
        labv = b.column("label").to_numpy(zero_copy_only=False)
        sv = b.column("s").to_numpy(zero_copy_only=False)
        valid = np.array([x is not None for x in labv], bool)
        if valid.any():
            li = np.array([lab_idx[x] for x in labv[valid]], np.int64)
            np.add.at(
                scores, (inv[valid], li),
                sv[valid].astype(np.int64),
            )
        best = np.argmax(scores, axis=1)
        return pa.table({
            id_col: pa.array(uniq, pa.int64()),
            "label_pred": pa.array([labels[x] for x in best], pa.string()),
            "score_q": pa.array(scores[np.arange(nd), best], pa.int64()),
        })

    return final.map_batches(finish, batch_format="pyarrow", batch_size=None)


def nb_classify(ds, label_col: str = "source", id_col: str = "doc_id",
                text_col: str = "text", mode: str = "auto",
                broadcast_max_rows: int = NB_BROADCAST_MAX_ROWS):
    """Fit on the corpus' own labels, score the same corpus — the
    driver-checkable self-classification round trip (training rows ==
    scoring rows, so no unseen-token path fires and the SQL twin can
    recompute the whole model inline).

    Two physical plans, pinned equal by test: ``broadcast`` (the fitted
    model ships once via ray.put — bounded by ``broadcast_max_rows``)
    and ``join`` (the scale plan: the model stays a Dataset and meets
    the token stream in a key-partitioned hash join — see
    :func:`_nb_score_joined`). ``auto`` falls over to join above the
    bound instead of raising."""
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"bad mode {mode!r}")
    if mode == "broadcast":
        model = nb_fit(ds, label_col=label_col, text_col=text_col)
        return nb_score(ds, model, id_col=id_col, text_col=text_col)
    folded_ds = _nb_counts_ds(ds, label_col, text_col)
    if mode == "join":
        return _nb_score_joined(ds, folded_ds, id_col, text_col)
    # materialize FIRST: the fold's COMPUTE is a corpus-scale analyze
    # but its OUTPUT is vocabulary-sized — pin the output so the bound
    # count and whichever scorer runs share one execution
    folded_ds = folded_ds.materialize()
    n_rows = folded_ds.count()
    if n_rows > broadcast_max_rows:
        return _nb_score_joined(ds, folded_ds, id_col, text_col)
    folded = folded_ds.take_all()
    model = _nb_model_from_rows(folded)
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
