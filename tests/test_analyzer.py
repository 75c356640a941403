"""Golden analyzer tests — the port of the reference's only operator
test (``/root/reference/src/test/java/LemmaFinderTest.java:17-40``: one
sentence -> exact lemma->tf map), extended per FIXTURES.md §4."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray import analyzer

GOLDEN = [
    # (text, expected lemma->tf) — covers case folding, punctuation,
    # stopword drop, inflection folding, repeated-lemma counting (the
    # reference's canonical twice-repeated word), short-token drop,
    # digits, unicode noise, empty text.
    ("The Leopard leopards!", {"leopard": 2}),
    ("Running runs run; runner?", {"runn": 1, "run": 2, "runner": 1}),
    ("cats and dogs, cats.", {"cat": 2, "dog": 1}),
    ("a I x", {}),
    ("", {}),
    ("   \t\n ", {}),
    ("42 7 4242", {"42": 1, "4242": 1}),
    ("Ж é ü — 🙂 №", {}),
    ("studies study studied", {"study": 2, "studi": 1}),
    ("classes class pass passes", {"class": 2, "pass": 2}),
    ("THE QUICK brown FOX", {"quick": 1, "brown": 1, "fox": 1}),
    ("it's it-is", {}),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_analyze(text, expected):
    assert analyzer.analyze(text) == expected


def test_lemma_rules_first_match_wins():
    # 'ies' rule fires before 's'
    assert analyzer.lemmatize_token("studies") == "study"
    # excluded endings block the bare-'s' rule
    assert analyzer.lemmatize_token("pass") == "pass"
    assert analyzer.lemmatize_token("status") == "status"
    assert analyzer.lemmatize_token("basis") == "basis"
    # min stem length guards
    assert analyzer.lemmatize_token("ring") == "ring"
    assert analyzer.lemmatize_token("red") == "red"


def test_analyze_query_dedup_and_sort():
    assert analyzer.analyze_query("Dogs DOG dogged; the a") == ["dog", "dogg"]
    assert analyzer.analyze_query("the and of") == []


def test_batch_path_matches_scalar_path():
    texts = [t for t, _ in GOLDEN] + ["wbaba wbabas WBABA, wbaba-s"]
    doc_idx, lemmas, tf, doc_len, _pos = analyzer.analyze_batch(pa.array(texts), {})
    got = [dict() for _ in texts]
    for i, lem, f in zip(doc_idx, lemmas, tf):
        got[int(i)][lem] = int(f)
    for text, g in zip(texts, got):
        assert g == analyzer.analyze(text)
    # doc_len = total surviving tokens per doc
    for text, dl in zip(texts, doc_len):
        assert int(dl) == sum(analyzer.analyze(text).values())


def test_batch_determinism_across_batch_boundaries():
    texts = ["wbaba wkelo", "wbabas!", "The wkeloed wbaba"] * 5
    a = analyzer.analyze_batch(pa.array(texts), {})
    memo = {}
    parts = [analyzer.analyze_batch(pa.array(texts[i : i + 4]), memo) for i in range(0, 15, 4)]
    whole = {}
    for i, lem, f in zip(a[0], a[1], a[2]):
        whole[(int(i), lem)] = int(f)
    split = {}
    for bi, p in enumerate(parts):
        for i, lem, f in zip(p[0], p[1], p[2]):
            split[(bi * 4 + int(i), lem)] = int(f)
    assert whole == split


def test_sql_lemmatizer_matches_python(duck):
    toks = [
        "studies", "running", "walked", "boxes", "cats", "pass", "status",
        "basis", "ring", "red", "wbabas", "wkeloed", "stream", "x1es",
    ]
    sql = f"SELECT {analyzer.lemma_case_sql('tok')} FROM (SELECT unnest(?) AS tok)"
    got = [r[0] for r in duck.execute(sql, [toks]).fetchall()]
    assert got == [analyzer.lemmatize_token(t) for t in toks]
