"""search_engine_ray — a Ray-Data-native inverted-index + BM25 search engine.

A from-scratch reimplementation of the *capabilities* of
elnaradin/search-engine (reference at /root/reference, Java/Spring/MySQL)
re-expressed Ray-Data-first:

- documents are conversation-transcript turns (one turn = one document,
  docID = ``(conv_id, turn_idx)``) per the BASELINE.json ``input_hint``;
- the analyzer chain (tokenize -> charset fold -> stopword filter ->
  suffix lemmatize -> per-doc tf) mirrors the reference's
  ``LemmaFinderImpl`` (services/morphology/LemmaFinderImpl.java:19-118)
  but runs vectorized over zero-copy Arrow batches on an actor pool;
- posting lists are built with groupby shuffles + delta+varint block
  compression with skip metadata, queried with block-max WAND BM25 top-k
  (replacing the reference's query-independent relevance at
  repositories/IndexRepository.java:14-20).

No module in this package calls ``ray.init()`` / ``ray.shutdown()`` —
the driver, bench.py, and the pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"
