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
- posting lists are built by ONE integer-keyed range exchange
  (sort by (lemma_hash64, docid)) + delta+varint block compression with
  skip metadata; the term dictionary derives from per-block partial
  aggregates; queries run block-max BM25 top-k with lossless pruning and
  an adaptive exhaustive fallback (replacing the reference's
  query-independent relevance at repositories/IndexRepository.java:14-20);
- incremental per-conversation re-index appends LSM-style delta
  generations that the query engine overlays rank-identically to a full
  rebuild (pipelines/delta.py);
- ``functions/`` adds the training-data operators a 100 TB corpus
  pipeline needs (dedup, ANN similarity, text analysis, windows) and
  ``stages/multimodal.py`` the binary-media plumbing.

No module in this package calls ``ray.init()`` / ``ray.shutdown()`` —
the driver, bench.py, and the pytest session fixture own the Ray session.
"""

__version__ = "0.1.0"
