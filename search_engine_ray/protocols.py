"""Formal user-extension surface (SURVEY.md §2.10).

The reference exposes plain Java interfaces as its extension points —
``LemmaFinder`` (``/root/reference/src/main/java/searchengine/services/
morphology/LemmaFinder.java:6-10``), ``SearchService``
(``services/search/SearchService.java:5-15``) — wired by Spring. Here the
same two seams are explicit:

1. **Analyzer** — a module implementing this protocol can replace the
   built-in analyzer for a build: pass its import path as
   ``BuildConfig.extra["analyzer_module"]``. The analyzer actors import
   it once per worker process, its ``ANALYZER_VERSION`` is baked into
   every partition's lineage key (a resumed build never mixes analyzer
   versions), and the build manifest records the module path so
   ``SearchEngine`` analyzes queries with the SAME module —
   rank-identity holds for any analyzer as long as engine and oracle
   share it.

2. **Scorer** — ``search.register_scorer(name)`` registers a ranking
   strategy callable; ``SearchEngine.search(mode=name)`` dispatches to
   it. The built-ins (``bm25`` block-max / exhaustive, ``reference``
   parity) are fixed; custom scorers receive the engine instance (block
   cache, decode helpers, corpus stats) and own their semantics.

Everything else is plain Ray Data — users splice their own
``map_batches`` stages before/after any pipeline stage.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np
import pyarrow as pa


@runtime_checkable
class Analyzer(Protocol):
    """Structural contract for a pluggable analyzer MODULE (the default
    implementation is :mod:`search_engine_ray.analyzer`; modules satisfy
    this protocol with plain top-level functions)."""

    #: bumped whenever tokenization/lemmatization semantics change —
    #: part of every stage-A partition's lineage key
    ANALYZER_VERSION: str

    def analyze_batch(
        self, texts: pa.Array | pa.ChunkedArray, memo: dict[str, str]
    ) -> tuple[np.ndarray, ...]:
        """Vectorized per-batch analysis: ``(post_doc_idx, post_lemmas,
        post_tf, doc_len[, pos_deltas])`` — see ``analyzer.analyze_batch``.
        The optional 5th element (per-posting delta-encoded token
        positions, tf values per posting) enables phrase queries; a
        module that emits it should set ``HAS_POSITIONS = True`` at
        module level. A 4-tuple analyzer still builds a valid
        (phrase-disabled) index."""
        ...

    def analyze_query(self, text: str) -> list[str]:
        """Deduped, deterministically ordered query lemmas."""
        ...

    def analyze(self, text: str) -> dict[str, int]:
        """Scalar per-document lemma -> tf map (golden tests, deltas)."""
        ...


class Scorer(Protocol):
    """Ranking-strategy callable registered via
    ``search.register_scorer``: ``(engine, terms, k, scope, conjunctive)
    -> (docids desc-by-score, float64 scores, exact count)``."""

    def __call__(
        self,
        engine,
        terms: list[tuple[str, int]],
        k: int,
        scope: str | None,
        conjunctive: bool,
    ) -> tuple[np.ndarray, np.ndarray, int]: ...
