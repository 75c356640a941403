"""Operator library beyond the reference's surface — the training-data
pipeline functions a 100 TB corpus needs (each module documents its
shuffle structure and partitioning assumptions):

- :mod:`.dedup`          exact / n-gram-Jaccard / MinHash-LSH / SimHash /
                         embedding-cosine deduplication
- :mod:`.similarity`     brute-force + IVF cosine nearest-neighbour search
- :mod:`.text_analysis`  token counts, quality scoring, language ID,
                         document fingerprinting
- :mod:`.windows`        tumbling-window aggregates + sessionization
- :mod:`.snippets`       reference-parity snippet creation/highlighting
"""
