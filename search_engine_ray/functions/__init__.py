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

from __future__ import annotations


def actor_pool(frac: float = 0.5, floor: int = 2, cap: int | None = None
               ) -> tuple[int, int]:
    """``concurrency=(1, N)`` sizing for a stateful ``map_batches``
    actor-pool stage: N = ``frac`` of the cluster's CPUs (default half
    — leaving cores for the reads/writes feeding the pool, the stage-A
    lesson in pipelines/build.py), at least ``floor``. A fixed literal
    here is a SCALE BUG: ``concurrency=(1, 4)`` runs four actors on a
    256-node cluster. Never initializes Ray (the driver contract owns
    the session); before ray.init the pool sizes from
    ``os.cpu_count()`` — the cluster Ray auto-inits locally. A caller
    targeting a REMOTE cluster should ``ray.init`` before building the
    pipeline (the machine's count may not match the cluster's)."""
    import os

    import ray

    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 0))
    else:
        # Ray will AUTO-INIT a local cluster sized to the machine when
        # the dataset executes — size the pool to that future cluster
        # rather than freezing at the floor
        ncpu = os.cpu_count() or 0
    n = max(floor, int(ncpu * frac))
    return (1, min(n, cap) if cap else n)
