"""Build / search configuration (the analog of the reference's YAML config
``/root/reference/application.yaml:3-22`` + ``config/SitesList.java:10-16``:
a closed list of inputs + engine knobs, as a plain dataclass)."""

from __future__ import annotations

from dataclasses import dataclass, field


# Reference constants kept for parity mode (BASELINE.md):
REFERENCE_DF_CUTOFF = 250      # SearchServiceImpl.java:170 — query lemmas with df >= 250 dropped
SNIPPET_LEN = 240              # SnippetCreator.java:19
DEFAULT_PAGE_SIZE = 10         # templates/index.html:128

# docid layout: docid = (conv_rank << TURN_BITS) | turn_idx. Dense conv
# ranks are assigned in sorted conv_id order so uint64 docid order ==
# lexicographic (conv_id, turn_idx) order — the deterministic tie-break
# total order the rank-identity gate requires (SURVEY.md §7).
TURN_BITS = 20


@dataclass
class BuildConfig:
    input_paths: list[str]
    out_dir: str
    # analyzer actor pool (stateful stage A1, SURVEY.md §2.3).
    # None -> auto: a FIXED pool sized from the partition's input bytes
    # (~1 actor per 32 MiB, capped at cluster CPUs) — fixed beats
    # autoscaling here because pool ramp-up dominates small partitions,
    # and at large scale the size lands on the CPU cap anyway.
    # 4096: measured sweet spot for the analyzer map (2048 pays ~15%
    # more wall in per-batch dispatch/concat overhead; 8192 gains
    # nothing further and doubles peak per-actor batch memory)
    batch_size: int = 4096
    concurrency: tuple[int, int] | int | None = None
    # posting blocks
    block_size: int = 128            # postings per compressed block
    k1: float = 1.2
    b: float = 0.75
    # checkpointing: input files are grouped into stage-A partitions,
    # each with its own lineage manifest (resume unit). None -> auto:
    # one partition per ~256 MiB of input (capped by file count), so the
    # checkpoint interval is a data size, not a count — at 100 TB that
    # is ~400k partitions of bounded recompute cost, at bench scale it
    # avoids paying per-execution spin-up for toy slices.
    n_partitions: int | None = None
    # Skew note (hot lemmas): the stage-C range partitioner sorts by
    # (lemma_h, docid) and its sampled boundaries fall MID-lemma for any
    # lemma whose posting list exceeds a partition — hot lemmas are
    # automatically split into docid-range runs across partitions (the
    # effect explicit salting would produce, without a salt column).
    # The encoder emits the runs as disjoint block rows and readers
    # merge them by first_docid (stages/encode.py module docstring).
    resume: bool = False
    # Plan adaptivity: below this doc-side stage-A size the doc-store
    # stage (stage B) runs driver-side — a seconds-scale pyarrow sort
    # instead of three Ray Dataset executions whose fixed spin-up
    # dominates when the doc store is small. ~1 GiB of doc rows ≈ 25M
    # turns; the distributed path is unchanged above the threshold.
    driver_small_docs_bytes: int = 1 << 30
    # Below this postings-side size the lemma vocabulary is read
    # driver-side off stage-A parquet dictionary pages (~ms); above it a
    # distributed map-side-combine unique pass builds it.
    driver_small_post_bytes: int = 192 << 20
    # Above this input row estimate the conv-rank map is not broadcast:
    # docids attach via the distributed dense-rank table + a hash join
    # on conv_id (build.build_rank_table / attach_docids_join).
    broadcast_convs_max: int = 50_000_000
    # Stage C ships only (lemma_h, docid, tf) through the all-to-all
    # sort; doc_len is restored at encode time from a broadcast
    # docid-sorted (docid, dl) pair (~12 B/doc in plasma, zero-copy per
    # worker). Above this doc count the broadcast would not fit a
    # worker heap and doc_len rides the shuffle instead (+4 B/posting).
    broadcast_dl_max_docs: int = 200_000_000
    # Store per-posting token positions in the index (phrase queries).
    # Positions add ~avg_tf varint bytes per posting to the stage-C
    # exchange and the index payload (~+20-30% measured); disable for a
    # leaner term-only index. Automatically off when a pluggable
    # analyzer lacks HAS_POSITIONS.
    store_positions: bool = True
    extra: dict = field(default_factory=dict)
