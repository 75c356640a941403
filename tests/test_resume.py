"""Checkpoint/resume (SURVEY.md §5.6): kill the build after stage-A
partition i, rerun with resume=True — finished partitions are skipped
(manifest lineage keys match) and the final index content is identical
to an uninterrupted build."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig
from search_engine_ray.pipelines import build
from search_engine_ray.stages.encode import decode_block


def _decoded_index(out_dir):
    idx = pq.read_table(build.index_dir(out_dir))
    per_lemma: dict[str, list] = {}
    for row in idx.to_pylist():
        d, tf, dl = decode_block(row["gaps"], row["tfs"], row["dls"], row["n"])
        per_lemma.setdefault(row["lemma"], []).append((d, tf, dl))
    out = {}
    for lem, runs in per_lemma.items():
        runs.sort(key=lambda r: r[0][0])
        out[lem] = tuple(np.concatenate([r[i] for r in runs]).tolist() for i in range(3))
    return out


def test_resume_skips_done_partitions(tiny_corpus, tiny_index, tmp_path):
    out = str(tmp_path / "idx")
    cfg = BuildConfig(input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=2)

    with pytest.raises(RuntimeError, match="injected failure"):
        build.build_index(cfg, fail_after_partition=1)

    cfg.resume = True
    manifest = build.build_index(cfg)
    assert manifest["stage_a_skipped"] == 2  # partitions 0 and 1 reused
    assert manifest["state"] == "DONE"

    # identical logical content vs the uninterrupted session build
    assert _decoded_index(out) == _decoded_index(tiny_index["out_dir"])
    a = pq.read_table(build.lemma_dict_path(out)).sort_by("lemma")
    b = pq.read_table(build.lemma_dict_path(tiny_index["out_dir"])).sort_by("lemma")
    assert a.equals(b)
    # stats identical
    assert manifest["stats"] == tiny_index["manifest"]["stats"]


def test_resume_noop_when_all_done(tiny_corpus, tiny_index):
    cfg = BuildConfig(
        input_paths=tiny_corpus,
        out_dir=tiny_index["out_dir"],
        n_partitions=3,
        concurrency=2,
        resume=True,
    )
    m = build.build_index(cfg)
    assert m["stage_a_skipped"] == 3
    assert m["stats"] == tiny_index["manifest"]["stats"]
    # resumed no-op is fast: no stage re-ran
    assert m["timings"]["total_s"] < tiny_index["manifest"]["timings"]["total_s"]


def test_lineage_key_changes_invalidate(tiny_corpus, tmp_path):
    from search_engine_ray.state.manifest import lineage_key

    k1 = lineage_key(tiny_corpus, {"analyzer": "1"}, {"batch_size": 2048})
    k2 = lineage_key(tiny_corpus, {"analyzer": "2"}, {"batch_size": 2048})
    k3 = lineage_key(tiny_corpus, {"analyzer": "1"}, {"batch_size": 1024})
    k4 = lineage_key(tiny_corpus[:-1], {"analyzer": "1"}, {"batch_size": 2048})
    assert len({k1, k2, k3, k4}) == 4


@pytest.mark.parametrize("stage", ["b_mid", "c_mid", "d_mid"])
def test_resume_after_midstage_crash(tiny_corpus, tiny_index, tmp_path, stage):
    """Crash AFTER a downstream stage's output files are written but
    BEFORE its lineage manifest commits (the worst torn state), then
    resume: completed stages are skipped, the torn stage recomputes from
    scratch, and the final index content is identical to an
    uninterrupted build (verdict round-1 item #9)."""
    out = str(tmp_path / f"idx-{stage}")
    cfg = BuildConfig(input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=2)

    with pytest.raises(RuntimeError, match=f"injected failure at {stage}"):
        build.build_index(cfg, fail_at_stage=stage)

    cfg.resume = True
    manifest = build.build_index(cfg)
    assert manifest["state"] == "DONE"
    assert manifest["stage_a_skipped"] == 3  # stage A fully reused

    assert _decoded_index(out) == _decoded_index(tiny_index["out_dir"])
    a = pq.read_table(build.lemma_dict_path(out)).sort_by("lemma")
    b = pq.read_table(build.lemma_dict_path(tiny_index["out_dir"])).sort_by("lemma")
    assert a.equals(b)
    assert manifest["stats"] == tiny_index["manifest"]["stats"]
    # the doc store is byte-stable under resume: docid-sorted content
    da = pq.read_table(build.docs_dir(out)).sort_by("docid")
    db = pq.read_table(build.docs_dir(tiny_index["out_dir"])).sort_by("docid")
    assert da.equals(db)


def test_stage_a_overlap_identical(tiny_corpus, tiny_index, tmp_path):
    """Overlapped stage-A partition executions (bounded driver threads)
    must produce the same index as sequential execution."""
    out = str(tmp_path / "overlap")
    cfg = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=1,
        extra={"stage_a_overlap": 2},
    )
    m = build.build_index(cfg)
    assert m["state"] == "DONE"
    assert _decoded_index(out) == _decoded_index(tiny_index["out_dir"])
    assert m["stats"] == tiny_index["manifest"]["stats"]


def test_resume_after_real_worker_death(tiny_corpus, tiny_index, tmp_path):
    """A REAL mid-flight worker-process death (os._exit in the analyzer
    actor, max_restarts=0): the partition is marked FAILED, the build
    raises, and a plain resume produces the identical index — the
    engine's cancellation/crash story (`ray job stop` / Ctrl-C leaves
    the same torn state)."""
    import ray.exceptions

    out = str(tmp_path / "killed")
    cfg = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=1,
        batch_size=512,  # several batches per tiny partition so the
        # kill counter fires mid-partition (default 4096 = one batch)
        extra={"kill_after_batches": 1},
    )
    with pytest.raises(Exception) as ei:
        build.build_index(cfg)
    assert "died" in str(ei.value).lower() or "actor" in str(ei.value).lower()

    cfg2 = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=1,
        resume=True,
    )
    m = build.build_index(cfg2)
    assert m["state"] == "DONE"
    assert _decoded_index(out) == _decoded_index(tiny_index["out_dir"])
    assert m["stats"] == tiny_index["manifest"]["stats"]


def test_graceful_stop_then_resume(tiny_corpus, tiny_index, tmp_path):
    """Cooperative cancel (stopIndexing analog): an analyzer actor
    arms the stop flag mid-build, the build exits with BuildStopped and
    FAILED in-flight partitions; resume completes to an index identical
    to an uninterrupted build."""
    out = str(tmp_path / "idx")
    cfg = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=2,
        batch_size=512,  # see test_resume_after_real_worker_death
        extra={"stop_after_batches": 1, "stage_a_overlap": 1},
    )
    with pytest.raises(build.BuildStopped, match="resume"):
        build.build_index(cfg)
    from search_engine_ray.state.manifest import PartitionTracker
    import os

    tracker = PartitionTracker(
        os.path.join(build.stage_a_dir(out), "_manifests"), build_id="A"
    )
    states = {m["state"] for m in tracker.all_manifests()}
    assert "FAILED" in states  # the in-flight partition was marked

    cfg2 = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=2,
        resume=True,
    )
    manifest = build.build_index(cfg2)  # clears the flag, finishes
    assert manifest["state"] == "DONE"
    assert not os.path.exists(build.stop_flag_path(out))
    assert _decoded_index(out) == _decoded_index(tiny_index["out_dir"])


def test_stop_before_build_is_cleared(tiny_corpus, tmp_path):
    """A stale stop flag from a previous session never blocks a NEW
    build run (startIndexing-after-stopIndexing semantics)."""
    import os

    out = str(tmp_path / "idx")
    os.makedirs(out)
    assert build.request_stop(out)["result"]
    m = build.build_index(
        BuildConfig(input_paths=tiny_corpus, out_dir=out, n_partitions=2, concurrency=2)
    )
    assert m["state"] == "DONE"
