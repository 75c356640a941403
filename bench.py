"""Bench harness — index-build throughput + BM25 query latency.

Headline pipeline: full inverted-index build (analyze actor pool ->
docids -> dictionary shuffle -> sorted compressed block index) over the
synthetic transcripts corpus at the scale matching ``$GRAFT_SF_DIR``
(default sf0.1, ~600k turns), then the reference query set (16 queries,
block-max BM25 top-10) against the built index.

Prints ONE JSON line:
  {"metric": "index_build_turns_per_sec", "value": <build seconds>,
   "unit": "sec", "queries": {...per-phase seconds...}, "sf": ...,
   "num_cpus": N, "turns_per_sec": ..., "query_p95_ms": ...}

``--scaling`` runs the same build in TWO fresh processes at
num_cpus=8 and num_cpus=32 on the same input (the sandbox evidence for
the N vs 4N cluster-size criterion) and prints throughput at both plus
scaling efficiency; it also rewrites BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from search_engine_ray import datagen
    from search_engine_ray.config import BuildConfig
    from search_engine_ray.pipelines import build
    from search_engine_ray.search import SearchEngine

    tag = datagen.sf_tag_of_dir(sf_dir)
    files = datagen.transcripts_files(tag)
    # warm the OS page cache so we measure compute+shuffle, not cold disk
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass

    out = f"/tmp/seray_bench/{tag}-cpus{ncpu}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = BuildConfig(input_paths=files, out_dir=out)
    t0 = time.monotonic()
    manifest = build.build_index(cfg)
    build_s = time.monotonic() - t0

    eng = SearchEngine(out)
    qset = datagen.reference_queries()
    lat: list[float] = []
    t0 = time.monotonic()
    for _round in range(3):
        for q in qset:
            tq = time.monotonic()
            eng.search(q["query_text"], scope=q["scope"], limit=q["k"])
            lat.append(time.monotonic() - tq)
    query_s = time.monotonic() - t0
    lat.sort()
    p95_ms = lat[int(0.95 * (len(lat) - 1))] * 1000

    n_turns = manifest["stats"]["n_docs"]
    result = {
        "metric": "index_build_sf_seconds",
        "value": round(build_s, 3),
        "unit": "sec",
        "queries": {
            "build_total": round(build_s, 3),
            "stage_a_analyze": manifest["timings"]["stage_a_s"],
            "stage_b_docids": manifest["timings"]["stage_b_s"],
            "stage_c_index": manifest["timings"]["stage_c_s"],
            "stage_d_dict": manifest["timings"]["stage_d_s"],
            "query_set_3x": round(query_s, 3),
        },
        "sf": float(tag[2:]),
        "num_cpus": ncpu,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / build_s, 1),
        "query_p95_ms": round(p95_ms, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "2,8").split(","))
    # Scaling is measured on a corpus large enough that scalable work
    # dominates fixed per-stage coordination (at sf0.1 the whole build is
    # ~6 core-seconds of analysis — any fixed cost swamps the ratio).
    sf_dir = os.environ.get("GRAFT_SCALING_SF_DIR", "sf1")
    from search_engine_ray import datagen

    tag = sf_dir if "/" not in sf_dir else datagen.sf_tag_of_dir(sf_dir)
    datagen.generate(tag)  # generate once, outside both timed runs
    res = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=tag)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        res[n] = json.loads(out.strip().splitlines()[-1])
    thr_lo, thr_hi = res[lo]["turns_per_sec"], res[hi]["turns_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": res[lo]["sf"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "turns_per_sec_lo": thr_lo,
        "turns_per_sec_hi": thr_hi,
        "build_sec_lo": res[lo]["value"],
        "build_sec_hi": res[hi]["value"],
        "query_p95_ms_hi": res[hi]["query_p95_ms"],
    }
    _write_bench_md(res[lo], res[hi], summary)
    return summary


def _write_bench_md(lo: dict, hi: dict, summary: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — measured two-level scaling (sandbox evidence for the "
            "N vs 4N cluster criterion)\n\n"
            f"Corpus: synthetic transcripts sf={lo['sf']} "
            f"({lo['n_turns']} turns), same input both runs, fresh "
            "`ray.init(address='local', num_cpus=N)` per process.\n\n"
            "| num_cpus | build sec | turns/sec | query p95 ms |\n"
            "|---|---|---|---|\n"
            f"| {lo['num_cpus']} | {lo['value']} | {lo['turns_per_sec']} | {lo['query_p95_ms']} |\n"
            f"| {hi['num_cpus']} | {hi['value']} | {hi['turns_per_sec']} | {hi['query_p95_ms']} |\n\n"
            f"**Scaling efficiency** = (thr@{hi['num_cpus']} / thr@{lo['num_cpus']}) / "
            f"{hi['num_cpus'] // lo['num_cpus']} = **{summary['value']}** "
            "(target >= 0.8, BASELINE.json north_rule).\n\n"
            "Per-stage seconds at each level:\n\n"
            f"- {lo['num_cpus']} cpus: {json.dumps(lo['queries'])}\n"
            f"- {hi['num_cpus']} cpus: {json.dumps(hi['queries'])}\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
