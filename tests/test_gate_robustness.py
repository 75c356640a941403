"""The driver's correctness gate must survive hostile tmp-dir state.

Round 2's CORRECTNESS artifact came back ``{}`` — the gate produced no
per-query rows at all — while the identical repo-local protocol passed
42/42. These tests pin the collection-side contract in a FRESH process
(the way the driver runs it): ``queries()`` and ``oracle_sql()`` must
return the full key set under an empty tmp, an unwritable data dir, and
stale half-written generation state, and ``oracle_sql()`` must never
raise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COLLECT = """
import json, sys
sys.path.insert(0, {repo!r})
import __ray_entry__ as E
q = E.queries(); o = E.oracle_sql()
assert set(o) <= set(q), "oracle keys must be a subset of query keys"
print("RESULT " + json.dumps({{"nq": len(q), "no": len(o)}}))
"""


def _collect(env_extra: dict[str, str]) -> dict:
    env = dict(os.environ, **env_extra)
    out = subprocess.run(
        [sys.executable, "-c", _COLLECT.format(repo=REPO)],
        capture_output=True, text=True, env=env, timeout=300, cwd=REPO,
    )
    assert out.returncode == 0, f"collection crashed:\n{out.stderr[-3000:]}"
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def test_collection_fresh_tmp():
    with tempfile.TemporaryDirectory() as td:
        got = _collect({
            "SERAY_DATA_DIR": os.path.join(td, "data"),
            "SERAY_BUILD_DIR": os.path.join(td, "builds"),
        })
    assert got["nq"] >= 45
    assert got["no"] >= 42


def test_collection_unwritable_data_dir():
    """SERAY_DATA_DIR pointing at a plain FILE (makedirs raises) must
    fall back to a tempdir and still produce every oracle."""
    with tempfile.TemporaryDirectory() as td:
        blocker = os.path.join(td, "not-a-dir")
        with open(blocker, "w") as f:
            f.write("x")
        got = _collect({
            "SERAY_DATA_DIR": blocker,
            "SERAY_BUILD_DIR": os.path.join(td, "builds"),
        })
    assert got["no"] >= 42


def test_collection_stale_halfwritten_data_dir():
    """A stale _SUCCESS marker with matching params but MISSING parquet
    files (a half-deleted cache) must be detected and regenerated."""
    from search_engine_ray import datagen

    with tempfile.TemporaryDirectory() as td:
        data = os.path.join(td, "data")
        tag = "sf0.01"
        d = os.path.join(data, f"v{datagen.DATAGEN_VERSION}", tag, "transcripts")
        os.makedirs(d)
        params = {
            "version": datagen.DATAGEN_VERSION,
            "seed": datagen.SEED,
            "n_turns": datagen.n_turns_for_tag(tag),
        }
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            json.dump(params, f)
        with open(os.path.join(d, "part-000.parquet"), "w") as f:
            f.write("garbage, not parquet")
        got = _collect({
            "SERAY_DATA_DIR": data,
            "SERAY_BUILD_DIR": os.path.join(td, "builds"),
        })
        assert got["no"] >= 42
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(parts) == datagen.N_FILES, "corpus was not regenerated"
        assert os.path.getsize(os.path.join(d, "part-000.parquet")) > 1000
