"""Per-partition lineage manifests — the resume/checkpoint machinery.

The reference's only "state machine" is the 3-state site status
(INDEXING/INDEXED/FAILED, ``model/Status.java:3-5``) driven by
``IndexationServiceImpl.java:169-198``; restart wipes the DB
(``IndexationServiceImpl.java:81-86``). The north rule upgrades this to
real checkpoint/resume: every build partition writes a JSON lineage
record ``{build key, input files+sizes, analyzer version, row counts,
bytes, wall seconds, state}`` atomically (tmp + rename) AFTER its Parquet
output lands; a resumed build skips partitions whose manifest key matches
and state == DONE, recomputing everything else. Partition outputs are
deterministic functions of (input files, analyzer version, config), so a
resumed build is identical to an uninterrupted one.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

STATE_PENDING = "PENDING"
STATE_DONE = "DONE"
STATE_FAILED = "FAILED"


def write_json_atomic(path: str, obj: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_json(path: str) -> dict[str, Any] | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def lineage_key(input_files: list[str], versions: dict[str, str], params: dict[str, Any]) -> str:
    """Deterministic identity of a partition's computation: input file
    paths + sizes, analyzer/codec versions, and the semantic params."""
    h = hashlib.sha256()
    for p in sorted(input_files):
        try:
            sz = os.path.getsize(p)
        except OSError:
            sz = -1
        h.update(f"{p}:{sz};".encode())
    h.update(json.dumps(versions, sort_keys=True).encode())
    h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()[:24]


class PartitionTracker:
    """Manifest reader/writer for one build stage directory."""

    def __init__(self, manifest_dir: str, build_id: str):
        self.dir = manifest_dir
        self.build_id = build_id
        os.makedirs(manifest_dir, exist_ok=True)

    def path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"{partition_id}.json")

    def is_done(self, partition_id: str, key: str) -> bool:
        m = load_json(self.path(partition_id))
        return bool(m) and m.get("state") == STATE_DONE and m.get("key") == key

    def mark(self, partition_id: str, key: str, state: str, *, input_files: list[str] | None = None,
             metrics: dict[str, Any] | None = None) -> None:
        write_json_atomic(
            self.path(partition_id),
            {
                "build_id": self.build_id,
                "partition_id": partition_id,
                "key": key,
                "state": state,
                "input_files": input_files or [],
                "metrics": metrics or {},
                "wall_clock": time.time(),
            },
        )

    def all_manifests(self) -> list[dict[str, Any]]:
        out = []
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                m = load_json(os.path.join(self.dir, f))
                if m:
                    out.append(m)
        return out
