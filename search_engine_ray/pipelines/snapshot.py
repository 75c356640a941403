"""Index snapshot / restore — the Elasticsearch snapshot-API parity op
(the reference has no backup story at all; a real operator of a long
build needs one before the first compaction).

A snapshot is a MANIFEST-PINNED copy of the whole index directory
(base segments + doc store + delta generations + build manifest) taken
with hardlinks where the filesystem allows (O(#files), no data copied —
index files are immutable once DONE, so a link-snapshot is consistent;
compaction writes NEW files and atomically renames, never mutates in
place) and byte-copies otherwise. ``snapshot.json`` records every
file's relative path and size, so ``verify`` / ``restore`` can detect a
torn or tampered snapshot before serving from it. Restore refuses a
non-empty destination (never clobbers a live index).

Consistency contract: snapshot refuses while a build on the same
out_dir is not DONE (state from the build manifest); delta generations
are DONE-atomic (tmp dir + rename), so whatever generation set exists
at snapshot time is a valid LSM state — a restore serves it
rank-identically (tests/test_snapshot.py pins restore-after-delete
equal to the pre-delete engine).

At 100 TB the same design holds: manifests + immutable files mean a
snapshot is a metadata operation (object-store copy-on-write / bucket
manifest), not a data move.
"""

from __future__ import annotations

import json
import os
import shutil

from ..state.manifest import load_json, write_json_atomic
from . import build as build_mod

SNAPSHOT_MANIFEST = "snapshot.json"


def _walk_files(root: str) -> list[tuple[str, int]]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def _link_or_copy(src: str, dst: str) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def snapshot(out_dir: str, dest: str) -> dict:
    """Snapshot ``out_dir`` into ``dest`` (created; refused if it already
    exists). -> {"result", "error", "n_files", "bytes"}."""
    m = load_json(build_mod.build_manifest_path(out_dir))
    if not m:
        return {"result": False, "error": "no build manifest", "n_files": 0, "bytes": 0}
    if m.get("state") != "DONE":
        return {"result": False, "error": f"build state {m.get('state')!r} != DONE",
                "n_files": 0, "bytes": 0}
    if os.path.exists(dest):
        return {"result": False, "error": "destination exists", "n_files": 0, "bytes": 0}
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    files = _walk_files(out_dir)
    for rel, _size in files:
        _link_or_copy(os.path.join(out_dir, rel), os.path.join(tmp, rel))
    write_json_atomic(
        os.path.join(tmp, SNAPSHOT_MANIFEST),
        {
            "source": os.path.abspath(out_dir),
            "files": [[rel, size] for rel, size in files],
            "build_state": m.get("state"),
            "n_docs": m.get("stats", {}).get("n_docs"),
        },
    )
    os.replace(tmp, dest)
    return {
        "result": True, "error": None,
        "n_files": len(files), "bytes": sum(s for _, s in files),
    }


def verify_snapshot(snap_dir: str) -> dict:
    """Check every manifest-recorded file exists with its recorded size.
    -> {"result", "error", "n_files", "missing": [...], "changed": [...]}."""
    man = load_json(os.path.join(snap_dir, SNAPSHOT_MANIFEST))
    if not man:
        return {"result": False, "error": "no snapshot manifest",
                "n_files": 0, "missing": [], "changed": []}
    missing, changed = [], []
    for rel, size in man["files"]:
        p = os.path.join(snap_dir, rel)
        if not os.path.exists(p):
            missing.append(rel)
        elif os.path.getsize(p) != size:
            changed.append(rel)
    ok = not missing and not changed
    return {
        "result": ok,
        "error": None if ok else "snapshot corrupt",
        "n_files": len(man["files"]),
        "missing": missing,
        "changed": changed,
    }


def restore(snap_dir: str, dest: str) -> dict:
    """Verify then materialize the snapshot at ``dest`` (refused if dest
    exists non-empty). -> {"result", "error", "n_files"}."""
    v = verify_snapshot(snap_dir)
    if not v["result"]:
        return {"result": False, "error": v["error"] or "verify failed", "n_files": 0}
    if os.path.exists(dest) and os.listdir(dest):
        return {"result": False, "error": "destination not empty", "n_files": 0}
    man = load_json(os.path.join(snap_dir, SNAPSHOT_MANIFEST))
    tmp = dest.rstrip("/") + ".restore-tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for rel, _size in man["files"]:
        _link_or_copy(os.path.join(snap_dir, rel), os.path.join(tmp, rel))
    if os.path.exists(dest):
        os.rmdir(dest)  # empty by the check above
    os.replace(tmp, dest)
    return {"result": True, "error": None, "n_files": len(man["files"])}
