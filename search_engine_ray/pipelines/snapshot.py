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


# ---------------------------------------------------------------------------
# Follower replication (the ES cross-cluster-replication analog)
# ---------------------------------------------------------------------------

FOLLOW_MANIFEST = "follow.json"


def _file_identity(root: str) -> dict[str, tuple[int, int]]:
    """relpath -> (size, mtime_ns). Index files are immutable once DONE
    and swaps land by atomic rename (new inode), so (size, mtime_ns)
    identifies content; hardlinked copies share both, making a
    just-synced follower read as identical."""
    out: dict[str, tuple[int, int]] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            if rel == FOLLOW_MANIFEST:
                continue
            st = os.stat(p)
            out[rel] = (st.st_size, st.st_mtime_ns)
    return out


def follow(leader_dir: str, follower_dir: str) -> dict:
    """One incremental sync pulse of the ES cross-cluster-replication
    shape: make ``follower_dir`` an exact replica of ``leader_dir``'s
    current LSM state, shipping ONLY what changed since the last pulse.
    First call bootstraps (full link-copy, the snapshot device); later
    calls diff by file identity (relpath, size, mtime_ns — sound
    because index files are immutable once DONE and every swap lands by
    atomic rename): new leader files (a fresh delta generation, a
    compacted base) are linked in, follower files the leader retired
    (folded generations, swapped-out segments) are deleted.  Blast
    radius of a pulse = the delta, never the index — the property that
    makes following a 10^12-turn leader affordable.

    Consistency: refused while the leader's build is not DONE or a
    compaction swap journal is live (mid-swap state must never
    replicate), and the leader's identity map is re-read after the copy
    — if it moved during the pulse the sync reports ``leader moved``
    and the caller re-pulses (each pulse is idempotent and
    crash-resumable: rerunning converges by identity).  Copy order is
    adds-then-deletes, so a crash leaves a superset of a valid state
    that the next pulse prunes.  -> {"result", "error",
    "bootstrapped", "n_copied", "n_deleted"}."""
    from . import compact as compact_mod

    resp = {"result": False, "error": None, "bootstrapped": False,
            "n_copied": 0, "n_deleted": 0}
    m = load_json(build_mod.build_manifest_path(leader_dir))
    if not m:
        resp["error"] = "no leader build manifest"
        return resp
    if m.get("state") != "DONE":
        resp["error"] = f"leader build state {m.get('state')!r} != DONE"
        return resp
    journal = load_json(compact_mod.journal_path(leader_dir))
    if journal:
        resp["error"] = "leader compaction swap in flight"
        return resp

    before = _file_identity(leader_dir)
    os.makedirs(follower_dir, exist_ok=True)
    have = _file_identity(follower_dir)

    # adds first (a crash leaves a prunable superset, never a hole);
    # the follower is not served DURING a pulse — pulse, then swap
    # readers, the single-box analog of ES's follower checkpoint
    n_copied = 0
    for rel, ident in sorted(before.items()):
        if have.get(rel) == ident:
            continue
        dst = os.path.join(follower_dir, rel)
        if rel in have:
            os.unlink(dst)
        _link_or_copy(os.path.join(leader_dir, rel), dst)
        n_copied += 1
    n_deleted = 0
    for rel in sorted(set(have) - set(before)):
        os.unlink(os.path.join(follower_dir, rel))
        n_deleted += 1
    # prune now-empty dirs (retired generations)
    for dirpath, dirs, files in os.walk(follower_dir, topdown=False):
        if not dirs and not files and dirpath != follower_dir:
            os.rmdir(dirpath)

    after = _file_identity(leader_dir)
    if after != before:
        resp["error"] = "leader moved during pulse — re-pulse"
        return resp
    write_json_atomic(
        os.path.join(follower_dir, FOLLOW_MANIFEST),
        {"leader": os.path.abspath(leader_dir),
         "n_files": len(before)},
    )
    resp.update(result=True, bootstrapped=not have,
                n_copied=n_copied, n_deleted=n_deleted)
    return resp
