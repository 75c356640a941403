"""Snapshot / restore (the ES snapshot-API parity lifecycle op,
pipelines/snapshot.py): a restored index serves rank-identically to the
source at snapshot time — including surviving a post-snapshot
delete-by-query mutation of the original — verify detects torn
snapshots, and restore never clobbers a live index."""

import os

import pytest

from search_engine_ray import datagen
from search_engine_ray.pipelines import delta, snapshot
from search_engine_ray.search import SearchEngine


def _results(eng):
    out = {}
    for q in datagen.reference_queries():
        r = eng.search(q["query_text"], scope=q["scope"], limit=q["k"])
        out[q["query_id"]] = (r["count"], r["data"])
    return out


def test_snapshot_restore_rank_identical(tiny_index, tmp_path):
    src = tiny_index["out_dir"]
    snap = str(tmp_path / "snap")
    r = snapshot.snapshot(src, snap)
    assert r["result"] and r["n_files"] > 0 and r["bytes"] > 0
    v = snapshot.verify_snapshot(snap)
    assert v["result"] and v["n_files"] == r["n_files"]

    before = _results(SearchEngine(src))

    # mutate a COPY of the original after the snapshot (delete-by-query)
    import shutil

    mutated = str(tmp_path / "mutated")
    shutil.copytree(src, mutated)
    resp = delta.delete_by_query(mutated, datagen.stem(0))
    assert resp["result"] and resp["deleted"] > 0
    assert SearchEngine(mutated).search(datagen.stem(0), limit=1)["count"] == 0

    dest = str(tmp_path / "restored")
    rr = snapshot.restore(snap, dest)
    assert rr["result"] and rr["n_files"] == r["n_files"]
    after = _results(SearchEngine(dest))
    assert set(before) == set(after)
    for qid in before:
        assert before[qid][0] == after[qid][0], qid
        assert before[qid][1].equals(after[qid][1]), qid


def test_snapshot_with_delta_generations(tiny_index, tmp_path):
    """A snapshot taken WITH live delta generations restores the same
    LSM state (generation set included, overlay served identically)."""
    import shutil

    src = str(tmp_path / "src")
    shutil.copytree(tiny_index["out_dir"], src)
    resp = delta.delete_by_query(src, datagen.stem(41))
    assert resp["result"] and resp["generations"]
    snap = str(tmp_path / "snap")
    assert snapshot.snapshot(src, snap)["result"]
    dest = str(tmp_path / "restored")
    assert snapshot.restore(snap, dest)["result"]
    a, b = SearchEngine(src), SearchEngine(dest)
    assert b._has_deltas
    for q in datagen.reference_queries():
        ra = a.search(q["query_text"], scope=q["scope"], limit=q["k"])
        rb = b.search(q["query_text"], scope=q["scope"], limit=q["k"])
        assert ra["count"] == rb["count"] and ra["data"].equals(rb["data"])


def test_snapshot_guards(tiny_index, tmp_path):
    src = tiny_index["out_dir"]
    snap = str(tmp_path / "snap")
    assert snapshot.snapshot(src, snap)["result"]
    # existing destination refused
    assert snapshot.snapshot(src, snap)["error"] == "destination exists"
    # no manifest -> refused
    bad = snapshot.snapshot(str(tmp_path / "nothing"), str(tmp_path / "s2"))
    assert not bad["result"] and "manifest" in bad["error"]
    # torn snapshot detected (truncate one file)
    man = os.path.join(snap, "snapshot.json")
    assert os.path.exists(man)
    import json

    files = json.load(open(man))["files"]
    victim = next(rel for rel, size in files if size > 0 and rel != "snapshot.json")
    vp = os.path.join(snap, victim)
    # hardlinked file: REPLACE (never truncate in place — that would
    # corrupt the linked source index too)
    os.unlink(vp)
    with open(vp, "wb") as f:
        f.write(b"x")
    v = snapshot.verify_snapshot(snap)
    assert not v["result"] and victim in v["changed"]
    # restore refuses a corrupt snapshot
    rr = snapshot.restore(snap, str(tmp_path / "r2"))
    assert not rr["result"]
    # restore refuses a non-empty destination
    good = str(tmp_path / "snapgood")
    assert snapshot.snapshot(src, good)["result"]
    occupied = tmp_path / "occupied"
    occupied.mkdir()
    (occupied / "keep.txt").write_text("do not clobber")
    rr2 = snapshot.restore(good, str(occupied))
    assert not rr2["result"] and "not empty" in rr2["error"]
    assert (occupied / "keep.txt").read_text() == "do not clobber"


def test_follow_bootstrap_and_incremental(tiny_index, tmp_path):
    """CCR follower pulses: bootstrap replicates the leader exactly;
    after a leader delta mutation one pulse ships ONLY the new
    generation (n_copied tiny vs bootstrap); after leader compaction a
    pulse retires the folded generation on the follower; every pulse
    leaves the follower rank-identical to the leader; a no-op pulse
    copies and deletes nothing."""
    import shutil

    from search_engine_ray.pipelines import compact as compact_mod
    from search_engine_ray.pipelines.snapshot import follow

    leader = str(tmp_path / "leader")
    shutil.copytree(tiny_index["out_dir"], leader)
    fol = str(tmp_path / "follower")

    r0 = follow(leader, fol)
    assert r0["result"] and r0["bootstrapped"] and r0["n_copied"] > 0
    a, b = _results(SearchEngine(leader)), _results(SearchEngine(fol))
    for qid in a:
        assert a[qid][0] == b[qid][0] and a[qid][1].equals(b[qid][1]), qid

    # leader mutates: delete-by-query appends a delta generation
    resp = delta.delete_by_query(leader, datagen.stem(41))
    assert resp["result"] and resp["generations"]
    r1 = follow(leader, fol)
    assert r1["result"] and not r1["bootstrapped"]
    assert 0 < r1["n_copied"] < r0["n_copied"] / 2  # delta-sized pulse
    eng_f = SearchEngine(fol)
    assert eng_f._has_deltas
    a, b = _results(SearchEngine(leader)), _results(eng_f)
    for qid in a:
        assert a[qid][0] == b[qid][0] and a[qid][1].equals(b[qid][1]), qid

    # leader compacts: the generation folds into the base
    c = compact_mod.compact(leader)
    assert c["result"], c
    r2 = follow(leader, fol)
    assert r2["result"] and r2["n_deleted"] > 0  # retired gen pruned
    assert not SearchEngine(fol)._has_deltas
    a, b = _results(SearchEngine(leader)), _results(SearchEngine(fol))
    for qid in a:
        assert a[qid][0] == b[qid][0] and a[qid][1].equals(b[qid][1]), qid

    # idempotent no-op pulse
    r3 = follow(leader, fol)
    assert r3["result"] and r3["n_copied"] == 0 and r3["n_deleted"] == 0


def test_follow_guards(tiny_index, tmp_path):
    """No leader manifest refused; live compaction journal refused; a
    crash-torn follower (file deleted mid-state) converges on the next
    pulse."""
    import os as _os

    from search_engine_ray.pipelines import compact as compact_mod
    from search_engine_ray.pipelines.snapshot import follow
    from search_engine_ray.state.manifest import write_json_atomic as _wj

    assert "manifest" in follow(str(tmp_path / "nope"), str(tmp_path / "f"))["error"]

    import shutil

    leader = str(tmp_path / "leader")
    shutil.copytree(tiny_index["out_dir"], leader)
    jp = compact_mod.journal_path(leader)
    _wj(jp, {"state": "SWAPPING", "entries": []})
    r = follow(leader, str(tmp_path / "f2"))
    assert not r["result"] and "swap in flight" in r["error"]
    _os.unlink(jp)

    fol = str(tmp_path / "f3")
    assert follow(leader, fol)["result"]
    # tear the follower: remove one index file, truncate another
    victims = []
    for dirpath, _d, files in _os.walk(fol):
        for f in files:
            p = _os.path.join(dirpath, f)
            if p.endswith(".parquet"):
                victims.append(p)
        if len(victims) >= 2:
            break
    _os.unlink(victims[0])
    r = follow(leader, fol)
    assert r["result"] and r["n_copied"] >= 1
    a, b = _results(SearchEngine(leader)), _results(SearchEngine(fol))
    for qid in a:
        assert a[qid][0] == b[qid][0] and a[qid][1].equals(b[qid][1]), qid
