"""Statistics API (G5 analog) sanity."""

from search_engine_ray import stats as stats_mod


def test_statistics(tiny_index, duck):
    s = stats_mod.statistics(tiny_index["out_dir"])
    m = tiny_index["manifest"]["stats"]
    assert s["total"]["docs"] == m["n_docs"]
    assert s["total"]["lemmas"] == m["n_lemmas"]
    assert s["total"]["postings"] == m["n_postings"]
    assert s["total"]["indexing"] is False
    assert sum(s["per_scope"].values()) == m["n_docs"]
    assert set(s["per_scope"]) <= {"user", "assistant", "tool", "system"}
    assert len(s["partitions"]) == 3
    assert all(p["state"] == "DONE" for p in s["partitions"])
