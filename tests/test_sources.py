"""Source formats: JSONL / CSV inputs normalize to the canonical
transcript schema and produce identical rows to the Parquet read."""

import os

import pyarrow as pa
import pyarrow.csv as pcsv
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def format_trio(tmp_path_factory, tiny_corpus):
    d = tmp_path_factory.mktemp("formats")
    tbl = pq.read_table(tiny_corpus[0]).slice(0, 500)
    jsonl = str(d / "t.jsonl")
    with open(jsonl, "w") as f:
        import json

        for row in tbl.to_pylist():
            row["ts"] = str(row["ts"])
            f.write(json.dumps(row) + "\n")
    csv = str(d / "t.csv")
    pcsv.write_csv(tbl, csv)
    return {"parquet": tiny_corpus[0], "jsonl": jsonl, "csv": csv, "expected": tbl}


def _collect(paths):
    import ray
    import ray.data as rd

    from search_engine_ray.sources.transcripts import read_transcripts

    ds = read_transcripts(paths, columns=["conv_id", "turn_idx", "role", "text"])
    t = pa.concat_tables([x for x in ray.get(ds.to_arrow_refs()) if x.num_rows])
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_jsonl_matches_parquet(ray_session, format_trio):
    exp = _collect([format_trio["parquet"]]).slice(0, 500)
    got = _collect([format_trio["jsonl"]])
    assert got.equals(exp.select(got.column_names).cast(got.schema))


def test_csv_matches_parquet(ray_session, format_trio):
    exp = _collect([format_trio["parquet"]]).slice(0, 500)
    got = _collect([format_trio["csv"]])
    assert got.equals(exp.select(got.column_names).cast(got.schema))
