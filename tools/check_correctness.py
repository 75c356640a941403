"""Local mirror of the driver's correctness gate: run
``__ray_entry__.queries()[name](sf_dir)`` and ``oracle_sql()[name]``
side-by-side and compare row count, schema (column names) and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [name ...]   # default: all with oracles

Tables ``region nation customer supplier part orders lineitem events
documents embeddings`` are registered as DuckDB views over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.01), matching the driver.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.md5("\n".join("\t".join(r) for r in rows).encode()).hexdigest()
    return len(df), sorted(df.columns), h


def main() -> int:
    import logging

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in osql]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    t_total = time.time()
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
            t_ray = time.time() - t0
            if name not in osql:
                print(f"{name}: rows={got[0]} (no_oracle) [{t_ray:.1f}s]")
                continue
            t1 = time.time()
            exp = canon(con.execute(osql[name]).df())
            t_sql = time.time() - t1
            ok = got == exp
            detail = ""
            if not ok:
                detail = (
                    f" rows {got[0]}vs{exp[0]}"
                    f" schema {'ok' if got[1] == exp[1] else f'{got[1]} vs {exp[1]}'}"
                    f" hash {'ok' if got[2] == exp[2] else 'MISMATCH'}"
                )
                fails += 1
            print(
                f"{name}: {'PASS' if ok else 'FAIL'} ({got[0]} rows)"
                f"{detail} [ray {t_ray:.1f}s sql {t_sql:.1f}s]"
            )
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(e).__name__}: {e} [{time.time() - t0:.1f}s]")
    print(f"total: {time.time() - t_total:.1f}s for {len(names)} queries")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
