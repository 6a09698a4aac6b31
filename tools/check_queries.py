"""Local stand-in for the driver's correctness gate: run every queries()
entry and compare against oracle_sql() through DuckDB (row count, column
names, order-insensitive values). Usage:
    python tools/check_queries.py [--json out.json] [sf_dir] [query ...]

--json writes a driver-style per-query record (status, rows, seconds,
issues) — the full-sweep artifact (CORRECTNESS_full_r*.json).
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

import duckdb
import pandas as pd

import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: ray={sorted(a.columns)} sql={sorted(b.columns)}"]
    if len(a) != len(b):
        issues.append(f"row count differs: ray={len(a)} sql={len(b)}")
        return issues
    a, b = normalize(a), normalize(b)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = ~(av.isna() & bv.isna()) & ~(
                (av - bv).abs() < 1e-9)
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {col}: {int(bad.sum())} mismatches, "
                              f"e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
        else:
            bad = av.astype(str) != bv.astype(str)
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {col}: {int(bad.sum())} mismatches, "
                              f"e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
    return issues


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    records = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            rdf = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: ray raised {type(ex).__name__}: {ex}")
            records[name] = {"status": "fail", "err": f"{type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ROWS {name}: {len(rdf)} rows ({dt:.1f}s, rows-only)")
            records[name] = {"status": "rows_only", "rows": len(rdf),
                             "sec": round(dt, 2)}
            n_rowsonly += 1
            continue
        try:
            odf = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: SQL raised {type(ex).__name__}: {ex}")
            records[name] = {"status": "fail", "err": f"SQL {type(ex).__name__}: {ex}"}
            n_fail += 1
            continue
        issues = compare(rdf, odf)
        if issues:
            print(f"FAIL {name} ({dt:.1f}s):")
            for i in issues:
                print(f"   {i}")
            records[name] = {"status": "fail", "rows": len(rdf),
                             "oracle_rows": len(odf), "sec": round(dt, 2),
                             "issues": issues}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rdf)} rows ({dt:.1f}s)")
            records[name] = {"status": "pass", "rows": len(rdf),
                             "sec": round(dt, 2)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "summary": {"pass": n_pass, "fail": n_fail,
                                   "rows_only": n_rowsonly},
                       "queries": records}, f, indent=1)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
