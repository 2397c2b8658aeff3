#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> result parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name, and compares row counts and
values exactly. Mirrors the driver's hash-match as closely as we can
without seeing it.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated substring filter — the sf0.1
    # spot-run needs it (several oracles are exact pair self-joins,
    # quadratic in DuckDB; at sf0.1 those take hours and are gated at
    # sf0.01 instead)
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        if only is not None and not any(s in name for s in only):
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no result parquet")
            failures += 1
            continue
        got = con.sql(
            f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(oracle[name]).df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = 0
        for c in got.columns:
            gv = [norm(v) for v in got[c].tolist()]
            wv = [norm(v) for v in want[c].tolist()]
            if gv != wv:
                n_diff = sum(1 for a, b in zip(gv, wv) if a != b)
                i = next(i for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
                print(f"FAIL {name}: col {c}: {n_diff} diffs; first at row {i}: "
                      f"{gv[i]} != {wv[i]} (dtypes {got[c].dtype}/{want[c].dtype})")
                bad += 1
        if bad:
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows, {len(got.columns)} cols")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
