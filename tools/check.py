#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
compare the Verify-dumped parquet against the oracle SQL run in DuckDB over
the same testdata. Development tool only (driver-side python env).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd


def same_mask(g, e):
    """Bitwise for floats (faithful to the driver's hash compare: -0.0 !=
    +0.0 and NaN payloads matter — the round-11 classifier_score
    signed-zero failure passed a == compare here)."""
    if (np.issubdtype(g.dtype, np.floating)
            and np.issubdtype(e.dtype, np.floating)):
        gb = g.values.astype(np.float64).view(np.int64)
        eb = e.values.astype(np.float64).view(np.int64)
        return gb == eb
    try:
        return (g.values == e.values) | (g.isna().values & e.isna().values)
    except Exception:
        return g.astype(str).values == e.astype(str).values

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    return df[sorted(df.columns)].reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    failures = 0
    for name in names:
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            failures += 1
            continue
        if name not in oracle:
            status = "rows-only"
            ok = len(got) > 0
            print(f"{'OK   ' if ok else 'EMPTY'} {name}: {len(got)} rows ({status})")
            if not ok:
                failures += 1
            continue
        try:
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        # value compare, BITWISE for floats (see same_mask)
        mismatch = None
        for c in got.columns:
            g, e = got[c], exp[c]
            same = same_mask(g, e)
            if not same.all():
                i = int((~same).argmax())
                mismatch = (c, i, g.iloc[i], e.iloc[i], str(g.dtype), str(e.dtype))
                break
        if mismatch:
            c, i, gv, ev, gd, ed = mismatch
            print(f"FAIL  {name}: col={c} row={i} spark={gv!r}({gd}) oracle={ev!r}({ed})")
            failures += 1
        else:
            # dtype check (schema match)
            dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(exp[c].dtype)]
            flag = f" dtype-diff:{dt}" if dt else ""
            print(f"OK    {name}: {len(got)} rows{flag}")
    print(f"\n{len(names)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
