#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped Scala library has no Python dependency).

Runs DuckDB on each oracle_sql.json entry against the testdata parquet,
loads the Spark-written parquet from Verify, and compares row count,
column names, and values (columns sorted by name; rows sorted; floats
compared exactly after both sides round-trip through float64).
"""
import json, os, sys, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)

# Standing rounding-midpoint caveats (BASELINE.md §10): these queries'
# SELECTION logic is engine-exact, but their 6-dp display rounding can
# diverge between Spark (exact-binary-expansion HALF_UP) and DuckDB
# (requantizing x*1e6 then half-away-from-zero) if a testdata refresh
# lands a score on a representable midpoint. A sweep failure here means
# "check the caveat first", not "the operator broke".
ROUNDING_CAVEATS = {
    q: ("standing caveat - BASELINE.md §10 float-rounding law: if the "
        "diff is a 6-dp score at a x1e6 midpoint after a testdata refresh, "
        "demote this query to rows-only per the documented trigger rather "
        "than chasing an operator bug")
    for q in ("q_mmr", "q_textrank", "q_dsir", "q_kcenter")
}

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata tables are single parquet FILES; Spark-written
        # scale legs (MakeSf1 output) are parquet DIRECTORIES
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:  # subset Verify run (SPARK_GRAFT_ONLY): skip
                continue
            want = norm(con.execute(sql).fetchdf())
            got = norm(pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
        elif len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
        else:
            eq = True
            for c in want.columns:
                w, g = want[c], got[c]
                if pd.api.types.is_float_dtype(w):
                    same = (w.isna() & g.isna()) | (w == g)
                else:
                    same = (w.isna() & g.isna()) | (w == g)
                if not same.all():
                    bad = (~same).idxmax()
                    print(f"FAIL {name}: col {c} differs at row {bad}: "
                          f"want={w[bad]!r} got={g[bad]!r} "
                          f"({int((~same).sum())} rows differ)")
                    eq = False
                    break
            if eq:
                print(f"PASS {name} ({len(want)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                if name in ROUNDING_CAVEATS:
                    print(f"NOTE {name}: {ROUNDING_CAVEATS[name]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
