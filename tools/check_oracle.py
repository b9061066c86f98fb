#!/usr/bin/env python3
"""Dev-only driver simulator (NOT part of the shipped library).

Mimics the round driver's correctness gate: reads Verify's parquet output
per query, runs the matching oracle SQL in DuckDB over the same source
parquet tables, sorts columns by name + rows by value, and diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--exclude a,b]

--exclude names queries deliberately left out of a filtered Verify run
(oracle-side cost at large SF; each carries at-scale ScalaTest evidence
in AtScaleSpec instead) — they print as SKIP, never FAIL, and the tally
reads "N pass / M excluded / K fail".
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize temporal columns to ns for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir, exclude=()):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in exclude:
            print(f"SKIP {name} (oracle-cost exclusion, see AtScaleSpec)")
            n_skip += 1; continue
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        dt_got, dt_exp = [str(x) for x in got.dtypes], [str(x) for x in exp.dtypes]
        if dt_got != dt_exp:
            print(f"WARN {name}: dtypes {dt_got} vs {dt_exp}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1]}"); n_fail += 1
    tally = f"== {n_pass} pass / {n_fail} fail =="
    if n_skip:
        tally = f"== {n_pass} pass / {n_skip} excluded / {n_fail} fail =="
    print(tally)
    return 1 if n_fail else 0

if __name__ == "__main__":
    argv = sys.argv[1:]
    args, excl, i = [], (), 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--exclude="):
            excl = tuple(x for x in a.split("=", 1)[1].split(",") if x)
        elif a == "--exclude":
            if i + 1 >= len(argv):
                sys.exit("usage: check_oracle.py <sfDir> <outDir> [--exclude a,b]")
            excl = tuple(x for x in argv[i + 1].split(",") if x)
            i += 1
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a!r}; usage: check_oracle.py <sfDir> <outDir> [--exclude a,b]")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit("usage: check_oracle.py <sfDir> <outDir> [--exclude a,b]")
    sys.exit(main(args[0], args[1], excl))
