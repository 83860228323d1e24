#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB
oracle results. Usage: tools/check.py OUTDIR SFDIR [query...]

Driver-side tooling only (duckdb/pandas) — NOT part of the engine.
"""
import sys, json, glob
import duckdb
import pandas as pd

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            n_bad += 1
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_bad += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        status = "OK"
        if list(got.columns) != list(exp.columns):
            status = f"SCHEMA {list(got.columns)} vs {list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWCOUNT {len(got)} vs {len(exp)}"
        else:
            # Driver-faithful dtype-class guard: the driver hashes
            # VALUES, so a float64 oracle column (e.g. HUGEINT from
            # SUM(BIGINT)) against a Spark int column reads 1234.0 vs
            # 1234 and goes red even when numerically equal. Integer
            # WIDTH differences (int32 vs int64) are fine at the
            # driver; float-vs-int class differences are not.
            bad_cols = [
                c for c in got.columns
                if (got[c].dtype.kind in "iu") != (exp[c].dtype.kind in "iu")
                and {got[c].dtype.kind, exp[c].dtype.kind} & {"i", "u", "f"}
            ]
            if bad_cols:
                status = "DTYPE-CLASS " + ", ".join(
                    f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
                    for c in bad_cols)
            else:
                try:
                    pd.testing.assert_frame_equal(
                        got.reset_index(drop=True), exp.reset_index(drop=True),
                        check_dtype=False, check_exact=True)
                except AssertionError as e:
                    status = "MISMATCH " + str(e).replace("\n", " | ")[:300]
        print(f"{name}: {status}")
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
    print(f"-- {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
