#!/usr/bin/env python3
"""Latent driver-red detector: the driver hashes VALUES after sorting
columns by name, so a DuckDB oracle column that comes back as float64
or object (e.g. HUGEINT from SUM(BIGINT)) against a Spark int64 column
hash-mismatches even when every value is numerically equal.  check.py
masks this with check_dtype=False; this tool reports every query whose
oracle frame dtype disagrees with the Spark parquet dtype.

Usage: tools/dtypecheck.py OUTDIR SFDIR [query...]
Driver-side tooling only (duckdb/pandas) — NOT part of the engine.
"""
import sys, json, glob
import duckdb


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_flag = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_flag += 1
            continue
        for c in sorted(set(got.columns) & set(exp.columns)):
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            # integer-width diffs (int32 vs int64) are normalized by
            # the driver's hasher — only CLASS diffs (float/object vs
            # integer) go red there
            if (gk in "iu") != (ek in "iu") and {gk, ek} & set("iuf"):
                print(f"{name}: column '{c}' "
                      f"spark={got[c].dtype} oracle={exp[c].dtype}")
                n_flag += 1
    print(f"-- {n_flag} dtype flags")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
