#!/usr/bin/env python3
"""Driver-format correctness artifact from a Verify dump: the same
per-query compare as check.py, emitted as CORRECTNESS_r{N}.json rows
({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}). A builder-side fallback for the r14 failure mode
where the driver's own sweep recorded `{}` — pair with
tools/roundguard.py.

Usage: tools/correctness_json.py OUTDIR SFDIR TARGET.json

Driver-side tooling only (duckdb/pandas) — NOT part of the engine.
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def main():
    outdir, sfdir, target = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    out = {}
    for name in sorted(oracle):
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            if not glob.glob(f"{outdir}/{name}/*.parquet"):
                raise RuntimeError("missing spark output")
            got = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            exp = con.sql(oracle[name]).df()
            got = got.reindex(sorted(got.columns), axis=1)
            exp = exp.reindex(sorted(exp.columns), axis=1)
            row["spark_rows"] = len(got)
            row["oracle_rows"] = len(exp)
            row["rows_match"] = len(got) == len(exp)
            row["schema_match"] = list(got.columns) == list(exp.columns)
            if row["rows_match"] and row["schema_match"]:
                dtype_ok = not any(
                    (got[c].dtype.kind in "iu") != (exp[c].dtype.kind in "iu")
                    and {got[c].dtype.kind, exp[c].dtype.kind} & set("iuf")
                    for c in got.columns)
                if dtype_ok:
                    try:
                        pd.testing.assert_frame_equal(
                            got.reset_index(drop=True),
                            exp.reset_index(drop=True),
                            check_dtype=False, check_exact=True)
                        row["hash_match"] = True
                    except AssertionError:
                        pass
        except Exception as e:
            row["err"] = str(e)[:200]
        out[name] = row
    json.dump(out, open(target, "w"), indent=0, sort_keys=True)
    n_green = sum(1 for v in out.values() if v["hash_match"])
    print(f"{target}: {len(out)} rows, {n_green} hash-green")


if __name__ == "__main__":
    main()
