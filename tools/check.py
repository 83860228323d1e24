#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB
oracle results. Usage: tools/check.py [--time] OUTDIR SFDIR [query...]

--time prints per-query oracle-replay seconds and a sorted tail
summary (VERDICT r15 #1: profile the DuckDB replay so heavy
recursive-CTE oracles can be cheapened before the driver's budget
dies on them).

--json TARGET additionally writes {name: status} as JSON — the
machine-readable summary tools/roundguard.py consumes for the sf0.1
smoke gate (VERDICT r15 #4).

Driver-side tooling only (duckdb/pandas) — NOT part of the engine.
"""
import sys, json, glob, time
import duckdb
import pandas as pd

def main():
    args = sys.argv[1:]
    json_target = None
    if "--json" in args:
        i = args.index("--json")
        json_target = args[i + 1]
        args = args[:i] + args[i + 2:]
    argv = [a for a in args if a != "--time"]
    timed = "--time" in args
    outdir, sfdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    oracle_secs = {}
    statuses = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            statuses[name] = "MISSING"
            n_bad += 1
            continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        t0 = time.monotonic()
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            statuses[name] = "ORACLE-ERROR"
            n_bad += 1
            continue
        finally:
            oracle_secs[name] = time.monotonic() - t0
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
        statuses[name] = status
        if timed:
            print(f"{name}: {status} [{oracle_secs[name]:.2f}s]")
        else:
            print(f"{name}: {status}")
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
    if timed and oracle_secs:
        top = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:15]
        print("-- oracle replay total %.1fs; slowest:" %
              sum(oracle_secs.values()))
        for k, v in top:
            print(f"--   {k}: {v:.2f}s")
    if json_target:
        json.dump(statuses, open(json_target, "w"), indent=0,
                  sort_keys=True)
    print(f"-- {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
