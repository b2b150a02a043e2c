#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [sfDir] [outDir] [--strict]

1. Expects `graft.Verify` to have been run first:
     sbt "runMain graft.Verify <sfDir> <outDir>"
   which writes outDir/<name>/ parquet per query + outDir/oracle_sql.json.
2. Registers every parquet table in sfDir under its bare name in DuckDB,
   runs each oracle SQL, and compares against the Spark result:
   columns sorted by name, rows sorted by all columns, numeric values
   compared with relative epsilon 1e-9.

NOT part of the engine (driver-side tooling only).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:  # apply(axis=1) on an empty frame yields a DataFrame
        return df.reset_index(drop=True)
    # stringify for stable sort; keep originals for numeric compare
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


# --strict replicates the driver's hash gate: values must be EXACTLY
# equal (the driver sorts columns by name and hashes values — a rel-2e-15
# float difference reds the gate, as r4's bucketed_join proved). The
# default epsilon compare is for quick triage only; strict is the mode
# whose green cannot disagree with a driver red. Strict may over-flag:
# last-ulp float formation differences (window sums, corr, ndcg) that the
# driver's hash grain tolerates show up as strict FAILs.
STRICT = False


def values_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if STRICT:
            return fa == fb
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    return a == b or str(a) == str(b)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA cols spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"ROWS spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not values_equal(a, b):
                return f"VALUE col={c} row={i} spark={a!r} oracle={b!r}"
    return None


def main():
    global STRICT
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        tbl = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results, failed = {}, []
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            failed.append(name)
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            ok = len(spark_df) > 0
            results[name] = "ROWS_ONLY_OK" if ok else "ROWS_ONLY_EMPTY"
            if not ok:
                failed.append(name)
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            failed.append(name)
            continue
        diff = compare(name, spark_df, oracle_df)
        results[name] = diff or "MATCH"
        if diff:
            failed.append(name)

    for name in names:
        print(f"{'PASS' if name not in failed else 'FAIL':4} {name}: {results[name]}")
    extra = set(oracles) - set(names)
    if extra:
        print(f"WARN oracles with no spark output: {sorted(extra)}")
    print(f"\n{len(names) - len(failed)}/{len(names)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
