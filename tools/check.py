#!/usr/bin/env python3
"""Local self-check that mimics the driver's t2 gate.

Usage:  python3 tools/check.py [sfDir] [outDir] [only_query ...]

1. sbt runs graft.Verify sfDir outDir  (Spark results -> parquet, oracle_sql.json)
2. DuckDB runs each oracle SQL over views named after the parquet tables in sfDir
3. Compare: sort columns by name, compare row-by-row values exactly.

NOT part of the shipped library; driver-side python (duckdb/pyarrow) only.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-8000:])
        print(r.stderr[-4000:])
        sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, con, sql):
    spark_dir = Path(OUT_DIR) / name
    files = list(spark_dir.glob("*.parquet"))
    if not files:
        return f"MISSING spark output"
    try:
        oracle = con.sql(sql)
        ocols = sorted(oracle.columns)
        odf = oracle.df()[ocols]
        orows = [tuple(norm(v) for v in row) for row in odf.itertuples(index=False)]
    except Exception as e:
        return f"ORACLE ERROR: {str(e).splitlines()[0]}"
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols = sorted(srel.columns)
    if scols != ocols:
        return f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
    sdf = srel.df()[scols]
    srows = [tuple(norm(v) for v in row) for row in sdf.itertuples(index=False)]
    if len(srows) != len(orows):
        return f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
    mismatches = []
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        if sr != orow:
            ok = True
            for a, b in zip(sr, orow):
                if a == b:
                    continue
                try:
                    if abs(float(a) - float(b)) <= 1e-9 * max(1, abs(float(b))):
                        continue
                except (TypeError, ValueError):
                    pass
                ok = False
            mismatches.append((i, sr, orow, "~tol" if ok else "HARD"))
    if mismatches:
        hard = [m for m in mismatches if m[3] == "HARD"]
        msg = f"{len(mismatches)} row diffs ({len(hard)} hard)"
        for i, sr, orow, kind in mismatches[:3]:
            msg += f"\n      row {i} [{kind}] spark={sr} oracle={orow}"
        return msg
    return None


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads(Path(OUT_DIR, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle_sql):
        if ONLY and name not in ONLY:
            continue
        err = compare(name, con, oracle_sql[name])
        if err:
            n_fail += 1
            print(f"FAIL {name}: {err}")
        else:
            n_pass += 1
            print(f"pass {name}")
    # queries without oracle: rows-only presence check
    for d in sorted(Path(OUT_DIR).iterdir()):
        if d.is_dir() and d.name not in oracle_sql and (not ONLY or d.name in ONLY):
            n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"rows-only {d.name}: {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
