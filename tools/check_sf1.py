#!/usr/bin/env python3
"""Full-board sf1 oracle check (r14 verdict item 1).

Same gate as tools/check.py but engineered for sf1 row counts: instead of
fetching both result sets into Python and comparing row-by-row (minutes per
6M-row output), the compare happens inside DuckDB as an exact MULTISET
equality:

    (spark EXCEPT ALL oracle) UNION ALL (oracle EXCEPT ALL spark)  -> 0 rows

with columns projected in sorted-name order on both sides, plus a rowcount
check. DuckDB's set-op equality treats NaN = NaN and NULL = NULL, matching
check.py's cell_eq. What this deliberately does NOT re-check at sf1:

  * row ORDER (check.py compares in-order): ordering determinism is already
    driver-verified at sf0.01 for every row on the board; the sf1 question
    is value/aggregation correctness at 100x the data, which multiset
    equality answers exactly.
  * the DECIMAL/HUGEINT/nested type lint: also plan-level, identical at any
    sf, and driver-green at sf0.01. (EXCEPT ALL applies DuckDB's implicit
    numeric coercion between the two sides, same as cell_eq's int==int /
    float==float after the sf0.01 lint has pinned both sides' types.)

Usage:  python3 tools/check_sf1.py [sfDir] [outDir] [only ...] [--no-verify]
Writes CORRECTNESS_SF1.json in the repo root (same per-query shape the
driver emits). NOT part of the shipped library; driver-side python only.
"""
import json, subprocess, sys, time
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
ONLY = set(a for a in sys.argv[3:] if not a.startswith("--"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT_DIR}']
    env = dict(__import__("os").environ, SPARK_GRAFT_CPUS="16")
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True,
                       env=env)
    if r.returncode != 0:
        print(r.stdout[-8000:]); print(r.stderr[-4000:]); sys.exit(1)


def compare(name, con, sql):
    """Returns (err_or_None, spark_rows, oracle_rows, secs)."""
    t0 = time.time()
    spark_dir = Path(OUT_DIR) / name
    if not list(spark_dir.glob("*.parquet")):
        return "MISSING spark output", None, None, 0.0
    try:
        orel = con.sql(sql)
        ocols = sorted(orel.columns)
    except Exception as e:
        return f"ORACLE ERROR: {str(e).splitlines()[0]}", None, None, 0.0
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols = sorted(srel.columns)
    if scols != ocols:
        return f"SCHEMA MISMATCH spark={scols} oracle={ocols}", None, None, 0.0
    proj = ", ".join(f'"{c}"' for c in scols)
    con.sql(f"CREATE OR REPLACE TEMP VIEW __o AS SELECT {proj} FROM ({sql})")
    con.sql(f"CREATE OR REPLACE TEMP VIEW __s AS SELECT {proj} "
            f"FROM read_parquet('{spark_dir}/*.parquet')")
    try:
        sn = con.sql("SELECT count(*) FROM __s").fetchone()[0]
        on = con.sql("SELECT count(*) FROM __o").fetchone()[0]
        if sn != on:
            return f"ROWCOUNT spark={sn} oracle={on}", sn, on, time.time() - t0
        diff = con.sql(
            "SELECT count(*) FROM ((SELECT * FROM __s EXCEPT ALL SELECT * "
            "FROM __o) UNION ALL (SELECT * FROM __o EXCEPT ALL SELECT * "
            "FROM __s))").fetchone()[0]
        if diff:
            sample = con.sql(
                "SELECT * FROM __s EXCEPT ALL SELECT * FROM __o LIMIT 3"
            ).fetchall()
            return f"{diff} multiset diffs; spark-only sample {sample}", \
                sn, on, time.time() - t0
    except Exception as e:
        return f"COMPARE ERROR: {str(e).splitlines()[0]}", None, None, \
            time.time() - t0
    return None, sn, on, time.time() - t0


def main():
    if "--no-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    con.sql("SET threads TO 16")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads(Path(OUT_DIR, "oracle_sql.json").read_text())
    board, n_pass, n_fail = {}, 0, 0
    for name in sorted(oracle_sql):
        if ONLY and name not in ONLY:
            continue
        err, sn, on, secs = compare(name, con, oracle_sql[name])
        if err:
            n_fail += 1
            print(f"FAIL {name}: {err}")
            board[name] = {"rows_match": sn == on if sn is not None else False,
                           "schema_match": not err.startswith("SCHEMA"),
                           "hash_match": False, "spark_rows": sn,
                           "oracle_rows": on, "err": err[:500],
                           "sec": round(secs, 2)}
        else:
            n_pass += 1
            print(f"pass {name} ({sn} rows, {secs:.1f}s)")
            board[name] = {"rows_match": True, "schema_match": True,
                           "hash_match": True, "spark_rows": sn,
                           "oracle_rows": on, "err": None,
                           "sec": round(secs, 2)}
    for d in sorted(Path(OUT_DIR).iterdir()):
        if d.is_dir() and d.name not in oracle_sql and \
                (not ONLY or d.name in ONLY):
            n = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
            ).fetchone()[0]
            print(f"rows-only {d.name}: {n} rows")
            board[d.name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": n,
                             "oracle_rows": None, "err": "no_oracle"}
    if not ONLY:
        out = {"sf": SF_DIR, "method": "duckdb multiset (EXCEPT ALL both "
               "directions) + rowcount; order/type-lint driver-checked at "
               "sf0.01", "pass": n_pass, "fail": n_fail, "queries": board}
        Path("/root/repo/CORRECTNESS_SF1.json").write_text(
            json.dumps(out, indent=1, sort_keys=True))
        print("wrote CORRECTNESS_SF1.json")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
