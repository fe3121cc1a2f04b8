#!/usr/bin/env python3
"""Local self-check approximating the driver's t2 gate.

Usage:  python3 tools/check.py [sfDir] [outDir] [only_query ...]

1. sbt runs graft.Verify sfDir outDir  (Spark results -> parquet, oracle_sql.json)
2. DuckDB runs each oracle SQL over views named after the parquet tables in sfDir
3. Compare: sort columns by name, fetch EXACT values (no pandas float64
   conversion, no tolerance) and compare row-by-row. Additionally WARN on any
   DECIMAL-typed output column: the driver's hasher serializes Spark-parquet
   decimals and DuckDB decimals differently, so a decimal final column can be
   value-equal here and still fail the driver hash (round-1 lesson). Final
   outputs should be DOUBLE/BIGINT/STRING/DATE/TIMESTAMP only.

NOT part of the shipped library; driver-side python (duckdb/pyarrow) only.
"""
import decimal, json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(a for a in sys.argv[3:] if not a.startswith("--"))

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


def cell_eq(a, b):
    """Exact equality, but Decimal-vs-anything must be same kind (the driver
    hashes serialized forms, so 1.5 (float) vs Decimal('1.5000') differs)."""
    if a is None or b is None:
        return a is b
    da, db = isinstance(a, decimal.Decimal), isinstance(b, decimal.Decimal)
    if da != db:
        return False
    if da:
        return str(a) == str(b)  # serialization-exact, incl. scale
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare(name, con, sql):
    spark_dir = Path(OUT_DIR) / name
    files = list(spark_dir.glob("*.parquet"))
    if not files:
        return "MISSING spark output", []
    warns = []
    try:
        oracle = con.sql(sql)
        ocols = sorted(oracle.columns)
        # Type-strict gate (round-9 lesson): DuckDB HUGEINT/UHUGEINT and
        # DECIMAL serialize differently from Spark's BIGINT/DOUBLE in the
        # driver's hasher, so a value-equal result can still red the driver.
        # Python fetchall() sees both as int/Decimal and masks it — FAIL here.
        # r11 lesson: the driver's pandas hasher cannot sort/hash nested
        # values (numpy arrays / dicts) — ARRAY/STRUCT/MAP outputs are as
        # red as HUGEINT was in r8/r9, even when values match.
        def _nested(u):
            return "[]" in u or u.startswith(("STRUCT", "MAP", "LIST", "UNION"))
        bad = [(c, str(t)) for c, t in zip(oracle.columns, oracle.types)
               if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))
               or _nested(str(t).upper())]
        if bad:
            return f"ORACLE TYPE LINT: {bad} — cast to BIGINT/DOUBLE or array_to_string in the twin", warns
        oidx = [oracle.columns.index(c) for c in ocols]
        orows = [tuple(r[i] for i in oidx) for r in oracle.fetchall()]
    except Exception as e:
        return f"ORACLE ERROR: {str(e).splitlines()[0]}", warns
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols = sorted(srel.columns)
    if scols != ocols:
        return f"SCHEMA MISMATCH spark={scols} oracle={ocols}", warns
    sbad = [(c, str(t)) for c, t in zip(srel.columns, srel.types)
            if "DECIMAL" in str(t).upper() or _nested(str(t).upper())]
    if sbad:
        return f"SPARK TYPE LINT: {sbad} — cast to DOUBLE/BIGINT in the query", warns
    sidx = [srel.columns.index(c) for c in scols]
    srows = [tuple(r[i] for i in sidx) for r in srel.fetchall()]
    if len(srows) != len(orows):
        return f"ROWCOUNT spark={len(srows)} oracle={len(orows)}", warns
    mismatches = []
    for i, (sr, orow) in enumerate(zip(srows, orows)):
        if not all(cell_eq(a, b) for a, b in zip(sr, orow)):
            mismatches.append((i, sr, orow))
    if mismatches:
        msg = f"{len(mismatches)} row diffs"
        for i, sr, orow in mismatches[:3]:
            msg += f"\n      row {i} spark={sr} oracle={orow}"
        return msg, warns
    return None, warns


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
        err, warns = compare(name, con, oracle_sql[name])
        for w in warns:
            print(f"WARN {name}: {w}")
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
