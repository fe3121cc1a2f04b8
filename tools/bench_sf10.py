#!/usr/bin/env python3
"""sf10 scaling rung (r16 VERDICT task 1).

r15 proved the full board at sf1 and pinned the sf0.1->sf1 scaling of
the 10 most expensive LLM rows. This harness climbs one more rung:
sf10 = 100x the driver's sf0.1 fixtures (lineitem 60M rows, documents
500k with 100 near-duplicate variants per original), generated with the
same join-consistent key offsets as tools/bench_sf1.py. It runs the
6-query headline set + the top-10 LLM set under the IDENTICAL
graft.Bench protocol at sf1 and sf10 and reports per-query wall_x /
shuffle-bytes_x / shuffle-writing stage counts (data_x = 10).

Usage: python3 tools/bench_sf10.py [--regen]   # writes BENCH_SF10.json
NOT part of the shipped library; driver-side python. Never run sbt
concurrently (shared project lock).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import duckdb

import statistics
import time

import bench_sf1
from bench_sf1 import (SF01, OK_RANGE, EV_RANGE, DOC_RANGE, VEC_RANGE,
                       TABLES, HEADLINE, ORACLE)
from bench_sf1_llm import TOP10

SF10 = "/tmp/graft_sf10"
COPIES = 100

QUERIES = HEADLINE + TOP10


def generate():
    out = Path(SF10)
    if (out / "lineitem.parquet").exists() and "--regen" not in sys.argv:
        print(f"[gen] {SF10} exists, skipping (pass --regen to rebuild)")
        return
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT unnest(range({COPIES})) AS __i)"
    plans = {
        "lineitem": f"""SELECT l_orderkey + __i * {OK_RANGE} AS l_orderkey,
            l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
            l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src CROSS JOIN {copies}""",
        "orders": f"""SELECT o_orderkey + __i * {OK_RANGE} AS o_orderkey,
            o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src CROSS JOIN {copies}""",
        "events": f"""SELECT event_id + __i * {EV_RANGE} AS event_id,
            ts, user_id, event_type, value, props
            FROM src CROSS JOIN {copies}""",
        # near-duplicate variants, not exact copies — the load the LSH
        # banding and the bucket caps actually carry (see bench_sf1.py)
        "documents": f"""SELECT doc_id + __i * {DOC_RANGE} AS doc_id,
            CASE WHEN __i = 0 THEN text
                 ELSE text || ' variant marker v' || __i END AS text,
            lang, source,
            n_chars + CASE WHEN __i = 0 THEN 0
                           ELSE 19 + length(CAST(__i AS VARCHAR)) END AS n_chars
            FROM src CROSS JOIN {copies}""",
        "embeddings": f"""SELECT vec_id + __i * {VEC_RANGE} AS vec_id,
            embedding, label FROM src CROSS JOIN {copies}""",
    }
    for t in TABLES:
        srcp = f"{SF01}/{t}.parquet"
        if not Path(srcp).exists():
            continue
        con.sql(f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{srcp}')")
        sel = plans.get(t, "SELECT * FROM src")
        con.sql(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT parquet)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"[gen] {t}: {n} rows", flush=True)


def bench(sf_dir, out):
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": sf_dir,
           # the 8g default heap OOMs at sf10 (localCheckpoint
           # serialization of the 5M-doc pipeline stages); the box has
           # 128G — give the single local[32] JVM most of it
           "SPARK_DRIVER_MEM": "96g",
           "SPARK_GRAFT_CPUS": "32",
           "SPARK_GRAFT_BENCH_ONLY": ",".join(QUERIES),
           "SPARK_GRAFT_BENCH_OUT": out}
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd="/root/repo", capture_output=True, text=True, env=env)
    if not Path(out).exists():
        print(r.stdout[-4000:]); print(r.stderr[-2000:])
        sys.exit(f"bench produced no {out}")
    return json.loads(Path(out).read_text())


def bench_duckdb_sf10(threads=32):
    """r17 (r16 VERDICT task 3): the matched-resource DuckDB denominator
    at sf10 — same CREATE TEMP TABLE AS protocol as bench_sf1.py
    (1 warmup + median of 3, SET threads=N), same parquet views."""
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        p = f"{SF10}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    res = {}
    for name in HEADLINE:
        q = ORACLE[name]
        times = []
        for i in range(4):
            t0 = time.perf_counter()
            con.sql(f"CREATE OR REPLACE TEMP TABLE _bench AS {q}")
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        con.sql("DROP TABLE _bench")
        res[name] = round(statistics.median(times), 4)
        print(f"[duckdb sf10 t{threads}] {name}: {res[name]} s "
              f"(runs {['%.3f' % x for x in times]})", flush=True)
    return res


def main():
    bench_sf1.generate()
    generate()
    lo_path = Path("/tmp/bench_sf10_lo.json")
    lo = (json.loads(lo_path.read_text()) if lo_path.exists()
          else bench(bench_sf1.SF1, str(lo_path)))
    hi = bench(SF10, "/tmp/bench_sf10_hi.json")
    duck = bench_duckdb_sf10(32)
    rows = []
    for q in QUERIES:
        w0, w1 = lo["queries"].get(q), hi["queries"].get(q)
        a0 = lo.get("shuffle_audit", {}).get(q, {})
        a1 = hi.get("shuffle_audit", {}).get(q, {})
        def f(a, k):
            v = a.get(k)
            return int(v) if v is not None else None
        row = {"query": q, "sf1_sec": w0, "sf10_sec": w1,
               "wall_x": round(w1 / w0, 2) if w0 and w1 else None,
               "sf1_shuffle_write": f(a0, "shuffle_write_b"),
               "sf10_shuffle_write": f(a1, "shuffle_write_b"),
               "sf1_stages": f(a0, "shuffle_write_stages"),
               "sf10_stages": f(a1, "shuffle_write_stages")}
        if row["sf1_shuffle_write"] and row["sf10_shuffle_write"]:
            row["bytes_x"] = round(
                row["sf10_shuffle_write"] / row["sf1_shuffle_write"], 2)
        if q in duck:
            row["duckdb_sec"] = duck[q]
            if w1:
                row["spark_over_duckdb"] = round(w1 / duck[q], 2)
        rows.append(row)
        print(row, flush=True)
    duck_total = round(sum(duck.get(q, 0) for q in HEADLINE), 3)
    spark_head = round(sum((hi["queries"].get(q) or 0) for q in HEADLINE), 3)
    out = {
        "protocol": "identical graft.Bench warmup_v2/noop-sink/local[32] at "
                    "both SFs; sf10 = 100x sf0.1 with 100 near-duplicate "
                    "variants per doc (tools/bench_sf10.py); data_x = 10 "
                    "vs sf1; duckdb_sec = matched-resource DuckDB at sf10 "
                    "(SET threads=32, CREATE TEMP TABLE AS, median of 3)",
        "duckdb_headline_total_sec": duck_total,
        "spark_headline_total_sec": spark_head,
        "headline_ratio_vs_duckdb": (round(spark_head / duck_total, 2)
                                     if duck_total else None),
        "host_health": {"sf1": lo.get("host_health"),
                        "sf10": hi.get("host_health")},
        "queries": rows,
        "sf1_total_sec": round(sum(r["sf1_sec"] or 0 for r in rows), 3),
        "sf10_total_sec": round(sum(r["sf10_sec"] or 0 for r in rows), 3),
    }
    Path("/root/repo/BENCH_SF10.json").write_text(json.dumps(out, indent=1))
    print("wrote /root/repo/BENCH_SF10.json  total "
          f"{out['sf1_total_sec']} -> {out['sf10_total_sec']} s")


if __name__ == "__main__":
    main()
