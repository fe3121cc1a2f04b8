#!/usr/bin/env python3
"""sf1 throughput-regime bench (r9 verdict item 6).

At sf0.1 every Spark query pays a ~0.06 s plan+schedule+sink floor against
DuckDB totals of 0.02-0.07 s — an overhead-regime comparison. This harness
re-runs the 6-query headline set at sf1 (10x rows), where floors are <10%
of wall time, so the 2x bench gate is finally measured in a throughput
regime.

Data: sf1 is generated ONCE under /tmp/graft_sf1 by replicating the
driver's sf0.1 fixtures 10x with join-consistent key offsets (orderkey /
event_id shifted per copy; dimensions unchanged) — distributions identical,
cardinalities 10x. The driver fixtures themselves are never modified.

Protocol (both engines materialize IN-ENGINE, no client conversion):
  - DuckDB 1.x: CREATE TEMP TABLE AS <query> over parquet views; 1 warmup
    + 3 timed, median reported.
  - Spark: graft.Bench with SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 and
    SPARK_GRAFT_BENCH_ONLY=<headline set> (same warmup-v2 protocol, noop
    sink, local[4] / 4 shuffle partitions — the BASELINE.md gate config).

Usage: python3 tools/bench_sf1.py [--regen]
Writes BENCH_SF1.json in the repo root. NOT part of the shipped library;
driver-side python (duckdb) only.
"""
import json, statistics, subprocess, sys, time
from pathlib import Path

import duckdb

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/graft_sf1"
COPIES = 10
OK_RANGE = 150_000   # sf0.1 o_orderkey in [0, 150000)
EV_RANGE = 100_000   # sf0.1 event_id   in [0, 100000)

HEADLINE = ["q_agg_groupby", "q_join_inner", "q_join_multiway",
            "q_win_topk_per_group", "q_events_tumbling_batch", "q_fn_json"]

# the 6 headline oracle twins (q_events_tumbling_batch = the streaming
# tumbling twin, the batch-equivalent BASELINE.md measured)
ORACLE = {
    "q_agg_groupby": """
        SELECT l_returnflag, l_linestatus, CAST(SUM(qi) AS DOUBLE) AS sum_qty,
               CAST(SUM(pe2) AS DOUBLE) / 100.0 AS sum_base,
               CAST(SUM(pe2 * (100 - de2)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(SUM(pe2 * (100 - de2) * (100 + te2)) AS DOUBLE) / 1000000.0 AS sum_charge,
               CAST(CAST(CAST(SUM(qi) AS DECIMAL(18,4)) / COUNT(*) AS DECIMAL(18,4)) AS DOUBLE) AS avg_qty,
               COUNT(*) AS cnt
        FROM (SELECT l_returnflag, l_linestatus,
                     CAST(round(l_quantity) AS BIGINT) AS qi,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS pe2,
                     CAST(round(l_discount * 100) AS BIGINT) AS de2,
                     CAST(round(l_tax * 100) AS BIGINT) AS te2
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_join_inner": """
        SELECT o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F' GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_multiway": """
        SELECT n_name,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
                        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""",
    "q_win_topk_per_group": """
        SELECT * FROM (SELECT o_custkey, o_orderkey,
                              ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                       FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""",
    "q_events_tumbling_batch": """
        SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""",
    "q_fn_json": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k2
        FROM events ORDER BY event_id""",
}

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
DOC_RANGE = 1_000_000   # sf0.1 doc_id fits well inside; offset per copy
VEC_RANGE = 1_000_000


def generate():
    out = Path(SF1)
    if (out / "lineitem.parquet").exists() and "--regen" not in sys.argv:
        print(f"[gen] {SF1} exists, skipping (pass --regen to rebuild)")
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
        # r13 (verdict #3): LLM-operator scale evidence needs documents at
        # sf1. Copies i>0 append a short variant marker so replication
        # does NOT create exact duplicates (which would collapse in the
        # first dedup stage) — it creates NEAR-duplicate variants, the
        # load the MinHash/LSH banding and connected components actually
        # carry at scale.
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
        print(f"[gen] {t}: {n} rows")


def bench_duckdb(threads):
    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in TABLES:
        p = f"{SF1}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    res = {}
    for name in HEADLINE:
        q = ORACLE[name]
        times = []
        for i in range(4):  # 1 warmup + 3 timed
            t0 = time.perf_counter()
            con.sql(f"CREATE OR REPLACE TEMP TABLE _bench AS {q}")
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        con.sql("DROP TABLE _bench")
        res[name] = round(statistics.median(times), 4)
        print(f"[duckdb t{threads}] {name}: {res[name]} s "
              f"(runs {['%.3f' % t for t in times]})")
    return res


def bench_spark(cpus):
    env = dict(SPARK_GRAFT_SF_DIR=SF1, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_ONLY=",".join(HEADLINE))
    import os
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd="/root/repo", capture_output=True, text=True,
                       env={**os.environ, **env})
    for line in (r.stdout + r.stderr).splitlines():
        # sbt prefixes the line with [info]; take from the first brace
        if '"metric"' in line and '"queries"' in line and "{" in line:
            return json.loads(line[line.index("{"):])
    print(r.stdout[-4000:]); print(r.stderr[-2000:])
    sys.exit("no bench JSON line found")


def run_config(nthreads):
    """matched-resource comparison: duckdb SET threads=N vs spark local[N]"""
    duck = bench_duckdb(nthreads)
    spark = bench_spark(nthreads)
    sq = spark["queries"]
    rows, d_tot, s_tot = [], 0.0, 0.0
    for name in HEADLINE:
        d, s = duck[name], sq.get(name, -1.0)
        d_tot += d; s_tot += s
        rows.append({"query": name, "duckdb_sec": d, "spark_sec": s,
                     "ratio": round(s / d, 2) if d > 0 else None})
        print(f"[{nthreads}thr] {name:28s} duckdb {d:7.3f}  spark {s:7.3f}  "
              f"ratio {s/d:5.2f}x")
    print(f"[{nthreads}thr] TOTAL duckdb {d_tot:.3f} s  spark {s_tot:.3f} s  "
          f"ratio {s_tot/d_tot:.2f}x")
    return {
        "threads": nthreads,
        "queries": rows,
        "duckdb_total_sec": round(d_tot, 3),
        "spark_total_sec": round(s_tot, 3),
        "total_ratio": round(s_tot / d_tot, 2),
        "spark_floors": {k: spark.get(k) for k in
                         ("per_query_overhead_sec", "per_query_scan_floor_sec")},
        "host_health": spark.get("host_health"),
    }


def main():
    generate()
    out = {
        "sf": "sf1 (10x replicated sf0.1, join-consistent offsets)",
        "protocol": "duckdb CREATE TEMP TABLE AS (median of 3, warm, SET "
                    "threads=N) vs graft.Bench warmup_v2 noop sink, local[N] "
                    "with N shuffle partitions — matched resources",
        "configs": [run_config(4), run_config(32)],
    }
    Path("/root/repo/BENCH_SF1.json").write_text(json.dumps(out, indent=2))
    print("wrote /root/repo/BENCH_SF1.json")


if __name__ == "__main__":
    main()
