#!/usr/bin/env python3
"""sf1 scale evidence for the LLM-pipeline operators (VERDICT r12 #3).

The dedup/ANN/curation operators — whose whole point is 100 TB — had
only ever been MEASURED at sf0.1 (~5k docs); their banded-LSH caps and
skew behavior above that were asserted, not measured. This harness runs
the ten most expensive LLM queries at sf0.1 and at sf1 (50k docs, 10x
near-duplicate variants — see tools/bench_sf1.py generate()) under the
IDENTICAL graft.Bench protocol (same JVM shape, warmup_v2, noop sink,
local[32]), and reports per-query wall + the plan-deterministic shuffle
audit (read/write bytes, shuffle-writing stage count) so the sf0.1->sf1
scaling exponent is measured, not guessed.

Usage: python3 tools/bench_sf1_llm.py            # writes BENCH_SF1_LLM.json
NOT part of the shipped library; driver-side python. Never run sbt
concurrently (shared project lock).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import bench_sf1  # generate() builds /tmp/graft_sf1 incl. documents

TOP10 = ["q_llm_pipeline_e2e", "q_llm_dedup_incremental",
         "q_llm_dedup_keep_best", "q_llm_dedup_cluster",
         "q_llm_copy_detect", "q_llm_split_leakfree",
         "q_llm_dedup_contain", "q_llm_dedup_ngram",
         "q_llm_segment_dedup", "q_llm_source_overlap"]


def bench(sf_dir, out):
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_CPUS": "32",
           "SPARK_GRAFT_BENCH_ONLY": ",".join(TOP10),
           "SPARK_GRAFT_BENCH_OUT": out}
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd="/root/repo", capture_output=True, text=True, env=env)
    if not Path(out).exists():
        print(r.stdout[-4000:]); print(r.stderr[-2000:])
        sys.exit(f"bench produced no {out}")
    return json.loads(Path(out).read_text())


def main():
    bench_sf1.generate()
    lo = bench("/root/testdata/sf0.1", "/tmp/bench_llm_sf01.json")
    hi = bench(bench_sf1.SF1, "/tmp/bench_llm_sf1.json")
    rows = []
    for q in TOP10:
        w0, w1 = lo["queries"].get(q), hi["queries"].get(q)
        a0 = lo.get("shuffle_audit", {}).get(q, {})
        a1 = hi.get("shuffle_audit", {}).get(q, {})
        def f(a, k):
            v = a.get(k)
            return int(v) if v is not None else None
        row = {"query": q, "sf01_sec": w0, "sf1_sec": w1,
               "wall_x": round(w1 / w0, 2) if w0 and w1 else None,
               "sf01_shuffle_write": f(a0, "shuffle_write_b"),
               "sf1_shuffle_write": f(a1, "shuffle_write_b"),
               "sf01_stages": f(a0, "shuffle_write_stages"),
               "sf1_stages": f(a1, "shuffle_write_stages")}
        if row["sf01_shuffle_write"] and row["sf1_shuffle_write"]:
            row["bytes_x"] = round(
                row["sf1_shuffle_write"] / row["sf01_shuffle_write"], 2)
        rows.append(row)
        print(row)
    out = {
        "protocol": "identical graft.Bench warmup_v2/noop-sink/local[32] at "
                    "both SFs; sf1 = 10x near-duplicate variants (see "
                    "tools/bench_sf1.py); data_x = 10",
        "host_health": {"sf01": lo.get("host_health"),
                        "sf1": hi.get("host_health")},
        "queries": rows,
        "sf01_total_sec": round(sum(r["sf01_sec"] or 0 for r in rows), 3),
        "sf1_total_sec": round(sum(r["sf1_sec"] or 0 for r in rows), 3),
    }
    Path("/root/repo/BENCH_SF1_LLM.json").write_text(json.dumps(out, indent=1))
    print("wrote /root/repo/BENCH_SF1_LLM.json  total "
          f"{out['sf01_total_sec']} -> {out['sf1_total_sec']} s")


if __name__ == "__main__":
    main()
