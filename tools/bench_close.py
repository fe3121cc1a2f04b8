#!/usr/bin/env python3
"""Round-close bench protocol (VERDICT r12 task 6).

Runs the full graft.Bench, archives EVERY run under bench_archive/, and
guarantees that the BENCH_LOCAL.json a naive reader opens at HEAD is a
HEALTHY run (host_health.degraded == false) whenever one was achieved:

  1. run `sbt "runMain graft.Bench"` (full board) up to --max-attempts
     times, archiving each as bench_archive/BENCH_LOCAL_<tag>_run<i>.json;
  2. stop early on the first non-degraded run;
  3. write the run with the LOWEST floor_ratio to BENCH_LOCAL.json,
     stamped with a close_protocol block naming the archive it came from
     and every attempt's floor ratio (so a degraded close is loud).

Usage:  python3 tools/bench_close.py <tag> [--max-attempts N] [--sf DIR]

NOT part of the shipped library; driver-side helper. Never run sbt
concurrently with this script (shared project lock).
"""
import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_bench(sf_dir):
    out = "/tmp/bench_close_run.json"
    pathlib.Path(out).unlink(missing_ok=True)
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, capture_output=True, text=True,
        env={**__import__("os").environ, "SPARK_GRAFT_SF_DIR": sf_dir,
             "SPARK_GRAFT_BENCH_OUT": out})
    if not pathlib.Path(out).exists():
        print(r.stdout[-4000:], file=sys.stderr)
        raise SystemExit("bench produced no output file")
    return json.loads(pathlib.Path(out).read_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("--max-attempts", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-sf1", action="store_true",
                    help="skip the CORRECTNESS_SF1.json full-board refresh")
    a = ap.parse_args()

    arch = REPO / "bench_archive"
    arch.mkdir(exist_ok=True)
    attempts = []
    for i in range(1, a.max_attempts + 1):
        run = run_bench(a.sf)
        floor = run.get("host_health", {}).get("floor_ratio_vs_settled")
        degraded = run.get("host_health", {}).get("degraded", True)
        path = arch / f"BENCH_LOCAL_{a.tag}_run{i}.json"
        path.write_text(json.dumps(run, indent=1))
        attempts.append({"archive": path.name, "floor_ratio": floor,
                         "degraded": degraded,
                         "headline_sec": run.get("value")})
        print(f"run {i}: headline {run.get('value'):.3f} s, floor {floor}, "
              f"degraded={degraded} -> {path.name}")
        if not degraded:
            break
    best = min(attempts, key=lambda x: (x["degraded"], x["floor_ratio"] or 9e9))
    run = json.loads((arch / best["archive"]).read_text())
    run["close_protocol"] = {"picked": best["archive"], "attempts": attempts}
    (REPO / "BENCH_LOCAL.json").write_text(json.dumps(run, indent=1))
    print(f"BENCH_LOCAL.json <- {best['archive']} "
          f"(degraded={best['degraded']})")
    # r17 (VERDICT r16 task 4): CORRECTNESS_SF1.json can never go stale
    # again — the close protocol re-proves the FULL board at sf1 unless
    # explicitly skipped (--no-sf1).
    if not a.no_sf1:
        print("refreshing CORRECTNESS_SF1.json (full board at sf1)...")
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check_sf1.py")],
            cwd=REPO / "tools")
        if r.returncode != 0:
            raise SystemExit("check_sf1.py failed — CORRECTNESS_SF1 stale")
    # r18 (VERDICT r17 task 1): the 0-drift provenance invariant is part
    # of every close — re-prove EVERY differential fixture against real
    # DuckDB, all families, or fail the close loudly.
    print("re-verifying all differential fixtures against DuckDB...")
    import glob
    spec_files = sorted(
        glob.glob(str(REPO / "src/test/scala/graft/*DifferentialSpec.scala"))
    ) + [str(REPO / "src/test/scala/graft/KeyEquivSpec.scala")]
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "diffgen.py"), "verify",
         *spec_files], cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("diffgen verify failed — fixture drift at close")
    sys.exit(0 if not best["degraded"] else 2)


if __name__ == "__main__":
    main()
