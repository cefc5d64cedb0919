#!/usr/bin/env python
"""Round-10 optimization probe: isolated floor + formatted plan capture.

For each member given on the command line:
  - spawns a CHILD process (fresh JVM, idle-host floor protocol from
    scripts/floor_probe_r9.py: one untimed warm-up, min-of-N)
  - writes the query's ``explain("formatted")`` output to
    plans/r10/<member>_<tag>.txt (tag = --tag, default "before") so the
    plan-shape claims in OPTIMIZATION_r10.md are checkable artifacts
  - prints one JSON line per member with min/median/max seconds

Usage:  python scripts/opt_probe_r10.py [--tag before|after]
                                        [--reps N] member [member ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def child(name: str, tag: str, reps: int) -> None:
    from anomaly_detection_spark import queries as reg
    from anomaly_detection_spark.session import get_spark

    spark = get_spark("opt-probe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # plan capture (pre-execution initial plan; with AQE the final plan
    # differs, but Exchange placement / join strategy / pushdown are
    # already decided here and it is reproducible without running)
    df = reg.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs(os.path.join(REPO, "plans", "r10"), exist_ok=True)
    with open(os.path.join(REPO, "plans", "r10", f"{name}_{tag}.txt"), "w") as f:
        f.write(buf.getvalue())
    spark.catalog.clearCache()

    if reps <= 0:  # plan capture only (usable while the host is busy)
        print(json.dumps({"member": name, "tag": tag, "plan_only": True}),
              flush=True)
        return

    # floor protocol: one untimed warm-up, then min-of-N
    spark.sparkContext.setJobDescription(f"opt-probe warmup: {name}")
    reg.QUERIES[name](spark, SF_DIR).count()
    spark.catalog.clearCache()
    times = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"opt-probe {name} rep {i}")
        t0 = time.time()
        reg.QUERIES[name](spark, SF_DIR).count()
        times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    ts = sorted(times)
    print(json.dumps({
        "member": name, "tag": tag, "sf_dir": SF_DIR, "reps": reps,
        "times": times, "floor": ts[0], "median": ts[len(ts) // 2],
        "max": ts[-1],
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--child", default=None, help=argparse.SUPPRESS)
    ap.add_argument("members", nargs="*")
    args = ap.parse_args()
    if args.child:
        child(args.child, args.tag, args.reps)
        return
    for m in args.members:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", m, "--tag", args.tag, "--reps", str(args.reps)],
            cwd=REPO, capture_output=True, text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(json.dumps({"member": m, "error": r.stderr[-500:]}),
                  flush=True)


if __name__ == "__main__":
    main()
