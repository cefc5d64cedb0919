#!/usr/bin/env python
"""Round-9 isolated floor measurement (r8 verdict item 3).

Measures the per-member FLOOR — fresh JVM, idle host, min-of-N — for
the two bench members the r8 round left without a post-change
reference: ``kcore_dup_graph`` (3.4x r7->r8 in-bench move, code
unchanged since r5) and ``ppjoin_jaccard_pairs`` (1.44x move, and the
ONE member whose executed plan genuinely changed in r8: the rank-family
token dictionary).  Protocol identical to the r8 MinHash profile
(README "Round-8 drift profile"): each member runs in its OWN process
(fresh JVM, no shared warm-up), N back-to-back timed runs per process
after one untimed warm-up of the table loads, report min/median/max.

Usage:  python scripts/floor_probe_r9.py [member ...]
        (no args = the two r9 targets; each member spawns a child
        process via the --child flag)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGETS = ["kcore_dup_graph", "ppjoin_jaccard_pairs"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("FLOOR_REPS", "5"))


def child(name: str) -> None:
    from anomaly_detection_spark import queries as reg
    from anomaly_detection_spark.session import get_spark

    spark = get_spark("floor-probe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # untimed warm-up of input IO / codegen caches, same as bench.py's
    # per-member protocol (min-of-N measures the operator, not the
    # first-touch parquet footer reads)
    reg.QUERIES[name](spark, SF_DIR).count()
    times = []
    for _ in range(REPS):
        t0 = time.time()
        reg.QUERIES[name](spark, SF_DIR).count()
        times.append(round(time.time() - t0, 3))
    times_sorted = sorted(times)
    print(json.dumps({
        "member": name,
        "sf_dir": SF_DIR,
        "reps": REPS,
        "times": times,
        "floor": times_sorted[0],
        "median": times_sorted[len(times_sorted) // 2],
        "max": times_sorted[-1],
    }))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    members = sys.argv[1:] or TARGETS
    for name in members:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if line:
            print(line[-1], flush=True)
        else:
            print(json.dumps({"member": name, "error": out.stderr[-500:]}),
                  flush=True)


if __name__ == "__main__":
    main()
