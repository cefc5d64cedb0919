#!/usr/bin/env python
"""Stage-level profile of one registered query (round-10 optimization).

Fresh JVM, event-log enabled; runs the query once warm-up + once
measured, then parses the event log and prints per-stage wall time,
task count, and the first line of the callsite — the evidence for
where a member's seconds actually go (guide §1).

Usage: python scripts/stage_profile_r10.py <member> [<member> ...]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def child(name: str, log_dir: str) -> None:
    from pyspark.sql import SparkSession

    from anomaly_detection_spark import queries as reg

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"stage-profile-{name}")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up (JVM/codegen) on a cheap member, then the real run
    reg.QUERIES["tpch_q1_agg"](spark, SF_DIR).count()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"MEASURED:{name}")
    import time

    t0 = time.time()
    reg.QUERIES[name](spark, SF_DIR).count()
    print(json.dumps({"member": name, "wall": round(time.time() - t0, 3)}),
          flush=True)
    spark.stop()


def report(log_dir: str) -> None:
    paths = [
        p for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    stages = []
    jobs = {}
    props = {}
    for p in paths:
        with open(p) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = (
                        ev.get("Properties", {}).get(
                            "spark.job.description", ""
                        )
                    )
                    for sid in ev.get("Stage IDs", []):
                        props[sid] = ev["Job ID"]
                elif et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    if sub is None or com is None:
                        continue
                    stages.append({
                        "stage": si["Stage ID"],
                        "job": props.get(si["Stage ID"], -1),
                        "sec": round((com - sub) / 1000.0, 3),
                        "tasks": si.get("Number of Tasks"),
                        "name": si.get("Stage Name", "")[:90],
                    })
    stages.sort(key=lambda s: -s["sec"])
    measured_jobs = {
        j for j, d in jobs.items() if str(d).startswith("MEASURED:")
    }
    print("== stages in MEASURED jobs, slowest first ==")
    for s in stages:
        if s["job"] in measured_jobs:
            print(f"  {s['sec']:7.3f}s  stage={s['stage']:4d} "
                  f"tasks={s['tasks']:4d}  {s['name']}")
    other = [s for s in stages if s["job"] not in measured_jobs]
    if other:
        print("== stages outside MEASURED jobs (warm-up etc.), top 5 ==")
        for s in other[:5]:
            print(f"  {s['sec']:7.3f}s  stage={s['stage']:4d} "
                  f"tasks={s['tasks']:4d}  {s['name']}")


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    for m in sys.argv[1:]:
        log_dir = tempfile.mkdtemp(prefix=f"evlog_{m}_")
        print(f"=== {m} ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", m, log_dir],
            cwd=REPO, capture_output=True, text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print("CHILD FAILED:", r.stderr[-800:], flush=True)
            continue
        report(log_dir)


if __name__ == "__main__":
    main()
