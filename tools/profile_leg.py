"""One-off profiler for a scaling leg: runs the identical job as
tools/scaling_bench.py `run` with the Spark event log enabled, then
parses the log into per-job / per-stage wall + task-time totals so the
serial (driver-side) fraction is visible.

Usage: taskset -c 0-15 python tools/profile_leg.py local[16] /tmp/scaling_input
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main(master: str, in_dir: str) -> None:
    cores = int(master.split("[")[1].rstrip("]"))
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession
    heap_g = min(48, max(4, int(cores * 1.5)))
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", f"{heap_g}g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .appName(f"profile-{master}")
    )
    for kv in os.environ.get("PROFILE_EXTRA", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark = spark.config(k, v)
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from document_parser_spark.plans.pipeline import extract

    spark.read.parquet(in_dir).count()
    out = "/tmp/profile_out"

    def job(tag: str) -> float:
        shutil.rmtree(f"{out}/{tag}", ignore_errors=True)
        t0 = time.time()
        extract(spark.read.parquet(in_dir)) \
            .write.mode("overwrite").parquet(f"{out}/{tag}")
        return time.time() - t0

    job("warmup")
    t_mark = time.time() * 1000  # ms epoch: only analyze events after this
    secs = job("timed")
    print(f"== timed run: {secs:.2f}s on {master}")
    spark.stop()

    # parse the event log
    jobs = {}     # id -> dict
    stages = {}   # id -> dict
    task_stats = {}  # stage id -> [task ms]
    paths = [p for p in glob.glob(f"{EVDIR}/**/*", recursive=True)
             if os.path.isfile(p) and "appstatus" not in p]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    if ev["Submission Time"] >= t_mark:
                        jobs[ev["Job ID"]] = {"t0": ev["Submission Time"]}
                elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    if si.get("Submission Time", 0) >= t_mark:
                        stages[si["Stage ID"]] = {
                            "name": si["Stage Name"].split("\n")[0][:70],
                            "tasks": si["Number of Tasks"],
                            "t0": si["Submission Time"],
                            "t1": si["Completion Time"],
                        }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev["Task Info"]
                    dur = ti["Finish Time"] - ti["Launch Time"]
                    d = task_stats.setdefault(sid, [])
                    d.append(dur)
    print("\n== jobs (wall ms)")
    tot = 0
    prev_end = None
    gap_total = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        wall = j["t1"] - j["t0"]
        gap = (j["t0"] - prev_end) if prev_end else 0
        gap_total += max(0, gap)
        prev_end = j["t1"]
        tot += wall
        print(f"job {jid}: wall={wall}ms gap_before={gap}ms")
    print(f"sum job wall = {tot}ms; sum inter-job driver gaps = {gap_total}ms; "
          f"timed total = {secs*1000:.0f}ms; "
          f"outside-jobs = {secs*1000 - tot:.0f}ms")
    print("\n== stages")
    for sid in sorted(stages):
        s = stages[sid]
        ts = sorted(task_stats.get(sid, []))
        extra = ""
        if ts:
            extra = (f" task_sum={sum(ts)}ms max={ts[-1]}ms "
                     f"med={ts[len(ts)//2]}ms ideal_wall={sum(ts)/cores:.0f}ms")
        print(f"stage {sid}: {s['t1']-s['t0']}ms tasks={s['tasks']}"
              f"{extra} {s['name']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
