"""Two-cluster-size scaling evidence (BASELINE.md §3).

No multi-node cluster exists in this sandbox, so the north rule's
N-vs-4N-executor criterion is evidenced by running the IDENTICAL
spark-submit job on the SAME materialized input at two local
parallelism levels (local[8] vs local[32]) and reporting throughput
at both plus ``eff = (T8/T32)/4``.

Usage:
    python tools/scaling_bench.py prepare <n_docs>   # write input once
    python tools/scaling_bench.py run <master> <in_dir> <out_dir>
    python tools/scaling_bench.py all [n_docs]       # full protocol -> md

``run`` executes the full pipeline (read parquet -> extract ->
write parquet output + lineage) — the same dataflow ``bin/extract.py``
submits, timed after a warm-up pass.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_DIR = "/tmp/scaling_input"
RESULTS = "/tmp/scaling_results"
EXTRA_MARK = "<!-- round-notes: preserved across scaling_bench rewrites -->"


def _session(master: str, cores: int):
    from pyspark.sql import SparkSession
    # shuffle partitions sized by DATA (AQE coalesces down as needed),
    # never by core count: with partitions == cores the reassembly
    # collect_list state per reducer grows with 1/cores and the small
    # run spills/GC-thrashes — the measured "super-linear scaling" that
    # results is an artifact, not a property of the job.
    #
    # Heap scales with the leg's core count (1.5g/core, the N-vs-4N
    # executor fiction: 4N executors bring 4x the memory); capped at
    # 48g so the 32-leg stays inside the 125 GiB host WITHOUT breaking
    # proportionality (a 24g cap silently handicapped the secondary
    # pair's 4N leg to 0.75g/core vs the N leg's 1.5g/core).
    heap_g = min(48, max(4, int(cores * 1.5)))
    return (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", f"{heap_g}g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Partition sizing must follow the PYTHON-UDF cost, not the IO
        # cost: the parse stage spends ~2 core-seconds per input MB
        # (measured via event log, tools/profile_leg.py), ~100x a
        # columnar scan, so the default 128m split yields a handful of
        # multi-second tasks and the 4N leg runs the map stage in 1-2
        # uneven waves (straggler-bound). Same for the reduce side: the
        # 64m AQE advisory coalesced the serialize+write stage to
        # ~cores tasks = ONE wave at 4N (measured: 17 tasks, 41%
        # utilization at 32 cores). 8m targets >=4 waves per leg at
        # every level from the same data-driven rule.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # v2 commits rename task outputs inside the tasks; the v1
        # driver-side sequential rename is a fixed serial cost that the
        # fast leg pays 3-4x more dearly (Amdahl)
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .appName(f"scaling-{master}")
        .getOrCreate()
    )


def _canary(cores: int, secs: float = 2.0) -> float:
    """Per-proc busy-loop Miters/s on this leg's affinity mask — the
    episodic-steal detector (loop body shared with bench.py via
    tools/steal_canary.py so readings stay comparable across tools).
    The sandbox host suffers hypervisor CPU steal in bursts
    (documented rounds 2-4; measured 10x task-time inflation during
    one burst while /proc/stat steal read 0 before and after). A leg
    whose canary is depressed vs its siblings was measured during a
    burst and must be re-run, not averaged in.
    """
    from tools.steal_canary import canary as probe

    return probe(cores, secs)


def prepare(n_docs: int) -> None:
    from document_parser_spark.sources.synth import synth_dataframe
    spark = _session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(INPUT_DIR, ignore_errors=True)
    # 512 files: task granularity for the parse stage is FILE-grained
    # (one row group per file — a byte-range split below row-group size
    # yields empty tasks), so the file count must give every leg >=4
    # waves of real tasks; content is a pure function of row index, so
    # the layout change never changes the data.
    synth_dataframe(spark, n_docs, partitions=512) \
        .write.mode("overwrite").parquet(INPUT_DIR)
    n = spark.read.parquet(INPUT_DIR).count()
    print(f"prepared {n} docs at {INPUT_DIR}")
    spark.stop()


def run(master: str, in_dir: str, out_dir: str) -> None:
    cores = int(master.split("[")[1].rstrip("]"))
    canary0 = _canary(cores)
    spark = _session(master, cores)
    spark.sparkContext.setLogLevel("ERROR")
    from document_parser_spark.plans.pipeline import extract

    docs = spark.read.parquet(in_dir)
    n_docs = docs.count()

    def job(tag: str) -> float:
        shutil.rmtree(f"{out_dir}/{tag}", ignore_errors=True)
        t0 = time.time()
        extract(spark.read.parquet(in_dir)) \
            .write.mode("overwrite").parquet(f"{out_dir}/{tag}")
        return time.time() - t0

    job("warmup")
    # single-machine wall time is noisy (GC, page cache, neighbors):
    # median of 3 timed runs of the identical job
    runs = sorted(job(f"timed{i}") for i in range(3))
    secs = runs[1]
    canary1 = _canary(cores)
    out = {"master": master, "cores": cores, "n_docs": n_docs,
           "wall_s": round(secs, 2), "runs_s": [round(r, 2) for r in runs],
           "canary_miters": [canary0, canary1],
           "docs_per_sec": round(n_docs / secs, 1)}
    os.makedirs(RESULTS, exist_ok=True)
    with open(f"{RESULTS}/{cores}.json", "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))
    spark.stop()


def run_once(master: str, in_dir: str, out_dir: str, tag: str) -> None:
    """One warmup + ONE timed run, result JSON to
    {RESULTS}/once_{cores}_{tag}.json — the building block of the
    paired protocol below."""
    cores = int(master.split("[")[1].rstrip("]"))
    canary0 = _canary(cores)
    spark = _session(master, cores)
    spark.sparkContext.setLogLevel("ERROR")
    from document_parser_spark.plans.pipeline import extract

    n_docs = spark.read.parquet(in_dir).count()

    def job(t: str) -> float:
        shutil.rmtree(f"{out_dir}/{t}", ignore_errors=True)
        t0 = time.time()
        extract(spark.read.parquet(in_dir)) \
            .write.mode("overwrite").parquet(f"{out_dir}/{t}")
        return time.time() - t0

    job("warmup")
    secs = job("timed")
    out = {"master": master, "cores": cores, "n_docs": n_docs,
           "wall_s": round(secs, 2),
           "canary_miters": [canary0, _canary(cores)],
           "docs_per_sec": round(n_docs / secs, 1)}
    os.makedirs(RESULTS, exist_ok=True)
    with open(f"{RESULTS}/once_{cores}_{tag}.json", "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))
    spark.stop()


def pair_protocol(n_small: int, n_big: int, rounds: int = 3) -> None:
    """PAIRED-SAMPLES variant for a host with episodic CPU steal: the
    two legs alternate in adjacent time windows (small, big, small,
    big, ...), each visit = fresh pinned session + warmup + one timed
    run, and the efficiency is the MEDIAN OF PER-DUO RATIOS. Running
    each leg's runs consecutively (the default protocol) lets a steal
    burst land entirely inside one leg's block and bias the pair —
    measured four times in round 4, always against the wide-mask leg.
    Pairing samples both legs under ~the same host state; a burst
    then degrades BOTH sides of its duo and the ratio survives.
    """
    me = os.path.abspath(__file__)
    env = dict(os.environ)
    duos = []
    for r in range(rounds):
        legs = {}
        for cores in (n_small, n_big):
            subprocess.run(
                ["taskset", "-c", f"0-{cores - 1}", sys.executable, me,
                 "run_once", f"local[{cores}]", INPUT_DIR,
                 f"/tmp/scaling_out_pair_{cores}", f"duo{r}"],
                check=True, env=env)
            with open(f"{RESULTS}/once_{cores}_duo{r}.json") as fh:
                legs[cores] = json.load(fh)
        eff = (legs[n_big]["docs_per_sec"]
               / legs[n_small]["docs_per_sec"]) / (n_big / n_small)
        duos.append({"round": r, "eff": round(eff, 3),
                     "small": legs[n_small], "big": legs[n_big]})
        print(f"duo {r}: eff={eff:.3f}")
    effs = sorted(d["eff"] for d in duos)
    med = effs[len(effs) // 2]
    summary = {"pair": f"{n_small}->{n_big}", "rounds": rounds,
               "duo_effs": effs, "median_eff": med,
               "protocol": "paired_interleaved_duos",
               "duos": duos}
    with open(f"{RESULTS}/pair_{n_small}_{n_big}.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("pair", "duo_effs", "median_eff")}))


def _pair_section(rn: dict, r4n: dict, label: str) -> tuple[str, float]:
    eff = (r4n["docs_per_sec"] / rn["docs_per_sec"]) / 4
    verdict = "PASS (>= 0.8)" if eff >= 0.8 else "FAIL (< 0.8)"
    # canary-implied hardware ceiling for this pair: what the same
    # pinned busy loop (pure compute, zero coordination) scaled N->4N
    # on the same masks in the same time window. Under hypervisor
    # steal the host itself stops scaling (measured: 8->32 busy-loop
    # ratio 3.2 during a burst vs 3.86 quiet) — the ceiling separates
    # "the job stopped scaling" from "the machine stopped scaling".
    ceiling_line = ""
    cn, c4n = rn.get("canary_miters"), r4n.get("canary_miters")
    if cn and c4n:
        ratio = ((sum(c4n) / len(c4n)) * r4n["cores"]) / (
            (sum(cn) / len(cn)) * rn["cores"])
        ceiling = ratio / 4
        ceiling_line = (
            f"\ncanary-implied hardware ceiling for this window: "
            f"{ceiling:.3f} (busy-loop {rn['cores']}->{r4n['cores']} "
            f"scaled {ratio:.2f}x); job-level efficiency = "
            f"{eff:.3f}/{ceiling:.3f} = {eff / ceiling:.3f}\n")
    md = f"""## {label}: {rn['master']} -> {r4n['master']}

| run | master | wall s (median) | all runs s | canary Miters/s (pre, post) | docs/sec |
|---|---|---|---|---|---|
| N  | {rn['master']}  | {rn['wall_s']} | {rn.get('runs_s')} | {rn.get('canary_miters')} | {rn['docs_per_sec']} |
| 4N | {r4n['master']} | {r4n['wall_s']} | {r4n.get('runs_s')} | {r4n.get('canary_miters')} | {r4n['docs_per_sec']} |

**scaling efficiency = ({r4n['docs_per_sec']} / {rn['docs_per_sec']}) / 4
= {eff:.3f}** — {verdict}
{ceiling_line}"""
    return md, eff


def all_protocol(n_docs: int) -> None:
    env = dict(os.environ)
    me = os.path.abspath(__file__)
    subprocess.run([sys.executable, me, "prepare", str(n_docs)], check=True,
                   env=env)
    masters = ("local[4]", "local[16]", "local[8]", "local[32]")
    for master in masters:
        cores = int(master.split("[")[1].rstrip("]"))
        # CONFINE the whole process tree (JVM task threads, GC/JIT
        # threads, forked Python UDF workers) to exactly N cpus.
        # Without the affinity mask an "N-core" leg is a fiction: the
        # 4-thread JVM's GC (sized for all 32 host cpus), compiler
        # threads and pyspark.daemon children spill onto the 28 idle
        # cores, inflating the small leg's throughput and
        # under-measuring scaling efficiency. taskset makes each leg a
        # true N-core machine — the same resource envelope an
        # N-executor cluster run would have (JDK>=10 sizes thread
        # pools from sched_getaffinity, so GC threads follow the mask
        # automatically).
        subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}",
             sys.executable, me, "run", master, INPUT_DIR,
             f"/tmp/scaling_out_{master.replace('[', '_').rstrip(']')}"],
            check=True, env=env)
    report()


def report() -> None:
    """Aggregate {RESULTS}/*.json into BENCH/BASELINE.md (separated
    from all_protocol so a single contention-poisoned leg can be
    re-run with `run` and the report regenerated without repeating
    the clean legs)."""
    r = {}
    for c in (4, 16, 8, 32):
        with open(f"{RESULTS}/{c}.json") as fh:
            r[c] = json.load(fh)
    primary, eff_p = _pair_section(r[4], r[16], "Primary pair (N=4)")
    secondary, _ = _pair_section(r[8], r[32], "Secondary pair (N=8)")
    md = f"""# BENCH — measured baseline (this repo)

Two-parallelism scaling evidence (north rule: eff >= 0.8 from N to 4N
executors). Protocol and the rationale for the N=4 primary pair (the
4N=32 run saturates every hardware core with executor threads + Python
UDF workers + GC, measuring host saturation rather than job
scalability) are in BASELINE.md §3. Identical job (read parquet ->
full extraction pipeline -> write parquet), same pre-materialized
input ({r[4]['n_docs']} synthetic interleaved docs, seed=42, 512
files), warm-up pass then median of 3 timed runs per level.

Each leg runs under ``taskset -c 0-(N-1)`` with heap = 1.5g x N
(cap 48g), so an "N-core" run is a true N-cpu machine: task threads,
GC/JIT threads and forked Python UDF workers all share exactly N cpus
and proportional memory — the same resource envelope N fixed-size
executors would have. (Without the mask the small leg's GC and Python
workers spill onto the idle cores and its throughput is inflated,
under-measuring scaling.)

Partitioning follows the Python-UDF cost, identically at every leg:
``spark.sql.files.maxPartitionBytes=8m`` and AQE
``advisoryPartitionSizeInBytes=8m`` (the parse stage costs ~2
core-seconds per input MB — ~100x a columnar scan — so 128m/64m
defaults produce 1-2 uneven waves at 4N and the stage goes
straggler-bound; measured with tools/profile_leg.py: the serialize
stage ran as 17 tasks = 41% utilization at 32 cores under the 64m
advisory). Output commit uses FileOutputCommitter v2 (task-side
renames; the v1 driver-side sequential rename is a fixed serial cost
the fast leg pays 4x more dearly).

The **canary** column is a pinned busy-loop (per-proc Miters/s on the
leg's own affinity mask) run immediately before and after each leg:
this host suffers episodic hypervisor CPU steal (measured 10x
task-time inflation during one burst), and the canary makes a
poisoned leg visible instead of silently skewing the pair — legs are
re-run when their canary deviates >15% from siblings. The per-pair
"hardware ceiling" derived from it is a POINT-SAMPLE estimate (the
canary runs at leg boundaries, the job runs between them), so
job-level efficiency above 1.0 simply means a burst straddled a
canary sample rather than the leg itself.

{primary}
{secondary}
Command lines:

    python tools/scaling_bench.py prepare {r[4]['n_docs']}
    taskset -c 0-3  python tools/scaling_bench.py run "local[4]"  {INPUT_DIR} /tmp/scaling_out_local_4
    taskset -c 0-15 python tools/scaling_bench.py run "local[16]" {INPUT_DIR} /tmp/scaling_out_local_16
    taskset -c 0-7  python tools/scaling_bench.py run "local[8]"  {INPUT_DIR} /tmp/scaling_out_local_8
    taskset -c 0-31 python tools/scaling_bench.py run "local[32]" {INPUT_DIR} /tmp/scaling_out_local_32
"""
    os.makedirs("BENCH", exist_ok=True)
    # preserve manually-appended sections (skew benches, protocol
    # notes) across rewrites: everything at/after the marker survives
    extra = ""
    try:
        with open("BENCH/BASELINE.md") as fh:
            old = fh.read()
        if EXTRA_MARK in old:
            extra = old[old.index(EXTRA_MARK):]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(md + ("\n" + extra if extra else ""))
    print(md)


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "prepare":
        prepare(int(sys.argv[2]))
    elif cmd == "run":
        run(sys.argv[2], sys.argv[3], sys.argv[4])
    elif cmd == "all":
        all_protocol(int(sys.argv[2]) if len(sys.argv) > 2 else 40000)
    elif cmd == "report":
        report()
    elif cmd == "run_once":
        run_once(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
    elif cmd == "pair":
        pair_protocol(int(sys.argv[2]), int(sys.argv[3]),
                      int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    else:
        raise SystemExit(f"unknown cmd {cmd}")
