"""Canary-gated corpus-size tier sweep (BENCH/BASELINE.md
"Corpus-size tier sweep"): extraction docs/sec at a fixed width
(local[32]) while the corpus grows 10k -> 100k -> 1M -> 4M synthetic
interleaved docs. Full pipeline per tier (read parquet -> extract ->
write parquet), warmup + one timed run, pre/post canaries bracketing
the timed leg; each tier's prepare+run block waits for a quiet
window first (same 0.85 x quiet bar bench.py publishes against), so
a steal regime delays the sweep instead of poisoning a tier.

Usage:
    python tools/tier_sweep.py [n_docs ...]   # default 10k 100k 1M 4M
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.steal_canary import DEFAULT_GATE as GATE, QUIET_MITERS, canary

MAX_WAIT_S = 4800
POLL_S = 120
WIDTH = 32
SB = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                  "scaling_bench.py")
INPUT_DIR = "/tmp/scaling_input"
OUT_DIR = "/tmp/tier_out"
RESULTS = "/tmp/scaling_results"


def wait_quiet() -> float:
    t0 = time.time()
    while True:
        c = canary(WIDTH, 2.0)
        if c >= GATE * QUIET_MITERS:
            return c
        if time.time() - t0 > MAX_WAIT_S:
            print(f"gate timed out, proceeding contended (canary {c})",
                  flush=True)
            return c
        print(f"canary {c} < {GATE * QUIET_MITERS:.2f}, waiting...",
              flush=True)
        time.sleep(POLL_S)


def main() -> None:
    tiers = [int(a) for a in sys.argv[1:]] or \
        [10_000, 100_000, 1_000_000, 4_000_000]
    for n in tiers:
        c = wait_quiet()
        print(f"tier {n}: gate opened at canary {c}", flush=True)
        subprocess.run([sys.executable, SB, "prepare", str(n)], check=True)
        subprocess.run(
            ["taskset", "-c", f"0-{WIDTH - 1}", sys.executable, SB,
             "run_once", f"local[{WIDTH}]", INPUT_DIR, OUT_DIR,
             f"tier{n}"], check=True)
        with open(f"{RESULTS}/once_{WIDTH}_tier{n}.json") as fh:
            print("TIER_RESULT", json.dumps(json.load(fh)), flush=True)
    print("SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
