"""Quiet-window launcher for the paired scaling protocol.

Round-5 twin of bench.py's publication gate (r4 VERDICT "what's
wrong" #1): the paired-duo protocol survives a steal BURST landing
inside one duo, but not a sustained multi-minute steal REGIME — the
wide leg saturates the host and compounds with the steal, so the
whole pair reads artificially low (measured this round: duo effs
[0.16, 0.334, 0.837] with canaries at 3.2-4.3 vs quiet 7.0-7.3).
This wrapper polls the shared canary until the host reads at least
GATE x QUIET (the same 0.85 x 7.0 bar bench.py publishes against),
then hands off to ``scaling_bench.py pair``. If the window never
opens within --max-wait, it runs anyway and the per-leg canaries in
the result JSON disclose the regime.

The probe runs AT THE WIDTH OF THE WIDE LEG (n_big procs), not 8:
this host's steal is an aggregate-cpu cap (~27 core-equivalents when
it bites — BENCH/BASELINE.md round-4 notes item 7), so an 8-wide
probe fits under the cap and reads quiet while a 32-wide leg is
still capped. Measured failure mode of the 8-wide gate, three times
in round 5: gate opens at 6.22-6.40 on 8 procs, the 32-leg then
reads 3.9-5.3. A 32-wide probe reads ~5.9 capped vs ~6.7-7.0 quiet,
so the same 0.85-0.90 x 7.0 bar separates the regimes at full width.

Usage:
    python tools/gated_pair.py <n_small> <n_big> [rounds] [max_wait_s]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.steal_canary import DEFAULT_GATE, QUIET_MITERS, canary

QUIET = QUIET_MITERS
GATE = float(os.environ.get("GATED_PAIR_GATE", str(DEFAULT_GATE)))
# when set, a gate timeout aborts (exit 3) instead of running anyway —
# for watchers near a deadline where a forced capped-regime duo would
# collide with other measurements rather than inform
NORUN = (os.environ.get("GATED_PAIR_NORUN_ON_TIMEOUT", "").strip().lower()
         not in ("", "0", "false", "no"))
POLL_S = 120


def main() -> None:
    n_small, n_big = int(sys.argv[1]), int(sys.argv[2])
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    max_wait = float(sys.argv[4]) if len(sys.argv) > 4 else 3600.0
    t0 = time.time()
    while True:
        reading = canary(n_big, 2.0)
        ok = reading >= GATE * QUIET
        waited = time.time() - t0
        print(f"canary {reading} ({'quiet' if ok else 'steal window'}),"
              f" waited {waited:.0f}s", flush=True)
        if ok or waited >= max_wait:
            if not ok:
                if NORUN:
                    print("gate timed out — NORUN mode, aborting without"
                          " a run", flush=True)
                    sys.exit(3)
                print("gate timed out — running anyway; per-leg canaries"
                      " will disclose the regime", flush=True)
            break
        time.sleep(POLL_S)
    me = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "scaling_bench.py")
    subprocess.run([sys.executable, me, "pair",
                    str(n_small), str(n_big), str(rounds)], check=True)


if __name__ == "__main__":
    main()
