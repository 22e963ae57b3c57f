"""Unattended clean-window campaign for k=256 dedup scaling draws.

Loops scripts/dedup_scaling_draw.py with the first-leg steal gate until
TARGET_CLEAN draws with window_degraded=false have been banked (or the
attempt budget runs out). Aborted attempts (degraded first leg, exit 2)
sleep RETRY_SLEEP_S and retry — each abort still appends its window
sample to BENCH/SCALING_HISTORY.jsonl, so the campaign leaves an honest
trail either way. Run inside tmux so it survives the driving session.

Usage: python scripts/scaling_campaign.py [target_clean] [max_attempts]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET_CLEAN = int(sys.argv[1]) if len(sys.argv) > 1 else 2
MAX_ATTEMPTS = int(sys.argv[2]) if len(sys.argv) > 2 else 14
RETRY_SLEEP_S = 180


def main() -> None:
    era = os.environ.get("CAMPAIGN_ERA", "k256")
    start = int(os.environ.get("CAMPAIGN_START_ATTEMPT", "2"))
    clean = 0
    for attempt in range(start, start + MAX_ATTEMPTS):
        # No gates at all in the final protocol: every covariate gate
        # misfired against recorded leg capability (attempt 14: 66.9 s
        # leg aborted on a 0.95 s probe; attempt 16: min-of-4 dug out a
        # healthy 72.2 s minimum at 0.214% steal and was aborted anyway).
        # The min-of-N estimator is the robustness now — draws run to
        # completion and steal/probes are recorded per leg so degraded
        # conditions stay visible rather than censoring the sample.
        shape = os.environ.get("LLS_DRAW_CORES", "8,2,8").replace(",", "-")
        label = (f"r5 campaign attempt {attempt} "
                 f"({era} min-of-N {shape}, ungated)")
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "scripts/dedup_scaling_draw.py", label,
             "--era", era],
            cwd=REPO, capture_output=True, text=True)
        dt = time.time() - t0
        tail = p.stdout.strip().splitlines()
        rec = json.loads(tail[-1]) if tail else {}
        eff = next((v for k, v in rec.items()
                    if k.startswith("dedup_eff_")), None)
        status = ("ABORT(degraded first leg)" if p.returncode == 2 else
                  "ERROR" if p.returncode != 0 else
                  "DEGRADED" if rec.get("window_degraded") else "CLEAN")
        print(f"[campaign] attempt {attempt}: {status} in {dt:.0f}s "
              f"eff={eff} "
              f"steal_worst={rec.get('steal_worst')}", flush=True)
        if p.returncode not in (0, 2):
            print(p.stderr[-2000:], flush=True)
        # a COMPLETED min-of-N draw counts toward the target: the
        # estimator (not a window flag) carries the robustness, and the
        # per-leg steal/probe stay recorded on every draw either way
        if p.returncode == 0 and eff is not None:
            clean += 1
            if clean >= TARGET_CLEAN:
                print(f"[campaign] done: {clean} completed min-of-N "
                      f"draws banked", flush=True)
                return
        if p.returncode == 2:
            time.sleep(RETRY_SLEEP_S)
    print(f"[campaign] attempt budget exhausted with {clean} completed "
          f"draws", flush=True)


if __name__ == "__main__":
    main()
