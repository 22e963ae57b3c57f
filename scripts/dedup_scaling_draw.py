"""Run one dedup-family scaling draw (2-core leg then 8-core leg, each a
fresh pinned JVM via bench.py --scale-job-dedup) and append a labeled
record to BENCH/SCALING_HISTORY.jsonl — the isolated per-leg protocol from
BENCH/BASELINE.md for banking clean-window k=256 era draws without paying
a full --scaling invocation.

Usage: python scripts/dedup_scaling_draw.py "<label>"
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(cores: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py", "--scale-job-dedup", cores],
        cwd=REPO, check=True, capture_output=True, text=True).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    print(f"# dedup local[{cores}]: {rec}", file=sys.stderr, flush=True)
    return rec


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "dedup-only draw"
    legs = {c: leg(c) for c in ("2", "8")}
    assert legs["2"]["survivors"] == legs["8"]["survivors"], legs
    eff = round((legs["2"]["seconds"] / legs["8"]["seconds"]) / 4, 3)
    probes = {f"dedup_{c}": legs[c].get("probe_8core_sec") for c in legs}
    rec = {
        "label": label,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "dedup_eff_2_to_8": eff,
        "era": "k256",
        "dedup_legs_steady": {c: legs[c]["seconds"] for c in legs},
        "probes": probes,
        "probe_worst": max(v for v in probes.values() if v is not None),
        "survivors": legs["2"]["survivors"],
    }
    with open(os.path.join(REPO, "BENCH/SCALING_HISTORY.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
