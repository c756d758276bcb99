"""Run N back-to-back bench sweeps, saving each JSON line plus a
loadavg stamp, and print the per-query MIN and MEDIAN across sweeps —
the structural cross-sweep reading the r16 host (bursty hypervisor
contention invisible to the cal loop) forces.

Usage: python tools/sweep_campaign.py N OUT_PREFIX
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep"
    per_q: dict[str, list[float]] = {}
    metas = []
    for i in range(n):
        load0 = open("/proc/loadavg").read().split()[0]
        out = subprocess.run(
            [sys.executable, "bench.py"],
            capture_output=True, text=True,
        ).stdout
        load1 = open("/proc/loadavg").read().split()[0]
        line = [ln for ln in out.splitlines() if ln.startswith('{"metric"')]
        if not line:
            print(f"sweep {i}: NO JSON (crash?)")
            continue
        d = json.loads(line[-1])
        with open(f"{prefix}_{i}.json", "w") as f:
            f.write(line[-1])
        metas.append(
            (i, d["value"], d["host_cal_sec"], d["host_cal_par_sec"], load0, load1)
        )
        print(
            f"sweep {i}: total={d['value']} cal={d['host_cal_sec']} "
            f"par={d['host_cal_par_sec']} load {load0}->{load1}", flush=True,
        )
        for k, v in d["queries"].items():
            per_q.setdefault(k, []).append(v)
    print("\nper-query across sweeps (min / median):")
    tot_min = tot_med = 0.0
    for k, vs in per_q.items():
        tot_min += min(vs)
        tot_med += statistics.median(vs)
        print(f"{min(vs):8.3f} {statistics.median(vs):8.3f}  {k}")
    print(f"\nTOTAL of per-query mins: {tot_min:.3f}")
    print(f"TOTAL of per-query medians: {tot_med:.3f}")


if __name__ == "__main__":
    main()
