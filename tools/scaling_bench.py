"""Run the scaling workload at N and 4N cores (separate JVMs) and
report throughput + scaling efficiency (north_rule criterion:
efficiency ≥ 0.8 from N → 4N).

Usage: python tools/scaling_bench.py [N] [4N]   (default 8 32)
Appends a results table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_workload.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = run_at(n)
    hi = run_at(n4)
    factor = n4 / n
    lines = [
        "",
        f"## Scaling run: local[{n}] vs local[{n4}] (N vs {factor:g}N cores)",
        "",
        "| workload | rows | local[%d] rows/s | local[%d] rows/s | speedup | efficiency |" % (n, n4),
        "|---|---|---|---|---|---|",
    ]
    for wl in ("parse", "dedup", "agg"):
        a, b = lo[wl], hi[wl]
        speed = b["rows_per_sec"] / a["rows_per_sec"]
        eff = speed / factor
        lines.append(
            f"| {wl} | {a['rows']} | {a['rows_per_sec']} | {b['rows_per_sec']} "
            f"| {speed:.2f}x | {eff:.2f} |"
        )
    out = "\n".join(lines) + "\n"
    print(out)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
