"""Parallel-scaling probe (VERDICT r11 #6).

The curated sf0.1 bench is overhead-bound (~0.3–5 s of work per query
against ~1.5 s of fixed plan/schedule cost), so its 8-core and 32-core
totals are ≈ equal and the driver's PERF.scaling block can never show
parallelism at that SF. This probe measures kernels that ARE
compute-bound — the 10–20M-row scale-smoke workloads — once per core
count, in fresh subprocesses with SPARK_GRAFT_CPUS set, and writes
per-kernel sec@<low> / sec@<high> with the speedup ratio.

Usage: python tools/scale_probe.py [out.json] [low_cpus] [high_cpus]

Each smoke prints ONE JSON line with a "timings" dict; generation /
assert overheads inside the smokes are included in their per-kernel
timings only where the smoke already times the operator alone.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

#: (label, argv) — kernels chosen for compute-bound behavior at scale:
#: 12M-edge graph iterations + basket/LM/BM25 (ops), 4M-row two-phase
#: rank under 90% skew (rank), 20M-row sketches + BFS (sketch).
SMOKES = [
    ("ops", [sys.executable, os.path.join(HERE, "scale_smoke_ops.py"),
             "/root/testdata/sf0.1", "10"]),
    ("rank", [sys.executable, os.path.join(HERE, "scale_smoke_rank.py"),
              "4000000"]),
    ("sketch", [sys.executable, os.path.join(HERE, "scale_smoke_sketch.py")]),
]


def _run(argv: list[str], cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    t0 = time.time()
    proc = subprocess.run(
        argv, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
    )
    wall = round(time.time() - t0, 3)
    payload = {}
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                payload = json.loads(ln)
            except json.JSONDecodeError:
                continue
    return {"rc": proc.returncode, "wall": wall,
            "timings": payload.get("timings", payload)}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json"
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    result: dict = {"low_cpus": low, "high_cpus": high, "kernels": {}}
    for label, argv in SMOKES:
        per = {}
        for cpus in (high, low):
            print(f"[scale_probe] {label} @ {cpus} cpus ...", flush=True)
            per[cpus] = _run(argv, cpus)
        tl, th = per[low]["timings"], per[high]["timings"]
        for k in sorted(set(tl) & set(th)):
            a, b = tl.get(k), th.get(k)
            if not isinstance(a, (int, float)) or not isinstance(
                b, (int, float)
            ) or b <= 0:
                continue
            result["kernels"][f"{label}:{k}"] = {
                f"sec@{low}": a, f"sec@{high}": b,
                "speedup": round(a / b, 2),
            }
        result["kernels"][f"{label}:__wall__"] = {
            f"sec@{low}": per[low]["wall"], f"sec@{high}": per[high]["wall"],
            "speedup": round(per[low]["wall"] / max(per[high]["wall"], 1e-9), 2),
            "rc": [per[low]["rc"], per[high]["rc"]],
        }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["kernels"], indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
