#!/usr/bin/env python
"""Sweep TAXOEXPAN_VMEM_CAP_MB on the real chip to find the fastest Pallas
tile configuration for the MAG-CS bench shape (VERDICT r1 weak #3: the 10 MB
default caps the backward at TB=16 and may be leaving 2x on the table on a
128 MiB-VMEM v5e).

Each cap is measured in a fresh subprocess (the cap is read at trace time, so
a new cap means a new kernel compile; the persistent cache makes repeats
free). Prints one line per cap and a final best.

Usage: python scripts/vmem_cap_sweep.py [--caps 10,24,48,80] [--steps 16]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cap_mb: int, steps: int, extra: list[str],
            bwd_cap_mb: int | None = None) -> dict:
    env = dict(os.environ, TAXOEXPAN_VMEM_CAP_MB=str(cap_mb))
    if bwd_cap_mb is not None:
        env["TAXOEXPAN_VMEM_CAP_BWD_MB"] = str(bwd_cap_mb)
    cmd = [sys.executable, "bench.py", "--skip-baseline",
           "--steps", str(steps)] + extra
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=3600)
    out = {"cap_mb": cap_mb, "bwd_cap_mb": bwd_cap_mb, "rc": r.returncode}
    m = re.search(r"# star: ([\d.]+) ms/step", r.stderr)
    if m:
        out["ms_per_step"] = float(m.group(1))
    try:
        out.update(json.loads(r.stdout.strip().splitlines()[-1]))
    except Exception:
        out["stderr_tail"] = r.stderr[-1500:]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--caps", default="10,24,48,80")
    p.add_argument("--bwd_caps", default=None,
                   help="comma list; when given, runs the full 2-D "
                        "fwd-cap x bwd-cap grid (VERDICT r2 #3)")
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("extra", nargs="*", help="extra bench.py flags")
    args = p.parse_args()
    results = []
    bwd_caps = ([int(c) for c in args.bwd_caps.split(",")]
                if args.bwd_caps else [None])
    for cap in (int(c) for c in args.caps.split(",")):
        for bwd in bwd_caps:
            res = run_one(cap, args.steps, args.extra, bwd_cap_mb=bwd)
            print(json.dumps(res), flush=True)
            results.append(res)
    timed = [r for r in results if "ms_per_step" in r]
    if timed:
        best = min(timed, key=lambda r: r["ms_per_step"])
        print(f"# best: cap={best['cap_mb']} MB (bwd "
              f"{best['bwd_cap_mb']}) at "
              f"{best['ms_per_step']} ms/step", flush=True)


if __name__ == "__main__":
    main()
