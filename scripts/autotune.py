#!/usr/bin/env python
"""Kernel parameter scan on the real TPU — resumable, one JSON line per
combo (docs/ROADMAP.md perf item: profile-guided tile autotuning).

Each combination runs as a fresh ``bench.py`` subprocess so a Mosaic crash
or a dropped axon tunnel only loses one point; the persistent compilation
cache (JAX_COMPILATION_CACHE_DIR) makes re-runs and resumes cheap. Results
append to ``--out`` (JSONL); combos already present are skipped, so the
scan is restartable with the same command.

Usage:
  python scripts/autotune.py --workload lj3d --out tune_lj3d.jsonl
  python scripts/autotune.py --workload hard-disk --grid small
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# parameter grids per workload: (flag combos that plausibly move the needle)
GRIDS = {
    "hard-disk": {
        "small": {"tile-rows": [16, 32], "slot-group": [1, 2],
                  "moves": [64]},
        "full": {"tile-rows": [8, 16, 32, 64], "slot-group": [1, 2, 4],
                 "moves": [8, 64]},
    },
    "lj3d": {
        "small": {"tile-rows": [8, 16], "slot-group": [2, 4],
                  "neighbor-unroll": [1, 2], "moves": [60]},
        "full": {"tile-rows": [8, 16, 32], "slot-group": [1, 2, 4, 8],
                 "neighbor-unroll": [1, 2, 13, 26], "moves": [15, 60]},
        # gaussian-proposal draw cost: Irwin-Hall K (in-kernel RNG only)
        "ihk": {"ih-k": [6, 8, 12], "neighbor-unroll": [26],
                "moves": [15, 60]},
    },
    "ka3d": {
        "small": {"tile-rows": [8, 16], "slot-group": [4, 8], "moves": [60]},
        "full": {"tile-rows": [8, 16, 32], "slot-group": [2, 4, 8],
                 "neighbor-unroll": [1, 2], "moves": [15, 60]},
    },
}

# explicit on/off pairs — workload defaults already pick the measured
# winners (bench.py:305-315), so spell both sides out
BOOL_FLAGS = {
    "hard-disk": [["--no-fused", "--host-rng"],
                  ["--fused", "--in-kernel-rng"]],
    "lj3d": [["--host-rng"], ["--in-kernel-rng"]],
    "ka3d": [["--host-rng"]],
}


def combo_key(workload, flags):
    return json.dumps({"workload": workload, "flags": sorted(flags)},
                      sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="lj3d",
                    choices=sorted(GRIDS))
    ap.add_argument("--grid", default="small",
                    help="grid name within the workload (small/full/...)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sweeps", type=int, default=None,
                    help="override the bench's timed sweep count")
    ap.add_argument("--n", type=int, default=None,
                    help="override the bench's atom count")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-combo wall clock cap (remote compiles are "
                         "minutes; a full 3D unroll can be tens)")
    args = ap.parse_args()
    out_path = args.out or os.path.join(
        REPO, f"tune_{args.workload}_{args.grid}.jsonl")

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["key"])
                except (json.JSONDecodeError, KeyError):
                    pass

    try:
        grid = GRIDS[args.workload][args.grid]
    except KeyError:
        ap.error(f"unknown grid {args.grid!r} for {args.workload}; "
                 f"have: {sorted(GRIDS[args.workload])}")
    names = sorted(grid)
    combos = []
    for values in itertools.product(*(grid[k] for k in names)):
        base = [f"--{k}={v}" for k, v in zip(names, values)]
        extras = BOOL_FLAGS[args.workload]
        if "ih-k" in grid:  # Irwin-Hall K only exists on the in-kernel path
            extras = [e for e in extras if "--host-rng" not in e]
        for extra in extras:
            combos.append(base + list(extra))

    print(f"# {len(combos)} combos, {len(done)} already done -> {out_path}",
          file=sys.stderr)
    best = None
    for flags in combos:
        key = combo_key(args.workload, flags)
        if key in done:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--workload", args.workload, *flags]
        if args.sweeps:
            cmd += ["--sweeps", str(args.sweeps)]
        if args.n:
            cmd += ["--n", str(args.n)]
        print("#", " ".join(cmd), file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, cwd=REPO)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith("{")), None)
            rec = {"key": key, "flags": flags, "rc": p.returncode,
                   "wall_s": round(time.time() - t0, 1)}
            if line:
                rec.update(json.loads(line))
            else:
                rec["stderr_tail"] = p.stderr[-500:]
        except subprocess.TimeoutExpired:
            rec = {"key": key, "flags": flags, "rc": -1, "timeout": True,
                   "wall_s": round(time.time() - t0, 1)}
        with open(out_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        v = rec.get("value")
        if v and (best is None or v > best[0]):
            best = (v, flags)
        print(f"#   -> {v if v else 'FAILED'} ({rec['wall_s']}s)",
              file=sys.stderr, flush=True)
    if best:
        print(json.dumps({"best_value": best[0], "best_flags": best[1]}))


if __name__ == "__main__":
    main()
