#!/usr/bin/env python
"""Fused-kernel cost attribution on the real TPU by compiled ablations.

The axon tunnel exposes no jax profiler, so stage costs are measured by
compiling kernel variants with one stage disabled (pallas_sweep.ABLATE) and
differencing wall times.  Each variant runs in a FRESH SUBPROCESS: ABLATE is
read at trace time and is deliberately not part of any jit cache key.

  python scripts/profile_fused.py --workload hd2d --moves 8
  python scripts/profile_fused.py --workload lj3d --moves 15 --variants none,rng,pairs

Ablated variants compute garbage physics (positions stay finite — the
in-cell rejection bounds them — but accept decisions are meaningless);
only the wall time matters.  Variants:
  none     production kernel (the baseline)
  nm1      production kernel at n_M=1 (fixed-cost anchor)
  rng      in-kernel PRNG draws replaced by a constant plane
  pairs    move loop without any pair work
  compose  neighbor window composition skipped (scratch garbage)
  rolls    windows copied without rotations/edge corrections
  dma      apron DMAs skipped (scratch garbage)
  kernel   DMA in + copy own planes out (no compose, no moves)
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import json, math, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
spec = json.loads(sys.argv[1])
from mcjax.ops import pallas_sweep as ps
ps.ABLATE = spec["ablate"]
from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.cells import stratified_positions

wl, n_m, sweeps = spec["workload"], spec["moves"], spec["sweeps"]
if wl == "hd2d":
    n, phi = 1_048_576, 0.5
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0); cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=7, n_moves=n_m, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    state = init_state(cfg)
    tr, sg, un = 16, 1, 2
elif wl == "lj3d":
    n, rho = 1_000_000, 0.8
    box = (n / rho) ** (1.0 / 3.0)
    cps = int(box // 2.5); cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=24, n_moves=n_m, proposal="gaussian",
                    step_size=0.12, beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    state = init_state(cfg, positions=stratified_positions(cfg))
    tr, sg, un = 16, 2, 26
elif wl == "ka3d":
    from mcjax.models.mixtures import kob_andersen
    from mcjax.ops.mixture import init_mixture_state
    pot = kob_andersen()
    n, rho = 1_000_000, 1.2
    box = (n / rho) ** (1.0 / 3.0)
    cps = int(box // pot.r_cut); cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=38, n_moves=n_m, proposal="gaussian",
                    step_size=0.09, beta=1.0 / 0.8, seed=0)
    spec_arr = (jnp.arange(n) % 5 == 4).astype(jnp.int32)
    state = init_mixture_state(cfg, stratified_positions(cfg), spec_arr)
    tr, sg, un = 0, 4, 26
else:
    raise SystemExit(f"unknown workload {wl}")
tr = spec.get("tile_rows") or tr
sg = spec.get("slot_group") or sg
un = spec.get("unroll") or un

if spec.get("engine") == "ring":
    from mcjax.ops.pallas_ring import run_sweeps_ring
    def run(st):
        st, m = run_sweeps_ring(cfg, pot, st, sweeps, tr, 128, False, un,
                                sg, True, spec.get("ih_k", 0), None,
                                not spec.get("xla_shift", False))
        return st, m
else:
    from mcjax.ops.pallas_sweep import run_sweeps_pallas
    def run(st):
        st, m = run_sweeps_pallas(cfg, pot, st, sweeps, tr, 128, False,
                                  False, un, sg, True, True,
                                  spec.get("ih_k", 0),
                                  spec.get("frozen", False))
        return st, m

t0 = time.perf_counter()
st, m = run(state)
_ = float(jnp.sum(m.delta_e)) + float(jnp.max(st.pos))
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
st2, m = run(st)
_ = float(jnp.sum(m.delta_e)) + float(jnp.max(st2.pos))
dt = time.perf_counter() - t0
import numpy as np
proposed = int(np.sum(np.asarray(m.proposed, np.int64)))
print(json.dumps({
    "variant": spec["name"], "ablate": spec["ablate"], "workload": wl,
    "moves": n_m, "sweeps": sweeps, "wall_s": dt,
    "ms_per_sweep": dt / sweeps * 1e3,
    "moves_per_s": proposed / dt if proposed else 0.0,
    "compile_s": t_compile,
}))
'''

VARIANTS = {
    "none": "", "rng": "rng", "pairs": "pairs", "compose": "compose",
    "rolls": "rolls", "dma": "dma", "kernel": "kernel",
    "call": "call", "ringup": "ringup", "shift": "shift",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["hd2d", "lj3d", "ka3d"],
                    default="hd2d")
    ap.add_argument("--frozen-cache", action="store_true",
                    help="classic/fused engine: ablate the shipped "
                         "frozen-neighbor-cache configuration")
    ap.add_argument("--moves", type=int, default=8)
    ap.add_argument("--sweeps", type=int, default=100)
    ap.add_argument("--tile-rows", type=int, default=0)
    ap.add_argument("--slot-group", type=int, default=0)
    ap.add_argument("--unroll", type=int, default=0)
    ap.add_argument("--ih-k", type=int, default=0)
    ap.add_argument("--engine", choices=["fused", "ring"], default="fused")
    ap.add_argument("--xla-shift", action="store_true",
                    help="ring engine: keep the XLA merge shift")
    ap.add_argument("--variants", type=str,
                    default="none,nm1,rng,pairs,rolls,compose,dma,kernel,call,ringup,shift")
    args = ap.parse_args()

    results = []
    for name in args.variants.split(","):
        name = name.strip()
        if name == "nm1":
            spec = {"name": "nm1", "ablate": "", "moves": 1}
        elif name in VARIANTS:
            spec = {"name": name, "ablate": VARIANTS[name],
                    "moves": args.moves}
        else:
            print(f"## unknown variant {name}, skipping", file=sys.stderr)
            continue
        spec.update(workload=args.workload, sweeps=args.sweeps,
                    tile_rows=args.tile_rows, slot_group=args.slot_group,
                    unroll=args.unroll, ih_k=args.ih_k,
                    engine=args.engine, xla_shift=args.xla_shift,
                    frozen=args.frozen_cache)
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        p = subprocess.run([sys.executable, "-c", CHILD, json.dumps(spec)],
                           capture_output=True, text=True, env=env, cwd=REPO)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode or not line:
            print(f"## variant {name} FAILED rc={p.returncode}\n"
                  f"{p.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        rec["engine"] = args.engine
        results.append(rec)
        print(json.dumps(rec), flush=True)

    base = next((r for r in results if r["variant"] == "none"), None)
    if base:
        print(f"\n## baseline {base['ms_per_sweep']:.3f} ms/sweep "
              f"({base['moves_per_s']:.3e} moves/s)")
        for r in results:
            if r["variant"] in ("none",):
                continue
            d = base["ms_per_sweep"] - r["ms_per_sweep"]
            print(f"## {r['variant']:>8}: {r['ms_per_sweep']:.3f} ms/sweep "
                  f"(delta {d:+.3f} ms = {d / base['ms_per_sweep'] * 100:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
