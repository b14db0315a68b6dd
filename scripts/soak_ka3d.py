#!/usr/bin/env python
"""ka3d capacity soak: is nmax=32 overflow-safe once the glass leaves the
stratified-init transient?  Runs chunks of sweeps on the real TPU at a given
nmax, printing after each chunk the sticky overflow flag, atom count, and the
MAX cell occupancy — the statistic that decides whether the bench's nmax
default is honest at the 1k-sweep scale (the round-2 2D standard).

  python scripts/soak_ka3d.py --nmax 32 --chunks 10 --chunk 100
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nmax", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--moves", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--slot-group", type=int, default=2)
    ap.add_argument("--inv-newton", type=int, default=None,
                    help="match the bench's PL_INV_NEWTON so the soak "
                         "trajectory is the shipped config's")
    args = ap.parse_args()
    if args.inv_newton is not None:
        from mcjax.models import potentials as _pots
        _pots.PL_INV_NEWTON = args.inv_newton

    from mcjax.core.config import SimConfig
    from mcjax.models.mixtures import kob_andersen
    from mcjax.ops.cells import stratified_positions
    from mcjax.ops.mixture import init_mixture_state
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    ka = kob_andersen()
    rho = 1.2
    box = (args.n / rho) ** (1.0 / 3.0)
    cps = int(box // ka.r_cut)
    cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=args.n, box_length=box,
                    cells_per_side=cps, nmax=args.nmax, n_moves=args.moves,
                    proposal="gaussian", step_size=0.09, beta=1.0 / 0.8,
                    seed=args.seed)
    cfg.validate_against(ka.r_cut)
    spec = (jnp.arange(args.n) % 5 == 4).astype(jnp.int32)
    st = init_mixture_state(cfg, stratified_positions(cfg), spec)
    print(f"# nmax={args.nmax} cps={cps} mean_occ="
          f"{args.n / cps**3:.1f} init_max_occ={int(jnp.max(st.occ))}",
          flush=True)

    for c in range(args.chunks):
        t0 = time.perf_counter()
        st, m = run_sweeps_pallas(cfg, ka, st, args.chunk, 0, 128, False,
                                  False, 26, args.slot_group, True, True,
                                  8, True)
        mx = int(jnp.max(st.occ))
        atoms = int(jnp.sum(st.occ))
        ovf = bool(st.overflow)
        dt = time.perf_counter() - t0
        print(f"chunk {c}: sweeps {(c + 1) * args.chunk} max_occ {mx} "
              f"atoms {atoms} overflow {ovf} ({dt:.1f}s)", flush=True)
        if ovf:
            print("OVERFLOW — nmax too small at this scale")
            return 1
    print(f"PASS: no overflow in {args.chunks * args.chunk} sweeps at "
          f"nmax={args.nmax}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
