#!/usr/bin/env python
"""One-process ka3d config scan at nmax=34 (the soak-proven capacity).

Round-5 state: n34 + frozen + sg2 + inv1 + tr-auto(8) measures 9.70e7 —
3% under the >=1e8 bar.  Axon compiles are per-process (~4 min each), so
this scans the remaining static knobs in ONE process: slot_group, an
explicit tile_rows=16, and the half neighbor-unroll.  Timing pattern is
bench_ka3d's (warm call with the SAME static signature, then the timed
call; CLAUDE.md rules).

  python scripts/scan_ka3d.py --nmax 34 --sweeps 30
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
    ap.add_argument("--nmax", type=int, default=34)
    ap.add_argument("--sweeps", type=int, default=30)
    ap.add_argument("--moves", type=int, default=60)
    ap.add_argument("--inv-newton", type=int, default=1)
    ap.add_argument("--configs", type=str,
                    default="8:2:26,8:1:26,8:4:26,16:2:26,8:2:13",
                    help="comma list of tile_rows:slot_group:unroll")
    args = ap.parse_args()
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
                    seed=0)
    cfg.validate_against(ka.r_cut)
    spec = (jnp.arange(args.n) % 5 == 4).astype(jnp.int32)
    st0 = init_mixture_state(cfg, stratified_positions(cfg), spec)
    _ = float(jnp.sum(st0.pos))
    print(f"# nmax={args.nmax} cps={cps} sweeps={args.sweeps} "
          f"inv_newton={args.inv_newton}", flush=True)

    for spec_s in args.configs.split(","):
        tr, sg, un = (int(x) for x in spec_s.split(":"))

        def run(st):
            return run_sweeps_pallas(cfg, ka, st, args.sweeps, tr, 128,
                                     False, False, un, sg, True, True,
                                     8, True)

        try:
            t0 = time.perf_counter()
            st, m = run(st0)
            _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st.pos))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            st2, m = run(st)
            _ = float(jnp.sum(m.delta_e)) + float(jnp.max(st2.pos))
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — record and scan on
            print(f"tr{tr} sg{sg} un{un}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        import numpy as np
        proposed = int(np.sum(np.asarray(m.proposed, np.int64)))
        acc = int(np.sum(np.asarray(m.accepted, np.int64)))
        print(f"tr{tr} sg{sg} un{un}: {proposed / dt:.4e} moves/s "
              f"({dt:.3f}s timed, {tc:.0f}s incl-compile, "
              f"acc {acc / max(proposed, 1):.3f}, "
              f"overflow {bool(st2.overflow)})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
