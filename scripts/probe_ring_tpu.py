#!/usr/bin/env python
"""Bisect the compiled-only ring-engine TPU worker fault (round 4).

The in-place ring engine (ops/pallas_ring.py) passes every interpret-mode
bitwise gate but crashed the TPU worker on the first real bench run
(2D 1M disks, fused defaults).  This probe runs ONE small compiled
configuration per invocation — a worker crash kills the client, so each
variant must be a fresh process:

    python scripts/probe_ring_tpu.py --sweeps 3 [--host-rng] [--xla-shift]
        [--cps 128] [--moves 2] [--tile-rows 16]

Prints one OK line with the final state checksum, or crashes with
UNAVAILABLE (record which variant did).
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cps", type=int, default=128)
    ap.add_argument("--moves", type=int, default=2)
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--tile-rows", type=int, default=16)
    ap.add_argument("--host-rng", action="store_true")
    ap.add_argument("--xla-shift", action="store_true")
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--slot-group", type=int, default=1)
    ap.add_argument("--fused", action="store_true",
                    help="run the round-3 fused engine instead (control)")
    args = ap.parse_args()

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere

    cps = args.cps
    box = 2.0 * cps
    n = int(0.5 * box * box / (np.pi * 0.25))
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=7, n_moves=args.moves, proposal="uniform",
                    step_size=0.25, beta=1.0, seed=11)
    pot = HardSphere(1.0)
    state = init_state(cfg)

    if args.fused:
        from mcjax.ops.pallas_sweep import run_sweeps_fused
        st, m = run_sweeps_fused(cfg, pot, state, args.sweeps,
                                 args.tile_rows, 128, False, args.unroll,
                                 args.slot_group, not args.host_rng, 0, None)
    else:
        from mcjax.ops.pallas_ring import run_sweeps_ring
        st, m = run_sweeps_ring(cfg, pot, state, args.sweeps,
                                args.tile_rows, 128, False, args.unroll,
                                args.slot_group, not args.host_rng, 0, None,
                                not args.xla_shift)
    acc = int(np.sum(np.asarray(m.accepted)))
    s = float(jnp.sum(st.pos))  # forces completion through the tunnel
    print(f"OK n={n} sweeps={args.sweeps} acc={acc} possum={s:.6f} "
          f"overflow={bool(st.overflow)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
