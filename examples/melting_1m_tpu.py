"""BASELINE config 5 (single-chip form): 1M hard-disk melting sweep.

Scans packing fraction through the 2D hard-disk melting region
(phi ~ 0.70-0.72; Bernard & Krauth, PRL 107, 155704 (2011)) at N = 2^20,
tracking the equation of state Z(phi). In the coexistence region the EOS
develops the characteristic flattening (Mayer-Wood loop at finite N).

Run on a TPU (Pallas engine). On a pod, wrap with parallel.mesh domain
sharding — same sweep code. Expect a few minutes per phi point.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math
import sys
import time

import numpy as np


def run_point(n, phi, sweeps_eq, snaps, sweeps_between, seed=0):
    import jax.numpy as jnp

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.ops import cells
    from mcjax.ops.pallas_sweep import run_sweeps_pallas
    from mcjax.utils import observables

    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=8, proposal="uniform",
                    step_size=0.08, beta=1.0, seed=seed)
    pot = HardSphere(1.0)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg)

    t0 = time.perf_counter()
    state, m = run_sweeps_pallas(cfg, pot, state, sweeps_eq)
    _ = float(jnp.sum(m.delta_e))
    frames = []
    acc = prop = 0
    for _ in range(snaps):
        state, m = run_sweeps_pallas(cfg, pot, state, sweeps_between)
        acc += int(jnp.sum(m.accepted))
        prop += int(jnp.sum(m.proposed))
        frames.append((state.pos, state.occ))
    # cell-list contact histogram: O(N), fine at N=1M (the O(N^2) variant
    # would need half a trillion pair distances)
    z = observables.hard_disk_eos_state(cfg, frames, 1.0)
    psi6 = float(observables.psi6_cells(cfg, state.pos, state.occ))
    dt = time.perf_counter() - t0
    assert not bool(state.overflow)
    return z, psi6, acc / max(prop, 1), dt


def main():
    n = 1 << 20
    sweeps_eq = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    phis = [0.68, 0.70, 0.71, 0.72]
    print(f"# N={n} hard disks, {sweeps_eq} eq sweeps/point")
    for phi in phis:
        z, psi6, acc, dt = run_point(n, phi, sweeps_eq, snaps=5,
                                     sweeps_between=40)
        print(f"phi={phi:.3f}  Z={z:.4f}  |psi6|={psi6:.4f}  "
              f"acceptance={acc:.3f}  ({dt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
