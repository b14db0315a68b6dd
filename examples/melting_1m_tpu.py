"""BASELINE config 5 (single-chip form): 1M hard-disk melting study.

Scans packing fraction through the 2D hard-disk melting region
(phi ~ 0.69-0.72; Bernard & Krauth, PRL 107, 155704 (2011)) at N ~ 2^20,
tracking the equation of state Z(phi) and the bond-orientational order
|psi_6|.

Protocol (round 2): start every point on the *solid branch* — a triangular
(close-packed) lattice via cells.triangular_lattice_positions — and
equilibrate for >= 2e4 sweeps. At phi = 0.72 the solid persists
(|psi_6| large); at phi = 0.69 it melts into the liquid (|psi_6| -> N^-1/2
noise); the EOS flattens across the transition (Mayer-Wood region at
finite N). A square-lattice start (the reference's init_r, kernel.cu:78-89)
is ~100x of equilibration away from either branch and resolves nothing
(round-1 lesson, docs/PERF.md).

Run on a TPU (Pallas engine). On a pod, wrap with parallel.mesh domain
sharding — same sweep code. Expect ~5-10 min per phi point at 2e4 sweeps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math
import time

import numpy as np


def run_point(n, phi, sweeps_eq, snaps, sweeps_between, seed=0, block=2000):
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
    # solid-branch initial condition (see module docstring)
    state = init_state(cfg, positions=cells.triangular_lattice_positions(cfg))

    t0 = time.perf_counter()
    # equilibrate in fixed-size blocks (one compile), tracing |psi_6|
    psi_trace = []
    done = 0
    while done < sweeps_eq:
        state, m = run_sweeps_pallas(cfg, pot, state, block)
        done += block
        psi_trace.append(float(observables.psi6_cells(cfg, state.pos,
                                                      state.occ)))
        print(f"#   phi={phi:.3f} sweep {done}: |psi6|={psi_trace[-1]:.4f}",
              flush=True)
    frames = []
    acc = prop = 0
    for _ in range(snaps):
        state, m = run_sweeps_pallas(cfg, pot, state, sweeps_between)
        acc += int(np.sum(np.asarray(m.accepted, np.int64)))
        prop += int(np.sum(np.asarray(m.proposed, np.int64)))
        frames.append((state.pos, state.occ))
    # cell-list contact histogram: O(N), fine at N=1M (the O(N^2) variant
    # would need half a trillion pair distances)
    z = observables.hard_disk_eos_state(cfg, frames, 1.0)
    psi6 = float(observables.psi6_cells(cfg, state.pos, state.occ))
    dt = time.perf_counter() - t0
    assert not bool(state.overflow)
    return z, psi6, acc / max(prop, 1), dt


def main():
    # n = nx*ny with an even-row near-unstrained triangular factorization
    # (953 x 1100; aspect error 0.02%) — within 0.03% of 2^20
    n = 953 * 1100
    sweeps_eq = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    phis = [0.69, 0.70, 0.71, 0.72]
    print(f"# N={n} hard disks, triangular (solid) init, "
          f"{sweeps_eq} eq sweeps/point")
    for phi in phis:
        z, psi6, acc, dt = run_point(n, phi, sweeps_eq, snaps=5,
                                     sweeps_between=40)
        print(f"phi={phi:.3f}  Z={z:.4f}  |psi6|={psi6:.4f}  "
              f"acceptance={acc:.3f}  ({dt:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
