"""BASELINE config 1: 2D hard disks, N=1024, packing fraction 0.5 —
serial checkerboard reference on CPU.

Runs the checkerboard engine on CPU and cross-checks its equilibrium EOS
against the native C++ serial Metropolis oracle and the Henderson closed form.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math

import jax
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.ops import cells
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import observables


def main():
    n, phi = 1024, 0.5
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=8, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    cfg.validate_against(pot.r_cut)

    state = init_state(cfg)
    state, m = run_sweeps(cfg, pot, state, 400)  # burn-in
    snaps = []
    for _ in range(12):
        state, m = run_sweeps(cfg, pot, state, 25)
        snaps.append(np.asarray(cells.unbin(cfg, state.pos, state.occ)))
    z = observables.hard_disk_eos(snaps, box, 1.0, 2)
    z_henderson = observables.henderson_z_disks(phi)
    print(f"checkerboard engine: Z = {z:.3f}")
    print(f"Henderson EOS:       Z = {z_henderson:.3f}")

    try:
        from mcjax import native
        r1 = snaps[-1].astype(np.float64)
        csnaps = []
        for i in range(12):
            r1, acc = native.serial_run(r1, box, 1.0, 0.15, 100_000, 7 + i,
                                        "hard", 1.0, "uniform")
            csnaps.append(r1.astype(np.float32))
        zc = observables.hard_disk_eos(csnaps, box, 1.0, 2)
        print(f"C++ serial oracle:   Z = {zc:.3f}")
    except Exception as e:  # toolchain may be absent
        print(f"(native oracle unavailable: {e})")


if __name__ == "__main__":
    main()
