"""BASELINE config 3: 3D Lennard-Jones NVT MC with cell lists and
energy/acceptance reductions — the reference's physics (kernel.cu:17-29) at a
scale the reference could never reach."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import LennardJones
from mcjax.ops import cells
from mcjax.ops.sweep import run_sweeps, total_energy_cells
from mcjax.utils import observables


def main():
    # ~100k atoms at the reference's density (800 atoms in a 10^3 box).
    # NB: at beta=0.3 the LJ system is a hot gas with large density
    # fluctuations — size nmax generously (overflow is detected, not silent).
    scale = 5
    cfg = SimConfig(dim=3, n_atoms=800 * scale**3, box_length=10.0 * scale,
                    cells_per_side=4 * scale, nmax=30, n_moves=8,
                    proposal="gaussian", step_size=0.25, beta=0.3, seed=0)
    pot = LennardJones(r_cut=2.5)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg)
    e0 = float(total_energy_cells(cfg, pot, state.pos, state.occ))
    print(f"N={cfg.n_atoms}, cells={cfg.n_cells}, E0={e0:.2f}")

    sweeps = 25
    st, m1 = run_sweeps(cfg, pot, state, sweeps)
    _ = float(jnp.sum(m1.delta_e))
    t0 = time.perf_counter()
    st, m2 = run_sweeps(cfg, pot, st, sweeps)
    _ = float(jnp.sum(m2.delta_e))
    dt = time.perf_counter() - t0
    prop = int(jnp.sum(m2.proposed))
    print(f"{sweeps} sweeps in {dt:.3f}s — {prop/dt:.3e} trial moves/s, "
          f"acceptance {int(jnp.sum(m2.accepted))/prop:.3f}")
    # the reference's own verification: E0 + sum(accepted dE) == exact energy
    e_traced = e0 + float(jnp.sum(m1.delta_e)) + float(jnp.sum(m2.delta_e))
    e_exact = float(total_energy_cells(cfg, pot, st.pos, st.occ))
    print(f"E = {e_exact:.2f} ({e_exact/cfg.n_atoms:.4f}/atom); "
          f"dE-trace drift {abs(e_traced - e_exact)/abs(e_exact):.2e} relative")
    p = observables.virial_pressure(
        pot, cells.unbin(cfg, st.pos, st.occ)[:4096], cfg.box_length,
        cfg.beta, 3)
    print(f"virial pressure (4k-atom subsample): {float(p):.4f}")


if __name__ == "__main__":
    main()
