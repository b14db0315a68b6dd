"""Kob-Andersen 80:20 binary LJ mixture — the canonical glass-former
benchmark (Kob & Andersen, PRE 51, 4626 (1995)).

Demonstrates the mixture machinery: species ids ride the cell-list state as
an extra coordinate plane, so the grid-shift/neighbor transport carries them
for free; pair energies resolve (eps, sigma, r_cut) per species pair.
The reference is strictly one-component (kernel.cu:335-346).

Usage: python examples/config6_kob_andersen.py [n_sweeps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.models.mixtures import kob_andersen
from mcjax.ops import cells
from mcjax.ops.mixture import (init_mixture_state, run_sweeps_mixture,
                               total_interaction_cells_mixture,
                               unbin_mixture)


def main():
    n_sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    ka = kob_andersen()

    # classic KA density rho = 1.2 at (near-)80:20 composition
    # (n = 1728 = 12^3 is the smallest cube giving box >= 4 r_cut at rho 1.2)
    n = 1728
    rho = 1.2
    box = (n / rho) ** (1.0 / 3.0)
    cps = max(4, int(box // ka.r_cut) - int(box // ka.r_cut) % 2)
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=44, n_moves=10, beta=1.0 / 0.8,  # T = 0.8 (liquid)
                    step_size=0.12, seed=0)
    cfg.validate_against(ka.r_cut)

    r = cells.stratified_positions(cfg)
    spec = (jnp.arange(n) % 5 == 4).astype(jnp.int32)   # exact 80:20
    st = init_mixture_state(cfg, r, spec)

    e0, ov = total_interaction_cells_mixture(cfg, ka, st.pos, st.occ)
    print(f"N={n} (A:{n - int(spec.sum())} B:{int(spec.sum())}) "
          f"rho={rho} T=0.8  E0/N={float(e0)/n:.4f}")

    st, m = run_sweeps_mixture(cfg, ka, st, n_sweeps)
    e1, _ = total_interaction_cells_mixture(cfg, ka, st.pos, st.occ)
    e_traced = float(e0) + float(jnp.sum(m.delta_e))
    acc = float(m.accepted.sum()) / float(m.proposed.sum())
    _, s_after = unbin_mixture(cfg, st.pos, st.occ)
    print(f"after {n_sweeps} sweeps: E/N={float(e1)/n:.4f} "
          f"(dE-traced {e_traced/n:.4f}), acceptance {acc:.3f}, "
          f"species conserved: {int(s_after.sum()) == int(spec.sum())}, "
          f"overflow {bool(st.overflow)}")

    # species-resolved structure: once equilibrated (a few hundred sweeps),
    # the first-peak positions track the pair sigmas (AA ~1.0, AB ~0.9,
    # BB ~1.0); at short runs they still reflect the stratified init raster
    from mcjax.ops.mixture import partial_rdf_cells
    for pair, name in (((0, 0), "AA"), ((0, 1), "AB"), ((1, 1), "BB")):
        r_bins, g = partial_rdf_cells(cfg, st.pos, st.occ, 40,
                                      min(2.5, cfg.cell_width), pair)
        k = int(jnp.argmax(g))
        print(f"g_{name}: first peak {float(g[k]):.2f} "
              f"at r = {float(r_bins[k]):.3f}")


if __name__ == "__main__":
    main()
