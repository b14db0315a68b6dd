"""Parallel tempering + WHAM: a continuous equation of state E(beta) from
ONE multi-replica run.

Runs on-device replica exchange (mcjax.parallel.ensemble.parallel_tempering)
on a small 2D Lennard-Jones fluid at K temperatures, feeds the per-replica
energy histories into the multi-histogram estimator
(mcjax.utils.reweight.wham), and prints <E>(beta) on a FINE beta grid —
including temperatures no replica ever ran at — with blocking error bars
(mcjax.utils.stats) and WHAM cross-validated against direct simulations at
two off-grid betas.

The reference can produce one (beta, <E>) point per recompile
(kernel.cu:17-29); this produces the whole curve from one program.
CPU-friendly (small N); runs on TPU unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.models.potentials import LennardJones
from mcjax.ops.sweep import run_sweeps, total_energy_cells
from mcjax.parallel.ensemble import init_ensemble, parallel_tempering
from mcjax.utils import reweight, stats
from mcjax.core.state import init_state


def make_cfg(seed=0):
    n, rho = 144, 0.45
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    return SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=3 * (n // (cps * cps)) + 10, n_moves=4,
                     proposal="gaussian", step_size=0.22, beta=1.0,
                     seed=seed)


def main():
    cfg = make_cfg()
    pot = LennardJones(epsilon=1.0, sigma=1.0, r_cut=2.5)
    betas = jnp.asarray([0.55, 0.70, 0.85, 1.00, 1.15])
    k = len(betas)

    states = init_ensemble(cfg, k)
    key = jax.random.key(99)
    # burn-in rounds discarded, production rounds kept
    states, _, _ = parallel_tempering(cfg, pot, states, betas, key,
                                      n_rounds=150, sweeps_per_round=4)
    states, swaps, e_hist = parallel_tempering(
        cfg, pot, states, betas, jax.random.fold_in(key, 1),
        n_rounds=600, sweeps_per_round=4)
    e_hist = np.asarray(e_hist, np.float64)          # [rounds, K]
    print(f"# N={cfg.n_atoms} K={k} swap acceptance "
          f"{float(np.mean(np.asarray(swaps))) / (k - 1):.2f}")

    e_list = [e_hist[:, i] for i in range(k)]
    f = reweight.wham(e_list, np.asarray(betas))
    print("# WHAM reduced free energies f_k:",
          " ".join(f"{x:.2f}" for x in f))

    print("# beta    <E>/N (WHAM)")
    for bt in np.linspace(0.55, 1.15, 13):
        ew = reweight.wham_expectation(e_list, np.asarray(betas), f, bt)
        print(f"{bt:.3f}  {ew / cfg.n_atoms:+.4f}")

    # cross-validation: direct NVT runs at two betas no replica sampled
    for bt in (0.775, 1.075):
        cfg_b = cfg.replace(beta=float(bt), seed=7)
        st = init_state(cfg_b)
        st, _ = run_sweeps(cfg_b, pot, st, 400)
        e0 = float(total_energy_cells(cfg_b, pot, st.pos, st.occ))
        st, m = run_sweeps(cfg_b, pot, st, 1200)
        tr = e0 + np.cumsum(np.asarray(m.delta_e, np.float64))
        mean, err = stats.error_of_mean(tr)
        ew = reweight.wham_expectation(e_list, np.asarray(betas), f, bt)
        z = abs(ew - mean) / max(err, 1e-12)
        print(f"# direct beta={bt}: <E>/N = {mean / cfg.n_atoms:+.4f} "
              f"+- {err / cfg.n_atoms:.4f}  WHAM {ew / cfg.n_atoms:+.4f} "
              f" ({z:.1f} sigma)")


if __name__ == "__main__":
    main()
