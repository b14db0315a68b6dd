"""BASELINE config 4: vmapped replica ensemble / parallel tempering with
per-replica Threefry streams (the reference has no ensemble support at all)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.models.potentials import LennardJones
from mcjax.parallel import ensemble


def main():
    cfg = SimConfig(dim=3, n_atoms=512, box_length=20.0, cells_per_side=8,
                    nmax=10, n_moves=8, beta=0.5, step_size=0.4, seed=0)
    pot = LennardJones(r_cut=2.5)
    r = 8
    betas = jnp.linspace(0.2, 1.2, r)
    states = ensemble.init_ensemble(cfg, r)
    states, swaps, e_hist = ensemble.parallel_tempering(
        cfg, pot, states, betas, jax.random.key(3), n_rounds=10,
        sweeps_per_round=10)
    print("beta ladder:", [f"{b:.2f}" for b in betas])
    print("final energies:", [f"{e:.1f}" for e in e_hist[-1]])
    print(f"swap acceptance: {int(swaps.sum())}/{10 * (r // 2)}")
    # colder replicas should sit at lower energy
    assert float(e_hist[-3:, -1].mean()) <= float(e_hist[-3:, 0].mean()) + 5.0


if __name__ == "__main__":
    main()
