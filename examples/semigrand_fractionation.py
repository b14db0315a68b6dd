"""Semi-grand canonical fractionation curve (Kofke & Glandt 1988).

Sweeps the chemical-potential difference beta*dmu = beta(mu_B - mu_A) of a
weakly non-ideal binary LJ mixture and measures the equilibrium composition
<x_B>(dmu) with species-identity flips between displacement sweeps
(mcjax.ops.semigrand).  For the ideal limit the curve is the exact logistic
x_B = 1/(1 + e^{-beta dmu}); interactions tilt it.  Also cross-checks the
measured composition against the species-resolved Widom estimate
(x_B/x_A ~ e^{beta dmu} B_B/B_A at low density).

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
from mcjax.models.mixtures import LJMixture
from mcjax.ops import cells, semigrand
from mcjax.ops.mixture import init_mixture_state
from mcjax.utils.observables import widom_insertion_species


def main():
    n = 128
    pot = LJMixture(epsilon=((0.25, 0.2), (0.2, 0.15)),
                    sigma=((1.0, 0.95), (0.95, 0.9)),
                    r_cut_table=((2.5, 2.4), (2.4, 2.25)))
    rho = 0.3
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=3 * (n // max(cps * cps, 1)) + 12, n_moves=4,
                    proposal="gaussian", step_size=0.25, beta=1.0, seed=0)
    print(f"# N={n} rho={rho} box={box:.2f} cps={cps} nmax={cfg.nmax}")
    print("# beta*dmu   <x_B>   ideal-logistic   widom-consistency")
    for dmu in (-2.0, -1.0, 0.0, 1.0, 2.0):
        spec = jnp.zeros(n, jnp.int32)
        st = init_mixture_state(cfg, cells.stratified_positions(cfg), spec)
        beta_mu = (0.0, dmu)
        st, _ = semigrand.run_semigrand(cfg, pot, st, beta_mu, 300)
        st, m = semigrand.run_semigrand(cfg, pot, st, beta_mu, 900)
        assert not bool(st.overflow)
        xb = float(np.asarray(m.counts)[:, 1].mean()) / n
        ideal = 1.0 / (1.0 + math.exp(-dmu))
        # Widom cross-check: x_B/x_A = e^{beta dmu} B_B/B_A
        kw = jax.random.fold_in(st.key, jnp.int32(-9))
        b_a = float(widom_insertion_species(cfg, pot, st.pos, st.occ, kw,
                                            400, species=0))
        b_b = float(widom_insertion_species(cfg, pot, st.pos, st.occ, kw,
                                            400, species=1))
        xb_widom = 1.0 / (1.0 + b_a / (b_b * math.exp(dmu)))
        print(f"{dmu:+.1f}  {xb:.4f}  {ideal:.4f}  {xb_widom:.4f}")


if __name__ == "__main__":
    main()
