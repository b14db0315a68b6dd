"""Semi-grand-canonical ensemble (ops/semigrand.py): exact ideal-mixture
composition, hard-core flip invariants."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.models.mixtures import HardSphereMixture, LJMixture
from mcjax.ops import cells, semigrand
from mcjax.ops.mixture import init_mixture_state


def test_semigrand_ideal_composition_exact():
    """Zero-epsilon mixture = ideal: each particle's species is an
    independent Gibbs variable, <N_B>/N = e^{b mu_B} / sum_s e^{b mu_s}."""
    n = 64
    pot = LJMixture(epsilon=((0.0, 0.0), (0.0, 0.0)),
                    sigma=((1.0, 1.0), (1.0, 1.0)),
                    r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    box = 16.0
    # nmax must leave Poisson-tail headroom: at <occ>=1.8/cell, nmax=8
    # overflows ~3 times over 1400 grid-shift rebins (sticky flag, dropped
    # particles) and shifts the measured fraction by ~0.03.
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=6,
                    nmax=13, n_moves=2, proposal="gaussian", step_size=0.3,
                    beta=1.0, seed=0)
    spec = jnp.zeros(n, jnp.int32)
    st = init_mixture_state(cfg, cells.stratified_positions(cfg), spec)
    beta_mu = (0.0, math.log(3.0))            # P(B) = 3/4 exactly
    st, m = semigrand.run_semigrand(cfg, pot, st, beta_mu, 200)   # burn
    st, m = semigrand.run_semigrand(cfg, pot, st, beta_mu, 1200)
    assert not bool(st.overflow)
    nb = np.asarray(m.counts)[:, 1].astype(np.float64)
    frac = nb.mean() / n
    assert abs(frac - 0.75) < 0.02, frac
    # composition actually fluctuates (the chain is live)
    assert nb.std() > 0.5
    assert int(np.asarray(m.counts)[-1].sum()) == n
    assert int(jnp.sum(m.flipped)) > 100


def test_semigrand_hard_mixture_invariants():
    """Hard-core flips: a grow-flip into an overlap rejects; every per-pair
    contact distance holds after many phases; N conserved."""
    n = 72
    dmat = ((1.0, 0.85), (0.85, 0.7))
    pot = HardSphereMixture(diameter=dmat)
    phi = 0.35
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=3)
    spec = jnp.ones(n, jnp.int32)             # all small -> room to grow
    st = init_mixture_state(
        cfg, cells.stratified_positions(cfg, min_separation=1.0), spec)
    # favor the LARGE species: flips happen until packing resists
    st, m = semigrand.run_semigrand(cfg, pot, st, (1.5, 0.0), 150)
    assert not bool(st.overflow)
    flat = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    coords, sp = flat[:, :2], flat[:, 2].round().astype(int)
    assert flat.shape[0] == n
    assert int(jnp.sum(m.flipped)) > 0
    n_large = (sp == 0).sum()
    assert n_large > n // 4                   # composition responded
    d = coords[None] - coords[:, None]
    L = cfg.box_length
    d = d - L * np.round(d / L)
    r = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(r, np.inf)
    dm = np.asarray(dmat)
    assert (r >= dm[sp[:, None], sp[None]] - 1e-5).all()


def test_semigrand_rejects_single_species():
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere

    cfg = SimConfig(dim=2, n_atoms=16, box_length=12.0, cells_per_side=4,
                    nmax=6, n_moves=1, proposal="uniform", step_size=0.1,
                    beta=1.0)
    st = init_state(cfg)
    with pytest.raises(ValueError):
        semigrand.semigrand_phase(cfg, HardSphere(1.0), st.pos, st.occ,
                                  (0.0, 0.0), jax.random.key(0))
