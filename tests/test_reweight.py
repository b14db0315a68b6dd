"""mcjax.utils.reweight: single-histogram and WHAM/MBAR reweighting on a
system with exact closed forms.

Model: density of states Omega(E) ~ E^{k-1}  =>  at inverse temperature
beta the energy is Gamma(shape=k, scale=1/beta):
    <E>_beta = k / beta,
    Z(beta) ~ beta^{-k}  =>  f(beta) = -ln Z(beta)/Z(beta0) = k ln(beta/beta0).
Every estimate below is checked against those closed forms.  Host-numpy
only — no jit, no device."""

import math

import numpy as np
import pytest

from mcjax.utils import reweight

K_SHAPE = 50.0  # ~50 quadratic degrees of freedom


def draw(beta, n, seed):
    rng = np.random.default_rng(seed)
    return rng.gamma(K_SHAPE, 1.0 / beta, n)


def test_single_histogram_exact_mean():
    beta1, beta2 = 1.0, 1.15
    e = draw(beta1, 200_000, seed=1)
    est = reweight.reweight_observable(e, beta1, beta2)
    exact = K_SHAPE / beta2
    assert abs(est - exact) / exact < 0.01, (est, exact)
    # identity reweight is the plain mean
    assert reweight.reweight_observable(e, beta1, beta1) == \
        pytest.approx(e.mean())
    # reweighting a separate observable: E^2 -> <E^2> = k(k+1)/beta^2
    est2 = reweight.reweight_observable(e, beta1, beta2, obs=e * e)
    exact2 = K_SHAPE * (K_SHAPE + 1) / beta2**2
    assert abs(est2 - exact2) / exact2 < 0.02


def test_n_eff_shrinks_with_distance():
    e = draw(1.0, 50_000, seed=2)
    n0 = reweight.reweight_n_eff(e, 1.0, 1.0)
    n1 = reweight.reweight_n_eff(e, 1.0, 1.1)
    n2 = reweight.reweight_n_eff(e, 1.0, 1.3)
    assert n0 == pytest.approx(e.size)
    assert n0 > n1 > n2 > 4.0
    assert n2 < 0.5 * n0  # visible decay by beta-shift 0.3
    # far extrapolation: the diagnostic must scream (tiny n_eff)
    assert reweight.reweight_n_eff(e, 1.0, 3.0) < 50.0


def test_wham_free_energies_exact():
    betas = [0.8, 1.0, 1.25]
    es = [draw(b, 60_000, seed=10 + i) for i, b in enumerate(betas)]
    f = reweight.wham(es, betas)
    assert f[0] == 0.0
    for fk, b in zip(f, betas):
        exact = K_SHAPE * math.log(b / betas[0])
        assert abs(fk - exact) < 0.15, (fk, exact)


def test_wham_expectation_interpolates():
    betas = [0.8, 1.0, 1.25]
    es = [draw(b, 60_000, seed=20 + i) for i, b in enumerate(betas)]
    f = reweight.wham(es, betas)
    for bt in (0.85, 1.0, 1.1):
        est = reweight.wham_expectation(es, betas, f, bt)
        exact = K_SHAPE / bt
        assert abs(est - exact) / exact < 0.01, (bt, est, exact)
    # free energy at an off-grid target
    bt = 0.9
    g = reweight.wham_free_energy(es, betas, f, bt)
    assert abs(g - K_SHAPE * math.log(bt / betas[0])) < 0.15
    # observable channel: heat-capacity ingredient <E^2>(beta_t)
    est2 = reweight.wham_expectation(es, betas, f, 1.0,
                                     obs_list=[e * e for e in es])
    exact2 = K_SHAPE * (K_SHAPE + 1)
    assert abs(est2 - exact2) / exact2 < 0.02


def test_wham_heat_capacity_exact():
    # Gamma system: beta^2 (<E^2> - <E>^2) = beta^2 * k/beta^2 = k, flat
    betas = [0.9, 1.0, 1.1]
    es = [draw(b, 60_000, seed=30 + i) for i, b in enumerate(betas)]
    f = reweight.wham(es, betas)
    for bt in (0.92, 1.0, 1.08):
        cv = reweight.wham_heat_capacity(es, betas, f, bt)
        assert abs(cv - K_SHAPE) / K_SHAPE < 0.08, (bt, cv)


def test_bar_gaussian_widths_exact():
    """u_0 = x^2/2 (x ~ N(0,1)), u_1 = x^2/(2 s^2) (x ~ N(0,s^2)):
    beta dF = -ln(Z_1/Z_0) = -ln s exactly."""
    rng = np.random.default_rng(7)
    s = 1.5
    x0 = rng.normal(0.0, 1.0, 100_000)
    x1 = rng.normal(0.0, s, 100_000)
    wf = 0.5 * x0 * x0 * (1.0 / s**2 - 1.0)   # u_1 - u_0 on state-0 samples
    wr = 0.5 * x1 * x1 * (1.0 - 1.0 / s**2)   # u_0 - u_1 on state-1 samples
    df = reweight.bar(wf, wr)
    assert abs(df - (-math.log(s))) < 0.01, df
    # shifted-center case: equal Z, dF = 0 (Crooks' Gaussian work pair)
    a = 1.2
    wf2 = -a * x0 + a * a / 2.0
    wr2 = -a * (rng.normal(a, 1.0, 80_000) - a) + a * a / 2.0
    assert abs(reweight.bar(wf2, wr2)) < 0.02


def test_bar_matches_wham_on_temperature_pair():
    """BAR on the (beta1, beta2) pair of the Gamma system == the exact
    k ln(beta2/beta1), and consistent with wham() on the same traces."""
    b1, b2 = 1.0, 1.08
    e1, e2 = draw(b1, 80_000, seed=8), draw(b2, 80_000, seed=9)
    df = reweight.bar((b2 - b1) * e1, (b1 - b2) * e2)
    exact = K_SHAPE * math.log(b2 / b1)
    assert abs(df - exact) < 0.05, (df, exact)
    f = reweight.wham([e1, e2], [b1, b2])
    assert abs(df - f[1]) < 0.05, (df, f[1])
    # asymmetric sample counts still converge to the same answer
    df_asym = reweight.bar((b2 - b1) * e1[:4000], (b1 - b2) * e2)
    assert abs(df_asym - exact) < 0.15


def test_wham_single_run_reduces_to_single_histogram():
    e = draw(1.0, 30_000, seed=3)
    f = reweight.wham([e], [1.0])
    est = reweight.wham_expectation([e], [1.0], f, 1.12)
    direct = reweight.reweight_observable(e, 1.0, 1.12)
    assert est == pytest.approx(direct, rel=1e-12)


@pytest.mark.slow
def test_wham_on_parallel_tempering_traces():
    """End-to-end: WHAM over the energy histories of an on-device
    parallel-tempering run predicts <E> at an off-grid temperature within
    combined error bars of a direct NVT run there (2D LJ, small N)."""
    import jax
    import jax.numpy as jnp

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import LennardJones
    from mcjax.ops.sweep import run_sweeps, total_energy_cells
    from mcjax.parallel.ensemble import init_ensemble, parallel_tempering
    from mcjax.utils import stats

    n, rho = 100, 0.4
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=3 * (n // (cps * cps)) + 10, n_moves=4,
                    proposal="gaussian", step_size=0.22, beta=1.0, seed=0)
    pot = LennardJones(epsilon=1.0, sigma=1.0, r_cut=2.5)
    betas = jnp.asarray([0.7, 0.85, 1.0])

    states = init_ensemble(cfg, 3)
    key = jax.random.key(5)
    states, _, _ = parallel_tempering(cfg, pot, states, betas, key,
                                      n_rounds=100, sweeps_per_round=4)
    states, swaps, e_hist = parallel_tempering(
        cfg, pot, states, betas, jax.random.fold_in(key, 1),
        n_rounds=500, sweeps_per_round=4)
    assert not bool(jnp.any(states.overflow))
    assert float(jnp.mean(swaps.astype(jnp.float32))) > 0.1  # replicas mix
    e_hist = np.asarray(e_hist, np.float64)
    e_list = [e_hist[:, i] for i in range(3)]
    f = reweight.wham(e_list, np.asarray(betas))

    bt = 0.925  # off-grid target
    est = reweight.wham_expectation(e_list, np.asarray(betas), f, bt)

    cfg_b = cfg.replace(beta=bt, seed=3)
    st = init_state(cfg_b)
    st, _ = run_sweeps(cfg_b, pot, st, 300)
    e0 = float(total_energy_cells(cfg_b, pot, st.pos, st.occ))
    st, m = run_sweeps(cfg_b, pot, st, 1000)
    assert not bool(st.overflow)
    tr = e0 + np.cumsum(np.asarray(m.delta_e, np.float64))
    mean, err = stats.error_of_mean(tr)
    # WHAM's own sampling error is comparable to the direct run's; allow
    # 5 sigma of the direct error plus a 1.5% scale floor
    assert abs(est - mean) < 5 * err + 0.015 * abs(mean), \
        (est, mean, err)


def test_validation():
    with pytest.raises(ValueError):
        reweight.wham([np.ones(10)], [1.0, 2.0])
    with pytest.raises(ValueError):
        reweight.reweight_observable(np.ones(10), 1.0, 1.1,
                                     obs=np.ones(9))
