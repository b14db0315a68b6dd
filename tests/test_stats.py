"""mcjax.utils.stats: autocorrelation / blocking / jackknife against
closed forms on synthetic series (AR(1), iid), where every quantity is
exact.  Host-numpy only — no jit, no device."""

import math

import numpy as np
import pytest

from mcjax.utils import stats


def ar1(n, phi, sigma=1.0, seed=0, mean=0.0):
    """AR(1): x_{t+1} = phi x_t + N(0, sigma^2).  Stationary variance
    sigma^2/(1-phi^2); rho(t) = phi^t; tau_int = (1+phi)/(2(1-phi))."""
    rng = np.random.default_rng(seed)
    eps = rng.normal(0.0, sigma, n)
    x = np.empty(n)
    x[0] = rng.normal(0.0, sigma / math.sqrt(1 - phi * phi))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t]
    return x + mean


def test_autocorrelation_ar1():
    phi = 0.8
    x = ar1(200_000, phi, seed=1)
    rho = stats.autocorrelation(x, max_lag=20)
    assert rho[0] == 1.0
    for t in (1, 2, 5, 10):
        assert abs(rho[t] - phi**t) < 0.02, (t, rho[t])


def test_tau_int_and_ess():
    phi = 0.8
    tau_exact = (1 + phi) / (2 * (1 - phi))  # 4.5
    x = ar1(200_000, phi, seed=2)
    tau = stats.integrated_autocorrelation_time(x)
    assert abs(tau - tau_exact) / tau_exact < 0.10, tau
    ess = stats.effective_sample_size(x)
    assert abs(ess - x.size / (2 * tau_exact)) / (x.size / (2 * tau_exact)) \
        < 0.15

    # iid: tau = 1/2, ess ~ n
    y = np.random.default_rng(3).normal(size=50_000)
    assert abs(stats.integrated_autocorrelation_time(y) - 0.5) < 0.05
    assert stats.effective_sample_size(y) > 0.85 * y.size


def test_blocking_matches_exact_error():
    phi, sigma, n = 0.8, 1.0, 65_536
    var = sigma**2 / (1 - phi**2)
    tau = (1 + phi) / (2 * (1 - phi))
    exact = math.sqrt(var * 2 * tau / n)
    errs = []
    for seed in range(6):
        x = ar1(n, phi, sigma, seed=10 + seed, mean=3.0)
        mean, err = stats.error_of_mean(x)
        errs.append(err)
        # the estimated error bar should cover the true mean most runs
        assert abs(mean - 3.0) < 5 * exact
    mean_err = np.mean(errs)
    assert 0.6 * exact < mean_err < 1.6 * exact, (mean_err, exact)
    # naive (unblocked) error underestimates by ~sqrt(2 tau) = 3x: the
    # blocking estimate must be far above it
    naive = math.sqrt(var / n)
    assert mean_err > 1.8 * naive


def test_blocking_levels_monotone_then_plateau():
    x = ar1(32_768, 0.9, seed=4)
    levels = stats.blocking_analysis(x)
    sig1 = levels[0][1]
    plateau = max(e for (s, e, _) in levels if x.size // s >= 16)
    assert plateau > 2.5 * sig1  # correlated series: plateau >> level-0


def test_jackknife_mean_and_variance():
    rng = np.random.default_rng(5)
    x = rng.normal(2.0, 3.0, 40_000)
    est, err = stats.jackknife(np.mean, x)
    assert abs(est - x.mean()) < 1e-10
    se = x.std(ddof=1) / math.sqrt(x.size)
    assert 0.7 * se < err < 1.4 * se
    # nonlinear statistic: variance
    est_v, err_v = stats.jackknife(lambda a: a.var(ddof=1), x, n_blocks=64)
    assert abs(est_v - 9.0) < 5 * err_v
    assert err_v > 0.0


def test_equilibration_index():
    rng = np.random.default_rng(6)
    n = 8192
    flat = rng.normal(size=n)
    assert stats.equilibration_index(flat) == 0
    # strong transient decaying over the first quarter
    drift = 30.0 * np.exp(-np.arange(n) / (n / 8))
    idx = stats.equilibration_index(flat + drift)
    assert 0 < idx <= n // 2
    assert drift[idx] < 1.5  # past the bulk of the transient


def test_input_validation():
    with pytest.raises(ValueError):
        stats.integrated_autocorrelation_time([1.0])
    with pytest.raises(ValueError):
        stats.jackknife(np.mean, [1.0, 2.0], n_blocks=1)
    # constant series: rho defined, tau = 1/2
    rho = stats.autocorrelation(np.ones(64))
    assert rho[0] == 1.0 and abs(rho[1:]).max() == 0.0
