"""Statistical analysis of Monte Carlo time series: autocorrelation,
blocking, jackknife, effective sample size.

The reference reports raw per-sweep energies and nothing else
(kernel.cu:695) — error bars, decorrelation times, and equilibration
detection are left to the user.  mcjax ships the standard MC analysis kit
so every reported observable can carry an honest uncertainty:

* integrated autocorrelation time with Sokal's automatic windowing
  (Sokal 1997, "Monte Carlo Methods in Statistical Mechanics"),
* Flyvbjerg–Petersen blocking analysis (J. Chem. Phys. 91, 461 (1989)),
* block-jackknife errors for nonlinear functions of means,
* Geweke-style equilibration diagnostic.

Host-side numpy on purpose: these run once per (chunked) trace on
O(n_sweeps) scalars fetched from device — microseconds of work; keeping
them out of jit avoids burning TPU compile time on cold analysis paths.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "autocorrelation",
    "integrated_autocorrelation_time",
    "effective_sample_size",
    "blocking_analysis",
    "error_of_mean",
    "jackknife",
    "equilibration_index",
]


def _as1d(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float64).reshape(-1)
    if a.size < 2:
        raise ValueError(f"need at least 2 samples, got {a.size}")
    return a


def autocorrelation(x, max_lag: int | None = None) -> np.ndarray:
    """Normalized autocorrelation function rho(t), t = 0..max_lag.

    FFT-based (O(n log n)); biased normalization (divide by n, not n-t),
    the standard choice for Sokal windowing (keeps the ACF estimate
    positive-semidefinite as a sequence)."""
    a = _as1d(x)
    n = a.size
    if max_lag is None:
        max_lag = n - 1
    max_lag = int(min(max_lag, n - 1))
    a = a - a.mean()
    # zero-pad to >= 2n to make the circular convolution linear
    nfft = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(a, nfft)
    acov = np.fft.irfft(f * np.conj(f), nfft)[: max_lag + 1] / n
    if acov[0] <= 0.0:  # constant series
        out = np.zeros(max_lag + 1)
        out[0] = 1.0
        return out
    return acov / acov[0]


def integrated_autocorrelation_time(x, c: float = 5.0) -> float:
    """Integrated autocorrelation time tau_int = 1/2 + sum_t rho(t) with
    Sokal's automatic window: truncate at the smallest M >= c * tau_int(M).

    <x> carries variance var(x)/n * 2 tau_int; tau_int = 1/2 for iid
    samples with this convention.  c=5 is Sokal's recommendation for
    reasonably long series (n >~ 1000 tau)."""
    a = _as1d(x)
    rho = autocorrelation(a)
    tau = 0.5
    for m in range(1, rho.size):
        tau += rho[m]
        if m >= c * tau:
            return float(max(tau, 0.5))
    return float(max(tau, 0.5))  # window never closed: tau ~ n, underestimated


def effective_sample_size(x, c: float = 5.0) -> float:
    """n_eff = n / (2 tau_int): the iid-equivalent sample count."""
    a = _as1d(x)
    return a.size / (2.0 * integrated_autocorrelation_time(a, c=c))


def blocking_analysis(x) -> list[tuple[int, float, float]]:
    """Flyvbjerg–Petersen blocking: repeatedly average neighbor pairs and
    re-estimate the variance of the mean at each level.

    Returns [(block_size, sigma_mean, sigma_of_sigma), ...] per level.
    sigma_mean plateaus once the block size exceeds the correlation time;
    pre-plateau values UNDERestimate the true error."""
    a = _as1d(x)
    out = []
    size = 1
    while a.size >= 2:
        n = a.size
        var_mean = a.var(ddof=1) / n
        sig = math.sqrt(var_mean)
        # relative error of the sigma estimate: 1/sqrt(2(n-1))
        out.append((size, sig, sig / math.sqrt(2.0 * (n - 1))))
        m = n // 2
        a = 0.5 * (a[: 2 * m : 2] + a[1 : 2 * m : 2])
        size *= 2
        if m < 2:
            break
    return out


def error_of_mean(x) -> tuple[float, float]:
    """(mean, error) with the error taken from the blocking plateau.

    Plateau rule: first level whose sigma is within its own one-sigma
    uncertainty of the next level's sigma (converged), falling back to the
    largest sigma over levels with >= 8 blocks (conservative)."""
    a = _as1d(x)
    levels = blocking_analysis(a)
    usable = [(s, e, de) for (s, e, de) in levels if a.size // s >= 8]
    if not usable:
        usable = levels[:1]
    err = max(e for (_, e, _) in usable)
    for (s, e, de), (_, e2, _) in zip(usable, usable[1:]):
        if abs(e2 - e) <= de:
            err = max(e, e2)
            break
    return float(a.mean()), float(err)


def jackknife(fn, x, n_blocks: int = 32) -> tuple[float, float]:
    """Block-jackknife estimate and error of ``fn(samples) -> scalar``
    (e.g. a variance, a ratio of means, a heat capacity).

    Splits the series into ``n_blocks`` contiguous blocks (contiguity
    respects autocorrelation), evaluates fn on each leave-one-block-out
    resample, and returns the bias-corrected estimate with the jackknife
    error."""
    a = _as1d(x)
    n_blocks = int(min(n_blocks, a.size))
    if n_blocks < 2:
        raise ValueError("need at least 2 jackknife blocks")
    edges = np.linspace(0, a.size, n_blocks + 1).astype(int)
    full = float(fn(a))
    loo = np.empty(n_blocks)
    for i in range(n_blocks):
        loo[i] = fn(np.concatenate([a[: edges[i]], a[edges[i + 1] :]]))
    mean_loo = loo.mean()
    est = n_blocks * full - (n_blocks - 1) * mean_loo  # bias-corrected
    var = (n_blocks - 1) / n_blocks * np.sum((loo - mean_loo) ** 2)
    return float(est), float(math.sqrt(var))


def equilibration_index(x, n_windows: int = 16) -> int:
    """First index from which the series looks stationary: the earliest
    window w such that the mean of window w agrees with the mean of the
    final half of the series within 3 combined blocking errors (a
    Geweke-style z-test, blocking-robust).  Returns 0 for an already-flat
    series; n//2 if no prefix passes (heavily unequilibrated)."""
    a = _as1d(x)
    n = a.size
    tail = a[n // 2 :]
    mt, et = error_of_mean(tail)
    step = max(1, n // (2 * n_windows))
    for start in range(0, n // 2, step):
        w = a[start : start + step]
        if w.size < 2:
            break
        mw, ew = error_of_mean(w)
        if abs(mw - mt) <= 3.0 * math.hypot(ew, et):
            return start
    return n // 2
