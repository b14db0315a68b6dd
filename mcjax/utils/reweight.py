"""Histogram reweighting: single-histogram (Ferrenberg–Swendsen) and
multi-histogram (WHAM in its sample-based / MBAR form).

Turns energy traces measured at one or more temperatures into estimates of
observables and free-energy differences at ANY nearby temperature — the
standard companion of parallel tempering (mcjax.parallel.ensemble emits
exactly the per-replica energy traces these consume).  The reference has
no free-energy machinery at all (its only output is the raw energy trace,
kernel.cu:695).

Implementation notes:
* Sample-based (no binning): WHAM's histogram-bin limit with bin width -> 0
  is exactly MBAR's self-consistency equation (Shirts & Chodera 2008,
  eq. 11); solving on raw samples avoids the bin-width bias knob entirely.
* Everything is logsumexp-stabilized; inputs are host numpy (analysis
  runs once per trace — see mcjax.utils.stats docstring for why this
  deliberately stays off-device).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "reweight_observable",
    "reweight_n_eff",
    "wham",
    "wham_expectation",
    "wham_free_energy",
    "wham_heat_capacity",
    "bar",
]


def _logsumexp(a, axis=None, b=None):
    a = np.asarray(a, dtype=np.float64)
    amax = np.max(a, axis=axis, keepdims=True)
    amax = np.where(np.isfinite(amax), amax, 0.0)
    t = np.exp(a - amax)
    if b is not None:
        t = b * t
    s = np.sum(t, axis=axis, keepdims=True)
    out = np.log(s) + amax
    return float(np.squeeze(out)) if axis is None \
        else np.squeeze(out, axis=axis)


def _ln_weights(e, beta_from: float, beta_to: float) -> np.ndarray:
    e = np.asarray(e, dtype=np.float64).reshape(-1)
    ln_w = -(beta_to - beta_from) * e
    return ln_w - _logsumexp(ln_w)  # normalized: sum exp = 1


def reweight_observable(e_samples, beta_from: float, beta_to: float,
                        obs=None) -> float:
    """Ferrenberg–Swendsen single-histogram reweighting:
    <O>_beta' = sum_i O_i e^{-(beta'-beta) E_i} / sum_i e^{-(beta'-beta) E_i}.

    ``obs`` defaults to the energies themselves (returns <E>_beta').
    Reliable only while ``reweight_n_eff`` stays a reasonable fraction of
    len(e_samples) — the energy histograms at beta and beta' must overlap.
    """
    e = np.asarray(e_samples, dtype=np.float64).reshape(-1)
    o = e if obs is None else np.asarray(obs, dtype=np.float64).reshape(-1)
    if o.shape != e.shape:
        raise ValueError(f"obs shape {o.shape} != energies shape {e.shape}")
    w = np.exp(_ln_weights(e, beta_from, beta_to))
    return float(np.sum(w * o))


def reweight_n_eff(e_samples, beta_from: float, beta_to: float) -> float:
    """Kish effective sample size of the reweighting weights,
    1 / sum w_i^2 for normalized w — the overlap diagnostic: ~n means the
    target temperature is well covered, ~1 means the estimate hangs on a
    single sample (extrapolated too far)."""
    ln_w = _ln_weights(e_samples, beta_from, beta_to)
    return float(np.exp(-_logsumexp(2.0 * ln_w)))


def _stack(e_list, betas):
    es = [np.asarray(e, dtype=np.float64).reshape(-1) for e in e_list]
    betas = np.asarray(betas, dtype=np.float64).reshape(-1)
    if len(es) != betas.size:
        raise ValueError(f"{len(es)} traces vs {betas.size} betas")
    n_k = np.array([e.size for e in es])
    return np.concatenate(es), betas, n_k


def wham(e_list, betas, n_iter: int = 2000, tol: float = 1e-12
         ) -> np.ndarray:
    """Solve the WHAM/MBAR self-consistency for the reduced free energies
    f_k = -ln(Z_k / Z_0) of K runs at inverse temperatures ``betas``:

        exp(-f_k) = sum_i exp(-beta_k E_i) / sum_l N_l exp(f_l - beta_l E_i)

    over the pooled samples i of all runs.  Returns f with f[0] = 0.
    Direct iteration with logsumexp stabilization; converges linearly,
    which is ample at the K <= O(100) replica counts tempering produces.
    """
    e_all, betas, n_k = _stack(e_list, betas)
    ln_n = np.log(n_k.astype(np.float64))
    f = np.zeros(betas.size)
    # [K, N_tot] matrix of -beta_k * E_i (K is small; memory is fine)
    neg_be = -betas[:, None] * e_all[None, :]
    for _ in range(n_iter):
        # ln denominator_i = logsumexp_l (ln N_l + f_l - beta_l E_i)
        ln_den = _logsumexp(ln_n[:, None] + f[:, None] + neg_be, axis=0)
        f_new = -_logsumexp(neg_be - ln_den[None, :], axis=1)
        f_new = f_new - f_new[0]
        delta = np.max(np.abs(f_new - f))
        f = f_new
        if delta < tol:
            break
    return f


def _ln_sample_weights(e_all, betas, n_k, f, beta_target: float
                       ) -> np.ndarray:
    ln_n = np.log(n_k.astype(np.float64))
    ln_den = _logsumexp(ln_n[:, None] + f[:, None]
                        - betas[:, None] * e_all[None, :], axis=0)
    ln_w = -beta_target * e_all - ln_den
    return ln_w - _logsumexp(ln_w)


def wham_expectation(e_list, betas, f, beta_target: float, obs_list=None
                     ) -> float:
    """<O>(beta_target) from the pooled, WHAM-weighted samples.  ``f`` is
    the output of :func:`wham`; ``obs_list`` (one array per run, aligned
    with ``e_list``) defaults to the energies."""
    e_all, betas, n_k = _stack(e_list, betas)
    if obs_list is None:
        o_all = e_all
    else:
        o_all = np.concatenate(
            [np.asarray(o, dtype=np.float64).reshape(-1) for o in obs_list])
        if o_all.shape != e_all.shape:
            raise ValueError("obs_list shape mismatch with e_list")
    ln_w = _ln_sample_weights(e_all, betas, n_k, f, beta_target)
    return float(np.sum(np.exp(ln_w) * o_all))


def wham_heat_capacity(e_list, betas, f, beta_target: float) -> float:
    """C_v(beta_target) = beta^2 (<E^2> - <E>^2) from the WHAM-weighted
    pooled samples — the fluctuation route to the specific heat, evaluable
    at any temperature in the covered range (peak location = transition
    estimate)."""
    e_mean = wham_expectation(e_list, betas, f, beta_target)
    e2 = wham_expectation(e_list, betas, f, beta_target,
                          obs_list=[np.asarray(e, dtype=np.float64) ** 2
                                    for e in e_list])
    return float(beta_target**2 * (e2 - e_mean * e_mean))


def bar(du_forward, du_reverse, n_iter: int = 200, tol: float = 1e-12
        ) -> float:
    """Bennett acceptance ratio: the minimum-variance two-state free-energy
    difference from overlap sampling (Bennett 1976).

    ``du_forward``: samples of beta*(U_1 - U_0) drawn in state 0;
    ``du_reverse``: samples of beta*(U_0 - U_1) drawn in state 1.
    Returns beta*dF = -ln(Z_1/Z_0).

    Implemented as the K=2 MBAR self-consistency (equivalent to Bennett's
    optimal-C equation) on the pooled samples.  MBAR is invariant to a
    per-sample shift of all reduced potentials, so only the differences
    w_F/w_R are needed: on forward samples (u_0, u_1) -> (0, w_F), on
    reverse samples (u_0, u_1) -> (w_R, 0).  Both free-energy equations
    are iterated and renormalized (f_0 = 0), exactly as :func:`wham` does
    for the temperature family; the start is the midpoint of the two
    one-sided (Zwanzig) estimates."""
    wf = np.asarray(du_forward, dtype=np.float64).reshape(-1)
    wr = np.asarray(du_reverse, dtype=np.float64).reshape(-1)
    if wf.size == 0 or wr.size == 0:
        raise ValueError("BAR needs samples from BOTH states "
                         "(one-sided: use -logsumexp(-du)+ln n directly)")
    ln_n = np.array([math.log(wf.size), math.log(wr.size)])
    # reduced-potential matrix u[k, i] over the pooled samples
    u = np.block([[np.zeros(wf.size), wr],
                  [wf, np.zeros(wr.size)]])
    # start from the two one-sided (Zwanzig) estimates' midpoint
    zf = -(_logsumexp(-wf) - ln_n[0])
    zr = _logsumexp(-wr) - ln_n[1]
    f = np.array([0.0, 0.5 * (zf + zr)])
    for _ in range(n_iter):
        ln_den = _logsumexp(ln_n[:, None] + f[:, None] - u, axis=0)
        f_new = -_logsumexp(-u - ln_den[None, :], axis=1)
        f_new = f_new - f_new[0]
        delta = np.max(np.abs(f_new - f))
        f = f_new
        if delta < tol:
            break
    return float(f[1])


def wham_free_energy(e_list, betas, f, beta_target: float) -> float:
    """Reduced free energy -ln(Z(beta_target)/Z(beta_0)) at an arbitrary
    target temperature (beta_0 = betas[0], the f[0] = 0 anchor)."""
    e_all, betas, n_k = _stack(e_list, betas)
    ln_n = np.log(n_k.astype(np.float64))
    ln_den = _logsumexp(ln_n[:, None] + f[:, None]
                        - betas[:, None] * e_all[None, :], axis=0)
    return float(-_logsumexp(-beta_target * e_all - ln_den))
