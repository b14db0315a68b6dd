"""Observables: energy traces, acceptance, g(r), pressure / equation of state.

The reference's only observables are the dE-accumulated per-sweep energy trace
(kernel.cu:672-680, printed kernel.cu:695) and trajectory dumps; acceptance is
counted but never reported (kernel.cu:228,413).  mcjax adds the statistical
observables the BASELINE.json parity gate needs: radial distribution function,
virial pressure for continuous potentials, and the contact-value equation of
state for hard particles.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.geometry import min_image
from mcjax.models.potentials import (HardSphere, LennardJones, Potential,
                                     pair_interaction)


def energy_trace(e0: jax.Array, delta_e: jax.Array) -> jax.Array:
    """Per-sweep total energy: E_t = E_0 + cumsum(accepted dE) — the
    reference's trace semantics (kernel.cu:680)."""
    return e0 + jnp.cumsum(delta_e)


def acceptance_ratio(accepted: jax.Array, proposed: jax.Array) -> jax.Array:
    return jnp.sum(accepted) / jnp.maximum(jnp.sum(proposed), 1)


@partial(jax.jit, static_argnums=(2, 4))
def radial_distribution(positions: jax.Array, box_length: float,
                        n_bins: int, r_max: float,
                        dim: int) -> tuple[jax.Array, jax.Array]:
    """g(r) histogram from an O(N^2) distance pass (test/analysis scale).

    Returns (bin centers [n_bins], g values [n_bins]).
    """
    n = positions.shape[0]
    disp = min_image(positions[:, None, :] - positions[None, :, :], box_length)
    r = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    iu = jnp.triu_indices(n, k=1)
    r = r[iu]
    dr = r_max / n_bins
    bins = jnp.floor(r / dr).astype(jnp.int32)
    counts = jnp.zeros((n_bins,), jnp.float32).at[bins].add(
        jnp.where(r < r_max, 1.0, 0.0), mode="drop")
    centers = (jnp.arange(n_bins) + 0.5) * dr
    volume = box_length**dim
    rho = n / volume
    if dim == 2:
        shell = 2.0 * math.pi * centers * dr
    else:
        shell = 4.0 * math.pi * centers**2 * dr
    # counts holds each unordered pair once; ideal-gas pair count in a shell
    # is N * rho * shell / 2
    ideal = n * rho * shell / 2.0
    return centers, counts / ideal


def virial_pressure(pot: Potential, positions: jax.Array, box_length: float,
                    beta: float, dim: int) -> jax.Array:
    """P = rho/beta + W/(dim V) with W = sum_{i<j} (-r dV/dr)  (continuous pots).

    Implemented with autodiff on the pair energy so it works for any smooth
    potential: w(r2) = -2 r2 * d(pair_energy)/d(r2).
    """
    n = positions.shape[0]
    disp = min_image(positions[:, None, :] - positions[None, :, :], box_length)
    r2 = jnp.sum(disp * disp, axis=-1)
    iu = jnp.triu_indices(n, k=1)
    r2 = r2[iu]
    de_dr2 = jax.vmap(jax.grad(lambda s: jnp.sum(pot.pair_energy(s[None]))))(r2)
    w = -2.0 * r2 * de_dr2
    volume = box_length**dim
    rho = n / volume
    return rho / beta + jnp.sum(w) / (dim * volume)


@partial(jax.jit, static_argnums=(2, 4, 5))
def contact_shell_gr(positions: jax.Array, box_length: float, dim: int,
                     diameter: float, n_bins: int,
                     window: float) -> tuple[jax.Array, jax.Array]:
    """g(r) histogrammed only over the contact shell r in [d, d(1+window)).

    All bins sit above contact (a histogram from r=0 wastes nearly every bin
    below d and leaves the extrapolation starved), which is what makes the
    contact-value extrapolation accurate.
    """
    n = positions.shape[0]
    disp = min_image(positions[:, None, :] - positions[None, :, :], box_length)
    r = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    iu = jnp.triu_indices(n, k=1)
    r = r[iu]
    dr = diameter * window / n_bins
    bins = jnp.floor((r - diameter) / dr).astype(jnp.int32)
    inside = (r >= diameter) & (r < diameter * (1.0 + window))
    counts = jnp.zeros((n_bins,), jnp.float32).at[bins].add(
        jnp.where(inside, 1.0, 0.0), mode="drop")
    centers = diameter + (jnp.arange(n_bins) + 0.5) * dr
    rho = n / box_length**dim
    shell = (2.0 * math.pi * centers * dr if dim == 2
             else 4.0 * math.pi * centers**2 * dr)
    ideal = n * rho * shell / 2.0
    return centers, counts / ideal


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def contact_shell_gr_cells(cfg, pos: jax.Array, occ: jax.Array,
                           diameter: float, n_bins: int,
                           window: float) -> jax.Array:
    """Cell-list contact-shell g(r) — O(N x neighborhood), usable at N >= 1M
    where the O(N^2) pass is impossible. Takes the color-blocked state
    directly. Returns the g values on the same bins as contact_shell_gr.
    """
    from mcjax.ops import cells as _cells

    # The one-ring neighbor stack only sees pairs with per-axis cell
    # separation <= 1, i.e. it is complete only out to r = cell_width; a
    # wider shell would be silently biased low (ADVICE r1).
    if diameter * (1.0 + window) > cfg.cell_width + 1e-9:
        raise ValueError(
            f"contact shell extends to {diameter * (1 + window)} but "
            f"cell_width is {cfg.cell_width}; one-ring coverage would miss "
            "pairs — enlarge cells or shrink the window")

    nmax, dim = cfg.nmax, cfg.dim
    dr = diameter * window / n_bins
    lo2 = diameter * diameter
    hi = diameter * (1.0 + window)
    counts = jnp.zeros((n_bins,), jnp.float32)
    n_tot = jnp.sum(occ)

    def add_pairs(counts, r2, valid):
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        inside = valid & (r2 >= lo2) & (r < hi)
        bins = jnp.floor((r - diameter) / dr).astype(jnp.int32)
        # each ordered pair appears exactly twice across the color loop
        return counts.at[bins.ravel()].add(
            jnp.where(inside, 0.5, 0.0).ravel(), mode="drop")

    for color in range(cfg.n_colors):
        own = pos[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        # intra-cell (ordered pairs i != j)
        d = min_image(own[:, :, None] - own[:, None, :], box_length=cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        counts = add_pairs(counts, r2, vv)
        # cross-cell (ordered: every pair seen from both sides over colors)
        nbr_pos, nbr_occ = _cells.neighbor_stack(cfg, pos, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :, :, None] - nbr_pos[:, :, None, :]
        r2x = jnp.sum(dx * dx, axis=1)
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        counts = add_pairs(counts, r2x, vx)

    centers = diameter + (jnp.arange(n_bins) + 0.5) * dr
    rho = n_tot / cfg.box_length**dim
    shell = (2.0 * math.pi * centers * dr if dim == 2
             else 4.0 * math.pi * centers**2 * dr)
    ideal = n_tot * rho * shell / 2.0
    return counts / ideal


@partial(jax.jit, static_argnums=(0, 3, 4))
def radial_distribution_cells(cfg, pos: jax.Array, occ: jax.Array,
                              n_bins: int, r_max: float
                              ) -> tuple[jax.Array, jax.Array]:
    """Full g(r) histogram from the cell-list state — O(N x neighborhood).

    The production-scale counterpart of ``radial_distribution`` (whose O(N^2)
    pass dies at the N=1M flagship workload): same bins, same normalization,
    parity-tested. Requires r_max <= cell_width (the one-ring neighbor stack
    is only complete out to one cell width).
    """
    from mcjax.ops import cells as _cells

    if r_max > cfg.cell_width + 1e-9:
        raise ValueError(
            f"r_max {r_max} > cell_width {cfg.cell_width}: one-ring coverage "
            "is incomplete beyond one cell width — reduce r_max or enlarge "
            "cells")

    nmax, dim = cfg.nmax, cfg.dim
    dr = r_max / n_bins
    counts = jnp.zeros((n_bins,), jnp.float32)
    n_tot = jnp.sum(occ)

    def add_pairs(counts, r2, valid):
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        inside = valid & (r2 > 1e-12) & (r < r_max)
        bins = jnp.floor(r / dr).astype(jnp.int32)
        # each ordered pair appears exactly twice across the color loop
        return counts.at[bins.ravel()].add(
            jnp.where(inside, 0.5, 0.0).ravel(), mode="drop")

    for color in range(cfg.n_colors):
        own = pos[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = min_image(own[:, :, None] - own[:, None, :],
                      box_length=cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        counts = add_pairs(counts, r2, vv)
        nbr_pos, nbr_occ = _cells.neighbor_stack(cfg, pos, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :, :, None] - nbr_pos[:, :, None, :]
        r2x = jnp.sum(dx * dx, axis=1)
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        counts = add_pairs(counts, r2x, vx)

    centers = (jnp.arange(n_bins) + 0.5) * dr
    rho = n_tot / cfg.box_length**dim
    shell = (2.0 * math.pi * centers * dr if dim == 2
             else 4.0 * math.pi * centers**2 * dr)
    ideal = n_tot * rho * shell / 2.0
    return centers, counts / ideal


@partial(jax.jit, static_argnums=(0, 1, 4))
def virial_pressure_cells(cfg, pot: Potential, pos: jax.Array,
                          occ: jax.Array, beta: float) -> jax.Array:
    """Virial pressure from the cell-list state — the N >= 1M counterpart of
    ``virial_pressure`` (parity-tested). Needs pot.r_cut <= cell_width, which
    SimConfig.validate_against already enforces for any running simulation.
    """
    from mcjax.ops import cells as _cells

    nmax, dim = cfg.nmax, cfg.dim
    n_tot = jnp.sum(occ)

    def pair_w(r2, valid):
        # w(r2) = -2 r2 dV/dr2 == -r dV/dr, elementwise via autodiff
        de_dr2 = jax.grad(lambda s: jnp.sum(pot.pair_energy(s)))(r2)
        return jnp.sum(jnp.where(valid, -2.0 * r2 * de_dr2, 0.0))

    w_sum = jnp.float32(0.0)
    for color in range(cfg.n_colors):
        own = pos[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = min_image(own[:, :, None] - own[:, None, :],
                      box_length=cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        w_sum = w_sum + 0.5 * pair_w(r2, vv)
        nbr_pos, nbr_occ = _cells.neighbor_stack(cfg, pos, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :, :, None] - nbr_pos[:, :, None, :]
        r2x = jnp.sum(dx * dx, axis=1)
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        w_sum = w_sum + 0.5 * pair_w(r2x, vx)

    volume = cfg.box_length**dim
    rho = n_tot / volume
    return rho / beta + w_sum / (dim * volume)


def hard_disk_eos_state(cfg, states_pos_occ, diameter: float,
                        n_bins: int = 12, window: float = 0.05,
                        order: int = 2) -> float:
    """hard_disk_eos over (pos, occ) state snapshots via the cell-list
    histogram — the large-N path (melting sweeps at N >= 1M)."""
    snaps = states_pos_occ if isinstance(states_pos_occ, list) \
        else [states_pos_occ]
    g_sum = None
    for p, o in snaps:
        g = contact_shell_gr_cells(cfg, p, o, diameter, n_bins, window)
        g_sum = g if g_sum is None else g_sum + g
    g_mean = np.asarray(g_sum) / len(snaps)
    dr = diameter * window / n_bins
    centers = diameter + (np.arange(n_bins) + 0.5) * dr
    coef = np.polyfit(centers, g_mean, min(order, n_bins - 1))
    g_contact = float(np.polyval(coef, diameter))
    n = int(np.asarray(jnp.sum(snaps[0][1])))
    volume = cfg.box_length**cfg.dim
    if cfg.dim == 2:
        phi = n * math.pi * diameter**2 / 4.0 / volume
        return 1.0 + 2.0 * phi * g_contact
    phi = n * math.pi * diameter**3 / 6.0 / volume
    return 1.0 + 4.0 * phi * g_contact


def hard_disk_eos(positions, box_length: float, diameter: float,
                  dim: int, n_bins: int = 12,
                  window: float = 0.05, order: int = 2) -> float:
    """Compressibility factor Z = P/(rho kT) from the contact value g(d+).

    Hard spheres: Z = 1 + 4 phi g(d+); hard disks: Z = 1 + 2 phi g(d+), with
    phi the packing fraction. g(d+) comes from a polynomial fit of the
    contact-shell g(r) extrapolated to r = d. ``positions`` may be one
    [N, dim] snapshot or a sequence of snapshots (histograms accumulate —
    use several decorrelated snapshots for production estimates).

    Validated against the Henderson closed form at phi=0.5 (~2% with 30
    snapshots of N=1024; the wide-window linear variant of this estimator
    biases Z low by ~13%).
    """
    snaps = positions if isinstance(positions, (list, tuple)) else [positions]
    n = snaps[0].shape[0]
    g_sum = None
    for s in snaps:
        centers, g = contact_shell_gr(s, box_length, dim, diameter, n_bins,
                                      window)
        g_sum = g if g_sum is None else g_sum + g
    g_mean = np.asarray(g_sum) / len(snaps)
    centers = np.asarray(centers)
    coef = np.polyfit(centers, g_mean, min(order, n_bins - 1))
    g_contact = float(np.polyval(coef, diameter))
    volume = box_length**dim
    if dim == 2:
        phi = n * math.pi * diameter**2 / 4.0 / volume
        return 1.0 + 2.0 * phi * g_contact
    phi = n * math.pi * diameter**3 / 6.0 / volume
    return 1.0 + 4.0 * phi * g_contact


@partial(jax.jit, static_argnums=(0, 3))
def _psi6_field(cfg, pos: jax.Array, occ: jax.Array, r_cut: float
                ) -> tuple[jax.Array, jax.Array]:
    """Per-particle psi_6 on the slab layout: (re, im) [n_colors, nmax, *bs],
    psi_6(i) = (1/n_i) sum_j exp(6 i theta_ij) over bonds r_ij < r_cut.
    Dead slots hold 0."""
    from mcjax.ops import cells as _cells

    nmax, dim = cfg.nmax, cfg.dim
    assert dim == 2, "psi_6 is a 2D observable"
    if r_cut > cfg.cell_width + 1e-9:
        raise ValueError(
            f"psi_6 r_cut {r_cut} > cell_width {cfg.cell_width}: one-ring "
            "neighbor coverage would silently miss bonds (ADVICE r1)")

    def accumulate(dx, dy, valid):
        r2 = dx * dx + dy * dy
        ok = valid & (r2 > 1e-6) & (r2 < r_cut * r_cut)
        # cos/sin(6 theta) via Chebyshev on (c, s) = (dx, dy)/r
        inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-6))
        c, s = dx * inv, dy * inv
        c2, s2 = c * c - s * s, 2 * c * s
        c3, s3 = c2 * c - s2 * s, s2 * c + c2 * s
        c6, s6 = c3 * c3 - s3 * s3, 2 * s3 * c3
        w = ok.astype(jnp.float32)
        return w, w * c6, w * s6

    res, ims = [], []
    for color in range(cfg.n_colors):
        own = pos[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        # intra-cell bonds (i -> j, ordered)
        d = own[:, :, None] - own[:, None, :]
        vv = (valid_i[:, None] & valid_i[None, :])
        w, c6, s6 = accumulate(d[0], d[1], vv)
        # neighbor-cell bonds
        nbr_pos, nbr_occ = _cells.neighbor_stack(cfg, pos, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :, :, None] - nbr_pos[:, :, None, :]
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        wn, c6n, s6n = accumulate(dx[:, 0], dx[:, 1], vx)
        # per-particle normalization: psi6(i) = sum_j e^{6 i theta} / n_i
        n_i = jnp.sum(w, axis=1) + jnp.sum(wn, axis=(0, 2))      # [nmax,*bs]
        re_i = jnp.sum(c6, axis=1) + jnp.sum(c6n, axis=(0, 2))
        im_i = jnp.sum(s6, axis=1) + jnp.sum(s6n, axis=(0, 2))
        denom = jnp.maximum(n_i, 1.0)
        live = valid_i.astype(jnp.float32)
        res.append(live * re_i / denom)
        ims.append(live * im_i / denom)
    return jnp.stack(res), jnp.stack(ims)


def psi6_cells(cfg, pos: jax.Array, occ: jax.Array,
               r_cut: float = 1.4) -> jax.Array:
    """Global 2D bond-orientational order |<psi_6>| from the cell-list state.

    psi_6(i) = (1/n_i) sum_j exp(6 i theta_ij) over neighbors j with
    r_ij < r_cut (~first g(r) minimum, ~1.4 diameters). Distinguishes the
    2D solid/hexatic (|psi_6| large) from the liquid (~0) — the order
    parameter for the hard-disk melting study (Bernard & Krauth 2011).
    O(N x neighborhood); usable at N >= 1M. Requires cell_width >= r_cut.
    """
    re_f, im_f = _psi6_field(cfg, pos, occ, r_cut)
    n_tot = jnp.sum(occ)
    return jnp.sqrt(jnp.sum(re_f)**2 + jnp.sum(im_f)**2) \
        / jnp.maximum(n_tot, 1)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def psi6_correlation_cells(cfg, pos: jax.Array, occ: jax.Array,
                           n_bins: int, r_max: float,
                           r_cut_bond: float = 1.4
                           ) -> tuple[jax.Array, jax.Array]:
    """Bond-orientational correlation g_6(r) = <psi_6(i) psi_6*(j)>_{r_ij=r}
    (pair-averaged, real part) from the cell-list state — THE diagnostic
    that separates the three 2D melting phases (Bernard & Krauth 2011):
    solid g_6 -> const, hexatic g_6 ~ r^{-eta} (eta <= 1/4), liquid
    exponential decay.  Complements the scalar |<psi_6>| (psi6_cells) the
    melting study already reports.

    Two one-ring passes: (1) the per-particle psi_6 field, (2) pair
    binning with the (re, im) planes riding the neighbor stack exactly
    like the mixture species plane (coordinate planes unwrap, field
    planes pass through untouched).  Requires r_max <= cell_width.
    O(N x neighborhood); usable at N >= 1M.
    """
    from mcjax.ops import cells as _cells

    if r_max > cfg.cell_width + 1e-9:
        raise ValueError(
            f"r_max {r_max} > cell_width {cfg.cell_width}: one-ring "
            "coverage is incomplete beyond one cell width")
    nmax, dim = cfg.nmax, cfg.dim
    re_f, im_f = _psi6_field(cfg, pos, occ, r_cut_bond)
    # field rides as extra planes: [colors, dim + 2, nmax, *bs]
    field = jnp.concatenate([pos, re_f[:, None], im_f[:, None]], axis=1)

    dr = r_max / n_bins
    corr = jnp.zeros((n_bins,), jnp.float32)
    cnt = jnp.zeros((n_bins,), jnp.float32)

    def add_pairs(corr, cnt, r2, c_ij, valid):
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        inside = valid & (r2 > 1e-12) & (r < r_max)
        bins = jnp.floor(r / dr).astype(jnp.int32).ravel()
        w = jnp.where(inside, 0.5, 0.0).ravel()   # ordered pairs seen twice
        corr = corr.at[bins].add(w * c_ij.ravel(), mode="drop")
        cnt = cnt.at[bins].add(w, mode="drop")
        return corr, cnt

    for color in range(cfg.n_colors):
        own = field[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = min_image(own[:dim, :, None] - own[:dim, None, :],
                      box_length=cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        c_ij = (own[dim, :, None] * own[dim, None, :]
                + own[dim + 1, :, None] * own[dim + 1, None, :])
        vv = valid_i[:, None] & valid_i[None, :]
        corr, cnt = add_pairs(corr, cnt, r2, c_ij, vv)
        nbr, nbr_occ = _cells.neighbor_stack(cfg, field, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :dim, :, None] - nbr[:, :dim, None, :]
        r2x = jnp.sum(dx * dx, axis=1)
        c_ijx = (own[None, dim, :, None] * nbr[:, dim, None, :]
                 + own[None, dim + 1, :, None] * nbr[:, dim + 1, None, :])
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        corr, cnt = add_pairs(corr, cnt, r2x, c_ijx, vx)

    centers = (jnp.arange(n_bins) + 0.5) * dr
    return centers, corr / jnp.maximum(cnt, 1.0)


def _legendre_derivative_coeffs(l: int, m: int) -> np.ndarray:
    """Ascending-power coefficients of d^m P_l / dz^m (trace-time numpy)."""
    c = np.zeros(l + 1)
    c[l] = 1.0
    coeffs = np.polynomial.legendre.leg2poly(c)
    for _ in range(m):
        coeffs = np.polynomial.polynomial.polyder(coeffs)
    return np.asarray(coeffs, np.float64)


def _ql_sums(cfg, pos: jax.Array, occ: jax.Array, r_cut: float, l: int):
    """Bond-averaged spherical-harmonic sums for the Steinhardt order
    parameters: per-particle (sum_j Y_lm(u_ij), n_i) for m = 0..l on the
    slab layout (negative m follow by conjugate symmetry).

    Y_lm on a UNIT bond vector u = (x, y, z) factorizes polynomially:
    Y_lm = K_lm * [d^m P_l/dz^m](z) * (x + i y)^m — the (sin theta)^m of the
    associated Legendre function cancels against |x + i y|^m, so no
    trigonometry is needed (the 3D generalization of _psi6_field's
    Chebyshev chain; the Condon-Shortley sign drops out of |q_lm|^2).

    Returns (re, im, n_i): re/im are [l+1, n_colors, nmax, *bs], n_i is
    [n_colors, nmax, *bs] bond counts; dead slots hold 0.
    """
    from mcjax.ops import cells as _cells

    nmax, dim = cfg.nmax, cfg.dim
    assert dim == 3, "Steinhardt q_l is a 3D observable (2D: psi6_cells)"
    if r_cut > cfg.cell_width + 1e-9:
        raise ValueError(
            f"q_{l} r_cut {r_cut} > cell_width {cfg.cell_width}: one-ring "
            "neighbor coverage would silently miss bonds")
    polys = [_legendre_derivative_coeffs(l, m) for m in range(l + 1)]
    k_lm = [math.sqrt((2 * l + 1) / (4 * math.pi)
                      * math.factorial(l - m) / math.factorial(l + m))
            for m in range(l + 1)]

    def horner(coeffs, z):
        acc = jnp.full_like(z, float(coeffs[-1]))
        for a in coeffs[-2::-1]:
            acc = acc * z + float(a)
        return acc

    def accumulate(d, valid, reduce_axes):
        """d: [3, ...bond shape]; returns per-m (re, im) sums over
        reduce_axes plus the bond count."""
        r2 = jnp.sum(d * d, axis=0)
        ok = valid & (r2 > 1e-6) & (r2 < r_cut * r_cut)
        inv = jax.lax.rsqrt(jnp.maximum(r2, 1e-6))
        ux, uy, uz = d[0] * inv, d[1] * inv, d[2] * inv
        w = ok.astype(jnp.float32)
        res, ims = [], []
        cr, ci = w, jnp.zeros_like(w)          # w * (ux + i uy)^m, m = 0
        for m in range(l + 1):
            a = k_lm[m] * horner(polys[m], uz)
            res.append(jnp.sum(a * cr, axis=reduce_axes))
            ims.append(jnp.sum(a * ci, axis=reduce_axes))
            cr, ci = cr * ux - ci * uy, cr * uy + ci * ux
        return (jnp.stack(res), jnp.stack(ims),
                jnp.sum(w, axis=reduce_axes))

    res, ims, cnts = [], [], []
    for color in range(cfg.n_colors):
        own = pos[color]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = own[:dim, :, None] - own[:dim, None, :]
        vv = valid_i[:, None] & valid_i[None, :]
        re_c, im_c, n_c = accumulate(d, vv, reduce_axes=1)
        nbr_pos, nbr_occ = _cells.neighbor_stack(cfg, pos, occ, color)
        valid_j = slot[None] < nbr_occ[:, None]
        dx = own[None, :dim, :, None] - nbr_pos[:, :dim, None, :]
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        re_n, im_n, n_n = accumulate(jnp.moveaxis(dx, 1, 0), vx,
                                     reduce_axes=(0, 2))
        live = valid_i.astype(jnp.float32)
        res.append(live * (re_c + re_n))
        ims.append(live * (im_c + im_n))
        cnts.append(live * (n_c + n_n))
    return (jnp.stack(res, axis=1), jnp.stack(ims, axis=1),
            jnp.stack(cnts, axis=0))


@partial(jax.jit, static_argnums=(0, 3, 4))
def ql_cells(cfg, pos: jax.Array, occ: jax.Array, r_cut: float,
             l: int = 6) -> jax.Array:
    """Global Steinhardt bond-orientational order Q_l from the cell-list
    state: Q_l = sqrt(4 pi/(2l+1) sum_m |<Y_lm>_bonds|^2), bonds r < r_cut.

    The 3D solid diagnostic (Steinhardt, Nelson & Ronchetti 1983) —
    Q6 = 0.5745 (fcc), 0.4848 (hcp), 0.5107 (bcc w/ 14 neighbors),
    0.3536 (sc); an N-bond liquid reads ~(number of bonds)^{-1/2}.
    O(N x neighborhood); usable at N >= 1M. Requires cell_width >= r_cut.
    Even l only (directed bonds count twice by Y_lm(-u) = Y_lm(u)).
    """
    re_f, im_f, n_i = _ql_sums(cfg, pos, occ, r_cut, l)
    n_b = jnp.maximum(jnp.sum(n_i), 1.0)
    re_m = jnp.sum(re_f, axis=tuple(range(1, re_f.ndim))) / n_b   # [l+1]
    im_m = jnp.sum(im_f, axis=tuple(range(1, im_f.ndim))) / n_b
    mag2 = re_m ** 2 + im_m ** 2
    weight = jnp.asarray([1.0] + [2.0] * l, jnp.float32)   # +/-m pairs
    return jnp.sqrt(4 * math.pi / (2 * l + 1) * jnp.sum(weight * mag2))


@partial(jax.jit, static_argnums=(0, 3, 4))
def ql_local_cells(cfg, pos: jax.Array, occ: jax.Array, r_cut: float,
                   l: int = 6) -> tuple[jax.Array, jax.Array]:
    """Per-particle Steinhardt q_l(i) field + its live mask:
    q_l(i) = sqrt(4 pi/(2l+1) sum_m |q_lm(i)|^2) with q_lm(i) the
    bond average over i's neighbors. Unlike the global Q_l this does not
    vanish in the liquid (~0.28-0.35 for q6) — use the distribution /
    threshold (q6 > ~0.5) as a per-particle crystallinity label.
    Returns (field, live) both [n_colors, nmax, *bs]; dead slots 0."""
    re_f, im_f, n_i = _ql_sums(cfg, pos, occ, r_cut, l)
    denom = jnp.maximum(n_i, 1.0)
    mag2 = (re_f / denom) ** 2 + (im_f / denom) ** 2
    weight = jnp.asarray([1.0] + [2.0] * l, jnp.float32)
    weight = weight.reshape((l + 1,) + (1,) * n_i.ndim)
    q_i = jnp.sqrt(4 * math.pi / (2 * l + 1)
                   * jnp.sum(weight * mag2, axis=0))
    live = (n_i > 0).astype(jnp.float32)
    return q_i * live, live


@partial(jax.jit, static_argnums=(0, 1, 5))
def widom_insertion(cfg, pot: Potential, pos: jax.Array, occ: jax.Array,
                    key: jax.Array, n_test: int,
                    beta: float | None = None) -> jax.Array:
    """Widom test-particle insertion: mean Boltzmann factor <e^{-beta dU}>
    over ``n_test`` ghost insertions (excess chemical potential
    mu_ex = -ln<B>/beta; for hard models <B> is the insertion probability).

    Cell-list lookup per test point (O(n_test x 3^dim x nmax)), so it runs
    at production N where an O(n_test x N) pass would not. The reference has
    no free-energy observables at all; this extends SURVEY.md §5's metrics
    row beyond parity.
    """
    from mcjax.ops import cells as _cells

    dim, nmax, cps = cfg.dim, cfg.nmax, cfg.cells_per_side
    if beta is None:
        beta = cfg.beta
    L = cfg.box_length
    pts = jax.random.uniform(key, (n_test, dim), minval=-L / 2.0,
                             maxval=L / 2.0)

    # flat slab view matching cells._flat_slot's (color, block) layout
    n_cells = cfg.n_colors * cfg.cells_per_color
    flat_pos = jnp.moveaxis(pos.reshape(cfg.n_colors, dim, nmax, -1),
                            -1, 1).reshape(n_cells, dim, nmax)
    flat_occ = occ.reshape(-1)

    c = _cells.cell_coords(cfg, pts)                      # [T, dim]
    offs = jnp.asarray(_cells.neighbor_offsets(dim, include_center=True),
                       jnp.int32)                         # [K, dim]
    nbr_c = jnp.mod(c[:, None, :] + offs[None], cps)      # [T, K, dim]
    slot = _cells._flat_slot(cfg, nbr_c)                  # [T, K]

    slabs = flat_pos[slot]                                # [T, K, dim, nmax]
    counts = flat_occ[slot]                               # [T, K]
    d = min_image(pts[:, None, :, None] - slabs, L)
    r2 = jnp.sum(d * d, axis=2)                           # [T, K, nmax]
    valid = jnp.arange(nmax)[None, None, :] < counts[:, :, None]
    e, ov = pair_interaction(pot, r2, valid)
    du = jnp.sum(e, axis=(1, 2))                          # [T]
    overlap = jnp.any(ov, axis=(1, 2))
    b = jnp.where(overlap, 0.0, jnp.exp(-beta * du) if pot.has_energy
                  else 1.0)
    return jnp.mean(b)


@partial(jax.jit, static_argnums=(0, 1, 5))
def widom_insertion_species(cfg, pot: Potential, pos: jax.Array,
                            occ: jax.Array, key: jax.Array, n_test: int,
                            species: int | jax.Array = 0,
                            beta: float | None = None) -> jax.Array:
    """Widom insertion of a ghost particle of one SPECIES into a mixture
    state: <e^{-beta dU}> with per-pair (eps, sigma, r_cut) resolved from
    the slab species plane — the species-resolved excess chemical
    potential mu_ex,s = -ln<B_s>/beta that pairs with the semi-grand
    ensemble's beta*mu_s knobs (ops/semigrand.py).

    ``pos`` must carry the species attribute plane (init_mixture_state
    layout, planes = dim+1); the reference has neither mixtures nor any
    free-energy observable (kernel.cu:17-29)."""
    from mcjax.ops import cells as _cells

    dim, nmax, cps = cfg.dim, cfg.nmax, cfg.cells_per_side
    if beta is None:
        beta = cfg.beta
    L = cfg.box_length
    s_ghost = jnp.asarray(species, jnp.int32)
    pts = jax.random.uniform(key, (n_test, dim), minval=-L / 2.0,
                             maxval=L / 2.0)

    n_planes = pos.shape[1]
    n_cells = cfg.n_colors * cfg.cells_per_color
    flat_pos = jnp.moveaxis(pos.reshape(cfg.n_colors, n_planes, nmax, -1),
                            -1, 1).reshape(n_cells, n_planes, nmax)
    flat_occ = occ.reshape(-1)

    c = _cells.cell_coords(cfg, pts)                      # [T, dim]
    offs = jnp.asarray(_cells.neighbor_offsets(dim, include_center=True),
                       jnp.int32)
    nbr_c = jnp.mod(c[:, None, :] + offs[None], cps)      # [T, K, dim]
    slot = _cells._flat_slot(cfg, nbr_c)                  # [T, K]

    slabs = flat_pos[slot]                          # [T, K, n_planes, nmax]
    counts = flat_occ[slot]                               # [T, K]
    d = min_image(pts[:, None, :, None] - slabs[:, :, :dim], L)
    r2 = jnp.sum(d * d, axis=2)                           # [T, K, nmax]
    sj = slabs[:, :, dim].astype(jnp.int32)               # [T, K, nmax]
    valid = jnp.arange(nmax)[None, None, :] < counts[:, :, None]
    du = jnp.zeros(pts.shape[0], jnp.float32)
    overlap = jnp.zeros(pts.shape[0], jnp.bool_)
    if pot.has_energy:
        e = pot.pair_energy_s(r2, s_ghost, sj)
        du = jnp.sum(jnp.where(valid, e, 0.0), axis=(1, 2))
    if pot.has_hard_core:
        ov = pot.overlap_s(r2, s_ghost, sj)
        overlap = jnp.any(valid & ov, axis=(1, 2))
    b = jnp.where(overlap, 0.0, jnp.exp(-beta * du) if pot.has_energy
                  else 1.0)
    return jnp.mean(b)


def henderson_z_disks(phi: float) -> float:
    """Henderson (1975) hard-disk EOS Z(phi) — literature closed form used as
    the parity target for the hard-disk equation of state."""
    return (1.0 + phi**2 / 8.0) / (1.0 - phi) ** 2


def carnahan_starling_z(phi: float) -> float:
    """Carnahan-Starling hard-sphere EOS Z(phi) — 3D parity target."""
    return (1.0 + phi + phi**2 - phi**3) / (1.0 - phi) ** 3


# ---------------------------------------------------------------------------
# Structure factor S(k)
# ---------------------------------------------------------------------------

def k_lattice(cfg, k_max: float, include_axes_only: bool = False
              ) -> np.ndarray:
    """Commensurate wavevectors k = (2 pi / L) n with 0 < |k| <= k_max.

    Returns [K, dim] float32 (half-space: the -k duplicates are dropped
    since S(-k) = S(k) for real densities).
    """
    dk = 2.0 * math.pi / cfg.box_length
    n_max = int(k_max / dk)
    if n_max < 1:
        raise ValueError(f"k_max {k_max} below the smallest lattice "
                         f"wavevector {dk:.4f}")
    rng = np.arange(-n_max, n_max + 1)
    grids = np.meshgrid(*([rng] * cfg.dim), indexing="ij")
    n = np.stack([g.ravel() for g in grids], axis=-1)       # [M, dim]
    k2 = (n * n).sum(-1)
    keep = (k2 > 0) & (k2 <= n_max * n_max + 1e-9)
    # half space: first nonzero component positive
    lead = np.zeros(len(n), bool)
    undecided = np.ones(len(n), bool)
    for d in range(cfg.dim):
        lead |= undecided & (n[:, d] > 0)
        undecided &= n[:, d] == 0
    keep &= lead
    if include_axes_only:
        keep &= (np.count_nonzero(n, axis=1) == 1)
    kv = n[keep] * dk
    k_abs = np.sqrt((kv * kv).sum(-1))
    return kv[k_abs <= k_max + 1e-9].astype(np.float32)


@partial(jax.jit, static_argnums=(0,))
def structure_factor_cells(cfg, pos: jax.Array, occ: jax.Array,
                           k_vectors: jax.Array) -> jax.Array:
    """S(k) = |sum_j exp(i k . r_j)|^2 / N at the given wavevectors, by
    direct summation over the cell-list state — O(N x K), usable at the
    1M-atom flagship scale where an FFT-from-g(r) route is unavailable
    (g(r) is only known out to one cell width).

    The reference has no reciprocal-space observables at all (SURVEY.md §5
    metrics row); S(k) is the standard freezing/ordering diagnostic.
    """
    dim, nmax = cfg.dim, cfg.nmax
    kv = jnp.asarray(k_vectors, jnp.float32)               # [K, dim]
    n_tot = jnp.sum(occ)

    def one_k(k):
        re = jnp.float32(0.0)
        im = jnp.float32(0.0)
        for color in range(cfg.n_colors):
            own = pos[color]                               # [>=dim, nmax, *bs]
            own_occ = occ[color]
            bs = own_occ.shape
            sl = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
            valid = sl < own_occ[None]
            phase = jnp.zeros(own.shape[1:], jnp.float32)
            for d in range(dim):
                phase = phase + k[d] * own[d]
            re = re + jnp.sum(jnp.where(valid, jnp.cos(phase), 0.0))
            im = im + jnp.sum(jnp.where(valid, jnp.sin(phase), 0.0))
        return (re * re + im * im) / jnp.maximum(n_tot, 1)

    return jax.lax.map(one_k, kv)


def rho_k_cells(cfg, pos: jax.Array, occ: jax.Array,
                k_vectors: jax.Array) -> jax.Array:
    """Complex collective density modes rho(k) = sum_j exp(i k . r_j) over
    the cell-list state, returned as [K, 2] (real, imag) — the building
    block of the intermediate scattering function F(k, t) used for the
    decorrelation-rate comparison between the Metropolis and ECMC engines
    (scripts/bench_ecmc_decorr.py).  Same direct O(N x K) summation as
    structure_factor_cells; S(k) = |rho(k)|^2 / N."""
    dim, nmax = cfg.dim, cfg.nmax
    kv = jnp.asarray(k_vectors, jnp.float32)               # [K, dim]

    def one_k(k):
        re = jnp.float32(0.0)
        im = jnp.float32(0.0)
        for color in range(cfg.n_colors):
            own = pos[color]                               # [>=dim, nmax, *bs]
            own_occ = occ[color]
            bs = own_occ.shape
            sl = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
            valid = sl < own_occ[None]
            phase = jnp.zeros(own.shape[1:], jnp.float32)
            for d in range(dim):
                phase = phase + k[d] * own[d]
            re = re + jnp.sum(jnp.where(valid, jnp.cos(phase), 0.0))
            im = im + jnp.sum(jnp.where(valid, jnp.sin(phase), 0.0))
        return jnp.stack([re, im])

    return jax.lax.map(one_k, kv)


@partial(jax.jit, static_argnums=(0, 4))
def partial_structure_factor_cells(cfg, pos: jax.Array, occ: jax.Array,
                                   k_vectors: jax.Array,
                                   pair: tuple[int, int] = (0, 0)
                                   ) -> jax.Array:
    """Ashcroft-Langreth partial structure factor for a mixture state:
    S_ab(k) = Re[rho_a(k) rho_b(k)*] / sqrt(N_a N_b), with
    rho_s(k) = sum_{j in species s} e^{i k.r_j}.  Direct summation over
    the cell-list slabs (species read from the attribute plane), O(N x K)
    — the reciprocal-space companion of the partial RDFs
    (ops/mixture.py partial_rdf_cells), the standard diagnostic for
    chemical ordering / demixing in binary fluids."""
    dim, nmax = cfg.dim, cfg.nmax
    a, b = pair
    kv = jnp.asarray(k_vectors, jnp.float32)               # [K, dim]

    def species_sums(k):
        res = [jnp.float32(0.0)] * 2
        ims = [jnp.float32(0.0)] * 2
        ns = [jnp.float32(0.0)] * 2
        for color in range(cfg.n_colors):
            own = pos[color]                               # [dim+1, nmax, *bs]
            own_occ = occ[color]
            bs = own_occ.shape
            sl = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
            valid = sl < own_occ[None]
            sp = own[dim].round().astype(jnp.int32)
            phase = jnp.zeros(own.shape[1:], jnp.float32)
            for d in range(dim):
                phase = phase + k[d] * own[d]
            for i, s in enumerate((a, b)):
                m = valid & (sp == s)
                res[i] = res[i] + jnp.sum(jnp.where(m, jnp.cos(phase), 0.0))
                ims[i] = ims[i] + jnp.sum(jnp.where(m, jnp.sin(phase), 0.0))
                ns[i] = ns[i] + jnp.sum(m.astype(jnp.float32))
        norm = jnp.sqrt(jnp.maximum(ns[0], 1.0) * jnp.maximum(ns[1], 1.0))
        return (res[0] * res[1] + ims[0] * ims[1]) / norm

    return jax.lax.map(species_sums, kv)


def structure_factor_radial(cfg, pos: jax.Array, occ: jax.Array,
                            k_max: float, n_bins: int = 32
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Radially averaged S(|k|): bin structure_factor_cells over the
    commensurate k lattice. Returns (bin centers, S)."""
    kv = k_lattice(cfg, k_max)
    s = np.asarray(structure_factor_cells(cfg, pos, occ, kv))
    return _radial_bin(kv, s, k_max, n_bins)


def partial_structure_factor_radial(cfg, pos: jax.Array, occ: jax.Array,
                                    k_max: float, pair: tuple[int, int],
                                    n_bins: int = 32
                                    ) -> tuple[np.ndarray, np.ndarray]:
    """Radially averaged partial S_ab(|k|) for a mixture state."""
    kv = k_lattice(cfg, k_max)
    s = np.asarray(partial_structure_factor_cells(cfg, pos, occ, kv,
                                                  pair=pair))
    return _radial_bin(kv, s, k_max, n_bins)


def _radial_bin(kv: np.ndarray, s: np.ndarray, k_max: float,
                n_bins: int) -> tuple[np.ndarray, np.ndarray]:
    k_abs = np.sqrt((kv * kv).sum(-1))
    edges = np.linspace(0.0, k_max, n_bins + 1)
    idx = np.clip(np.digitize(k_abs, edges) - 1, 0, n_bins - 1)
    sums = np.bincount(idx, weights=s, minlength=n_bins)
    counts = np.bincount(idx, minlength=n_bins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    mask = counts > 0
    return centers[mask], (sums[mask] / counts[mask])
