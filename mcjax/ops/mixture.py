"""Mixture sweep engine: checkerboard Metropolis with per-pair species params.

Species transport design: the species id rides the state as ONE EXTRA
COORDINATE PLANE (pos[color, dim, ...] becomes pos[color, dim + 1, ...],
plane ``dim`` holding the id as a float). Because the cell-list transport
machinery (binning scatter, grid-shift merge, neighbor reads) moves whole
plane stacks with one shared slot selection, the id follows its particle
through every re-bin with zero extra bookkeeping — the merge cannot ever
split a particle from its species. The sweep engine slices the planes apart
only at energy-evaluation time.

Single-species analogue: mcjax.ops.sweep.color_substep (structure mirrored
line-for-line so the detailed-balance kit — in-cell rejection, uniform pick,
color shuffle, grid shift — stays identical; reference spec kernel.cu:192-206,
294-423). The reference supports no mixtures at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.geometry import min_image
from mcjax.core.state import SimState
from mcjax.ops import cells
from mcjax.ops import sweep as xs
from mcjax.ops.cells import ShiftFn, roll_shift_fn


def init_mixture_state(cfg: SimConfig, positions: jax.Array,
                       species: jax.Array, seed: int | jax.Array = 0
                       ) -> SimState:
    """Bin [N, dim] positions + [N] integer species ids into a mixture state
    (pos carries dim + 1 planes; plane ``dim`` is the species id)."""
    spec = jnp.asarray(species, jnp.float32)[:, None]
    pos, occ, overflow = cells.bin_particles(cfg, positions, extra=spec)
    key = seed if hasattr(seed, "dtype") else jax.random.PRNGKey(seed)
    return SimState(pos=pos, occ=occ, key=key,
                    sweep=jnp.zeros((), jnp.int32), overflow=overflow)


def unbin_mixture(cfg: SimConfig, pos: jax.Array, occ: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """-> ([N, dim] positions, [N] int32 species)."""
    flat = cells.unbin(cfg, pos, occ)
    return flat[:, :cfg.dim], flat[:, cfg.dim].astype(jnp.int32)


def color_substep_mixture(cfg: SimConfig, pot, color: int,
                          pos: jax.Array, occ: jax.Array, key: jax.Array,
                          shift_fn: ShiftFn = roll_shift_fn,
                          beta: jax.Array | float | None = None,
                          block_offset: jax.Array | None = None,
                          scale: jax.Array | None = None,
                          field=None,
                          origin: jax.Array | None = None
                          ) -> tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array]:
    """color_substep with species-resolved pair terms.

    pos blocks hold dim+1 planes; the species plane is frozen during moves
    (MC displacements never change identity) and re-attached on return.
    ``scale`` applies the NPT stored-frame convention (physical
    r^2 = scale^2 stored r^2, mcjax.ops.npt) — mixtures compose with NPT.
    ``field``/``origin`` add a one-body external term exactly as in
    color_substep, species-resolved when the field defines energy_s /
    forbidden_s (models/fields.py — e.g. per-species gravity).
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    if beta is None:
        beta = cfg.beta
    own = pos[color]                        # [dim+1, nmax, *bs]
    ownp = own[:dim]
    ownspec = own[dim]                      # [nmax, *bs] float ids
    own_occ = occ[color]
    bs = own_occ.shape
    nbr_all, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    nbrp = nbr_all[:, :dim]                 # [K, dim, nmax, *bs]
    nbrspec = nbr_all[:, dim]               # [K, nmax, *bs]
    lbp = xs._cell_lower_bounds(cfg, color, bs, block_offset)
    w = cfg.cell_width

    has_energy = pot.has_energy or (field is not None and field.has_energy)
    pick_u, dispp, acc_u = xs.substep_randoms(cfg, key, bs,
                                              need_acc=has_energy)
    org = None
    if field is not None:
        from mcjax.models.fields import species_energy, species_forbidden
        if origin is None:
            origin = jnp.zeros((dim,), jnp.float32)
        org = origin.reshape((dim,) + (1,) * len(bs))

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nbr_valid = slot[None] < nbr_occ[:, None]
    own_count = own_occ[None]
    nonempty = own_occ > 0

    s2 = None if scale is None else scale * scale

    def energy_at(x, sx, ownp_cur, sel):
        """(energy, overlap) of a species-sx particle at x vs its ring."""
        d_own = x[:, None] - ownp_cur
        r2_own = jnp.sum(d_own * d_own, axis=0)          # [nmax, *bs]
        if s2 is not None:
            r2_own = s2 * r2_own
        valid_own = (slot < own_count) & ~sel
        e_o = jnp.where(valid_own,
                        pot.pair_energy_s(r2_own, sx[None], ownspec), 0.0)
        ov_o = valid_own & pot.overlap_s(r2_own, sx[None], ownspec)

        d_nbr = x[None, :, None] - nbrp
        r2_nbr = jnp.sum(d_nbr * d_nbr, axis=1)          # [K, nmax, *bs]
        if s2 is not None:
            r2_nbr = s2 * r2_nbr
        e_n = jnp.where(nbr_valid,
                        pot.pair_energy_s(r2_nbr, sx[None, None], nbrspec),
                        0.0)
        ov_n = nbr_valid & pot.overlap_s(r2_nbr, sx[None, None], nbrspec)

        e = jnp.sum(e_o, axis=0) + jnp.sum(e_n, axis=(0, 1))
        ov = jnp.any(ov_o, axis=0) | jnp.any(ov_n, axis=(0, 1))
        return e, ov

    def move_body(m, carry):
        ownp_cur, de_sum, n_acc = carry
        p = jnp.floor(pick_u[m] * own_occ.astype(jnp.float32)
                      ).astype(jnp.int32)
        p = jnp.minimum(p, jnp.maximum(own_occ - 1, 0))
        sel = slot == p[None]

        old = jnp.sum(jnp.where(sel[None], ownp_cur, 0.0), axis=1)
        sx = jnp.sum(jnp.where(sel, ownspec, 0.0), axis=0)   # [*bs]
        new = old + dispp[m]

        oob = jnp.any((new < lbp) | (new >= lbp + w), axis=0)

        e_old, _ = energy_at(old, sx, ownp_cur, sel)
        e_new, ov_new = energy_at(new, sx, ownp_cur, sel)
        de = e_new - e_old

        banned = jnp.zeros_like(oob)
        if field is not None:
            px_old = cells.wrap_into_box(old + org, cfg.box_length)
            px_new = cells.wrap_into_box(new + org, cfg.box_length)
            if field.has_energy:
                de = de + (species_energy(field, px_new, sx)
                           - species_energy(field, px_old, sx))
            banned = species_forbidden(field, px_new, sx)

        if has_energy:
            metro = acc_u[m] < jnp.exp(-beta * de)
        else:
            metro = jnp.ones_like(oob)
        accept = nonempty & ~oob & ~ov_new & ~banned & metro

        upd = accept[None] & sel
        ownp_cur = jnp.where(upd[None], new[:, None], ownp_cur)
        de_sum = de_sum + jnp.sum(jnp.where(accept, de, 0.0))
        n_acc = n_acc + jnp.sum(accept)
        return ownp_cur, de_sum, n_acc

    zf = own[(0,) * own.ndim] * 0.0
    zi = own_occ[(0,) * own_occ.ndim] * 0
    ownp_new, de_sum, n_acc = jax.lax.fori_loop(
        0, n_m, move_body, (ownp, zf, zi))
    n_prop = n_m * jnp.sum(nonempty.astype(jnp.int32))
    own_new = jnp.concatenate([ownp_new, ownspec[None]], axis=0)
    return own_new, de_sum, n_acc, n_prop


@partial(jax.jit, static_argnums=(0, 1, 3))
def run_sweeps_mixture(cfg: SimConfig, pot, state: SimState, n_sweeps: int,
                       beta: jax.Array | None = None
                       ) -> tuple[SimState, xs.SweepMetrics]:
    """run_sweeps for mixture states — mc_sweep with the species-aware
    substep; schedule/shift logic (the detailed-balance kit) is shared."""

    def body(st, _):
        st, m = xs.mc_sweep(cfg, pot, st, beta=beta,
                            substep_fn=color_substep_mixture)
        return st, m

    return jax.lax.scan(body, state, length=n_sweeps)


def total_interaction_cells_mixture(cfg: SimConfig, pot, pos: jax.Array,
                                    occ: jax.Array,
                                    shift_fn: ShiftFn = roll_shift_fn,
                                    scale: jax.Array | None = None
                                    ) -> tuple[jax.Array, jax.Array]:
    """(total energy, any overlap) of a mixture state via cell lists —
    the dE-trace anchor (reference technique, kernel.cu:642,672-680).
    ``scale`` applies the NPT stored-frame convention."""
    nmax, dim = cfg.nmax, cfg.dim
    s2 = None if scale is None else scale * scale
    total = jnp.float32(0.0)
    any_ov = jnp.zeros((), jnp.bool_)
    for color in range(cfg.n_colors):
        own = pos[color]
        ownp, ownspec = own[:dim], own[dim]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = min_image(ownp[:, :, None] - ownp[:, None, :], cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        if s2 is not None:
            r2 = s2 * r2
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        e = jnp.where(vv, pot.pair_energy_s(r2, ownspec[:, None],
                                            ownspec[None, :]), 0.0)
        ov = vv & pot.overlap_s(r2, ownspec[:, None], ownspec[None, :])
        total = total + 0.5 * jnp.sum(e)
        any_ov = any_ov | jnp.any(ov)
        nbr_all, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color,
                                                shift_fn)
        nbrp, nbrspec = nbr_all[:, :dim], nbr_all[:, dim]
        valid_j = slot[None] < nbr_occ[:, None]
        dx = min_image(ownp[None, :, :, None] - nbrp[:, :, None, :],
                       cfg.box_length)
        r2x = jnp.sum(dx * dx, axis=1)
        if s2 is not None:
            r2x = s2 * r2x
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        ex = jnp.where(vx, pot.pair_energy_s(
            r2x, ownspec[None, :, None], nbrspec[:, None, :]), 0.0)
        ovx = vx & pot.overlap_s(r2x, ownspec[None, :, None],
                                 nbrspec[:, None, :])
        total = total + 0.5 * jnp.sum(ex)
        any_ov = any_ov | jnp.any(ovx)
    return total, any_ov


@partial(jax.jit, static_argnums=(0, 1))
def virial_pressure_cells_mixture(cfg: SimConfig, pot, pos: jax.Array,
                                  occ: jax.Array, beta) -> jax.Array:
    """Virial pressure of a MIXTURE state from the cell-list slabs:
    P = rho/beta + <sum_pairs w(r_ij)>/(dim V), w = -r dV_ab/dr obtained by
    autodiff of ``pot.pair_energy_s`` at fixed species — the mixture
    counterpart of utils.observables.virial_pressure_cells (the reference
    has neither mixtures nor any pressure observable, kernel.cu:17-29).

    Energetic potentials only (LJMixture etc.); for hard-core mixtures use
    the contact-value equation of state on partial_rdf_cells instead."""
    if not pot.has_energy:
        raise ValueError("virial pressure needs an energetic mixture "
                         "(hard cores: use the contact-value EOS route)")
    nmax, dim = cfg.nmax, cfg.dim
    n_tot = jnp.sum(occ)

    def pair_w(r2, si, sj, valid):
        # w(r2) = -2 r2 dV/dr2 == -r dV/dr, species held fixed
        de_dr2 = jax.grad(
            lambda s: jnp.sum(pot.pair_energy_s(s, si, sj)))(r2)
        return jnp.sum(jnp.where(valid, -2.0 * r2 * de_dr2, 0.0))

    w_sum = jnp.float32(0.0)
    for color in range(cfg.n_colors):
        own = pos[color]
        ownp, ownspec = own[:dim], own[dim]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        d = min_image(ownp[:, :, None] - ownp[:, None, :], cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        w_sum = w_sum + 0.5 * pair_w(r2, ownspec[:, None],
                                     ownspec[None, :], vv)
        nbr_all, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color)
        nbrp, nbrspec = nbr_all[:, :dim], nbr_all[:, dim]
        valid_j = slot[None] < nbr_occ[:, None]
        dx = min_image(ownp[None, :, :, None] - nbrp[:, :, None, :],
                       cfg.box_length)
        r2x = jnp.sum(dx * dx, axis=1)
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        w_sum = w_sum + 0.5 * pair_w(r2x, ownspec[None, :, None],
                                     nbrspec[:, None, :], vx)

    volume = cfg.box_length**dim
    rho = n_tot / volume
    return rho / beta + w_sum / (dim * volume)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def partial_rdf_cells(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
                      n_bins: int, r_max: float, pair: tuple[int, int]
                      ) -> tuple[jax.Array, jax.Array]:
    """Species-resolved partial g_ab(r) from the cell-list mixture state —
    the standard Kob-Andersen structure analysis (g_AA, g_AB, g_BB), at
    O(N x neighborhood) so it runs at the 1M-atom flagship scale.

    Convention: g_ab(r) = V/(N_a N_b) <sum_{i in a} sum_{j in b, j != i}
    delta(r - r_ij)> / shell(r). Requires r_max <= cell_width (one-ring
    coverage), like utils.observables.radial_distribution_cells.
    """
    import math as _m

    if r_max > cfg.cell_width + 1e-9:
        raise ValueError(
            f"r_max {r_max} > cell_width {cfg.cell_width}: one-ring coverage "
            "is incomplete beyond one cell width")
    a, b = pair
    nmax, dim = cfg.nmax, cfg.dim
    dr = r_max / n_bins
    counts = jnp.zeros((n_bins,), jnp.float32)

    def add_pairs(counts, r2, valid):
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        inside = valid & (r2 > 1e-12) & (r < r_max)
        bins = jnp.floor(r / dr).astype(jnp.int32)
        return counts.at[bins.ravel()].add(
            jnp.where(inside, 1.0, 0.0).ravel(), mode="drop")

    n_a = jnp.float32(0.0)
    n_b = jnp.float32(0.0)
    for color in range(cfg.n_colors):
        own = pos[color]
        ownp, ownspec = own[:dim], own[dim]
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]
        is_a = valid_i & (ownspec == float(a))
        n_a = n_a + jnp.sum(is_a)
        n_b = n_b + jnp.sum(valid_i & (ownspec == float(b)))
        # intra-cell ordered pairs (center in a, other in b)
        d = min_image(ownp[:, :, None] - ownp[:, None, :], cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        vv = (is_a[:, None] & valid_i[None, :] & (ownspec[None] == float(b))
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        counts = add_pairs(counts, r2, vv)
        # cross-cell (neighbor planes pre-unwrapped: raw differences minimal)
        nbr_all, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color)
        nbrp, nbrspec = nbr_all[:, :dim], nbr_all[:, dim]
        valid_j = (slot[None] < nbr_occ[:, None]) & (nbrspec == float(b))
        dx = ownp[None, :, :, None] - nbrp[:, :, None, :]
        r2x = jnp.sum(dx * dx, axis=1)
        vx = is_a[None, :, None] & valid_j[:, None, :]
        counts = add_pairs(counts, r2x, vx)

    centers = (jnp.arange(n_bins) + 0.5) * dr
    rho_b = n_b / cfg.box_length**dim
    shell = (2.0 * _m.pi * centers * dr if dim == 2
             else 4.0 * _m.pi * centers**2 * dr)
    ideal = jnp.maximum(n_a * rho_b * shell, 1e-12)
    return centers, counts / ideal


def total_energy_mixture_n2(pot, positions: np.ndarray | jax.Array,
                            species, box_length: float
                            ) -> tuple[jax.Array, jax.Array]:
    """O(N^2) species-resolved reference energy (test oracle)."""
    r = jnp.asarray(positions)
    s = jnp.asarray(species, jnp.float32)
    d = min_image(r[:, None, :] - r[None, :, :], box_length)
    r2 = jnp.sum(d * d, axis=-1)
    n = r.shape[0]
    off = ~jnp.eye(n, dtype=bool)
    e = jnp.where(off, pot.pair_energy_s(r2, s[:, None], s[None, :]), 0.0)
    ov = off & pot.overlap_s(r2, s[:, None], s[None, :])
    return 0.5 * jnp.sum(e), jnp.any(ov)
