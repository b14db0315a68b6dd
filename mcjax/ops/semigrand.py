"""Semi-grand-canonical ensemble: species-identity flips at fixed N.

The workhorse for mixture fractionation / phase-diagram studies (Kofke &
Glandt, Mol. Phys. 64, 1105 (1988)): total N is fixed but the composition
fluctuates under chemical-potential differences — the measure is
``exp(beta sum_s mu_s N_s) exp(-beta U)``. A flip move re-types one
particle in place (no displacement, no occupancy change), accepted with
``min(1, exp(beta (mu_s' - mu_s)) e^{-beta dU})``; for hard-core mixtures
a flip to a larger diameter that overlaps rejects outright.

TPU-native formulation: one flip attempt per cell, color by color — the
checkerboard argument (same-color cells >= max r_cut apart, dU reads only
frozen neighbor blocks) applies verbatim, so the phase vectorizes over
all cells of a color and shards over the mesh with the usual halo reads.
Composes with the sweep schedule: interleave ``semigrand_phase`` between
``mc_sweep``/`run_sweeps_mixture`` calls (``run_semigrand``).

The CUDA reference has neither mixtures nor any open/composition
ensemble (its N and its single species are compile-time constants,
kernel.cu:17-29).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops import cells


class SGMetrics(NamedTuple):
    flipped: jax.Array        # accepted identity flips this phase
    attempted: jax.Array      # proposals (== cells with occupants)
    counts: jax.Array         # [n_species] composition after the phase


def _sg_color_phase(cfg: SimConfig, pot: Potential, color: int,
                    pos: jax.Array, occ: jax.Array, beta_mu: jax.Array,
                    key: jax.Array, beta, shift_fn, block_offset):
    """One identity-flip attempt in every cell of one color at once."""
    dim, nmax = cfg.dim, cfg.nmax
    n_species = pot.n_species
    own = pos[color]                          # [dim+1, nmax, *bs]
    own_occ = occ[color]
    bs = own_occ.shape
    nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    k_pick, k_new, k_acc = jax.random.split(key, 3)
    pick_u = jax.random.uniform(k_pick, bs)
    s_new = jax.random.randint(k_new, bs, 0, n_species)
    ln_u = jnp.log(jax.random.uniform(k_acc, bs, minval=1e-38, maxval=1.0))

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nonempty = own_occ > 0
    p = jnp.minimum(jnp.floor(pick_u * own_occ.astype(jnp.float32)
                              ).astype(jnp.int32),
                    jnp.maximum(own_occ - 1, 0))
    sel = slot == p[None]                                  # [nmax, *bs]
    x = jnp.sum(jnp.where(sel[None], own[:dim], 0.0), axis=1)  # [dim, *bs]
    s_old = jnp.sum(jnp.where(sel, own[dim], 0.0), axis=0
                    ).astype(jnp.int32)                    # [*bs]

    nbr_valid = slot[None] < nbr_occ[:, None]

    def energy_with(si):
        """(U, overlap) of the picked particle carrying species ``si``
        against its frozen ring + own-cell others (pre-unwrapped planes:
        no minimum image)."""
        d_own = x[:, None] - own[:dim]
        r2o = jnp.sum(d_own * d_own, axis=0)               # [nmax, *bs]
        valid_own = (slot < own_occ[None]) & ~sel
        sj_own = own[dim]
        d_nbr = x[None, :, None] - nbr_pos[:, :dim]
        r2n = jnp.sum(d_nbr * d_nbr, axis=1)               # [K, nmax, *bs]
        sj_nbr = nbr_pos[:, dim]
        e = jnp.zeros(bs, jnp.float32)
        ov = jnp.zeros(bs, jnp.bool_)
        if pot.has_energy:
            eo = pot.pair_energy_s(r2o, si[None], sj_own)
            en = pot.pair_energy_s(r2n, si[None, None], sj_nbr)
            e = (jnp.sum(jnp.where(valid_own, eo, 0.0), axis=0)
                 + jnp.sum(jnp.where(nbr_valid, en, 0.0), axis=(0, 1)))
        if pot.has_hard_core:
            oo = pot.overlap_s(r2o, si[None], sj_own)
            on = pot.overlap_s(r2n, si[None, None], sj_nbr)
            ov = (jnp.any(valid_own & oo, axis=0)
                  | jnp.any(nbr_valid & on, axis=(0, 1)))
        return e, ov

    e_old, _ = energy_with(s_old)
    e_new, ov_new = energy_with(s_new)
    ln_acc = beta_mu[s_new] - beta_mu[s_old]
    if pot.has_energy:
        ln_acc = ln_acc - beta * (e_new - e_old)
    accept = (nonempty & (s_new != s_old) & ~ov_new & (ln_u < ln_acc))

    sp_new = jnp.where(accept[None] & sel,
                       s_new[None].astype(jnp.float32), own[dim])
    own = own.at[dim].set(jnp.where(accept[None], sp_new, own[dim]))
    return own, jnp.sum(accept.astype(jnp.int32)), \
        jnp.sum(nonempty.astype(jnp.int32))


def semigrand_phase(cfg: SimConfig, pot: Potential, pos: jax.Array,
                    occ: jax.Array, beta_mu, key: jax.Array,
                    beta: jax.Array | float | None = None,
                    shift_fn=None, block_offset: jax.Array | None = None,
                    shard_id: jax.Array | None = None):
    """One flip attempt per cell, color by color (shuffled order).

    ``beta_mu``: [n_species] of beta*mu_s (only differences matter).
    Returns (pos, flipped, attempted).
    """
    if not getattr(pot, "is_mixture", False):
        raise ValueError("semi-grand flips need a mixture potential")
    if beta is None:
        beta = cfg.beta
    if shift_fn is None:
        from mcjax.ops.cells import roll_shift_fn
        shift_fn = roll_shift_fn
    beta_mu = jnp.asarray(beta_mu, jnp.float32)
    n_colors = cfg.n_colors

    k_perm, k_sub = jax.random.split(key)
    if shard_id is not None:
        k_sub = jax.random.fold_in(k_sub, shard_id)
    perm = jax.random.permutation(k_perm, n_colors)

    def branch(color: int, pos, k):
        own, nf, na = _sg_color_phase(cfg, pot, color, pos, occ, beta_mu,
                                      k, beta, shift_fn, block_offset)
        return pos.at[color].set(own), nf, na

    branches = [partial(branch, c) for c in range(n_colors)]

    def body(i, carry):
        pos, nf, na = carry
        k = jax.random.fold_in(k_sub, i)
        pos, f, a = jax.lax.switch(perm[i], branches, pos, k)
        return pos, nf + f, na + a

    zi = jnp.sum(occ[(0,) * occ.ndim] * 0)
    pos, nf, na = jax.lax.fori_loop(0, n_colors, body, (pos, zi, zi))
    return pos, nf, na


def species_counts(cfg: SimConfig, pot: Potential, pos: jax.Array,
                   occ: jax.Array) -> jax.Array:
    """[n_species] composition from the slab state (on device)."""
    dim, nmax = cfg.dim, cfg.nmax
    slot = jnp.arange(nmax).reshape((1, nmax) + (1,) * dim)
    valid = slot < occ[:, None]
    sp = pos[:, dim].round().astype(jnp.int32)
    return jnp.stack([
        jnp.sum((valid & (sp == s)).astype(jnp.int32))
        for s in range(pot.n_species)])


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def run_semigrand(cfg: SimConfig, pot: Potential, state: SimState,
                  beta_mu, n_sweeps: int, flips_per_sweep: int = 1
                  ) -> tuple[SimState, SGMetrics]:
    """n_sweeps of (full mixture displacement sweep + ``flips_per_sweep``
    semi-grand flip phases), as one scan; per-sweep composition stacked."""
    from mcjax.ops.mixture import color_substep_mixture
    from mcjax.ops.sweep import mc_sweep

    beta_mu = jnp.asarray(beta_mu, jnp.float32)

    def body(st, _):
        st, _m = mc_sweep(cfg, pot, st,
                          substep_fn=color_substep_mixture)
        kg = jax.random.fold_in(st.key, -(3 * st.sweep + 2))
        pos = st.pos
        nf = na = jnp.int32(0)
        for r in range(flips_per_sweep):
            pos, f, a = semigrand_phase(cfg, pot, pos, st.occ, beta_mu,
                                        jax.random.fold_in(kg, r))
            nf, na = nf + f, na + a
        st = dataclasses.replace(st, pos=pos)
        met = SGMetrics(flipped=nf, attempted=na,
                        counts=species_counts(cfg, pot, pos, st.occ))
        return st, met

    return jax.lax.scan(body, state, length=n_sweeps)
