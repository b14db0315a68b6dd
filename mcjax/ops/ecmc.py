"""Event-chain Monte Carlo (ECMC) for hard-core models — rejection-free
lifted chains (Bernard, Krauth & Wilson, PRE 80, 056704 (2009)).

A chain lifts translation into the state: one ACTIVE particle moves along a
fixed axis until it contacts another particle, which then becomes active
with the remaining displacement budget; the chain ends when the total
budget ell is spent. Straight x/y(/z)-alternating chains satisfy maximal
global balance (not detailed balance) and decorrelate dense hard-disk
fluids ~1-2 orders of magnitude faster per displacement than local
Metropolis moves. The CUDA reference has no rejection-free moves at all
(its only kernel is the local displacement chain, kernel.cu:209-435).

TPU-native formulation
----------------------
The event loop is inherently sequential (each lift depends on the last),
so one chain cannot be vectorized — but each EVENT is a masked pair sweep
over the active cell's 3^dim ring (exactly the sweep engines' candidate
geometry, on the same flat slab view the GC phase uses), and independent
REPLICAS vectorize perfectly: ``run_ecmc_ensemble`` vmaps whole chain
schedules over a replica batch, filling the VPU with R simultaneous event
searches. The flight is truncated at the active cell's forward face (so
ring coverage always bounds the segment), and crossing a face is an O(1)
two-cell slab update — no global rebin, no grid shift needed (ECMC is
irreducible on its own).

Pressure comes for free (Michel, Kapfer & Krauth, JCP 140, 054116 (2014)):
  beta P / rho = 1 + <sum over lifts of r_ij . e_hat> / (n_chains * ell)
with r_ij . e_hat = sqrt(sigma^2 - d_perp^2) evaluated at each contact.
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
from mcjax.ops.gcmc import _flat_view, _unflat


class ECMCMetrics(NamedTuple):
    excess: jax.Array        # sum over lifts of the contact separation
    lifts: jax.Array         # lift (collision) events
    events: jax.Array        # total loop iterations (lifts + face crossings)
    total_length: jax.Array  # n_chains * ell actually spent
    capped: jax.Array        # chains terminated by the event cap (want 0)


def pressure_from_metrics(m: ECMCMetrics) -> jax.Array:
    """beta*P/rho from a run's metrics (reduce over leading axes first for
    ensembles)."""
    return 1.0 + jnp.sum(m.excess) / jnp.maximum(jnp.sum(m.total_length),
                                                 1e-30)


def _decode_cell(cfg: SimConfig, flat_id: jax.Array) -> jax.Array:
    """Per-axis cell indices [dim] of a flat slab id — inverse of
    cells._flat_slot (color bits interleaved with row-major blocks)."""
    color = flat_id // cfg.cells_per_color
    rem = flat_id % cfg.cells_per_color
    cs = [None] * cfg.dim
    for k in reversed(range(cfg.dim)):
        bk = rem % cfg.half_cps
        rem = rem // cfg.half_cps
        ok = (color >> k) & 1
        cs[k] = 2 * bk + ok
    return jnp.stack(cs)


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 7))
def run_ecmc(cfg: SimConfig, pot: Potential, state: SimState,
             key: jax.Array, n_chains: int, chain_length: float,
             axis0: int = 0, max_events: int = 100_000
             ) -> tuple[SimState, ECMCMetrics]:
    """Run ``n_chains`` straight event chains of displacement budget
    ``chain_length`` (axes alternate per chain, starting at ``axis0``;
    start particles uniform).

    ``pot`` must be a pure hard-core model: HardSphere, or a
    HardSphereMixture with any per-pair contact table (the species plane
    rides the flat slab view; additivity is not required — the lifting
    argument is pairwise). ``max_events`` bounds a single chain's event
    count (a safety net
    against fp-degenerate zero-advance cycles; capped chains are counted
    in metrics and should be 0 in healthy runs).
    """
    if not pot.has_hard_core or getattr(pot, "has_energy", False):
        raise ValueError("run_ecmc supports pure hard-core models "
                         "(HardSphere / HardSphereMixture)")
    mixture = getattr(pot, "is_mixture", False)
    dim, nmax, cps = cfg.dim, cfg.nmax, cfg.cells_per_side
    L, w = cfg.box_length, cfg.cell_width
    if mixture:
        # per-pair contact table (any pairwise hard-core table is valid:
        # the lifting argument is pairwise, additivity is not required)
        d_table = jnp.asarray(pot.diameter, jnp.float32)
        sig2_table = d_table * d_table                   # [S, S]
        sigma_max = float(max(max(row) for row in pot.diameter))
    else:
        sigma_max = float(pot.diameter)
        sigma2_const = jnp.float32(sigma_max * sigma_max)
    if sigma_max > w + 1e-9:
        raise ValueError("cell width must cover the largest contact "
                         "distance")

    fp, fo = _flat_view(cfg, state.pos, state.occ)
    offs = jnp.asarray(cells.neighbor_offsets(dim, include_center=True),
                       jnp.int32)                                # [K, dim]
    slot_ar = jnp.arange(nmax, dtype=jnp.int32)

    def event(carry):
        (fp, fo, cell, slot, axis, budget, excess, lifts, events,
         ovf) = carry
        r = fp[cell, :, slot]                                   # [dim]
        c = _decode_cell(cfg, cell)                             # [dim]
        lb_a = c[axis].astype(jnp.float32) * w - L / 2.0
        t_face = jnp.maximum(lb_a + w - r[axis], 0.0)

        ring_c = jnp.mod(c[None] + offs, cps)                   # [K, dim]
        ring_ids = cells._flat_slot(cfg, ring_c)                # [K]
        cand = fp[ring_ids]                                     # [K, planes, nmax]
        counts = fo[ring_ids]                                   # [K]
        d = cand[:, :dim] - r[None, :dim, None]
        d = d - L * jnp.round(d * jnp.float32(1.0 / L))         # min image
        d_a = d[:, axis]                                        # [K, nmax]
        d2 = jnp.sum(d * d, axis=1)
        if mixture:
            si = r[dim].astype(jnp.int32)
            sj = cand[:, dim].astype(jnp.int32)                 # [K, nmax]
            sigma2 = sig2_table[si, sj]
        else:
            sigma2 = sigma2_const
        disc = sigma2 - (d2 - d_a * d_a)
        valid = slot_ar[None] < counts[:, None]
        hit = valid & (disc > 0.0) & (d_a > 0.0)
        root = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(hit, jnp.maximum(d_a - root, 0.0), jnp.inf)
        flat_idx = jnp.argmin(t.reshape(-1))
        t_col = t.reshape(-1)[flat_idx]
        k_star = flat_idx // nmax
        j_star = flat_idx % nmax

        t_seg = jnp.minimum(budget, t_face)

        def do_collide():
            fp2 = fp.at[cell, axis, slot].add(t_col)
            exc = root.reshape(-1)[flat_idx]
            return (fp2, fo, ring_ids[k_star], j_star, budget - t_col,
                    excess + exc, lifts + 1, jnp.bool_(False))

        def do_face():
            # advance to the face; cross into the next cell along axis,
            # wrapping the coordinate AND the cell index at the box edge
            ca_new = c[axis] + 1
            wrapped = ca_new >= cps
            ca_new = jnp.where(wrapped, 0, ca_new)
            # exact lower bound of the destination cell (same arithmetic the
            # decode uses, so the slab invariant holds bit-for-bit)
            r_new = r.at[axis].set(
                ca_new.astype(jnp.float32) * w - L / 2.0)
            cell2 = cells._flat_slot(cfg, c.at[axis].set(ca_new)[None])[0]
            full = fo[cell2] >= nmax
            # a full destination would make the state unrepresentable: flag
            # it, end the chain, and leave the slabs untouched (drop-mode
            # writes to an out-of-range id are no-ops)
            oob = jnp.int32(cfg.n_colors * cfg.cells_per_color)
            cell_rm = jnp.where(full, oob, cell)
            cell_in = jnp.where(full, oob, cell2)
            # remove: last slot fills the hole
            last = jnp.maximum(fo[cell] - 1, 0)
            fp2 = fp.at[cell_rm, :, slot].set(fp[cell, :, last],
                                              mode="drop")
            fo2 = fo.at[cell_rm].add(-1, mode="drop")
            # insert at the destination's tail
            s2c = jnp.minimum(fo[cell2], nmax - 1)
            fp2 = fp2.at[cell_in, :, s2c].set(r_new, mode="drop")
            fo2 = fo2.at[cell_in].add(1, mode="drop")
            return (fp2, fo2,
                    jnp.where(full, cell, cell2),
                    jnp.where(full, slot, s2c),
                    jnp.where(full, jnp.float32(0.0), budget - t_face),
                    excess, lifts, full)

        def do_end():
            fp2 = fp.at[cell, axis, slot].add(budget)
            return (fp2, fo, cell, slot, jnp.float32(0.0), excess, lifts,
                    jnp.bool_(False))

        col = t_col < t_seg
        face = t_face <= budget
        fp, fo, cell, slot, budget, excess, lifts, full = jax.lax.cond(
            col, do_collide, lambda: jax.lax.cond(face, do_face, do_end))
        return (fp, fo, cell, slot, axis, budget, excess, lifts,
                events + 1, ovf | full)

    def chain_body(carry, i):
        fp, fo, excess, lifts, events, spent, capped, ovf = carry
        k = jax.random.fold_in(key, i)
        # uniform live particle via the occupancy cumsum (gcmc's pick)
        n_tot = jnp.sum(fo)
        cum = jnp.cumsum(fo)
        j = jnp.minimum(
            jnp.floor(jax.random.uniform(k)
                      * n_tot.astype(jnp.float32)).astype(jnp.int32),
            n_tot - 1)
        cell0 = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
        slot0 = j - jnp.where(cell0 > 0, cum[cell0 - 1], 0)
        axis = (axis0 + i) % cfg.dim

        def cond(carry):
            budget, events = carry[5], carry[8]
            return (budget > 0.0) & (events < max_events)

        (fp, fo, _, _, _, budget, excess, lifts, events, ovf) = \
            jax.lax.while_loop(cond, event,
                               (fp, fo, cell0, slot0, axis,
                                jnp.float32(chain_length), excess, lifts,
                                events, ovf))
        capped = capped + (budget > 0.0).astype(jnp.int32)
        spent = spent + (jnp.float32(chain_length) - budget)
        return (fp, fo, excess, lifts, events, spent, capped, ovf), None

    zf = jnp.float32(0.0)
    zi = jnp.int32(0)
    carry0 = (fp, fo, zf, zi, zi, zf, zi, state.overflow)
    (fp, fo, excess, lifts, events, spent, capped, ovf), _ = jax.lax.scan(
        chain_body, carry0, jnp.arange(n_chains))

    pos, occ = _unflat(cfg, fp, fo, state.pos.shape, state.occ.shape)
    new_state = dataclasses.replace(state, pos=pos, occ=occ, overflow=ovf)
    metrics = ECMCMetrics(excess=excess, lifts=lifts, events=events,
                          total_length=spent, capped=capped)
    return new_state, metrics


def run_ecmc_ensemble(cfg: SimConfig, pot: Potential, states: SimState,
                      key: jax.Array, n_chains: int, chain_length: float,
                      axis0: int = 0, max_events: int = 100_000
                      ) -> tuple[SimState, ECMCMetrics]:
    """vmap ``run_ecmc`` over a replica batch (ensemble.init_ensemble
    layout): R independent chains run in lockstep, each event a masked ring
    sweep — the replica axis is what fills the vector units. Keys derive
    per replica from ``key``."""
    r = states.key.shape[0]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(r))
    return jax.vmap(
        lambda st, k: run_ecmc(cfg, pot, st, k, n_chains, chain_length,
                               axis0, max_events))(states, keys)
