"""Grand-canonical (muVT) ensemble: insertion/deletion moves on the slab state.

The reference is NVT-only with a compile-time particle count (kernel.cu:17).
mcjax's fixed-capacity cell slabs already represent variable N naturally —
``occ`` counts live slots per cell — so muVT needs no new state layout:

* **Insertion** at a uniform point r: accept with
  min(1, zV/(N+1) e^{-beta dU}) (Frenkel & Smit alg. 12); dU comes from the
  same one-ring cell lookup as Widom insertion. A full target cell rejects
  the attempt (the state would be unrepresentable — the slab analogue of the
  in-cell move rejection; size nmax so this never fires and count it).
* **Deletion** of a uniform live particle: accept with
  min(1, N/(zV) e^{+beta dU}); the last slot of the cell fills the hole so
  slabs stay dense.

``z`` is the activity e^{beta mu}/Lambda^d: at equilibrium z = rho/B where
B = <e^{-beta dU}> is the Widom insertion factor — which is how the tests
pin muVT against the NVT engine without an external mu scale.

Alternates whole checkerboard sweeps (the hot path, untouched) with a scan
of GC attempts — all on device, zero host round-trips per sweep.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential, pair_interaction
from mcjax.ops import cells
from mcjax.ops.sweep import SweepMetrics, mc_sweep


class GCMetrics(NamedTuple):
    sweep: SweepMetrics        # particle-move metrics
    n_particles: jax.Array     # N after the GC phase
    inserted: jax.Array        # accepted insertions this sweep
    deleted: jax.Array         # accepted deletions this sweep
    capacity_rejects: jax.Array  # insertions rejected only by a full slab


def _flat_view(cfg: SimConfig, pos: jax.Array, occ: jax.Array):
    """[n_cells, dim, nmax] / [n_cells] flat slab view (color-major, then
    row-major blocks — the layout cells._flat_slot indexes)."""
    dim, nmax = cfg.dim, cfg.nmax
    n_cells = cfg.n_colors * cfg.cells_per_color
    fp = jnp.moveaxis(pos.reshape(cfg.n_colors, dim, nmax, -1),
                      -1, 1).reshape(n_cells, dim, nmax)
    fo = occ.reshape(-1)
    return fp, fo


def _unflat(cfg: SimConfig, fp: jax.Array, fo: jax.Array,
            pos_shape, occ_shape):
    dim, nmax = cfg.dim, cfg.nmax
    p = jnp.moveaxis(fp.reshape(cfg.n_colors, -1, dim, nmax), 1, -1)
    return p.reshape(pos_shape), fo.reshape(occ_shape)


def _ring_interaction(cfg: SimConfig, pot: Potential, fp: jax.Array,
                      fo: jax.Array, pt: jax.Array,
                      exclude_self: bool = False):
    """(dU, overlap) of a test particle at ``pt`` against its cell ring.

    ``exclude_self``: mask the r2 ~ 0 entry (deletion energy of a particle
    that is itself in the list)."""
    from mcjax.core.geometry import min_image

    dim, nmax, cps = cfg.dim, cfg.nmax, cfg.cells_per_side
    c = cells.cell_coords(cfg, pt[None])                  # [1, dim]
    offs = jnp.asarray(cells.neighbor_offsets(dim, include_center=True),
                       jnp.int32)
    nbr_c = jnp.mod(c + offs, cps)                        # [K, dim]
    slot = cells._flat_slot(cfg, nbr_c[None])[0]          # [K]
    slabs = fp[slot]                                      # [K, dim, nmax]
    counts = fo[slot]                                     # [K]
    d = min_image(pt[None, :, None] - slabs, cfg.box_length)
    r2 = jnp.sum(d * d, axis=1)                           # [K, nmax]
    valid = jnp.arange(nmax)[None, :] < counts[:, None]
    if exclude_self:
        valid = valid & (r2 > 1e-12)
    e, ov = pair_interaction(pot, r2, valid)
    return jnp.sum(e), jnp.any(ov)


def gc_phase(cfg: SimConfig, pot: Potential, pos: jax.Array, occ: jax.Array,
             z: jax.Array | float, key: jax.Array, n_attempts: int,
             beta: jax.Array | float | None = None):
    """Run ``n_attempts`` insertion/deletion attempts (coin-flip choice each).

    Returns (pos, occ, inserted, deleted, capacity_rejects).
    """
    if beta is None:
        beta = cfg.beta
    dim, nmax, cps = cfg.dim, cfg.nmax, cfg.cells_per_side
    L = cfg.box_length
    vol = L ** dim
    ln_zv = jnp.log(jnp.asarray(z, jnp.float32) * vol)
    pos_shape, occ_shape = pos.shape, occ.shape
    fp, fo = _flat_view(cfg, pos, occ)

    def attempt(carry, k):
        fp, fo, n_ins, n_del, n_cap = carry
        k_kind, k_pt, k_pick, k_acc = jax.random.split(k, 4)
        n_tot = jnp.sum(fo)
        do_insert = jax.random.uniform(k_kind) < 0.5
        u = jax.random.uniform(k_acc, (), minval=1e-38, maxval=1.0)

        def insert(fp, fo):
            pt = jax.random.uniform(k_pt, (dim,), minval=-L / 2.0,
                                    maxval=L / 2.0)
            du, ov = _ring_interaction(cfg, pot, fp, fo, pt)
            c = cells.cell_coords(cfg, pt[None])
            cell = cells._flat_slot(cfg, c)[0]
            has_room = fo[cell] < nmax
            ln_acc = ln_zv - jnp.log(n_tot.astype(jnp.float32) + 1.0)
            if pot.has_energy:
                ln_acc = ln_acc - beta * du
            metro = jnp.log(u) < ln_acc
            acc = has_room & ~ov & metro
            # O(1) state touch: write the slot's own old value on rejection
            slot_new = jnp.minimum(fo[cell], nmax - 1)
            fp = fp.at[cell, :, slot_new].set(
                jnp.where(acc, pt, fp[cell, :, slot_new]))
            fo = fo.at[cell].add(jnp.where(acc, 1, 0))
            cap = (~has_room) & ~ov & metro
            return fp, fo, acc.astype(jnp.int32), jnp.int32(0), \
                cap.astype(jnp.int32)

        def delete(fp, fo):
            # uniform live particle: cell by cumulative occupancy, then slot
            cum = jnp.cumsum(fo)
            j = jnp.minimum(
                jnp.floor(jax.random.uniform(k_pick)
                          * n_tot.astype(jnp.float32)).astype(jnp.int32),
                jnp.maximum(n_tot - 1, 0))
            cell = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
            slot = j - jnp.where(cell > 0, cum[cell - 1], 0)
            pt = fp[cell, :, slot]
            du, _ = _ring_interaction(cfg, pot, fp, fo, pt,
                                      exclude_self=True)
            ln_acc = jnp.log(jnp.maximum(n_tot.astype(jnp.float32), 1.0)) \
                - ln_zv
            if pot.has_energy:
                ln_acc = ln_acc + beta * du
            acc = (n_tot > 0) & (jnp.log(u) < ln_acc)
            # last slot fills the hole; then shrink the cell (O(1) touch)
            last = jnp.maximum(fo[cell] - 1, 0)
            mover = fp[cell, :, last]
            fp = fp.at[cell, :, slot].set(
                jnp.where(acc, mover, fp[cell, :, slot]))
            fo = fo.at[cell].add(jnp.where(acc, -1, 0))
            return fp, fo, jnp.int32(0), acc.astype(jnp.int32), jnp.int32(0)

        fp, fo, ins, dele, cap = jax.lax.cond(do_insert, insert, delete,
                                              fp, fo)
        return (fp, fo, n_ins + ins, n_del + dele, n_cap + cap), None

    keys = jax.random.split(key, n_attempts)
    (fp, fo, n_ins, n_del, n_cap), _ = jax.lax.scan(
        attempt, (fp, fo, jnp.int32(0), jnp.int32(0), jnp.int32(0)), keys)
    pos, occ = _unflat(cfg, fp, fo, pos_shape, occ_shape)
    return pos, occ, n_ins, n_del, n_cap


def gcmc_sweep(cfg: SimConfig, pot: Potential, state: SimState,
               z: jax.Array | float, n_attempts: int,
               beta: jax.Array | float | None = None
               ) -> tuple[SimState, GCMetrics]:
    """One muVT sweep: a full checkerboard particle sweep, then a GC phase."""
    state, m = mc_sweep(cfg, pot, state)
    kg = jax.random.fold_in(state.key, -(2 * state.sweep + 1))
    pos, occ, n_ins, n_del, n_cap = gc_phase(cfg, pot, state.pos, state.occ,
                                             z, kg, n_attempts, beta)
    st = SimState(pos=pos, occ=occ, key=state.key, sweep=state.sweep,
                  overflow=state.overflow)
    met = GCMetrics(sweep=m, n_particles=jnp.sum(occ),
                    inserted=n_ins, deleted=n_del, capacity_rejects=n_cap)
    return st, met


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def run_gcmc(cfg: SimConfig, pot: Potential, state: SimState,
             z: jax.Array | float, n_sweeps: int, n_attempts: int = 0
             ) -> tuple[SimState, GCMetrics]:
    """n_sweeps muVT sweeps as one scan; metrics stacked per sweep.

    ``n_attempts=0`` defaults to ~N GC attempts per sweep (one per current
    particle on average, the conventional rate)."""
    if n_attempts == 0:
        n_attempts = max(1, cfg.n_atoms // 4)

    def body(st, _):
        return gcmc_sweep(cfg, pot, st, z, n_attempts)

    return jax.lax.scan(body, state, length=n_sweeps)
