"""External-field (confined / driven) runs: frame bookkeeping + drivers.

The sweep engine's random grid shift re-expresses every stored coordinate
in a drifting frame (shifting the cell grid by +d subtracts d from every
coordinate, ops/cells.py _shift_rebin_axis) — harmless for the
translation-invariant bulk the reference simulates (kernel.cu:683-687),
but a one-body field lives at ABSOLUTE positions. These drivers carry the
cumulative frame ``origin``: physical x = wrap(stored + origin), updated
in lockstep with the sweep's own shift draws (the schedule randomness
derives deterministically from (key, sweep), the same property that keeps
it shard-invariant — mc_sweep's docstring).

The field's dE folds into the Metropolis test inside color_substep, so
the dE-anchor identity extends: energy trace == pair total + field total
(tests/test_extfield.py pins this over many shifted sweeps, which would
catch any drift-bookkeeping error by telescoping).

Both engines carry the field: the XLA substeps take ``field``/``origin``
directly, and the Pallas kernel evaluates the field term in-kernel at
physical coordinates with the origin as SMEM scalars
(run_field_sweeps_pallas).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.geometry import wrap_into_box
from mcjax.core.state import SimState
from mcjax.models import fields
from mcjax.models.potentials import Potential
from mcjax.ops import cells
from mcjax.ops.sweep import SweepMetrics, color_substep, mc_sweep


def physical_positions(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
                       origin: jax.Array, n_out: int | None = None
                       ) -> jax.Array:
    """Unbin to [n_out, planes] ABSOLUTE coordinates (stored frame + origin,
    wrapped) — what field-aware observables and dumps should consume.
    Mixture states keep their trailing species column untouched (only the
    first ``dim`` columns are coordinates)."""
    r = cells.unbin(cfg, pos, occ, n_out=n_out)
    coords = wrap_into_box(r[:, :cfg.dim] + origin[None, :], cfg.box_length)
    if r.shape[1] > cfg.dim:
        return jnp.concatenate([coords, r[:, cfg.dim:]], axis=1)
    return coords


def _physical_planes(cfg: SimConfig, pos: jax.Array, origin: jax.Array,
                     color: int):
    """(physical coords [dim, nmax, *bs], species plane or None) of one
    color block — species-aware iff the block carries extra planes."""
    dim = cfg.dim
    own = pos[color]
    px = wrap_into_box(
        own[:dim] + origin.reshape((dim,) + (1,) * (own.ndim - 1)),
        cfg.box_length)
    spec = own[dim] if own.shape[0] > dim else None
    return px, spec


def total_field_energy_cells(cfg: SimConfig, field, pos: jax.Array,
                             occ: jax.Array, origin: jax.Array) -> jax.Array:
    """Sum of the one-body field energy over all live particles
    (species-resolved for mixture states carrying a species plane)."""
    nmax = cfg.nmax
    e = jnp.float32(0.0)
    for color in range(cfg.n_colors):
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        live = (slot < own_occ[None]).astype(jnp.float32)
        px, spec = _physical_planes(cfg, pos, origin, color)
        e = e + jnp.sum(live * fields.species_energy(field, px, spec))
    return e


def field_violations(cfg: SimConfig, field, pos: jax.Array, occ: jax.Array,
                     origin: jax.Array) -> jax.Array:
    """Number of live particles inside the field's forbidden region
    (must stay 0 through a run that started valid)."""
    nmax = cfg.nmax
    n = jnp.int32(0)
    for color in range(cfg.n_colors):
        own_occ = occ[color]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        live = slot < own_occ[None]
        px, spec = _physical_planes(cfg, pos, origin, color)
        bad = fields.species_forbidden(field, px, spec)
        n = n + jnp.sum((live & bad).astype(jnp.int32))
    return n


def field_sweep(cfg: SimConfig, pot: Potential, field, state: SimState,
                origin: jax.Array, beta: jax.Array | float | None = None,
                base_substep=None
                ) -> tuple[SimState, jax.Array, SweepMetrics]:
    """One full MC sweep under ``field``; returns the advanced frame origin.

    The origin update mirrors mc_sweep's shift derivation exactly (same
    fold_in/split tree): the grid shift subtracts d from the stored ``axis``
    coordinates, so the frame origin gains +d. The dE-anchor test pins
    this coupling bitwise — any divergence breaks telescoping immediately.

    ``base_substep``: a color_substep-compatible callable accepting
    ``field=``/``origin=`` keywords (e.g. the Pallas substeps from
    make_pallas_substep/make_fused_substep); defaults to the XLA engine.
    """
    if base_substep is None:
        if getattr(pot, "is_mixture", False):
            from mcjax.ops.mixture import color_substep_mixture
            base_substep = color_substep_mixture
        else:
            base_substep = color_substep

    def substep(cfg_, pot_, color, pos, occ, k, shift_fn, beta_,
                block_offset):
        return base_substep(cfg_, pot_, color, pos, occ, k, shift_fn,
                            beta_, block_offset, field=field, origin=origin)

    new_state, m = mc_sweep(cfg, pot, state, beta=beta, substep_fn=substep)

    key_sweep = jax.random.fold_in(state.key, state.sweep)
    _, k_axis, k_dist, _ = jax.random.split(key_sweep, 4)
    axis = jax.random.randint(k_axis, (), 0, cfg.dim)
    d = jax.random.uniform(k_dist, (), minval=-cfg.cell_width / 2.0,
                           maxval=cfg.cell_width / 2.0)
    do_shift = (state.sweep + 1) % cfg.shift_every == 0
    step = jnp.where(do_shift, d, 0.0)
    origin = origin + step * (jnp.arange(cfg.dim) == axis)
    origin = wrap_into_box(origin, cfg.box_length)
    return new_state, origin, m


def replay_origin(cfg: SimConfig, key: jax.Array, sweep_start,
                  n_sweeps: int, origin: jax.Array | None = None
                  ) -> jax.Array:
    """Cumulative frame origin after ``n_sweeps`` sweeps starting at
    ``sweep_start``, WITHOUT running any sweep — the shift schedule is a
    deterministic function of (key, sweep) (mc_sweep's split tree,
    ops/sweep.py:260-303, replicated by run_sweeps_fused), so the frame
    drift of a finished field-free run can be reconstructed after the
    fact.  Used by the decorrelation benchmark to frame-correct density
    modes: physical x = wrap(stored + origin), so
    rho_k^phys = exp(i k . origin) * rho_k^stored exactly for
    reciprocal-lattice k.  Matches field_sweep's in-lockstep update
    bitwise (same formula; tests/test_decorr.py pins the physics)."""
    if origin is None:
        origin = jnp.zeros((cfg.dim,), jnp.float32)

    def body(carry, i):
        org = carry
        key_sweep = jax.random.fold_in(key, sweep_start + i)
        _, k_axis, k_dist, _ = jax.random.split(key_sweep, 4)
        axis = jax.random.randint(k_axis, (), 0, cfg.dim)
        d = jax.random.uniform(k_dist, (), minval=-cfg.cell_width / 2.0,
                               maxval=cfg.cell_width / 2.0)
        do_shift = (sweep_start + i + 1) % cfg.shift_every == 0
        step = jnp.where(do_shift, d, 0.0)
        org = org + step * (jnp.arange(cfg.dim) == axis)
        return wrap_into_box(org, cfg.box_length), None

    origin, _ = jax.lax.scan(body, origin, jnp.arange(n_sweeps))
    return origin


@partial(jax.jit, static_argnums=(0, 1, 2, 5))
def run_field_sweeps(cfg: SimConfig, pot: Potential, field, state: SimState,
                     origin: jax.Array, n_sweeps: int,
                     beta: jax.Array | None = None
                     ) -> tuple[SimState, jax.Array, SweepMetrics]:
    """n_sweeps field-aware sweeps as one scan; per-sweep stacked metrics.

    The metric's delta_e includes the field's one-body dE, so
    energy_trace anchors against total_interaction_cells +
    total_field_energy_cells."""

    def body(carry, _):
        st, org = carry
        st, org, m = field_sweep(cfg, pot, field, st, org, beta)
        return (st, org), m

    (state, origin), ms = jax.lax.scan(body, (state, origin),
                                       length=n_sweeps)
    return state, origin, ms


@partial(jax.jit, static_argnums=(0, 1, 2, 5, 7, 8, 9, 10, 11, 12, 13))
def run_field_sweeps_pallas(cfg: SimConfig, pot: Potential, field,
                            state: SimState, origin: jax.Array,
                            n_sweeps: int,
                            beta: jax.Array | None = None,
                            tile_rows: int = 0, tile_cols: int = 128,
                            interpret: bool = False, fused: bool = False,
                            neighbor_unroll: int = 1, slot_group: int = 8,
                            in_kernel_rng: bool = False
                            ) -> tuple[SimState, jax.Array, SweepMetrics]:
    """run_field_sweeps with the Pallas sub-sweep kernel (single chip).

    The field's dE and forbidden test evaluate IN-KERNEL at physical
    coordinates (the frame origin rides in as SMEM scalars); trajectories
    are bitwise equal to the XLA field engine for hard-core models on the
    shared Threefry streams (tests/test_extfield.py). ``fused`` uses the
    in-kernel halo-DMA sub-sweep (per-substep ring build)."""
    from mcjax.ops.pallas_sweep import (auto_tile_rows, make_fused_substep,
                                        make_pallas_substep)

    if tile_rows == 0:
        tile_rows = auto_tile_rows(cfg, tile_cols)
    if fused:
        base = make_fused_substep(tile_rows, tile_cols, interpret,
                                  neighbor_unroll=neighbor_unroll,
                                  slot_group=slot_group,
                                  in_kernel_rng=in_kernel_rng)
    else:
        base = make_pallas_substep(tile_rows, tile_cols, interpret,
                                   neighbor_unroll=neighbor_unroll,
                                   slot_group=slot_group,
                                   in_kernel_rng=in_kernel_rng)

    def body(carry, _):
        st, org = carry
        st, org, m = field_sweep(cfg, pot, field, st, org, beta,
                                 base_substep=base)
        return (st, org), m

    (state, origin), ms = jax.lax.scan(body, (state, origin),
                                       length=n_sweeps)
    return state, origin, ms


@partial(jax.jit, static_argnums=(0, 1, 2, 5, 6))
def run_field_sweeps_record(cfg: SimConfig, pot: Potential, field,
                            state: SimState, origin: jax.Array,
                            n_frames: int, sweeps_per_frame: int,
                            beta: jax.Array | None = None
                            ) -> tuple[SimState, jax.Array, jax.Array,
                                       SweepMetrics]:
    """Frame-recording variant: [n_frames, n_atoms, dim] PHYSICAL
    trajectory stacked on device (the frames already fold the frame origin
    in, unlike run_sweeps_record's stored-frame output)."""

    def frame_body(carry, _):
        st, org = carry

        def body(c, _):
            s, o, m = field_sweep(cfg, pot, field, c[0], c[1], beta)
            return (s, o), m

        (st, org), ms = jax.lax.scan(body, (st, org),
                                     length=sweeps_per_frame)
        frame = physical_positions(cfg, st.pos, st.occ, org)
        agg = SweepMetrics(jnp.sum(ms.delta_e), jnp.sum(ms.accepted),
                           jnp.sum(ms.proposed), jnp.any(ms.overflow))
        return (st, org), (frame, agg)

    (state, origin), (frames, metrics) = jax.lax.scan(
        frame_body, (state, origin), length=n_frames)
    return state, origin, frames, metrics
