"""Checkerboard Metropolis sweep engine (pure-XLA path).

TPU-native replacement for the reference's hot loop: ``subSweep``
(kernel.cu:209-435) + the host checkerboard scheduler (kernel.cu:652-701).
One full MC sweep — a random permutation of the 2^dim colors, n_M trial moves
for *every* cell of the active color simultaneously, then a random grid shift —
is a single traced device program.  The reference pays 9 kernel launches and
8 device-to-host copies per sweep (kernel.cu:660-687); here a whole run is one
``lax.scan`` with zero host round-trips.

Correctness model (the detailed-balance spec of pptx slide 16, re-derived):
  * moves that would leave the proposing cell are rejected
    (<- ``out_of_bound``, kernel.cu:192-206), so the reverse move exists
    within the same sub-sweep;
  * within a sub-sweep, each cell's trial particle is picked uniformly at
    random per move — a symmetric selection kernel (the reference instead
    shuffles then round-robins, kernel.cu:287,421; its shuffle is broken —
    SURVEY.md Q3 — uniform picks are the clean equivalent);
  * color order is a true uniform permutation per sweep (fixes Q4);
  * acceptance is exact Metropolis min(1, e^{-beta dE}) (the reference's V2
    halves uphill acceptance via a stray factor 2, kernel.cu:400-403 — Q2;
    V1 subsweep.h:209-216 has the correct rule, which we follow);
  * randomness is a counter-based Threefry tree keyed on
    (master, sweep, color-slot) — reproducible and vmap-safe (fixes Q6).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.geometry import min_image
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential, pair_interaction
from mcjax.ops import cells
from mcjax.ops.cells import ShiftFn, roll_shift_fn


class SweepMetrics(NamedTuple):
    """Per-sweep observables, all on-device scalars.

    The reference tracks only the energy delta (d_Eblocks, kernel.cu:248,415)
    and counts-but-never-reports acceptance (kernel.cu:228,413 — SURVEY.md §5);
    we report both.
    """

    delta_e: jax.Array      # sum of accepted dE over the sweep
    accepted: jax.Array     # accepted moves
    proposed: jax.Array     # proposals in non-empty cells
    overflow: jax.Array     # grid-shift capacity violation this sweep


def _cell_lower_bounds(cfg: SimConfig, color: int,
                       block_shape: tuple[int, ...],
                       block_offset: jax.Array | None) -> jnp.ndarray:
    """Lower corner of every active cell of ``color``, planes layout [dim, *bs].

    ``block_shape`` is the (possibly shard-local) block extent;
    ``block_offset`` is this shard's global block-index offset per axis
    (None on a single chip).
    """
    o = cells.color_bits(color, cfg.dim)
    w = cfg.cell_width
    lbs = []
    for k in range(cfg.dim):
        bk = jax.lax.broadcasted_iota(jnp.int32, block_shape, k)
        if block_offset is not None:
            bk = bk + block_offset[k]
        ck = 2 * bk + o[k]
        lbs.append(ck.astype(jnp.float32) * w - cfg.box_length / 2.0)
    return jnp.stack(lbs, axis=0)


def substep_randoms(cfg: SimConfig, key: jax.Array, bs: tuple[int, ...],
                    need_acc: bool = True
                    ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The per-color-substep random tensors: particle picks, displacements,
    acceptance uniforms. Factored out so the XLA and Pallas sub-sweep
    implementations consume *identical* Threefry streams (the Pallas path is
    then bitwise-testable against the XLA path for hard-core models, whose
    accept decisions involve no floating-point accumulation order).

    ``need_acc=False`` (pure hard-core models, whose accept rule never reads
    a uniform) skips generating the acceptance tensor; the pick/displacement
    streams are unchanged (k_acc is still split off), so trajectories are
    bitwise identical either way."""
    n_m, dim = cfg.n_moves, cfg.dim
    k_pick, k_disp, k_acc = jax.random.split(key, 3)
    pick_u = jax.random.uniform(k_pick, (n_m, *bs))
    if cfg.proposal == "gaussian":
        # <- make_move: new = old + N(0,1)*sigma (kernel.cu:184-189)
        disp = cfg.step_size * jax.random.normal(k_disp, (n_m, dim, *bs))
    else:
        disp = jax.random.uniform(k_disp, (n_m, dim, *bs),
                                  minval=-cfg.step_size, maxval=cfg.step_size)
    acc_u = (jax.random.uniform(k_acc, (n_m, *bs)) if need_acc
             else jnp.zeros((n_m, *bs), jnp.float32))
    return pick_u, disp, acc_u


def color_substep(cfg: SimConfig, pot: Potential, color: int,
                  pos: jax.Array, occ: jax.Array, key: jax.Array,
                  shift_fn: ShiftFn = roll_shift_fn,
                  beta: jax.Array | float | None = None,
                  block_offset: jax.Array | None = None,
                  scale: jax.Array | None = None,
                  field=None,
                  origin: jax.Array | None = None
                  ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Run n_M Metropolis trial moves in every cell of one checkerboard color.

    Equivalent of one ``subSweep`` launch (kernel.cu:209-435), vectorized over
    all cells of the color at once. Neighbor slabs are frozen reads of the
    other color blocks (checkerboard non-adjacency by construction).

    ``beta`` may be traced (parallel tempering); ``block_offset`` is the
    shard's global block offset under domain sharding. ``scale`` (traced) is
    the NPT box-scale factor: coordinates live in the stored frame (static
    cell geometry) and physical r^2 = scale^2 * stored r^2 (mcjax.ops.npt).
    ``field`` (static, models/fields.py) adds a one-body external term
    evaluated at physical x = wrap(stored + ``origin``) — the frame offset
    the grid shift accumulates (mcjax.ops.extfield owns it); its dE folds
    into the Metropolis test, the metric, and forbidden-region rejection.

    Returns: (new own-color block [dim, nmax, *bs], dE scalar, accepted, proposed).
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    if beta is None:
        beta = cfg.beta
    own = pos[color]                       # [dim, nmax, *bs] (planes layout)
    own_occ = occ[color]                   # [*bs]
    bs = own_occ.shape
    nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    lbp = _cell_lower_bounds(cfg, color, bs, block_offset)  # [dim, *bs]
    w = cfg.cell_width

    has_energy = pot.has_energy or (field is not None and field.has_energy)
    pick_u, dispp, acc_u = substep_randoms(cfg, key, bs,
                                           need_acc=has_energy)
    org = None
    if field is not None:
        if origin is None:
            origin = jnp.zeros((dim,), jnp.float32)
        org = origin.reshape((dim,) + (1,) * len(bs))

    # Everything is already in coordinate-planes layout: trailing axes = the
    # cell grid, so the big spatial extent sits on the TPU lane/sublane dims
    # at full vector width. The Pallas kernel consumes the same layout.
    ownp = own                                            # [dim, nmax, *bs]
    nbrp = nbr_pos                                        # [K, dim, nmax, *bs]

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nbr_valid = slot[None] < nbr_occ[:, None]             # [K, nmax, *bs]
    own_count = own_occ[None]                             # [1, *bs]
    nonempty = own_occ > 0

    def energy_at(x, ownp_cur, sel):
        """Energy + overlap of a particle at x [dim, *bs] vs its neighborhood.

        sel is the one-hot [nmax, *bs] of the moving particle (excluded from
        the own-cell sum). Replaces the per-thread pair loop + shared-memory
        tree reduction of the reference (kernel.cu:315-379) with masked
        vectorized sums — exact, no dropped strides (SURVEY.md Q1).

        No minimum-image arithmetic: own-cell pairs share a cell (|dx| < w)
        and neighbor planes come pre-unwrapped across the periodic boundary
        (cells.neighbor_stack), so raw differences are already minimal.
        """
        s2 = None if scale is None else scale * scale
        d_own = x[:, None] - ownp_cur
        r2_own = jnp.sum(d_own * d_own, axis=0)           # [nmax, *bs]
        if s2 is not None:
            r2_own = s2 * r2_own
        valid_own = (slot < own_count) & ~sel
        e_o, ov_o = pair_interaction(pot, r2_own, valid_own)

        d_nbr = x[None, :, None] - nbrp
        r2_nbr = jnp.sum(d_nbr * d_nbr, axis=1)           # [K, nmax, *bs]
        if s2 is not None:
            r2_nbr = s2 * r2_nbr
        e_n, ov_n = pair_interaction(pot, r2_nbr, nbr_valid)

        e = jnp.sum(e_o, axis=0) + jnp.sum(e_n, axis=(0, 1))
        ov = jnp.any(ov_o, axis=0) | jnp.any(ov_n, axis=(0, 1))
        return e, ov

    def move_body(m, carry):
        ownp_cur, de_sum, n_acc = carry
        # Uniform random particle pick (symmetric selection kernel).
        p = jnp.floor(pick_u[m] * own_occ.astype(jnp.float32)).astype(jnp.int32)
        p = jnp.minimum(p, jnp.maximum(own_occ - 1, 0))
        sel = slot == p[None]                             # [nmax, *bs]

        old = jnp.sum(jnp.where(sel[None], ownp_cur, 0.0), axis=1)  # [dim,*bs]
        new = old + dispp[m]

        # In-cell rejection (detailed balance under checkerboard decomposition;
        # <- out_of_bound, kernel.cu:192-206). Cell covers [lb, lb + w).
        oob = jnp.any((new < lbp) | (new >= lbp + w), axis=0)

        e_old, _ = energy_at(old, ownp_cur, sel)
        e_new, ov_new = energy_at(new, ownp_cur, sel)
        de = e_new - e_old

        banned = jnp.zeros_like(oob)
        if field is not None:
            px_old = cells.wrap_into_box(old + org, cfg.box_length)
            px_new = cells.wrap_into_box(new + org, cfg.box_length)
            if field.has_energy:
                de = de + field.energy(px_new) - field.energy(px_old)
            banned = field.forbidden(px_new)

        if has_energy:
            metro = acc_u[m] < jnp.exp(-beta * de)
        else:
            metro = jnp.ones_like(oob)  # pure hard-core: dE == 0
        accept = nonempty & ~oob & ~ov_new & ~banned & metro

        upd = accept[None] & sel                          # [nmax, *bs]
        ownp_cur = jnp.where(upd[None], new[:, None], ownp_cur)
        de_sum = de_sum + jnp.sum(jnp.where(accept, de, 0.0))
        n_acc = n_acc + jnp.sum(accept)
        return ownp_cur, de_sum, n_acc

    # Accumulator zeros derived from sharded data so they inherit its
    # varying-manual-axes type under shard_map (plain literals are
    # "replicated" and would clash with the loop-carry type).
    zf = own[(0,) * own.ndim] * 0.0
    zi = own_occ[(0,) * own_occ.ndim] * 0
    own_new, de_sum, n_acc = jax.lax.fori_loop(
        0, n_m, move_body, (ownp, zf, zi))
    n_prop = n_m * jnp.sum(nonempty.astype(jnp.int32))
    return own_new, de_sum, n_acc, n_prop


def mc_sweep(cfg: SimConfig, pot: Potential, state: SimState,
             shift_fn: ShiftFn = roll_shift_fn,
             beta: jax.Array | float | None = None,
             block_offset: jax.Array | None = None,
             shard_id: jax.Array | None = None,
             substep_fn=None,
             shift_rebin_fn=None,
             scale: jax.Array | None = None,
             ) -> tuple[SimState, SweepMetrics]:
    """One full MC sweep: shuffled colors x sub-sweeps, then a random grid shift.

    Host-loop equivalent: kernel.cu:652-701, minus all launch/copy boundaries.

    Under domain sharding (shard_map), the *schedule* randomness (color
    permutation, shift axis/distance) derives only from (key, sweep) — shared
    by all shards — while the *move* randomness additionally folds in
    ``shard_id`` so different shards draw independent streams.
    """
    n_colors = cfg.n_colors
    key_sweep = jax.random.fold_in(state.key, state.sweep)
    k_perm, k_axis, k_dist, k_sub = jax.random.split(key_sweep, 4)
    if shard_id is not None:
        k_sub = jax.random.fold_in(k_sub, shard_id)
    perm = jax.random.permutation(k_perm, n_colors)  # true FY (fixes Q4)

    if substep_fn is None:
        if getattr(pot, "is_mixture", False):
            from mcjax.ops.mixture import color_substep_mixture
            substep_fn = color_substep_mixture
        else:
            substep_fn = color_substep
    if shift_rebin_fn is None:
        shift_rebin_fn = cells.shift_rebin

    def substep_branch(color: int, pos, occ, k):
        if scale is None:
            own_new, de, na, np_ = substep_fn(cfg, pot, color, pos, occ, k,
                                              shift_fn, beta, block_offset)
        else:
            own_new, de, na, np_ = substep_fn(cfg, pot, color, pos, occ, k,
                                              shift_fn, beta, block_offset,
                                              scale)
        return pos.at[color].set(own_new), de, na, np_

    branches = [partial(substep_branch, c) for c in range(n_colors)]

    def color_body(i, carry):
        pos, de, na, np_ = carry
        k = jax.random.fold_in(k_sub, i)
        pos, de_i, na_i, np_i = jax.lax.switch(perm[i], branches,
                                               pos, state.occ, k)
        return pos, de + de_i, na + na_i, np_ + np_i

    zf = state.pos[(0,) * state.pos.ndim] * 0.0
    zi = state.occ[(0,) * state.occ.ndim] * 0
    pos, de, n_acc, n_prop = jax.lax.fori_loop(
        0, n_colors, color_body, (state.pos, zf, zi, zi))

    # Random grid shift (ergodicity across cell boundaries; kernel.cu:683-687).
    axis = jax.random.randint(k_axis, (), 0, cfg.dim)
    d = jax.random.uniform(k_dist, (), minval=-cfg.cell_width / 2.0,
                           maxval=cfg.cell_width / 2.0)
    do_shift = (state.sweep + 1) % cfg.shift_every == 0
    pos, occ, ovf = jax.lax.cond(
        do_shift,
        lambda: shift_rebin_fn(cfg, pos, state.occ, axis, d, shift_fn,
                               block_offset),
        lambda: (pos, state.occ, jnp.any(state.occ < 0)))  # always-False, but
    # derived from sharded data so both cond branches agree on varying axes.

    new_state = SimState(pos=pos, occ=occ, key=state.key,
                         sweep=state.sweep + 1,
                         overflow=state.overflow | ovf)
    return new_state, SweepMetrics(de, n_acc, n_prop, ovf)


@partial(jax.jit, static_argnums=(0, 1, 3))
def run_sweeps(cfg: SimConfig, pot: Potential, state: SimState,
               n_sweeps: int,
               beta: jax.Array | None = None
               ) -> tuple[SimState, SweepMetrics]:
    """Run ``n_sweeps`` full sweeps as one scan; metrics stacked per sweep.

    ``beta`` (traced) overrides cfg.beta — used by parallel tempering where
    each replica runs at its own temperature (mcjax.parallel.ensemble).
    """

    def body(st, _):
        st, m = mc_sweep(cfg, pot, st, beta=beta)
        return st, m

    return jax.lax.scan(body, state, length=n_sweeps)


@partial(jax.jit, static_argnums=(0, 1, 3, 4))
def run_sweeps_record(cfg: SimConfig, pot: Potential, state: SimState,
                      n_frames: int, sweeps_per_frame: int,
                      beta: jax.Array | None = None
                      ) -> tuple[SimState, jax.Array, SweepMetrics]:
    """Run n_frames x sweeps_per_frame sweeps, recording an unbinned
    [n_frames, n_atoms, dim] trajectory entirely on device.

    The reference's VISUALISATION path copies the whole cell list to the host
    every sweep (kernel.cu:696-700, "NOTE: Execution will be slow"); here
    frames are stacked by the scan and fetched once. Feed the result to
    utils.io.write_lammps_dump for OVITO.
    """

    def frame_body(st, _):
        def body(s, _):
            s, m = mc_sweep(cfg, pot, s, beta=beta)
            return s, m
        st, ms = jax.lax.scan(body, st, length=sweeps_per_frame)
        frame = cells.unbin(cfg, st.pos, st.occ)
        agg = SweepMetrics(jnp.sum(ms.delta_e), jnp.sum(ms.accepted),
                           jnp.sum(ms.proposed), jnp.any(ms.overflow))
        return st, (frame, agg)

    state, (frames, metrics) = jax.lax.scan(frame_body, state,
                                            length=n_frames)
    return state, frames, metrics


def total_interaction_cells(cfg: SimConfig, pot: Potential, pos: jax.Array,
                            occ: jax.Array,
                            shift_fn: ShiftFn = roll_shift_fn,
                            scale: jax.Array | None = None
                            ) -> tuple[jax.Array, jax.Array]:
    """(total energy, any hard-core overlap) via cell lists.

    E = 1/2 sum_i sum_{j in ring(i), j != i} e_ij. ``scale`` applies the NPT
    stored-frame convention (physical r^2 = scale^2 stored r^2).
    """
    nmax = cfg.nmax
    dim = cfg.dim
    s2 = None if scale is None else scale * scale
    total = jnp.float32(0.0)
    any_ov = jnp.zeros((), jnp.bool_)
    for color in range(cfg.n_colors):
        own = pos[color]                                   # [dim, nmax, *bs]
        own_occ = occ[color]                               # [*bs]
        bs = own_occ.shape
        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
        valid_i = slot < own_occ[None]                     # [nmax, *bs]
        # intra-cell pairs: [nmax_i, nmax_j, *bs]
        d = min_image(own[:, :, None] - own[:, None, :], cfg.box_length)
        r2 = jnp.sum(d * d, axis=0)
        if s2 is not None:
            r2 = s2 * r2
        vv = (valid_i[:, None] & valid_i[None, :]
              & (jnp.arange(nmax)[:, None] != jnp.arange(nmax)[None, :]
                 ).reshape((nmax, nmax) + (1,) * len(bs)))
        e, ov = pair_interaction(pot, r2, vv)
        total = total + 0.5 * jnp.sum(e)
        any_ov = any_ov | jnp.any(ov)
        # cross-cell pairs: [K, nmax_i, nmax_j, *bs]
        nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn)
        valid_j = slot[None] < nbr_occ[:, None]            # [K, nmax, *bs]
        dx = min_image(own[None, :, :, None] - nbr_pos[:, :, None, :],
                       cfg.box_length)
        r2x = jnp.sum(dx * dx, axis=1)                     # [K, nmax, nmax, *bs]
        if s2 is not None:
            r2x = s2 * r2x
        vx = valid_i[None, :, None] & valid_j[:, None, :]
        ex, ovx = pair_interaction(pot, r2x, vx)
        total = total + 0.5 * jnp.sum(ex)
        any_ov = any_ov | jnp.any(ovx)
    return total, any_ov


def total_energy_cells(cfg: SimConfig, pot: Potential, pos: jax.Array,
                       occ: jax.Array,
                       shift_fn: ShiftFn = roll_shift_fn) -> jax.Array:
    """Total energy via cell lists: E = 1/2 sum_i sum_{j in ring(i), j != i} e_ij.

    The on-device anchor for the dE-accumulated energy trace (the reference
    anchors once on the host at sweep 0, kernel.cu:642; we can re-anchor
    periodically — SURVEY.md Q9).
    """
    return total_interaction_cells(cfg, pot, pos, occ, shift_fn)[0]
