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


class GCMixtureMetrics(NamedTuple):
    sweep: SweepMetrics
    n_particles: jax.Array
    inserted: jax.Array
    deleted: jax.Array
    capacity_rejects: jax.Array
    counts: jax.Array          # [n_species] composition after the GC phase


def _flat_view(cfg: SimConfig, pos: jax.Array, occ: jax.Array):
    """[n_cells, n_planes, nmax] / [n_cells] flat slab view (color-major,
    then row-major blocks — the layout cells._flat_slot indexes). Attribute
    planes beyond ``dim`` (mixture species ids) ride along."""
    nmax = cfg.nmax
    n_planes = pos.shape[1]
    n_cells = cfg.n_colors * cfg.cells_per_color
    fp = jnp.moveaxis(pos.reshape(cfg.n_colors, n_planes, nmax, -1),
                      -1, 1).reshape(n_cells, n_planes, nmax)
    fo = occ.reshape(-1)
    return fp, fo


def _unflat(cfg: SimConfig, fp: jax.Array, fo: jax.Array,
            pos_shape, occ_shape):
    nmax = cfg.nmax
    n_planes = fp.shape[1]
    p = jnp.moveaxis(fp.reshape(cfg.n_colors, -1, n_planes, nmax), 1, -1)
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


def _gc_color_phase(cfg: SimConfig, pot: Potential, color: int,
                    pos: jax.Array, occ: jax.Array,
                    ln_zv: jax.Array, key: jax.Array,
                    beta, shift_fn, block_offset):
    """One insert-or-delete attempt in EVERY cell of one checkerboard color,
    simultaneously.

    muVT factorizes over disjoint subvolumes: with the environment frozen,
    the restricted ensemble of one cell (subvolume v = w^dim holding n
    particles) is itself grand-canonical at the same activity, so the
    per-cell acceptances are min(1, z*v/(n+1) e^{-beta dU}) for insertion
    at a uniform point of the CELL and min(1, n/(z*v) e^{+beta dU}) for
    deleting a uniform particle OF the cell. Same-color cells are >= w
    >= r_cut apart, so simultaneous attempts cannot interact and every
    dU reads only frozen neighbor blocks — exactly the sweep engine's
    checkerboard correctness argument (and its halo-sharding one:
    ``shift_fn``/``block_offset`` plug in unchanged).

    Returns (own_new, occ_color_new, inserted, deleted, capacity_rejects).
    """
    from mcjax.ops.sweep import _cell_lower_bounds

    dim, nmax = cfg.dim, cfg.nmax
    w = cfg.cell_width
    own = pos[color]                        # [dim, nmax, *bs]
    own_occ = occ[color]                    # [*bs]
    bs = own_occ.shape
    nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    lbp = _cell_lower_bounds(cfg, color, bs, block_offset)  # [dim, *bs]

    k_kind, k_pt, k_pick, k_acc = jax.random.split(key, 4)
    do_insert = jax.random.uniform(k_kind, bs) < 0.5
    pt = lbp + w * jax.random.uniform(k_pt, (dim, *bs))
    pick_u = jax.random.uniform(k_pick, bs)
    ln_u = jnp.log(jax.random.uniform(k_acc, bs, minval=1e-38, maxval=1.0))

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nbr_valid = slot[None] < nbr_occ[:, None]
    n_c = own_occ.astype(jnp.float32)

    def energy_at(x, sel):
        """(dU, overlap) of a point x [dim, *bs] vs its cell ring; ``sel``
        masks the deletion candidate out of the own-cell sum (all-False for
        insertion). Neighbor planes are pre-unwrapped: no minimum image."""
        d_own = x[:, None] - own
        r2_own = jnp.sum(d_own * d_own, axis=0)             # [nmax, *bs]
        valid_own = (slot < own_occ[None]) & ~sel
        e_o, ov_o = pair_interaction(pot, r2_own, valid_own)
        d_nbr = x[None, :, None] - nbr_pos
        r2_nbr = jnp.sum(d_nbr * d_nbr, axis=1)             # [K, nmax, *bs]
        e_n, ov_n = pair_interaction(pot, r2_nbr, nbr_valid)
        return (jnp.sum(e_o, axis=0) + jnp.sum(e_n, axis=(0, 1)),
                jnp.any(ov_o, axis=0) | jnp.any(ov_n, axis=(0, 1)))

    no_sel = jnp.zeros((nmax,) + bs, jnp.bool_)

    # ---- insertion leg (evaluated everywhere, applied where do_insert) ----
    du_i, ov_i = energy_at(pt, no_sel)
    has_room = own_occ < nmax
    ln_acc_i = ln_zv - jnp.log(n_c + 1.0)
    if pot.has_energy:
        ln_acc_i = ln_acc_i - beta * du_i
    metro_i = ln_u < ln_acc_i
    # fp guard: w*u can round up to w, which would store a point just past
    # the cell's upper face in this cell's slab (invariant violation);
    # reject that measure-zero sliver outright
    in_cell = jnp.all(pt < lbp + w, axis=0)
    acc_i = do_insert & has_room & ~ov_i & metro_i & in_cell
    cap = do_insert & ~has_room & ~ov_i & metro_i

    # ---- deletion leg ------------------------------------------------------
    nonempty = own_occ > 0
    p = jnp.minimum(jnp.floor(pick_u * n_c).astype(jnp.int32),
                    jnp.maximum(own_occ - 1, 0))
    sel = slot == p[None]                                   # [nmax, *bs]
    cand = jnp.sum(jnp.where(sel[None], own, 0.0), axis=1)  # [dim, *bs]
    du_d, _ = energy_at(cand, sel)
    ln_acc_d = jnp.log(jnp.maximum(n_c, 1.0)) - ln_zv
    if pot.has_energy:
        ln_acc_d = ln_acc_d + beta * du_d
    acc_d = ~do_insert & nonempty & (ln_u < ln_acc_d)

    # ---- apply (at most one of acc_i/acc_d per cell) -----------------------
    ins_slot = slot == jnp.minimum(own_occ, nmax - 1)[None]
    own = jnp.where((acc_i[None] & ins_slot)[None], pt[:, None], own)
    # deletion: the last live slot fills the hole, cell shrinks by one
    last_slot = slot == jnp.maximum(own_occ - 1, 0)[None]
    mover = jnp.sum(jnp.where(last_slot[None], own, 0.0), axis=1)
    own = jnp.where((acc_d[None] & sel)[None], mover[:, None], own)
    occ_new = own_occ + acc_i.astype(jnp.int32) - acc_d.astype(jnp.int32)

    return (own, occ_new, jnp.sum(acc_i.astype(jnp.int32)),
            jnp.sum(acc_d.astype(jnp.int32)), jnp.sum(cap.astype(jnp.int32)))


def _gc_color_phase_mixture(cfg: SimConfig, pot, color: int,
                            pos: jax.Array, occ: jax.Array,
                            ln_zvs: jax.Array, key: jax.Array,
                            beta, shift_fn, block_offset):
    """One insert-or-delete attempt per cell for a MULTI-SPECIES state —
    multicomponent muVT with per-species activities z_s.

    Insertion proposes a uniform species (prob 1/S) at a uniform point of
    the cell; deletion picks a uniform particle of the cell.  Detailed
    balance of the pair then gives
        acc_ins(s) = min(1, S z_s v/(n+1) e^{-beta dU}),
        acc_del(i) = min(1, n/(S z_{s_i} v) e^{+beta dU}),
    i.e. the uniform-species proposal factor S folds into the effective
    activity and cancels between the two directions (pi is unchanged) —
    ``ln_zvs[s]`` carries ln(S z_s v).  The subvolume-factorization
    argument of ``_gc_color_phase`` applies verbatim; the species id rides
    the extra coordinate plane like everywhere else (ops/mixture.py).

    Returns (own_new, occ_color_new, inserted, deleted, capacity_rejects).
    """
    from mcjax.ops.sweep import _cell_lower_bounds

    dim, nmax = cfg.dim, cfg.nmax
    n_sp = pot.n_species
    w = cfg.cell_width
    own = pos[color]                        # [dim+1, nmax, *bs]
    ownp, ownspec = own[:dim], own[dim]
    own_occ = occ[color]                    # [*bs]
    bs = own_occ.shape
    nbr_all, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    nbrp, nbrspec = nbr_all[:, :dim], nbr_all[:, dim]
    lbp = _cell_lower_bounds(cfg, color, bs, block_offset)  # [dim, *bs]

    k_kind, k_pt, k_pick, k_acc, k_sp = jax.random.split(key, 5)
    do_insert = jax.random.uniform(k_kind, bs) < 0.5
    pt = lbp + w * jax.random.uniform(k_pt, (dim, *bs))
    pick_u = jax.random.uniform(k_pick, bs)
    ln_u = jnp.log(jax.random.uniform(k_acc, bs, minval=1e-38, maxval=1.0))
    s_new = jax.random.randint(k_sp, bs, 0, n_sp)           # [*bs] int32

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nbr_valid = slot[None] < nbr_occ[:, None]
    n_c = own_occ.astype(jnp.float32)

    def energy_at(x, sx, sel):
        """(dU, overlap) of a species-sx point x vs its cell ring."""
        d_own = x[:, None] - ownp
        r2_own = jnp.sum(d_own * d_own, axis=0)             # [nmax, *bs]
        valid_own = (slot < own_occ[None]) & ~sel
        e_o = jnp.where(valid_own,
                        pot.pair_energy_s(r2_own, sx[None], ownspec), 0.0)
        ov_o = valid_own & pot.overlap_s(r2_own, sx[None], ownspec)
        d_nbr = x[None, :, None] - nbrp
        r2_nbr = jnp.sum(d_nbr * d_nbr, axis=1)             # [K, nmax, *bs]
        e_n = jnp.where(nbr_valid,
                        pot.pair_energy_s(r2_nbr, sx[None, None], nbrspec),
                        0.0)
        ov_n = nbr_valid & pot.overlap_s(r2_nbr, sx[None, None], nbrspec)
        return (jnp.sum(e_o, axis=0) + jnp.sum(e_n, axis=(0, 1)),
                jnp.any(ov_o, axis=0) | jnp.any(ov_n, axis=(0, 1)))

    no_sel = jnp.zeros((nmax,) + bs, jnp.bool_)
    s_new_f = s_new.astype(jnp.float32)

    # ---- insertion leg -----------------------------------------------------
    du_i, ov_i = energy_at(pt, s_new_f, no_sel)
    has_room = own_occ < nmax
    ln_acc_i = jnp.take(ln_zvs, s_new) - jnp.log(n_c + 1.0)
    if pot.has_energy:
        ln_acc_i = ln_acc_i - beta * du_i
    metro_i = ln_u < ln_acc_i
    in_cell = jnp.all(pt < lbp + w, axis=0)   # fp sliver guard
    acc_i = do_insert & has_room & ~ov_i & metro_i & in_cell
    cap = do_insert & ~has_room & ~ov_i & metro_i

    # ---- deletion leg ------------------------------------------------------
    nonempty = own_occ > 0
    p = jnp.minimum(jnp.floor(pick_u * n_c).astype(jnp.int32),
                    jnp.maximum(own_occ - 1, 0))
    sel = slot == p[None]                                   # [nmax, *bs]
    cand = jnp.sum(jnp.where(sel[None], ownp, 0.0), axis=1)  # [dim, *bs]
    s_cand = jnp.sum(jnp.where(sel, ownspec, 0.0), axis=0)   # [*bs] float
    du_d, _ = energy_at(cand, s_cand, sel)
    s_ci = s_cand.round().astype(jnp.int32)
    ln_acc_d = jnp.log(jnp.maximum(n_c, 1.0)) - jnp.take(ln_zvs, s_ci)
    if pot.has_energy:
        ln_acc_d = ln_acc_d + beta * du_d
    acc_d = ~do_insert & nonempty & (ln_u < ln_acc_d)

    # ---- apply (at most one of acc_i/acc_d per cell) -----------------------
    new_particle = jnp.concatenate([pt, s_new_f[None]], axis=0)
    ins_slot = slot == jnp.minimum(own_occ, nmax - 1)[None]
    own = jnp.where((acc_i[None] & ins_slot)[None], new_particle[:, None],
                    own)
    last_slot = slot == jnp.maximum(own_occ - 1, 0)[None]
    mover = jnp.sum(jnp.where(last_slot[None], own, 0.0), axis=1)
    own = jnp.where((acc_d[None] & sel)[None], mover[:, None], own)
    occ_new = own_occ + acc_i.astype(jnp.int32) - acc_d.astype(jnp.int32)

    return (own, occ_new, jnp.sum(acc_i.astype(jnp.int32)),
            jnp.sum(acc_d.astype(jnp.int32)), jnp.sum(cap.astype(jnp.int32)))


def _gc_color_phase_cb(cfg: SimConfig, pot: Potential, color: int,
                       pos: jax.Array, occ: jax.Array,
                       ln_zv: jax.Array, key: jax.Array,
                       beta, shift_fn, block_offset, n_trials: int):
    """Configurational-bias variant of ``_gc_color_phase``: the
    multiple-first-bead scheme (Frenkel & Smit §13.6 / Esselink et al.).

    Insertion draws ``k = n_trials`` uniform trial points in the cell,
    selects trial j with probability w_j / W (w_i = e^{-beta dU_i}, 0 on
    hard overlap), and accepts with min(1, z v/(n+1) * W/k).  Deletion
    balances it with k-1 fresh shadow trials:
    min(1, n/(z v) * k / (w_del + sum_shadow w_i)).  At k=1 both reduce to
    the standard acceptances.  At high density the k-fold hole search
    boosts insertion acceptance by ~k, which is what makes muVT usable on
    dense hard-core fluids (ROADMAP: "configurational-bias insertions").

    The subvolume-factorization argument of ``_gc_color_phase`` is
    unchanged: trials are uniform in the CELL and every dU reads the
    frozen ring, so simultaneous same-color attempts stay independent and
    the phase shards over the mesh identically.
    """
    from mcjax.ops.sweep import _cell_lower_bounds

    dim, nmax = cfg.dim, cfg.nmax
    k_t = n_trials
    w = cfg.cell_width
    own = pos[color]                        # [dim, nmax, *bs]
    own_occ = occ[color]                    # [*bs]
    bs = own_occ.shape
    nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color, shift_fn,
                                            block_offset)
    lbp = _cell_lower_bounds(cfg, color, bs, block_offset)  # [dim, *bs]

    k_kind, k_pt, k_pick, k_acc, k_sel, k_sh = jax.random.split(key, 6)
    do_insert = jax.random.uniform(k_kind, bs) < 0.5
    pts = lbp[None] + w * jax.random.uniform(k_pt, (k_t, dim, *bs))
    pick_u = jax.random.uniform(k_pick, bs)
    ln_u = jnp.log(jax.random.uniform(k_acc, bs, minval=1e-38, maxval=1.0))

    slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs))
    nbr_valid = slot[None] < nbr_occ[:, None]
    n_c = own_occ.astype(jnp.float32)

    def energy_at(x, sel):
        d_own = x[:, None] - own
        r2_own = jnp.sum(d_own * d_own, axis=0)
        valid_own = (slot < own_occ[None]) & ~sel
        e_o, ov_o = pair_interaction(pot, r2_own, valid_own)
        d_nbr = x[None, :, None] - nbr_pos
        r2_nbr = jnp.sum(d_nbr * d_nbr, axis=1)
        e_n, ov_n = pair_interaction(pot, r2_nbr, nbr_valid)
        return (jnp.sum(e_o, axis=0) + jnp.sum(e_n, axis=(0, 1)),
                jnp.any(ov_o, axis=0) | jnp.any(ov_n, axis=(0, 1)))

    no_sel = jnp.zeros((nmax,) + bs, jnp.bool_)

    def ln_weight(x):
        """ln w(x) = -beta dU(x), -inf on overlap or the fp cell sliver."""
        du, ov = energy_at(x, no_sel)
        lw = -beta * du if pot.has_energy else jnp.zeros(bs, jnp.float32)
        bad = ov | ~jnp.all(x < lbp + w, axis=0)
        return jnp.where(bad, -jnp.inf, lw)

    # ---- insertion leg: select among k trials, Rosenbluth acceptance ------
    ln_w = jax.vmap(ln_weight)(pts)                         # [k, *bs]
    ln_W = jax.scipy.special.logsumexp(ln_w, axis=0)        # [*bs]
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(k_sel, (k_t, *bs), minval=1e-38, maxval=1.0)))
    j_sel = jnp.argmax(ln_w + gumbel, axis=0)               # [*bs]
    pt = jnp.take_along_axis(
        pts, j_sel[None, None], axis=0)[0]                  # [dim, *bs]
    has_room = own_occ < nmax
    ln_acc_i = ln_zv - jnp.log(n_c + 1.0) + ln_W - jnp.log(float(k_t))
    metro_i = ln_u < ln_acc_i
    acc_i = do_insert & has_room & metro_i                  # -inf W => False
    cap = do_insert & ~has_room & metro_i

    # ---- deletion leg: candidate + k-1 shadow trials -----------------------
    nonempty = own_occ > 0
    p = jnp.minimum(jnp.floor(pick_u * n_c).astype(jnp.int32),
                    jnp.maximum(own_occ - 1, 0))
    sel = slot == p[None]
    cand = jnp.sum(jnp.where(sel[None], own, 0.0), axis=1)
    du_d, _ = energy_at(cand, sel)
    ln_w_del = -beta * du_d if pot.has_energy \
        else jnp.zeros(bs, jnp.float32)
    if k_t > 1:
        sh = lbp[None] + w * jax.random.uniform(k_sh, (k_t - 1, dim, *bs))

        def ln_weight_del(x):
            du, ov = energy_at(x, sel)   # candidate masked out of the ring
            lw = -beta * du if pot.has_energy \
                else jnp.zeros(bs, jnp.float32)
            bad = ov | ~jnp.all(x < lbp + w, axis=0)
            return jnp.where(bad, -jnp.inf, lw)

        ln_w_sh = jax.vmap(ln_weight_del)(sh)               # [k-1, *bs]
        ln_W_old = jax.scipy.special.logsumexp(
            jnp.concatenate([ln_w_del[None], ln_w_sh], axis=0), axis=0)
    else:
        ln_W_old = ln_w_del
    ln_acc_d = (jnp.log(jnp.maximum(n_c, 1.0)) - ln_zv
                + jnp.log(float(k_t)) - ln_W_old)
    acc_d = ~do_insert & nonempty & (ln_u < ln_acc_d)

    # ---- apply (at most one of acc_i/acc_d per cell) -----------------------
    ins_slot = slot == jnp.minimum(own_occ, nmax - 1)[None]
    own = jnp.where((acc_i[None] & ins_slot)[None], pt[:, None], own)
    last_slot = slot == jnp.maximum(own_occ - 1, 0)[None]
    mover = jnp.sum(jnp.where(last_slot[None], own, 0.0), axis=1)
    own = jnp.where((acc_d[None] & sel)[None], mover[:, None], own)
    occ_new = own_occ + acc_i.astype(jnp.int32) - acc_d.astype(jnp.int32)

    return (own, occ_new, jnp.sum(acc_i.astype(jnp.int32)),
            jnp.sum(acc_d.astype(jnp.int32)), jnp.sum(cap.astype(jnp.int32)))


def gc_phase_checkerboard(cfg: SimConfig, pot: Potential, pos: jax.Array,
                          occ: jax.Array, z: jax.Array | float,
                          key: jax.Array,
                          beta: jax.Array | float | None = None,
                          shift_fn=None,
                          block_offset: jax.Array | None = None,
                          shard_id: jax.Array | None = None,
                          n_trials: int = 1):
    """Massively parallel GC phase: one insert/delete attempt per cell,
    color by color (shuffled order), all cells of a color at once.

    The TPU-native muVT formulation: the serial ``gc_phase`` scan does one
    attempt per ~30 ns kernel-roundtrip-free step but still serializes; this
    phase does n_cells attempts in 2^dim vectorized substeps and shards over
    the mesh exactly like ``color_substep`` (per-cell acceptances need only
    the LOCAL cell count n_c — no global-N collective at all).

    Schedule randomness (color order) is shard-invariant; per-cell move
    randomness folds in ``shard_id``. Returns
    (pos, occ, inserted, deleted, capacity_rejects).
    """
    if beta is None:
        beta = cfg.beta
    if shift_fn is None:
        from mcjax.ops.cells import roll_shift_fn
        shift_fn = roll_shift_fn
    n_colors = cfg.n_colors
    vol_cell = cfg.cell_width ** cfg.dim
    mixture = getattr(pot, "is_mixture", False)
    if mixture:
        # per-species activities; the uniform species-proposal factor S
        # folds into the effective ln(S z_s v) (see _gc_color_phase_mixture)
        z_arr = jnp.asarray(z, jnp.float32).reshape(-1)
        if n_trials > 1:
            raise ValueError("configurational-bias trials are single-"
                             "species only for now (n_trials=1 for "
                             "mixtures)")
        ln_zv = jnp.log(z_arr * vol_cell * pot.n_species)
    else:
        ln_zv = jnp.log(jnp.asarray(z, jnp.float32) * vol_cell)

    k_perm, k_sub = jax.random.split(key)
    if shard_id is not None:
        k_sub = jax.random.fold_in(k_sub, shard_id)
    perm = jax.random.permutation(k_perm, n_colors)

    def branch(color: int, pos, occ, k):
        if mixture:
            own, occ_c, ins, dele, cap = _gc_color_phase_mixture(
                cfg, pot, color, pos, occ, ln_zv, k, beta, shift_fn,
                block_offset)
        elif n_trials > 1:
            own, occ_c, ins, dele, cap = _gc_color_phase_cb(
                cfg, pot, color, pos, occ, ln_zv, k, beta, shift_fn,
                block_offset, n_trials)
        else:
            own, occ_c, ins, dele, cap = _gc_color_phase(
                cfg, pot, color, pos, occ, ln_zv, k, beta, shift_fn,
                block_offset)
        return pos.at[color].set(own), occ.at[color].set(occ_c), ins, \
            dele, cap

    branches = [partial(branch, c) for c in range(n_colors)]

    def color_body(i, carry):
        pos, occ, ins, dele, cap = carry
        k = jax.random.fold_in(k_sub, i)
        pos, occ, i_, d_, c_ = jax.lax.switch(perm[i], branches, pos, occ, k)
        return pos, occ, ins + i_, dele + d_, cap + c_

    zi = jnp.sum(occ[(0,) * occ.ndim] * 0)
    pos, occ, n_ins, n_del, n_cap = jax.lax.fori_loop(
        0, n_colors, color_body, (pos, occ, zi, zi, zi))
    return pos, occ, n_ins, n_del, n_cap


def gcmc_sweep(cfg: SimConfig, pot: Potential, state: SimState,
               z: jax.Array | float, n_attempts: int,
               beta: jax.Array | float | None = None,
               checkerboard: bool = False,
               shift_fn=None,
               block_offset: jax.Array | None = None,
               shard_id: jax.Array | None = None,
               substep_fn=None,
               n_trials: int = 1
               ) -> tuple[SimState, GCMetrics]:
    """One muVT sweep: a full checkerboard particle sweep, then a GC phase.

    ``checkerboard=True`` replaces the serial attempt scan with the
    vectorized per-cell phase (``n_attempts`` then means phase REPEATS, not
    single attempts; the conventional ~N attempts/sweep is one phase at
    mean occupancy >= 1). The halo args (`shift_fn`/`block_offset`/
    `shard_id`) make the whole sweep mesh-shardable (mcjax.parallel.gcmc).
    ``n_trials > 1`` switches the checkerboard phase to configurational-bias
    insertions/deletions (see ``_gc_color_phase_cb``).
    """
    if shift_fn is None:
        from mcjax.ops.cells import roll_shift_fn
        shift_fn = roll_shift_fn
    state, m = mc_sweep(cfg, pot, state, shift_fn, beta, block_offset,
                        shard_id, substep_fn=substep_fn)
    kg = jax.random.fold_in(state.key, -(2 * state.sweep + 1))
    if checkerboard:
        pos, occ = state.pos, state.occ
        n_ins = n_del = n_cap = jnp.sum(occ[(0,) * occ.ndim] * 0)
        for r in range(max(1, n_attempts)):
            pos, occ, i_, d_, c_ = gc_phase_checkerboard(
                cfg, pot, pos, occ, z, jax.random.fold_in(kg, r), beta,
                shift_fn, block_offset, shard_id, n_trials=n_trials)
            n_ins, n_del, n_cap = n_ins + i_, n_del + d_, n_cap + c_
    else:
        if getattr(pot, "is_mixture", False):
            raise ValueError("mixture muVT is checkerboard-only "
                             "(pass checkerboard=True)")
        pos, occ, n_ins, n_del, n_cap = gc_phase(
            cfg, pot, state.pos, state.occ, z, kg, n_attempts, beta)
    st = SimState(pos=pos, occ=occ, key=state.key, sweep=state.sweep,
                  overflow=state.overflow)
    if getattr(pot, "is_mixture", False):
        from mcjax.ops.semigrand import species_counts
        met = GCMixtureMetrics(
            sweep=m, n_particles=jnp.sum(occ), inserted=n_ins,
            deleted=n_del, capacity_rejects=n_cap,
            counts=species_counts(cfg, pot, pos, occ))
        return st, met
    met = GCMetrics(sweep=m, n_particles=jnp.sum(occ),
                    inserted=n_ins, deleted=n_del, capacity_rejects=n_cap)
    return st, met


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7))
def run_gcmc(cfg: SimConfig, pot: Potential, state: SimState,
             z: jax.Array | float, n_sweeps: int, n_attempts: int = 0,
             checkerboard: bool = False, n_trials: int = 1
             ) -> tuple[SimState, GCMetrics]:
    """n_sweeps muVT sweeps as one scan; metrics stacked per sweep.

    ``n_attempts=0`` defaults to ~N GC attempts per sweep (one per current
    particle on average, the conventional rate) for the serial phase, and
    to ONE per-cell phase (= n_cells attempts) with ``checkerboard=True``
    — the vectorized formulation that runs every cell's attempt at once
    (see gc_phase_checkerboard). ``n_trials > 1``: configurational-bias
    insertions (checkerboard phase only)."""
    if n_attempts == 0:
        n_attempts = 1 if checkerboard else max(1, cfg.n_atoms // 4)
    if n_trials > 1 and not checkerboard:
        raise ValueError("configurational-bias trials need the "
                         "checkerboard GC phase")

    def body(st, _):
        return gcmc_sweep(cfg, pot, st, z, n_attempts,
                          checkerboard=checkerboard, n_trials=n_trials)

    return jax.lax.scan(body, state, length=n_sweeps)
