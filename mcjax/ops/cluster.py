"""Geometric cluster moves (GCA) — rejection-free large-scale moves.

Implements the Dress-Krauth geometric cluster algorithm for hard-core
models (A. Dress & W. Krauth, J. Phys. A 28, L597 (1995)): reflect a
cluster of particles through a random pivot point.  The point reflection
``T(r) = 2*pivot - r`` (mod box) is a measure-preserving involution, so a
move that reflects a *closed* cluster — one where no reflected member
overlaps an unreflected outsider — satisfies detailed balance with
acceptance 1.  Cluster moves decorrelate dense hard-core fluids far faster
than local displacement sweeps near percolation/freezing, and are a
capability the CUDA reference has no analogue of (its only move is the
local displacement chain, kernel.cu:209-435).

TPU-native formulation: the textbook algorithm is a serial BFS.  Here the
cluster is grown by *parallel label propagation* over the cell-list state:

  1. reflect ALL particles once: ``img = T(pos)`` ([N, dim] flat view);
  2. bin the images into their own color-blocked slab carrying each
     image's flat particle id as an attribute plane (``cells.bin_particles``
     extra-plane mechanism) — reflection is an isometry, so image space has
     the same cell structure and the usual 3^dim-cell locality;
  3. iterate to fixpoint: particle j joins the cluster when some flagged
     image i (the reflection of a cluster member) overlaps it; each round
     checks every real slot against the 3^dim surrounding image-slab cells
     in one batched masked pair sweep (all colors at once), exactly the
     sweep engines' pair-loop geometry;
  4. reflect the flagged particles and re-bin.

Every round recruits the full graph frontier, so the loop runs
O(cluster-graph diameter) times, not O(cluster size).

The recruitment relation is symmetric (T is an involution:
``|T(r_i) - r_j| = |r_i - T(r_j)|``), so checking flagged-images against
unflagged-reals covers both directions of the textbook bond rule.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops import cells


def _pair_overlap(pot: Potential, r2, si=None, sj=None):
    if getattr(pot, "is_mixture", False):
        return pot.overlap_s(r2, si, sj)
    return pot.overlap(r2)


def _pair_energy(pot: Potential, r2, si=None, sj=None):
    if getattr(pot, "is_mixture", False):
        return pot.pair_energy_s(r2, si, sj)
    return pot.pair_energy(r2)


def _mix32(x):
    """murmur3 finalizer (uint32): full avalanche in 5 ops."""
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def _pair_uniform(salt, ida, idb):
    """Deterministic symmetric per-pair uniform in [0, 1).

    The Liu-Luijten bond between particles i and j must be decided by ONE
    uniform per unordered pair per move — with a per-(round, member)
    redraw the parallel fixpoint would compound bond probabilities.  A
    keyed symmetric hash gives every pair its uniform up front, making the
    label-propagation closure exactly the serial BFS closure over the same
    bond realization.  Two murmur3 finalizer rounds over (min, max, salt)
    — integer avalanche quality, which is what a bond decision needs; the
    *move* randomness (pivot, seed) stays on the Threefry tree.
    """
    a = jnp.minimum(ida, idb).astype(jnp.uint32)
    b = jnp.maximum(ida, idb).astype(jnp.uint32)
    h = _mix32(a ^ salt[0])
    h = _mix32(h + b * jnp.uint32(0x9E3779B9) ^ salt[1])
    # int32 view of the top 24 bits -> exact f32 uniform
    h = jax.lax.shift_right_logical(h, jnp.uint32(8))
    return (jax.lax.bitcast_convert_type(h, jnp.int32)
            ).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _gca_prep(cfg: SimConfig, icfg: SimConfig, pot: Potential,
              state: SimState, key: jax.Array):
    """Move randomness + image/real slab binning (global-view ops).

    Shared by the single-chip `gca_move` and the mesh-sharded driver
    (`mcjax.parallel.cluster`): binning is a global scatter, so under a
    mesh it runs as ordinary GSPMD-sharded jit code while the growth
    fixpoint below runs under shard_map.
    """
    energetic = getattr(pot, "has_energy", False)
    dim, L, n = cfg.dim, cfg.box_length, cfg.n_atoms

    # ---- flat views -------------------------------------------------------
    flat = cells.unbin(cfg, state.pos, state.occ)      # [N, dim (+E)]
    coords = flat[:, :dim]
    attrs = flat[:, dim:]                              # species etc.

    ksalt, kp, ks = jax.random.split(key, 3)
    salt = jax.random.bits(ksalt, (2,), jnp.uint32)
    pivot = jax.random.uniform(kp, (dim,), jnp.float32, -L / 2.0, L / 2.0)
    img = cells.wrap_into_box(2.0 * pivot - coords, L)

    ids = jnp.arange(n, dtype=jnp.float32)[:, None]
    # image slab planes: img coords | orig coords (energetic bonds need the
    # pre-move pair distance) | attrs | flat id; capacity 2*nmax
    img_extra = jnp.concatenate(
        ([coords] if energetic else []) + [attrs, ids], axis=1)
    ipos, iocc, ioverflow = cells.bin_particles(icfg, img, extra=img_extra)
    # real slab re-binned with the id plane so per-slot flags can be
    # scattered back to flat ids (state.pos has no id plane)
    rpos, rocc, _ = cells.bin_particles(
        cfg, coords, extra=jnp.concatenate([attrs, ids], axis=1))

    seed_id = jax.random.randint(ks, (), 0, n)
    flags0 = jnp.zeros((n,), jnp.bool_).at[seed_id].set(True)
    return (coords, attrs, img, ipos, iocc, ioverflow, rpos, rocc,
            pivot, salt, flags0)


def _grow_cluster(cfg: SimConfig, icfg: SimConfig, pot: Potential,
                  rpos, rocc, ipos, iocc, flags0, pivot, salt,
                  shift_fn=cells.roll_shift_fn, block_offset=None,
                  reduce_axes: tuple = ()):
    """Label-propagation cluster growth to fixpoint -> flat flag vector.

    Mesh-shardable by construction: the image/real slabs are frozen during
    growth, so ALL cross-shard traffic happens once in the neighbor-stack
    build (`shift_fn` = the halo-ppermute ShiftFn under shard_map,
    `block_offset` = the shard's global block offset for the periodic-edge
    unwrap).  The [N] flag vector is replicated on every shard; each round
    scatters the shard's local hits into it and merges with a pmax over
    ``reduce_axes`` — the recruitment closure is partition-invariant, so
    sharded and single-chip growth produce IDENTICAL flags.
    """
    hard = pot.has_hard_core
    energetic = getattr(pot, "has_energy", False)
    mixture = getattr(pot, "is_mixture", False)
    dim, nmax, L = cfg.dim, cfg.nmax, cfg.box_length
    beta = cfg.beta
    img_capacity = icfg.nmax

    o0 = dim if energetic else None              # orig-coord plane base
    a0 = dim + (dim if energetic else 0)         # attr plane base (image slab)
    id_plane_r = rpos[:, -1].astype(jnp.int32)         # [colors, nmax, *bs]
    sp_r = rpos[:, dim] if mixture else None

    # image neighbor stacks per color, built once (the image slab is frozen
    # during cluster growth): center block + the 3^dim - 1 shifted reads,
    # coordinates pre-unwrapped across the periodic boundary.  Only the
    # first dim (image-coordinate) planes get the unwrap adjustment; the
    # orig-coordinate planes use explicit minimum image below.
    nbr_pos, nbr_occ, nbr_ids, nbr_sp, nbr_orig = [], [], [], [], []
    for color in range(cfg.n_colors):
        np_, no_ = cells.neighbor_stack(icfg, ipos, iocc, color,
                                        shift_fn, block_offset)
        # append the center (same-color, unshifted) image block as slab K
        np_ = jnp.concatenate([np_, ipos[color][None]], axis=0)
        no_ = jnp.concatenate([no_, iocc[color][None]], axis=0)
        nbr_pos.append(np_[:, :dim])
        nbr_ids.append(np_[:, -1].astype(jnp.int32))
        nbr_occ.append(no_)
        nbr_sp.append(np_[:, a0] if mixture else None)
        nbr_orig.append(np_[:, o0:o0 + dim] if energetic else None)

    # For energetic bonds a SECOND candidate neighborhood exists: breaking
    # an attractive old pair (E_old < 0, E_new = 0) also bonds with
    # p = 1 - exp(beta * E_old) — those j are near the member's ORIGINAL
    # position, not its image.  Build real-slab neighbor stacks (center
    # appended) for that sweep; the real slab is equally frozen during
    # growth.
    if energetic:
        rnbr_pos, rnbr_rocc, rnbr_ids, rnbr_sp = [], [], [], []
        for color in range(cfg.n_colors):
            np_, no_ = cells.neighbor_stack(cfg, rpos, rocc, color,
                                            shift_fn, block_offset)
            np_ = jnp.concatenate([np_, rpos[color][None]], axis=0)
            no_ = jnp.concatenate([no_, rocc[color][None]], axis=0)
            rnbr_pos.append(np_[:, :dim])
            rnbr_ids.append(np_[:, -1].astype(jnp.int32))
            rnbr_rocc.append(no_)
            rnbr_sp.append(np_[:, dim] if mixture else None)

    slot_valid_i = [
        (jnp.arange(img_capacity, dtype=jnp.int32)[:, None, None]
         if dim == 2 else
         jnp.arange(img_capacity, dtype=jnp.int32)[:, None, None, None])
        < nbr_occ[c][:, None] for c in range(cfg.n_colors)]
    slot_valid_r = [
        (jnp.arange(nmax, dtype=jnp.int32).reshape(
            (nmax,) + (1,) * dim) < rocc[c][None])
        for c in range(cfg.n_colors)]
    if energetic:
        rslot_valid = [
            (jnp.arange(nmax, dtype=jnp.int32).reshape(
                (nmax,) + (1,) * dim) < rnbr_rocc[c][:, None])
            for c in range(cfg.n_colors)]

    def recruit(flags):
        """One frontier expansion: returns the updated flat flag vector."""
        new = flags
        for c in range(cfg.n_colors):
            hit = jnp.zeros((nmax,) + rocc[c].shape, jnp.bool_)
            iflag = flags[nbr_ids[c]]                   # [K, cap, *bs]
            for k in range(nbr_pos[c].shape[0]):
                act = iflag[k] & slot_valid_i[c][k]      # [cap, *bs]
                # pair distances: real slots [nmax, 1, *bs] vs image slots
                # [1, cap, *bs]
                r2 = None
                for d in range(dim):
                    dx = (rpos[c, d][:, None] - nbr_pos[c][k, d][None])
                    r2 = dx * dx if r2 is None else r2 + dx * dx
                si = sp_r[c][:, None] if mixture else None
                sj = nbr_sp[c][k][None] if mixture else None
                bond = None
                if hard:
                    bond = _pair_overlap(pot, r2, si, sj)
                if energetic:
                    # pre-move pair distance |r_i - r_j| via explicit
                    # minimum image (the member's original position can be
                    # anywhere in the box relative to j's cell)
                    r2o = None
                    for d in range(dim):
                        dx = (rpos[c, d][:, None]
                              - nbr_orig[c][k, d][None])
                        dx = dx - L * jnp.round(dx * jnp.float32(1.0 / L))
                        r2o = dx * dx if r2o is None else r2o + dx * dx
                    de = (_pair_energy(pot, r2, si, sj)
                          - _pair_energy(pot, r2o, si, sj))
                    p = -jnp.expm1(-beta * jnp.maximum(de, 0.0))
                    u = _pair_uniform(salt, id_plane_r[c][:, None],
                                      nbr_ids[c][k][None])
                    eb = u < p
                    bond = eb if bond is None else bond | eb
                hit = hit | jnp.any(bond & act[None], axis=1)
            if energetic:
                # broken-old-bond sweep: flagged member i rides the REAL
                # neighbor slots; candidate j is the center slot.  The new
                # pair distance |T(r_i) - r_j| needs explicit minimum image
                # (the image can be anywhere relative to j's cell).
                mflag = flags[rnbr_ids[c]]              # [K, nmax, *bs]
                for k in range(rnbr_pos[c].shape[0]):
                    act = mflag[k] & rslot_valid[c][k]   # [nmax, *bs]
                    r2o = None
                    r2n = None
                    for d in range(dim):
                        ri = rnbr_pos[c][k, d][None]     # member (unwrapped)
                        rj = rpos[c, d][:, None]         # candidate
                        dxo = rj - ri
                        dxn = rj - (2.0 * pivot[d] - ri)
                        dxn = dxn - L * jnp.round(dxn * jnp.float32(1.0 / L))
                        r2o = dxo * dxo if r2o is None else r2o + dxo * dxo
                        r2n = dxn * dxn if r2n is None else r2n + dxn * dxn
                    si = sp_r[c][:, None] if mixture else None
                    sj = rnbr_sp[c][k][None] if mixture else None
                    de = (_pair_energy(pot, r2n, si, sj)
                          - _pair_energy(pot, r2o, si, sj))
                    p = -jnp.expm1(-beta * jnp.maximum(de, 0.0))
                    u = _pair_uniform(salt, id_plane_r[c][:, None],
                                      rnbr_ids[c][k][None])
                    hit = hit | jnp.any((u < p) & act[None], axis=1)
            hit = hit & slot_valid_r[c]
            new = new.at[id_plane_r[c]].max(hit, mode="drop")
        return new

    def cond(carry):
        flags, grew = carry
        return grew

    def body(carry):
        flags, _ = carry
        new = recruit(flags)
        if reduce_axes:
            # merge the shards' local hits; the result is replicated, so
            # the while cond stays shard-consistent by construction
            new = jax.lax.pmax(new.astype(jnp.int32), reduce_axes) > 0
        return new, jnp.any(new != flags)

    flags, _ = jax.lax.while_loop(cond, body, (flags0, jnp.bool_(True)))
    return flags


@partial(jax.jit, static_argnums=(0, 1, 4))
def gca_move(cfg: SimConfig, pot: Potential, state: SimState, key: jax.Array,
             img_capacity: int | None = None
             ) -> tuple[SimState, jax.Array]:
    """One geometric cluster move on a hard-core state.

    Bond rule (Liu & Luijten, PRL 92, 035504 (2004), of which Dress-Krauth
    is the hard-core limit): outsider j bonds to cluster member i with
    probability ``p = 1 - exp(-beta * max(E(|T(r_i) - r_j|) -
    E(|r_i - r_j|), 0))`` — certainly (p = 1) when the reflected member
    overlaps j's hard core.  The move is rejection-free for ANY pair
    potential; cfg.beta supplies the temperature for the energetic part.

    Args:
      cfg/pot: any potential with a hard core and/or a pair energy —
        HardSphere and hard-sphere mixtures are the classic GCA; LJ,
        square-well, Yukawa, and LJ mixtures get full Liu-Luijten bonds.
      state: slab state; mixtures' species plane rides along untouched.
      key: one-shot Threefry key (caller splits; ``state.key`` is not
        consumed here so cluster moves compose with the sweep schedule's
        key discipline).
      img_capacity: slab capacity for binning the reflected images.  A
        reflected cell straddles up to 2^dim grid cells, so transient
        image-cell occupancy can exceed the equilibrium slab fill; default
        2*nmax (overflow is detected and folded into ``state.overflow``).

    Returns:
      (new_state, cluster_size).  Rejection-free: the move always applies.
    """
    hard = pot.has_hard_core
    energetic = getattr(pot, "has_energy", False)
    if not (hard or energetic):
        raise ValueError("gca_move needs a potential with a hard core "
                         "and/or a pair energy")
    if img_capacity is None:
        img_capacity = 2 * cfg.nmax
    icfg = dataclasses.replace(cfg, nmax=img_capacity)

    (coords, attrs, img, ipos, iocc, ioverflow, rpos, rocc,
     pivot, salt, flags0) = _gca_prep(cfg, icfg, pot, state, key)
    flags = _grow_cluster(cfg, icfg, pot, rpos, rocc, ipos, iocc,
                          flags0, pivot, salt)

    # ---- apply: reflect the cluster, re-bin -------------------------------
    new_coords = jnp.where(flags[:, None], img, coords)
    pos, occ, overflow = cells.bin_particles(
        cfg, new_coords, extra=attrs if attrs.shape[1] else None)
    new_state = dataclasses.replace(
        state, pos=pos, occ=occ,
        overflow=state.overflow | overflow | ioverflow)
    return new_state, jnp.sum(flags)


@partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7))
def run_cluster_mix(cfg: SimConfig, pot: Potential, state: SimState,
                    n_rounds: int, sweeps_per_round: int = 1,
                    clusters_per_round: int = 1, substep_fn=None,
                    img_capacity: int | None = None
                    ) -> tuple[SimState, jax.Array]:
    """Alternate Metropolis sweeps with geometric cluster moves.

    The standard production schedule for dense hard-core systems: local
    sweeps equilibrate short-range structure, cluster moves decorrelate
    long-wavelength density fluctuations.  Returns the state and the
    [n_rounds, clusters_per_round] cluster sizes (their distribution is the
    usual diagnostic — near-N/2 clusters mean the pivot map is percolating
    and the move degenerates to a global reflection).
    """
    from mcjax.ops import sweep as xla_sweep

    def round_body(st, _):
        def sweep_body(s, _):
            s, m = xla_sweep.mc_sweep(cfg, pot, s, substep_fn=substep_fn)
            return s, None
        st, _ = jax.lax.scan(sweep_body, st, length=sweeps_per_round)

        def cl_body(s, _):
            kc, knext = jax.random.split(s.key)
            s2, size = gca_move(cfg, pot, s, kc, img_capacity)
            s2 = dataclasses.replace(s2, key=knext)
            return s2, size
        st, sizes = jax.lax.scan(cl_body, st, length=clusters_per_round)
        return st, sizes

    return jax.lax.scan(round_body, state, length=n_rounds)
