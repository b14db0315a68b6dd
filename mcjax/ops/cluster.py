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


@partial(jax.jit, static_argnums=(0, 1, 4))
def gca_move(cfg: SimConfig, pot: Potential, state: SimState, key: jax.Array,
             img_capacity: int | None = None
             ) -> tuple[SimState, jax.Array]:
    """One geometric cluster move on a hard-core state.

    Args:
      cfg/pot: pot must have a hard core (``pot.has_hard_core``); the
        energetic tail, if any, is ignored by the bond rule, so for
        potentials with both (e.g. square-well) the move samples the
        hard-core reference system — mix with Metropolis sweeps for the
        full Boltzmann measure.  Pure hard-core models (HardSphere and
        hard-sphere mixtures) are sampled exactly.
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
    if not pot.has_hard_core:
        raise ValueError("gca_move requires a hard-core potential "
                         "(the Dress-Krauth bond rule is the overlap test)")
    dim, nmax, L = cfg.dim, cfg.nmax, cfg.box_length
    n = cfg.n_atoms
    mixture = getattr(pot, "is_mixture", False)
    if img_capacity is None:
        img_capacity = 2 * nmax
    icfg = dataclasses.replace(cfg, nmax=img_capacity)

    # ---- flat views -------------------------------------------------------
    flat = cells.unbin(cfg, state.pos, state.occ)      # [N, dim (+E)]
    coords = flat[:, :dim]
    attrs = flat[:, dim:]                              # species etc.

    kp, ks = jax.random.split(key)
    pivot = jax.random.uniform(kp, (dim,), jnp.float32, -L / 2.0, L / 2.0)
    img = cells.wrap_into_box(2.0 * pivot - coords, L)

    ids = jnp.arange(n, dtype=jnp.float32)[:, None]
    # image slab: coords + (species) + flat id; capacity 2*nmax
    img_extra = jnp.concatenate([attrs, ids], axis=1)
    ipos, iocc, ioverflow = cells.bin_particles(icfg, img, extra=img_extra)
    # real slab re-binned with the id plane so per-slot flags can be
    # scattered back to flat ids (state.pos has no id plane)
    rpos, rocc, _ = cells.bin_particles(
        cfg, coords, extra=jnp.concatenate([attrs, ids], axis=1))

    id_plane_r = rpos[:, -1].astype(jnp.int32)         # [colors, nmax, *bs]
    id_plane_i = ipos[:, -1].astype(jnp.int32)
    sp_r = rpos[:, dim] if mixture else None
    sp_i = ipos[:, dim] if mixture else None

    # image neighbor stacks per color, built once (the image slab is frozen
    # during cluster growth): center block + the 3^dim - 1 shifted reads,
    # coordinates pre-unwrapped across the periodic boundary
    nbr_pos, nbr_occ, nbr_ids, nbr_sp = [], [], [], []
    for color in range(cfg.n_colors):
        np_, no_ = cells.neighbor_stack(icfg, ipos, iocc, color)
        # append the center (same-color, unshifted) image block as slab K
        np_ = jnp.concatenate([np_, ipos[color][None]], axis=0)
        no_ = jnp.concatenate([no_, iocc[color][None]], axis=0)
        nbr_pos.append(np_[:, :dim])
        nbr_ids.append(np_[:, -1].astype(jnp.int32))
        nbr_occ.append(no_)
        nbr_sp.append(np_[:, dim] if mixture else None)

    # ---- seed -------------------------------------------------------------
    seed_id = jax.random.randint(ks, (), 0, n)
    flags0 = jnp.zeros((n,), jnp.bool_).at[seed_id].set(True)

    slot_valid_i = [
        (jnp.arange(img_capacity, dtype=jnp.int32)[:, None, None]
         if dim == 2 else
         jnp.arange(img_capacity, dtype=jnp.int32)[:, None, None, None])
        < nbr_occ[c][:, None] for c in range(cfg.n_colors)]
    slot_valid_r = [
        (jnp.arange(nmax, dtype=jnp.int32).reshape(
            (nmax,) + (1,) * dim) < rocc[c][None])
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
                if mixture:
                    ov = _pair_overlap(pot, r2, sp_r[c][:, None],
                                       nbr_sp[c][k][None])
                else:
                    ov = _pair_overlap(pot, r2)
                hit = hit | jnp.any(ov & act[None], axis=1)
            hit = hit & slot_valid_r[c]
            new = new.at[id_plane_r[c]].max(hit, mode="drop")
        return new

    def cond(carry):
        flags, grew = carry
        return grew

    def body(carry):
        flags, _ = carry
        new = recruit(flags)
        return new, jnp.any(new != flags)

    flags, _ = jax.lax.while_loop(cond, body, (flags0, jnp.bool_(True)))

    # ---- apply: reflect the cluster, re-bin -------------------------------
    new_coords = jnp.where(flags[:, None], img, coords)
    pos, occ, overflow = cells.bin_particles(
        cfg, new_coords, extra=attrs if attrs.shape[1] else None)
    new_state = dataclasses.replace(
        state, pos=pos, occ=occ,
        overflow=state.overflow | overflow | ioverflow)
    return new_state, jnp.sum(flags)


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

    @partial(jax.jit, static_argnums=())
    def run(state):
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

    return run(state)
