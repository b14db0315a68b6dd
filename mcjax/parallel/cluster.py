"""Geometric cluster moves under the sharded device mesh.

The single-chip algorithm (``mcjax.ops.cluster``) is partition-friendly by
construction: the image/real slabs are FROZEN during cluster growth, so the
only cross-shard data motion is

  (a) the global binning scatters (``cells.bin_particles``) — ordinary
      GSPMD-sharded jit code bracketing the move, and
  (b) the one-time halo neighbor-stack build inside shard_map
      (``lax.ppermute`` of edge planes over ICI — exactly the sweep
      engine's halo path, ``mcjax.parallel.mesh.make_halo_shift_fn``).

Growth rounds are then shard-local masked pair sweeps plus ONE ``pmax`` of
the replicated [N] flag vector per round; the label-propagation closure is
partition-invariant, so sharded moves produce flags (and therefore final
positions) IDENTICAL to single-chip ``gca_move`` on the same key
(tests/test_cluster.py::test_gca_sharded_matches_single).

Reference anchor: the CUDA reference has neither cluster moves nor any
multi-device story (SURVEY.md §2 "Distributed communication backend:
none"); this composes both TPU-native capabilities.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops import cells
from mcjax.ops.cluster import _gca_prep, _grow_cluster
from mcjax.parallel.mesh import (_check_divisible, make_halo_shift_fn,
                                 make_sharded_run_sweeps)


def make_gca_move_sharded(cfg: SimConfig, pot: Potential, mesh: Mesh,
                          spatial_axes, img_capacity: int | None = None):
    """Build a jitted ``move(state, key) -> (state, cluster_size)`` whose
    cluster growth runs under shard_map over ``spatial_axes`` of ``mesh``.

    ``state`` is mesh-sharded as in ``mesh.shard_state`` (no replica axis:
    a cluster move is one global involution — replica ensembles wrap this
    per replica). Bitwise-equal to ``ops.cluster.gca_move`` on the same
    key.
    """
    hard = pot.has_hard_core
    energetic = getattr(pot, "has_energy", False)
    if not (hard or energetic):
        raise ValueError("cluster moves need a potential with a hard core "
                         "and/or a pair energy")
    _check_divisible(cfg, mesh, spatial_axes)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    if img_capacity is None:
        img_capacity = 2 * cfg.nmax
    icfg = dataclasses.replace(cfg, nmax=img_capacity)
    shift_fn = make_halo_shift_fn(spatial_axes)

    def grow_local(ipos, iocc, rpos, rocc, flags0, pivot, salt):
        offs = []
        for k, name in enumerate(spatial_axes):
            if name is None:
                offs.append(jnp.int32(0))
            else:
                offs.append(jax.lax.axis_index(name)
                            * (cfg.half_cps // mesh.shape[name]))
        block_offset = jnp.stack(offs)
        return _grow_cluster(cfg, icfg, pot, rpos, rocc, ipos, iocc,
                             flags0, pivot, salt, shift_fn, block_offset,
                             sharded_names)

    slab = P(None, None, None, *spatial_axes)  # [colors, planes, cap, *bs]
    occs = P(None, *spatial_axes)
    rep = P()
    grow = jax.shard_map(grow_local, mesh=mesh,
                         in_specs=(slab, occs, slab, occs, rep, rep, rep),
                         out_specs=rep)

    pos_sh = NamedSharding(mesh, slab)
    occ_sh = NamedSharding(mesh, occs)

    @jax.jit
    def move(state: SimState, key: jax.Array):
        (coords, attrs, img, ipos, iocc, ioverflow, rpos, rocc,
         pivot, salt, flags0) = _gca_prep(cfg, icfg, pot, state, key)
        ipos = jax.lax.with_sharding_constraint(ipos, pos_sh)
        iocc = jax.lax.with_sharding_constraint(iocc, occ_sh)
        rpos = jax.lax.with_sharding_constraint(rpos, pos_sh)
        rocc = jax.lax.with_sharding_constraint(rocc, occ_sh)
        flags = grow(ipos, iocc, rpos, rocc, flags0, pivot, salt)

        new_coords = jnp.where(flags[:, None], img, coords)
        pos, occ, overflow = cells.bin_particles(
            cfg, new_coords, extra=attrs if attrs.shape[1] else None)
        pos = jax.lax.with_sharding_constraint(pos, pos_sh)
        occ = jax.lax.with_sharding_constraint(occ, occ_sh)
        new_state = dataclasses.replace(
            state, pos=pos, occ=occ,
            overflow=state.overflow | overflow | ioverflow)
        return new_state, jnp.sum(flags)

    return move


def make_sharded_cluster_mix(cfg: SimConfig, pot: Potential, mesh: Mesh,
                             spatial_axes, sweeps_per_round: int = 1,
                             clusters_per_round: int = 1,
                             img_capacity: int | None = None,
                             substep_fn=None):
    """Sharded analogue of ``ops.cluster.run_cluster_mix``: a function
    ``step(state) -> (state, sizes)`` running one round of
    ``sweeps_per_round`` halo-sharded Metropolis sweeps followed by
    ``clusters_per_round`` sharded cluster moves (sizes: [clusters]).

    The sweep leg and the cluster leg are separate jitted programs (the
    cluster move's global re-bin does not belong inside the sweep scan);
    call ``step`` in the production loop.
    """
    run = make_sharded_run_sweeps(cfg, pot, mesh, spatial_axes,
                                  sweeps_per_round, substep_fn=substep_fn)
    move = make_gca_move_sharded(cfg, pot, mesh, spatial_axes, img_capacity)

    def step(state: SimState):
        state, _ = run(state)
        sizes = []
        for _ in range(clusters_per_round):
            kc, knext = jax.random.split(state.key)
            state, size = move(state, kc)
            state = dataclasses.replace(state, key=knext)
            sizes.append(size)
        return state, jnp.stack(sizes)

    return step
