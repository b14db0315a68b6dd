"""Domain decomposition over a TPU device mesh.

The reference is strictly single-GPU (SURVEY.md §2 "Distributed communication
backend: none"); its cell grid cannot scale past one device and its
``shiftCells`` kernel not even past one thread block.  Here the *color-blocked*
cell grid is sharded over a ``jax.sharding.Mesh``: each device owns a
rectangular patch of every color block, checkerboard neighbor access becomes a
1-cell halo exchange over ICI (``lax.ppermute`` of one edge plane), and scalar
observables are ``psum``'d.  The sweep code itself is unchanged — it is the
same ``mc_sweep`` with a halo-aware shift function — which is the payoff of
making "shifted read" the neighbor-access primitive.

Supports an optional leading replica axis (data-parallel ensembles /
parallel tempering across the mesh) on top of the spatial sharding.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.sweep import SweepMetrics, mc_sweep


def halo_shift(x: jax.Array, s: int, axis: int, axis_name: str) -> jax.Array:
    """out[b] = x[b + s] along a mesh-sharded array axis (|s| == 1).

    Local shift + ppermute of the single edge plane over ICI — the multi-chip
    analogue of jnp.roll. Wrap-around at the mesh edge gives the periodic
    boundary. ``axis`` may be negative (trailing spatial axes).
    """
    n = jax.lax.axis_size(axis_name)
    axis = axis % x.ndim
    size = x.shape[axis]
    if s == 1:
        edge = jax.lax.slice_in_dim(x, 0, 1, axis=axis)  # my first plane
        recv = jax.lax.ppermute(edge, axis_name,
                                perm=[(i, (i - 1) % n) for i in range(n)])
        body = jax.lax.slice_in_dim(x, 1, size, axis=axis)
        return jnp.concatenate([body, recv], axis=axis)
    elif s == -1:
        edge = jax.lax.slice_in_dim(x, size - 1, size, axis=axis)  # last plane
        recv = jax.lax.ppermute(edge, axis_name,
                                perm=[(i, (i + 1) % n) for i in range(n)])
        body = jax.lax.slice_in_dim(x, 0, size - 1, axis=axis)
        return jnp.concatenate([recv, body], axis=axis)
    raise ValueError(f"halo_shift only supports |s| == 1, got {s}")


def make_halo_shift_fn(spatial_axis_names: Sequence[str | None]):
    """ShiftFn over a shard-local block: roll on unsharded axes, halo
    exchange on sharded ones. Plugs straight into neighbor_stack /
    shift_rebin / color_substep."""

    def shift_fn(block: jax.Array, shifts: Sequence[int]) -> jax.Array:
        dim = len(shifts)
        for ax, s in enumerate(shifts):
            if s == 0:
                continue
            name = spatial_axis_names[ax]
            if name is None:
                block = jnp.roll(block, -s, axis=ax - dim)
            else:
                block = halo_shift(block, s, ax - dim, name)
        return block

    return shift_fn


def _check_divisible(cfg: SimConfig, mesh: Mesh,
                     spatial_axes: Sequence[str | None]) -> None:
    for k, name in enumerate(spatial_axes):
        if name is None:
            continue
        n = mesh.shape[name]
        if cfg.half_cps % n != 0:
            raise ValueError(
                f"color-block extent {cfg.half_cps} along spatial axis {k} "
                f"not divisible by mesh axis {name!r} of size {n}")
        if cfg.half_cps // n < 1:
            raise ValueError("each shard needs at least one cell block")


def state_sharding(cfg: SimConfig, mesh: Mesh,
                   spatial_axes: Sequence[str | None],
                   replica_axis: str | None = None) -> SimState:
    """NamedShardings for each SimState leaf (as a SimState-shaped pytree)."""
    rep = (replica_axis,) if replica_axis else ()
    pos_spec = P(*rep, None, None, None, *spatial_axes)
    occ_spec = P(*rep, None, *spatial_axes)
    scalar_spec = P(*rep)
    return SimState(
        pos=NamedSharding(mesh, pos_spec),
        occ=NamedSharding(mesh, occ_spec),
        key=NamedSharding(mesh, scalar_spec),
        sweep=NamedSharding(mesh, scalar_spec),
        overflow=NamedSharding(mesh, scalar_spec),
    )


def shard_state(cfg: SimConfig, state: SimState, mesh: Mesh,
                spatial_axes: Sequence[str | None],
                replica_axis: str | None = None) -> SimState:
    """Place a (possibly replica-batched) state onto the mesh."""
    _check_divisible(cfg, mesh, spatial_axes)
    sh = state_sharding(cfg, mesh, spatial_axes, replica_axis)
    return jax.tree.map(jax.device_put, state, sh)


def shard_coords(cfg: SimConfig, mesh: Mesh,
                 spatial_axes: Sequence[str | None],
                 replica_axis: str | None = None
                 ) -> tuple[jax.Array, jax.Array]:
    """(block_offset [dim], linearized shard_id) of the calling shard —
    inside shard_map only. The offset anchors _cell_lower_bounds to global
    cell coordinates; the id decorrelates per-shard move randomness."""
    offs, shard_id = [], jnp.int32(0)
    for k, name in enumerate(spatial_axes):
        if name is None:
            offs.append(jnp.int32(0))
        else:
            idx = jax.lax.axis_index(name)
            offs.append(idx * (cfg.half_cps // mesh.shape[name]))
            shard_id = shard_id * mesh.shape[name] + idx
    block_offset = jnp.stack(offs)
    if replica_axis:
        # widen to include the replica axis so arithmetic against
        # replica-varying values type-checks under shard_map's vma tracking
        block_offset = jax.lax.pcast(block_offset, (replica_axis,),
                                     to="varying")
        shard_id = jax.lax.pcast(shard_id, (replica_axis,), to="varying")
    return block_offset, shard_id


def make_sharded_run_sweeps(cfg: SimConfig, pot: Potential, mesh: Mesh,
                            spatial_axes: Sequence[str | None],
                            n_sweeps: int,
                            replica_axis: str | None = None,
                            substep_fn=None,
                            engine: str = "xla",
                            interpret: bool = False,
                            check_vma: bool = True):
    """Build a jitted multi-chip sweep runner.

    Returns ``f(state, betas=None) -> (state, metrics)`` where the state's
    spatial block axes are sharded over ``spatial_axes`` of ``mesh`` and (if
    ``replica_axis``) a leading replica dim is sharded over it.  Metrics are
    psum'd over the spatial mesh axes (global observables), per-replica
    otherwise — the TPU equivalent of the reference's host-side d_Eblocks
    reduction (kernel.cu:672-677).
    """
    _check_divisible(cfg, mesh, spatial_axes)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    shift_fn = make_halo_shift_fn(spatial_axes)

    vary_names = sharded_names + ((replica_axis,) if replica_axis else ())

    if substep_fn is None and engine == "pallas":
        # per-shard fused Pallas kernel; cross-chip traffic stays in the
        # halo-aware neighbor-stack build
        from mcjax.ops.pallas_sweep import make_pallas_substep
        substep_fn = make_pallas_substep(vma=vary_names, interpret=interpret)

    def local_run(pos, occ, key, sweep, overflow, beta):
        # global block offset + linearized shard id for RNG decorrelation
        block_offset, shard_id = shard_coords(cfg, mesh, spatial_axes,
                                              replica_axis)

        def step(st, _):
            st, m = mc_sweep(cfg, pot, st, shift_fn, beta, block_offset,
                             shard_id, substep_fn=substep_fn)
            m = SweepMetrics(
                delta_e=jax.lax.psum(m.delta_e, sharded_names),
                accepted=jax.lax.psum(m.accepted, sharded_names),
                proposed=jax.lax.psum(m.proposed, sharded_names),
                overflow=jax.lax.psum(m.overflow.astype(jnp.int32),
                                      sharded_names) > 0,
            )
            return st, m

        # the overflow flag becomes shard-varying inside the sweep; cast the
        # (replicated) input to match the scan carry type
        overflow = jax.lax.pcast(overflow, sharded_names, to="varying")
        st0 = SimState(pos, occ, key, sweep, overflow)
        st, ms = jax.lax.scan(step, st0, length=n_sweeps)
        ovf = jax.lax.psum(st.overflow.astype(jnp.int32), sharded_names) > 0
        st = SimState(st.pos, st.occ, st.key, st.sweep, ovf)
        return st, ms

    rep = (replica_axis,) if replica_axis else ()
    pos_spec = P(*rep, None, None, None, *spatial_axes)
    occ_spec = P(*rep, None, *spatial_axes)
    sc = P(*rep)
    state_specs = SimState(pos=pos_spec, occ=occ_spec, key=sc, sweep=sc,
                           overflow=sc)
    beta_spec = P(*rep)
    met_spec = SweepMetrics(*(P(*rep, None),) * 4) if rep else \
        SweepMetrics(*(P(None),) * 4)

    def body(state: SimState, betas: jax.Array):
        if replica_axis:
            f = jax.vmap(local_run)
        else:
            f = local_run
        return f(state.pos, state.occ, state.key, state.sweep,
                 state.overflow, betas)

    # check_vma=False is needed only for Pallas interpret mode (its internal
    # block slicing confuses vma tracking); compiled runs keep full checking.
    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, beta_spec),
        out_specs=(state_specs, met_spec),
        check_vma=check_vma,
    )
    jitted = jax.jit(shmapped)

    def run(state: SimState, betas: jax.Array | None = None):
        if betas is None:
            shape = (state.key.shape[0],) if replica_axis else ()
            betas = jnp.full(shape, cfg.beta, jnp.float32)
        return jitted(state, betas)

    return run
