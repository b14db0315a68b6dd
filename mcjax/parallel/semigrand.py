"""Semi-grand-canonical ensemble under the sharded device mesh.

The flip phase shards for the same reason the sweep does: an identity flip
changes no positions and no occupancies, and its acceptance reads only the
picked particle's own cell + frozen same-color neighborhood — so per-cell
flips of one checkerboard color are independent across the whole (sharded)
grid and the halo machinery (``make_halo_shift_fn`` + block offsets) plugs
in unchanged.  Composition is a ``psum`` over shards; no other collective
is needed.

The reference has neither mixtures nor any composition-fluctuating
ensemble (its single species and N are compile-time constants,
kernel.cu:17-29).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.semigrand import SGMetrics, semigrand_phase, species_counts
from mcjax.ops.sweep import mc_sweep
from mcjax.parallel.mesh import _check_divisible, make_halo_shift_fn


def make_sharded_run_semigrand(cfg: SimConfig, pot: Potential, mesh: Mesh,
                               spatial_axes, beta_mu, n_sweeps: int,
                               flips_per_sweep: int = 1):
    """Build a jitted ``run(state) -> (state, SGMetrics)`` semi-grand runner
    over ``spatial_axes`` of ``mesh``: each sweep = one mixture displacement
    sweep + ``flips_per_sweep`` identity-flip phases.  Metrics (flip counts,
    per-species composition) come back psum'd global; shard the state with
    ``mesh.shard_state``."""
    if not getattr(pot, "is_mixture", False):
        raise ValueError("semi-grand flips need a mixture potential")
    _check_divisible(cfg, mesh, spatial_axes)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    shift_fn = make_halo_shift_fn(spatial_axes)
    beta_mu = jnp.asarray(beta_mu, jnp.float32)

    from mcjax.ops.mixture import color_substep_mixture

    def local_run(pos, occ, key, sweep, overflow):
        offs, shard_id = [], jnp.int32(0)
        for k, name in enumerate(spatial_axes):
            if name is None:
                offs.append(jnp.int32(0))
            else:
                idx = jax.lax.axis_index(name)
                offs.append(idx * (cfg.half_cps // mesh.shape[name]))
                shard_id = shard_id * mesh.shape[name] + idx
        block_offset = jnp.stack(offs)

        def _psum(x):
            return jax.lax.psum(x, sharded_names)

        def step(st, _):
            st, _m = mc_sweep(cfg, pot, st, shift_fn, None, block_offset,
                              shard_id, substep_fn=color_substep_mixture)
            # same key derivation as ops.semigrand.run_semigrand so the
            # single-chip and sharded chains draw matching schedule streams
            kg = jax.random.fold_in(st.key, -(3 * st.sweep + 2))
            pos_, nf, na = st.pos, jnp.int32(0), jnp.int32(0)
            for r in range(flips_per_sweep):
                pos_, f, a = semigrand_phase(
                    cfg, pot, pos_, st.occ, beta_mu,
                    jax.random.fold_in(kg, r), shift_fn=shift_fn,
                    block_offset=block_offset, shard_id=shard_id)
                nf, na = nf + f, na + a
            st = dataclasses.replace(st, pos=pos_)
            met = SGMetrics(
                flipped=_psum(nf), attempted=_psum(na),
                counts=_psum(species_counts(cfg, pot, pos_, st.occ)))
            return st, met

        overflow = jax.lax.pcast(overflow, sharded_names, to="varying")
        st0 = SimState(pos, occ, key, sweep, overflow)
        st, ms = jax.lax.scan(step, st0, length=n_sweeps)
        ovf = _psum(st.overflow.astype(jnp.int32)) > 0
        st = SimState(st.pos, st.occ, st.key, st.sweep, ovf)
        return st, ms

    pos_spec = P(None, None, None, *spatial_axes)
    occ_spec = P(None, *spatial_axes)
    sc = P()
    state_specs = SimState(pos=pos_spec, occ=occ_spec, key=sc, sweep=sc,
                           overflow=sc)
    met_specs = SGMetrics(flipped=P(None), attempted=P(None),
                          counts=P(None, None))

    def body(state: SimState):
        return local_run(state.pos, state.occ, state.key, state.sweep,
                         state.overflow)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(state_specs,),
        out_specs=(state_specs, met_specs)))
