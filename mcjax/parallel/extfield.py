"""External fields under the sharded mesh.

Composition notes (all three are properties the single-chip design already
guaranteed, which is why this file is plumbing, not physics):

* stored coordinates are GLOBAL box coordinates — shards own different
  cells, not different frames — so physical x = wrap(stored + origin)
  needs no per-shard offset;
* the frame ``origin`` advances with the sweep's own shift draws, which are
  *schedule* randomness derived only from (key, sweep) (mc_sweep's
  docstring) — identical on every shard, so the carried origin stays
  replicated with zero collectives;
* forbidden-region checks and field dE are one-body and cell-local, so
  they ride the existing halo-free own-block path.

Single-chip analogue: ops/extfield.py. Reference anchor: the reference has
neither fields nor sharding (kernel.cu is pure-bulk single-GPU).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.geometry import wrap_into_box
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.sweep import SweepMetrics, color_substep, mc_sweep
from mcjax.parallel.mesh import (_check_divisible, make_halo_shift_fn,
                                 shard_coords)


def make_sharded_run_field_sweeps(cfg: SimConfig, pot: Potential, field,
                                  mesh: Mesh,
                                  spatial_axes: Sequence[str | None],
                                  n_sweeps: int,
                                  replica_axis: str | None = None):
    """Build a jitted multi-chip field-aware sweep runner.

    Returns ``f(state, origin, betas=None) -> (state, origin, metrics)``:
    the sharded-mesh analogue of ops.extfield.run_field_sweeps, carrying the
    replicated frame origin through the scan. Dispatches on
    ``pot.is_mixture`` (species-resolved fields included).
    """
    _check_divisible(cfg, mesh, spatial_axes)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    shift_fn = make_halo_shift_fn(spatial_axes)

    if getattr(pot, "is_mixture", False):
        from mcjax.ops.mixture import color_substep_mixture as base_substep
    else:
        base_substep = color_substep

    def local_run(pos, occ, key, sweep, overflow, origin, beta):
        block_offset, shard_id = shard_coords(cfg, mesh, spatial_axes,
                                              replica_axis)

        def step(carry, _):
            st, org = carry

            def substep(cfg_, pot_, color, pos_, occ_, k, sf, beta_, bo):
                return base_substep(cfg_, pot_, color, pos_, occ_, k, sf,
                                    beta_, bo, field=field, origin=org)

            # origin advance mirrors mc_sweep's shift derivation exactly
            # (ops/extfield.field_sweep); pre-sweep (key, sweep) on purpose.
            key_sweep = jax.random.fold_in(st.key, st.sweep)
            _, k_axis, k_dist, _ = jax.random.split(key_sweep, 4)
            axis = jax.random.randint(k_axis, (), 0, cfg.dim)
            d = jax.random.uniform(k_dist, (), minval=-cfg.cell_width / 2.0,
                                   maxval=cfg.cell_width / 2.0)
            do_shift = (st.sweep + 1) % cfg.shift_every == 0

            st, m = mc_sweep(cfg, pot, st, shift_fn, beta, block_offset,
                             shard_id, substep_fn=substep)
            step_d = jnp.where(do_shift, d, 0.0)
            org = org + step_d * (jnp.arange(cfg.dim) == axis)
            org = wrap_into_box(org, cfg.box_length)

            m = SweepMetrics(
                delta_e=jax.lax.psum(m.delta_e, sharded_names),
                accepted=jax.lax.psum(m.accepted, sharded_names),
                proposed=jax.lax.psum(m.proposed, sharded_names),
                overflow=jax.lax.psum(m.overflow.astype(jnp.int32),
                                      sharded_names) > 0,
            )
            return (st, org), m

        overflow = jax.lax.pcast(overflow, sharded_names, to="varying")
        st0 = SimState(pos, occ, key, sweep, overflow)
        (st, origin), ms = jax.lax.scan(step, (st0, origin), length=n_sweeps)
        ovf = jax.lax.psum(st.overflow.astype(jnp.int32), sharded_names) > 0
        st = SimState(st.pos, st.occ, st.key, st.sweep, ovf)
        return st, origin, ms

    rep = (replica_axis,) if replica_axis else ()
    pos_spec = P(*rep, None, None, None, *spatial_axes)
    occ_spec = P(*rep, None, *spatial_axes)
    sc = P(*rep)
    state_specs = SimState(pos=pos_spec, occ=occ_spec, key=sc, sweep=sc,
                           overflow=sc)
    origin_spec = P(*rep, None)
    beta_spec = P(*rep)
    met_spec = SweepMetrics(*(P(*rep, None),) * 4) if rep else \
        SweepMetrics(*(P(None),) * 4)

    def body(state: SimState, origin: jax.Array, betas: jax.Array):
        if replica_axis:
            f = jax.vmap(local_run)
        else:
            f = local_run
        return f(state.pos, state.occ, state.key, state.sweep,
                 state.overflow, origin, betas)

    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, origin_spec, beta_spec),
        out_specs=(state_specs, origin_spec, met_spec),
    )
    jitted = jax.jit(shmapped)

    def run(state: SimState, origin: jax.Array,
            betas: jax.Array | None = None):
        if betas is None:
            shape = (state.key.shape[0],) if replica_axis else ()
            betas = jnp.full(shape, cfg.beta, jnp.float32)
        return jitted(state, origin, betas)

    return run
