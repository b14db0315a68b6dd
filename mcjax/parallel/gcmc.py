"""Grand-canonical (muVT) ensemble under the sharded device mesh.

Only the CHECKERBOARD GC phase shards (ops/gcmc.py
``gc_phase_checkerboard``): muVT factorizes over disjoint subvolumes, so
per-cell insert/delete acceptances need only the cell's own count — no
global-N collective — and simultaneous same-color attempts are independent
by the sweep engine's checkerboard argument. The halo machinery
(``make_halo_shift_fn`` + block offsets) plugs in unchanged; the serial
attempt scan (``gc_phase``) stays the single-chip small-N reference.

The reference is NVT-only with a compile-time N (kernel.cu:17) and has no
multi-device story; this composes open-system sampling with domain
sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.gcmc import GCMetrics, GCMixtureMetrics, gcmc_sweep
from mcjax.ops.sweep import SweepMetrics
from mcjax.parallel.mesh import _check_divisible, make_halo_shift_fn


def make_sharded_run_gcmc(cfg: SimConfig, pot: Potential, mesh: Mesh,
                          spatial_axes, z, n_sweeps: int,
                          n_attempts: int = 1, substep_fn=None,
                          n_trials: int = 1):
    """Build a jitted ``run(state) -> (state, GCMetrics)`` muVT runner over
    ``spatial_axes`` of ``mesh`` (checkerboard GC phase, ``n_attempts``
    phase repeats per sweep). Metrics come back psum'd global; shard the
    state with ``mesh.shard_state``.

    Mixture potentials compose directly: ``z`` is then the per-species
    activity vector and the metrics gain a psum'd per-sweep composition
    (``GCMixtureMetrics.counts``) — the per-cell acceptances still need no
    global collective, species or not."""
    _check_divisible(cfg, mesh, spatial_axes)
    mixture = getattr(pot, "is_mixture", False)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    shift_fn = make_halo_shift_fn(spatial_axes)

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
            st, m = gcmc_sweep(cfg, pot, st, z, n_attempts,
                               checkerboard=True, shift_fn=shift_fn,
                               block_offset=block_offset, shard_id=shard_id,
                               substep_fn=substep_fn, n_trials=n_trials)
            sm = SweepMetrics(
                delta_e=_psum(m.sweep.delta_e),
                accepted=_psum(m.sweep.accepted),
                proposed=_psum(m.sweep.proposed),
                overflow=_psum(m.sweep.overflow.astype(jnp.int32)) > 0)
            if mixture:
                met = GCMixtureMetrics(
                    sweep=sm, n_particles=_psum(m.n_particles),
                    inserted=_psum(m.inserted), deleted=_psum(m.deleted),
                    capacity_rejects=_psum(m.capacity_rejects),
                    counts=_psum(m.counts))
            else:
                met = GCMetrics(
                    sweep=sm, n_particles=_psum(m.n_particles),
                    inserted=_psum(m.inserted), deleted=_psum(m.deleted),
                    capacity_rejects=_psum(m.capacity_rejects))
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
    if mixture:
        met_specs = GCMixtureMetrics(sweep=SweepMetrics(*(P(None),) * 4),
                                     n_particles=P(None), inserted=P(None),
                                     deleted=P(None),
                                     capacity_rejects=P(None),
                                     counts=P(None, None))
    else:
        met_specs = GCMetrics(sweep=SweepMetrics(*(P(None),) * 4),
                              n_particles=P(None), inserted=P(None),
                              deleted=P(None), capacity_rejects=P(None))

    def body(state: SimState):
        return local_run(state.pos, state.occ, state.key, state.sweep,
                         state.overflow)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(state_specs,),
        out_specs=(state_specs, met_specs)))
