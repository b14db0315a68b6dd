"""NPT ensemble under the sharded device mesh.

The stored-frame convention (ops/npt.py) makes NPT mesh-composition almost
free: a volume move never moves a particle in the stored frame, so the
sharded cell geometry, halo exchange pattern, and binning are untouched —
the move is a pure replicated-scalar update of ``log_scale`` driven by a
psum'd global energy. Concretely, per sweep:

  * the particle sweep is the ordinary halo-sharded ``mc_sweep`` with the
    traced ``scale`` threaded through its pair distances;
  * the carried total energy (the dE-trace trick, kernel.cu:672-680) is
    advanced by the psum'd sweep dE, and the single cell-list energy pass
    at the proposed scale is a shard-local sum + one psum;
  * the ln-V proposal/acceptance randomness hangs off the replicated
    ``sim.key`` schedule tree (no shard fold-in), so every shard takes the
    same accept/reject decision by construction.

The reference has no barostat at all (its box is a compile-time constant,
kernel.cu:17-29) and no multi-device story; this composes both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.npt import NPTMetrics, NPTState, npt_sweep
from mcjax.ops.sweep import SweepMetrics, total_interaction_cells
from mcjax.parallel.mesh import (_check_divisible, make_halo_shift_fn,
                                 state_sharding)


def shard_npt_state(cfg: SimConfig, nst: NPTState, mesh: Mesh,
                    spatial_axes) -> NPTState:
    """Place an NPTState onto the mesh (sim sharded, log_scale replicated)."""
    _check_divisible(cfg, mesh, spatial_axes)
    sim_sh = state_sharding(cfg, mesh, tuple(spatial_axes))
    sh = NPTState(sim=sim_sh, log_scale=NamedSharding(mesh, P()))
    return jax.tree.map(jax.device_put, nst, sh)


def make_sharded_run_npt(cfg: SimConfig, pot: Potential, mesh: Mesh,
                         spatial_axes, pressure: float, n_sweeps: int,
                         dlnv_max: float = 0.02, volume_every: int = 1,
                         anchor_every: int = 0, substep_fn=None):
    """Build a jitted ``run(nst) -> (nst, NPTMetrics)`` NPT runner over
    ``spatial_axes`` of ``mesh`` — the mesh analogue of ``ops.npt.run_npt``
    (same anchored-energy scan; energies/metrics are psum'd global)."""
    _check_divisible(cfg, mesh, spatial_axes)
    spatial_axes = tuple(spatial_axes)
    sharded_names = tuple(n for n in spatial_axes if n is not None)
    shift_fn = make_halo_shift_fn(spatial_axes)

    if getattr(pot, "is_mixture", False):
        from mcjax.ops.mixture import total_interaction_cells_mixture \
            as _total_cells
    else:
        _total_cells = total_interaction_cells

    def _anchor(pos, occ, log_scale):
        u, _ = _total_cells(cfg, pot, pos, occ, shift_fn,
                            scale=jnp.exp(log_scale))
        return jax.lax.psum(u, sharded_names)

    def local_run(pos, occ, key, sweep, overflow, log_scale):
        offs, shard_id = [], jnp.int32(0)
        for k, name in enumerate(spatial_axes):
            if name is None:
                offs.append(jnp.int32(0))
            else:
                idx = jax.lax.axis_index(name)
                offs.append(idx * (cfg.half_cps // mesh.shape[name]))
                shard_id = shard_id * mesh.shape[name] + idx
        block_offset = jnp.stack(offs)

        u0 = _anchor(pos, occ, log_scale)
        overflow = jax.lax.pcast(overflow, sharded_names, to="varying")
        nst0 = NPTState(sim=SimState(pos, occ, key, sweep, overflow),
                        log_scale=log_scale)

        def body(carry, _):
            st, u = carry
            if anchor_every:
                u = jax.lax.cond(
                    st.sim.sweep % anchor_every == 0,
                    lambda: _anchor(st.sim.pos, st.sim.occ, st.log_scale),
                    lambda: u)
            do_vol = (st.sim.sweep + 1) % volume_every == 0
            st, mtr = npt_sweep(cfg, pot, st, pressure, dlnv_max, u_old=u,
                                do_volume=do_vol, substep_fn=substep_fn,
                                shift_fn=shift_fn, block_offset=block_offset,
                                shard_id=shard_id, psum_axes=sharded_names)
            return (st, mtr.energy), mtr

        (nst, _), ms = jax.lax.scan(body, (nst0, u0), length=n_sweeps)
        ovf = jax.lax.psum(nst.sim.overflow.astype(jnp.int32),
                           sharded_names) > 0
        sim = SimState(nst.sim.pos, nst.sim.occ, nst.sim.key, nst.sim.sweep,
                       ovf)
        return NPTState(sim=sim, log_scale=nst.log_scale), ms

    pos_spec = P(None, None, None, *spatial_axes)
    occ_spec = P(None, *spatial_axes)
    sc = P()
    nst_specs = NPTState(
        sim=SimState(pos=pos_spec, occ=occ_spec, key=sc, sweep=sc,
                     overflow=sc),
        log_scale=sc)
    met_specs = NPTMetrics(sweep=SweepMetrics(*(P(None),) * 4),
                           vol_accepted=P(None), volume=P(None),
                           energy=P(None))

    def body(nst: NPTState):
        return local_run(nst.sim.pos, nst.sim.occ, nst.sim.key,
                         nst.sim.sweep, nst.sim.overflow, nst.log_scale)

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(nst_specs,),
        out_specs=(nst_specs, met_specs)))
