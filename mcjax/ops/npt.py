"""NPT (isothermal-isobaric) ensemble: volume moves on top of the sweep engine.

The reference is NVT-only (kernel.cu's box is a compile-time constant); NPT
is a capability extension (docs/ROADMAP.md) built so the hot path stays
untouched:

* **Stored-frame convention.** ``cfg.box_length`` is the reference box L0
  and stays STATIC (it drives jit specialization and the cell geometry).
  The state carries a traced ``log_scale``; the physical box is s*L0 and the
  physical coordinates are s x the stored ones. A volume move rescales the
  box AND all coordinates uniformly — in the stored frame nothing moves, so
  particles keep their cells, binning/grid shifts are unchanged, and the
  ONLY effect is on pair distances: r^2_phys = s^2 r~^2 (plumbed through
  ``color_substep``/``total_interaction_cells`` as the traced ``scale``).
* **Volume moves in ln V** (Frenkel & Smit, Understanding Molecular
  Simulation, alg. 11): propose dlnV ~ U(-delta, delta), accept with
  min(1, exp(-beta dU - beta P dV + (N+1) dlnV)); hard-core overlap or a
  physical cell width below the potential cutoff (one-ring coverage
  contract) rejects outright.

Both engines are scale-aware: the XLA substep threads ``scale`` through its
pair distances, and the Pallas kernel receives s^2 as an SMEM scalar
(``substep_fn=make_pallas_substep(...)`` — compiled out entirely for NVT).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.sweep import (SweepMetrics, mc_sweep, total_interaction_cells)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NPTState:
    """NVT SimState + the traced box-scale factor (as log s)."""

    sim: SimState
    log_scale: jax.Array

    @property
    def scale(self) -> jax.Array:
        return jnp.exp(self.log_scale)


class NPTMetrics(NamedTuple):
    sweep: SweepMetrics       # particle-move metrics (per sweep)
    vol_accepted: jax.Array   # volume move accepted this sweep?
    volume: jax.Array         # physical volume after the move
    energy: jax.Array         # physical total energy after the move


def init_npt(state: SimState) -> NPTState:
    return NPTState(sim=state, log_scale=jnp.zeros((), jnp.float32))


def npt_sweep(cfg: SimConfig, pot: Potential, nst: NPTState,
              pressure: float, dlnv_max: float = 0.02,
              beta: jax.Array | float | None = None,
              u_old: jax.Array | None = None,
              do_volume: jax.Array | bool = True,
              substep_fn=None,
              shift_fn=None,
              block_offset: jax.Array | None = None,
              shard_id: jax.Array | None = None,
              psum_axes: tuple = ()
              ) -> tuple[NPTState, NPTMetrics]:
    """One NPT MC sweep: a full particle sweep at fixed volume, then one
    ln-V volume move.

    ``u_old``: the carried total energy at the current scale (the dE-trace
    trick, reference kernel.cu:672-680) — passing it makes the volume move
    cost ONE cell-list energy pass (at the proposed scale) instead of two
    (VERDICT r2 item 7); the particle sweep's accumulated dE updates it for
    free. None falls back to an exact pass at the current scale.
    ``do_volume`` (traced bool): skip the volume move (and its energy pass)
    entirely this sweep — see run_npt's ``volume_every``.

    Mesh runs (``mcjax.parallel.npt``): pass the halo ``shift_fn`` +
    ``block_offset``/``shard_id`` (as for ``mc_sweep``) and the sharded
    mesh axis names as ``psum_axes``. Energies and metrics come back
    psum'd GLOBAL; the ln-V proposal/acceptance randomness hangs off the
    replicated ``sim.key`` (schedule tree, no shard fold-in), so every
    shard takes the same volume decision — the stored-frame convention
    makes that decision a pure scalar update (``log_scale``), leaving the
    sharded cell geometry untouched.
    """
    if beta is None:
        beta = cfg.beta
    if shift_fn is None:
        from mcjax.ops.cells import roll_shift_fn
        shift_fn = roll_shift_fn
    if getattr(pot, "is_mixture", False):
        # mixtures compose: species-resolved totals + the mixture substep
        # (mc_sweep defaults to color_substep_mixture for mixture pots)
        from mcjax.ops.mixture import total_interaction_cells_mixture \
            as _total_cells
    else:
        _total_cells = total_interaction_cells
    dim, n = cfg.dim, cfg.n_atoms
    l0 = cfg.box_length

    def _psum(x):
        return jax.lax.psum(x, psum_axes) if psum_axes else x

    s = jnp.exp(nst.log_scale)
    sim, m = mc_sweep(cfg, pot, nst.sim, shift_fn, beta, block_offset,
                      shard_id, scale=s, substep_fn=substep_fn)
    if psum_axes:
        m = SweepMetrics(
            delta_e=_psum(m.delta_e),
            accepted=_psum(m.accepted),
            proposed=_psum(m.proposed),
            overflow=_psum(m.overflow.astype(jnp.int32)) > 0,
        )

    if u_old is None:
        u_cur, _ = _total_cells(cfg, pot, sim.pos, sim.occ, shift_fn,
                                scale=s)
        u_cur = _psum(u_cur)
    else:
        u_cur = u_old + m.delta_e

    # volume-move randomness: a stream disjoint from mc_sweep's
    # fold_in(key, sweep) tree (negative tags never collide with sweep >= 0)
    kv = jax.random.fold_in(sim.key, -(sim.sweep + 1))
    k_prop, k_acc = jax.random.split(kv)
    dlnv = jax.random.uniform(k_prop, (), minval=-dlnv_max, maxval=dlnv_max)
    s_new = s * jnp.exp(dlnv / dim)

    def volume_move():
        u_new, ov_new = _total_cells(cfg, pot, sim.pos, sim.occ, shift_fn,
                                     scale=s_new)
        u_new = _psum(u_new)
        ov_new = _psum(ov_new.astype(jnp.int32)) > 0 if psum_axes else ov_new
        v_old = (s * l0) ** dim
        v_new = (s_new * l0) ** dim
        ln_acc = (-beta * (u_new - u_cur)
                  - beta * pressure * (v_new - v_old) + (n + 1) * dlnv)
        # one-ring coverage contract: physical cell width must stay >= r_cut
        ok_geom = s_new * cfg.cell_width >= pot.r_cut
        u = jax.random.uniform(k_acc, (), minval=1e-38, maxval=1.0)
        accept = ok_geom & ~ov_new & (jnp.log(u) < ln_acc)
        log_scale = jnp.where(accept, nst.log_scale + dlnv / dim,
                              nst.log_scale)
        return log_scale, jnp.where(accept, u_new, u_cur), accept

    log_scale, energy, accepted = jax.lax.cond(
        jnp.asarray(do_volume),
        volume_move,
        lambda: (nst.log_scale, u_cur, jnp.zeros((), jnp.bool_)))
    s_fin = jnp.exp(log_scale)
    metrics = NPTMetrics(
        sweep=m,
        vol_accepted=accepted,
        volume=(s_fin * l0) ** dim,
        energy=energy,
    )
    return NPTState(sim=sim, log_scale=log_scale), metrics


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7, 8))
def run_npt(cfg: SimConfig, pot: Potential, nst: NPTState, pressure: float,
            n_sweeps: int, dlnv_max: float = 0.02,
            volume_every: int = 1, anchor_every: int = 0,
            substep_fn=None
            ) -> tuple[NPTState, NPTMetrics]:
    """n_sweeps NPT sweeps as one scan; metrics stacked per sweep.

    The total energy is anchored exactly ONCE before the scan, then carried
    through it by the accumulated particle-sweep dE — one cell-list energy
    pass per attempted volume move instead of two (the reference's own
    trace trick, kernel.cu:672-680). ``volume_every=k`` attempts the volume
    move every k-th sweep (halving fixed cost again at flagship N);
    ``anchor_every=k`` re-anchors the carried energy exactly every k sweeps
    (fp32 dE drift guard — SURVEY.md Q9; 0 = only the initial anchor).
    """
    if getattr(pot, "is_mixture", False):
        from mcjax.ops.mixture import total_interaction_cells_mixture \
            as _total_cells
    else:
        _total_cells = total_interaction_cells
    u0, _ = _total_cells(cfg, pot, nst.sim.pos, nst.sim.occ,
                         scale=nst.scale)

    def body(carry, _):
        st, u = carry
        if anchor_every:
            u = jax.lax.cond(
                st.sim.sweep % anchor_every == 0,
                lambda: _total_cells(
                    cfg, pot, st.sim.pos, st.sim.occ,
                    scale=jnp.exp(st.log_scale))[0],
                lambda: u)
        do_vol = (st.sim.sweep + 1) % volume_every == 0
        st, mtr = npt_sweep(cfg, pot, st, pressure, dlnv_max, u_old=u,
                            do_volume=do_vol, substep_fn=substep_fn)
        return (st, mtr.energy), mtr

    (nst, _), ms = jax.lax.scan(body, (nst, u0), length=n_sweeps)
    return nst, ms
