"""Gates for the in-place ring engine (ops/pallas_ring.py, round 4).

The strongest available check: hard-core trajectories must be BITWISE
equal to the round-3 fused engine (and therefore to the XLA engine, which
test_pallas locks to it) — same Threefry streams, same schedule tree, the
ring engine only changes WHERE the state lives between sub-steps.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.cells import stratified_positions
from mcjax.ops.pallas_ring import _use_sliver, run_sweeps_ring
from mcjax.ops.pallas_sweep import run_sweeps_pallas
from mcjax.ops.sweep import run_sweeps
from mcjax.ops.sweep import total_energy_cells


def _hd_cfg(cps: int = 8, n: int = 24, n_moves: int = 3,
            seed: int = 5) -> SimConfig:
    return SimConfig(dim=2, n_atoms=n, box_length=2.0 * cps,
                     cells_per_side=cps, nmax=7, n_moves=n_moves,
                     proposal="uniform", step_size=0.25, beta=1.0,
                     seed=seed)


def test_ring_bitwise_vs_fused_hard_disks():
    cfg = _hd_cfg()
    pot = HardSphere(1.0)
    state = init_state(cfg)
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 5, 8, 128, True,
                                  False, 1, 1, False, True)
    st_r, m_r = run_sweeps_ring(cfg, pot, state, 5, 8, 128, True,
                                1, 1, False, 0, None, False)
    assert np.array_equal(np.asarray(st_f.pos), np.asarray(st_r.pos))
    assert np.array_equal(np.asarray(st_f.occ), np.asarray(st_r.occ))
    assert np.array_equal(np.asarray(m_f.accepted), np.asarray(m_r.accepted))
    assert np.array_equal(np.asarray(m_f.proposed), np.asarray(m_r.proposed))


def test_ring_bitwise_vs_xla_sliver_path():
    """cps=64 engages the apron-SLIVER refresh (production path) instead of
    the tiny-grid whole-ring rebuild; gate against the XLA engine."""
    cfg = _hd_cfg(cps=64, n=2400, n_moves=2, seed=9)
    assert _use_sliver(cfg, 8, 128)
    pot = HardSphere(1.0)
    state = init_state(cfg)
    st_x, m_x = run_sweeps(cfg, pot, state, 3)
    st_r, m_r = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                                1, 1, False, 0, None, False)
    assert np.array_equal(np.asarray(st_x.pos), np.asarray(st_r.pos))
    assert np.array_equal(np.asarray(st_x.occ), np.asarray(st_r.occ))
    assert np.array_equal(np.asarray(m_x.accepted), np.asarray(m_r.accepted))


def test_ring_lj3d_de_anchor():
    """3D LJ: 8-color plans + fori neighbor loop through the ring kernel;
    the dE-accumulated trace must telescope to the exact energy."""
    cfg = SimConfig(dim=3, n_atoms=120, box_length=10.0, cells_per_side=4,
                    nmax=8, n_moves=2, proposal="gaussian", step_size=0.1,
                    beta=0.8, seed=2)
    pot = LennardJones(r_cut=2.5)
    state = init_state(cfg, positions=stratified_positions(cfg))
    e0 = float(total_energy_cells(cfg, pot, state.pos, state.occ))
    st, m = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                            26, 2, False, 0, None, False)
    e1 = float(total_energy_cells(cfg, pot, st.pos, st.occ))
    de = float(jnp.sum(m.delta_e))
    assert int(jnp.sum(st.occ)) == cfg.n_atoms
    assert abs((e0 + de) - e1) <= 2e-3 * max(1.0, abs(e1))
    # and bitwise against the fused engine on the same run
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 3, 8, 128, True,
                                  False, 26, 2, False, True)
    assert np.array_equal(np.asarray(m_f.accepted), np.asarray(m.accepted))
    assert np.allclose(np.asarray(st_f.pos), np.asarray(st.pos))


def test_ring_shard_fold_matches_fused():
    cfg = _hd_cfg(seed=11)
    pot = HardSphere(1.0)
    state = init_state(cfg)
    from mcjax.ops.pallas_sweep import run_sweeps_fused
    st_f, _ = run_sweeps_fused(cfg, pot, state, 2, 8, 128, True, 1, 1,
                               False, 0, shard_fold=0)
    st_r, _ = run_sweeps_ring(cfg, pot, state, 2, 8, 128, True, 1, 1,
                              False, 0, 0, False)
    assert np.array_equal(np.asarray(st_f.pos), np.asarray(st_r.pos))


@pytest.mark.parametrize("axis,sign", [(0, 1), (0, -1), (1, 1), (1, -1)])
def test_ring_shift_bitwise_vs_xla(axis, sign):
    """The ring-native Pallas shift must be BITWISE equal to the XLA merge
    (cells.shift_rebin) — every axis and direction, wraps included."""
    from mcjax.ops.pallas_ring import _refresh_all, ring_shift
    from mcjax.ops.pallas_sweep import _ring_state, _unring_state

    cfg = _hd_cfg(cps=8, n=40, seed=21 + axis * 2 + (sign > 0))
    pot = HardSphere(1.0)
    state, _ = run_sweeps(cfg, pot, init_state(cfg), 2)
    d = jnp.float32(sign * 0.37 * cfg.cell_width)
    pos_ref, occ_ref, ovf_ref = jax.jit(
        lambda p, o: cells_shift(cfg, p, o, jnp.int32(axis), d))(
            state.pos, state.occ)

    tr = 8
    ext3, exto3 = _ring_state(cfg, state.pos, state.occ, tr, 128)
    e3, eo3, ovf_map = jax.jit(partial(
        ring_shift, cfg, n_planes=2, tile_rows=tr, tile_cols=128,
        interpret=True))(ext3, exto3, jnp.int32(axis), d)
    e3, eo3 = _refresh_all(cfg, e3, eo3, tr, 128)
    pos_k, occ_k = _unring_state(cfg, e3, eo3, tr, 128)

    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ_k))
    assert np.array_equal(np.asarray(pos_ref),
                          np.asarray(pos_k).reshape(pos_ref.shape))
    assert bool(ovf_ref) == bool(jnp.sum(ovf_map) > 0)


def cells_shift(cfg, pos, occ, axis, d):
    from mcjax.ops.cells import shift_rebin
    from mcjax.ops.sweep import roll_shift_fn
    return shift_rebin(cfg, pos, occ, axis, d, roll_shift_fn, None)


def test_ring_onecall_bitwise_vs_ring():
    """The single-call sweep (ALL color sub-steps in ONE pallas_call whose
    grid carries the sub-step index — VERDICT r4 item 3) is bitwise the
    4-call ring engine: host RNG, production sliver/mirror geometry,
    Pallas shift on."""
    cfg = _hd_cfg(cps=64, n=2400, n_moves=2, seed=13)
    pot = HardSphere(1.0)
    state = init_state(cfg)
    st_r, m_r = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                                1, 1, False, 0, None, True, False, False)
    st_o, m_o = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                                1, 1, False, 0, None, True, False, True)
    assert int(jnp.sum(st_o.occ)) == cfg.n_atoms
    assert np.array_equal(np.asarray(st_r.pos), np.asarray(st_o.pos))
    assert np.array_equal(np.asarray(st_r.occ), np.asarray(st_o.occ))
    assert np.array_equal(np.asarray(m_r.accepted), np.asarray(m_o.accepted))
    assert np.array_equal(np.asarray(m_r.proposed), np.asarray(m_o.proposed))


def test_ring_onecall_energetic_square_well():
    """Energetic path through the one-call sweep: the accept-uniform
    stream and the per-(substep, tile) dE maps must reproduce the 4-call
    engine exactly (square-well energies are integer multiples of eps, so
    both summation orders are fp-exact — the strongest deterministic
    check for an energetic model)."""
    from mcjax.models.potentials import SquareWell

    cfg = dataclasses.replace(_hd_cfg(cps=64, n=1800, n_moves=2, seed=17),
                              step_size=0.3)
    pot = SquareWell(diameter=1.0, lam=1.4, epsilon=1.0)
    state = init_state(cfg)
    st_r, m_r = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                                1, 1, False, 0, None, True, False, False)
    st_o, m_o = run_sweeps_ring(cfg, pot, state, 3, 8, 128, True,
                                1, 1, False, 0, None, True, False, True)
    assert int(jnp.sum(st_o.occ)) == cfg.n_atoms
    assert np.array_equal(np.asarray(st_r.pos), np.asarray(st_o.pos))
    assert np.array_equal(np.asarray(m_r.accepted), np.asarray(m_o.accepted))
    assert np.array_equal(np.asarray(m_r.delta_e), np.asarray(m_o.delta_e))


def test_ring_full_loop_with_pallas_shift_bitwise():
    """Whole-loop gate: ring engine WITH the in-kernel shift == fused."""
    cfg = _hd_cfg(seed=31, n_moves=2)
    pot = HardSphere(1.0)
    state = init_state(cfg)
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 4, 8, 128, True,
                                  False, 1, 1, False, True)
    st_r, m_r = run_sweeps_ring(cfg, pot, state, 4, 8, 128, True,
                                1, 1, False, 0, None, True)
    assert np.array_equal(np.asarray(st_f.pos), np.asarray(st_r.pos))
    assert np.array_equal(np.asarray(st_f.occ), np.asarray(st_r.occ))
    assert np.array_equal(np.asarray(m_f.accepted), np.asarray(m_r.accepted))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
