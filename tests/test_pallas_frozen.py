"""Gates for the frozen-neighbor energy cache (round 4, VERDICT r3 #3).

The cache changes the dE SUMMATION ORDER only: per move it evaluates
u(new) over the frozen neighbor cells and subtracts a per-substep
precomputed old-frozen sum, instead of summing (u_new - u_old) per pair.
Two gates:

* SquareWell: every pair energy is an exact small integer multiple of
  epsilon, so BOTH summation orders are exact in f32 — trajectories must
  be BITWISE identical with the cache on and off (the strongest possible
  deterministic check of the cached dE arithmetic, including the cache
  update on accept and the hard-core overlap path).
* Lennard-Jones: fp sums differ, so the gate is the dE-anchor identity
  (telescoped per-sweep dE trace == exact energy difference) plus a sane
  acceptance rate, mirroring tests/test_pallas.py's uncached anchors.

Reference analogue: the per-move old+new pair-energy loop the cache
halves, CUDA-Parallel-MC kernel.cu:315-379.
"""

import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import LennardJones, SquareWell
from mcjax.ops.cells import stratified_positions
from mcjax.ops.pallas_sweep import run_sweeps_pallas
from mcjax.ops.sweep import total_energy_cells


def _cfg3d(n: int = 120, cps: int = 4, nmax: int = 8,
           n_moves: int = 6, seed: int = 3, step: float = 0.15,
           beta: float = 0.8) -> SimConfig:
    return SimConfig(dim=3, n_atoms=n, box_length=2.6 * cps,
                     cells_per_side=cps, nmax=nmax, n_moves=n_moves,
                     proposal="gaussian", step_size=step, beta=beta,
                     seed=seed)


def test_frozen_cache_bitwise_square_well():
    """Integer-valued energies: cached and uncached dE are EXACT, so the
    trajectories must be bitwise equal (fused engine, interpret)."""
    cfg = _cfg3d(n=100, seed=7, step=0.2, beta=0.7)
    pot = SquareWell(epsilon=1.0, diameter=1.0, lam=1.5)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg, positions=stratified_positions(cfg))
    st_u, m_u = run_sweeps_pallas(cfg, pot, state, 3, 8, 128, True,
                                  False, 1, 8, False, True, 0, False)
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 3, 8, 128, True,
                                  False, 1, 8, False, True, 0, True)
    assert np.array_equal(np.asarray(st_u.pos), np.asarray(st_f.pos))
    assert np.array_equal(np.asarray(st_u.occ), np.asarray(st_f.occ))
    assert np.array_equal(np.asarray(m_u.accepted), np.asarray(m_f.accepted))
    assert np.array_equal(np.asarray(m_u.delta_e), np.asarray(m_f.delta_e))
    assert int(np.sum(np.asarray(m_f.accepted))) > 0


def test_frozen_cache_lj_de_anchor():
    """LJ: the telescoped dE trace must equal the exact energy difference
    (the anchor catches ANY cache staleness — a missed update drifts it)."""
    cfg = _cfg3d(n=120, seed=5)
    pot = LennardJones(r_cut=2.5)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg, positions=stratified_positions(cfg))
    e0 = float(total_energy_cells(cfg, pot, state.pos, state.occ))
    st, m = run_sweeps_pallas(cfg, pot, state, 4, 8, 128, True,
                              False, 1, 8, False, True, 0, True)
    e1 = float(total_energy_cells(cfg, pot, st.pos, st.occ))
    de = float(jnp.sum(m.delta_e))
    assert not bool(st.overflow)
    assert abs((e1 - e0) - de) <= 1e-3 * max(1.0, abs(e1 - e0)), \
        (e0, e1, de)
    acc = int(np.sum(np.asarray(m.accepted)))
    prop = int(np.sum(np.asarray(m.proposed)))
    assert 0 < acc < prop


def test_frozen_cache_classic_path_matches_fused():
    """The classic (materialized-stack) path with the cache must produce
    the same square-well trajectory as the fused path with the cache —
    both consume identical streams and exact integer energies."""
    cfg = _cfg3d(n=100, seed=11, step=0.2, beta=0.7)
    pot = SquareWell(epsilon=1.0, diameter=1.0, lam=1.5)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg, positions=stratified_positions(cfg))
    st_c, m_c = run_sweeps_pallas(cfg, pot, state, 3, 8, 128, True,
                                  False, 1, 8, False, False, 0, True)
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 3, 8, 128, True,
                                  False, 1, 8, False, True, 0, True)
    assert np.array_equal(np.asarray(st_c.pos), np.asarray(st_f.pos))
    assert np.array_equal(np.asarray(m_c.accepted), np.asarray(m_f.accepted))


def test_frozen_cache_classic_path_not_a_noop():
    """LJ cached: classic and fused must match BITWISE.  Unlike the
    square-well gate above (where cached == uncached exactly, so a
    silently-dropped flag is undetectable), LJ's cached dE has a different
    fp summation order than uncached — if the classic path drops
    frozen_cache (the round-4 advisor finding: pallas_color_substep did
    not forward it to _make_kernel), classic runs UNcached and diverges
    bitwise from the cached fused trajectory."""
    cfg = _cfg3d(n=120, seed=5)
    pot = LennardJones(r_cut=2.5)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg, positions=stratified_positions(cfg))
    st_c, m_c = run_sweeps_pallas(cfg, pot, state, 4, 8, 128, True,
                                  False, 1, 8, False, False, 0, True)
    st_f, m_f = run_sweeps_pallas(cfg, pot, state, 4, 8, 128, True,
                                  False, 1, 8, False, True, 0, True)
    assert np.array_equal(np.asarray(st_c.pos), np.asarray(st_f.pos))
    assert np.array_equal(np.asarray(m_c.accepted), np.asarray(m_f.accepted))
    assert np.array_equal(np.asarray(m_c.delta_e), np.asarray(m_f.delta_e))
    # and the cached classic run must differ from an UNcached classic run
    # (same seed) — proof the flag actually reached the kernel
    st_u, m_u = run_sweeps_pallas(cfg, pot, state, 4, 8, 128, True,
                                  False, 1, 8, False, False, 0, False)
    assert not np.array_equal(np.asarray(m_c.delta_e),
                              np.asarray(m_u.delta_e))
