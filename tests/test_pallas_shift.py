"""Pallas grid-shift kernel vs the XLA cumsum merge (interpret mode on CPU).

The merge is deterministic given (state, axis, d), so the Pallas kernel must
be BITWISE identical to cells.shift_rebin — positions, occupancies, slot
order, and the overflow flag.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.ops import cells
from mcjax.ops.pallas_shift import pallas_shift_rebin


def hd_cfg(dim=2, n=48, phi=0.3, cps=8, nmax=6):
    if dim == 2:
        box = math.sqrt(n * math.pi / 4 / phi)
    else:
        box = (n * math.pi / 6 / phi) ** (1 / 3)
    return SimConfig(dim=dim, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=nmax, n_moves=2, proposal="uniform", step_size=0.1,
                     beta=1.0)


@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_shift_bitwise_vs_xla(dim):
    cfg = hd_cfg(dim=dim, n=48 if dim == 2 else 40, cps=8 if dim == 2 else 4)
    st = init_state(cfg, seed=1)
    w = cfg.cell_width
    # jit with traced (axis, d): eager interpret-mode pallas re-traces the
    # whole interpreter per call (~50 s each on a 1-core box); one jit cache
    # entry serves every combo below
    shift_xla = jax.jit(lambda p, o, a, d: cells.shift_rebin(cfg, p, o, a, d))
    shift_pl = jax.jit(lambda p, o, a, d: pallas_shift_rebin(
        cfg, p, o, a, d, interpret=True))
    for axis in range(dim):
        for d in (0.31 * w, -0.27 * w, 0.5 * w, -0.49 * w):
            a_pos, a_occ, a_ovf = shift_xla(
                st.pos, st.occ, jnp.int32(axis), jnp.float32(d))
            b_pos, b_occ, b_ovf = shift_pl(
                st.pos, st.occ, jnp.int32(axis), jnp.float32(d))
            np.testing.assert_array_equal(np.asarray(a_occ),
                                          np.asarray(b_occ))
            np.testing.assert_array_equal(np.asarray(a_pos),
                                          np.asarray(b_pos))
            assert bool(a_ovf) == bool(b_ovf)
            assert int(jnp.sum(b_occ)) == cfg.n_atoms


def test_pallas_shift_overflow_flagged():
    # tiny nmax so a shift can overflow a cell: flag must be sticky-visible
    cfg = hd_cfg(dim=2, n=48, phi=0.3, cps=8, nmax=2)
    key = jax.random.key(0)
    pts = jax.random.uniform(key, (cfg.n_atoms, 2),
                             minval=-cfg.box_length / 2,
                             maxval=cfg.box_length / 2)
    pos, occ, ovf0 = cells.bin_particles(cfg, pts)
    w = cfg.cell_width
    a = cells.shift_rebin(cfg, pos, occ, jnp.int32(0), jnp.float32(0.5 * w))
    b = pallas_shift_rebin(cfg, pos, occ, jnp.int32(0), jnp.float32(0.5 * w),
                           interpret=True)
    assert bool(a[2]) == bool(b[2])
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_run_sweeps_pallas_shift_trajectory_bitwise():
    # whole-sweep trajectories with the Pallas shift vs the XLA shift must be
    # bitwise equal for hard disks (shift choice must not touch physics)
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    cfg = hd_cfg(dim=2, n=64, phi=0.35, cps=8, nmax=8)
    hs = HardSphere(1.0)
    st = init_state(cfg, seed=2)
    a, _ = run_sweeps_pallas(cfg, hs, st, 5, 8, 128, True, False)
    b, _ = run_sweeps_pallas(cfg, hs, st, 5, 8, 128, True, True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.occ), np.asarray(b.occ))
