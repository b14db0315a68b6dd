"""Fused (in-kernel halo DMA) sub-sweep — bitwise parity vs the classic
Pallas engine in interpret mode.

The fused kernel composes neighbor planes in VMEM from one super-range DMA
per source color (lane-rotated windows + edge-mask selects).  That
composition is the closed form of cells.flat_neighbor_stack's sequential
roll/select chain, so on identical Threefry streams the two engines must be
BITWISE identical — hard-core trajectories and LJ alike (same arithmetic,
same order).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.mixtures import kob_andersen
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.mixture import init_mixture_state
from mcjax.ops.pallas_sweep import (make_fused_substep, make_pallas_substep,
                                    run_sweeps_pallas)


def _hd_cfg(n=512, phi=0.4, nmax=8, n_moves=4):
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    return SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=nmax, n_moves=n_moves, proposal="uniform",
                     step_size=0.15, beta=1.0), HardSphere(1.0)


def test_fused_bitwise_hard_disks_all_colors():
    cfg, pot = _hd_cfg()
    st = init_state(cfg)
    key = jax.random.key(5)
    classic = make_pallas_substep(8, 128, interpret=True)
    fused = make_fused_substep(8, 128, interpret=True)
    for color in range(cfg.n_colors):
        a = classic(cfg, pot, color, st.pos, st.occ, key)
        b = fused(cfg, pot, color, st.pos, st.occ, key)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert int(a[2]) == int(b[2]) and int(a[3]) == int(b[3])


def test_fused_bitwise_lj3d():
    cfg = SimConfig(dim=3, n_atoms=500, box_length=10.0, cells_per_side=4,
                    nmax=24, n_moves=3, proposal="gaussian", step_size=0.2,
                    beta=0.5)
    pot = LennardJones(r_cut=2.5)
    st = init_state(cfg)
    key = jax.random.key(7)
    classic = make_pallas_substep(8, 128, interpret=True, slot_group=4)
    fused = make_fused_substep(8, 128, interpret=True, slot_group=4)
    for color in (0, 3, 5, 7):
        a = classic(cfg, pot, color, st.pos, st.occ, key)
        b = fused(cfg, pot, color, st.pos, st.occ, key)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_fused_full_run_bitwise():
    """Whole runs (sub-sweeps + grid shifts) stay bitwise locked."""
    cfg, pot = _hd_cfg(n=256, phi=0.45, n_moves=3)
    st = init_state(cfg)
    a, ma = run_sweeps_pallas(cfg, pot, st, 5, 8, 128, True)
    b, mb = run_sweeps_pallas(cfg, pot, st, 5, 8, 128, True, fused=True)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.occ), np.asarray(b.occ))
    np.testing.assert_array_equal(np.asarray(ma.accepted),
                                  np.asarray(mb.accepted))
    assert int(jnp.sum(b.occ)) == cfg.n_atoms


def test_fused_mixture_bitwise():
    """Species plane rides the fused DMA/window path untouched."""
    n = 600
    ka = kob_andersen()
    rho = 1.1
    box = (n / rho) ** (1.0 / 3.0)
    cps = int(box // ka.r_cut)
    cps -= cps % 2
    cps = max(cps, 4)
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=32, n_moves=2, proposal="gaussian", step_size=0.09,
                    beta=1.0 / 0.8, seed=2)
    from mcjax.ops.cells import stratified_positions
    spec = (jnp.arange(n) % 5 == 4).astype(jnp.int32)
    st = init_mixture_state(cfg, stratified_positions(cfg), spec)
    key = jax.random.key(3)
    classic = make_pallas_substep(8, 128, interpret=True, slot_group=4)
    fused = make_fused_substep(8, 128, interpret=True, slot_group=4)
    for color in (0, 6):
        a = classic(cfg, ka, color, st.pos, st.occ, key)
        b = fused(cfg, ka, color, st.pos, st.occ, key)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_fused_rejects_sharded_use():
    cfg, pot = _hd_cfg()
    st = init_state(cfg)
    fused = make_fused_substep(8, 128, interpret=True)
    with pytest.raises(ValueError):
        fused(cfg, pot, 0, st.pos, st.occ, jax.random.key(0),
              block_offset=jnp.zeros((2,), jnp.int32))
