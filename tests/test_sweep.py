"""Sweep-engine tests: invariants, energy-trace anchoring, reproducibility,
and equilibrium physics parity vs the independent serial chain
(SURVEY.md §4 property + statistical tiers)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.models.reference import serial_metropolis, total_energy
from mcjax.ops import cells
from mcjax.ops.sweep import mc_sweep, run_sweeps, total_energy_cells


def lj_cfg(**kw):
    base = dict(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                nmax=10, n_moves=10, beta=0.3, step_size=0.5, seed=0)
    base.update(kw)
    return SimConfig(**base)


def hd_cfg(n=256, phi=0.5, **kw):
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.0) - int(L // 1.0) % 2
    base = dict(dim=2, n_atoms=n, box_length=L, cells_per_side=cps, nmax=8,
                n_moves=8, proposal="uniform", step_size=0.15, beta=1.0, seed=0)
    base.update(kw)
    return SimConfig(**base)


LJ = LennardJones(r_cut=2.5)
HD = HardSphere(1.0)


def test_total_energy_cells_matches_n2():
    cfg = lj_cfg(n_atoms=100, nmax=15)
    r = jax.random.uniform(jax.random.key(3), (100, 3), minval=-5.0, maxval=5.0)
    pos, occ, _ = cells.bin_particles(cfg, r)
    e_cells = total_energy_cells(cfg, LJ, pos, occ)
    e_exact, _ = total_energy(LJ, r, cfg.box_length)
    np.testing.assert_allclose(float(e_cells), float(e_exact), rtol=1e-4)


def test_energy_trace_anchored_to_exact():
    """The reference's own verification technique (kernel.cu:642,672-680):
    E0 + sum(accepted dE) must track the exact energy."""
    cfg = lj_cfg()
    st = init_state(cfg)
    e0, _ = total_energy(LJ, cells.unbin(cfg, st.pos, st.occ), cfg.box_length)
    st2, m = run_sweeps(cfg, LJ, st, 40)
    e_traced = float(e0) + float(jnp.sum(m.delta_e))
    e_exact, _ = total_energy(LJ, cells.unbin(cfg, st2.pos, st2.occ),
                              cfg.box_length)
    assert abs(e_traced - float(e_exact)) < 1e-2 * max(1.0, abs(float(e_exact)))


def test_sweep_invariants_lj():
    cfg = lj_cfg()
    st = init_state(cfg)
    st2, m = run_sweeps(cfg, LJ, st, 30)
    assert int(st2.occ.sum()) == cfg.n_atoms
    assert not bool(st2.overflow)
    assert int(st2.sweep) == 30
    # acceptance in a sane band
    ratio = float(m.accepted.sum()) / float(m.proposed.sum())
    assert 0.05 < ratio < 0.95
    # state is a valid binning: re-binning the unbinned state is a fixpoint
    back = cells.unbin(cfg, st2.pos, st2.occ)
    _, occ3, ovf = cells.bin_particles(cfg, back)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(jnp.sort(occ3.ravel())),
                                  np.asarray(jnp.sort(st2.occ.ravel())))


def test_hard_disks_never_overlap():
    cfg = hd_cfg()
    st = init_state(cfg)
    st2, m = run_sweeps(cfg, HD, st, 60)
    _, ov = total_energy(HD, cells.unbin(cfg, st2.pos, st2.occ),
                         cfg.box_length)
    assert not bool(ov)
    assert int(st2.occ.sum()) == cfg.n_atoms
    assert float(m.accepted.sum()) > 0


def test_bitwise_reproducible():
    """Counter-based Threefry keying makes runs bitwise reproducible —
    explicitly impossible in the reference (clock()-seeded cuRAND,
    kernel.cu:284; SURVEY.md Q6)."""
    cfg = lj_cfg()
    st = init_state(cfg)
    a, ma = run_sweeps(cfg, LJ, st, 10)
    b, mb = run_sweeps(cfg, LJ, st, 10)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(ma.delta_e), np.asarray(mb.delta_e))
    # and a different seed gives a different trajectory
    c, _ = run_sweeps(cfg, LJ, init_state(cfg, seed=1), 10)
    assert not np.array_equal(np.asarray(a.pos), np.asarray(c.pos))


def test_resume_equals_continuous_run():
    """Checkpoint/resume determinism: 20 sweeps == 10 + 10 (SURVEY.md §5)."""
    cfg = lj_cfg()
    st = init_state(cfg)
    full, _ = run_sweeps(cfg, LJ, st, 20)
    half, _ = run_sweeps(cfg, LJ, st, 10)
    resumed, _ = run_sweeps(cfg, LJ, half, 10)
    np.testing.assert_array_equal(np.asarray(full.pos), np.asarray(resumed.pos))
    np.testing.assert_array_equal(np.asarray(full.occ), np.asarray(resumed.occ))


@pytest.mark.slow
def test_lj_equilibrium_energy_parity_with_serial_chain():
    """<E> of the checkerboard engine vs an independent serial Metropolis
    chain, same (N, L, beta) — the statistical parity gate (BASELINE.json)."""
    cfg = lj_cfg(n_moves=10)
    st = init_state(cfg)
    # engine chain
    st_eq, _ = run_sweeps(cfg, LJ, st, 150)          # burn-in
    energies = []
    cur = st_eq
    for _ in range(30):
        cur, m = run_sweeps(cfg, LJ, cur, 10)
        e, _ = total_energy(LJ, cells.unbin(cfg, cur.pos, cur.occ),
                            cfg.box_length)
        energies.append(float(e))
    eng = np.array(energies)

    # serial oracle chain
    r0 = cells.lattice_positions(cfg)
    pos, _ = serial_metropolis(LJ, r0, jax.random.key(42), 40_000,
                               cfg.beta, cfg.box_length, cfg.step_size)
    ser = []
    for i in range(30):
        pos, _ = serial_metropolis(LJ, pos, jax.random.key(100 + i), 3_000,
                                   cfg.beta, cfg.box_length, cfg.step_size)
        e, _ = total_energy(LJ, pos, cfg.box_length)
        ser.append(float(e))
    ser = np.array(ser)

    se = math.sqrt(eng.var() / len(eng) + ser.var() / len(ser))
    assert abs(eng.mean() - ser.mean()) < max(5 * se, 0.08 * abs(ser.mean())), (
        eng.mean(), ser.mean(), se)


def test_run_sweeps_record_trajectory():
    """On-device trajectory recording (VISUALISATION parity without the
    reference's per-sweep D2H copies, kernel.cu:696-700)."""
    from mcjax.ops.sweep import run_sweeps_record
    cfg = lj_cfg(n_moves=4)
    st = init_state(cfg)
    st2, frames, m = run_sweeps_record(cfg, LJ, st, n_frames=4,
                                       sweeps_per_frame=3)
    assert frames.shape == (4, cfg.n_atoms, 3)
    assert int(st2.sweep) == 12
    assert m.delta_e.shape == (4,)
    # final frame == unbinned final state
    np.testing.assert_allclose(
        np.asarray(frames[-1]),
        np.asarray(cells.unbin(cfg, st2.pos, st2.occ)), atol=1e-6)
    # frames are inside the box and dumpable
    assert np.abs(np.asarray(frames)).max() <= cfg.box_length / 2 + 1e-5
    from mcjax.utils import io as mio
    import io as _io
    buf = _io.StringIO()
    mio.write_lammps_dump(buf, np.asarray(frames), cfg.box_length)
    assert buf.getvalue().count("ITEM: TIMESTEP") == 4


def test_square_well_anchor_and_invariants():
    """Combined hard-core + energetic accept path (SquareWell): the
    dE-accumulated trace must track the exact energy AND the chain must
    never create core overlaps — neither piece exists in the reference
    (smooth LJ only, kernel.cu:335-346)."""
    from mcjax.models.potentials import SquareWell

    sw = SquareWell(epsilon=1.0, diameter=1.0, lam=1.5)
    # cell width 10/4 = 2.5 >= r_cut = 1.5
    cfg = lj_cfg(n_atoms=80, nmax=12, step_size=0.3, beta=0.8)
    st = init_state(cfg)
    e0, ov0 = total_energy(sw, cells.unbin(cfg, st.pos, st.occ),
                           cfg.box_length)
    assert not bool(ov0)
    st2, m = run_sweeps(cfg, sw, st, 30)
    e_traced = float(e0) + float(jnp.sum(m.delta_e))
    e_exact, ov = total_energy(sw, cells.unbin(cfg, st2.pos, st2.occ),
                               cfg.box_length)
    assert not bool(ov), "sweep created a hard-core overlap"
    # square-well dE is integer multiples of eps: trace must match closely
    assert abs(e_traced - float(e_exact)) < 1e-3 * max(1.0, abs(float(e_exact)))
    ratio = float(m.accepted.sum()) / float(m.proposed.sum())
    assert 0.05 < ratio < 0.99
