"""Native C++ oracle: agreement with the JAX implementations (SURVEY.md §4)."""

import math

import jax
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import LennardJones
from mcjax.models.reference import total_energy
from mcjax.ops import cells
from mcjax.ops.sweep import run_sweeps

try:
    from mcjax import native
    native.get_lib()
    HAVE_NATIVE = True
except Exception:  # toolchain missing
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="g++ toolchain unavailable")


def test_native_total_energy_matches_jax():
    r = np.random.RandomState(0).uniform(-5, 5, (100, 3)).astype(np.float64)
    e_cpp, ov = native.total_energy(r, 10.0, "lj", 2.5)
    e_jax, _ = total_energy(LennardJones(r_cut=2.5), r.astype(np.float32), 10.0)
    assert not ov
    np.testing.assert_allclose(e_cpp, float(e_jax), rtol=2e-4)


def test_native_hard_overlap_detection():
    r = np.array([[0.0, 0.0], [0.5, 0.0], [3.0, 3.0]])
    _, ov = native.total_energy(r, 10.0, "hard", 1.0)
    assert ov
    r2 = np.array([[0.0, 0.0], [1.5, 0.0], [3.0, 3.0]])
    _, ov2 = native.total_energy(r2, 10.0, "hard", 1.0)
    assert not ov2


def test_native_serial_chain_sane():
    r = np.random.RandomState(1).uniform(-5, 5, (64, 3))
    out, acc = native.serial_run(r, 10.0, beta=0.3, step=0.5, n_steps=5000,
                                 seed=42, model="lj")
    assert 0 < acc < 5000
    assert np.all(np.abs(out) <= 5.0)
    # deterministic
    out2, acc2 = native.serial_run(r, 10.0, beta=0.3, step=0.5, n_steps=5000,
                                   seed=42, model="lj")
    np.testing.assert_array_equal(out, out2)
    assert acc == acc2


@pytest.mark.slow
def test_engine_equilibrium_matches_native_oracle():
    """<E> parity: checkerboard TPU engine vs the C++ serial chain."""
    cfg = SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                    nmax=10, n_moves=10, beta=0.3, step_size=0.5, seed=0)
    lj = LennardJones(r_cut=2.5)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, lj, st, 150)
    eng = []
    for _ in range(20):
        st, _ = run_sweeps(cfg, lj, st, 10)
        e, _ = total_energy(lj, cells.unbin(cfg, st.pos, st.occ),
                            cfg.box_length)
        eng.append(float(e))
    eng = np.array(eng)

    r = np.asarray(cells.lattice_positions(cfg), np.float64)
    r, _ = native.serial_run(r, 10.0, 0.3, 0.5, 50_000, 7, "lj")
    ser = []
    for i in range(20):
        r, _ = native.serial_run(r, 10.0, 0.3, 0.5, 4_000, 100 + i, "lj")
        e, _ = native.total_energy(r, 10.0, "lj")
        ser.append(e)
    ser = np.array(ser)
    se = math.sqrt(eng.var() / len(eng) + ser.var() / len(ser))
    assert abs(eng.mean() - ser.mean()) < max(5 * se, 0.1 * abs(ser.mean())), (
        eng.mean(), ser.mean(), se)


def test_native_gr_histogram_matches_numpy():
    r = np.random.RandomState(3).uniform(-5, 5, (50, 2))
    counts = native.gr_histogram(r, 10.0, 4.0, 16)
    # brute force
    brute = np.zeros(16, np.int64)
    for i in range(50):
        for j in range(i + 1, 50):
            d = r[i] - r[j]
            d -= 10.0 * np.round(d / 10.0)
            rr = np.sqrt((d ** 2).sum())
            if rr < 4.0:
                brute[int(rr / 0.25)] += 1
    np.testing.assert_array_equal(counts, brute)
