"""Unit tests: pair potentials vs closed forms (SURVEY.md §4 unit tier)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.geometry import min_image, wrap_into_box
from mcjax.models.potentials import (
    HardSphere, LennardJones, SoftSphere, WCA, pair_interaction,
)


def test_lj_closed_form():
    lj = LennardJones(epsilon=1.0, sigma=1.0, r_cut=2.5)
    # minimum at r = 2^(1/6), value -eps
    r2 = jnp.array([2.0 ** (1.0 / 3.0)])
    np.testing.assert_allclose(lj.pair_energy(r2), [-1.0], rtol=1e-6)
    # zero crossing at r = sigma
    np.testing.assert_allclose(lj.pair_energy(jnp.array([1.0])), [0.0],
                               atol=1e-6)
    # beyond cutoff -> exactly 0
    assert lj.pair_energy(jnp.array([2.6 ** 2])) == 0.0
    # reference value at r=2.5 (unshifted truncation keeps the tail value
    # inside the cutoff; kernel.cu:335-346)
    r = 2.5
    expected = 4 * (r ** -12 - r ** -6)
    np.testing.assert_allclose(lj.pair_energy(jnp.array([r * r])), [expected],
                               rtol=1e-5)


def test_lj_shifted_is_continuous_at_cutoff():
    lj = LennardJones(r_cut=2.5, shift=True)
    eps_in = lj.pair_energy(jnp.array([(2.5 - 1e-4) ** 2]))
    np.testing.assert_allclose(eps_in, [0.0], atol=1e-4)


def test_lj_scaling():
    lj = LennardJones(epsilon=3.0, sigma=2.0, r_cut=10.0)
    # at r = sigma * 2^(1/6): E = -eps
    r2 = jnp.array([(2.0 * 2 ** (1 / 6)) ** 2])
    np.testing.assert_allclose(lj.pair_energy(r2), [-3.0], rtol=1e-5)


def test_hard_sphere_overlap():
    hs = HardSphere(diameter=1.0)
    r2 = jnp.array([0.25, 0.9999**2, 1.0, 1.5])
    np.testing.assert_array_equal(hs.overlap(r2), [True, True, False, False])
    assert jnp.all(hs.pair_energy(r2) == 0.0)
    assert hs.r_cut == 1.0
    assert not hs.has_energy


def test_soft_sphere():
    ss = SoftSphere(epsilon=2.0, sigma=1.0, exponent=12, r_cut=3.0)
    np.testing.assert_allclose(ss.pair_energy(jnp.array([4.0])),
                               [2.0 * 2.0 ** -12], rtol=1e-5)


def test_wca_zero_beyond_min():
    wca = WCA()
    rc = 2 ** (1 / 6)
    assert wca.pair_energy(jnp.array([(rc + 1e-3) ** 2])) == 0.0
    # continuous and positive inside
    v = wca.pair_energy(jnp.array([(rc - 1e-4) ** 2]))
    assert 0 <= float(v[0]) < 1e-2
    np.testing.assert_allclose(wca.pair_energy(jnp.array([1.0])), [1.0],
                               rtol=1e-5)


def test_pair_interaction_masks_garbage():
    lj = LennardJones()
    r2 = jnp.array([0.0, 1e-8, 1.0])  # garbage slots at r2 ~ 0
    valid = jnp.array([False, False, True])
    e, ov = pair_interaction(lj, r2, valid)
    assert jnp.all(jnp.isfinite(e))
    assert e[0] == 0.0 and e[1] == 0.0
    assert not bool(ov.any())


def test_min_image_exact():
    # proper L/2 convention (SURVEY.md Q8: reference used a 2w shortcut)
    L = 10.0
    d = jnp.array([6.0, -6.0, 4.9, -4.9, 10.0])
    np.testing.assert_allclose(min_image(d, L), [-4.0, 4.0, 4.9, -4.9, 0.0],
                               rtol=1e-6)


def test_wrap_into_box():
    L = 10.0
    x = jnp.array([5.0, -5.0, 7.5, -12.5])
    out = wrap_into_box(x, L)
    assert jnp.all((out >= -5.0) & (out < 5.0))
    np.testing.assert_allclose(out, [-5.0, -5.0, -2.5, -2.5], atol=1e-6)


def test_square_well_closed_form():
    from mcjax.models.potentials import SquareWell
    sw = SquareWell(epsilon=2.0, diameter=1.0, lam=1.5)
    assert sw.r_cut == 1.5
    assert sw.has_energy and sw.has_hard_core
    # inside the well: -eps; beyond lam*d: 0; inside core: overlap
    np.testing.assert_allclose(sw.pair_energy(jnp.array([1.2 ** 2])), [-2.0])
    assert float(sw.pair_energy(jnp.array([1.51 ** 2]))[0]) == 0.0
    assert bool(sw.overlap(jnp.array([0.98 ** 2]))[0])
    assert not bool(sw.overlap(jnp.array([1.02 ** 2]))[0])


def test_yukawa_closed_form():
    from mcjax.models.potentials import Yukawa
    yk = Yukawa(epsilon=1.5, sigma=1.0, kappa=2.0, r_cut=3.0)
    # at contact r = sigma: e = eps
    np.testing.assert_allclose(yk.pair_energy(jnp.array([1.0])), [1.5],
                               rtol=1e-6)
    # screening: e(2 sigma) = eps/2 * exp(-kappa)
    np.testing.assert_allclose(yk.pair_energy(jnp.array([4.0])),
                               [1.5 / 2 * np.exp(-2.0)], rtol=1e-5)
    assert float(yk.pair_energy(jnp.array([3.1 ** 2]))[0]) == 0.0
    assert not bool(yk.overlap(jnp.array([0.01]))[0])
    # masked-garbage guard: finite at r2 = 0
    assert np.isfinite(float(yk.pair_energy(jnp.array([0.0]))[0]))


def test_new_potentials_serialize_roundtrip():
    from mcjax.models.potentials import (SquareWell, Yukawa,
                                         potential_from_dict,
                                         potential_to_dict)
    for pot in (SquareWell(epsilon=0.7, diameter=1.1, lam=1.4),
                Yukawa(epsilon=2.0, sigma=0.9, kappa=3.0, r_cut=2.7)):
        assert potential_from_dict(potential_to_dict(pot)) == pot


def test_morse_closed_form():
    from mcjax.models.potentials import Morse
    mo = Morse(epsilon=2.0, r0=1.1, a=4.0, r_cut=2.5, shift=False)
    # minimum at r0 with depth -eps
    np.testing.assert_allclose(mo.pair_energy(jnp.array([1.1 ** 2])),
                               [-2.0], rtol=1e-6)
    # dissociation: e -> 0 from below as r grows (unshifted)
    e_far = float(mo.pair_energy(jnp.array([2.4 ** 2]))[0])
    assert -0.1 < e_far < 0.0
    assert float(mo.pair_energy(jnp.array([2.6 ** 2]))[0]) == 0.0
    # shifted variant is continuous at the cutoff
    mos = Morse(epsilon=2.0, r0=1.1, a=4.0, r_cut=2.5, shift=True)
    np.testing.assert_allclose(
        mos.pair_energy(jnp.array([(2.5 - 1e-5) ** 2])), [0.0], atol=1e-4)
    # repulsive wall: strongly positive inside r0, finite at r2=0
    assert float(mos.pair_energy(jnp.array([0.6 ** 2]))[0]) > 2.0
    assert np.isfinite(float(mos.pair_energy(jnp.array([0.0]))[0]))


def test_polynomial_fit_recovers_lj_exactly():
    """LJ is degree 6 in u = 1/r2, so the fit must be numerically exact
    (the 'table' pair style at zero approximation cost)."""
    from mcjax.models.potentials import (PolynomialPotential,
                                         fit_pair_polynomial,
                                         potential_from_dict,
                                         potential_to_dict)
    lj = LennardJones(epsilon=0.8, sigma=1.05, r_cut=2.5, shift=True)
    r = np.linspace(0.85, 2.5, 400)
    e = np.asarray(lj.pair_energy(jnp.asarray(r * r)))
    pp = fit_pair_polynomial(r, e, degree=6, r_cut=2.5)
    # fresh evaluation points, incl. beyond-cutoff zeros
    rt = np.array([0.9, 1.0, 1.17, 1.5, 2.0, 2.49, 2.6])
    np.testing.assert_allclose(np.asarray(pp.pair_energy(jnp.asarray(rt**2))),
                               np.asarray(lj.pair_energy(jnp.asarray(rt**2))),
                               atol=5e-5)
    # continuous at the cutoff by construction (pinned basis)
    assert abs(float(pp.pair_energy(
        jnp.array([(2.5 - 1e-5) ** 2]))[0])) < 1e-4
    # checkpoint round-trip preserves value and hashability
    pp2 = potential_from_dict(potential_to_dict(pp))
    assert isinstance(pp2, PolynomialPotential) and hash(pp2) == hash(pp)


def test_polynomial_fit_hard_core_and_residual_gate():
    import pytest as _pytest

    from mcjax.models.potentials import fit_pair_polynomial

    # a soft-core table with a hard core below 0.9: samples inside the
    # core are ignored, overlap() enforces the core
    r = np.linspace(0.5, 2.0, 300)
    e = 1.7 / r**4 - 1.7 / 2.0**4
    pp = fit_pair_polynomial(r, e, degree=4, r_cut=2.0, core_diameter=0.9)
    assert pp.has_hard_core
    assert bool(pp.overlap(jnp.array([0.8 ** 2]))[0])
    assert not bool(pp.overlap(jnp.array([0.95 ** 2]))[0])
    np.testing.assert_allclose(
        float(pp.pair_energy(jnp.array([1.3 ** 2]))[0]),
        1.7 / 1.3**4 - 1.7 / 2.0**4, atol=1e-5)
    # an un-fittable stiff table (exp wall sampled into r -> 0.2) must
    # raise, not silently return a bad potential
    rb = np.linspace(0.2, 2.0, 300)
    eb = np.exp(8.0 * (1.0 - rb))
    with _pytest.raises(ValueError):
        fit_pair_polynomial(rb, eb, degree=4, r_cut=2.0)


def test_polynomial_potential_drives_both_engines():
    """The fitted LJ twin must reproduce the analytic LJ chain: identical
    Threefry streams + numerically identical energies => identical
    trajectories (acceptance decisions bitwise-compatible within f32)."""
    import math

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import fit_pair_polynomial
    from mcjax.ops.sweep import run_sweeps, total_energy_cells

    lj = LennardJones(epsilon=1.0, sigma=1.0, r_cut=2.5, shift=True)
    r = np.linspace(0.8, 2.5, 600)
    pp = fit_pair_polynomial(
        r, np.asarray(lj.pair_energy(jnp.asarray(r * r))), degree=6,
        r_cut=2.5)

    n, rho = 100, 0.4
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=3 * (n // (cps * cps)) + 10, n_moves=4,
                    proposal="gaussian", step_size=0.2, beta=1.0, seed=1)
    st0 = init_state(cfg)
    e0p = float(total_energy_cells(cfg, pp, st0.pos, st0.occ))
    e0l = float(total_energy_cells(cfg, lj, st0.pos, st0.occ))
    assert abs(e0p - e0l) < 1e-3 * max(1.0, abs(e0l))

    st_l, m_l = run_sweeps(cfg, lj, st0, 30)
    st_p, m_p = run_sweeps(cfg, pp, st0, 30)
    # same random stream + numerically equal energies: same acceptances
    acc_l = int(jnp.sum(m_l.accepted))
    acc_p = int(jnp.sum(m_p.accepted))
    assert abs(acc_l - acc_p) <= 0.01 * acc_l + 2, (acc_l, acc_p)
    # dE-anchor holds for the polynomial model (trace == exact energy)
    e_end = float(total_energy_cells(cfg, pp, st_p.pos, st_p.occ))
    e_trace = e0p + float(jnp.sum(m_p.delta_e))
    assert abs(e_end - e_trace) < 5e-2 * max(1.0, abs(e_end))
