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
