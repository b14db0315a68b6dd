"""External one-body fields in the Pallas kernels (interpret mode on CPU).

The field's dE + forbidden test evaluate IN-KERNEL at physical coordinates
(frame origin rides in as SMEM scalars, mcjax/ops/pallas_sweep.py). Both
engines share Threefry streams and use the same f32 op order for the wrap
and the field term, so trajectories must be BITWISE equal to the XLA field
engine — including the new energetic-field-over-hard-core path where the
Metropolis exp test runs with zero pair energy. The reference has no
one-body term anywhere (kernel.cu is pure bulk); these pin the extension's
kernel leg against its own XLA twin.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.fields import HarmonicTrap, SlitWalls
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops import extfield
from mcjax.ops.pallas_sweep import pallas_color_substep
from mcjax.ops.sweep import color_substep, total_interaction_cells


def _slit_setup(seed=0, n=48, L=12.0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-2.9, 2.9, n),
                    rng.uniform(-L / 2, L / 2, n)], axis=1)
    keep = []
    for i in range(n):
        d = pts[keep] - pts[i] if keep else np.empty((0, 2))
        d -= L * np.round(d / L)
        if keep and (np.sum(d * d, 1) < 1.0).any():
            continue
        keep.append(i)
    pts = pts[keep]
    cfg = SimConfig(dim=2, n_atoms=len(pts), box_length=L, cells_per_side=4,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.3,
                    beta=1.0)
    field = SlitWalls(lo=-3.5, hi=3.5, axis=0, diameter=1.0)
    st = init_state(cfg, positions=jnp.asarray(pts, jnp.float32))
    return cfg, field, st


def test_pallas_field_walls_bitwise_substep():
    """Hard disks + forbidden-only walls, nonzero frame origin: every color
    sub-step bitwise equal between the engines."""
    cfg, field, st = _slit_setup()
    pot = HardSphere(1.0)
    org = jnp.asarray([0.7, -0.3], jnp.float32)
    key = jax.random.key(11)
    for color in range(cfg.n_colors):
        a = color_substep(cfg, pot, color, st.pos, st.occ, key,
                          field=field, origin=org)
        b = pallas_color_substep(cfg, pot, color, st.pos, st.occ, key,
                                 field=field, origin=org, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert int(a[2]) == int(b[2]) and int(a[3]) == int(b[3])


def test_pallas_field_energetic_over_hardcore_bitwise():
    """Trap + hard disks: pair path contributes no energy, the field does —
    the kernel's pair_energetic/energetic split must still consume the
    acceptance uniforms (same stream as XLA) and fold only the field dE."""
    cfg, _, st = _slit_setup(seed=3)
    pot = HardSphere(1.0)
    field = HarmonicTrap(stiffness=0.3, dim=2)
    org = jnp.asarray([0.4, 0.9], jnp.float32)
    key = jax.random.key(5)
    for color in range(cfg.n_colors):
        a = color_substep(cfg, pot, color, st.pos, st.occ, key,
                          field=field, origin=org)
        b = pallas_color_substep(cfg, pot, color, st.pos, st.occ, key,
                                 field=field, origin=org, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_allclose(float(a[1]), float(b[1]),
                                   rtol=1e-5, atol=1e-6)
        assert int(a[2]) == int(b[2]) and int(a[3]) == int(b[3])


def test_pallas_field_run_bitwise_vs_xla():
    """Whole confined runs (sub-sweeps + grid shifts + frame drift) stay
    bitwise locked between the engines, classic and fused Pallas alike."""
    cfg, field, st = _slit_setup(seed=1)
    pot = HardSphere(1.0)
    org0 = jnp.zeros(2, jnp.float32)
    a, org_a, ma = extfield.run_field_sweeps(cfg, pot, field, st, org0, 8)
    b, org_b, mb = extfield.run_field_sweeps_pallas(
        cfg, pot, field, st, org0, 8, interpret=True)
    c, org_c, mc = extfield.run_field_sweeps_pallas(
        cfg, pot, field, st, org0, 8, interpret=True, fused=True)
    for x, ox, mx in ((b, org_b, mb), (c, org_c, mc)):
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(x.pos))
        np.testing.assert_array_equal(np.asarray(a.occ), np.asarray(x.occ))
        np.testing.assert_array_equal(np.asarray(org_a), np.asarray(ox))
        np.testing.assert_array_equal(np.asarray(ma.accepted),
                                      np.asarray(mx.accepted))
    assert not bool(b.overflow)
    assert int(extfield.field_violations(cfg, field, b.pos, b.occ,
                                         org_b)) == 0


def test_pallas_field_mixture_bitwise():
    """Species-resolved field over a hard mixture: per-species gravity +
    per-species wall margins, every color sub-step bitwise equal between
    the mixture XLA engine and the Pallas kernel's species plane."""
    from mcjax.models.fields import CompositeField, LinearField, SpeciesField
    from mcjax.models.mixtures import HardSphereMixture
    from mcjax.ops.mixture import color_substep_mixture, init_mixture_state

    cfg = SimConfig(dim=2, n_atoms=40, box_length=12.0, cells_per_side=4,
                    nmax=16, n_moves=3, proposal="uniform", step_size=0.3,
                    beta=1.0)
    pot = HardSphereMixture(diameter=((1.0, 0.9), (0.9, 0.8)))
    field = CompositeField((
        SpeciesField(LinearField(g=1.0, axis=1), (0.3, 1.1)),
        SlitWalls(lo=-4.0, hi=4.0, axis=1, diameters=(1.0, 0.8)),
    ))
    rng = np.random.default_rng(9)
    spec = (np.arange(40) % 2).astype(np.int32)
    # low-density start with guaranteed hard-core + wall clearance
    gx, gy = np.meshgrid(np.arange(8), np.arange(5), indexing="ij")
    r = np.stack([gx.ravel() * 1.5 - 6.0 + rng.uniform(-0.1, 0.1, 40),
                  gy.ravel() * 1.4 - 2.8 + rng.uniform(-0.1, 0.1, 40)], 1)
    st = init_mixture_state(cfg, jnp.asarray(r, jnp.float32),
                            jnp.asarray(spec))
    org = jnp.asarray([0.2, -0.6], jnp.float32)
    key = jax.random.key(13)
    for color in range(cfg.n_colors):
        a = color_substep_mixture(cfg, pot, color, st.pos, st.occ, key,
                                  field=field, origin=org)
        b = pallas_color_substep(cfg, pot, color, st.pos, st.occ, key,
                                 field=field, origin=org, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        # per-move dE values are identical but the dE METRIC sums cells in
        # a different order (split accumulators) — ulp-level only
        np.testing.assert_allclose(float(a[1]), float(b[1]),
                                   rtol=1e-5, atol=1e-6)
        assert int(a[2]) == int(b[2]) and int(a[3]) == int(b[3])


def test_pallas_field_trap_lj_anchor():
    """Energetic field + energetic pair model through the Pallas run loop:
    the dE trace telescopes to (pair + field) total differences — the
    frame-drift bookkeeping gate, now on the kernel engine."""
    cfg = SimConfig(dim=2, n_atoms=64, box_length=12.0, cells_per_side=4,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.4,
                    beta=1.5)
    pot = LennardJones(epsilon=0.3, sigma=1.0, r_cut=2.5)
    field = HarmonicTrap(stiffness=0.4, dim=2)
    st = init_state(cfg)
    org0 = jnp.zeros(2, jnp.float32)
    e0 = (float(total_interaction_cells(cfg, pot, st.pos, st.occ)[0])
          + float(extfield.total_field_energy_cells(cfg, field, st.pos,
                                                    st.occ, org0)))
    st, org, m = extfield.run_field_sweeps_pallas(cfg, pot, field, st, org0,
                                                  40, interpret=True)
    assert not bool(st.overflow)
    e1 = (float(total_interaction_cells(cfg, pot, st.pos, st.occ)[0])
          + float(extfield.total_field_energy_cells(cfg, field, st.pos,
                                                    st.occ, org)))
    traced = float(jnp.sum(m.delta_e))
    assert abs((e1 - e0) - traced) < 1e-2 * max(abs(e1 - e0), 1.0), \
        (e0, e1, traced)
    assert float(jnp.sum(m.accepted)) > 0
    assert float(jnp.sum(jnp.abs(org))) > 0
