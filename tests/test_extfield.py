"""External-field runs: frame-drift bookkeeping, closed-form profiles,
wall invariants. The reference is pure-bulk (no one-body term anywhere in
kernel.cu); these pin the confined/driven extension."""

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.fields import (CompositeField, HarmonicTrap, LinearField,
                                 SlitWalls, SpeciesField)
from mcjax.models.mixtures import LJMixture
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops import extfield
from mcjax.ops.mixture import (init_mixture_state,
                               total_interaction_cells_mixture)
from mcjax.ops.sweep import total_interaction_cells


def test_trap_energy_anchor_under_grid_shifts():
    """THE bookkeeping gate: with grid shifts every sweep, the accumulated
    dE trace telescopes to (pair + field) total differences only if the
    carried frame origin matches the sweep's own shift draws exactly."""
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
    st, org, m = extfield.run_field_sweeps(cfg, pot, field, st, org0, 60)
    assert not bool(st.overflow)
    e1 = (float(total_interaction_cells(cfg, pot, st.pos, st.occ)[0])
          + float(extfield.total_field_energy_cells(cfg, field, st.pos,
                                                    st.occ, org)))
    traced = float(jnp.sum(m.delta_e))
    assert abs((e1 - e0) - traced) < 1e-2 * max(abs(e1 - e0), 1.0), \
        (e0, e1, traced)
    assert float(jnp.sum(m.accepted)) > 0
    # the frame really did drift (shifts happen every sweep by default)
    assert float(jnp.sum(jnp.abs(org))) > 0


def test_trap_ideal_gas_gaussian_profile():
    """Ideal gas in a harmonic trap: equipartition gives <x_a^2> = 1/(beta
    k_a) exactly; anisotropic stiffness resolves per-axis."""
    cfg = SimConfig(dim=2, n_atoms=64, box_length=12.0, cells_per_side=4,
                    nmax=64, n_moves=4, proposal="uniform", step_size=0.6,
                    beta=2.0)
    pot = LennardJones(epsilon=0.0)
    # nmax = n_atoms: the trap (sigma_y = 0.5 vs cell width 3) can pile
    # ~86% of all ideal-gas particles into ONE cell when the shifted grid
    # centers on it — any smaller nmax trips the sticky overflow flag.
    field = HarmonicTrap(stiffness=(0.5, 2.0), dim=2)   # var = (1.0, 0.25)
    st = init_state(cfg)
    org = jnp.zeros(2, jnp.float32)
    st, org, _ = extfield.run_field_sweeps(cfg, pot, field, st, org, 400)
    st, org, frames, m = extfield.run_field_sweeps_record(
        cfg, pot, field, st, org, 160, 10)
    assert not bool(st.overflow)
    xy = np.asarray(frames).reshape(-1, 2)
    var = xy.var(axis=0)
    np.testing.assert_allclose(var, [1.0, 0.25], rtol=0.10)
    assert abs(xy.mean(0)).max() < 0.12


def test_slit_walls_hard_disks_invariants():
    """Hard disks in a slit pore: zero wall violations through shifted
    sweeps, hard-core overlap freedom, and real diffusion inside the gap."""
    rng = np.random.default_rng(0)
    n, L = 48, 12.0
    pts = np.stack([rng.uniform(-2.9, 2.9, n),
                    rng.uniform(-L / 2, L / 2, n)], axis=1)
    # thin out hard-core overlaps in the start configuration
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
    pot = HardSphere(1.0)
    field = SlitWalls(lo=-3.5, hi=3.5, axis=0, diameter=1.0)
    st = init_state(cfg, positions=jnp.asarray(pts, jnp.float32))
    org = jnp.zeros(2, jnp.float32)
    assert int(extfield.field_violations(cfg, field, st.pos, st.occ,
                                         org)) == 0
    r0 = np.asarray(extfield.physical_positions(cfg, st.pos, st.occ, org))
    st, org, m = extfield.run_field_sweeps(cfg, pot, field, st, org, 200)
    assert not bool(st.overflow)
    assert int(extfield.field_violations(cfg, field, st.pos, st.occ,
                                         org)) == 0
    r1 = np.asarray(extfield.physical_positions(cfg, st.pos, st.occ, org))
    assert (np.abs(r1[:, 0]) <= 3.0 + 1e-5).all()
    # overlap freedom at physical coordinates
    d = r1[:, None] - r1[None]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, np.inf)
    assert r2.min() >= 1.0 - 1e-5
    # particles actually moved (sets are not comparable row-to-row; compare
    # occupancy histograms of the confined axis instead)
    assert float(jnp.mean(m.accepted / jnp.maximum(m.proposed, 1))) > 0.2
    assert np.abs(np.sort(r1[:, 0]) - np.sort(r0[:, 0])).max() > 0.3


def test_sedimentation_barometric_profile():
    """Gravity + walls (CompositeField): the ideal-gas height distribution
    is the truncated barometric exponential; <z> matches quadrature."""
    cfg = SimConfig(dim=2, n_atoms=64, box_length=12.0, cells_per_side=4,
                    nmax=48, n_moves=4, proposal="uniform", step_size=0.6,
                    beta=1.0)
    pot = LennardJones(epsilon=0.0)
    g = 0.6
    lo, hi = -4.5, 4.5
    field = CompositeField((LinearField(g=g, axis=1),
                            SlitWalls(lo=lo, hi=hi, axis=1)))
    assert field.has_energy
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(-6, 6, 64), rng.uniform(lo, hi, 64)], 1)
    st = init_state(cfg, positions=jnp.asarray(pts, jnp.float32))
    org = jnp.zeros(2, jnp.float32)
    st, org, _ = extfield.run_field_sweeps(cfg, pot, field, st, org, 500)
    st, org, frames, _ = extfield.run_field_sweeps_record(
        cfg, pot, field, st, org, 200, 10)
    assert not bool(st.overflow)
    z = np.asarray(frames)[..., 1].ravel()
    assert (z >= lo - 1e-5).all() and (z <= hi + 1e-5).all()
    zz = np.linspace(lo, hi, 4001)
    w = np.exp(-cfg.beta * g * zz)
    z_exact = np.trapezoid(zz * w, zz) / np.trapezoid(w, zz)
    assert abs(z.mean() - z_exact) < 0.15, (z.mean(), z_exact)


# ---- mixtures x fields --------------------------------------------------------

def _mix_lj():
    return LJMixture(epsilon=((0.3, 0.2), (0.2, 0.25)),
                     sigma=((1.0, 0.9), (0.9, 0.8)),
                     r_cut_table=((2.5, 2.25), (2.25, 2.0)))


def test_mixture_trap_anchor_under_grid_shifts():
    """Mixture bookkeeping gate: species plane + frame origin both survive
    shifted sweeps — the dE trace telescopes to (mixture pair + field)
    total differences."""
    cfg = SimConfig(dim=2, n_atoms=64, box_length=12.0, cells_per_side=4,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.4,
                    beta=1.5)
    pot = _mix_lj()
    field = HarmonicTrap(stiffness=0.4, dim=2)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.uniform(-6, 6, (64, 2)), jnp.float32)
    spec = jnp.asarray(rng.random(64) < 0.4, jnp.int32)
    st = init_mixture_state(cfg, r, spec)
    org0 = jnp.zeros(2, jnp.float32)
    e0 = (float(total_interaction_cells_mixture(cfg, pot, st.pos, st.occ)[0])
          + float(extfield.total_field_energy_cells(cfg, field, st.pos,
                                                    st.occ, org0)))
    st, org, m = extfield.run_field_sweeps(cfg, pot, field, st, org0, 60)
    assert not bool(st.overflow)
    e1 = (float(total_interaction_cells_mixture(cfg, pot, st.pos, st.occ)[0])
          + float(extfield.total_field_energy_cells(cfg, field, st.pos,
                                                    st.occ, org)))
    traced = float(jnp.sum(m.delta_e))
    assert abs((e1 - e0) - traced) < 1e-2 * max(abs(e1 - e0), 1.0), \
        (e0, e1, traced)
    assert float(jnp.sum(m.accepted)) > 0
    assert float(jnp.sum(jnp.abs(org))) > 0
    # species are conserved through shifted mixture-field sweeps
    n_b = int(jnp.sum(extfield.physical_positions(
        cfg, st.pos, st.occ, org)[:, 2] > 0.5))
    assert n_b == int(jnp.sum(spec))


def test_species_field_sedimentation_fractionation():
    """Two ideal-gas species under per-species gravity (SpeciesField) in a
    slit: each species' height distribution is its OWN truncated barometric
    profile — the light species floats, the heavy one sinks."""
    cfg = SimConfig(dim=2, n_atoms=96, box_length=12.0, cells_per_side=4,
                    nmax=48, n_moves=4, proposal="uniform", step_size=0.6,
                    beta=1.0)
    z = ((0.0, 0.0), (0.0, 0.0))
    pot = LJMixture(epsilon=z, sigma=((1.0, 1.0), (1.0, 1.0)),
                    r_cut_table=((1.5, 1.5), (1.5, 1.5)))
    g = (0.25, 1.2)
    lo, hi = -4.5, 4.5
    field = CompositeField((SpeciesField(LinearField(g=1.0, axis=1), g),
                            SlitWalls(lo=lo, hi=hi, axis=1)))
    rng = np.random.default_rng(5)
    r = np.stack([rng.uniform(-6, 6, 96), rng.uniform(lo, hi, 96)], 1)
    spec = (np.arange(96) % 2).astype(np.int32)    # 48 light, 48 heavy
    st = init_mixture_state(cfg, jnp.asarray(r, jnp.float32),
                            jnp.asarray(spec))
    org = jnp.zeros(2, jnp.float32)
    st, org, _ = extfield.run_field_sweeps(cfg, pot, field, st, org, 500)
    st, org, frames, _ = extfield.run_field_sweeps_record(
        cfg, pot, field, st, org, 200, 10)
    assert not bool(st.overflow)
    fr = np.asarray(frames).reshape(-1, 3)          # [x, z, species]
    zz = np.linspace(lo, hi, 4001)
    for k in (0, 1):
        zs = fr[fr[:, 2] == float(k), 1]
        assert (zs >= lo - 1e-5).all() and (zs <= hi + 1e-5).all()
        w = np.exp(-cfg.beta * g[k] * zz)
        z_exact = np.trapezoid(zz * w, zz) / np.trapezoid(w, zz)
        assert abs(zs.mean() - z_exact) < 0.22, (k, zs.mean(), z_exact)
    # fractionation really happened
    assert fr[fr[:, 2] == 0.0, 1].mean() > fr[fr[:, 2] == 1.0, 1].mean() + 1.0


def test_slit_walls_per_species_diameters():
    """SlitWalls.diameters: each species keeps its OWN contact margin off
    the walls through shifted mixture sweeps."""
    cfg = SimConfig(dim=2, n_atoms=64, box_length=12.0, cells_per_side=4,
                    nmax=48, n_moves=4, proposal="uniform", step_size=0.5,
                    beta=1.0)
    z = ((0.0, 0.0), (0.0, 0.0))
    pot = LJMixture(epsilon=z, sigma=((1.0, 1.0), (1.0, 1.0)),
                    r_cut_table=((1.5, 1.5), (1.5, 1.5)))
    lo, hi = -4.0, 4.0
    field = SlitWalls(lo=lo, hi=hi, axis=0, diameters=(0.0, 2.0))
    rng = np.random.default_rng(7)
    spec = (np.arange(64) % 2).astype(np.int32)
    margin = np.where(spec == 1, 1.0, 0.0)
    x = rng.uniform(lo + margin + 1e-3, hi - margin - 1e-3)
    r = np.stack([x, rng.uniform(-6, 6, 64)], 1)
    st = init_mixture_state(cfg, jnp.asarray(r, jnp.float32),
                            jnp.asarray(spec))
    org = jnp.zeros(2, jnp.float32)
    assert int(extfield.field_violations(cfg, field, st.pos, st.occ,
                                         org)) == 0
    st, org, m = extfield.run_field_sweeps(cfg, pot, field, st, org, 150)
    assert not bool(st.overflow)
    assert int(extfield.field_violations(cfg, field, st.pos, st.occ,
                                         org)) == 0
    fr = np.asarray(extfield.physical_positions(cfg, st.pos, st.occ, org))
    heavy = fr[fr[:, 2] == 1.0, 0]
    light = fr[fr[:, 2] == 0.0, 0]
    assert (np.abs(heavy) <= 3.0 + 1e-5).all()
    # the light species really does use the wider band (else the per-species
    # margin isn't being resolved, just the max applied to everyone)
    assert np.abs(light).max() > 3.2
    assert float(jnp.mean(m.accepted / jnp.maximum(m.proposed, 1))) > 0.3
