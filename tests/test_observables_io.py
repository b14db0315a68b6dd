"""Observables + IO tests: g(r) ideal-gas normalization, virial pressure vs
closed form, dump round-trip, checkpoint/resume bitwise determinism."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops import cells
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import io, observables


def test_gr_ideal_gas_is_unity():
    # uniform random points -> g(r) ~ 1 away from r=0
    n, L = 2000, 20.0
    r = jax.random.uniform(jax.random.key(0), (n, 2), minval=-L / 2,
                           maxval=L / 2)
    centers, g = observables.radial_distribution(r, L, 40, 5.0, 2)
    g = np.asarray(g)[10:]  # skip small-r noise bins
    assert abs(g.mean() - 1.0) < 0.05
    n3 = 3000
    r3 = jax.random.uniform(jax.random.key(1), (n3, 3), minval=-L / 2,
                            maxval=L / 2)
    _, g3 = observables.radial_distribution(r3, L, 40, 5.0, 3)
    assert abs(np.asarray(g3)[10:].mean() - 1.0) < 0.05


def test_virial_pressure_two_particles_closed_form():
    # two LJ particles at fixed separation: W = 24 eps (2 (s/r)^12 - (s/r)^6)
    lj = LennardJones()
    L, rsep, beta, dim = 50.0, 1.2, 1.0, 3
    pos = jnp.array([[0.0, 0.0, 0.0], [rsep, 0.0, 0.0]])
    p = observables.virial_pressure(lj, pos, L, beta, dim)
    w = 24.0 * (2.0 * rsep**-12 - rsep**-6)
    expected = 2 / L**3 / beta + w / (dim * L**3)
    np.testing.assert_allclose(float(p), expected, rtol=1e-4)


def test_radial_distribution_cells_parity():
    # cell-list g(r) must match the O(N^2) pass bin-for-bin out to one cell
    # width (the production path for N >= 1M where O(N^2) is impossible)
    n, phi = 256, 0.4
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.3) - int(L // 1.3) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.2,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, hs, st, 30)
    n_bins = 24
    r_max = cfg.cell_width
    c1, g1 = observables.radial_distribution(
        cells.unbin(cfg, st.pos, st.occ), L, n_bins, r_max, 2)
    c2, g2 = observables.radial_distribution_cells(cfg, st.pos, st.occ,
                                                   n_bins, r_max)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
    with pytest.raises(ValueError, match="one-ring"):
        observables.radial_distribution_cells(cfg, st.pos, st.occ, n_bins,
                                              cfg.cell_width * 1.5)


def test_virial_pressure_cells_parity():
    cfg = SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                    nmax=10, n_moves=4)
    lj = LennardJones()
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, lj, st, 10)
    p_ref = observables.virial_pressure(lj, cells.unbin(cfg, st.pos, st.occ),
                                        cfg.box_length, cfg.beta, 3)
    p_cells = observables.virial_pressure_cells(cfg, lj, st.pos, st.occ,
                                                cfg.beta)
    np.testing.assert_allclose(float(p_cells), float(p_ref), rtol=2e-4)


def test_cell_observable_coverage_guards():
    # psi_6 / contact-shell wider than one cell width must hard-error, not
    # silently bias low (ADVICE r1)
    n, phi = 128, 0.4
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.0) - int(L // 1.0) % 2  # cell_width ~ 1.0
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0)
    st = init_state(cfg)
    with pytest.raises(ValueError, match="one-ring"):
        observables.psi6_cells(cfg, st.pos, st.occ, r_cut=1.4)
    with pytest.raises(ValueError, match="one-ring"):
        observables.contact_shell_gr_cells(cfg, st.pos, st.occ, 1.0, 8, 0.3)


def test_widom_insertion_brute_force_parity_and_dilute_limit():
    # (a) the cell-list Widom factor must equal a direct O(N x T) pass
    cfg = SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                    nmax=10, n_moves=4)
    lj = LennardJones()
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, lj, st, 5)
    key = jax.random.key(11)
    b_cells = float(observables.widom_insertion(cfg, lj, st.pos, st.occ,
                                                key, 256))
    L = cfg.box_length
    pts = jax.random.uniform(key, (256, 3), minval=-L / 2, maxval=L / 2)
    r = cells.unbin(cfg, st.pos, st.occ)
    from mcjax.core.geometry import min_image as mi
    d = mi(pts[:, None, :] - r[None, :, :], L)
    du = jnp.sum(lj.pair_energy(jnp.sum(d * d, -1)), axis=1)
    b_ref = float(jnp.mean(jnp.exp(-cfg.beta * du)))
    np.testing.assert_allclose(b_cells, b_ref, rtol=1e-5)

    # (b) dilute hard disks: insertion probability ~ exp(-4 phi)
    n, phi = 200, 0.05
    Lh = math.sqrt(n * math.pi / 4 / phi)
    cps = int(Lh // 1.25) - int(Lh // 1.25) % 2
    cfgh = SimConfig(dim=2, n_atoms=n, box_length=Lh, cells_per_side=cps,
                     nmax=8, n_moves=4, proposal="uniform", step_size=0.3,
                     beta=1.0)
    hs = HardSphere(1.0)
    sth = init_state(cfgh)
    sth, _ = run_sweeps(cfgh, hs, sth, 100)
    p_ins = float(observables.widom_insertion(cfgh, hs, sth.pos, sth.occ,
                                              jax.random.key(5), 4096))
    assert abs(p_ins - math.exp(-4 * phi)) < 0.03, p_ins


def test_energy_trace_shape():
    t = observables.energy_trace(jnp.float32(-3.0), jnp.ones(5))
    np.testing.assert_allclose(np.asarray(t), [-2, -1, 0, 1, 2])


def test_hard_disk_eos_dilute_limit():
    # at low density Z -> 1 (+ 2 phi g ~ small); just check it's near Z_H
    n, phi = 400, 0.2
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.25) - int(L // 1.25) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=10, n_moves=6, proposal="uniform", step_size=0.3,
                    beta=1.0)
    hs = HardSphere(1.0)
    cfg.validate_against(hs.r_cut)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, hs, st, 300)
    snaps = []
    for _ in range(6):
        st, _ = run_sweeps(cfg, hs, st, 25)
        snaps.append(cells.unbin(cfg, st.pos, st.occ))
    z = observables.hard_disk_eos(snaps, L, 1.0, 2)
    z_ref = observables.henderson_z_disks(phi)
    assert abs(z - z_ref) / z_ref < 0.10, (z, z_ref)


def test_dump_roundtrip(tmp_path):
    frames = np.random.RandomState(0).uniform(-5, 5, (3, 7, 3)).astype(np.float32)
    p = str(tmp_path / "dump.txt")
    io.write_lammps_dump(p, frames, 10.0)
    back = io.read_lammps_dump(p)
    np.testing.assert_allclose(back, frames, atol=1e-5)
    txt = open(p).read()
    assert "ITEM: TIMESTEP" in txt and "ITEM: BOX BOUNDS" in txt
    assert txt.count("ITEM: TIMESTEP") == 3


def test_checkpoint_resume_bitwise(tmp_path):
    cfg = SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                    nmax=10, n_moves=8)
    lj = LennardJones()
    st = init_state(cfg)
    mid, _ = run_sweeps(cfg, lj, st, 7)
    p = str(tmp_path / "ck.npz")
    io.save_checkpoint(p, cfg, mid, lj)
    cfg2, loaded, pot2 = io.load_checkpoint(p)
    assert cfg2 == cfg
    assert pot2 == lj  # checkpoint carries the physics, not just geometry
    resumed, _ = run_sweeps(cfg2, lj, loaded, 5)
    full, _ = run_sweeps(cfg, lj, st, 12)
    np.testing.assert_array_equal(np.asarray(resumed.pos), np.asarray(full.pos))
    assert int(resumed.sweep) == 12


@pytest.mark.slow
def test_hard_disk_eos_phi05_henderson():
    """EOS parity at the headline packing fraction (phi=0.5): the engine's
    contact-value Z must match the Henderson closed form."""
    n, phi = 1024, 0.5
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.0) - int(L // 1.0) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=8, n_moves=8, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=3)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, hs, st, 400)
    snaps = []
    for _ in range(10):
        st, _ = run_sweeps(cfg, hs, st, 25)
        snaps.append(cells.unbin(cfg, st.pos, st.occ))
    z = observables.hard_disk_eos(snaps, L, 1.0, 2)
    z_ref = observables.henderson_z_disks(phi)
    assert abs(z - z_ref) / z_ref < 0.06, (z, z_ref)


def test_cell_list_contact_gr_matches_n2():
    """contact_shell_gr_cells (O(N) path for 1M-scale EOS) must agree with
    the O(N^2) histogram on a small system."""
    import jax
    from mcjax.ops import cells as C
    n, phi = 300, 0.5
    L = math.sqrt(n * math.pi / 4 / phi)
    cps = int(L // 1.0) - int(L // 1.0) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=8, n_moves=6, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, hs, st, 60)
    r = C.unbin(cfg, st.pos, st.occ)
    _, g_n2 = observables.contact_shell_gr(r, L, 2, 1.0, 12, 0.05)
    g_cells = observables.contact_shell_gr_cells(cfg, st.pos, st.occ,
                                                 1.0, 12, 0.05)
    np.testing.assert_allclose(np.asarray(g_cells), np.asarray(g_n2),
                               rtol=1e-4, atol=1e-4)
    # and the two Z estimators agree
    z1 = observables.hard_disk_eos(r, L, 1.0, 2)
    z2 = observables.hard_disk_eos_state(cfg, (st.pos, st.occ), 1.0)
    assert abs(z1 - z2) < 1e-3 * max(1.0, abs(z1))


def test_psi6_order_parameter():
    """psi_6 ~ 1 on a perfect triangular lattice, ~0 for a dilute fluid."""
    from mcjax.utils.observables import psi6_cells
    # triangular lattice, 16x16 cells
    a = 1.1  # lattice constant > diameter
    nx, ny = 24, 14
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            pts.append([ix * a + (iy % 2) * a / 2, iy * a * math.sqrt(3) / 2])
    pts = np.array(pts, np.float32)
    Lx = nx * a
    Ly = ny * a * math.sqrt(3) / 2
    L = max(Lx, Ly)  # embed in a square box (edges imperfect -> psi6 < 1)
    pts = pts - L / 2
    n = len(pts)
    cps = int(L // 1.5) - int(L // 1.5) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=12, n_moves=2)
    from mcjax.ops import cells as C
    pos, occ, ovf = C.bin_particles(cfg, jnp.asarray(pts))
    assert not bool(ovf)
    psi_solid = float(psi6_cells(cfg, pos, occ))
    assert psi_solid > 0.7, psi_solid

    # dilute random fluid -> small psi6
    import jax
    r = jax.random.uniform(jax.random.key(0), (n, 2), minval=-L / 2,
                           maxval=L / 2)
    pos2, occ2, _ = C.bin_particles(cfg, r)
    psi_fluid = float(psi6_cells(cfg, pos2, occ2))
    assert psi_fluid < 0.3, psi_fluid
    assert psi_solid > 2 * psi_fluid


# ---- structure factor (round 3; SURVEY §5 metrics row extension) ------------

def test_structure_factor_matches_direct_sum():
    """Cell-list S(k) == the O(N) numpy direct sum on unbinned positions."""
    import math

    from mcjax.utils.observables import k_lattice, structure_factor_cells

    n, phi = 96, 0.35
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.1,
                    beta=1.0)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, HardSphere(1.0), st, 5)
    kv = k_lattice(cfg, k_max=3.0)
    assert len(kv) > 4
    s = np.asarray(structure_factor_cells(cfg, st.pos, st.occ, kv))
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    for i, k in enumerate(kv):
        ph = r @ k
        want = (np.cos(ph).sum() ** 2 + np.sin(ph).sum() ** 2) / n
        np.testing.assert_allclose(s[i], want, rtol=2e-3, atol=1e-3)


def test_structure_factor_bragg_peak_on_solid():
    """A perfect triangular lattice scatters all weight into its reciprocal
    vectors: S(G) = N, while generic k stay O(1)."""
    import math

    from mcjax.ops.cells import (triangular_lattice_positions,
                                 triangular_rows)
    from mcjax.utils.observables import structure_factor_cells

    n = 240            # 20 x 12 factorization exists
    phi = 0.7
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.2)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=1, proposal="uniform", step_size=0.01,
                    beta=1.0)
    pos = triangular_lattice_positions(cfg)
    st = init_state(cfg, positions=pos)
    nx, ny = triangular_rows(n, box)
    dk = 2.0 * math.pi / box
    g_vec = np.array([[nx * dk, (ny // 2) * dk]], np.float32)
    generic = np.array([[3 * dk, 2 * dk]], np.float32)
    s = np.asarray(structure_factor_cells(cfg, st.pos, st.occ,
                                          np.vstack([g_vec, generic])))
    assert s[0] > 0.9 * n, s
    assert s[1] < 0.1 * n, s


def test_psi6_correlation_g6():
    """g_6(r): == 1 on a commensurate triangular lattice (perfect
    orientational order at every distance), matches a direct O(N^2) numpy
    evaluation on a disordered configuration, and decays for a random
    (Poisson) configuration."""
    import jax

    from mcjax.ops import cells as C
    from mcjax.utils.observables import psi6_correlation_cells

    # commensurate triangular lattice in a PERIODIC box: nx x ny rows with
    # Ly/Lx = ny*sqrt(3)/2 / nx — use a (nearly) square commensurate box
    a = 1.0
    nx, ny = 16, 18              # ny*sqrt(3)/2 = 15.59 ~ nx -> near-square
    pts = []
    for iy in range(ny):
        for ix in range(nx):
            pts.append([ix * a + (iy % 2) * a / 2,
                        iy * a * math.sqrt(3) / 2])
    pts = np.asarray(pts, np.float64)
    Lx, Ly = nx * a, ny * a * math.sqrt(3) / 2
    # anisotropic box is not supported: rescale x to make the box square
    # (an affine stretch of <4% keeps 6-fold bonds well inside r_cut=1.4)
    L = Ly
    pts[:, 0] *= L / Lx
    pts = pts - L / 2
    n = len(pts)
    cps = int(L // 1.6) - int(L // 1.6) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=L, cells_per_side=cps,
                    nmax=14, n_moves=2)
    pos, occ, ovf = C.bin_particles(cfg, jnp.asarray(pts, jnp.float32))
    assert not bool(ovf)
    r_max = min(cfg.cell_width, L / 4)
    centers, g6 = psi6_correlation_cells(cfg, pos, occ, 16, float(r_max))
    g6 = np.asarray(g6)
    cnt_pop = g6[np.abs(g6) > 0]
    assert cnt_pop.size >= 4
    assert np.all(cnt_pop > 0.9), g6     # solid: g6 ~ 1 at every distance

    # ---- parity vs direct numpy on a disordered configuration -----------
    key = jax.random.key(3)
    r = jax.random.uniform(key, (n, 2), minval=-L / 2, maxval=L / 2)
    pos2, occ2, ovf2 = C.bin_particles(cfg, r)
    assert not bool(ovf2)
    n_bins = 12
    centers2, g6_dev = psi6_correlation_cells(cfg, pos2, occ2, n_bins,
                                              float(r_max))
    rr = np.asarray(r, np.float64)
    d = rr[:, None] - rr[None]
    d -= L * np.round(d / L)
    r2 = (d**2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    rc = 1.4
    psi = np.zeros(n, np.complex128)
    for i in range(n):
        bonds = np.where(r2[i] < rc * rc)[0]
        if bonds.size:
            ang = np.arctan2(d[i, bonds, 1], d[i, bonds, 0])
            psi[i] = np.exp(6j * ang).mean()
    dist = np.sqrt(r2)
    dr = float(r_max) / n_bins
    g6_ref = np.zeros(n_bins)
    for b in range(n_bins):
        m = (dist >= b * dr) & (dist < (b + 1) * dr)
        if m.any():
            pp = (psi[:, None] * np.conj(psi[None]))[m]
            g6_ref[b] = pp.real.mean()
    np.testing.assert_allclose(np.asarray(g6_dev), g6_ref, atol=5e-3)


def test_steinhardt_ql_lattice_constants():
    """Global Q4/Q6 hit the Steinhardt-Nelson-Ronchetti closed forms on
    perfect periodic lattices: sc (6 bonds) Q4=0.76376/Q6=0.35355,
    fcc (12 bonds) Q4=0.19094/Q6=0.57452, bcc (14 bonds, first+second
    shell) Q4=0.03637/Q6=0.51069 — four constants x three lattices pin the
    K_lm normalization, the Legendre-derivative polynomials, and the
    +/-m conjugate weighting."""
    from mcjax.ops import cells as C
    from mcjax.utils.observables import ql_cells, ql_local_cells

    def slab_from(points, L, cps, nmax):
        n = len(points)
        cfg = SimConfig(dim=3, n_atoms=n, box_length=L, cells_per_side=cps,
                        nmax=nmax, n_moves=2)
        pos, occ, ovf = C.bin_particles(cfg, jnp.asarray(points, jnp.float32))
        assert not bool(ovf)
        return cfg, pos, occ

    # simple cubic: 8^3 sites, a = 1
    c, a = 8, 1.0
    g = np.arange(c) * a
    sc = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    sc = sc + 0.25 * a - c * a / 2
    cfg, pos, occ = slab_from(sc, c * a, 4, 12)
    assert abs(float(ql_cells(cfg, pos, occ, 1.2, 6)) - 0.35355) < 2e-3
    assert abs(float(ql_cells(cfg, pos, occ, 1.2, 4)) - 0.76376) < 2e-3

    # fcc: 4^3 conventional cells, a = 2 (NN a/sqrt2 = 1.414; rc 1.7 < a)
    c, a = 4, 2.0
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    g = np.arange(c)
    cell = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    fcc = ((cell[:, None] + base[None]).reshape(-1, 3)) * a
    fcc = fcc + 0.25 * a - c * a / 2
    cfg, pos, occ = slab_from(fcc, c * a, 4, 12)
    assert abs(float(ql_cells(cfg, pos, occ, 1.7, 6)) - 0.57452) < 2e-3
    assert abs(float(ql_cells(cfg, pos, occ, 1.7, 4)) - 0.19094) < 2e-3
    # perfect crystal: every live particle's local q6 equals the global
    q_i, live = ql_local_cells(cfg, pos, occ, 1.7, 6)
    vals = np.asarray(q_i)[np.asarray(live) > 0]
    np.testing.assert_allclose(vals, 0.57452, atol=2e-3)

    # bcc: 6^3 conventional cells, a = 1.5; rc 1.1a spans both shells
    c, a = 6, 1.5
    base = np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
    g = np.arange(c)
    cell = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    bcc = ((cell[:, None] + base[None]).reshape(-1, 3)) * a
    bcc = bcc + 0.25 * a - c * a / 2
    cfg, pos, occ = slab_from(bcc, c * a, 4, 16)
    assert abs(float(ql_cells(cfg, pos, occ, 1.1 * a, 6)) - 0.51069) < 2e-3
    assert abs(float(ql_cells(cfg, pos, occ, 1.1 * a, 4)) - 0.03637) < 2e-3


def test_steinhardt_ql_liquid_vs_solid():
    """Q6 of a random (Poisson) gas decays as ~bonds^{-1/2} while the local
    q6(i) distribution sits near the known liquid value (~0.2-0.45) —
    and r_cut > cell_width is a hard error, not silent bond loss."""
    import pytest

    from mcjax.ops import cells as C
    from mcjax.utils.observables import ql_cells, ql_local_cells

    n, L = 512, 10.0
    rng = np.random.default_rng(4)
    pts = rng.uniform(-L / 2, L / 2, (n, 3)).astype(np.float32)
    cfg = SimConfig(dim=3, n_atoms=n, box_length=L, cells_per_side=4,
                    nmax=24, n_moves=2)
    pos, occ, ovf = C.bin_particles(cfg, jnp.asarray(pts))
    assert not bool(ovf)
    q6 = float(ql_cells(cfg, pos, occ, 1.6, 6))
    assert q6 < 0.12, q6          # ~1/sqrt(n_bonds) ~ 0.03 at ~3400 bonds
    q_i, live = ql_local_cells(cfg, pos, occ, 1.6, 6)
    vals = np.asarray(q_i)[np.asarray(live) > 0]
    assert 0.15 < vals.mean() < 0.5, vals.mean()
    with pytest.raises(ValueError):
        ql_cells(cfg, pos, occ, 3.0, 6)
