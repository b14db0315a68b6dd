"""Mixture tests: per-pair params, species transport, energy anchoring.

The reference is one-component only; the mixture machinery (species rides as
an extra coordinate plane through binning/shift/neighbor transport) is
mcjax's own — these tests pin its invariants.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.models.mixtures import (HardSphereMixture, LJMixture,
                                   kob_andersen)
from mcjax.ops import cells
from mcjax.ops.mixture import (color_substep_mixture, init_mixture_state,
                               run_sweeps_mixture,
                               total_energy_mixture_n2,
                               total_interaction_cells_mixture,
                               unbin_mixture)


def ka_cfg(**kw):
    base = dict(dim=3, n_atoms=100, box_length=10.0, cells_per_side=4,
                nmax=12, n_moves=6, beta=1.0, step_size=0.15, seed=0)
    base.update(kw)
    return SimConfig(**base)


def random_mixture(cfg, frac_b=0.2, seed=1):
    kr, ks = jax.random.split(jax.random.PRNGKey(seed))
    r = jax.random.uniform(kr, (cfg.n_atoms, cfg.dim),
                           minval=-cfg.box_length / 2,
                           maxval=cfg.box_length / 2)
    spec = (jax.random.uniform(ks, (cfg.n_atoms,)) < frac_b).astype(jnp.int32)
    return r, spec


def test_lj_mixture_closed_form():
    ka = kob_andersen(shift=False)
    assert ka.n_species == 2 and ka.r_cut == 2.5
    r2 = jnp.array([2.0 ** (1.0 / 3.0)])     # LJ minimum for sigma=1
    zero = jnp.zeros(1)
    one = jnp.ones(1)
    # AA: plain LJ, min = -eps_AA
    np.testing.assert_allclose(ka.pair_energy_s(r2, zero, zero), [-1.0],
                               rtol=1e-6)
    # AB: -eps_AB at r = 2^(1/6) sigma_AB
    r2ab = jnp.array([(0.8 * 2 ** (1 / 6)) ** 2])
    np.testing.assert_allclose(ka.pair_energy_s(r2ab, zero, one), [-1.5],
                               rtol=1e-6)
    np.testing.assert_allclose(ka.pair_energy_s(r2ab, one, zero), [-1.5],
                               rtol=1e-6)                 # symmetric
    # BB: -eps_BB at r = 2^(1/6) sigma_BB
    r2bb = jnp.array([(0.88 * 2 ** (1 / 6)) ** 2])
    np.testing.assert_allclose(ka.pair_energy_s(r2bb, one, one), [-0.5],
                               rtol=1e-6)
    # shifted variant is ~0 at each pair's own cutoff
    kas = kob_andersen(shift=True)
    for (si, sj, sig) in ((zero, zero, 1.0), (zero, one, 0.8),
                          (one, one, 0.88)):
        rc = 2.5 * sig
        v = kas.pair_energy_s(jnp.array([(rc - 1e-4) ** 2]), si, sj)
        assert abs(float(v[0])) < 1e-3


def test_mixture_tables_validated():
    with pytest.raises(ValueError, match="symmetric"):
        LJMixture(epsilon=((1.0, 0.5), (1.5, 1.0)),
                  sigma=((1.0, 1.0), (1.0, 1.0)),
                  r_cut_table=((2.5, 2.5), (2.5, 2.5)))


def test_species_bin_unbin_roundtrip():
    cfg = ka_cfg()
    r, spec = random_mixture(cfg)
    st = init_mixture_state(cfg, r, spec)
    assert st.pos.shape[1] == cfg.dim + 1
    r2, s2 = unbin_mixture(cfg, st.pos, st.occ)
    # same multiset of (position, species) rows
    a = np.concatenate([np.asarray(r), np.asarray(spec)[:, None]], axis=1)
    b = np.concatenate([np.asarray(r2), np.asarray(s2)[:, None]], axis=1)
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_species_survive_grid_shift():
    """The shift merge must never separate a particle from its species id."""
    cfg = ka_cfg()
    r, spec = random_mixture(cfg)
    st = init_mixture_state(cfg, r, spec)
    for axis in range(cfg.dim):
        d = jnp.float32(0.4 if axis % 2 == 0 else -0.35)
        p2, o2, ovf = cells.shift_rebin(cfg, st.pos, st.occ,
                                        jnp.int32(axis), d)
        assert not bool(ovf)
        r2, s2 = unbin_mixture(cfg, p2, o2)
        # positions shifted by -d along axis (wrapped); species follow
        expect = np.asarray(r).copy()
        expect[:, axis] = ((expect[:, axis] - float(d) + cfg.box_length / 2)
                           % cfg.box_length) - cfg.box_length / 2
        a = np.concatenate([expect, np.asarray(spec)[:, None]], axis=1)
        b = np.concatenate([np.asarray(r2), np.asarray(s2)[:, None]], axis=1)
        a = a[np.lexsort(a.T)]
        b = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_kob_andersen_anchor():
    """dE-accumulated trace tracks the exact mixture energy (the reference's
    own anchor technique, applied to physics it cannot express)."""
    ka = kob_andersen()
    cfg = ka_cfg()
    # stratified start: min separation w/2 = 1.25 keeps f32 LJ energies
    # moderate, so the anchor tolerance is meaningful
    r = cells.stratified_positions(cfg)
    spec = (jax.random.uniform(jax.random.PRNGKey(2),
                               (cfg.n_atoms,)) < 0.2).astype(jnp.int32)
    st = init_mixture_state(cfg, r, spec)
    e0, _ = total_energy_mixture_n2(ka, *unbin_mixture(cfg, st.pos, st.occ),
                                    cfg.box_length)
    e0_cells, _ = total_interaction_cells_mixture(cfg, ka, st.pos, st.occ)
    np.testing.assert_allclose(float(e0), float(e0_cells), rtol=1e-4)

    st2, m = run_sweeps_mixture(cfg, ka, st, 20)
    assert int(st2.occ.sum()) == cfg.n_atoms
    e_traced = float(e0) + float(jnp.sum(m.delta_e))
    e_exact, _ = total_energy_mixture_n2(
        ka, *unbin_mixture(cfg, st2.pos, st2.occ), cfg.box_length)
    assert abs(e_traced - float(e_exact)) < 1e-2 * max(1.0,
                                                       abs(float(e_exact)))
    # species populations conserved through the whole run
    _, s_after = unbin_mixture(cfg, st2.pos, st2.occ)
    assert int(jnp.sum(s_after)) == int(jnp.sum(spec))


def test_nonadditive_hard_mixture_no_overlaps():
    """Non-additive hard-disk mixture: the chain must never create an
    overlap under the per-pair contact table."""
    hs = HardSphereMixture(diameter=((1.0, 0.6), (0.6, 0.5)))
    cfg = ka_cfg(dim=2, n_atoms=60, box_length=12.0, cells_per_side=8,
                 nmax=8, n_moves=4, step_size=0.2, proposal="uniform")
    # start from a stratified (overlap-free for these diameters) layout
    r = cells.stratified_positions(cfg)
    spec = (jnp.arange(cfg.n_atoms) % 5 == 0).astype(jnp.int32)
    st = init_mixture_state(cfg, r, spec)
    _, ov0 = total_energy_mixture_n2(hs, *unbin_mixture(cfg, st.pos, st.occ),
                                     cfg.box_length)
    assert not bool(ov0)
    st2, m = run_sweeps_mixture(cfg, hs, st, 15)
    _, ov = total_energy_mixture_n2(hs, *unbin_mixture(cfg, st2.pos, st2.occ),
                                    cfg.box_length)
    assert not bool(ov)
    ratio = float(m.accepted.sum()) / float(m.proposed.sum())
    assert 0.2 < ratio <= 1.0


def test_pallas_mixture_anchor_interpret():
    """The Pallas kernel's species-resolved path (species plane ``dim``,
    per-pair params in-kernel) anchors exactly, interpret mode."""
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    ka = kob_andersen()
    cfg = ka_cfg(n_moves=4)
    r = cells.stratified_positions(cfg)
    spec = (jax.random.uniform(jax.random.PRNGKey(2),
                               (cfg.n_atoms,)) < 0.2).astype(jnp.int32)
    st = init_mixture_state(cfg, r, spec)
    e0, _ = total_energy_mixture_n2(ka, *unbin_mixture(cfg, st.pos, st.occ),
                                    cfg.box_length)
    st2, m = run_sweeps_pallas(cfg, ka, st, 10, 8, 128, True, False, 1)
    e_tr = float(e0) + float(jnp.sum(m.delta_e))
    r2, s2 = unbin_mixture(cfg, st2.pos, st2.occ)
    e_ex, _ = total_energy_mixture_n2(ka, r2, s2, cfg.box_length)
    assert abs(e_tr - float(e_ex)) < 1e-2 * max(1.0, abs(float(e_ex)))
    assert int(s2.sum()) == int(spec.sum())


def test_pallas_nonadditive_hard_mixture_interpret():
    from mcjax.ops.pallas_sweep import run_sweeps_pallas

    hs = HardSphereMixture(diameter=((1.0, 0.6), (0.6, 0.5)))
    cfg = ka_cfg(dim=2, n_atoms=60, box_length=12.0, cells_per_side=8,
                 nmax=8, n_moves=4, step_size=0.2, proposal="uniform")
    r = cells.stratified_positions(cfg)
    spec = (jnp.arange(cfg.n_atoms) % 5 == 0).astype(jnp.int32)
    st = init_mixture_state(cfg, r, spec)
    st2, m = run_sweeps_pallas(cfg, hs, st, 10, 8, 128, True, False, 1)
    _, ov = total_energy_mixture_n2(
        hs, *unbin_mixture(cfg, st2.pos, st2.occ), cfg.box_length)
    assert not bool(ov)


def test_partial_rdf_cells_matches_n2():
    """g_AA/g_AB/g_BB from cell lists == brute-force O(N^2) partials."""
    from mcjax.core.geometry import min_image
    from mcjax.ops.mixture import partial_rdf_cells

    cfg = ka_cfg(n_atoms=120, nmax=14)
    r, spec = random_mixture(cfg, frac_b=0.3, seed=4)
    st = init_mixture_state(cfg, r, spec)
    rr, ss = unbin_mixture(cfg, st.pos, st.occ)
    rr, ss = np.asarray(rr), np.asarray(ss)
    n_bins, r_max = 16, cfg.cell_width

    d = np.asarray(min_image(jnp.asarray(rr[:, None] - rr[None, :]),
                             cfg.box_length))
    dist = np.sqrt((d ** 2).sum(-1))
    V = cfg.box_length ** cfg.dim
    dr = r_max / n_bins
    for (a, b) in ((0, 0), (0, 1), (1, 1)):
        cents, g = partial_rdf_cells(cfg, st.pos, st.occ, n_bins, r_max,
                                     (a, b))
        mask = (ss[:, None] == a) & (ss[None, :] == b)
        np.fill_diagonal(mask, False)
        sel = dist[mask]
        counts = np.histogram(sel[sel < r_max], bins=n_bins,
                              range=(0, r_max))[0]
        n_a, n_b = (ss == a).sum(), (ss == b).sum()
        shell = 4 * np.pi * np.asarray(cents) ** 2 * dr
        expect = counts / np.maximum(n_a * (n_b / V) * shell, 1e-12)
        np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-4,
                                   atol=1e-6)


def test_mixture_checkpoint_roundtrip(tmp_path):
    """save_checkpoint(pot=mixture) must restore to an equal, HASHABLE
    mixture (ADVICE r2 medium: unregistered mixtures made KA checkpoints
    unrecoverable; JSON round-trips tuple tables as lists)."""
    from mcjax.utils.io import load_checkpoint, save_checkpoint

    cfg = ka_cfg()
    r, spec = random_mixture(cfg)
    st = init_mixture_state(cfg, r, spec)
    path = str(tmp_path / "ka.npz")
    save_checkpoint(path, cfg, st, pot=kob_andersen())
    cfg2, st2, pot2 = load_checkpoint(path)
    assert pot2 == kob_andersen()
    hash(pot2)                      # static-jit-arg use requires hashability
    assert isinstance(pot2.sigma[0], tuple)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    # hard-sphere mixture kind round-trips too (incl. non-additive tables)
    hs = HardSphereMixture(diameter=((1.0, 0.6), (0.6, 0.4)))
    save_checkpoint(path, cfg, st, pot=hs)
    _, _, hs2 = load_checkpoint(path)
    assert hs2 == hs and isinstance(hs2.diameter, tuple)
    hash(hs2)


def test_binary_blended_matches_masked():
    """The binary fast path (one LJ eval on u-blended coefficients) must
    agree with the general masked-sum evaluation for every species combo."""
    ka = kob_andersen()
    key = jax.random.PRNGKey(7)
    r2 = jax.random.uniform(key, (256,), minval=0.3, maxval=7.0)
    for a in (0.0, 1.0):
        for b in (0.0, 1.0):
            si = jnp.full((256,), a)
            sj = jnp.full((256,), b)
            got = ka._energy_binary(r2, si, sj)
            want = ka._energy_masked(r2, si, sj)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-5, atol=1e-6)
    hs = HardSphereMixture(diameter=((1.0, 0.6), (0.6, 0.4)))
    r2h = jax.random.uniform(key, (4096,), minval=0.0, maxval=1.2)
    for a in (0.0, 1.0):
        for b in (0.0, 1.0):
            si = jnp.full((4096,), a)
            sj = jnp.full((4096,), b)
            dab = hs.diameter[int(a)][int(b)]
            want = np.asarray(r2h) < dab * dab
            got = np.asarray(hs.overlap_s(r2h, si, sj))
            # blended d^2 is exact at the nodes up to coefficient rounding;
            # disagreement possible only within an ulp of the threshold
            mismatch = got != want
            if mismatch.any():
                assert np.all(np.abs(np.asarray(r2h)[mismatch] - dab * dab)
                              < 1e-6)


def test_widom_species_resolved():
    """Species-resolved Widom insertion (utils/observables.py
    widom_insertion_species): an equal-table hard mixture matches the
    single-species widom bitwise on the same coordinates and key; a
    non-additive table makes the LARGER ghost species insert less often;
    a zero-epsilon LJ mixture gives B = 1 exactly."""
    import math

    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.utils.observables import (widom_insertion,
                                         widom_insertion_species)

    n, phi = 80, 0.35
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=2)
    r0 = cells.stratified_positions(cfg, min_separation=1.0)
    spec = (jnp.arange(n) % 2).astype(jnp.int32)
    key = jax.random.key(13)

    # 1) equal-table mixture == single-species, same points, exactly
    eq = HardSphereMixture(diameter=((1.0, 1.0), (1.0, 1.0)))
    st_m = init_mixture_state(cfg, r0, spec)
    st_s = init_state(cfg, positions=r0)
    b_mix = float(widom_insertion_species(cfg, eq, st_m.pos, st_m.occ,
                                          key, 400, species=0))
    b_sin = float(widom_insertion(cfg, HardSphere(1.0), st_s.pos, st_s.occ,
                                  key, 400))
    assert b_mix == b_sin, (b_mix, b_sin)

    # 2) larger ghost inserts less often (non-additive table)
    na = HardSphereMixture(diameter=((1.2, 0.9), (0.9, 0.6)))
    b_large = float(widom_insertion_species(cfg, na, st_m.pos, st_m.occ,
                                            key, 400, species=0))
    b_small = float(widom_insertion_species(cfg, na, st_m.pos, st_m.occ,
                                            key, 400, species=1))
    assert b_small > b_large > 0.0, (b_large, b_small)

    # 3) ideal mixture: B = 1 exactly
    ideal = LJMixture(epsilon=((0.0, 0.0), (0.0, 0.0)),
                      sigma=((1.0, 1.0), (1.0, 1.0)),
                      r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    b_id = float(widom_insertion_species(cfg, ideal, st_m.pos, st_m.occ,
                                         key, 200, species=1))
    assert b_id == 1.0


def test_virial_pressure_mixture():
    """virial_pressure_cells_mixture: equal-table LJ mixture matches the
    single-species cell-list virial on identical coordinates; zero-epsilon
    gives the ideal P = rho/beta; and for the non-ideal case pressure
    reacts to the species composition (A-A stronger than B-B here)."""
    from mcjax.core.state import init_state
    from mcjax.models.potentials import LennardJones
    from mcjax.ops.mixture import virial_pressure_cells_mixture
    from mcjax.utils.observables import virial_pressure_cells

    cfg = SimConfig(dim=2, n_atoms=72, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="gaussian", step_size=0.2,
                    beta=1.2, seed=5)
    r, spec = random_mixture(cfg, frac_b=0.5, seed=11)
    st = init_mixture_state(cfg, r, spec)

    eq = LJMixture(epsilon=((0.7, 0.7), (0.7, 0.7)),
                   sigma=((1.0, 1.0), (1.0, 1.0)),
                   r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    p_mix = float(virial_pressure_cells_mixture(cfg, eq, st.pos, st.occ,
                                                cfg.beta))
    st_s = init_state(cfg, positions=r)
    p_sin = float(virial_pressure_cells(
        cfg, LennardJones(epsilon=0.7, sigma=1.0, r_cut=2.5),
        st_s.pos, st_s.occ, cfg.beta))
    assert abs(p_mix - p_sin) < 1e-4 * max(1.0, abs(p_sin)), (p_mix, p_sin)

    ideal = LJMixture(epsilon=((0.0, 0.0), (0.0, 0.0)),
                      sigma=((1.0, 1.0), (1.0, 1.0)),
                      r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    p_id = float(virial_pressure_cells_mixture(cfg, ideal, st.pos, st.occ,
                                               cfg.beta))
    rho = cfg.n_atoms / cfg.box_length**2
    assert abs(p_id - rho / cfg.beta) < 1e-5

    # hard-core mixtures are rejected (no pair_energy to differentiate)
    import pytest
    with pytest.raises(ValueError):
        virial_pressure_cells_mixture(
            cfg, HardSphereMixture(diameter=((1.0, 0.9), (0.9, 0.8))),
            st.pos, st.occ, cfg.beta)


def test_partial_structure_factor_matches_direct():
    """S_ab(k) from the cell-list slabs == direct numpy evaluation of
    rho_a rho_b* / sqrt(N_a N_b); S_aa of an all-one-species state equals
    the total S(k)."""
    from mcjax.utils.observables import (k_lattice,
                                         partial_structure_factor_cells,
                                         structure_factor_cells)

    cfg = SimConfig(dim=2, n_atoms=60, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="uniform", step_size=0.2,
                    beta=1.0, seed=4)
    r, spec = random_mixture(cfg, frac_b=0.4, seed=7)
    st = init_mixture_state(cfg, r, spec)
    kv = k_lattice(cfg, 3.0)

    flat = np.asarray(unbin_mixture(cfg, st.pos, st.occ)[0])
    sp = np.asarray(unbin_mixture(cfg, st.pos, st.occ)[1])
    for pair in [(0, 0), (0, 1), (1, 1)]:
        s_dev = np.asarray(partial_structure_factor_cells(
            cfg, st.pos, st.occ, kv, pair=pair))
        rho = []
        for s in pair:
            m = sp == s
            ph = flat[m] @ np.asarray(kv).T            # [N_s, K]
            rho.append(np.cos(ph).sum(0) + 1j * np.sin(ph).sum(0))
        n_a, n_b = (sp == pair[0]).sum(), (sp == pair[1]).sum()
        s_ref = (rho[0] * np.conj(rho[1])).real / math.sqrt(n_a * n_b)
        np.testing.assert_allclose(s_dev, s_ref, rtol=2e-3, atol=2e-3)

    # all-A state: S_00 == total S(k)
    st_a = init_mixture_state(cfg, r, jnp.zeros_like(spec))
    s_aa = np.asarray(partial_structure_factor_cells(
        cfg, st_a.pos, st_a.occ, kv, pair=(0, 0)))
    s_tot = np.asarray(structure_factor_cells(cfg, st_a.pos, st_a.occ, kv))
    np.testing.assert_allclose(s_aa, s_tot, rtol=1e-4, atol=1e-4)
