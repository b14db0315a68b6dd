"""Event-chain MC (ops/ecmc.py): brute-force event-loop oracle, EOS via the
lift-excess pressure estimator, slab invariants, replica ensembles.

The reference has no rejection-free moves at all; the oracle here is an
O(N) numpy simulation of the exact same lifted dynamics with min-image
collision search (no cells, no face bookkeeping) driven by the same start
particle / axis schedule.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.ops import cells, ecmc
from mcjax.ops.gcmc import _flat_view
from mcjax.ops.sweep import run_sweeps


def _hd_cfg(n=96, phi=0.40, nmax=10, seed=0):
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=nmax, n_moves=2, proposal="uniform",
                    step_size=0.15, beta=1.0, seed=seed)
    return cfg, HardSphere(1.0)


def _equilibrate(cfg, pot, sweeps=60):
    st = init_state(cfg, positions=cells.stratified_positions(
        cfg, min_separation=1.0))
    st, _ = run_sweeps(cfg, pot, st, sweeps)
    return st


def _min_image(d, L):
    return d - L * np.round(d / L)


def _oracle_chain(coords, start, axis, ell, L, sigma=1.0):
    """Exact serial ECMC chain on a point set: O(N) collision search per
    event, no cells. Returns (coords, excess, lifts)."""
    x = coords.astype(np.float64).copy()
    n = x.shape[0]
    act = start
    budget = float(ell)
    excess = 0.0
    lifts = 0
    while budget > 1e-14:
        d = _min_image(x - x[act], L)
        d_a = d[:, axis]
        d_perp2 = (d ** 2).sum(1) - d_a ** 2
        disc = sigma * sigma - d_perp2
        hit = (disc > 0) & (d_a > 0)
        hit[act] = False
        t = np.where(hit, d_a - np.sqrt(np.maximum(disc, 0.0)), np.inf)
        t = np.maximum(t, 0.0)
        j = int(np.argmin(t))
        if t[j] < budget:
            x[act, axis] += t[j]
            budget -= t[j]
            excess += math.sqrt(max(disc[j], 0.0))
            lifts += 1
            act = j
        else:
            x[act, axis] += budget
            budget = 0.0
        x[act, axis] = (x[act, axis] + L / 2.0) % L - L / 2.0
    return x, excess, lifts


def test_ecmc_matches_bruteforce_oracle():
    """Chain-by-chain parity: same start/axis schedule -> same point set and
    same lift excess as the exact O(N) event loop."""
    cfg, pot = _hd_cfg(n=64, phi=0.42)
    st = _equilibrate(cfg, pot)
    L = cfg.box_length
    key = jax.random.key(11)

    for chain in range(6):
        axis = chain % 2
        # mirror run_ecmc's start pick on the host to locate the start coord
        fp, fo = (np.asarray(a) for a in _flat_view(cfg, st.pos, st.occ))
        k = jax.random.fold_in(key, 0)   # i=0 inside a 1-chain run
        n_tot = int(fo.sum())
        j = min(int(float(jax.random.uniform(k)) * n_tot), n_tot - 1)
        cum = np.cumsum(fo)
        cell0 = int(np.searchsorted(cum, j, side="right"))
        slot0 = j - (cum[cell0 - 1] if cell0 > 0 else 0)
        r0 = fp[cell0, :, slot0]

        before = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        start = int(np.argmin(((before - r0) ** 2).sum(1)))
        expect, exc_o, lifts_o = _oracle_chain(before, start, axis,
                                               L / 2.0, L)

        st, m = ecmc.run_ecmc(cfg, pot, st, key, 1, float(L / 2.0),
                              axis0=axis)
        key = jax.random.fold_in(key, 1000 + chain)  # fresh key per chain
        after = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        # point-set match (impl splits flights at cell faces -> f32 sums
        # differ at ~1e-5; column-sorting is rank-unstable at that scale)
        d = _min_image(after[:, None, :] - expect[None, :, :], L)
        nn = np.sqrt((d ** 2).sum(-1)).min(1)
        assert nn.max() < 1e-3, (chain, nn.max())
        assert int(m.lifts) == lifts_o
        np.testing.assert_allclose(float(m.excess), exc_o, rtol=1e-4,
                                   atol=1e-4)


def test_ecmc_pressure_matches_henderson():
    """The Michel-Kapfer-Krauth lift-excess estimator reproduces the
    hard-disk EOS: beta P / rho = Z_Henderson(phi) to a few percent."""
    from mcjax.utils.observables import henderson_z_disks

    cfg, pot = _hd_cfg(n=128, phi=0.40, nmax=12, seed=3)
    st = _equilibrate(cfg, pot, sweeps=150)
    ell = float(cfg.box_length / 2.0)
    st, m = ecmc.run_ecmc(cfg, pot, st, jax.random.key(5), 3000, ell)
    z_est = float(ecmc.pressure_from_metrics(m))
    z_ref = henderson_z_disks(0.40)
    assert int(m.capped) == 0 and not bool(st.overflow)
    assert abs(z_est - z_ref) / z_ref < 0.04, (z_est, z_ref)


def test_ecmc_invariants_and_slab_consistency():
    """Face-crossing bookkeeping keeps the slab state valid: conservation,
    no overlap, every particle inside its cell (validate_state)."""
    from mcjax.models.reference import total_energy
    from mcjax.utils.debug import validate_state

    cfg, pot = _hd_cfg(n=96, phi=0.45, nmax=10, seed=1)
    st = _equilibrate(cfg, pot)
    st, m = ecmc.run_ecmc(cfg, pot, st, jax.random.key(2), 400,
                          float(cfg.box_length / 2.0))
    assert int(jnp.sum(st.occ)) == cfg.n_atoms
    assert int(m.capped) == 0 and not bool(st.overflow)
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    _, ov = total_energy(pot, r, cfg.box_length)
    assert not bool(ov)
    validate_state(cfg, st, pot)
    assert int(m.lifts) > 0 and float(m.total_length) > 0


def test_ecmc_ensemble_replicas():
    cfg, pot = _hd_cfg(n=64, phi=0.40)
    from mcjax.parallel import ensemble

    states = ensemble.init_ensemble(
        cfg, 3, positions=cells.stratified_positions(cfg,
                                                     min_separation=1.0))
    states, ms = ecmc.run_ecmc_ensemble(cfg, pot, states, jax.random.key(7),
                                        50, float(cfg.box_length / 2.0))
    assert ms.lifts.shape == (3,)
    occ = np.asarray(states.occ)
    assert (occ.reshape(3, -1).sum(1) == cfg.n_atoms).all()
    # replicas decorrelate (different keys -> different chains)
    p0 = np.asarray(states.pos[0])
    p1 = np.asarray(states.pos[1])
    assert not np.array_equal(p0, p1)


def test_ecmc_rejects_energetic_models():
    import pytest
    from mcjax.models.potentials import LennardJones

    cfg, _ = _hd_cfg()
    st = init_state(cfg)
    with pytest.raises(ValueError):
        ecmc.run_ecmc(cfg, LennardJones(), st, jax.random.key(0), 1, 1.0)


def test_ecmc_3d_pressure_matches_carnahan_starling():
    """The event loop is dim-generic: 3D hard spheres reproduce the
    Carnahan-Starling EOS from the same lift-excess estimator."""
    from mcjax.utils.observables import carnahan_starling_z

    n, phi = 500, 0.30
    box = (n * math.pi / 6.0 / phi) ** (1.0 / 3.0)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=3, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=18, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=2)
    pot = HardSphere(1.0)
    st = init_state(cfg, positions=cells.stratified_positions(
        cfg, min_separation=1.0))
    st, _ = run_sweeps(cfg, pot, st, 80)
    st, m = ecmc.run_ecmc(cfg, pot, st, jax.random.key(9), 1500,
                          float(cfg.box_length / 2.0))
    z_est = float(ecmc.pressure_from_metrics(m))
    z_ref = carnahan_starling_z(phi)
    assert int(m.capped) == 0 and not bool(st.overflow)
    assert int(jnp.sum(st.occ)) == n
    assert abs(z_est - z_ref) / z_ref < 0.05, (z_est, z_ref)
    from mcjax.models.reference import total_energy
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    _, ov = total_energy(pot, r, cfg.box_length)
    assert not bool(ov)


def _oracle_chain_mix(coords, species, start, axis, ell, L, dmat):
    """Oracle with a per-pair contact table (non-additive allowed)."""
    x = coords.astype(np.float64).copy()
    act = start
    budget = float(ell)
    excess = 0.0
    lifts = 0
    while budget > 1e-14:
        d = _min_image(x - x[act], L)
        d_a = d[:, axis]
        d_perp2 = (d ** 2).sum(1) - d_a ** 2
        sig = dmat[species[act], species]
        disc = sig * sig - d_perp2
        hit = (disc > 0) & (d_a > 0)
        hit[act] = False
        t = np.where(hit, d_a - np.sqrt(np.maximum(disc, 0.0)), np.inf)
        t = np.maximum(t, 0.0)
        j = int(np.argmin(t))
        if t[j] < budget:
            x[act, axis] += t[j]
            budget -= t[j]
            excess += math.sqrt(max(disc[j], 0.0))
            lifts += 1
            act = j
        else:
            x[act, axis] += budget
            budget = 0.0
        x[act, axis] = (x[act, axis] + L / 2.0) % L - L / 2.0
    return x, excess, lifts


def test_ecmc_mixture_matches_oracle_and_conserves_species():
    """Binary (non-additive) hard-disk mixture: per-pair contact lifts match
    the oracle exactly; species ride the face-crossing bookkeeping."""
    from mcjax.models.mixtures import HardSphereMixture
    from mcjax.ops.mixture import init_mixture_state

    n = 80
    dmat_t = ((1.0, 0.9), (0.9, 0.7))   # non-additive cross term
    pot = HardSphereMixture(diameter=dmat_t)
    phi_eff = 0.35
    box = math.sqrt(n * math.pi / 4.0 / phi_eff)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=5)
    spec = (jnp.arange(n) % 2).astype(jnp.int32)
    st = init_mixture_state(
        cfg, cells.stratified_positions(cfg, min_separation=1.0), spec)
    from mcjax.ops.mixture import run_sweeps_mixture
    st, _ = run_sweeps_mixture(cfg, pot, st, 40)
    L = cfg.box_length
    dmat = np.asarray(dmat_t)
    key = jax.random.key(21)

    for chain in range(4):
        axis = chain % 2
        fp, fo = (np.asarray(a) for a in _flat_view(cfg, st.pos, st.occ))
        k = jax.random.fold_in(key, 0)
        n_tot = int(fo.sum())
        j = min(int(float(jax.random.uniform(k)) * n_tot), n_tot - 1)
        cum = np.cumsum(fo)
        cell0 = int(np.searchsorted(cum, j, side="right"))
        slot0 = j - (cum[cell0 - 1] if cell0 > 0 else 0)
        r0 = fp[cell0, :2, slot0]

        flat = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        before, sp = flat[:, :2], flat[:, 2].round().astype(int)
        start = int(np.argmin(((before - r0) ** 2).sum(1)))
        expect, exc_o, lifts_o = _oracle_chain_mix(before, sp, start, axis,
                                                   L / 2.0, L, dmat)

        st, m = ecmc.run_ecmc(cfg, pot, st, key, 1, float(L / 2.0),
                              axis0=axis)
        key = jax.random.fold_in(key, 2000 + chain)
        flat2 = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        after = flat2[:, :2]
        d = _min_image(after[:, None, :] - expect[None, :, :], L)
        nn = np.sqrt((d ** 2).sum(-1)).min(1)
        assert nn.max() < 1e-3, (chain, nn.max())
        assert int(m.lifts) == lifts_o
        np.testing.assert_allclose(float(m.excess), exc_o, rtol=1e-4,
                                   atol=1e-4)
        # species conserved through lifts and face crossings
        assert int(flat2[:, 2].round().sum()) == int(sp.sum())

    # final state respects every per-pair contact distance
    flat = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    coords, sp = flat[:, :2], flat[:, 2].round().astype(int)
    d = _min_image(coords[None] - coords[:, None], L)
    r = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(r, np.inf)
    assert (r >= dmat[sp[:, None], sp[None]] - 1e-5).all()


# ---- parallel (multi-chain, one system) strip-confined reflective ECMC ------

def test_ecmc_parallel_invariants():
    """Simultaneous strip chains keep every slab invariant: conservation,
    in-cell positions, no overlap, no caps."""
    from mcjax.models.reference import total_energy
    from mcjax.utils.debug import validate_state

    cfg, pot = _hd_cfg(n=96, phi=0.45, nmax=10, seed=1)
    st = _equilibrate(cfg, pot, sweeps=30)
    st, m = ecmc.run_ecmc_parallel(cfg, pot, st, jax.random.key(3), 60, 3.0,
                                   n_strips=3)
    assert int(jnp.sum(st.occ)) == cfg.n_atoms
    assert int(m.capped) == 0 and not bool(st.overflow)
    assert int(m.lifts) > 0 and int(m.chains) == 180
    validate_state(cfg, st, pot)
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    _, ov = total_energy(pot, r, cfg.box_length)
    assert not bool(ov)


def test_ecmc_parallel_buffer_frozen():
    """The conflict rule itself: particles in the round's frozen buffer
    columns are bitwise untouched by the simultaneous chains."""
    cfg, pot = _hd_cfg(n=96, phi=0.42, seed=2)
    st = _equilibrate(cfg, pot, sweeps=30)
    cps, G = cfg.cells_per_side, cfg.cells_per_side // 3
    w, L = cfg.cell_width, cfg.box_length
    key = jax.random.key(17)
    axis0 = 0
    # recompute the round-0 schedule on the host
    k_off, _, _ = jax.random.split(jax.random.fold_in(key, 0), 3)
    o = int(jax.random.randint(k_off, (), 0, cps))
    before = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    col = np.floor((before[:, axis0] + L / 2.0) / w).astype(int) % cps
    q = ((col - o) % cps) % G
    frozen_rows = before[q == G - 1]
    assert frozen_rows.shape[0] > 0

    st2, _ = ecmc.run_ecmc_parallel(cfg, pot, st, key, 1, 4.0, n_strips=3,
                                    axis0=axis0)
    after = np.asarray(cells.unbin(cfg, st2.pos, st2.occ))
    after_set = {tuple(row) for row in after}
    for row in frozen_rows:
        assert tuple(row) in after_set, "buffer particle moved"
    # and the chains did move something
    assert {tuple(r) for r in before} != after_set


def _oracle_parallel_round(coords, o, dirs, picks, cps, G, w, L, ell,
                           sigma=1.0):
    """Exact serial simulation of one parallel round: strips cannot
    interact, so run each strip's confined reflective chain in turn.
    Contacts with buffer-column particles and strip walls reflect the
    direction; contacts with confined particles lift."""
    x = coords.astype(np.float64).copy()
    n_strips = cps // G
    col = np.floor((x[:, 0] + L / 2.0) / w).astype(int) % cps
    q = ((col - o) % cps) % G
    strip_of = ((col - o) % cps) // G
    lifts = refl = 0
    for s in range(n_strips):
        conf = np.where((strip_of == s) & (q < G - 1))[0]
        if len(conf) == 0:
            continue
        lo, hi = s * G * w, s * G * w + (G - 1) * w
        act = conf[picks[s] % len(conf)]
        d = float(dirs[s])
        budget = float(ell)
        guard = 0
        while budget > 1e-12 and guard < 100_000:
            guard += 1
            ra = (x[act, 0] + L / 2.0 - o * w) % (cps * w)
            t_wall = max((hi - ra) if d > 0 else (ra - lo), 0.0)
            dd = _min_image(x - x[act], L)
            s_a = dd[:, 0] * d
            disc = sigma * sigma - ((dd ** 2).sum(1) - dd[:, 0] ** 2)
            hit = (disc > 0) & (s_a > 0)
            hit[act] = False
            t = np.where(hit, np.maximum(
                s_a - np.sqrt(np.maximum(disc, 0.0)), 0.0), np.inf)
            j = int(np.argmin(t))
            if t[j] < min(budget, t_wall):
                x[act, 0] += d * t[j]
                budget -= t[j]
                qj = ((int(np.floor((x[j, 0] + L / 2.0) / w)) % cps - o)
                      % cps) % G
                if qj == G - 1:
                    d, refl = -d, refl + 1
                else:
                    act, lifts = j, lifts + 1
            elif t_wall <= budget:
                x[act, 0] += d * t_wall
                budget -= t_wall
                d, refl = -d, refl + 1
            else:
                x[act, 0] += d * budget
                budget = 0.0
            x[act, 0] = (x[act, 0] + L / 2.0) % L - L / 2.0
    return x, lifts, refl


def test_ecmc_parallel_matches_serial_oracle():
    """Round-by-round parity with an exact serial oracle of the strip
    dynamics: same point set, same lift count, same reflection count —
    the decisive implementation check for the multi-chain conflict rule."""
    n, phi = 96, 0.44
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    L, w = cfg.box_length, cfg.cell_width
    n_strips = 3
    G = cps // n_strips
    st = _equilibrate(cfg, pot, sweeps=40)
    key = jax.random.key(77)
    n_cells = cfg.n_colors * cfg.cells_per_color
    cpc_col = n_cells // cps
    all_cols = np.asarray(ecmc._decode_cell(
        cfg, jnp.arange(n_cells, dtype=jnp.int32)))[0]

    for rnd in range(8):
        kr = jax.random.fold_in(key, rnd)
        # host-side schedule reconstruction (mirrors round_body at i=0)
        k_off, k_pick, k_dir = jax.random.split(jax.random.fold_in(kr, 0), 3)
        o = int(jax.random.randint(k_off, (), 0, cps))
        u = np.asarray(jax.random.uniform(k_pick, (n_strips,)))
        dirs = np.where(np.asarray(
            jax.random.uniform(k_dir, (n_strips,))) < 0.5, 1.0, -1.0)
        before = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        fp, fo = (np.asarray(a) for a in _flat_view(cfg, st.pos, st.occ))
        perm = np.argsort((all_cols - o) % cps, kind="stable")
        confined_ord = (np.arange(n_cells) % (G * cpc_col)
                        < (G - 1) * cpc_col)
        cum = np.cumsum(np.where(confined_ord, fo[perm], 0))
        starts = np.arange(n_strips) * (G * cpc_col)
        base = np.where(starts > 0, cum[starts - 1], 0)
        count = cum[starts + G * cpc_col - 1] - base
        j = base + np.minimum(np.floor(u * count).astype(int),
                              np.maximum(count - 1, 0))
        idx = np.minimum(np.searchsorted(cum, j, side="right"), n_cells - 1)
        cell0, slot0 = perm[idx], j - np.where(idx > 0, cum[idx - 1], 0)
        # map device start coords to oracle pick indices
        col_b = np.floor((before[:, 0] + L / 2.0) / w).astype(int) % cps
        qb, sb = ((col_b - o) % cps) % G, ((col_b - o) % cps) // G
        picks = np.zeros(n_strips, dtype=int)
        for s in range(n_strips):
            if count[s] == 0:
                continue
            conf = np.where((sb == s) & (qb < G - 1))[0]
            r0 = fp[cell0[s], :, slot0[s]]
            want = int(np.argmin(((before - r0) ** 2).sum(1)))
            loc = np.where(conf == want)[0]
            assert len(loc) == 1, "device pick not in oracle confined set"
            picks[s] = int(loc[0])
        expect, lifts_o, refl_o = _oracle_parallel_round(
            before, o, dirs, picks, cps, G, w, L, 3.0)

        st, m = ecmc.run_ecmc_parallel(cfg, pot, st, kr, 1, 3.0,
                                       n_strips=n_strips, axis0=0)
        after = np.asarray(cells.unbin(cfg, st.pos, st.occ))
        d = _min_image(after[:, None, :] - expect[None, :, :], L)
        nn = np.sqrt((d ** 2).sum(-1)).min(1)
        assert nn.max() < 1e-3, (rnd, nn.max())
        assert int(m.lifts) == lifts_o
        assert int(m.reflections) == refl_o


@pytest.mark.slow
def test_ecmc_parallel_eos_matches_henderson():
    """Sampling exactness: states sampled purely by parallel strip chains
    reproduce the hard-disk EOS (configurational contact-value Z; the lift
    estimator is wall-biased by design, so it is not used here).

    Statistical power note: a 200-snapshot calibration run measured
    Z = 3.635 vs Henderson 3.520 (+3.3%, within its correlated-sample
    noise) with a 100-snapshot Metropolis control at 3.519; the tolerance
    here is sized for ~70 correlated snapshots (sigma(Z) ~ 5%)."""
    from mcjax.utils.observables import hard_disk_eos, henderson_z_disks

    n, phi = 256, 0.46
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 1.0)
    cps -= cps % 5
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=4, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=6)
    pot = HardSphere(1.0)
    st = _equilibrate(cfg, pot, sweeps=250)
    snaps = []
    key = jax.random.key(31)
    for b in range(70):
        st, m = ecmc.run_ecmc_parallel(cfg, pot, st,
                                       jax.random.fold_in(key, b), 20, 3.0,
                                       n_strips=5, axis0=b % 2)
        assert int(m.capped) == 0
        snaps.append(cells.unbin(cfg, st.pos, st.occ))
    assert not bool(st.overflow)
    z = hard_disk_eos(snaps, cfg.box_length, 1.0, 2)
    z_ref = henderson_z_disks(phi)
    assert abs(z - z_ref) / z_ref < 0.12, (z, z_ref)


def test_ecmc_parallel_mixture_and_errors():
    """Per-pair contact tables ride the parallel chains (species conserved,
    every contact distance respected); bad strip counts raise."""
    import pytest
    from mcjax.models.mixtures import HardSphereMixture
    from mcjax.ops.mixture import init_mixture_state

    n = 80
    dmat_t = ((1.0, 0.9), (0.9, 0.7))
    pot = HardSphereMixture(diameter=dmat_t)
    box = math.sqrt(n * math.pi / 4.0 / 0.35)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=5)
    spec = (jnp.arange(n) % 2).astype(jnp.int32)
    st = init_mixture_state(
        cfg, cells.stratified_positions(cfg, min_separation=1.0), spec)
    from mcjax.ops.mixture import run_sweeps_mixture
    st, _ = run_sweeps_mixture(cfg, pot, st, 30)
    st, m = ecmc.run_ecmc_parallel(cfg, pot, st, jax.random.key(9), 80, 3.0,
                                   n_strips=cps // 2)
    assert int(jnp.sum(st.occ)) == n and not bool(st.overflow)
    assert int(m.lifts) > 0
    flat = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    coords, sp = flat[:, :2], flat[:, 2].round().astype(int)
    assert sp.sum() == n // 2
    d = _min_image(coords[None] - coords[:, None], cfg.box_length)
    r = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(r, np.inf)
    dm = np.asarray(dmat_t)
    assert (r >= dm[sp[:, None], sp[None]] - 1e-5).all()

    with pytest.raises(ValueError):
        ecmc.run_ecmc_parallel(cfg, pot, st, jax.random.key(0), 1, 1.0,
                               n_strips=7)   # cps not divisible
    with pytest.raises(ValueError):
        ecmc.run_ecmc_parallel(cfg, pot, st, jax.random.key(0), 1, 1.0,
                               n_strips=cps)  # G < 2
