"""Grand-canonical (muVT) ensemble tests: ideal-gas exactness, activity
consistency with Widom insertion, slab invariants under insertion/deletion.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops import gcmc
from mcjax.ops.sweep import run_sweeps


def test_gcmc_ideal_gas_exact():
    """epsilon=0 LJ = ideal gas: <N> = zV exactly, N ~ Poisson."""
    cfg = SimConfig(dim=2, n_atoms=40, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LennardJones(epsilon=0.0)
    st = init_state(cfg)
    n_target = 40.0
    z = n_target / cfg.box_length ** 2
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 300, 20)      # equilibrate
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 1500, 20)
    n_mean = float(jnp.mean(m.n_particles.astype(jnp.float32)))
    assert abs(n_mean - n_target) / n_target < 0.06, n_mean
    # Poisson: var ~ mean (loose — samples are correlated)
    n_var = float(jnp.var(m.n_particles.astype(jnp.float32)))
    assert 0.3 * n_mean < n_var < 3.0 * n_mean, (n_mean, n_var)
    assert int(jnp.sum(m.capacity_rejects)) == 0
    assert int(jnp.sum(m.inserted)) > 100
    assert int(jnp.sum(m.deleted)) > 100


def test_gcmc_hard_disks_consistent_with_widom():
    """Self-consistency against the NVT engine: measure the insertion factor
    B = <e^{-beta dU}> at phi* by Widom, then run muVT at z* = rho*/B —
    the GC density must settle back at rho* (exact at equilibrium)."""
    from mcjax.utils.observables import widom_insertion

    n, phi = 128, 0.3
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=4, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, _ = run_sweeps(cfg, hs, st, 300)
    # Widom estimate of B, averaged over a few decorrelated snapshots
    bs = []
    for i in range(6):
        st, _ = run_sweeps(cfg, hs, st, 50)
        kw = jax.random.fold_in(st.key, jnp.int32(-100 - i))
        bs.append(float(widom_insertion(cfg, hs, st.pos, st.occ, kw, 2000)))
    b = float(np.mean(bs))
    rho = n / box ** 2
    z_star = rho / b
    st, m = gcmc.run_gcmc(cfg, hs, st, z_star, 400, 32)   # equilibrate
    st, m = gcmc.run_gcmc(cfg, hs, st, z_star, 1200, 32)
    n_mean = float(jnp.mean(m.n_particles.astype(jnp.float32)))
    assert abs(n_mean - n) / n < 0.07, (n_mean, n, b)
    assert int(jnp.sum(m.capacity_rejects)) == 0


def test_gcmc_invariants_and_no_overlap():
    from mcjax.models.reference import total_energy
    from mcjax.ops import cells

    n, phi = 64, 0.25
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, m = gcmc.run_gcmc(cfg, hs, st, 0.3, 200, 16)
    occ = np.asarray(st.occ)
    assert (occ >= 0).all() and (occ <= cfg.nmax).all()
    n_now = int(occ.sum())
    assert n_now == int(m.n_particles[-1])
    # live particles never overlap
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ, n_out=n_now))
    assert r.shape[0] == n_now
    _, ov = total_energy(hs, r, cfg.box_length)
    assert not bool(ov)
    # the slab geometry is still valid: every particle is inside its cell
    from mcjax.utils.debug import validate_state
    validate_state(cfg, st, hs, expect_atoms=n_now)


# ---- checkerboard (vectorized, shardable) GC phase ---------------------------

def test_gcmc_checkerboard_ideal_gas_exact():
    """The per-cell subvolume acceptances sample the same muVT measure:
    <N> = zV exactly for the ideal gas, N ~ Poisson."""
    cfg = SimConfig(dim=2, n_atoms=40, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LennardJones(epsilon=0.0)
    st = init_state(cfg)
    n_target = 40.0
    z = n_target / cfg.box_length ** 2
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 300, checkerboard=True)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 1500, checkerboard=True)
    n_mean = float(jnp.mean(m.n_particles.astype(jnp.float32)))
    assert abs(n_mean - n_target) / n_target < 0.06, n_mean
    n_var = float(jnp.var(m.n_particles.astype(jnp.float32)))
    assert 0.3 * n_mean < n_var < 3.0 * n_mean, (n_mean, n_var)
    assert int(jnp.sum(m.capacity_rejects)) == 0
    assert int(jnp.sum(m.inserted)) > 100
    assert int(jnp.sum(m.deleted)) > 100


def test_gcmc_checkerboard_hard_disks_matches_serial():
    """Interacting check: at one activity, the checkerboard phase and the
    serial scan settle at the same density (both satisfy balance)."""
    n, phi = 96, 0.25
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    z = 0.6

    def mean_n(checkerboard, n_attempts, seed):
        st = init_state(cfg, seed=seed)
        st, _ = gcmc.run_gcmc(cfg, hs, st, z, 300, n_attempts, checkerboard)
        st, m = gcmc.run_gcmc(cfg, hs, st, z, 1200, n_attempts, checkerboard)
        ns = np.asarray(m.n_particles, dtype=np.float64)
        # crude autocorr-insensitive error: batch means over 8 blocks
        bm = ns.reshape(8, -1).mean(1)
        return ns.mean(), bm.std() / math.sqrt(len(bm) - 1)

    m_ser, s_ser = mean_n(False, 32, seed=1)
    m_chk, s_chk = mean_n(True, 1, seed=2)
    tol = 4.0 * math.hypot(s_ser, s_chk) + 0.02 * m_ser
    assert abs(m_ser - m_chk) < tol, (m_ser, s_ser, m_chk, s_chk)


def test_gcmc_checkerboard_invariants():
    from mcjax.models.reference import total_energy
    from mcjax.ops import cells

    n, phi = 64, 0.25
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    st, m = gcmc.run_gcmc(cfg, hs, st, 0.3, 200, checkerboard=True)
    occ = np.asarray(st.occ)
    assert (occ >= 0).all() and (occ <= cfg.nmax).all()
    n_now = int(occ.sum())
    assert n_now == int(m.n_particles[-1])
    r = np.asarray(cells.unbin(cfg, st.pos, st.occ, n_out=n_now))
    _, ov = total_energy(hs, r, cfg.box_length)
    assert not bool(ov)
    from mcjax.utils.debug import validate_state
    validate_state(cfg, st, hs, expect_atoms=n_now)


def test_sharded_gcmc_ideal_gas():
    """muVT composes with the mesh: <N> = zV on a 2x2 spatial mesh, with
    per-cell acceptances needing no global-N collective."""
    from mcjax.parallel import mesh as pmesh
    from mcjax.parallel.gcmc import make_sharded_run_gcmc
    from jax.sharding import Mesh

    cfg = SimConfig(dim=2, n_atoms=48, box_length=16.0, cells_per_side=8,
                    nmax=12, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LennardJones(epsilon=0.0)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    m = Mesh(devs, ("y", "x"))
    n_target = 48.0
    z = n_target / cfg.box_length ** 2
    st = pmesh.shard_state(cfg, init_state(cfg), m, ("y", "x"))
    run_eq = make_sharded_run_gcmc(cfg, pot, m, ("y", "x"), z, 300)
    run_ms = make_sharded_run_gcmc(cfg, pot, m, ("y", "x"), z, 1200)
    st, _ = run_eq(st)
    st, mtr = run_ms(st)
    n_mean = float(jnp.mean(mtr.n_particles.astype(jnp.float32)))
    assert abs(n_mean - n_target) / n_target < 0.07, n_mean
    assert int(jnp.sum(mtr.capacity_rejects)) == 0
    assert int(jnp.sum(st.occ)) == int(mtr.n_particles[-1])
    assert len(st.pos.sharding.device_set) == 4


def test_gcmc_cb_ideal_gas_exact():
    """Configurational-bias (k=4 Rosenbluth trials) reduces exactly to the
    plain acceptances for the ideal gas: <N> = zV, N ~ Poisson."""
    cfg = SimConfig(dim=2, n_atoms=40, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LennardJones(epsilon=0.0)
    st = init_state(cfg)
    n_target = 40.0
    z = n_target / cfg.box_length ** 2
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 300, checkerboard=True,
                          n_trials=4)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 1500, checkerboard=True,
                          n_trials=4)
    n_mean = float(jnp.mean(m.n_particles.astype(jnp.float32)))
    assert abs(n_mean - n_target) / n_target < 0.06, n_mean
    n_var = float(jnp.var(m.n_particles.astype(jnp.float32)))
    assert 0.3 * n_mean < n_var < 3.0 * n_mean, (n_mean, n_var)
    assert int(jnp.sum(m.capacity_rejects)) == 0


def test_gcmc_cb_hard_disks_matches_plain_and_boosts_insertion():
    """Balance check for the multiple-first-bead scheme: at one activity,
    k=6 Rosenbluth trials settle at the SAME density as plain k=1 (both
    exact).  The hole-finding boost only materializes where the acceptance
    saturates (z v W/(k(n+1)) >= 1): from the same dense state at high
    activity, k=8 must accept several times more insertions than k=1."""
    from mcjax.ops import cells

    n, phi = 96, 0.25
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="uniform", step_size=0.15,
                    beta=1.0)
    hs = HardSphere(1.0)
    z = 2.0

    def run(n_trials, seed):
        st = init_state(cfg, seed=seed)
        st, _ = gcmc.run_gcmc(cfg, hs, st, z, 300, 1, True,
                              n_trials=n_trials)
        st, m = gcmc.run_gcmc(cfg, hs, st, z, 1200, 1, True,
                              n_trials=n_trials)
        ns = np.asarray(m.n_particles, dtype=np.float64)
        bm = ns.reshape(8, -1).mean(1)
        return (ns.mean(), bm.std() / math.sqrt(len(bm) - 1), st)

    m1, s1, st1 = run(1, seed=3)
    m6, s6, st6 = run(6, seed=4)
    tol = 4.0 * math.hypot(s1, s6) + 0.02 * m1
    assert abs(m1 - m6) < tol, (m1, s1, m6, s6)
    # hard-core invariant survives CB insertions
    from mcjax.models.reference import total_energy
    r = cells.unbin(cfg, st6.pos, st6.occ, n_out=int(jnp.sum(st6.occ)))
    _, ov = total_energy(hs, np.asarray(r), cfg.box_length)
    assert not bool(ov)
    # saturated regime: same dense start, z=50 -> CB k=8 inserts >> k=1
    z_hi = 50.0
    _, mh1 = gcmc.run_gcmc(cfg, hs, st1, z_hi, 60, 1, True, n_trials=1)
    _, mh8 = gcmc.run_gcmc(cfg, hs, st1, z_hi, 60, 1, True, n_trials=8)
    ins1, ins8 = int(jnp.sum(mh1.inserted)), int(jnp.sum(mh8.inserted))
    assert ins8 > 2 * ins1, (ins1, ins8)


# ---- mixture (multicomponent) muVT ------------------------------------------

def _mixture_start(cfg, frac_b=0.5, seed=0):
    from mcjax.ops.mixture import init_mixture_state

    kr, ks = jax.random.split(jax.random.PRNGKey(seed))
    half = cfg.box_length / 2
    r = jax.random.uniform(kr, (cfg.n_atoms, cfg.dim), minval=-half,
                           maxval=half)
    spec = (jax.random.uniform(ks, (cfg.n_atoms,)) < frac_b).astype(jnp.int32)
    return init_mixture_state(cfg, r, spec)


def test_gcmc_mixture_ideal_gas_exact():
    """Two-species ideal mixture: <N_s> = z_s V for each species
    independently — the per-species activities really are independent
    thermodynamic knobs (uniform species proposal folds out exactly)."""
    from mcjax.models.mixtures import LJMixture

    cfg = SimConfig(dim=2, n_atoms=48, box_length=12.0, cells_per_side=4,
                    nmax=14, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LJMixture(epsilon=((0.0, 0.0), (0.0, 0.0)),
                    sigma=((1.0, 1.0), (1.0, 1.0)),
                    r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    st = _mixture_start(cfg)
    vol = cfg.box_length ** 2
    na_t, nb_t = 32.0, 16.0
    z = jnp.array([na_t / vol, nb_t / vol], jnp.float32)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 300, checkerboard=True)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 1500, checkerboard=True)
    counts = np.asarray(m.counts, np.float64)          # [n_sweeps, 2]
    na, nb = counts[:, 0].mean(), counts[:, 1].mean()
    assert abs(na - na_t) / na_t < 0.08, (na, nb)
    assert abs(nb - nb_t) / nb_t < 0.12, (na, nb)
    # composition identity: counts sum to the total-N metric
    np.testing.assert_array_equal(
        counts.sum(1), np.asarray(m.n_particles, np.float64))
    assert int(jnp.sum(m.capacity_rejects)) == 0
    assert int(jnp.sum(m.inserted)) > 100
    assert int(jnp.sum(m.deleted)) > 100


def test_gcmc_mixture_hard_disks_invariants():
    """Interacting mixture muVT: equal activities on an asymmetric hard-disk
    mixture must favor the small species, the species-resolved hard-core
    invariant must survive, and the slab geometry must stay valid."""
    from mcjax.models.mixtures import HardSphereMixture
    from mcjax.ops import cells
    from mcjax.ops.mixture import total_energy_mixture_n2

    cfg = SimConfig(dim=2, n_atoms=40, box_length=12.0, cells_per_side=4,
                    nmax=12, n_moves=2, proposal="uniform", step_size=0.2,
                    beta=1.0)
    pot = HardSphereMixture(diameter=((1.0, 0.8), (0.8, 0.6)))
    st = _mixture_start(cfg, seed=2)
    # purge any initial random overlaps before asserting the invariant:
    # deletions remove them, and accepted states never re-create one
    z = jnp.array([1.0, 1.0], jnp.float32)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 400, checkerboard=True)
    st, m = gcmc.run_gcmc(cfg, pot, st, z, 400, checkerboard=True)
    counts = np.asarray(m.counts, np.float64)
    assert counts[:, 1].mean() > counts[:, 0].mean()   # small B outnumbers A
    occ = np.asarray(st.occ)
    assert (occ >= 0).all() and (occ <= cfg.nmax).all()
    n_now = int(occ.sum())
    assert n_now == int(m.n_particles[-1])
    flat = np.asarray(cells.unbin(cfg, st.pos, st.occ, n_out=n_now))
    r, spec = flat[:, :2], flat[:, 2].round().astype(np.int32)
    _, ov = total_energy_mixture_n2(pot, r, spec, cfg.box_length)
    assert not bool(ov)
    assert set(np.unique(spec)) <= {0, 1}
    np.testing.assert_allclose(
        np.bincount(spec, minlength=2).astype(np.float64),
        np.asarray(m.counts[-1], np.float64))


def test_sharded_gcmc_mixture_ideal_gas():
    """Multicomponent muVT composes with the mesh: per-species <N_s> = z_s V
    on a 2x2 spatial mesh, composition counts psum'd global."""
    from mcjax.models.mixtures import LJMixture
    from mcjax.parallel import mesh as pmesh
    from mcjax.parallel.gcmc import make_sharded_run_gcmc
    from jax.sharding import Mesh

    cfg = SimConfig(dim=2, n_atoms=48, box_length=16.0, cells_per_side=8,
                    nmax=12, n_moves=2, proposal="uniform", step_size=0.5,
                    beta=1.0)
    pot = LJMixture(epsilon=((0.0, 0.0), (0.0, 0.0)),
                    sigma=((1.0, 1.0), (1.0, 1.0)),
                    r_cut_table=((2.5, 2.5), (2.5, 2.5)))
    st = _mixture_start(cfg, seed=5)
    vol = cfg.box_length ** 2
    na_t, nb_t = 32.0, 16.0
    z = jnp.array([na_t / vol, nb_t / vol], jnp.float32)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    m = Mesh(devs, ("y", "x"))
    st = pmesh.shard_state(cfg, st, m, ("y", "x"))
    run_eq = make_sharded_run_gcmc(cfg, pot, m, ("y", "x"), z, 300)
    run_ms = make_sharded_run_gcmc(cfg, pot, m, ("y", "x"), z, 1200)
    st, _ = run_eq(st)
    st, mtr = run_ms(st)
    counts = np.asarray(mtr.counts, np.float64)       # [n_sweeps, 2]
    na, nb = counts[:, 0].mean(), counts[:, 1].mean()
    assert abs(na - na_t) / na_t < 0.08, (na, nb)
    assert abs(nb - nb_t) / nb_t < 0.12, (na, nb)
    np.testing.assert_array_equal(
        counts.sum(1), np.asarray(mtr.n_particles, np.float64))
    assert int(jnp.sum(mtr.capacity_rejects)) == 0
    assert int(jnp.sum(st.occ)) == int(mtr.n_particles[-1])
    assert len(st.pos.sharding.device_set) == 4


def test_gcmc_mixture_requires_checkerboard():
    import pytest
    from mcjax.models.mixtures import HardSphereMixture

    cfg = SimConfig(dim=2, n_atoms=16, box_length=12.0, cells_per_side=4,
                    nmax=6, n_moves=1, proposal="uniform", step_size=0.1,
                    beta=1.0)
    st = _mixture_start(cfg, seed=3)
    pot = HardSphereMixture(diameter=((1.0, 0.8), (0.8, 0.6)))
    with pytest.raises(ValueError):
        gcmc.run_gcmc(cfg, pot, st, jnp.array([0.3, 0.3]), 2, 4,
                      checkerboard=False)


def test_gcmc_cb_requires_checkerboard():
    import pytest

    cfg = SimConfig(dim=2, n_atoms=16, box_length=12.0, cells_per_side=4,
                    nmax=6, n_moves=1, proposal="uniform", step_size=0.1,
                    beta=1.0)
    st = init_state(cfg)
    with pytest.raises(ValueError):
        gcmc.run_gcmc(cfg, HardSphere(1.0), st, 0.3, 2, 1,
                      checkerboard=False, n_trials=4)
