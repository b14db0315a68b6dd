"""Geometric cluster algorithm (ops/cluster.py) — parity vs brute-force BFS,
hard-core invariants, mixtures, and the mixed sweep/cluster schedule.

The reference has no cluster moves at all; the oracle here is an O(N^2)
numpy BFS implementing the textbook Dress-Krauth recruitment rule with
minimum-image distances.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.mixtures import HardSphereMixture
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops import cells
from mcjax.ops.cluster import gca_move, run_cluster_mix
from mcjax.ops.mixture import init_mixture_state


def _hard_disk_cfg(n=64, phi=0.35, nmax=8, seed=0):
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=nmax, n_moves=2, proposal="uniform",
                    step_size=0.15, beta=1.0, seed=seed)
    pot = HardSphere(1.0)
    cfg.validate_against(pot.r_cut)
    return cfg, pot


def _equilibrate(cfg, pot, sweeps=30):
    from mcjax.ops.sweep import run_sweeps

    state = init_state(cfg, positions=cells.stratified_positions(
        cfg, min_separation=1.0))
    state, _ = run_sweeps(cfg, pot, state, sweeps)
    return state


def _min_image(d, L):
    return d - L * np.round(d / L)


def _bruteforce_cluster(coords, pivot, seed_id, diam, L):
    """Textbook BFS: j joins when a cluster member's reflection overlaps it."""
    n = coords.shape[0]
    img = 2.0 * pivot - coords          # min-image handles the wrap
    in_c = np.zeros(n, bool)
    in_c[seed_id] = True
    frontier = [seed_id]
    while frontier:
        nxt = []
        for i in frontier:
            d = _min_image(img[i][None] - coords, L)
            hit = (d ** 2).sum(1) < diam ** 2
            for j in np.nonzero(hit & ~in_c)[0]:
                in_c[j] = True
                nxt.append(j)
        frontier = nxt
    return in_c


def _pair_dist2(coords, L):
    d = _min_image(coords[None] - coords[:, None], L)
    r2 = (d ** 2).sum(-1)
    np.fill_diagonal(r2, np.inf)
    return r2


def test_gca_matches_bruteforce():
    cfg, pot = _hard_disk_cfg(n=64, phi=0.40)
    state = _equilibrate(cfg, pot)
    L = cfg.box_length

    for trial in range(4):
        key = jax.random.key(100 + trial)
        # replicate gca_move's internal draws to drive the numpy oracle
        _ksalt, kp, ks = jax.random.split(key, 3)
        pivot = np.asarray(jax.random.uniform(
            kp, (2,), jnp.float32, -L / 2.0, L / 2.0))
        seed_id = int(jax.random.randint(ks, (), 0, cfg.n_atoms))

        before = np.asarray(cells.unbin(cfg, state.pos, state.occ))
        expect_in = _bruteforce_cluster(before, pivot, seed_id, 1.0, L)
        expect = before.copy()
        expect[expect_in] = _min_image(2.0 * pivot - expect[expect_in], L)
        # wrap into [-L/2, L/2) to compare against the slab state
        expect = (expect + L / 2.0) % L - L / 2.0

        state, size = gca_move(cfg, pot, state, key)
        assert int(size) == int(expect_in.sum())
        after = np.asarray(cells.unbin(cfg, state.pos, state.occ))
        # unbin order is cell-major, not particle id — compare as point sets
        np.testing.assert_allclose(
            np.sort(after.round(4), axis=0),
            np.sort(expect.astype(np.float32).round(4), axis=0), atol=2e-4)


def test_gca_invariants_many_moves():
    cfg, pot = _hard_disk_cfg(n=96, phi=0.45, nmax=8)
    state = _equilibrate(cfg, pot)
    key = jax.random.key(7)
    sizes = []
    for _ in range(8):
        key, kc = jax.random.split(key)
        state, size = gca_move(cfg, pot, state, kc)
        sizes.append(int(size))
    assert int(jnp.sum(state.occ)) == cfg.n_atoms
    assert not bool(state.overflow)
    coords = np.asarray(cells.unbin(cfg, state.pos, state.occ))
    assert _pair_dist2(coords, cfg.box_length).min() >= 1.0 - 1e-5
    assert min(sizes) >= 1  # the seed itself always moves


def _mix32_np(x):
    x = np.uint32(x)
    x ^= x >> np.uint32(16)
    x = np.uint32(x * np.uint32(0x85EBCA6B))
    x ^= x >> np.uint32(13)
    x = np.uint32(x * np.uint32(0xC2B2AE35))
    x ^= x >> np.uint32(16)
    return x


def _pair_uniform_np(salt, i, j):
    a, b = np.uint32(min(i, j)), np.uint32(max(i, j))
    h = _mix32_np(a ^ np.uint32(salt[0]))
    h = _mix32_np(np.uint32(h + np.uint32(b * np.uint32(0x9E3779B9)))
                  ^ np.uint32(salt[1]))
    return float(h >> np.uint32(8)) / float(1 << 24)


def test_liu_luijten_matches_bruteforce():
    """Energetic (LJ) cluster move == numpy BFS over the SAME bond
    realization (shared symmetric pair-uniform hash)."""
    import warnings
    warnings.filterwarnings("ignore", "overflow")
    n, rho, T = 48, 0.4, 2.0
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    pot = LennardJones(r_cut=2.5)
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=2, proposal="gaussian", step_size=0.15,
                    beta=1.0 / T, seed=3)
    cfg.validate_against(pot.r_cut)
    from mcjax.ops.sweep import run_sweeps

    state = init_state(cfg, positions=cells.stratified_positions(cfg))
    state, _ = run_sweeps(cfg, pot, state, 20)
    L = cfg.box_length

    for trial in range(3):
        key = jax.random.key(500 + trial)
        ksalt, kp, ks = jax.random.split(key, 3)
        salt = np.asarray(jax.random.bits(ksalt, (2,), jnp.uint32))
        pivot = np.asarray(jax.random.uniform(
            kp, (2,), jnp.float32, -L / 2.0, L / 2.0))
        seed_id = int(jax.random.randint(ks, (), 0, n))

        before = np.asarray(cells.unbin(cfg, state.pos, state.occ))

        def pair_e(r2):
            return float(pot.pair_energy(jnp.float32(r2)))

        img = 2.0 * pivot - before
        in_c = np.zeros(n, bool)
        in_c[seed_id] = True
        frontier = [seed_id]
        while frontier:
            nxt = []
            for i in frontier:
                for j in range(n):
                    if in_c[j]:
                        continue
                    dn = _min_image(img[i] - before[j], L).astype(np.float32)
                    do = _min_image(before[i] - before[j], L
                                    ).astype(np.float32)
                    de = (pair_e(float((dn ** 2).sum()))
                          - pair_e(float((do ** 2).sum())))
                    p = -math.expm1(-cfg.beta * max(de, 0.0))
                    if _pair_uniform_np(salt, i, j) < p:
                        in_c[j] = True
                        nxt.append(j)
            frontier = nxt
        expect = before.copy()
        expect[in_c] = _min_image(2.0 * pivot - expect[in_c], L)
        expect = (expect + L / 2.0) % L - L / 2.0

        state, size = gca_move(cfg, pot, state, key)
        assert int(size) == int(in_c.sum()), f"trial {trial}"
        after = np.asarray(cells.unbin(cfg, state.pos, state.occ))
        np.testing.assert_allclose(
            np.sort(after.round(4), axis=0),
            np.sort(expect.astype(np.float32).round(4), axis=0), atol=2e-4)


@pytest.mark.slow
def test_liu_luijten_preserves_equilibrium():
    """Mean LJ energy with interleaved cluster moves == sweeps-only, within
    combined statistical error (the standard detailed-balance check)."""
    n, rho, T = 64, 0.5, 1.5
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 2
    pot = LennardJones(r_cut=2.5)
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=4, proposal="gaussian", step_size=0.12,
                    beta=1.0 / T, seed=9)
    from mcjax.ops.sweep import run_sweeps, total_energy_cells

    def mean_e(with_clusters, seed, rounds=60, burn=20):
        st = init_state(cfg, seed=seed,
                        positions=cells.stratified_positions(cfg))
        st, _ = run_sweeps(cfg, pot, st, 40)  # equilibrate
        es = []
        for r in range(rounds):
            if with_clusters:
                st, _ = run_cluster_mix(cfg, pot, st, n_rounds=1,
                                        sweeps_per_round=4,
                                        clusters_per_round=2)
            else:
                st, _ = run_sweeps(cfg, pot, st, 4)
            if r >= burn:
                es.append(float(total_energy_cells(cfg, pot, st.pos,
                                                   st.occ)))
        es = np.array(es)
        return es.mean(), es.std() / math.sqrt(len(es))

    m0, s0 = mean_e(False, seed=1)
    m1, s1 = mean_e(True, seed=2)
    assert abs(m0 - m1) < 4.0 * math.hypot(s0, s1) + 0.02 * abs(m0), \
        f"sweeps-only {m0:.3f}+-{s0:.3f} vs clusters {m1:.3f}+-{s1:.3f}"


def test_gca_mixture_species_conserved():
    n = 60
    pot = HardSphereMixture(diameter=((1.0, 0.85), (0.85, 0.7)))
    phi_eff = 0.30
    box = math.sqrt(n * math.pi * 1.0 / 4.0 / phi_eff)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0, seed=1)
    spec = (jnp.arange(n) % 3 == 0).astype(jnp.int32)  # 1/3 small
    state = init_mixture_state(
        cfg, cells.stratified_positions(cfg, min_separation=1.0), spec)

    key = jax.random.key(11)
    n_small_before = int(jnp.sum(spec))
    for _ in range(5):
        key, kc = jax.random.split(key)
        state, _ = gca_move(cfg, pot, state, kc)
    out = np.asarray(cells.unbin(cfg, state.pos, state.occ))
    assert out.shape[1] == 3  # x, y, species plane rides along
    assert int(out[:, 2].round().sum()) == n_small_before
    # per-pair contact distances respected
    coords, sp = out[:, :2], out[:, 2].round().astype(int)
    d = _min_image(coords[None] - coords[:, None], cfg.box_length)
    r = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(r, np.inf)
    dmat = np.array([[1.0, 0.85], [0.85, 0.7]])
    assert (r >= dmat[sp[:, None], sp[None]] - 1e-5).all()


# ---- sharded cluster moves (virtual CPU mesh) -------------------------------

def _make_mesh(shape, names):
    import numpy as _np
    devs = _np.array(jax.devices()[: math.prod(shape)]).reshape(shape)
    from jax.sharding import Mesh
    return Mesh(devs, names)


def _mesh_cfg(n=256, phi=0.42, nmax=8, seed=0):
    """Hard-disk config whose half-grid divides a 2x2 spatial mesh."""
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 4                       # half_cps divisible by 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=nmax, n_moves=2, proposal="uniform",
                    step_size=0.15, beta=1.0, seed=seed)
    pot = HardSphere(1.0)
    cfg.validate_against(pot.r_cut)
    return cfg, pot


def test_gca_sharded_matches_single():
    """Sharded growth (halo stacks + per-round flag pmax) is bitwise equal
    to the single-chip move: the label-propagation closure is
    partition-invariant and all float ops are identical."""
    from mcjax.parallel import mesh as pmesh
    from mcjax.parallel.cluster import make_gca_move_sharded

    cfg, pot = _mesh_cfg()
    state = _equilibrate(cfg, pot, sweeps=15)
    m = _make_mesh((2, 2), ("y", "x"))
    move = make_gca_move_sharded(cfg, pot, m, ("y", "x"))
    st_sh = pmesh.shard_state(cfg, state, m, ("y", "x"))

    for trial in range(3):
        key = jax.random.key(40 + trial)
        ref, ref_size = gca_move(cfg, pot, state, key)
        got, got_size = move(st_sh, key)
        assert int(got_size) == int(ref_size)
        np.testing.assert_array_equal(np.asarray(got.pos),
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(got.occ),
                                      np.asarray(ref.occ))
        state, st_sh = ref, got
    assert int(jnp.sum(state.occ)) == cfg.n_atoms


def test_gca_sharded_energetic_matches_single():
    """Liu-Luijten (LJ) bonds ride the sharded path too — exercises the
    broken-old-bond real-slab halo stacks."""
    from mcjax.parallel import mesh as pmesh
    from mcjax.parallel.cluster import make_gca_move_sharded
    from mcjax.ops.sweep import run_sweeps

    n, rho, T = 128, 0.35, 2.0
    box = math.sqrt(n / rho)
    cps = int(box // 2.5)
    cps -= cps % 4
    pot = LennardJones(r_cut=2.5)
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=2, proposal="gaussian", step_size=0.15,
                    beta=1.0 / T, seed=4)
    cfg.validate_against(pot.r_cut)
    state = init_state(cfg, positions=cells.stratified_positions(cfg))
    state, _ = run_sweeps(cfg, pot, state, 10)

    m = _make_mesh((2, 2), ("y", "x"))
    move = make_gca_move_sharded(cfg, pot, m, ("y", "x"))
    st_sh = pmesh.shard_state(cfg, state, m, ("y", "x"))
    for trial in range(2):
        key = jax.random.key(70 + trial)
        ref, ref_size = gca_move(cfg, pot, state, key)
        got, got_size = move(st_sh, key)
        assert int(got_size) == int(ref_size)
        np.testing.assert_array_equal(np.asarray(got.pos),
                                      np.asarray(ref.pos))
        state, st_sh = ref, got


def test_sharded_cluster_mix_schedule():
    """Halo-sharded sweeps + sharded cluster moves compose; invariants hold
    and the state stays distributed."""
    from mcjax.parallel import mesh as pmesh
    from mcjax.parallel.cluster import make_sharded_cluster_mix

    cfg, pot = _mesh_cfg(n=192, phi=0.40)
    state = _equilibrate(cfg, pot, sweeps=10)
    m = _make_mesh((2, 2), ("y", "x"))
    step = make_sharded_cluster_mix(cfg, pot, m, ("y", "x"),
                                    sweeps_per_round=2,
                                    clusters_per_round=2)
    st = pmesh.shard_state(cfg, state, m, ("y", "x"))
    for _ in range(2):
        st, sizes = step(st)
        assert sizes.shape == (2,)
        assert (np.asarray(sizes) >= 1).all()
    assert int(jnp.sum(st.occ)) == cfg.n_atoms
    assert not bool(st.overflow)
    assert len(st.pos.sharding.device_set) == 4
    coords = np.asarray(cells.unbin(cfg, st.pos, st.occ))
    assert _pair_dist2(coords, cfg.box_length).min() >= 1.0 - 1e-5


def test_run_cluster_mix_schedule():
    cfg, pot = _hard_disk_cfg(n=64, phi=0.40)
    state = _equilibrate(cfg, pot, sweeps=10)
    state, sizes = run_cluster_mix(cfg, pot, state, n_rounds=3,
                                   sweeps_per_round=2, clusters_per_round=2)
    assert sizes.shape == (3, 2)
    assert int(jnp.sum(state.occ)) == cfg.n_atoms
    assert (np.asarray(sizes) >= 1).all()
    coords = np.asarray(cells.unbin(cfg, state.pos, state.occ))
    assert _pair_dist2(coords, cfg.box_length).min() >= 1.0 - 1e-5
