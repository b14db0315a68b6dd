"""Cell-list machinery tests: binning round-trip, neighbor plan correctness vs
brute force, grid-shift conservation (SURVEY.md §4 unit tier)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.ops import cells


def cfg3d(**kw):
    base = dict(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4, nmax=10)
    base.update(kw)
    return SimConfig(**base)


def cfg2d(**kw):
    base = dict(dim=2, n_atoms=64, box_length=8.0, cells_per_side=4, nmax=12)
    base.update(kw)
    return SimConfig(**base)


def sorted_rows(x):
    x = np.asarray(x)
    return x[np.lexsort(x.T)]


# ---- lattice ---------------------------------------------------------------

def test_lattice_positions_in_box_and_distinct():
    for cfg in (cfg3d(), cfg2d(n_atoms=49)):
        r = np.asarray(cells.lattice_positions(cfg))
        assert r.shape == (cfg.n_atoms, cfg.dim)
        assert (r >= -cfg.box_length / 2).all() and (r < cfg.box_length / 2).all()
        assert len(np.unique(r.round(6), axis=0)) == cfg.n_atoms


def test_lattice_matches_reference_formula():
    # r_k = L/2 (1 - (2 i_k + 1)/m)  (init_r, kernel.cu:85-87)
    cfg = cfg3d(n_atoms=8)
    r = np.asarray(cells.lattice_positions(cfg))
    m = 2
    expected = []
    for i in range(8):
        ix, iy, iz = i % m, (i // m) % m, (i // m**2) % m
        expected.append([5.0 * (1 - (2 * ix + 1) / m),
                         5.0 * (1 - (2 * iy + 1) / m),
                         5.0 * (1 - (2 * iz + 1) / m)])
    np.testing.assert_allclose(r, expected, atol=1e-6)


def test_triangular_lattice_solid_branch():
    # close-packed init for the melting study: overlap-free at phi=0.72 and
    # near-perfect |psi_6| (solid branch), unlike the square lattice
    import math

    from mcjax.core.state import init_state
    from mcjax.utils.observables import psi6_cells

    phi, n = 0.72, 64 * 66
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 2.0) - int(box // 2.0) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=4, proposal="uniform", step_size=0.05,
                    beta=1.0)
    p = np.asarray(cells.triangular_lattice_positions(cfg))
    assert p.shape == (n, 2)
    assert (p >= -box / 2).all() and (p < box / 2).all()
    d = p[:, None, :] - p[None, :, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d * d).sum(-1)) + np.eye(n) * 1e9
    assert r.min() > 1.0  # no overlapping disks at the melting density
    st = init_state(cfg, positions=jnp.asarray(p))
    assert not bool(st.overflow)
    assert float(psi6_cells(cfg, st.pos, st.occ, r_cut=1.3)) > 0.9
    with pytest.raises(ValueError, match="factorization"):
        cells.triangular_rows(1048577, 1000.0)  # prime-ish N: no (nx, even ny)


def test_stratified_positions_bound_occupancy():
    # occupancy is exactly floor/ceil(N/cells) from sweep 0 — the property
    # that lets nmax track the equilibrium fluid instead of the lattice
    # transient (bench lj3d nmax 30 -> 20)
    for cfg in (cfg3d(n_atoms=700, nmax=11),
                cfg2d(n_atoms=100, nmax=7),
                cfg3d(n_atoms=64, nmax=1)):
        r = np.asarray(cells.stratified_positions(cfg))
        assert r.shape == (cfg.n_atoms, cfg.dim)
        assert (r >= -cfg.box_length / 2).all() and (r < cfg.box_length / 2).all()
        assert len(np.unique(r.round(6), axis=0)) == cfg.n_atoms
        pos, occ, overflow = cells.bin_particles(cfg, jnp.asarray(r))
        assert not bool(overflow)
        n_cells = cfg.cells_per_side ** cfg.dim
        lo, hi = cfg.n_atoms // n_cells, -(-cfg.n_atoms // n_cells)
        occ = np.asarray(occ)
        assert occ.min() >= lo and occ.max() <= hi
        assert occ.sum() == cfg.n_atoms
    with pytest.raises(ValueError, match="nmax"):
        cells.stratified_positions(cfg3d(n_atoms=700, nmax=10))


def test_flat_builders_match_packed():
    # the flat-cell-space fast paths (3D lane-padding fix) must be bitwise
    # twins of the packed builders: same neighbor values, same shift merges
    packed_roll = lambda b, s: cells.roll_shift_fn(b, s)  # defeats flat guard
    for cfg in (cfg3d(n_atoms=500, nmax=8, cells_per_side=6),
                cfg2d(n_atoms=200, nmax=8, cells_per_side=8)):
        st_pos, st_occ, _ = cells.bin_particles(
            cfg, cells.stratified_positions(cfg))
        P = cfg.cells_per_color
        fpos = st_pos.reshape(cfg.n_colors, cfg.dim, cfg.nmax, P)
        focc = st_occ.reshape(cfg.n_colors, P)
        for color in range(cfg.n_colors):
            np_, no_ = cells.neighbor_stack(cfg, st_pos, st_occ, color)
            fp_, fo_ = cells.flat_neighbor_stack(cfg, fpos, focc, color)
            K = cfg.n_neighbors - 1
            assert np.array_equal(
                np.asarray(np_).reshape(K, cfg.dim, cfg.nmax, P),
                np.asarray(fp_))
            assert np.array_equal(np.asarray(no_).reshape(K, P),
                                  np.asarray(fo_))
        for axis in range(cfg.dim):
            for d in (0.31, -0.27):
                p1, o1, v1 = cells._shift_rebin_axis(
                    cfg, axis, st_pos, st_occ, jnp.float32(d),
                    shift_fn=packed_roll)
                p2, o2, v2 = cells._shift_rebin_axis_flat(
                    cfg, axis, st_pos, st_occ, jnp.float32(d))
                assert np.array_equal(np.asarray(p1), np.asarray(p2))
                assert np.array_equal(np.asarray(o1), np.asarray(o2))
                assert bool(v1) == bool(v2)


# ---- binning ---------------------------------------------------------------

def test_bin_unbin_roundtrip():
    for cfg in (cfg3d(), cfg2d()):
        key = jax.random.key(1)
        r = jax.random.uniform(key, (cfg.n_atoms, cfg.dim),
                               minval=-cfg.box_length / 2,
                               maxval=cfg.box_length / 2)
        pos, occ, ovf = cells.bin_particles(cfg, r)
        assert not bool(ovf)
        assert int(occ.sum()) == cfg.n_atoms
        back = cells.unbin(cfg, pos, occ)
        np.testing.assert_allclose(sorted_rows(back), sorted_rows(r), atol=1e-5)


def test_bin_slabs_hold_only_their_cell():
    cfg = cfg3d(n_atoms=200, nmax=30)
    r = jax.random.uniform(jax.random.key(2), (200, 3), minval=-5.0, maxval=5.0)
    pos, occ, _ = cells.bin_particles(cfg, r)
    w = cfg.cell_width
    pos_np, occ_np = np.asarray(pos), np.asarray(occ)
    for color in range(cfg.n_colors):
        o = cells.color_bits(color, cfg.dim)
        for b in itertools.product(range(cfg.half_cps), repeat=cfg.dim):
            cnt = occ_np[(color, *b)]
            # planes layout: pos[color, dim, nmax, *b]
            slab = pos_np[(color, slice(None), slice(None), *b)][:, :cnt]
            for k in range(cfg.dim):
                ck = 2 * b[k] + o[k]
                lo = ck * w - cfg.box_length / 2
                assert ((slab[k] >= lo) & (slab[k] < lo + w)).all()


def test_bin_overflow_flagged_and_dropped():
    cfg = cfg3d(n_atoms=50, nmax=4)
    r = jnp.zeros((50, 3)) + 0.1  # all in one cell; capacity 4
    pos, occ, ovf = cells.bin_particles(cfg, r)
    assert bool(ovf)
    assert int(occ.max()) == 4  # clamped, not corrupted (SURVEY.md Q7)


# ---- neighbor plan ----------------------------------------------------------

def brute_neighbor_cells(cps, dim, cell):
    out = set()
    for off in itertools.product((-1, 0, 1), repeat=dim):
        if not any(off):
            continue
        out.add(tuple((cell[k] + off[k]) % cps for k in range(dim)))
    return out


def test_neighbor_plan_covers_exact_ring():
    for dim, cps in ((2, 6), (3, 4)):
        half = cps // 2
        for color in range(2**dim):
            o = cells.color_bits(color, dim)
            plan = cells.neighbor_plan(dim, color)
            assert len(plan) == 3**dim - 1
            for b in itertools.product(range(half), repeat=dim):
                cell = tuple(2 * b[k] + o[k] for k in range(dim))
                got = set()
                for (src_color, shifts) in plan:
                    so = cells.color_bits(src_color, dim)
                    nb_block = tuple((b[k] + shifts[k]) % half
                                     for k in range(dim))
                    got.add(tuple(2 * nb_block[k] + so[k]
                                  for k in range(dim)))
                assert got == brute_neighbor_cells(cps, dim, cell), (
                    dim, cps, color, b)


def test_neighbor_plan_never_reads_own_color():
    # the checkerboard guarantee: all neighbors live in other color blocks
    for dim in (2, 3):
        for color in range(2**dim):
            for src, _ in cells.neighbor_plan(dim, color):
                assert src != color


def test_neighbor_stack_shapes_and_content():
    cfg = cfg2d(n_atoms=32)
    st = init_state(cfg)
    nbr_pos, nbr_occ = cells.neighbor_stack(cfg, st.pos, st.occ, color=0)
    assert nbr_pos.shape == (8, 2, cfg.nmax, 2, 2)
    assert nbr_occ.shape == (8, 2, 2)
    # particle counts conserved: each cell appears as neighbor exactly 8 times
    # in 2D across all colors' stacks
    total = sum(int(cells.neighbor_stack(cfg, st.pos, st.occ, c)[1].sum())
                for c in range(4))
    assert total == 8 * cfg.n_atoms


# ---- grid shift -------------------------------------------------------------

@pytest.mark.parametrize("dim", [2, 3])
def test_shift_rebin_conserves_and_matches_full_rebin(dim):
    cfg = cfg2d(n_atoms=80, nmax=20) if dim == 2 else cfg3d(n_atoms=150, nmax=20)
    r = jax.random.uniform(jax.random.key(5), (cfg.n_atoms, cfg.dim),
                           minval=-cfg.box_length / 2, maxval=cfg.box_length / 2)
    pos, occ, _ = cells.bin_particles(cfg, r)
    for axis in range(cfg.dim):
        for d in (0.9 * cfg.cell_width / 2, -0.7 * cfg.cell_width / 2, 0.0):
            p2, o2, ovf = cells.shift_rebin(cfg, pos, occ,
                                            jnp.int32(axis), jnp.float32(d))
            assert not bool(ovf)
            assert int(o2.sum()) == cfg.n_atoms
            got = cells.unbin(cfg, p2, o2)
            # expected: shift coordinates then full re-bin
            delta = np.zeros(cfg.dim, np.float32)
            delta[axis] = d
            from mcjax.core.geometry import wrap_into_box
            expected = wrap_into_box(r - delta, cfg.box_length)
            np.testing.assert_allclose(sorted_rows(got), sorted_rows(expected),
                                       atol=1e-5)


def test_shift_rebin_slabs_consistent_with_bins():
    cfg = cfg3d(n_atoms=100, nmax=25)
    r = jax.random.uniform(jax.random.key(7), (100, 3), minval=-5.0, maxval=5.0)
    pos, occ, _ = cells.bin_particles(cfg, r)
    p2, o2, _ = cells.shift_rebin(cfg, pos, occ, jnp.int32(1), jnp.float32(0.8))
    # rebinning the unbinned result must reproduce identical occupancy
    back = cells.unbin(cfg, p2, o2)
    p3, o3, _ = cells.bin_particles(cfg, back)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(o3))
