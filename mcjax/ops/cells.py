"""Cell-list machinery on color-blocked slabs.

TPU-native replacements for the reference's cell-list components
(SURVEY.md §2 C2-C4, C7, C11-helpers):

* ``lattice_positions``   <- ``init_r`` (kernel.cu:78-89)
* ``bin_particles``       <- ``assign`` (kernel.cu:92-150); vectorized
  sort-based binning with an explicit capacity check instead of the
  reference's unchecked slab writes (kernel.cu:137-145, SURVEY.md Q7)
* ``neighbor_stack``      <- ``make_nl`` + the shared-memory 27-cell gather
  (kernel.cu:46-75, 270-279); with color-blocked slabs the static neighbor
  table disappears entirely — every neighbor is a ±1 shifted read of another
  color block (``jnp.roll`` single-chip, halo ``ppermute`` on a mesh)
* ``shift_rebin``         <- ``shiftCells`` (CUDA-Parallel-MC/.../shiftCells.h:23-112);
  the random grid shift that restores ergodicity becomes "shift all particle
  coordinates by -d along one axis, then merge each cell's slab with its
  donor neighbor's slab" — a masked two-slab merge, trivially parallel over
  all cells and all colors at once (the reference version is a single CUDA
  block and cannot scale past 1024 cells)
* ``unbin``               <- ``disk_to_r`` (kernel.cu:497-507)

Cell indexing convention: coordinate x_k in [-L/2, L/2); cell index
c_k = floor((x_k + L/2)/w); parity bit o_k = c_k & 1; block index b_k = c_k >> 1;
color id = sum_k o_k << k. State arrays are in *coordinate-planes* layout:

    pos[color, dim, nmax, b_0, ..., b_{dim-1}]     occ[color, b_0, ..., b_{dim-1}]

i.e. the cell grid occupies the TRAILING axes (the TPU lane/sublane dims), so
every bulk operation is an elementwise op across cells at full vector width;
trailing spatial axis k matches coordinate component k. (A [..., nmax, dim]
orientation would run the VPU at dim/128 lane occupancy.)
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.geometry import wrap_into_box

# A shift function applies a static per-axis cell shift to a color block whose
# TRAILING len(shifts) axes are the spatial cell grid (works for pos blocks
# [dim, nmax, *bs] and occ blocks [*bs] alike). Single-chip default is
# jnp.roll; the mesh layer substitutes a halo-exchange version
# (mcjax.parallel.mesh.make_halo_shift_fn).
ShiftFn = Callable[[jax.Array, Sequence[int]], jax.Array]


def roll_shift_fn(block: jax.Array, shifts: Sequence[int]) -> jax.Array:
    """Read block at cell offset ``shifts``: out[b] = block[b + shifts] (PBC)."""
    dim = len(shifts)
    for ax, s in enumerate(shifts):
        if s:
            block = jnp.roll(block, -s, axis=ax - dim)
    return block


def color_bits(color: int, dim: int) -> tuple[int, ...]:
    return tuple((color >> k) & 1 for k in range(dim))


def neighbor_offsets(dim: int, include_center: bool = False) -> list[tuple[int, ...]]:
    """The 3^dim cell offsets (reference neighbor table order is its own raster,
    kernel.cu:56-71; ours is lexicographic over (-1,0,1)^dim)."""
    offs = list(itertools.product((-1, 0, 1), repeat=dim))
    if not include_center:
        offs = [o for o in offs if any(o)]
    return offs


def neighbor_plan(dim: int, color: int,
                  include_center: bool = False) -> list[tuple[int, tuple[int, ...]]]:
    """Static plan: for each neighbor offset of a color-``color`` cell, which
    color block to read and at what block shift.

    For active cell (o, b) and offset d: t_k = o_k + d_k; source color bit
    o'_k = t_k & 1; block shift s_k = t_k >> 1 (floor). Every non-zero offset
    lands in a *different* color, so neighbor blocks are frozen during a
    color sub-sweep — the checkerboard guarantee (pptx slides 7-8) by
    construction.
    """
    o = color_bits(color, dim)
    plan = []
    for off in neighbor_offsets(dim, include_center):
        t = [o[k] + off[k] for k in range(dim)]
        src_color = sum((t[k] & 1) << k for k in range(dim))
        shifts = tuple(t[k] >> 1 for k in range(dim))
        plan.append((src_color, shifts))
    return plan


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def lattice_positions(cfg: SimConfig) -> jax.Array:
    """Uniform cubic/square lattice, the reference's ``init_r`` placement:
    r_k(i) = L/2 (1 - (2 i_k + 1)/m) with m = ceil(N^(1/dim)) (kernel.cu:85-87).
    """
    m = int(np.ceil(cfg.n_atoms ** (1.0 / cfg.dim) - 1e-9))
    idx = np.arange(cfg.n_atoms)
    coords = []
    for k in range(cfg.dim):
        ik = (idx // m**k) % m
        coords.append(cfg.box_length / 2.0 * (1.0 - (2.0 * ik + 1.0) / m))
    return jnp.asarray(np.stack(coords, axis=-1), jnp.float32)


def stratified_positions(cfg: SimConfig,
                         min_separation: float | None = None) -> jax.Array:
    """Cell-stratified initial configuration: every cell gets
    floor(N/cells) or ceil(N/cells) atoms, placed on a small sub-grid
    inside the cell.

    The reference's cubic lattice (init_r, kernel.cu:78-89) aliases against
    the cell grid — a cell can cover ceil(w/a)^dim lattice planes, giving
    t=0 occupancies up to ~2x the equilibrium mean and forcing nmax (and
    with it the kernel's pair-slot count) to be sized for a transient.
    Stratified placement bounds occupancy at ceil(N/cells) from sweep 0,
    so nmax can track the *equilibrium* occupancy: at rho=0.8 3D LJ this
    cuts nmax 30 -> 20 (a 1.5x kernel-throughput lever). Nearest cross-cell
    spacing is w/m (m = sub-grid side), finite LJ energy; the dE-anchored
    energy trace is exact from any valid configuration.

    The ceil-count cells are spread evenly through the (row-major) cell
    order so there is no density gradient across the box.

    ``min_separation``: for hard-core models pass the largest contact
    distance — the nearest cross-cell spacing is w/m (m = sub-grid side),
    and an overlapping start would silently violate the never-overlapping
    invariant downstream (ADVICE r2); raises if w/m <= min_separation.
    """
    dim, n = cfg.dim, cfg.n_atoms
    cps = cfg.cells_per_side
    n_cells = cps ** dim
    w = cfg.cell_width
    base, rem = divmod(n, n_cells)
    if base + (1 if rem else 0) > cfg.nmax:
        raise ValueError(f"stratified init needs nmax >= ceil(N/cells) = "
                         f"{base + (1 if rem else 0)}, got {cfg.nmax}")
    counts = np.full((n_cells,), base, np.int32)
    if rem:
        counts[np.round(np.linspace(0, n_cells - 1, rem)).astype(int)] += 1
    m = int(np.ceil((base + (1 if rem else 0)) ** (1.0 / dim) - 1e-9))
    m = max(m, 1)
    if min_separation is not None and w / m <= min_separation:
        raise ValueError(
            f"stratified sub-grid spacing w/m = {w / m:.4f} <= "
            f"min_separation {min_separation}: hard-core start would "
            "overlap; lower the density or use a close-packed initializer")
    # first `count` points of the per-cell m^dim raster, centered in sub-cells
    sub = np.stack(np.meshgrid(*([np.arange(m)] * dim), indexing="ij"),
                   axis=-1).reshape(-1, dim)  # [m^dim, dim]
    cell_idx = np.repeat(np.arange(n_cells), counts)
    slot_in_cell = np.arange(n) - np.repeat(
        np.cumsum(counts) - counts, counts)
    cid = np.stack([(cell_idx // cps**k) % cps
                    for k in range(dim - 1, -1, -1)], axis=-1)  # [N, dim]
    pos = (cid * w - cfg.box_length / 2.0
           + (sub[slot_in_cell] + 0.5) * (w / m))
    return jnp.asarray(pos, jnp.float32)


def triangular_rows(n_atoms: int, box_length: float,
                    diameter: float = 1.0) -> tuple[int, int]:
    """Pick (nx, ny) for a near-unstrained triangular lattice of ``n_atoms``
    in a square periodic box: nx columns x ny rows with nx*ny == n_atoms and
    ny even (PBC needs an even number of offset rows). Searches near the
    ideal aspect ratio and raises if n_atoms has no suitable factorization
    within 10% strain (pick n = nx*ny up front for melting studies)."""
    import math as _m

    area = box_length * box_length / n_atoms      # per particle: a^2 sqrt3/2
    a = _m.sqrt(area / (_m.sqrt(3.0) / 2.0))
    nx_ideal = box_length / a
    best = None
    for dnx in range(int(0.1 * nx_ideal) + 2):
        for nx in {round(nx_ideal) - dnx, round(nx_ideal) + dnx}:
            if nx < 2 or n_atoms % nx:
                continue
            ny = n_atoms // nx
            if ny % 2 or ny < 2:
                continue
            best = (nx, ny)
            break
        if best:
            break
    if best is None:
        raise ValueError(
            f"n_atoms={n_atoms} has no nx*ny factorization with even ny "
            f"within 10% of the ideal triangular aspect (nx ~ {nx_ideal:.1f})"
            "; choose n_atoms = nx*ny up front")
    return best


def triangular_lattice_positions(cfg: SimConfig,
                                 diameter: float = 1.0) -> jax.Array:
    """2D triangular (close-packed) lattice filling the periodic box — the
    solid-branch initial condition for the hard-disk melting study.

    The reference only ever starts from a square lattice (init_r,
    kernel.cu:78-89), which at phi ~ 0.7 is ~100x of equilibration away from
    the solid; seeding the solid branch directly resolves the transition
    (VERDICT r1 Missing #6; Bernard & Krauth PRL 107, 155704).

    Raises if the resulting lattice has overlapping disks (density above the
    strained-lattice limit for this n_atoms factorization).
    """
    assert cfg.dim == 2, "triangular lattice is the 2D close packing"
    n, L = cfg.n_atoms, cfg.box_length
    nx, ny = triangular_rows(n, L, diameter)
    ax, dy = L / nx, L / ny
    j = np.arange(n) // nx                        # row
    i = np.arange(n) % nx                         # column
    x = -L / 2.0 + (i + 0.25 + 0.5 * (j % 2)) * ax
    y = -L / 2.0 + (j + 0.5) * dy
    d_min = min(ax, float(np.hypot(ax / 2.0, dy)))
    if d_min <= diameter:
        raise ValueError(
            f"triangular lattice (nx={nx}, ny={ny}) has nearest-neighbor "
            f"distance {d_min:.4f} <= diameter {diameter}: density too high "
            "for this factorization's strain")
    return jnp.asarray(np.stack([x, y], axis=-1), jnp.float32)


# ---------------------------------------------------------------------------
# Binning
# ---------------------------------------------------------------------------

def cell_coords(cfg: SimConfig, positions: jax.Array) -> jax.Array:
    """Integer cell index per axis, [N, dim], for coords in [-L/2, L/2)."""
    w = cfg.cell_width
    c = jnp.floor((positions + cfg.box_length / 2.0) / w).astype(jnp.int32)
    return jnp.clip(c, 0, cfg.cells_per_side - 1)


def _flat_slot(cfg: SimConfig, c: jax.Array) -> jax.Array:
    """Flatten (color, block) of per-axis cell indices c [N, dim] into one id
    laid out exactly like pos.reshape(ncolors * cells_per_color, ...)."""
    o = c & 1
    b = c >> 1
    color = jnp.zeros(c.shape[:-1], jnp.int32)
    blk = jnp.zeros(c.shape[:-1], jnp.int32)
    for k in range(cfg.dim):
        color = color + (o[..., k] << k)
        blk = blk * cfg.half_cps + b[..., k]  # row-major over spatial axes
    return color * cfg.cells_per_color + blk


def bin_particles(cfg: SimConfig, positions: jax.Array,
                  extra: jax.Array | None = None
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Scatter [N, dim] positions into color-blocked slabs.

    Replaces the reference ``assign`` kernel's O(cells x N) race-free scan
    (kernel.cu:130-146) with a sort + ranked scatter: O(N log N), fully
    vectorized, and capacity-checked (overflowing particles are dropped and
    flagged instead of silently corrupting memory — SURVEY.md Q7).

    ``extra`` ([N, E] float) appends E per-particle attribute planes (e.g.
    species ids for mixtures) that ride along with the coordinates through
    every transport op (grid shift, neighbor reads) for free.

    Returns:
      pos [ncolors, dim (+E), nmax, *bs], occ [ncolors, *bs], overflow bool.
    """
    n = positions.shape[0]
    positions = wrap_into_box(positions, cfg.box_length)
    g = _flat_slot(cfg, cell_coords(cfg, positions))
    n_slots = cfg.n_colors * cfg.cells_per_color
    data = positions if extra is None else jnp.concatenate(
        [positions, jnp.asarray(extra, jnp.float32)], axis=1)
    n_planes = data.shape[1]

    order = jnp.argsort(g, stable=True)
    g_sorted = g[order]
    data_sorted = data[order]
    first = jnp.searchsorted(g_sorted, g_sorted, side="left")
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    slabs = jnp.zeros((n_slots, cfg.nmax, n_planes), jnp.float32)
    slabs = slabs.at[g_sorted, rank].set(data_sorted, mode="drop")
    occ = jnp.zeros((n_slots,), jnp.int32).at[g].add(1)
    overflow = jnp.any(occ > cfg.nmax)
    occ = jnp.minimum(occ, cfg.nmax)

    pos = slabs.reshape((cfg.n_colors, *cfg.block_shape, cfg.nmax, n_planes))
    # cold-path transpose into the canonical coordinate-planes layout
    pos = jnp.moveaxis(pos, (-1, -2), (1, 2))
    occ = occ.reshape((cfg.n_colors, *cfg.block_shape))
    return pos, occ, overflow


def unbin(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
          n_out: int | None = None) -> jax.Array:
    """Flatten slabs back to [n_out, dim (+E)] (deterministic slot order).

    Inverse of ``bin_particles``; the reference analogue is ``disk_to_r``
    (kernel.cu:497-507). ``n_out`` defaults to cfg.n_atoms; pass the current
    particle count for variable-N states (GCMC). Attribute planes beyond dim
    (mixtures) come back as trailing columns.
    """
    if n_out is None:
        n_out = cfg.n_atoms
    n_planes = pos.shape[1]
    pos = jnp.moveaxis(pos, (1, 2), (-1, -2))  # [colors, *bs, nmax, planes]
    flat_pos = pos.reshape((-1, cfg.nmax, n_planes)).reshape((-1, n_planes))
    valid = (jnp.arange(cfg.nmax)[None, :]
             < occ.reshape((-1,))[:, None]).reshape((-1,))
    idx = jnp.argsort(~valid, stable=True)[: n_out]
    return flat_pos[idx]


# ---------------------------------------------------------------------------
# Neighborhood access (replaces make_nl + shared-memory gather)
# ---------------------------------------------------------------------------

def neighbor_stack(cfg: SimConfig, pos: jax.Array, occ: jax.Array, color: int,
                   shift_fn: ShiftFn = roll_shift_fn,
                   block_offset: jax.Array | None = None,
                   unwrap: bool = True) -> tuple[jax.Array, jax.Array]:
    """All 3^dim - 1 neighbor slabs of every active cell of ``color``.

    Returns:
      nbr_pos [K, dim, nmax, *bs], nbr_occ [K, *bs] with K = 3^dim - 1.
    Frozen during the color's sub-sweep: every entry comes from a different
    color block (see neighbor_plan). This replaces the reference's static
    neighbor table + per-block shared-memory gather (kernel.cu:46-75, 270-279).

    With ``unwrap`` (default), coordinate plane k of a neighbor read whose
    block shift wrapped around the periodic box is pre-adjusted by ±L, so the
    neighbor's coordinates are *relative* to this side of the box and the
    sweep engines need no minimum-image arithmetic in their pair loops
    (|dx| <= 2w <= L/2 holds for cells_per_side >= 4). ``block_offset`` is
    the shard's global block offset (mesh runs), needed to locate the box
    edge.
    """
    dim = cfg.dim
    half = cfg.half_cps
    box = cfg.box_length
    plan = neighbor_plan(dim, color, include_center=False)
    bs = occ.shape[1:]
    edge_masks = {}
    if unwrap:
        for k in range(dim):
            bk = jax.lax.broadcasted_iota(jnp.int32, bs, k)
            if block_offset is not None:
                bk = bk + block_offset[k]
            edge_masks[(k, 1)] = (bk == half - 1).astype(jnp.float32)
            edge_masks[(k, -1)] = (bk == 0).astype(jnp.float32)
    ps, os_ = [], []
    for src_color, shifts in plan:
        nb = shift_fn(pos[src_color], shifts)
        if unwrap:
            for k in range(dim):
                s = shifts[k]
                if s:
                    adj = (s * box) * edge_masks[(k, s)]
                    nb = nb.at[k].add(adj[None])
        ps.append(nb)
        os_.append(shift_fn(occ[src_color], shifts))
    return jnp.stack(ps, axis=0), jnp.stack(os_, axis=0)


def _flat_wrap_masks_np(block_shape: tuple[int, ...]) -> dict:
    """Per-axis periodic-wrap masks on the row-major-flattened cell grid:
    mask[(k, +1)][i] is True where flat cell i sits on the high edge of axis k
    (its +1 neighbor wraps), mask[(k, -1)] the low edge. Host numpy — baked
    into the jaxpr as constants (~P bytes each)."""
    dim = len(block_shape)
    idx = np.indices(block_shape)
    masks = {}
    for k in range(dim):
        masks[(k, 1)] = (idx[k] == block_shape[k] - 1).reshape(-1)
        masks[(k, -1)] = (idx[k] == 0).reshape(-1)
    return masks


def _flat_lower_bounds_np(cfg: SimConfig, color: int) -> np.ndarray:
    """_cell_lower_bounds on the flattened cell grid, as a host constant
    [dim, P] (the flat sub-sweep path's per-cell lower corners)."""
    o = color_bits(color, cfg.dim)
    idx = np.indices(cfg.block_shape)                       # [dim, *bs]
    ck = 2 * idx + np.asarray(o).reshape((cfg.dim,) + (1,) * cfg.dim)
    lb = ck.astype(np.float32) * cfg.cell_width - cfg.box_length / 2.0
    return lb.reshape(cfg.dim, -1)


def flat_neighbor_stack(cfg: SimConfig, fpos: jax.Array, focc: jax.Array,
                        color: int) -> tuple[jax.Array, jax.Array]:
    """``neighbor_stack(unwrap=True)`` on the row-major-FLATTENED cell grid.

    Same values as the packed builder, but every operation runs at full lane
    occupancy: a block shift of +-1 along grid axis k becomes a flat roll by
    the axis stride, with the periodic wrap (and its +-L coordinate unwrap)
    patched in by a select on the precomputed edge mask. On lane-padded grids
    (3D: trailing dim ~21 is physically padded to 128 lanes) the packed
    builder + its to-tiles relayout cost ~6.4 ms per color substep at 1M
    atoms — ~85% of total 3D sweep time; this builder is ~10x cheaper.

    fpos: [n_colors, dim, nmax, P], focc: [n_colors, P] with
    P = cells_per_color flattened row-major over the block axes.
    Single-chip only (callers shard via the packed halo path).
    """
    dim, box = cfg.dim, cfg.box_length
    bs = cfg.block_shape
    strides = [int(np.prod(bs[k + 1:], dtype=np.int64)) for k in range(dim)]
    masks_np = _flat_wrap_masks_np(bs)
    masks = {key: jnp.asarray(m) for key, m in masks_np.items()}
    ps, os_ = [], []
    for src_color, shifts in neighbor_plan(dim, color):
        nb = fpos[src_color]                               # [dim, nmax, P]
        no = focc[src_color]                               # [P]
        for k in range(dim):
            s = shifts[k]
            if not s:
                continue
            S, g = strides[k], bs[k]
            m = masks[(k, s)]
            nb_wrap = jnp.roll(nb, s * (g - 1) * S, axis=-1)
            # neighbor read crossed the box edge along k: pre-unwrap its
            # k-coordinate planes by +-L (mirrors neighbor_stack's edge adj)
            nb_wrap = nb_wrap.at[k].add(jnp.float32(s * box))
            nb = jnp.where(m, nb_wrap, jnp.roll(nb, -s * S, axis=-1))
            no = jnp.where(m, jnp.roll(no, s * (g - 1) * S),
                           jnp.roll(no, -s * S))
        ps.append(nb)
        os_.append(no)
    return jnp.stack(ps), jnp.stack(os_)


# ---------------------------------------------------------------------------
# Grid shift (ergodicity restoration)
# ---------------------------------------------------------------------------

def _flat_block_shift(cfg: SimConfig, arr: jax.Array, axis: int,
                      s: int) -> jax.Array:
    """roll_shift_fn for one grid axis on the row-major-FLATTENED cell grid
    (same values as jnp.roll on the packed grid; no coordinate unwrap)."""
    if not s:
        return arr
    bs = cfg.block_shape
    S = int(np.prod(bs[axis + 1:], dtype=np.int64))
    g = bs[axis]
    m = jnp.asarray(_flat_wrap_masks_np(bs)[(axis, 1 if s > 0 else -1)])
    return jnp.where(m, jnp.roll(arr, s * (g - 1) * S, axis=-1),
                     jnp.roll(arr, -s * S, axis=-1))


def _shift_rebin_axis(cfg: SimConfig, axis: int, pos: jax.Array,
                      occ: jax.Array, d: jax.Array,
                      shift_fn: ShiftFn = roll_shift_fn,
                      block_offset: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Grid shift along a *static* axis by traced distance d in (-w/2, w/2].

    Semantics proven equivalent to the reference ``shiftCells``
    (shiftCells.h:23-112): shifting the cell grid by +d along axis f is the
    same as shifting every particle coordinate by -d (PBC-wrapped) and
    re-binning. Since |d| <= w/2 < w, a particle either stays in its cell or
    moves to the adjacent cell opposite the shift, so each cell's new slab is
    a masked merge of its own slab and one donor neighbor's slab.

    On lane-padded single-chip grids (3D) the merge runs in FLAT cell space —
    the packed cumsum-merge pays the ~6x lane padding of the (21,21,21)
    grid on every one of its ~2*nmax select passes (~4.7 ms of a 24.7 ms
    1M-atom sweep; flat is ~6x cheaper, same values).
    """
    w = cfg.cell_width
    dim = cfg.dim
    n_planes = pos.shape[1]          # dim, + any attribute planes (mixtures)
    bs_grid = occ.shape[1:]
    # rank < dim means the caller carries the state flat (run_sweeps_pallas)
    # and MUST take the flat branch — divisibility is not a flat marker (a
    # flat P can be a lane multiple: 2D 320x320 -> P=102400). For packed
    # input, go flat only when lane padding is heavy (>= 1.5x physical
    # blowup: all 3D grids; mildly-padded 2D grids keep the packed merge).
    pad = -(-bs_grid[-1] // 128) * 128 / bs_grid[-1]
    is_flat_input = len(bs_grid) < cfg.dim
    use_flat = ((is_flat_input or pad >= 1.5)
                and block_offset is None and shift_fn is roll_shift_fn)
    if use_flat:
        return _shift_rebin_axis_flat(cfg, axis, pos, occ, d)
    # Shift all coordinates: x_axis -> wrap(x_axis - d). Attribute planes
    # (delta 0) wrap harmlessly: species ids are in [0, S) << L/2.
    delta = jnp.zeros((n_planes,), pos.dtype).at[axis].set(d)
    delta = delta.reshape((1, n_planes, 1) + (1,) * dim)
    newpos = pos - delta
    # wrap the coordinate planes only (concatenate, not scatter: a
    # zero-dim scatter's empty index constant breaks shard_map vma checks)
    coords = wrap_into_box(newpos[:, :dim], cfg.box_length)
    newpos = (coords if n_planes == dim
              else jnp.concatenate([coords, newpos[:, dim:]], axis=1))

    def merge_for_color(color: int, donor_dir: int):
        o = color_bits(color, dim)
        t = o[axis] + donor_dir
        src_color = color ^ (1 << axis)  # parity flips along `axis`
        shifts = [0] * dim
        shifts[axis] = t >> 1
        ownp, own_o = newpos[color], occ[color]    # [dim, nmax, *bs], [*bs]
        donp = shift_fn(newpos[src_color], shifts)
        don_o = shift_fn(occ[src_color], shifts)
        nmax = cfg.nmax
        bs_local = own_o.shape

        # Compaction is a cumsum + one-hot select — no sort, no gather
        # (argsort-based compaction costs ~100ms/sweep at 1M particles on TPU).
        cand = jnp.concatenate([ownp, donp], axis=1)   # [dim, 2nmax, *bs]

        slot = jnp.arange(nmax).reshape((nmax,) + (1,) * len(bs_local))
        cand_valid = jnp.concatenate(
            [slot < own_o[None], slot < don_o[None]], axis=0)  # [2nmax, *bs]

        # Does candidate belong to this cell along `axis` after the shift?
        # Binning MULTIPLIES by the f32 reciprocal instead of dividing:
        # Mosaic and XLA-TPU lower f32 division differently (boundary
        # values round to different cells — the round-5 micro-probe found
        # 158/756 near-boundary mismatches, docs/PERF.md), while mul/add/
        # floor are exactly rounded on both, so every engine's shift stays
        # bitwise identical ON HARDWARE, not just in interpret mode.
        xk = cand[axis]                                # [2nmax, *bs]
        inv_w = jnp.float32(1.0 / w)
        cell_k = jnp.floor(
            (xk + cfg.box_length / 2.0) * inv_w).astype(jnp.int32)
        cell_k = jnp.clip(cell_k, 0, cfg.cells_per_side - 1)
        bk = jax.lax.broadcasted_iota(jnp.int32, bs_local, axis)
        if block_offset is not None:
            bk = bk + block_offset[axis]
        my_k = (2 * bk + o[axis])[None]
        # Exhaustive claim over the merge pair (no silent particle loss):
        # each particle appears as "own" in its old cell's merge and as
        # "donor" in the receiver's merge. The receiver (the cell particles
        # shift INTO, one step opposite the donor) claims by exact floor
        # equality; the owner keeps everything the receiver does not claim.
        # Requiring exact equality on BOTH sides would lose a particle
        # whenever f32 floor binning lands 1 ulp outside the {own, receiver}
        # pair (the sweep's lb-arithmetic cell bound can disagree with floor
        # binning in that window) — ADVICE r1.
        recv_k = jnp.mod(my_k - donor_dir, cfg.cells_per_side)
        own_half = (jnp.arange(2 * nmax) < nmax).reshape(
            (2 * nmax,) + (1,) * len(bs_local))
        belongs = cand_valid & jnp.where(own_half, cell_k != recv_k,
                                         cell_k == my_k)  # [2nmax, *bs]

        csum = jnp.cumsum(belongs.astype(jnp.int32), axis=0)
        dest = csum - 1                                # kept item -> out slot
        new_occ = csum[-1]
        out = jnp.zeros((n_planes, nmax) + bs_local, cand.dtype)
        for j in range(2 * nmax):
            hit = belongs[j][None] & (dest[j][None] == slot)   # [nmax, *bs]
            out = jnp.where(hit[None], cand[:, j][:, None], out)
        return out, new_occ

    def build(donor_dir: int):
        outs = [merge_for_color(c, donor_dir) for c in range(cfg.n_colors)]
        return (jnp.stack([p for p, _ in outs]),
                jnp.stack([oc for _, oc in outs]))

    # Donor direction is the sign of d; only one branch executes on device.
    pos_new, occ_new = jax.lax.cond(
        d > 0, lambda: build(+1), lambda: build(-1))
    overflow = jnp.any(occ_new > cfg.nmax)
    occ_new = jnp.minimum(occ_new, cfg.nmax)
    return pos_new, occ_new, overflow


def _shift_rebin_axis_flat(cfg: SimConfig, axis: int, pos: jax.Array,
                           occ: jax.Array, d: jax.Array
                           ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Flat-cell-space twin of the packed merge above (single chip, roll
    shifts only). Identical trajectories: same candidate order, same
    exhaustive claim rule, integer-exact cumsum compaction — only the cell
    axes are flattened row-major so every pass runs at full lane width."""
    w = cfg.cell_width
    dim, nmax = cfg.dim, cfg.nmax
    P = cfg.cells_per_color
    bs = cfg.block_shape
    n_planes = pos.shape[1]          # dim, + any attribute planes (mixtures)
    fpos = pos.reshape(cfg.n_colors, n_planes, nmax, P)
    focc = occ.reshape(cfg.n_colors, P)
    delta = jnp.zeros((n_planes,), pos.dtype).at[axis].set(d)
    fnew = fpos - delta.reshape(1, n_planes, 1, 1)
    fcoords = wrap_into_box(fnew[:, :dim], cfg.box_length)
    fnew = (fcoords if n_planes == dim
            else jnp.concatenate([fcoords, fnew[:, dim:]], axis=1))
    bk = jnp.asarray(np.indices(bs)[axis].reshape(-1))     # [P]
    slot = jnp.arange(nmax)[:, None]                       # [nmax, 1]

    def merge_for_color(color: int, donor_dir: int):
        o = color_bits(color, dim)
        t = o[axis] + donor_dir
        src_color = color ^ (1 << axis)
        s = t >> 1
        ownp, own_o = fnew[color], focc[color]
        donp = _flat_block_shift(cfg, fnew[src_color], axis, s)
        don_o = _flat_block_shift(cfg, focc[src_color], axis, s)
        cand = jnp.concatenate([ownp, donp], axis=1)       # [dim, 2nmax, P]
        cand_valid = jnp.concatenate(
            [slot < own_o[None], slot < don_o[None]], axis=0)
        xk = cand[axis]                                    # [2nmax, P]
        # reciprocal-multiply binning: see the packed merge's comment
        inv_w = jnp.float32(1.0 / w)
        cell_k = jnp.floor(
            (xk + cfg.box_length / 2.0) * inv_w).astype(jnp.int32)
        cell_k = jnp.clip(cell_k, 0, cfg.cells_per_side - 1)
        my_k = (2 * bk + o[axis])[None]
        recv_k = jnp.mod(my_k - donor_dir, cfg.cells_per_side)
        own_half = (jnp.arange(2 * nmax) < nmax)[:, None]
        belongs = cand_valid & jnp.where(own_half, cell_k != recv_k,
                                         cell_k == my_k)
        csum = jnp.cumsum(belongs.astype(jnp.int32), axis=0)
        dest = csum - 1
        new_occ = csum[-1]
        out = jnp.zeros((n_planes, nmax, P), cand.dtype)
        for j in range(2 * nmax):
            hit = belongs[j][None] & (dest[j][None] == slot)
            out = jnp.where(hit[None], cand[:, j][:, None], out)
        return out, new_occ

    def build(donor_dir: int):
        outs = [merge_for_color(c, donor_dir) for c in range(cfg.n_colors)]
        return (jnp.stack([p for p, _ in outs]),
                jnp.stack([oc for _, oc in outs]))

    pos_new, occ_new = jax.lax.cond(
        d > 0, lambda: build(+1), lambda: build(-1))
    overflow = jnp.any(occ_new > cfg.nmax)
    occ_new = jnp.minimum(occ_new, cfg.nmax)
    return pos_new.reshape(pos.shape), occ_new.reshape(occ.shape), overflow


def shift_rebin(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
                axis: jax.Array, d: jax.Array,
                shift_fn: ShiftFn = roll_shift_fn,
                block_offset: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Random grid shift: traced axis in [0, dim), traced d in (-w/2, w/2].

    The reference picks f = rand()%3 and d = rand()/RAND_MAX*w - w/2 on the
    host (kernel.cu:683-684); here the choice is traced so the whole sweep
    stays on device.
    """
    branches = [partial(_shift_rebin_axis, cfg, k, shift_fn=shift_fn,
                        block_offset=block_offset)
                for k in range(cfg.dim)]
    return jax.lax.switch(axis, branches, pos, occ, d)
