"""Fused Pallas grid-shift kernel (ergodicity restoration, hot path).

TPU-native replacement for the XLA cumsum merge in ``cells.shift_rebin``
(itself the re-design of the reference's single-block ``shiftCells`` kernel,
CUDA-Parallel-MC/.../shiftCells.h:23-112). The XLA merge is correct but
materializes O(nmax^2) full-grid selects through HBM (~2 ms/sweep at N=1M —
docs/PERF.md); here the whole merge runs register-resident per cell tile:

  * XLA prepares, per color, the *unshifted* own planes and the donor
    neighbor's planes/occupancy (one +-1 block roll of the source color —
    ``shift_fn``, so the same code paths work under shard_map halos), plus a
    my-cell-index plane; everything flattened to (rows, 128) lane tiles like
    the sweep kernel;
  * the kernel applies the coordinate shift x -> wrap(x - d) (bitwise the
    formula of ``geometry.wrap_into_box``), floor-bins the shifted axis
    coordinate, and performs the exhaustive two-slab claim of
    ``cells._shift_rebin_axis`` (receiver claims by exact floor equality,
    owner keeps everything unclaimed — no 1-ulp particle loss), compacting
    into the output slab with an in-register one-hot scatter;
  * outputs are bitwise identical to the XLA path (same op order per lane),
    so the engines stay cross-testable (tests/test_pallas_shift.py).

The traced shift axis / direction are handled exactly like the XLA path:
``lax.switch`` over static axes, ``lax.cond`` over the donor direction; the
shift distance d rides in SMEM.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcjax.core.config import SimConfig
from mcjax.ops import cells
from mcjax.ops.cells import ShiftFn, roll_shift_fn


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_shift_kernel(cfg: SimConfig, axis: int):
    """Merge kernel for a static shift axis: own + donor slabs -> new slab."""
    dim, nmax = cfg.dim, cfg.nmax
    w = cfg.cell_width
    box = cfg.box_length
    half = box / 2.0
    cps = cfg.cells_per_side

    def kernel(own_ref, donor_ref, own_occ_ref, don_occ_ref, myk_ref,
               scal_ref, out_ref, occ_ref, ovf_ref):
        d = scal_ref[0, 0]                       # shift distance (f32)
        ddir = scal_ref[1, 0].astype(jnp.int32)  # donor direction (+-1)
        my_k = myk_ref[0]
        recv_k = jnp.mod(my_k - ddir, cps)

        def shifted(x, is_axis):
            # bitwise wrap_into_box(x - delta): the XLA path subtracts a
            # delta vector that is 0 on non-shift axes and STILL re-wraps
            # every coordinate (cells._shift_rebin_axis), which can move a
            # value by 1 ulp — reproduce exactly, axis or not
            if is_axis:
                x = x - d
            return jnp.mod(x + half, box) - half

        for t in range(dim * nmax):
            out_ref[t] = jnp.zeros_like(out_ref[t])

        cnt = jnp.zeros(my_k.shape, jnp.int32)
        ovf = jnp.zeros(my_k.shape, jnp.bool_)

        def claim(src_ref, occ, is_own, cnt, ovf):
            for j in range(nmax):
                valid = j < occ
                xs = [shifted(src_ref[dd * nmax + j], dd == axis)
                      for dd in range(dim)]
                # reciprocal-multiply binning (NOT division): Mosaic and
                # XLA-TPU round f32 divides differently at cell boundaries
                # (round-5 micro-probe); mul is exactly rounded on both
                ck = jnp.floor((xs[axis] + half)
                               * jnp.float32(1.0 / w)).astype(jnp.int32)
                ck = jnp.clip(ck, 0, cps - 1)
                if is_own:
                    # exhaustive claim: owner keeps unless the receiver's
                    # exact-floor claim takes it (cells._shift_rebin_axis)
                    keep = valid & (ck != recv_k)
                else:
                    keep = valid & (ck == my_k)
                # own slot j can land at most at output slot j; donor slots
                # can land anywhere
                t_hi = min(j + 1, nmax) if is_own else nmax
                for t in range(t_hi):
                    hit = keep & (cnt == t)
                    for dd in range(dim):
                        out_ref[dd * nmax + t] = jnp.where(
                            hit, xs[dd], out_ref[dd * nmax + t])
                ovf = ovf | (keep & (cnt >= nmax))
                cnt = cnt + keep.astype(jnp.int32)
            return cnt, ovf

        cnt, ovf = claim(own_ref, own_occ_ref[0], True, cnt, ovf)
        cnt, ovf = claim(donor_ref, don_occ_ref[0], False, cnt, ovf)
        occ_ref[0] = jnp.minimum(cnt, nmax)  # overflow capped, like the XLA path
        ovf_ref[0] = ovf.astype(jnp.int32)

    return kernel


def pallas_shift_rebin(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
                       axis: jax.Array, d: jax.Array,
                       shift_fn: ShiftFn = roll_shift_fn,
                       block_offset: jax.Array | None = None,
                       *, tile_rows: int = 8, tile_cols: int = 128,
                       interpret: bool = False,
                       vma: tuple[str, ...] | None = None
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for cells.shift_rebin backed by the Pallas merge.

    Same signature/semantics (traced axis in [0, dim), traced d in
    (-w/2, w/2]); bitwise-equal outputs. Works per-shard under shard_map
    with a halo-aware shift_fn exactly like the sweep kernel.
    """
    dim, nmax = cfg.dim, cfg.nmax
    bs = occ.shape[1:]
    n_cells = math.prod(bs)
    cp = tile_cols
    padded = _round_up(max(n_cells, tile_rows * cp), tile_rows * cp)
    rp = padded // cp

    def to_tiles(x, lead, fill=0):
        x = x.reshape(x.shape[0], lead, n_cells)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, padded - n_cells)),
                    constant_values=fill)
        return x.reshape(x.shape[0], lead, rp, cp)

    def run_axis(axis_static: int, pos, occ, d):
        kernel = _make_shift_kernel(cfg, axis_static)
        grid = (cfg.n_colors, rp // tile_rows, cp // tile_cols)

        def build(donor_dir: int):
            donors, don_occs, myks = [], [], []
            for color in range(cfg.n_colors):
                o = cells.color_bits(color, dim)
                t = o[axis_static] + donor_dir
                src = color ^ (1 << axis_static)
                shifts = [0] * dim
                shifts[axis_static] = t >> 1
                donors.append(shift_fn(pos[src], shifts))
                don_occs.append(shift_fn(occ[src], shifts))
                bk = jax.lax.broadcasted_iota(jnp.int32, bs, axis_static)
                if block_offset is not None:
                    bk = bk + block_offset[axis_static]
                myks.append(2 * bk + o[axis_static])
            donor = jnp.stack(donors)                   # [colors,dim,nmax,*bs]
            don_occ = jnp.stack(don_occs)
            myk = jnp.stack(myks)
            # scalars: [d, donor_dir] in SMEM
            scal = jnp.stack([d.astype(jnp.float32),
                              jnp.float32(donor_dir)]).reshape(2, 1)

            own_p = to_tiles(pos.reshape(cfg.n_colors, dim * nmax, *bs),
                             dim * nmax)
            don_p = to_tiles(donor.reshape(cfg.n_colors, dim * nmax, *bs),
                             dim * nmax)
            occ_p = to_tiles(occ[:, None], 1)
            docc_p = to_tiles(don_occ[:, None], 1)
            # pad my_k with -1 so padded lanes never claim anything
            myk_p = to_tiles(myk[:, None], 1, fill=-1)

            def bspec(lead):
                return pl.BlockSpec((1, lead, tile_rows, tile_cols),
                                    lambda c, i, j: (c, 0, i, j),
                                    memory_space=pltpu.VMEM)

            vma_set = frozenset(vma) if vma else None
            out_shapes = (
                jax.ShapeDtypeStruct((cfg.n_colors, dim * nmax, rp, cp),
                                     jnp.float32, vma=vma_set),
                jax.ShapeDtypeStruct((cfg.n_colors, 1, rp, cp), jnp.int32,
                                     vma=vma_set),
                jax.ShapeDtypeStruct((cfg.n_colors, 1, rp, cp), jnp.int32,
                                     vma=vma_set),
            )

            def kernel_wrap(own, donr, oo, doo, mk, sc, out, oc, ov):
                kernel(own.at[0], donr.at[0], oo.at[0], doo.at[0], mk.at[0],
                       sc, out.at[0], oc.at[0], ov.at[0])

            out_p, occ_out_p, ovf_p = pl.pallas_call(
                kernel_wrap,
                grid=grid,
                in_specs=[bspec(dim * nmax), bspec(dim * nmax), bspec(1),
                          bspec(1), bspec(1),
                          pl.BlockSpec((2, 1), lambda c, i, j: (0, 0),
                                       memory_space=pltpu.SMEM)],
                out_specs=(bspec(dim * nmax), bspec(1), bspec(1)),
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(own_p, don_p, occ_p, docc_p, myk_p, scal)

            new_pos = out_p.reshape(cfg.n_colors, dim * nmax, padded)
            new_pos = new_pos[:, :, :n_cells].reshape(
                cfg.n_colors, dim, nmax, *bs)
            new_occ = occ_out_p.reshape(cfg.n_colors, padded)[:, :n_cells]
            new_occ = new_occ.reshape(cfg.n_colors, *bs)
            overflow = jnp.sum(ovf_p) > 0
            return new_pos, new_occ, overflow

        return jax.lax.cond(d > 0, lambda: build(+1), lambda: build(-1))

    branches = [partial(run_axis, k) for k in range(cfg.dim)]
    return jax.lax.switch(axis, branches, pos, occ, d)
