"""Ring-native IN-PLACE sub-sweep: one pallas_call per color sub-step with
ZERO XLA state shuffling between dispatches (round-4 VERDICT item 1).

The round-3 fused engine (ops/pallas_sweep.py run_sweeps_fused) still paid
~1.5 ms/sweep of XLA glue at the 2D 1M-disk n_M=8 operating point — more
than the kernel itself (loop-level ablations, docs/PERF.md round 4): the
lax.switch over per-color pallas_calls shuffled the 22 MB ring carry, each
sub-step sliced its color's planes out and ring-extended them back in, and
the grid shift round-tripped ring -> flat -> packed-merge -> ring.

Here the ring-extended state (ext3/exto3, see pallas_sweep._ring_state) is
the ONLY representation, and the kernel updates it IN PLACE:

  * ``ext3`` rides in as an ANY-space input aliased to the output
    (pl.pallas_call input_output_aliases) — no copies in, no copies out;
  * the active color is a TRACED SMEM scalar: own planes / occupancy /
    per-cell lower bounds are DMA'd from dynamic color-indexed rows (probed
    OK on TPU: dynamic leading index + dynamic row offset), so ONE compiled
    kernel serves every color — n_colors x fewer Mosaic compiles;
  * the per-color neighbor-window composition stays fully STATIC, guarded
    by pl.when(c == color): Mosaic faults at runtime on dynamic sublane
    slices of VMEM scratch (probed on this chip, docs/PERF.md round 4), so
    window extraction must keep static offsets — the branch bodies are the
    round-3 compose verbatim;
  * the updated tile is DMA'd back into the aliased ring at its own rows
    (tiles own disjoint rows; neighbor sources are always OTHER colors —
    any nonzero checkerboard offset flips a parity bit — so in-place
    updates have no intra-call hazard);
  * after the call, XLA refreshes only the two apron SLIVERS of that color
    (~100 KB) instead of rebuilding the whole ring (~11 MB concat).

Trajectories are BITWISE equal to run_sweeps_fused in both RNG modes: the
host-Threefry tensors are generated identically, and the in-kernel RNG
seeds/tile ids are unchanged (tests/test_pallas_ring.py).

Reference analogue: the 9-launch + 8-D2H host loop this collapses,
/root/reference/CUDA-Parallel-MC/CUDA-Parallel-MC/kernel.cu:652-701.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops import cells
from mcjax.ops import sweep as xla_sweep
from mcjax.ops.pallas_sweep import (_fused_geometry, _fused_masks_np,
                                    _make_kernel, _ring_geometry, _ring_one,
                                    _ring_state, _round_up, _unring_state)

# Dev-only fault-bisection knob for the shift kernel (compiled-Mosaic
# worker crashes cannot be debugged in-process — scripts/probe_ring_tpu.py
# runs one variant per subprocess):
#   branch — skip the per-(axis, dir, parity) branch bodies (zero-init the
#            scratch they would write); merge + output DMA still run
#   merge  — run the branches, replace the candidate-claim merge epilogue
#            with a passthrough copy of the own planes
_RING_ABLATE = os.environ.get("MCJAX_RING_ABLATE", "")


def _ring_views(cfg: SimConfig, ext3: jax.Array, exto3: jax.Array,
                tile_rows: int, tile_cols: int):
    """(fpos, focc) flat views [C, PN, P] / [C, P] of the ring state."""
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    C = cfg.n_colors
    PN = ext3.shape[1]
    fpos = ext3.reshape(C, PN, W)[..., M2:M2 + P]
    focc = exto3.reshape(C, W)[..., M2:M2 + P]
    return fpos, focc


def _use_sliver(cfg: SimConfig, tile_rows: int, tile_cols: int) -> bool:
    """True when the post-substep apron refresh can be two small slivers
    (single-wrap ring); tiny test grids multi-wrap and rebuild instead."""
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    l_tail = W - M2 - P
    return P >= M2 and l_tail <= P


def _mirror_in_kernel(cfg: SimConfig, tile_rows: int, tile_cols: int
                      ) -> bool:
    """True when the sub-step kernel can refresh the updated color's ring
    aprons ITSELF (two extra DMAs on the first/last grid tiles) so the
    caller skips the XLA sliver refresh entirely.  Requires the flat range
    to be tile-exact (padded == P: apron rows map 1:1 onto the first/last
    tile's own rows) and the aprons to fit inside one tile."""
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    r0 = M2 // 128
    return (padded == P and r0 + 1 <= tile_rows
            and _use_sliver(cfg, tile_rows, tile_cols))


def _refresh_color(cfg: SimConfig, ext3: jax.Array, c: jax.Array,
                   tile_rows: int, tile_cols: int) -> jax.Array:
    """Re-mirror color ``c``'s ring aprons from its (just updated) flat
    region.  ring[x] = flat[(x - M2) mod P], so head [0, M2) copies the
    W-range [P, P+M2) and tail [M2+P, W) copies [M2, M2 + (W-M2-P)) —
    ~100 KB instead of the 11 MB whole-ring rebuild (_ring_one)."""
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    C = cfg.n_colors
    PN = ext3.shape[1]
    v = ext3.reshape(C, PN, W)
    if _use_sliver(cfg, tile_rows, tile_cols):
        l_tail = W - M2 - P
        head = jax.lax.dynamic_slice(v, (c, 0, P), (1, PN, M2))
        v = jax.lax.dynamic_update_slice(v, head, (c, 0, 0))
        tail = jax.lax.dynamic_slice(v, (c, 0, M2), (1, PN, l_tail))
        v = jax.lax.dynamic_update_slice(v, tail, (c, 0, M2 + P))
    else:
        flat = jax.lax.dynamic_slice(v, (c, 0, M2), (1, PN, P))
        ring = _ring_one(flat[0], P, M2, W)[None]
        v = jax.lax.dynamic_update_slice(v, ring, (c, 0, 0))
    return v.reshape(ext3.shape)


def ring_color_substep(cfg: SimConfig, pot: Potential,
                       ext3: jax.Array, exto3: jax.Array,
                       color: jax.Array, key: jax.Array,
                       beta: jax.Array | float | None = None,
                       scale: jax.Array | None = None,
                       *, tile_rows: int = 16, tile_cols: int = 128,
                       interpret: bool = False, neighbor_unroll: int = 1,
                       slot_group: int = 8, in_kernel_rng: bool = False,
                       ih_k: int = 0, frozen_cache: bool = False,
                       p_local: int | None = None,
                       lb_local: jax.Array | None = None,
                       masks_local: jax.Array | None = None,
                       vma: tuple[str, ...] | None = None,
                       mirror: bool | None = None
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One color sub-step updating the ring state IN PLACE.

    ``color`` is a traced int32 scalar (the sweep's shuffled schedule).
    Returns (ext3_updated, de, n_acc); the caller must re-mirror the
    aprons with _refresh_color before the next sub-step reads them.

    Move randomness: the host-Threefry tensors are drawn from ``key`` with
    the SAME substep_randoms call as every other engine — hard-core
    trajectories stay bitwise locked across all four engine generations.

    Shard-local mode (mcjax.parallel.ring): ``p_local`` is this shard's
    flat cell count (contiguous axis-0 slice of the global grid, the
    fused-sharded convention — parallel/fused.py), ``lb_local``
    [C, dim, p_local] / ``masks_local`` [2*dim, p_local] are the shard's
    slices of the per-cell lower bounds and destination edge masks, and
    ``mirror=False`` is REQUIRED: the ring aprons hold neighbor-SHARD
    cells (ppermuted by the caller), not this shard's periodic wrap, so
    the in-kernel mirror would write wrong halo data.  ``vma``: mesh axis
    names the outputs vary over (compiled shard_map runs).
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    n_k = cfg.n_neighbors - 1
    assert tile_cols == 128, "ring path requires 128-lane tiles"
    n_planes = ext3.shape[1] // nmax
    PN = n_planes * nmax
    if p_local is None:
        P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    else:
        _, _, M2 = _fused_geometry(cfg)
        P = p_local
        padded = _round_up(max(P, tile_rows * tile_cols),
                           tile_rows * tile_cols)
        W = padded + 2 * M2 + 128
    WR = W // 128
    r0 = M2 // 128
    T = tile_rows * tile_cols
    rp, cp = padded // tile_cols, tile_cols
    TR, TC = tile_rows, tile_cols
    L = T + 2 * M2 + 128
    LR = L // 128
    strides, maxoff, _ = _fused_geometry(cfg)
    bs = cfg.block_shape
    box = cfg.box_length
    C = cfg.n_colors

    # per-color static compose plans (branch bodies)
    plans = [cells.neighbor_plan(dim, c) for c in range(C)]
    useds = [sorted({src for src, _ in plans[c]}) for c in range(C)]
    U = len(useds[0])

    # per-cell data, stacked over colors for dynamic-row DMA: host
    # constants on a single chip, shard-varying slices under shard_map
    if lb_local is None:
        lb_np = np.stack([cells._flat_lower_bounds_np(cfg, c)
                          for c in range(C)])              # [C, dim, P]
        lb_np = np.pad(lb_np, ((0, 0), (0, 0), (0, padded - P)))
        lb3 = jnp.asarray(lb_np.reshape(C, dim, rp, cp))
    else:
        lb3 = jnp.pad(lb_local, ((0, 0), (0, 0), (0, padded - P))
                      ).reshape(C, dim, rp, cp)
    if masks_local is None:
        masks_p = jnp.asarray(_fused_masks_np(bs, padded)).reshape(
            2 * dim, rp, cp)
    else:
        masks_p = jnp.pad(masks_local, ((0, 0), (0, padded - P))
                          ).reshape(2 * dim, rp, cp)

    use_field = False
    if mirror is None:
        mirror = _mirror_in_kernel(cfg, tile_rows, tile_cols)
    need_acc = pot.has_energy
    if in_kernel_rng:
        pick_u = disp = acc_u = None
        seed_arr = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.int32).reshape(1, 2)
    else:
        pick_u, disp, acc_u = xla_sweep.substep_randoms(
            cfg, key, (P,), need_acc=need_acc)

    def to_tiles(x, lead):
        x = x.reshape(lead, P)
        x = jnp.pad(x, ((0, 0), (0, padded - P)))
        return x.reshape(lead, rp, cp)

    if not in_kernel_rng:
        pick_p = to_tiles(pick_u, n_m)
        disp_p = to_tiles(disp, n_m * dim)
        if need_acc:
            accu_p = to_tiles(acc_u, n_m)

    beta_static = None
    if beta is None:
        beta_static = cfg.beta
        beta_arr = jnp.zeros((1, 1), jnp.float32)
    elif isinstance(beta, (int, float)):
        beta_static = float(beta)
        beta_arr = jnp.zeros((1, 1), jnp.float32)
    else:
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    use_scale = scale is not None
    scale2_arr = (jnp.asarray(scale, jnp.float32).reshape(1, 1) ** 2
                  if use_scale else jnp.zeros((1, 1), jnp.float32))
    color_arr = jnp.asarray(color, jnp.int32).reshape(1, 1)

    base_kernel = _make_kernel(cfg, pot, n_k, beta_static, neighbor_unroll,
                               slot_group, use_scale, in_kernel_rng, None,
                               ih_k, frozen_cache)
    body = base_kernel.body

    def ring_kernel(*refs):
        n_rng = 1 if in_kernel_rng else (3 if need_acc else 2)
        (color_ref, lb3_ref, mask_ref), rest = refs[:3], refs[3:]
        rng_refs, rest = rest[:n_rng], rest[n_rng:]
        (beta_ref, scale2_ref, extp_ref, exto_ref,
         out_ext_ref, de_ref, acc_ref,
         own_s, occ_s, lb_s, out_s, sup_pos, sup_occ, nbrs, nbro,
         sems, own_sem) = rest
        if in_kernel_rng:
            seed_ref = rng_refs[0]
            pick_ref = disp_ref = accu_ref = None
        else:
            pick_ref, disp_ref = rng_refs[0], rng_refs[1]
            accu_ref = rng_refs[2] if need_acc else None
            seed_ref = None

        t = pl.program_id(0)
        c = color_ref[0, 0]

        # ---- own rows / occupancy / lower bounds: dynamic-color DMA ------
        cp_own = pltpu.make_async_copy(
            extp_ref.at[c, :, pl.ds(r0 + t * TR, TR), :],
            own_s, own_sem.at[0])
        cp_occ = pltpu.make_async_copy(
            exto_ref.at[c, pl.ds(r0 + t * TR, TR), :],
            occ_s.at[0], own_sem.at[1])
        cp_lb = pltpu.make_async_copy(
            lb3_ref.at[c, :, pl.ds(t * TR, TR), :],
            lb_s, own_sem.at[2])
        cp_own.start()
        cp_occ.start()
        cp_lb.start()

        # ---- apron super-range DMA + static window compose, per color ----
        # (double-buffered across tiles: tile t+1's ranges stream while t
        # computes; safe — sources are OTHER colors, frozen this call)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
        slot = jax.lax.rem(t, 2)
        nt = pl.num_programs(0)

        def dma_pair(cc, tt, s, u):
            src = useds[cc][u]
            return (pltpu.make_async_copy(
                        extp_ref.at[src, :, pl.ds(tt * TR, LR), :],
                        sup_pos.at[s, u], sems.at[s, 2 * u]),
                    pltpu.make_async_copy(
                        exto_ref.at[src, pl.ds(tt * TR, LR), :],
                        sup_occ.at[s, u], sems.at[s, 2 * u + 1]))

        def window_pos(u, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_pos[slot, u, :, rr:rr + TR, :]
            w = sup_pos[slot, u, :, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:, :TR], -sh, axis=2)
            ub = jnp.roll(w[:, 1:TR + 1], -sh, axis=2)
            return jnp.where((lane < 128 - sh)[None], ua, ub)

        def window_occ(u, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_occ[slot, u, rr:rr + TR, :]
            w = sup_occ[slot, u, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:TR], -sh, axis=1)
            ub = jnp.roll(w[1:TR + 1], -sh, axis=1)
            return jnp.where(lane < 128 - sh, ua, ub)

        def dmask(k, s):
            return mask_ref[2 * k + (0 if s > 0 else 1)]

        for cc in range(C):
            @pl.when(c == cc)
            def _(cc=cc):
                even = slot == 0

                def start_all(tt, s):
                    for u in range(U):
                        a, b = dma_pair(cc, tt, s, u)
                        a.start()
                        b.start()

                def wait_all(tt, s):
                    for u in range(U):
                        a, b = dma_pair(cc, tt, s, u)
                        a.wait()
                        b.wait()

                @pl.when(t == 0)
                def _():
                    start_all(t, 0)

                @pl.when((t + 1 < nt) & even)
                def _():
                    start_all(t + 1, 1)

                @pl.when((t + 1 < nt) & jnp.logical_not(even))
                def _():
                    start_all(t + 1, 0)

                @pl.when(even)
                def _():
                    wait_all(t, 0)

                @pl.when(jnp.logical_not(even))
                def _():
                    wait_all(t, 1)

                # static compose (round-3 fused body verbatim, color cc)
                for j, (src, shifts) in enumerate(plans[cc]):
                    u = useds[cc].index(src)
                    a0 = M2 + sum(s * strides[k]
                                  for k, s in enumerate(shifts))
                    v = window_pos(u, a0)
                    o = window_occ(u, a0)
                    corr = [(k, shifts[k]) for k in range(1, dim)
                            if shifts[k]]
                    for k, s in corr:
                        m = dmask(k, s) > 0.0
                        a = a0 - s * bs[k] * strides[k]
                        v = jnp.where(m[None], window_pos(u, a), v)
                        o = jnp.where(m, window_occ(u, a), o)
                    if len(corr) == 2:
                        (k1, s1), (k2, s2) = corr
                        m12 = (dmask(k1, s1) > 0.0) & (dmask(k2, s2) > 0.0)
                        a = (a0 - s1 * bs[k1] * strides[k1]
                             - s2 * bs[k2] * strides[k2])
                        v = jnp.where(m12[None], window_pos(u, a), v)
                        o = jnp.where(m12, window_occ(u, a), o)
                    for k in range(dim):
                        s = shifts[k]
                        if s:
                            adj = jnp.float32(s * box) * dmask(k, s)
                            row = jax.lax.broadcasted_iota(
                                jnp.int32, (PN, 1, 1), 0)
                            psel = (row >= k * nmax) & (row < (k + 1) * nmax)
                            v = jnp.where(psel, v + adj[None], v)
                    nbrs[j * PN:(j + 1) * PN] = v
                    nbro[j] = o

        cp_own.wait()
        cp_occ.wait()
        cp_lb.wait()
        # padding cells (wrapped ring tail) are inert: zero their occupancy
        cell_idx = (t * T
                    + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0) * TC
                    + lane)
        occ_s[0] = jnp.where(cell_idx < P, occ_s[0], 0)

        body(own_s, occ_s, nbrs, nbro, lb_s, pick_ref, disp_ref,
             accu_ref, seed_ref, beta_ref, scale2_ref,
             out_s, de_ref, acc_ref, None)

        # in-place write-back of the updated tile (disjoint rows per tile)
        cp_out = pltpu.make_async_copy(
            out_s, out_ext_ref.at[c, :, pl.ds(r0 + t * TR, TR), :],
            own_sem.at[3])
        cp_out.start()
        cp_out.wait()

        if mirror:
            # refresh this color's ring aprons in-kernel: ring[x] =
            # flat[(x - M2) mod P], so the head apron rows [0, r0) are the
            # LAST tile's last r0 rows and the tail apron rows
            # [r0 + Pr, W/128) are tile 0's first r0+1 rows.  Mirror rows
            # are never read as own rows this call (own reads span
            # [r0, r0 + Pr)) and neighbor reads only target OTHER colors,
            # so the extra writes are hazard-free.  Predicates are
            # grid-derived (the fused kernel's proven pl.when flavor).
            Pr = P // 128
            nt_m = pl.num_programs(0)

            @pl.when(t == nt_m - 1)
            def _():
                cp_h = pltpu.make_async_copy(
                    out_s.at[:, pl.ds(TR - r0, r0), :],
                    out_ext_ref.at[c, :, pl.ds(0, r0), :], own_sem.at[4])
                cp_h.start()
                cp_h.wait()

            @pl.when(t == 0)
            def _():
                cp_t = pltpu.make_async_copy(
                    out_s.at[:, pl.ds(0, r0 + 1), :],
                    out_ext_ref.at[c, :, pl.ds(r0 + Pr, r0 + 1), :],
                    own_sem.at[5])
                cp_t.start()
                cp_t.wait()

    grid = (rp // tile_rows, 1)

    def bspec(lead):
        return pl.BlockSpec((lead, tile_rows, tile_cols),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    def sspec(cols=1):
        return pl.BlockSpec((1, cols), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    # under shard_map, outputs must declare their varying mesh axes
    vma_set = frozenset(vma) if vma else None
    out_shapes = (
        jax.ShapeDtypeStruct(ext3.shape, ext3.dtype, vma=vma_set),  # ring
        jax.ShapeDtypeStruct((1, rp, cp), jnp.float32, vma=vma_set),
        jax.ShapeDtypeStruct((1, rp, cp), jnp.int32, vma=vma_set),
    )
    common = [sspec(1), any_spec, bspec(2 * dim)]
    if in_kernel_rng:
        in_specs = common + [sspec(2), sspec(), sspec(), any_spec, any_spec]
        args = (color_arr, lb3, masks_p, seed_arr, beta_arr, scale2_arr,
                ext3, exto3)
        ext_idx = 6
    elif need_acc:
        in_specs = common + [bspec(n_m), bspec(n_m * dim), bspec(n_m),
                             sspec(), sspec(), any_spec, any_spec]
        args = (color_arr, lb3, masks_p, pick_p, disp_p, accu_p,
                beta_arr, scale2_arr, ext3, exto3)
        ext_idx = 8
    else:
        in_specs = common + [bspec(n_m), bspec(n_m * dim),
                             sspec(), sspec(), any_spec, any_spec]
        args = (color_arr, lb3, masks_p, pick_p, disp_p,
                beta_arr, scale2_arr, ext3, exto3)
        ext_idx = 7

    scratch = [
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # own_s
        pltpu.VMEM((1, TR, TC), jnp.int32),                # occ_s
        pltpu.VMEM((dim, TR, TC), jnp.float32),            # lb_s
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # out_s
        pltpu.VMEM((2, U, PN, LR, 128), jnp.float32),      # sup_pos
        pltpu.VMEM((2, U, LR, 128), jnp.int32),            # sup_occ
        pltpu.VMEM((n_k * PN, TR, TC), jnp.float32),       # nbrs
        pltpu.VMEM((n_k, TR, TC), jnp.int32),              # nbro
        pltpu.SemaphoreType.DMA((2, 2 * U)),
        pltpu.SemaphoreType.DMA((6,)),
    ]
    vmem_bytes = (
        2 * 4 * U * (PN + 1) * L
        + 4 * n_k * (PN + 1) * T
        + 4 * T * (3 * PN + 1 + dim + 2 * dim + n_m * (2 + dim) + 4)
        + 8 * 1024 * 1024)

    ext3_new, de_map, acc_map = pl.pallas_call(
        ring_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(any_spec, bspec(1), bspec(1)),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases={ext_idx: 0},
        compiler_params=pltpu.CompilerParams(
            # floor at 32M: the analytic estimate undercounts Mosaic's
            # internal temporaries in 3D (observed 15.48M actual vs 13.7M
            # estimated at lj3d 1M tile_rows=16 — a compile-time scoped-vmem
            # OOM, docs/PERF.md round 4)
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 1024 * 1024),
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(*args)

    de = jnp.sum(de_map)
    n_acc = jnp.sum(acc_map)
    return ext3_new, de, n_acc


def ring_sweep_onecall(cfg: SimConfig, pot: Potential,
                       ext3: jax.Array, exto3: jax.Array,
                       perm: jax.Array, k_sub: jax.Array,
                       beta: jax.Array | float | None = None,
                       scale: jax.Array | None = None,
                       *, tile_rows: int = 16, tile_cols: int = 128,
                       interpret: bool = False, neighbor_unroll: int = 1,
                       slot_group: int = 8, in_kernel_rng: bool = False,
                       ih_k: int = 0, frozen_cache: bool = False
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """ALL n_colors color sub-steps of one sweep in a SINGLE pallas_call
    (VERDICT r4 item 3: the sweep was still 4+1 dispatches; the loop
    ablations put the remaining per-sweep dispatch + carry glue at
    ~0.5 ms of the 1.44 ms n_M=8 sweep, docs/PERF.md round 4).

    The grid is (n_colors, tiles): the leading axis is the SUB-STEP INDEX
    ``i`` (TPU grids iterate sequentially, last axis fastest, so sub-step
    i+1 starts only after every tile of sub-step i wrote back — manual
    in-body DMA keeps that ordering exact), and the active color is
    ``perm[i]``, the sweep's shuffled schedule.

    Fault-rule compliance (docs/PERF.md round-4 item 5: DMA indices must
    be raw SMEM scalars at STATIC slots or program-id arithmetic — never
    arithmetic on SMEM values, never dynamic-slot SMEM loads):

      * ``perm`` rides in SMEM and is only ever read at STATIC slots;
        the active color resolves as C scalar predicates
        act[cc] = OR_j (i == j) & (perm[j] == cc) — program-id compares
        against static-slot loads, used exclusively in pl.when;
      * every own-row / lb / write-back / mirror DMA moves into the
        per-color pl.when(act[cc]) branch with a STATIC color index —
        the exact pattern the 4-call ring kernel proves in production
        for its neighbor-apron DMAs;
      * the in-kernel PRNG seed for sub-step i is selected by
        sum_j (i == j) * seeds[j] (static-slot loads, program-id
        weights) and fed to the shared kernel body as an explicit
        (s0, s1, tid=t) tuple with tid = the tile index — bitwise the
        stream the per-color call derives from its (tiles, 1) grid.

    Host-RNG tensors stack per sub-step ([C * n_m, ...] blocks indexed by
    i), drawn from the identical fold_in(k_sub, i) tree — trajectories
    are BITWISE equal to the 4-call ring engine in both RNG modes
    (tests/test_pallas_ring.py).

    Requires the in-kernel-mirror geometry (padded == P): sub-step i+1
    reads color perm[i]'s ring aprons, so they must be refreshed inside
    the call — the first/last-tile mirror DMAs do it per branch.

    Reference analogue: the 9-launch + 8-D2H host loop,
    /root/reference/CUDA-Parallel-MC/CUDA-Parallel-MC/kernel.cu:652-701.
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    n_k = cfg.n_neighbors - 1
    assert tile_cols == 128, "ring path requires 128-lane tiles"
    n_planes = ext3.shape[1] // nmax
    PN = n_planes * nmax
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    if not _mirror_in_kernel(cfg, tile_rows, tile_cols):
        raise ValueError(
            "ring_sweep_onecall requires the in-kernel-mirror geometry "
            f"(padded == P and aprons within one tile); got P={P}, "
            f"padded={padded}, tile_rows={tile_rows}")
    r0 = M2 // 128
    Pr = P // 128
    T = tile_rows * tile_cols
    rp, cp = padded // tile_cols, tile_cols
    TR, TC = tile_rows, tile_cols
    L = T + 2 * M2 + 128
    LR = L // 128
    strides, _, _ = _fused_geometry(cfg)
    bs = cfg.block_shape
    box = cfg.box_length
    C = cfg.n_colors

    plans = [cells.neighbor_plan(dim, c) for c in range(C)]
    useds = [sorted({src for src, _ in plans[c]}) for c in range(C)]
    U = len(useds[0])

    lb_np = np.stack([cells._flat_lower_bounds_np(cfg, c)
                      for c in range(C)])                  # [C, dim, P]
    lb_np = np.pad(lb_np, ((0, 0), (0, 0), (0, padded - P)))
    lb3 = jnp.asarray(lb_np.reshape(C, dim, rp, cp))
    masks_p = jnp.asarray(_fused_masks_np(bs, padded)).reshape(
        2 * dim, rp, cp)

    need_acc = pot.has_energy
    keys = [jax.random.fold_in(k_sub, i) for i in range(C)]
    if in_kernel_rng:
        seed_arr = jnp.stack([jax.lax.bitcast_convert_type(
            jax.random.key_data(k), jnp.int32).reshape(2) for k in keys])

    def to_tiles(x, lead):
        x = x.reshape(lead, P)
        x = jnp.pad(x, ((0, 0), (0, padded - P)))
        return x.reshape(lead, rp, cp)

    if not in_kernel_rng:
        picks, disps, accus = [], [], []
        for k in keys:
            pu, du, au = xla_sweep.substep_randoms(cfg, k, (P,),
                                                   need_acc=need_acc)
            picks.append(pu.reshape(n_m, P))
            disps.append(du.reshape(n_m * dim, P))
            if need_acc:
                accus.append(au.reshape(n_m, P))
        pick_p = to_tiles(jnp.concatenate(picks), C * n_m)
        disp_p = to_tiles(jnp.concatenate(disps), C * n_m * dim)
        if need_acc:
            accu_p = to_tiles(jnp.concatenate(accus), C * n_m)

    beta_static = None
    if beta is None:
        beta_static = cfg.beta
        beta_arr = jnp.zeros((1, 1), jnp.float32)
    elif isinstance(beta, (int, float)):
        beta_static = float(beta)
        beta_arr = jnp.zeros((1, 1), jnp.float32)
    else:
        beta_arr = jnp.asarray(beta, jnp.float32).reshape(1, 1)
    use_scale = scale is not None
    scale2_arr = (jnp.asarray(scale, jnp.float32).reshape(1, 1) ** 2
                  if use_scale else jnp.zeros((1, 1), jnp.float32))
    perm_arr = jnp.asarray(perm, jnp.int32).reshape(1, C)

    base_kernel = _make_kernel(cfg, pot, n_k, beta_static, neighbor_unroll,
                               slot_group, use_scale, in_kernel_rng, None,
                               ih_k, frozen_cache)
    body = base_kernel.body

    def sweep_kernel(*refs):
        n_rng = 1 if in_kernel_rng else (3 if need_acc else 2)
        (perm_ref, lb3_ref, mask_ref), rest = refs[:3], refs[3:]
        rng_refs, rest = rest[:n_rng], rest[n_rng:]
        (beta_ref, scale2_ref, extp_ref, exto_ref,
         out_ext_ref, de_ref, acc_ref,
         own_s, occ_s, lb_s, out_s, sup_pos, sup_occ, nbrs, nbro,
         sems, own_sem) = rest
        if in_kernel_rng:
            seed_ref = rng_refs[0]              # SMEM [C, 2]
            pick_ref = disp_ref = accu_ref = None
        else:
            pick_ref, disp_ref = rng_refs[0], rng_refs[1]
            accu_ref = rng_refs[2] if need_acc else None
            seed_ref = None

        i = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        # ALL position-state reads go through the ALIASED OUTPUT ref: on
        # TPU input and output are the same donated HBM buffer, but in
        # interpret mode they are separate and only the output (which is
        # initialized from the aliased input) observes this call's earlier
        # sub-step writes — reading extp_ref there silently produced
        # sweep-START neighbor data, a near-miss Jacobi sweep (probe +
        # finding recorded in docs/PERF.md round 5).  extp_ref stays
        # solely as the alias source.
        del extp_ref

        # active color: program-id compares x static-slot SMEM loads only
        act = []
        for cc in range(C):
            a = (i == 0) & (perm_ref[0, 0] == cc)
            for j in range(1, C):
                a = a | ((i == j) & (perm_ref[0, j] == cc))
            act.append(a)

        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
        slot = jax.lax.rem(t, 2)

        def dma_pair(cc, tt, s, u):
            src = useds[cc][u]
            return (pltpu.make_async_copy(
                        out_ext_ref.at[src, :, pl.ds(tt * TR, LR), :],
                        sup_pos.at[s, u], sems.at[s, 2 * u]),
                    pltpu.make_async_copy(
                        exto_ref.at[src, pl.ds(tt * TR, LR), :],
                        sup_occ.at[s, u], sems.at[s, 2 * u + 1]))

        def window_pos(u, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_pos[slot, u, :, rr:rr + TR, :]
            w = sup_pos[slot, u, :, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:, :TR], -sh, axis=2)
            ub = jnp.roll(w[:, 1:TR + 1], -sh, axis=2)
            return jnp.where((lane < 128 - sh)[None], ua, ub)

        def window_occ(u, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_occ[slot, u, rr:rr + TR, :]
            w = sup_occ[slot, u, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:TR], -sh, axis=1)
            ub = jnp.roll(w[1:TR + 1], -sh, axis=1)
            return jnp.where(lane < 128 - sh, ua, ub)

        def dmask(k, s):
            return mask_ref[2 * k + (0 if s > 0 else 1)]

        for cc in range(C):
            @pl.when(act[cc])
            def _(cc=cc):
                # own rows / occupancy / lower bounds at the STATIC color
                cp_own = pltpu.make_async_copy(
                    out_ext_ref.at[cc, :, pl.ds(r0 + t * TR, TR), :],
                    own_s, own_sem.at[0])
                cp_occ = pltpu.make_async_copy(
                    exto_ref.at[cc, pl.ds(r0 + t * TR, TR), :],
                    occ_s.at[0], own_sem.at[1])
                cp_lb = pltpu.make_async_copy(
                    lb3_ref.at[cc, :, pl.ds(t * TR, TR), :],
                    lb_s, own_sem.at[2])
                cp_own.start()
                cp_occ.start()
                cp_lb.start()

                even = slot == 0

                def start_all(tt, s):
                    for u in range(U):
                        a, b = dma_pair(cc, tt, s, u)
                        a.start()
                        b.start()

                def wait_all(tt, s):
                    for u in range(U):
                        a, b = dma_pair(cc, tt, s, u)
                        a.wait()
                        b.wait()

                @pl.when(t == 0)
                def _():
                    start_all(t, 0)

                @pl.when((t + 1 < nt) & even)
                def _():
                    start_all(t + 1, 1)

                @pl.when((t + 1 < nt) & jnp.logical_not(even))
                def _():
                    start_all(t + 1, 0)

                @pl.when(even)
                def _():
                    wait_all(t, 0)

                @pl.when(jnp.logical_not(even))
                def _():
                    wait_all(t, 1)

                # static compose (the 4-call ring kernel's body verbatim)
                for j, (src, shifts) in enumerate(plans[cc]):
                    u = useds[cc].index(src)
                    a0 = M2 + sum(s * strides[k]
                                  for k, s in enumerate(shifts))
                    v = window_pos(u, a0)
                    o = window_occ(u, a0)
                    corr = [(k, shifts[k]) for k in range(1, dim)
                            if shifts[k]]
                    for k, s in corr:
                        m = dmask(k, s) > 0.0
                        a = a0 - s * bs[k] * strides[k]
                        v = jnp.where(m[None], window_pos(u, a), v)
                        o = jnp.where(m, window_occ(u, a), o)
                    if len(corr) == 2:
                        (k1, s1), (k2, s2) = corr
                        m12 = (dmask(k1, s1) > 0.0) & (dmask(k2, s2) > 0.0)
                        a = (a0 - s1 * bs[k1] * strides[k1]
                             - s2 * bs[k2] * strides[k2])
                        v = jnp.where(m12[None], window_pos(u, a), v)
                        o = jnp.where(m12, window_occ(u, a), o)
                    for k in range(dim):
                        s = shifts[k]
                        if s:
                            adj = jnp.float32(s * box) * dmask(k, s)
                            row = jax.lax.broadcasted_iota(
                                jnp.int32, (PN, 1, 1), 0)
                            psel = (row >= k * nmax) & (row < (k + 1) * nmax)
                            v = jnp.where(psel, v + adj[None], v)
                    nbrs[j * PN:(j + 1) * PN] = v
                    nbro[j] = o

                cp_own.wait()
                cp_occ.wait()
                cp_lb.wait()

        # padding cells (wrapped ring tail) are inert
        cell_idx = (t * T
                    + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0) * TC
                    + lane)
        occ_s[0] = jnp.where(cell_idx < P, occ_s[0], 0)

        if in_kernel_rng:
            s0 = jnp.int32(0)
            s1 = jnp.int32(0)
            for j in range(C):
                pj = (i == j).astype(jnp.int32)
                s0 = s0 + pj * seed_ref[j, 0]
                s1 = s1 + pj * seed_ref[j, 1]
            seed_arg = (s0, s1, t)
        else:
            seed_arg = None

        body(own_s, occ_s, nbrs, nbro, lb_s, pick_ref, disp_ref,
             accu_ref, seed_arg, beta_ref, scale2_ref,
             out_s, de_ref, acc_ref, None)

        for cc in range(C):
            @pl.when(act[cc])
            def _(cc=cc):
                cp_out = pltpu.make_async_copy(
                    out_s, out_ext_ref.at[cc, :, pl.ds(r0 + t * TR, TR), :],
                    own_sem.at[3])
                cp_out.start()
                cp_out.wait()

                # in-kernel apron mirror: MANDATORY here (the next sub-step
                # reads this color's aprons within the same call)
                @pl.when(t == nt - 1)
                def _():
                    cp_h = pltpu.make_async_copy(
                        out_s.at[:, pl.ds(TR - r0, r0), :],
                        out_ext_ref.at[cc, :, pl.ds(0, r0), :],
                        own_sem.at[4])
                    cp_h.start()
                    cp_h.wait()

                @pl.when(t == 0)
                def _():
                    cp_t = pltpu.make_async_copy(
                        out_s.at[:, pl.ds(0, r0 + 1), :],
                        out_ext_ref.at[cc, :, pl.ds(r0 + Pr, r0 + 1), :],
                        own_sem.at[5])
                    cp_t.start()
                    cp_t.wait()

    grid = (C, rp // tile_rows)

    def bspec(lead):
        return pl.BlockSpec((lead, tile_rows, tile_cols),
                            lambda i, t: (0, t, 0),
                            memory_space=pltpu.VMEM)

    def bspec_i(lead):
        """Per-sub-step blocks (host-RNG tensors stacked over i)."""
        return pl.BlockSpec((lead, tile_rows, tile_cols),
                            lambda i, t: (i, t, 0),
                            memory_space=pltpu.VMEM)

    def sspec(cols=1, rows=1):
        return pl.BlockSpec((rows, cols), lambda i, t: (0, 0),
                            memory_space=pltpu.SMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    out_shapes = (
        jax.ShapeDtypeStruct(ext3.shape, ext3.dtype),          # aliased ring
        jax.ShapeDtypeStruct((C, rp, cp), jnp.float32),        # de per (i,t)
        jax.ShapeDtypeStruct((C, rp, cp), jnp.int32),          # acc per (i,t)
    )
    de_spec = pl.BlockSpec((1, tile_rows, tile_cols), lambda i, t: (i, t, 0),
                           memory_space=pltpu.VMEM)
    common = [sspec(C), any_spec, bspec(2 * dim)]
    if in_kernel_rng:
        in_specs = common + [sspec(2, C), sspec(), sspec(),
                             any_spec, any_spec]
        args = (perm_arr, lb3, masks_p, seed_arr, beta_arr, scale2_arr,
                ext3, exto3)
        ext_idx = 6
    elif need_acc:
        in_specs = common + [bspec_i(n_m), bspec_i(n_m * dim), bspec_i(n_m),
                             sspec(), sspec(), any_spec, any_spec]
        args = (perm_arr, lb3, masks_p, pick_p, disp_p, accu_p,
                beta_arr, scale2_arr, ext3, exto3)
        ext_idx = 8
    else:
        in_specs = common + [bspec_i(n_m), bspec_i(n_m * dim),
                             sspec(), sspec(), any_spec, any_spec]
        args = (perm_arr, lb3, masks_p, pick_p, disp_p,
                beta_arr, scale2_arr, ext3, exto3)
        ext_idx = 7

    scratch = [
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # own_s
        pltpu.VMEM((1, TR, TC), jnp.int32),                # occ_s
        pltpu.VMEM((dim, TR, TC), jnp.float32),            # lb_s
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # out_s
        pltpu.VMEM((2, U, PN, LR, 128), jnp.float32),      # sup_pos
        pltpu.VMEM((2, U, LR, 128), jnp.int32),            # sup_occ
        pltpu.VMEM((n_k * PN, TR, TC), jnp.float32),       # nbrs
        pltpu.VMEM((n_k, TR, TC), jnp.int32),              # nbro
        pltpu.SemaphoreType.DMA((2, 2 * U)),
        pltpu.SemaphoreType.DMA((6,)),
    ]
    vmem_bytes = (
        2 * 4 * U * (PN + 1) * L
        + 4 * n_k * (PN + 1) * T
        + 4 * T * (3 * PN + 1 + dim + 2 * dim + n_m * (2 + dim) + 4)
        + 8 * 1024 * 1024)

    ext3_new, de_map, acc_map = pl.pallas_call(
        sweep_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(any_spec, de_spec, de_spec),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        input_output_aliases={ext_idx: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 1024 * 1024),
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(*args)

    de = jnp.sum(de_map)
    n_acc = jnp.sum(acc_map)
    return ext3_new, de, n_acc


def ring_shift(cfg: SimConfig, ext3: jax.Array, exto3: jax.Array,
               axis: jax.Array, d: jax.Array, n_planes: int,
               *, tile_rows: int = 32, tile_cols: int = 128,
               interpret: bool = False
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Ring-native grid shift: the packed/flat XLA merge cost 1.03 ms/sweep
    at 2D 1M disks (41% of the whole sweep — loop ablations, docs/PERF.md
    round 4), dominated by ring->flat->re-ring relayouts and ~2*nmax
    full-state select passes.  This kernel reads the ring state directly
    (own rows + ONE donor super-range per tile), runs the identical
    candidate-claim merge in VMEM, and writes a fresh ring (aprons
    refreshed by the caller) — one pass over the state.

    BITWISE-equal to cells.shift_rebin's flat merge (same candidate order,
    same fp formulas: subtract-then-wrap, floor cell binning, integer
    cumsum claim; tests/test_pallas_ring.py).  ``axis``/``d`` are traced;
    the per-(axis, direction, parity-bit) window offsets are static branch
    bodies — Mosaic faults on dynamic sublane slices/rolls (round-4 probe),
    so all window extraction keeps static offsets under pl.when guards.

    Returns (ext3_new, exto3_new, ovf_map) with ovf_map [C, rp, cp] int32
    (cells whose merged occupancy exceeded nmax, pre-clip).

    Reference analogue: the single-block shiftCells kernel this replaces,
    /root/reference/CUDA-Parallel-MC/CUDA-Parallel-MC/shiftCells.h:23-112
    (1024-cell cap; ours is tiled over the whole grid).
    """
    dim, nmax = cfg.dim, cfg.nmax
    assert tile_cols == 128
    PN = n_planes * nmax
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    WR = W // 128
    r0 = M2 // 128
    T = tile_rows * tile_cols
    rp, cp = padded // tile_cols, tile_cols
    TR, TC = tile_rows, tile_cols
    L = T + 2 * M2 + 128
    LR = L // 128
    strides, _, _ = _fused_geometry(cfg)
    bs = cfg.block_shape
    box = cfg.box_length
    w_cell = cfg.cell_width
    cps = cfg.cells_per_side
    C = cfg.n_colors

    # per-axis block index of every flat cell (padding rows get -1 so
    # padded cells never claim candidates)
    bk_np = np.indices(bs).reshape(dim, P)
    bk_np = np.pad(bk_np, ((0, 0), (0, padded - P)), constant_values=-1)
    bk3 = jnp.asarray(bk_np.reshape(dim, rp, cp), jnp.int32)
    masks_p = jnp.asarray(_fused_masks_np(bs, padded)).reshape(
        2 * dim, rp, cp)

    axis_arr = jnp.asarray(axis, jnp.int32).reshape(1, 1)
    dir_arr = jnp.where(jnp.asarray(d) > 0, 1, -1).astype(
        jnp.int32).reshape(1, 1)
    d_arr = jnp.asarray(d, jnp.float32).reshape(1, 1)

    def shift_kernel(axis_ref, dir_ref, d_ref, bk_ref, mask_ref,
                     extp_ref, exto_ref,
                     out_ext, out_occ, ovf_ref,
                     own_s, occ_s, don_s, docc_s, xk_s, myk_s, recv_s,
                     sup_pos, sup_occ, bk_s, out_s, sems):
        c = pl.program_id(0)
        t = pl.program_id(1)
        k_ax = axis_ref[0, 0]
        ddir = dir_ref[0, 0]
        dval = d_ref[0, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)

        cp_own = pltpu.make_async_copy(
            extp_ref.at[c, :, pl.ds(r0 + t * TR, TR), :],
            own_s, sems.at[0])
        cp_occ = pltpu.make_async_copy(
            exto_ref.at[c, pl.ds(r0 + t * TR, TR), :],
            occ_s.at[0], sems.at[1])
        cp_own.start()
        cp_occ.start()

        def window_pos(k, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_pos[k, :, rr:rr + TR, :]
            w = sup_pos[k, :, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:, :TR], -sh, axis=2)
            ub = jnp.roll(w[:, 1:TR + 1], -sh, axis=2)
            return jnp.where((lane < 128 - sh)[None], ua, ub)

        def window_occ(k, a):
            rr, sh = divmod(a, 128)
            if sh == 0:
                return sup_occ[k, rr:rr + TR, :]
            w = sup_occ[k, rr:rr + TR + 1, :]
            ua = jnp.roll(w[:TR], -sh, axis=1)
            ub = jnp.roll(w[1:TR + 1], -sh, axis=1)
            return jnp.where(lane < 128 - sh, ua, ub)

        # ---- donor DMA: UNCONDITIONAL, all dim donors, static-flavor -------
        # Every DMA starts AND waits outside all predication, and every
        # index is program-id arithmetic of proven flavor (mul/add/div/rem —
        # the fused kernel's t*TR / rem(t, 2) patterns).  The bisection
        # history on this chip (scripts/probe_ring_tpu.py, round 4): DMA
        # waits under SMEM-dependent pl.when fault the worker; an
        # SMEM-derived donor index (c ^ (1 << k_ax), with the shift as a
        # where-chain) ALSO faults even with unconditional waits; the same
        # kernel without the donor DMAs runs.  So the shift DMAs every
        # axis's donor (dim of them) with indices independent of SMEM and
        # the active axis is selected by vector work under pl.when — at the
        # cost of (dim-1) extra super-range reads on a once-per-sweep pass.
        for k in range(dim):
            step_k = 1 << k
            par_k = jax.lax.rem(jax.lax.div(c, jnp.int32(step_k)),
                                jnp.int32(2))
            src_k = c + jnp.int32(step_k) * (jnp.int32(1)
                                             - jnp.int32(2) * par_k)
            cp_don = pltpu.make_async_copy(
                extp_ref.at[src_k, :, pl.ds(t * TR, LR), :],
                sup_pos.at[k], sems.at[2 + 3 * k])
            cp_docc = pltpu.make_async_copy(
                exto_ref.at[src_k, pl.ds(t * TR, LR), :],
                sup_occ.at[k], sems.at[3 + 3 * k])
            cp_bk = pltpu.make_async_copy(
                bk_ref.at[k, pl.ds(t * TR, TR), :], bk_s.at[k],
                sems.at[4 + 3 * k])
            cp_don.start()
            cp_docc.start()
            cp_bk.start()
            cp_don.wait()
            cp_docc.wait()
            cp_bk.wait()
        cp_own.wait()
        cp_occ.wait()

        # ---- per-(axis, dir, parity-bit) static branches ------------------
        # Vector work only (window compose at static offsets + scratch
        # writes) under the pl.when — the pattern the ring sub-step kernel
        # proves safe (pl.when(c == cc) with c from SMEM).
        if _RING_ABLATE == "branch":
            don_s[...] = jnp.zeros((PN, TR, TC), jnp.float32)
            docc_s[0] = jnp.zeros((TR, TC), jnp.int32)
            for j in range(2 * nmax):
                xk_s[j] = jnp.zeros((TR, TC), jnp.float32)
            myk_s[0] = jnp.zeros((TR, TC), jnp.int32)
            recv_s[0] = jnp.ones((TR, TC), jnp.int32)
        for k in (range(dim) if _RING_ABLATE != "branch" else ()):

            def branch_body(k, dp, ob, s):
                a0 = M2 + s * strides[k]
                v = window_pos(k, a0)
                o = window_occ(k, a0)
                if s and k >= 1:
                    m = mask_ref[2 * k + (0 if s > 0 else 1)] > 0.0
                    a = a0 - s * bs[k] * strides[k]
                    v = jnp.where(m[None], window_pos(k, a), v)
                    o = jnp.where(m, window_occ(k, a), o)
                don_s[...] = v
                docc_s[0] = o
                # subtract d on the shifted coordinate plane (own + donor),
                # then stash the xk candidates
                for j in range(nmax):
                    own_s[k * nmax + j] = own_s[k * nmax + j] - dval
                    don_s[k * nmax + j] = don_s[k * nmax + j] - dval
                    xk_s[j] = own_s[k * nmax + j]
                    xk_s[nmax + j] = don_s[k * nmax + j]
                myk = 2 * bk_s[k] + ob
                myk_s[0] = myk
                recv_s[0] = jax.lax.rem(
                    jax.lax.rem(myk - dp, cps) + cps, cps)

            for dp in (1, -1):
                for ob in (0, 1):
                    s = (ob + dp) >> 1
                    # parity bit via div/rem (no >>/& on program ids — the
                    # proven scalar-arithmetic flavor)
                    par = jax.lax.rem(jax.lax.div(c, jnp.int32(1 << k)),
                                      jnp.int32(2))

                    @pl.when((k_ax == k) & (ddir == dp) & (par == ob))
                    def _(k=k, dp=dp, ob=ob, s=s):
                        branch_body(k, dp, ob, s)

        # ---- shared merge epilogue ---------------------------------------
        # wrap the coordinate planes (attribute planes pass through) and
        # the stashed xk candidates — identical fp formula to wrap_into_box
        half = jnp.float32(box / 2.0)

        def wrap(x):
            return jnp.mod(x + half, jnp.float32(box)) - half

        for p in range(dim):
            for j in range(nmax):
                own_s[p * nmax + j] = wrap(own_s[p * nmax + j])
                don_s[p * nmax + j] = wrap(don_s[p * nmax + j])
        for j in range(2 * nmax):
            xk_s[j] = wrap(xk_s[j])

        cell_idx = (t * T
                    + jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 0) * TC
                    + lane)
        own_occ = jnp.where(cell_idx < P, occ_s[0], 0)
        don_occ = docc_s[0]
        myk = myk_s[0]
        recv = recv_s[0]

        if _RING_ABLATE == "merge":
            for p in range(PN):
                out_s[p] = own_s[p]
            ovf_ref[0] = jnp.zeros((TR, TC), jnp.int32)
            occ_s[0] = own_occ
            cp_out = pltpu.make_async_copy(
                out_s, out_ext.at[c, :, pl.ds(r0 + t * TR, TR), :],
                sems.at[2 + 3 * dim])
            cp_oo = pltpu.make_async_copy(
                occ_s.at[0], out_occ.at[c, pl.ds(r0 + t * TR, TR), :],
                sems.at[3 + 3 * dim])
            cp_out.start()
            cp_oo.start()
            cp_out.wait()
            cp_oo.wait()
            return

        # candidate-claim merge: integer cumsum in slot order (bitwise the
        # XLA flat merge, cells._shift_rebin_axis_flat)
        run = jnp.zeros((TR, TC), jnp.int32)
        slot_hits = []
        for j in range(2 * nmax):
            # reciprocal-multiply binning (NOT division): Mosaic and
            # XLA-TPU round f32 divides differently at cell boundaries —
            # the round-5 ring-vs-fused TPU probe traced a sweep-3 accept
            # divergence to exactly this (docs/PERF.md round 5); mul/add/
            # floor are exactly rounded on both backends
            ck = jnp.floor((xk_s[j] + half) * jnp.float32(1.0 / w_cell)
                           ).astype(jnp.int32)
            ck = jnp.clip(ck, 0, cps - 1)
            if j < nmax:
                valid = (j < own_occ) & (ck != recv)
            else:
                valid = ((j - nmax) < don_occ) & (ck == myk)
            b = valid.astype(jnp.int32)
            dest = run + b - 1
            slot_hits.append((b, dest))
            run = run + b

        for p in range(n_planes):
            for i in range(nmax):
                acc = None
                for j in range(2 * nmax):
                    b, dest = slot_hits[j]
                    hit = (b > 0) & (dest == i)
                    src_plane = (own_s[p * nmax + j] if j < nmax
                                 else don_s[p * nmax + j - nmax])
                    term = jnp.where(hit, src_plane, 0.0)
                    acc = term if acc is None else acc + term
                out_s[p * nmax + i] = acc

        ovf_ref[0] = (run > nmax).astype(jnp.int32)
        occ_s[0] = jnp.minimum(run, nmax)

        cp_out = pltpu.make_async_copy(
            out_s, out_ext.at[c, :, pl.ds(r0 + t * TR, TR), :],
            sems.at[2 + 3 * dim])
        cp_oo = pltpu.make_async_copy(
            occ_s.at[0], out_occ.at[c, pl.ds(r0 + t * TR, TR), :],
            sems.at[3 + 3 * dim])
        cp_out.start()
        cp_oo.start()
        cp_out.wait()
        cp_oo.wait()

    grid = (C, rp // tile_rows)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    def sspec(cols=1):
        return pl.BlockSpec((1, cols), lambda c, t: (0, 0),
                            memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct(ext3.shape, ext3.dtype),
        jax.ShapeDtypeStruct(exto3.shape, exto3.dtype),
        jax.ShapeDtypeStruct((C, rp, cp), jnp.int32),
    )
    in_specs = [sspec(), sspec(), sspec(),
                any_spec,                                   # bk3
                pl.BlockSpec((2 * dim, tile_rows, tile_cols),
                             lambda c, t: (0, t, 0),
                             memory_space=pltpu.VMEM),      # masks
                any_spec, any_spec]                         # ext3, exto3
    out_specs = (any_spec, any_spec,
                 pl.BlockSpec((1, tile_rows, tile_cols),
                              lambda c, t: (c, t, 0)))
    scratch = [
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # own_s (also out)
        pltpu.VMEM((1, TR, TC), jnp.int32),                # occ_s
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # don_s
        pltpu.VMEM((1, TR, TC), jnp.int32),                # docc_s
        pltpu.VMEM((2 * nmax, TR, TC), jnp.float32),       # xk_s
        pltpu.VMEM((1, TR, TC), jnp.int32),                # myk_s
        pltpu.VMEM((1, TR, TC), jnp.int32),                # recv_s
        pltpu.VMEM((dim, PN, LR, 128), jnp.float32),       # sup_pos
        pltpu.VMEM((dim, LR, 128), jnp.int32),             # sup_occ
        pltpu.VMEM((dim, TR, TC), jnp.int32),              # bk_s
        pltpu.VMEM((PN, TR, TC), jnp.float32),             # out_s
        pltpu.SemaphoreType.DMA((2 + 3 * dim + 2,)),
    ]
    vmem_bytes = 4 * (4 * PN * T + dim * (PN + 1) * L + 2 * nmax * T
                      + (6 + dim) * T
                      + 2 * dim * T) + 8 * 1024 * 1024

    ext3_n, exto3_n, ovf_map = pl.pallas_call(
        shift_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # floor at 32M: the analytic estimate undercounts Mosaic's
            # internal temporaries in 3D (observed 15.48M actual vs 13.7M
            # estimated at lj3d 1M tile_rows=16 — a compile-time scoped-vmem
            # OOM, docs/PERF.md round 4)
            vmem_limit_bytes=min(max(vmem_bytes, 32 * 1024 * 1024),
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(axis_arr, dir_arr, d_arr, bk3, masks_p, ext3, exto3)
    return ext3_n, exto3_n, ovf_map


def _refresh_all(cfg: SimConfig, ext3: jax.Array, exto3: jax.Array,
                 tile_rows: int, tile_cols: int
                 ) -> tuple[jax.Array, jax.Array]:
    """Re-mirror every color's aprons (static colors — one vector op per
    sliver) after the shift kernel wrote only the flat regions."""
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    C = cfg.n_colors
    PN = ext3.shape[1]
    v = ext3.reshape(C, PN, W)
    o = exto3.reshape(C, W)
    if _use_sliver(cfg, tile_rows, tile_cols):
        l_tail = W - M2 - P
        v = v.at[:, :, 0:M2].set(v[:, :, P:P + M2])
        v = v.at[:, :, M2 + P:].set(v[:, :, M2:M2 + l_tail])
        o = o.at[:, 0:M2].set(o[:, P:P + M2])
        o = o.at[:, M2 + P:].set(o[:, M2:M2 + l_tail])
    else:
        v = _ring_one(v[:, :, M2:M2 + P], P, M2, W)
        o = _ring_one(o[:, M2:M2 + P], P, M2, W)
    return v.reshape(ext3.shape), o.reshape(exto3.shape)


def run_sweeps_ring_impl(cfg: SimConfig, pot: Potential, state: SimState,
                         n_sweeps: int, tile_rows: int = 16,
                         tile_cols: int = 128, interpret: bool = False,
                         neighbor_unroll: int = 1, slot_group: int = 8,
                         in_kernel_rng: bool = False, ih_k: int = 0,
                         shard_fold: int | None = None,
                         pallas_shift: bool = True,
                         frozen_cache: bool = False,
                         one_call: bool = False
                         ) -> tuple[SimState, "xla_sweep.SweepMetrics"]:
    """run_sweeps on the in-place ring engine (single chip).

    Per sweep: n_colors aliased in-place kernel calls + tiny apron-sliver
    refreshes + the grid shift (ring-native Pallas merge when
    ``pallas_shift``, else the flat XLA merge) — no other XLA state work.
    ``one_call=True`` collapses the n_colors kernel calls into ONE
    pallas_call whose grid carries the sub-step index (ring_sweep_onecall;
    requires the in-kernel-mirror geometry).  Bitwise-equal trajectories
    to run_sweeps_fused in every mode (same schedule tree, same substep
    streams; tests/test_pallas_ring.py)."""
    n_colors = cfg.n_colors
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    ext3, exto3 = _ring_state(cfg, state.pos, state.occ, tile_rows,
                              tile_cols)
    pos_shape = state.pos.shape
    n_m = cfg.n_moves

    def sweep_body(carry, _):
        ext3, exto3, key, sweep, ovf_acc = carry
        key_sweep = jax.random.fold_in(key, sweep)
        k_perm, k_axis, k_dist, k_sub = jax.random.split(key_sweep, 4)
        if shard_fold is not None:
            k_sub = jax.random.fold_in(k_sub, shard_fold)
        perm = jax.random.permutation(k_perm, n_colors)
        focc_all = exto3.reshape(n_colors, W)[:, M2:M2 + P]
        nprop_all = n_m * jnp.sum((focc_all > 0).astype(jnp.int32), axis=1)

        if one_call:
            ext3, de, n_acc = ring_sweep_onecall(
                cfg, pot, ext3, exto3, perm, k_sub,
                tile_rows=tile_rows, tile_cols=tile_cols,
                interpret=interpret, neighbor_unroll=neighbor_unroll,
                slot_group=slot_group, in_kernel_rng=in_kernel_rng,
                ih_k=ih_k, frozen_cache=frozen_cache)
            n_prop = jnp.sum(nprop_all)        # order-independent total
        else:
            def color_body(i, carry2):
                e3, de, na, np_ = carry2
                c = perm[i]
                k = jax.random.fold_in(k_sub, i)
                e3, de_i, na_i = ring_color_substep(
                    cfg, pot, e3, exto3, c, k,
                    tile_rows=tile_rows, tile_cols=tile_cols,
                    interpret=interpret, neighbor_unroll=neighbor_unroll,
                    slot_group=slot_group, in_kernel_rng=in_kernel_rng,
                    ih_k=ih_k, frozen_cache=frozen_cache)
                if not _mirror_in_kernel(cfg, tile_rows, tile_cols):
                    e3 = _refresh_color(cfg, e3, c, tile_rows, tile_cols)
                return e3, de + de_i, na + na_i, np_ + nprop_all[c]

            zf = jnp.zeros((), jnp.float32)
            zi = jnp.zeros((), jnp.int32)
            ext3, de, n_acc, n_prop = jax.lax.fori_loop(
                0, n_colors, color_body, (ext3, zf, zi, zi))

        axis = jax.random.randint(k_axis, (), 0, cfg.dim)
        d = jax.random.uniform(k_dist, (),
                               minval=-cfg.cell_width / 2.0,
                               maxval=cfg.cell_width / 2.0)
        do_shift = (sweep + 1) % cfg.shift_every == 0

        def with_shift():
            nmax = cfg.nmax
            PN = ext3.shape[1]
            if pallas_shift:
                e3, eo3, ovf_map = ring_shift(
                    cfg, ext3, exto3, axis, d, PN // nmax,
                    tile_rows=tile_rows, tile_cols=tile_cols,
                    interpret=interpret)
                e3, eo3 = _refresh_all(cfg, e3, eo3, tile_rows, tile_cols)
                return e3, eo3, jnp.sum(ovf_map) > 0
            fpos = ext3.reshape(n_colors, PN, W)[..., M2:M2 + P].reshape(
                n_colors, PN // nmax, nmax, P)
            focc = exto3.reshape(n_colors, W)[..., M2:M2 + P]
            pos2, occ2, ovf2 = cells.shift_rebin(
                cfg, fpos, focc, axis, d, xla_sweep.roll_shift_fn, None)
            e3, eo3 = _ring_state(cfg, pos2, occ2, tile_rows, tile_cols)
            return e3, eo3, ovf2

        def no_shift():
            return ext3, exto3, jnp.any(exto3 < 0)

        if cfg.shift_every == 1:
            # shift every sweep (the production schedule): skip the cond —
            # XLA stack-allocates a pallas_call's outputs inside a cond
            # branch, which OOMs scoped vmem for 3D ring states (observed:
            # "Ran out of memory in memory space vmem ... on stack for
            # %branch_1_fun" at lj3d 1M, tile_rows=16)
            ext3_n, exto3_n, ovf = with_shift()
        else:
            ext3_n, exto3_n, ovf = jax.lax.cond(do_shift, with_shift,
                                                no_shift)
        m = xla_sweep.SweepMetrics(de, n_acc, n_prop, ovf)
        return (ext3_n, exto3_n, key, sweep + 1, ovf_acc | ovf), m

    carry = (ext3, exto3, state.key, state.sweep, state.overflow)
    carry, metrics = jax.lax.scan(sweep_body, carry, length=n_sweeps)
    ext3, exto3, _, sweep, ovf = carry
    pos, occ = _unring_state(cfg, ext3, exto3, tile_rows, tile_cols)
    state = dataclasses.replace(state, pos=pos.reshape(pos_shape), occ=occ,
                                sweep=sweep, overflow=ovf)
    return state, metrics


@partial(jax.jit, static_argnums=(0, 1) + tuple(range(3, 15)))
def run_sweeps_ring(cfg: SimConfig, pot: Potential, state: SimState,
                    n_sweeps: int, tile_rows: int = 16, tile_cols: int = 128,
                    interpret: bool = False, neighbor_unroll: int = 1,
                    slot_group: int = 8, in_kernel_rng: bool = False,
                    ih_k: int = 0, shard_fold: int | None = None,
                    pallas_shift: bool = True, frozen_cache: bool = False,
                    one_call: bool = False
                    ) -> tuple[SimState, "xla_sweep.SweepMetrics"]:
    """Jitted entry for the in-place ring engine (see run_sweeps_ring_impl)."""
    return run_sweeps_ring_impl(cfg, pot, state, n_sweeps, tile_rows,
                                tile_cols, interpret, neighbor_unroll,
                                slot_group, in_kernel_rng, ih_k, shard_fold,
                                pallas_shift, frozen_cache, one_call)
