"""Fused Pallas TPU sub-sweep kernel — the hot loop (SURVEY.md §7 step 4).

TPU-native replacement for the reference's ``subSweep`` CUDA kernel
(kernel.cu:209-435).  Where the reference assigns a 1000-thread block per cell
and reduces pair energies through shared memory (kernel.cu:353-379), this
kernel lays the *cells* out on the VPU lanes:

  * state is re-laid as coordinate planes ``[dim*nmax, R, C]`` (one (R, C)
    cell-grid plane per slot coordinate; R = flattened leading block axes,
    C = last block axis on the 128-wide lane dimension);
  * the 3^dim-1 neighbor slabs (pre-rolled by XLA from the other color
    blocks, which are frozen during the sub-sweep) come in as
    ``[dim*K*nmax, R, C]`` planes;
  * one grid step owns a (TR, TC) tile of cells and runs the full n_M-move
    Metropolis chain for all of them entirely in VMEM/registers — per-pair
    work is an unrolled loop of [TR, TC] vector ops, so every lane is a cell
    advancing its own chain in lock-step;
  * per-cell dE / acceptance accumulate into [R, C] output maps (the
    reference's d_Eblocks equivalent, kernel.cu:248/415, without the
    per-launch D2H copy).

Randomness comes from the same ``substep_randoms`` Threefry tensors as the
XLA path, so for hard-core models (accept decisions without FP accumulation
order) the two engines are bitwise identical — the strongest possible kernel
test.

For pure hard-core models the kernel skips energy evaluation entirely
(overlap test on the new position only), roughly halving the pair work; for
smooth potentials it evaluates old/new energies with the exact masked sums
(no dropped reduction strides — SURVEY.md Q1).
"""

from __future__ import annotations

import dataclasses
import math
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
from mcjax.ops.cells import ShiftFn, roll_shift_fn


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lane_pad_ratio(trailing: int) -> float:
    """XLA pads the minor axis to 128 lanes; ratio of physical to logical."""
    return _round_up(trailing, 128) / trailing


def _uniform_01(bits):
    """Top-24-bit random word -> f32 uniform in [0, 1) (exact ulp spacing).

    prng_random_bits returns int32 words; mask the sign bit away via the
    unsigned view before the shift.  Mosaic has no uint32->f32 cast, so the
    shifted word (top 8 bits zero) is bitcast back to int32 — same value —
    before the int32->f32 convert."""
    u = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    u = jax.lax.shift_right_logical(u, jnp.uint32(8))
    return (jax.lax.bitcast_convert_type(u, jnp.int32)
            ).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


# Uniforms summed per Irwin-Hall gaussian component (in-kernel RNG).  The
# sum is rescaled to variance step^2 regardless of K, and any K keeps the
# proposal symmetric (Metropolis needs nothing more), so K only trades tail
# extent (+-sqrt(3K) sigma) against draw cost: 3D gaussian moves pay
# dim*K + 2 prng_random_bits planes per move.  K=8 measured ~parity with
# K=12 on lj3d (docs/PERF.md round 3 cont.); 12 stays the default for its
# longer tails.  Module-level so harnesses (bench.py --ih-k) can override
# BEFORE tracing; it is read at trace time, not kernel-call time.
IH_K = 12

# Profiling-only ablation switch (scripts/profile_fused.py). The axon tunnel
# exposes no jax profiler, so kernel cost attribution is done by compiling
# variants with one stage disabled and differencing wall times.  Read at
# TRACE time and NOT part of any jit cache key: set it only in a fresh
# subprocess (the profile script does).  Values:
#   ""        - production kernel
#   "kernel"  - DMA in, then copy own planes out (no compose, no moves)
#   "dma"     - skip the apron DMAs (scratch garbage; wrong physics)
#   "compose" - skip the neighbor window composition (nbrs garbage)
#   "rolls"   - compose without lane rotations/edge corrections
#   "rng"     - in-kernel draws replaced by a constant plane
#   "pairs"   - moves run but all pair loops skipped (de=0, no overlap)
# run-loop level (run_sweeps_fused):
#   "call"    - skip the pallas_call entirely (own planes pass through)
#   "ringup"  - skip the per-substep one-color ring update
#   "shift"   - never grid-shift
ABLATE = ""


def _ih_k() -> int:
    if not (isinstance(IH_K, int) and 2 <= IH_K <= 64):
        raise ValueError(f"IH_K must be an int in [2, 64], got {IH_K!r}")
    return IH_K


def _make_kernel(cfg: SimConfig, pot: Potential, n_k: int,
                 beta_static: float | None, neighbor_unroll: int = 1,
                 slot_group: int = 8, use_scale: bool = False,
                 in_kernel_rng: bool = False, field=None, ih_k: int = 0,
                 frozen_cache: bool = False):
    """Build the kernel body (closure over static config/potential).

    ILP design (round 3): pair slots are processed in GROUPS of
    ``slot_group`` as [G, TR, TC] block ops. A [G, TR, TC] vector op lowers
    to G back-to-back instructions whose sub-results are independent, so the
    hardware pipelines G dependency chains at issue rate — where the old
    one-slot-per-statement form serialized each slot's ~21-op chain
    (microbench: ~16-25 cyc/slot against a ~0.4-0.7 cyc marginal vector op,
    docs/PERF.md round 2b). dE/overlap accumulate into [G, TR, TC] lane
    accumulators (tree-reduced once per move); the moving-particle select
    and write-back use the same grouped form (masked-sum select — the exact
    arithmetic of the XLA engine's one-hot sum, sweep.py color_substep).

    The neighbor pair loop is fully unrolled for small neighborhoods (2D:
    8 cells — best runtime) but becomes a ``fori_loop`` over the
    neighbor-cell index for 3D (26 cells), where a full unroll makes Mosaic
    compilation take tens of minutes; ``neighbor_unroll`` partially unrolls
    it (grouping already cuts the statement count ~G-fold).
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    w = cfg.cell_width
    hard = pot.has_hard_core
    # ``pair_energetic`` gates the pair-energy accumulators (the expensive
    # per-slot math); ``energetic`` additionally turns on the Metropolis
    # exp test + acceptance-uniform consumption when an external one-body
    # field contributes energy over a hard-core pair model (mirrors the XLA
    # engine's has_energy, sweep.py color_substep).
    pair_energetic = pot.has_energy
    use_field = field is not None
    field_energetic = use_field and field.has_energy
    energetic = pair_energetic or field_energetic
    # full static unroll when asked (neighbor_unroll >= n_k): slower Mosaic
    # compile, but every plane index becomes static
    unroll_neighbors = n_k <= 8 or neighbor_unroll >= n_k
    G = max(1, min(slot_group, nmax))
    # slot groups within one cell's nmax slots: [(j0, size), ...]; the tail
    # group (size < G) gets its own accumulator pair so every grouped op has
    # a static shape
    groups = [(j0, min(G, nmax - j0)) for j0 in range(0, nmax, G)]
    tail = nmax % G
    # Kernel-optimized pair energy where the model provides one (LJ family:
    # Newton-refined approximate reciprocal instead of a serializing exact
    # divide — 2 divides/slot were the largest single cost of the LJ kernel).
    # Mixtures: the species id rides as slab plane ``dim`` (mcjax.ops.mixture)
    # and pair terms resolve per species pair; binary mixtures blend per-pair
    # coefficients by u = s_i + s_j (one evaluation — mixtures._poly3).
    mixture = getattr(pot, "is_mixture", False)
    n_planes = dim + (1 if mixture else 0)
    if mixture:
        pair_s_fn = getattr(pot, "pair_energy_s_pl", pot.pair_energy_s)
        overlap_s_fn = pot.overlap_s
        pair_fn = None
    else:
        pair_fn = getattr(pot, "pair_energy_pl", pot.pair_energy)
    # Binary-mixture mover hoist (round 5): the mover's species is fixed
    # within a move, so the quadratic u-blends collapse to per-move planes
    # + one fma in sj per pair slot (mixtures.pair_energy_mover_pl).  fp
    # rounding differs from the unhoisted blend (dE-anchor gated, not
    # bitwise) — overlap keeps the unhoisted blend for cross-engine
    # hard-core bitwise parity.
    hoist = (mixture and pair_energetic
             and getattr(pot, "supports_mover_hoist", False))

    # Frozen-neighbor energy cache (round 4, VERDICT r3 #3): during a color
    # sub-step the 3^dim-1 neighbor cells are FROZEN, so each own slot's
    # pair energy against them is a per-substep constant between its own
    # moves.  Precompute it once (nmax x n_k x nmax evals, fori over k) and
    # per move evaluate only u(new) over the frozen cells: the old-energy
    # half of the pair work (the dominant slope term in 3D — 0.45 ms/move-
    # round vs ~0.16 entitlement, docs/PERF.md round 3) disappears.  On
    # accept the cache entry is replaced by the freshly computed new-frozen
    # sum, so no fp error accumulates across moves.  Worth it when
    # n_m >> nmax (the precompute costs ~nmax/n_m of the saved work);
    # changes dE summation ORDER only (same terms) — trajectories of
    # energetic potentials are statistically identical but not bitwise vs
    # the uncached kernel, so this stays an opt-in static flag gated by the
    # dE-anchor test (tests/test_pallas_frozen.py).
    # Reference analogue: the per-move old+new energy pair loop this halves,
    # CUDA-Parallel-MC kernel.cu:315-379.
    frozen_on = frozen_cache and pot.has_energy and ABLATE != "pairs"
    if frozen_on:
        np_check = dim + (1 if getattr(pot, "is_mixture", False) else 0)
        if (np_check * nmax) % 8 != 0:
            # The precompute's fori-k dynamic-slice starts are
            # k*(n_planes*nmax) + static; Mosaic faults the worker at
            # runtime when that DYNAMIC part is not 8-row aligned (probed:
            # lj3d nmax=24 -> 72/k aligned, runs; nmax=38 -> 114/k
            # misaligned, crashes the TPU worker; docs/PERF.md round 4).
            raise ValueError(
                f"frozen_cache requires (n_planes*nmax) % 8 == 0 for the "
                f"fori-k precompute's dynamic slices (got n_planes="
                f"{np_check}, nmax={nmax}); pad nmax up")

    gaussian = cfg.proposal == "gaussian"
    step = cfg.step_size
    # uniforms per Irwin-Hall gaussian component (ik-RNG): the explicit
    # ``ih_k`` argument (threaded from run_sweeps_pallas's jit cache key)
    # wins; 0 falls back to the module default IH_K
    if ih_k:
        if not (isinstance(ih_k, int) and 2 <= ih_k <= 64):
            raise ValueError(f"ih_k must be an int in [2, 64], got {ih_k!r}")
        IH_K = ih_k
    else:
        IH_K = _ih_k()

    def body(own_ref, occ_ref, nbr_ref, nbrocc_ref, lb_ref, pick_ref,
             disp_ref, accu_ref, seed_ref, beta_ref, scale2_ref,
             out_ref, de_ref, acc_ref, origin_ref=None):
        """The move chain on tile-local refs.  ``nbr_ref``/``nbrocc_ref``
        may be pipeline input blocks (classic path) or VMEM scratch filled
        by in-kernel DMA (fused path) — identical layout either way."""
        if in_kernel_rng:
            # per-core stream: (substep key data, tile coordinates) — the
            # same (key, sweep, color, shard) tree as the host-Threefry path
            # selects the sequence; tiles decorrelate via the linear tile id
            # folded into both seed words (Mosaic caps prng_seed at 2 values).
            # ``seed_ref`` may instead be a (s0, s1, tid) scalar tuple when
            # the caller selects the substep seed itself (the single-call
            # sweep kernel, whose grid carries the color-substep index) —
            # tid must then reproduce this default so streams stay bitwise
            # identical across engines.
            if isinstance(seed_ref, tuple):
                s0, s1, tid = seed_ref
            else:
                tid = (pl.program_id(0) * pl.num_programs(1)
                       + pl.program_id(1))
                s0, s1 = seed_ref[0, 0], seed_ref[0, 1]
            pltpu.prng_seed(
                s0 + tid * jnp.int32(-1640531527),  # golden ratio
                s1 ^ (tid + jnp.int32(0x3C6EF372)))
        occ = occ_ref[0]                      # [TR, TC] int32
        occf = occ.astype(jnp.float32)
        nonempty = occ > 0
        out_ref[:] = own_ref[:]
        beta = beta_static if beta_static is not None else beta_ref[0, 0]
        # NPT stored-frame convention: physical r^2 = s^2 * stored r^2
        # (mcjax.ops.npt); scale2_ref is an SMEM scalar, absent from the
        # compiled NVT program entirely (use_scale is static)
        s2 = scale2_ref[0, 0] if use_scale else None
        gshape = (G,) + occ.shape
        # per-group slot index [g, TR, TC] (hoisted: same for every move)
        giota = jax.lax.broadcasted_iota(jnp.int32, gshape, 0)
        giota_t = giota[:tail] if tail else None

        def acc_pair(ov_dtype):
            """Fresh (main, tail) accumulator pairs for one move."""
            de_p = ((jnp.zeros(gshape, jnp.float32),
                     jnp.zeros((tail,) + occ.shape, jnp.float32) if tail
                     else None) if pair_energetic else (None, None))
            ov_p = ((jnp.zeros(gshape, ov_dtype),
                     jnp.zeros((tail,) + occ.shape, ov_dtype) if tail
                     else None) if hard else (None, None))
            return de_p, ov_p

        def move_body(m, carry):
            if frozen_on:
                de_acc, acc_acc = carry[0], carry[1]
                ef = carry[2:]
            else:
                de_acc, acc_acc = carry
            if in_kernel_rng:
                # Draws per move: pick, accept, then displacement randoms,
                # ONE [TR, TC] plane per prng_random_bits call.  A single
                # multi-plane draw is NOT safe: with a (6, TR, TC) request
                # (3D gaussian) the generated planes were measured
                # inconsistent between their consumers — the dE-anchor
                # identity (trace == exact energy delta) drifted rel ~1e-1,
                # bit-identical under full unroll / exact divide / scratch
                # round-trips, while the (4,...) 2D-gaussian and (5,...)
                # 3D-uniform draws stayed clean at ~1e-5.  Per-plane draws
                # restore the anchor (scripts/validate_in_kernel_rng.py).
                if ABLATE == "rng":
                    def draw():
                        return jnp.full(occ.shape, 0.37, jnp.float32)
                else:
                    def draw():
                        return _uniform_01(pltpu.prng_random_bits(occ.shape))

                pick = draw()
                # pure hard-core accept rule never reads a uniform — skip
                # the draw entirely (the host-RNG path does the same via
                # need_acc; NOT a stream-compatible change vs earlier
                # rounds' in-kernel runs, which drew and discarded it)
                accu_m = draw() if energetic else None
                disp_m = []
                if gaussian:
                    # Irwin-Hall sum of IH_K uniforms per component
                    # (variance IH_K/12) instead of Box-Muller: Metropolis
                    # only requires a SYMMETRIC proposal, and adds beat 4
                    # transcendentals; bounded tails (+-sqrt(3 IH_K) sigma).
                    #
                    # Round 5: TWO 16-bit uniforms per hardware word — the
                    # IH summands need no 24-bit resolution (each word w
                    # maps to the exactly-symmetric (w + 0.5) * 2^-16, and
                    # the integer partial sums are f32-exact up to K=64),
                    # halving the prng_random_bits calls: 3D draws per
                    # move drop 2 + 3K -> 2 + 3*ceil(K/2) (K=8: 26 -> 14).
                    # Reading both halves of ONE generated word is plain
                    # register arithmetic — unrelated to the round-3
                    # multi-plane generation fault (one plane per call
                    # stays the rule).  Not stream-compatible with earlier
                    # rounds; gated statistically like every ik-RNG change
                    # (scripts/validate_in_kernel_rng.py).
                    scale_ih = jnp.float32(step * math.sqrt(12.0 / IH_K))
                    for d in range(dim):
                        if ABLATE == "rng":
                            parts = [jnp.full(occ.shape, 0.37 * 65536.0,
                                              jnp.float32)
                                     for _ in range(IH_K)]
                        else:
                            parts = []
                            for _ in range((IH_K + 1) // 2):
                                wbits = pltpu.prng_random_bits(occ.shape)
                                u = jax.lax.bitcast_convert_type(
                                    wbits, jnp.uint32)
                                hi = jax.lax.shift_right_logical(
                                    u, jnp.uint32(16))
                                lo = jax.lax.bitwise_and(
                                    u, jnp.uint32(0xFFFF))
                                for v in (hi, lo):
                                    parts.append(jax.lax.bitcast_convert_type(
                                        v, jnp.int32).astype(jnp.float32))
                            parts = parts[:IH_K]
                        while len(parts) > 1:  # pairwise tree sum
                            parts = [parts[i] + parts[i + 1]
                                     for i in range(0, len(parts) - 1, 2)
                                     ] + (parts[-1:] if len(parts) % 2
                                          else [])
                        # sum(w_i + 0.5)*2^-16 - K/2, folded into one fma
                        disp_m.append(
                            scale_ih * jnp.float32(1.0 / 65536.0) * parts[0]
                            - scale_ih * jnp.float32(
                                IH_K * (0.5 - 1.0 / 131072.0)))
                else:
                    for d in range(dim):
                        disp_m.append(step * (2.0 * draw() - 1.0))
            else:
                pick = pick_ref[m]
                accu_m = None
                disp_m = None
            p = jnp.floor(pick * occf).astype(jnp.int32)
            p = jnp.minimum(p, jnp.maximum(occ - 1, 0))

            # select the moving particle's coordinates: grouped masked-sum
            # over slots (exactly one slot matches p, zeros elsewhere — the
            # same arithmetic as the XLA engine's one-hot sum); for mixtures
            # also its species (plane ``dim``)
            old = []
            for d in range(n_planes):
                v = None
                for j0, g in groups:
                    blk = out_ref[d * nmax + j0:d * nmax + j0 + g]
                    ji = (giota if g == G else giota_t)
                    sel = ji == (p - j0)[None]
                    # explicit pairwise tree, not an axis-reduce — Mosaic
                    # lowers the tree as plain vector adds
                    part = _sum0(jnp.where(sel, blk, 0.0))
                    v = part if v is None else v + part
                old.append(v)
            sx = old[dim] if mixture else None
            old = old[:dim]
            if mixture:
                if hoist:
                    peval = pot.pair_energy_mover_pl(sx)
                else:
                    def peval(r2, sj):
                        return pair_s_fn(r2, sx[None], sj)
            else:
                peval = None
            if in_kernel_rng:
                new = [old[d] + disp_m[d] for d in range(dim)]
            else:
                new = [old[d] + disp_ref[m * dim + d] for d in range(dim)]

            # in-cell rejection (detailed balance; kernel.cu:192-206)
            oob = jnp.zeros_like(nonempty)
            for d in range(dim):
                lb = lb_ref[d]
                oob = oob | (new[d] < lb) | (new[d] >= lb + w)

            # external one-body field: evaluated at PHYSICAL x =
            # wrap(stored + origin) — the grid-shift frame offset rides in
            # as SMEM scalars (mcjax.ops.extfield owns the origin update;
            # same formula as the XLA engine, sweep.py color_substep).
            de_field = None
            banned = None
            if use_field:
                from mcjax.models import fields as _fields
                box = jnp.float32(cfg.box_length)
                half = jnp.float32(cfg.box_length / 2.0)

                def phys(xs):
                    return jnp.stack(
                        [jnp.mod(xs[d] + origin_ref[0, d] + half, box) - half
                         for d in range(dim)])

                px_new = phys(new)
                if field_energetic:
                    px_old = phys(old)
                    de_field = (_fields.species_energy(field, px_new, sx)
                                - _fields.species_energy(field, px_old, sx))
                banned = _fields.species_forbidden(field, px_new, sx)

            # Mosaic's scf.for fails to legalize pure-i1 vector carries, so
            # the fori path accumulates overlap as int32 (0/1) instead of bool
            ov_dtype = jnp.bool_ if unroll_neighbors else jnp.int32
            de_parts, ov_parts = acc_pair(ov_dtype)

            # No minimum-image arithmetic: neighbor planes are pre-unwrapped
            # across the periodic boundary (cells.neighbor_stack) and own-cell
            # pairs share a cell, so raw differences are already minimal.
            def accumulate(is_tail, xs_old, xs_new, valid, de_parts, ov_parts,
                           sj=None):
                """One grouped pair evaluation: everything is [g, TR, TC].
                ``xs_old is None`` accumulates u(new) alone (frozen-cache
                mode: the old half comes from the per-substep cache)."""
                a = 1 if is_tail else 0
                r2n = xs_new[0] * xs_new[0]
                for d in range(1, dim):
                    r2n = r2n + xs_new[d] * xs_new[d]
                if use_scale:
                    r2n = s2 * r2n
                if pair_energetic:
                    if xs_old is None:
                        term = peval(r2n, sj) if mixture else pair_fn(r2n)
                    else:
                        r2o = xs_old[0] * xs_old[0]
                        for d in range(1, dim):
                            r2o = r2o + xs_old[d] * xs_old[d]
                        if use_scale:
                            r2o = s2 * r2o
                        if mixture:
                            term = peval(r2n, sj) - peval(r2o, sj)
                        else:
                            term = pair_fn(r2n) - pair_fn(r2o)
                    upd = de_parts[a] + jnp.where(valid, term, 0.0)
                    de_parts = (de_parts[0], upd) if is_tail \
                        else (upd, de_parts[1])
                if hard:
                    ov = (overlap_s_fn(r2n, sx[None], sj) if mixture
                          else pot.overlap(r2n))
                    term_ov = (valid & ov).astype(ov_dtype)
                    upd = ov_parts[a] | term_ov
                    ov_parts = (ov_parts[0], upd) if is_tail \
                        else (upd, ov_parts[1])
                return de_parts, ov_parts

            # neighbor-cell pairs (frozen during the sub-sweep); plane order
            # matches the native neighbor_stack layout [K, n_planes, nmax, ...]
            def nbr_cell_pairs(k, de_parts, ov_parts):
                nocc = nbrocc_ref[k]
                for j0, g in groups:
                    is_tail = g != G
                    ji = giota_t if is_tail else giota
                    valid = ji < (nocc - j0)[None]
                    xs_old, xs_new = [], []
                    for d in range(dim):
                        # pl.ds: k is a tracer on the fori_loop path
                        base = (k * n_planes + d) * nmax + j0
                        nb = nbr_ref[pl.ds(base, g)]
                        if not frozen_on:
                            xs_old.append(old[d][None] - nb)
                        xs_new.append(new[d][None] - nb)
                    if frozen_on:
                        xs_old = None
                    if mixture:
                        base = (k * n_planes + dim) * nmax + j0
                        sj = nbr_ref[pl.ds(base, g)]
                    else:
                        sj = None
                    de_parts, ov_parts = accumulate(
                        is_tail, xs_old, xs_new, valid, de_parts, ov_parts,
                        sj)
                return de_parts, ov_parts

            def flatten(de_parts, ov_parts):
                return tuple(x for x in de_parts + ov_parts if x is not None)

            def unflatten(flat):
                it = iter(flat)
                de_p = ((next(it), next(it) if tail else None)
                        if pair_energetic else (None, None))
                ov_p = ((next(it), next(it) if tail else None)
                        if hard else (None, None))
                return de_p, ov_p

            if ABLATE == "pairs":
                pass  # profiling: move loop without any pair work
            elif unroll_neighbors:
                for k in range(n_k):
                    de_parts, ov_parts = nbr_cell_pairs(k, de_parts, ov_parts)
            else:
                # manual partial unroll (Mosaic's fori_loop only lowers
                # unroll=1 or full): u bodies per iteration + static tail
                u = max(1, min(neighbor_unroll, n_k))

                def k_block(b, c):
                    dp, op = unflatten(c)
                    for uu in range(u):
                        dp, op = nbr_cell_pairs(b * u + uu, dp, op)
                    return flatten(dp, op)

                flat = jax.lax.fori_loop(0, n_k // u, k_block,
                                         flatten(de_parts, ov_parts))
                de_parts, ov_parts = unflatten(flat)
                for k in range((n_k // u) * u, n_k):
                    de_parts, ov_parts = nbr_cell_pairs(k, de_parts, ov_parts)

            # own-cell pairs (excluding the moving particle) — in frozen-
            # cache mode these go to FRESH dE accumulators (the neighbor
            # accumulators must reduce to the pure new-frozen sum, which
            # becomes the accepted particle's cache entry)
            if frozen_on:
                own_de_parts = acc_pair(ov_dtype)[0]
            else:
                own_de_parts = de_parts
            for j0, g in (() if ABLATE == "pairs" else groups):
                is_tail = g != G
                ji = giota_t if is_tail else giota
                valid = (ji < (occ - j0)[None]) & (ji != (p - j0)[None])
                xs_old, xs_new = [], []
                for d in range(dim):
                    base = d * nmax + j0
                    nb = out_ref[base:base + g]
                    xs_old.append(old[d][None] - nb)
                    xs_new.append(new[d][None] - nb)
                sj = (out_ref[dim * nmax + j0:dim * nmax + j0 + g]
                      if mixture else None)
                own_de_parts, ov_parts = accumulate(
                    is_tail, xs_old, xs_new, valid, own_de_parts, ov_parts,
                    sj)
            if not frozen_on:
                de_parts = own_de_parts

            # reduce the [G, TR, TC] lane accumulators once per move
            def lane_reduce(parts, red):
                main, tl = parts
                out = red(main)
                if tl is not None:
                    out = (out | red(tl)) if red is _any0 else out + red(tl)
                return out

            if frozen_on:
                # cached old-frozen energy of the moving slot p
                parts = [jnp.where(p == j, ef[j], 0.0) for j in range(nmax)]
                while len(parts) > 1:
                    parts = [parts[i] + parts[i + 1]
                             if i + 1 < len(parts) else parts[i]
                             for i in range(0, len(parts), 2)]
                e_old_froz = parts[0]
                e_new_froz = lane_reduce(de_parts, _sum0)
                de = (e_new_froz - e_old_froz
                      + lane_reduce(own_de_parts, _sum0))
            elif pair_energetic:
                de = lane_reduce(de_parts, _sum0)
            else:
                de = jnp.zeros_like(occf)
            ov_new = (lane_reduce(ov_parts, _any0) > 0 if hard
                      else jnp.zeros_like(nonempty))
            if de_field is not None:
                de = de + de_field
            accept = nonempty & jnp.logical_not(oob)
            if hard:
                accept = accept & jnp.logical_not(ov_new)
            if banned is not None:
                accept = accept & jnp.logical_not(banned)
            if energetic:
                acc_u = accu_m if in_kernel_rng else accu_ref[m]
                accept = accept & (acc_u < jnp.exp(-beta * de))

            # grouped write-back of the accepted position
            for j0, g in groups:
                ji = giota_t if g != G else giota
                selj = accept[None] & (ji == (p - j0)[None])
                for d in range(dim):
                    base = d * nmax + j0
                    out_ref[base:base + g] = jnp.where(
                        selj, new[d][None], out_ref[base:base + g])

            de_acc = de_acc + jnp.where(accept, de, 0.0)
            acc_acc = acc_acc + accept.astype(jnp.int32)
            if frozen_on:
                # accepted slot's cache entry := its fresh new-frozen sum
                ef = tuple(jnp.where(accept & (p == j), e_new_froz, ef[j])
                           for j in range(nmax))
                return (de_acc, acc_acc) + ef
            return de_acc, acc_acc

        zf = jnp.zeros(occ.shape, jnp.float32)
        zi = jnp.zeros(occ.shape, jnp.int32)
        if frozen_on:
            # per-substep precompute: ef[j] = sum over the n_k frozen
            # neighbor cells' slots of u(r2(own_j, nbr)) — fori over k keeps
            # the Mosaic statement count at one cell's worth (nmax * groups
            # grouped evals) regardless of n_k
            s2_pc = scale2_ref[0, 0] if use_scale else None

            def froz_cell_k(k, ef_flat):
                ef_list = list(ef_flat)
                nocc = nbrocc_ref[k]
                for j in range(nmax):
                    own_j = [out_ref[d * nmax + j] for d in range(dim)]
                    sx_j = out_ref[dim * nmax + j] if mixture else None
                    if mixture:
                        if hoist:
                            pe_j = pot.pair_energy_mover_pl(sx_j)
                        else:
                            def pe_j(r2, sj, s=sx_j):
                                return pair_s_fn(r2, s[None], sj)
                    acc = None
                    for j0, g in groups:
                        is_tail = g != G
                        ji = giota_t if is_tail else giota
                        valid = ji < (nocc - j0)[None]
                        r2 = None
                        for d in range(dim):
                            base = (k * n_planes + d) * nmax + j0
                            xd = own_j[d][None] - nbr_ref[pl.ds(base, g)]
                            r2 = xd * xd if r2 is None else r2 + xd * xd
                        if use_scale:
                            r2 = s2_pc * r2
                        if mixture:
                            base = (k * n_planes + dim) * nmax + j0
                            sj = nbr_ref[pl.ds(base, g)]
                            u = pair_s_fn(r2, sx_j[None], sj)
                        else:
                            u = pair_fn(r2)
                        part = _sum0(jnp.where(valid, u, 0.0))
                        acc = part if acc is None else acc + part
                    ef_list[j] = ef_list[j] + acc
                return tuple(ef_list)

            ef0 = tuple(jnp.zeros(occ.shape, jnp.float32)
                        for _ in range(nmax))
            ef_init = jax.lax.fori_loop(0, n_k, froz_cell_k, ef0)
            out = jax.lax.fori_loop(0, n_m, move_body,
                                    (zf, zi) + ef_init)
            de_acc, acc_acc = out[0], out[1]
        else:
            de_acc, acc_acc = jax.lax.fori_loop(0, n_m, move_body, (zf, zi))
        de_ref[0] = de_acc
        acc_ref[0] = acc_acc

    def kernel(*refs):
        it = list(refs)
        own_ref, occ_ref, nbr_ref, nbrocc_ref, lb_ref = it[:5]
        i = 5
        if in_kernel_rng:
            seed_ref = it[i]
            i += 1
            pick_ref = disp_ref = accu_ref = None
        else:
            pick_ref, disp_ref = it[i], it[i + 1]
            i += 2
            # pure hard-core accept rule never reads a uniform — the zero
            # acceptance planes are dropped from the input stream entirely
            accu_ref = it[i] if energetic else None
            i += 1 if energetic else 0
            seed_ref = None
        beta_ref, scale2_ref = it[i], it[i + 1]
        i += 2
        origin_ref = it[i] if use_field else None
        i += 1 if use_field else 0
        out_ref, de_ref, acc_ref = it[i:i + 3]
        body(own_ref, occ_ref, nbr_ref, nbrocc_ref, lb_ref, pick_ref,
             disp_ref, accu_ref, seed_ref, beta_ref, scale2_ref,
             out_ref, de_ref, acc_ref, origin_ref)

    kernel.body = body
    return kernel


def _sum0(x):
    """Tree-fold sum over the leading (group) axis — explicit pairwise adds
    so Mosaic sees plain vector ops, no cross-lane reduction."""
    parts = [x[i] for i in range(x.shape[0])]
    while len(parts) > 1:
        parts = [parts[i] + parts[i + 1] if i + 1 < len(parts) else parts[i]
                 for i in range(0, len(parts), 2)]
    return parts[0]


def _any0(x):
    """Tree-fold bitwise-or over the leading (group) axis (bool or int32)."""
    parts = [x[i] for i in range(x.shape[0])]
    while len(parts) > 1:
        parts = [parts[i] | parts[i + 1] if i + 1 < len(parts) else parts[i]
                 for i in range(0, len(parts), 2)]
    return parts[0]


def pallas_color_substep(cfg: SimConfig, pot: Potential, color: int,
                         pos: jax.Array, occ: jax.Array, key: jax.Array,
                         shift_fn: ShiftFn = roll_shift_fn,
                         beta: jax.Array | float | None = None,
                         block_offset: jax.Array | None = None,
                         scale: jax.Array | None = None,
                         field=None,
                         origin: jax.Array | None = None,
                         *, tile_rows: int = 8, tile_cols: int = 128,
                         interpret: bool = False,
                         vma: tuple[str, ...] | None = None,
                         neighbor_unroll: int = 1,
                         slot_group: int = 8,
                         in_kernel_rng: bool = False,
                         ih_k: int = 0,
                         frozen_cache: bool = False
                         ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for sweep.color_substep backed by the Pallas kernel.

    Works standalone on one chip (shift_fn = jnp.roll) or per-shard inside
    shard_map (halo-aware shift_fn + block_offset): the kernel itself only
    sees local planes; all cross-chip traffic happens in the neighbor-stack
    build.

    ``field``/``origin`` mirror sweep.color_substep's external one-body
    field: the frame origin rides into the kernel as SMEM scalars and the
    field's dE/forbidden test evaluate in-kernel at physical coordinates.
    """
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    n_k = cfg.n_neighbors - 1

    own_occ = occ[color]
    bs = own_occ.shape                     # shard-local block shape
    n_cells = math.prod(bs)
    # On lane-padded grids (trailing block dim not a lane multiple — all 3D
    # runs), build the neighbor planes in FLAT cell space: the packed builder
    # + the flat-tiling relayout below cost ~6.4 ms per substep at 1M 3D
    # cells (~85% of sweep time; XLA pads (21,21,21) to 128 lanes), while the
    # flat builder's full-lane rolls + edge selects produce identical values
    # ~10x cheaper. Sharded runs keep the packed halo path.
    # already-flat input (run_sweeps_pallas carries state flat): rank < dim.
    # For packed input, go flat only when the lane padding is heavy (3D:
    # 21 -> 128 is 6x); for mild padding (2D 320 -> 384) the packed rolls
    # are cheaper than flat's roll+wrap-select pairs.
    is_flat_input = len(bs) < cfg.dim
    use_flat = ((is_flat_input or _lane_pad_ratio(bs[-1]) >= 1.5)
                and block_offset is None and shift_fn is roll_shift_fn)
    # mixtures carry the species id as plane ``dim`` (mcjax.ops.mixture)
    n_planes = pos.shape[1]
    if use_flat:
        fpos = pos.reshape(cfg.n_colors, n_planes, nmax, n_cells)
        focc = occ.reshape(cfg.n_colors, n_cells)
        own = fpos[color]                  # [n_planes, nmax, P]
        own_occ = focc[color]
        nbr_pos, nbr_occ = cells.flat_neighbor_stack(cfg, fpos, focc, color)
        lb = jnp.asarray(cells._flat_lower_bounds_np(cfg, color))
    else:
        own = pos[color]                   # [dim, nmax, *bs] planes layout
        nbr_pos, nbr_occ = cells.neighbor_stack(cfg, pos, occ, color,
                                                shift_fn, block_offset)
        lb = xla_sweep._cell_lower_bounds(cfg, color, bs, block_offset)
    # Generate the random tensors with a FLAT trailing cell axis: bitwise the
    # same values as the XLA engine's [*bs]-shaped draw (row-major reshape of
    # an identical stream), but at full lane occupancy — 3D block shapes like
    # (21, 21, 21) run XLA elementwise ops at ~16% of the lanes.
    # in_kernel_rng instead feeds the kernel the raw key data and draws from
    # the TPU's hardware PRNG per tile (VERDICT r2 item 2) — NOT bitwise
    # comparable to the XLA engine.  It is gated STATISTICALLY, on the real
    # TPU only (the hardware PRNG does not exist in interpret mode, so no
    # suite test covers it): scripts/validate_in_kernel_rng.py runs the
    # acceptance z-test + dE-anchor + EOS-parity checks, and bench.py re-runs
    # a quick variant every benchmark, recording ``rng_gate`` in the output.
    use_field = field is not None
    need_acc = pot.has_energy or (use_field and field.has_energy)
    if in_kernel_rng:
        pick_u = disp = acc_u = None
        seed_arr = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.int32).reshape(1, 2)
    else:
        pick_u, disp, acc_u = xla_sweep.substep_randoms(
            cfg, key, (n_cells,), need_acc=need_acc)

    # ---- flatten the cell grid into full-width lane tiles -----------------
    # Cells are independent within a color sub-sweep, so after neighbor
    # alignment (done above by the rolls) ANY repacking of the cell axes is
    # valid. Flattening to (rows, 128) keeps the VPU at full lane occupancy
    # even when the trailing block axis is small (3D grids: bs[-1] ~ 10-20,
    # which naive (prod(bs[:-1]), bs[-1]) tiling would pad ~10x).
    cp = tile_cols
    padded = _round_up(max(n_cells, tile_rows * cp), tile_rows * cp)
    rp = padded // cp

    def to_tiles(x, lead):
        x = x.reshape(lead, n_cells)
        x = jnp.pad(x, ((0, 0), (0, padded - n_cells)))
        return x.reshape(lead, rp, cp)

    own_p = to_tiles(own, n_planes * nmax)
    nbr_p = to_tiles(nbr_pos, n_k * n_planes * nmax)
    occ_p = to_tiles(own_occ, 1)
    nbrocc_p = to_tiles(nbr_occ, n_k)
    lb_p = to_tiles(lb, dim)
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
    if use_field:
        origin_arr = (jnp.zeros((1, dim), jnp.float32) if origin is None
                      else jnp.asarray(origin, jnp.float32).reshape(1, dim))
    kernel = _make_kernel(cfg, pot, n_k, beta_static, neighbor_unroll,
                          slot_group, use_scale, in_kernel_rng, field, ih_k,
                          frozen_cache)
    grid = (rp // tile_rows, cp // tile_cols)

    def bspec(lead):
        return pl.BlockSpec((lead, tile_rows, tile_cols),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    def sspec(cols=1):
        return pl.BlockSpec((1, cols), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    # under shard_map, outputs must declare their varying mesh axes
    vma_set = frozenset(vma) if vma else None
    out_shapes = (
        jax.ShapeDtypeStruct((n_planes * nmax, rp, cp), jnp.float32,
                             vma=vma_set),
        jax.ShapeDtypeStruct((1, rp, cp), jnp.float32, vma=vma_set),
        jax.ShapeDtypeStruct((1, rp, cp), jnp.int32, vma=vma_set),
    )
    # Per-tile buffer footprint x2 for the pipeline's double buffering,
    # plus slack; the compiler treats this as the scoped-vmem budget.
    vmem_bytes = 2 * 4 * tile_rows * tile_cols * (
        2 * n_planes * nmax + 1 + n_planes * n_k * nmax + n_k + dim
        + n_m * (2 + dim) + 4) + 4 * 1024 * 1024

    common_specs = [bspec(n_planes * nmax), bspec(1),
                    bspec(n_planes * n_k * nmax), bspec(n_k), bspec(dim)]
    if in_kernel_rng:
        in_specs = common_specs + [sspec(2), sspec(), sspec()]
        args = (own_p, occ_p, nbr_p, nbrocc_p, lb_p, seed_arr, beta_arr,
                scale2_arr)
    elif need_acc:
        in_specs = common_specs + [bspec(n_m), bspec(n_m * dim), bspec(n_m),
                                   sspec(), sspec()]
        args = (own_p, occ_p, nbr_p, nbrocc_p, lb_p, pick_p, disp_p, accu_p,
                beta_arr, scale2_arr)
    else:
        in_specs = common_specs + [bspec(n_m), bspec(n_m * dim),
                                   sspec(), sspec()]
        args = (own_p, occ_p, nbr_p, nbrocc_p, lb_p, pick_p, disp_p,
                beta_arr, scale2_arr)
    if use_field:
        in_specs = in_specs + [sspec(dim)]
        args = args + (origin_arr,)

    own_new_p, de_map, acc_map = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bspec(n_planes * nmax), bspec(1), bspec(1)),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 120 * 1024 * 1024)),
        interpret=interpret,
    )(*args)

    # ---- unpad; output is already in the canonical planes layout ----------
    own_new = own_new_p.reshape(n_planes * nmax, padded)[:, :n_cells]
    own_new = own_new.reshape(n_planes, nmax, *bs)
    de = jnp.sum(de_map)
    n_acc = jnp.sum(acc_map)
    n_prop = n_m * jnp.sum((own_occ > 0).astype(jnp.int32))
    return own_new, de, n_acc, n_prop


def _fused_geometry(cfg: SimConfig):
    """Static offsets for the fused (in-kernel halo DMA) sub-sweep.

    Returns (strides, maxoff, M2): flat row-major strides per grid axis,
    the largest |source - destination| flat-cell offset any neighbor read
    (including interior edge corrections) can need, and that bound rounded
    up to the 128-lane row granularity of the super-range window.
    """
    bs = cfg.block_shape
    dim = cfg.dim
    strides = [int(np.prod(bs[k + 1:], dtype=np.int64)) for k in range(dim)]
    base_max = sum(strides)
    corr_max = sum(bs[k] * strides[k] for k in range(1, dim))
    maxoff = base_max + corr_max
    return strides, maxoff, _round_up(maxoff, 128)


def _fused_masks_np(bs: tuple[int, ...], padded: int) -> np.ndarray:
    """[2*dim, padded] f32 destination edge masks (plane 2k = high edge of
    axis k, 2k+1 = low edge), zero in the tile-padding region."""
    from mcjax.ops.cells import _flat_wrap_masks_np

    dim = len(bs)
    masks = _flat_wrap_masks_np(bs)
    out = np.zeros((2 * dim, padded), np.float32)
    p = int(np.prod(bs, dtype=np.int64))
    for k in range(dim):
        out[2 * k, :p] = masks[(k, 1)]
        out[2 * k + 1, :p] = masks[(k, -1)]
    return out


def pallas_color_substep_fused(cfg: SimConfig, pot: Potential, color: int,
                               pos: jax.Array, occ: jax.Array,
                               key: jax.Array,
                               beta: jax.Array | float | None = None,
                               scale: jax.Array | None = None,
                               field=None,
                               origin: jax.Array | None = None,
                               *, tile_rows: int = 8, tile_cols: int = 128,
                               interpret: bool = False,
                               neighbor_unroll: int = 1,
                               slot_group: int = 8,
                               in_kernel_rng: bool = False,
                               ih_k: int = 0,
                               frozen_cache: bool = False
                               ) -> tuple[jax.Array, jax.Array, jax.Array,
                                          jax.Array]:
    """color_substep with IN-KERNEL neighbor reads — no materialized stack.

    The classic path materializes the 3^dim-1 neighbor slabs in HBM every
    sub-step (`cells.flat_neighbor_stack`) and streams them through the
    pipeline — at 1M 3D atoms that is ~69 MB written + ~69 MB re-read per
    sub-step, the dominant fixed cost (docs/PERF.md round 3).  Here the
    state is passed whole (ANY/HBM memory space) with a ring apron, and
    each grid tile DMAs ONE contiguous super-range per source color
    covering every neighbor offset *and* every interior edge-correction
    offset; neighbor planes are then composed in VMEM as lane-rotated
    windows + edge-mask selects — the closed form of
    `flat_neighbor_stack`'s sequential roll/select chain (bitwise equal;
    see tests/test_pallas_fused.py).  Bytes touched per tile drop from
    K*T to T + 2*M2 per source color (3D: ~13x less HBM traffic).

    Flat single-chip path only (the sharded halo path keeps the packed
    builder).  Reference analogue: the per-block shared-memory 27-cell
    gather this replaces twice over, kernel.cu:270-279.
    """
    n_planes = pos.shape[1]
    ext3, exto3 = _ring_state(cfg, pos, occ, tile_rows, tile_cols)
    own_new, de, n_acc, n_prop = _fused_core(
        cfg, pot, color, ext3, exto3, key, beta, scale, field, origin,
        tile_rows=tile_rows, tile_cols=tile_cols, interpret=interpret,
        neighbor_unroll=neighbor_unroll, slot_group=slot_group,
        in_kernel_rng=in_kernel_rng, ih_k=ih_k, frozen_cache=frozen_cache)
    own_new = own_new.reshape((n_planes, cfg.nmax) + pos.shape[3:])
    return own_new, de, n_acc, n_prop


def _ring_geometry(cfg: SimConfig, tile_rows: int, tile_cols: int):
    """(P, padded, M2, W): flat cells per color, tile-padded width, apron
    row offset, and ring-extended width."""
    P = cfg.cells_per_color
    _, _, M2 = _fused_geometry(cfg)
    T = tile_rows * tile_cols
    padded = _round_up(max(P, T), T)
    W = padded + 2 * M2 + 128
    return P, padded, M2, W


def _ring_one(x: jax.Array, P: int, M2: int, W: int) -> jax.Array:
    """[..., P] -> [..., W] ring extension: out[..., x] = in[..., (x-M2)%P]."""
    s0 = (P - (M2 % P)) % P
    reps = (s0 + W + P - 1) // P
    return jnp.concatenate([x] * reps, axis=-1)[..., s0:s0 + W]


def _ring_state(cfg: SimConfig, pos: jax.Array, occ: jax.Array,
                tile_rows: int, tile_cols: int
                ) -> tuple[jax.Array, jax.Array]:
    """Packed state -> ring-extended fused-kernel state (ext3, exto3)."""
    n_planes = pos.shape[1]
    nmax = cfg.nmax
    P, _, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    fpos = pos.reshape(cfg.n_colors, n_planes * nmax, P)
    focc = occ.reshape(cfg.n_colors, P)
    ext3 = _ring_one(fpos, P, M2, W).reshape(
        cfg.n_colors, n_planes * nmax, W // 128, 128)
    exto3 = _ring_one(focc, P, M2, W).reshape(cfg.n_colors, W // 128, 128)
    return ext3, exto3


def _unring_state(cfg: SimConfig, ext3: jax.Array, exto3: jax.Array,
                  tile_rows: int, tile_cols: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Inverse of _ring_state back to the packed grid layout."""
    P, _, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    nmax = cfg.nmax
    n_planes = ext3.shape[1] // nmax
    r0 = M2 // 128
    fpos = ext3.reshape(cfg.n_colors, n_planes * nmax, W)[..., M2:M2 + P]
    focc = exto3.reshape(cfg.n_colors, W)[..., M2:M2 + P]
    pos = fpos.reshape((cfg.n_colors, n_planes, nmax) + cfg.block_shape)
    occ = focc.reshape((cfg.n_colors,) + cfg.block_shape)
    del r0
    return pos, occ


def _fused_core(cfg: SimConfig, pot: Potential, color: int,
                ext3: jax.Array, exto3: jax.Array, key: jax.Array,
                beta: jax.Array | float | None = None,
                scale: jax.Array | None = None,
                field=None,
                origin: jax.Array | None = None,
                *, tile_rows: int = 8, tile_cols: int = 128,
                interpret: bool = False, neighbor_unroll: int = 1,
                slot_group: int = 8, in_kernel_rng: bool = False,
                ih_k: int = 0,
                frozen_cache: bool = False,
                p_local: int | None = None,
                lb_local: jax.Array | None = None,
                masks_local: jax.Array | None = None,
                vma: tuple[str, ...] | None = None
                ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused sub-sweep on the ring-extended state; returns the updated own
    planes FLAT ([n_planes*nmax, P]) plus (de, n_acc, n_prop).

    The own/occupancy tiles are zero-cost SLICES of the ring state (the
    ring's [M2, M2+padded) rows are exactly the flat cell range, wrapped
    beyond P); occupancy is re-zeroed on the wrapped tail so padding cells
    are inert (no accepts, no dE, no proposals).

    Shard-local mode (mcjax.parallel.fused): ``p_local`` is this shard's
    flat cell count (a contiguous axis-0 slice of the global grid), and the
    ring apron holds NEIGHBOR-shard cells (ppermuted by the caller) instead
    of the single-chip periodic wrap — the window composition is identical
    because the global ring property ring[x] = flat[(start+x-M2) mod P]
    still holds.  ``lb_local`` [dim, p_local] and ``masks_local``
    [2*dim, p_local] are the shard's slices of the per-cell lower bounds
    and destination edge masks (trace-time np constants on a single chip,
    shard-varying inputs under shard_map).  ``vma``: mesh axis names the
    outputs vary over (required for compiled shard_map runs)."""
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    n_k = cfg.n_neighbors - 1
    assert tile_cols == 128, "fused path requires 128-lane tiles"
    n_planes = ext3.shape[1] // nmax
    n_cells = p_local if p_local is not None else cfg.cells_per_color
    P = n_cells

    lb = (lb_local if lb_local is not None
          else jnp.asarray(cells._flat_lower_bounds_np(cfg, color)))

    strides, maxoff, M2 = _fused_geometry(cfg)
    bs = cfg.block_shape
    box = cfg.box_length
    plan = cells.neighbor_plan(dim, color, include_center=False)
    used = sorted({src for src, _ in plan})
    U = len(used)

    T = tile_rows * tile_cols
    padded = _round_up(max(P, T), T)
    rp, cp = padded // tile_cols, tile_cols
    L = T + 2 * M2 + 128
    LR = L // 128
    W = padded + 2 * M2 + 128

    use_field = field is not None
    need_acc = pot.has_energy or (use_field and field.has_energy)
    if in_kernel_rng:
        pick_u = disp = acc_u = None
        seed_arr = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.int32).reshape(1, 2)
    else:
        pick_u, disp, acc_u = xla_sweep.substep_randoms(
            cfg, key, (n_cells,), need_acc=need_acc)

    def to_tiles(x, lead):
        x = x.reshape(lead, n_cells)
        x = jnp.pad(x, ((0, 0), (0, padded - n_cells)))
        return x.reshape(lead, rp, cp)

    # own planes: zero-cost slice of the ring (ring row M2//128 + r is flat
    # cell row r; the wrapped tail past P carries live copies of cells
    # 0..padded-P-1, which the zeroed occupancy below makes inert)
    r0 = M2 // 128
    own_p = ext3[color, :, r0:r0 + rp, :]
    occ_rows = exto3[color, r0:r0 + rp, :]
    cell_idx = jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 0) * cp \
        + jax.lax.broadcasted_iota(jnp.int32, (rp, cp), 1)
    occ_p = jnp.where(cell_idx < P, occ_rows, 0)[None]
    lb_p = to_tiles(lb, dim)
    masks_p = (to_tiles(masks_local, 2 * dim) if masks_local is not None
               else jnp.asarray(_fused_masks_np(bs, padded)).reshape(
                   2 * dim, rp, cp))
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
    if use_field:
        origin_arr = (jnp.zeros((1, dim), jnp.float32) if origin is None
                      else jnp.asarray(origin, jnp.float32).reshape(1, dim))

    base_kernel = _make_kernel(cfg, pot, n_k, beta_static, neighbor_unroll,
                               slot_group, use_scale, in_kernel_rng, field,
                               ih_k, frozen_cache)
    body = base_kernel.body
    TR, TC = tile_rows, tile_cols
    PN = n_planes * nmax

    def fused_kernel(*refs):
        n_rng = 0 if in_kernel_rng else (3 if need_acc else 2)
        (own_ref, occ_ref, lb_ref, mask_ref), rest = refs[:4], refs[4:]
        rng_refs, rest = rest[:n_rng or 1], rest[n_rng or 1:]
        if use_field:
            (beta_ref, scale2_ref, origin_ref, extp_ref, exto_ref,
             out_ref, de_ref, acc_ref,
             sup_pos, sup_occ, nbrs, nbro, sems) = rest
        else:
            (beta_ref, scale2_ref, extp_ref, exto_ref,
             out_ref, de_ref, acc_ref,
             sup_pos, sup_occ, nbrs, nbro, sems) = rest
            origin_ref = None
        if in_kernel_rng:
            seed_ref = rng_refs[0]
            pick_ref = disp_ref = accu_ref = None
        else:
            pick_ref, disp_ref = rng_refs[0], rng_refs[1]
            accu_ref = rng_refs[2] if need_acc else None
            seed_ref = None

        # Double-buffered apron DMA: while tile t computes, tile t+1's
        # super-ranges stream into the other scratch slot.  Safe across the
        # whole grid: within one per-color call ext3/exto3 are READ-ONLY
        # (the own-color update leaves through the output pipeline), so
        # prefetch has no RAW hazard.  Without this every tile stalled on
        # ~U*(PN+1)*L*4 bytes of HBM reads before composing.
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(t, 2)

        def dma_pair(tt, s, u):
            c = used[u]
            return (pltpu.make_async_copy(
                        extp_ref.at[c, :, pl.ds(tt * TR, LR), :],
                        sup_pos.at[s, u], sems.at[s, 2 * u]),
                    pltpu.make_async_copy(
                        exto_ref.at[c, pl.ds(tt * TR, LR), :],
                        sup_occ.at[s, u], sems.at[s, 2 * u + 1]))

        if ABLATE != "dma":
            even = slot == 0

            def start_all(tt, s):
                for u in range(U):
                    a, b = dma_pair(tt, s, u)
                    a.start()
                    b.start()

            def wait_all(tt, s):
                for u in range(U):
                    a, b = dma_pair(tt, s, u)
                    a.wait()
                    b.wait()

            # scratch-slot and semaphore indices stay STATIC (Mosaic has no
            # dynamic semaphore indexing); parity picks the branch
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

        if ABLATE == "kernel":
            out_ref[:] = own_ref[:]
            de_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)
            acc_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.int32)
            return

        lane = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)

        def window_pos(u, a):
            r0, sh = divmod(a, 128)
            if sh == 0:
                return sup_pos[slot, u, :, r0:r0 + TR, :]
            w = sup_pos[slot, u, :, r0:r0 + TR + 1, :]
            ua = jnp.roll(w[:, :TR], -sh, axis=2)
            ub = jnp.roll(w[:, 1:TR + 1], -sh, axis=2)
            return jnp.where((lane < 128 - sh)[None], ua, ub)

        def window_occ(u, a):
            r0, sh = divmod(a, 128)
            if sh == 0:
                return sup_occ[slot, u, r0:r0 + TR, :]
            w = sup_occ[slot, u, r0:r0 + TR + 1, :]
            ua = jnp.roll(w[:TR], -sh, axis=1)
            ub = jnp.roll(w[1:TR + 1], -sh, axis=1)
            return jnp.where(lane < 128 - sh, ua, ub)

        def dmask(k, s):
            return mask_ref[2 * k + (0 if s > 0 else 1)]

        for j, (src, shifts) in enumerate(
                () if ABLATE == "compose" else plan):
            u = used.index(src)
            a0 = M2 + sum(s * strides[k] for k, s in enumerate(shifts))
            if ABLATE == "rolls":
                # profiling: windows without rotation/corrections/unwrap
                nbrs[j * PN:(j + 1) * PN] = sup_pos[slot, u, :, :TR, :]
                nbro[j] = sup_occ[slot, u, :TR, :]
                continue
            v = window_pos(u, a0)
            o = window_occ(u, a0)
            corr = [(k, shifts[k]) for k in range(1, dim) if shifts[k]]
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
            # periodic coordinate unwrap: +-L on coordinate plane k where
            # the read crossed the box edge along k (destination mask).
            # Rows outside plane k keep their ORIGINAL value via the select
            # (no +0.0, which would flip -0.0 — bitwise contract); rows of
            # plane k add adj everywhere, zeros included, exactly like the
            # flat builder's masked add.  (.at[].add lowers to scatter-add,
            # which Mosaic has no TPU lowering for; a numpy mask would be a
            # captured constant, which pallas_call rejects — so the plane
            # mask is an in-kernel iota compare.)
            for k in range(dim):
                s = shifts[k]
                if s:
                    adj = jnp.float32(s * box) * dmask(k, s)
                    row = jax.lax.broadcasted_iota(jnp.int32, (PN, 1, 1), 0)
                    psel = (row >= k * nmax) & (row < (k + 1) * nmax)
                    v = jnp.where(psel, v + adj[None], v)
            nbrs[j * PN:(j + 1) * PN] = v
            nbro[j] = o

        body(own_ref, occ_ref, nbrs, nbro, lb_ref, pick_ref, disp_ref,
             accu_ref, seed_ref, beta_ref, scale2_ref,
             out_ref, de_ref, acc_ref, origin_ref)

    grid = (rp // tile_rows, cp // tile_cols)

    def bspec(lead):
        return pl.BlockSpec((lead, tile_rows, tile_cols),
                            lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    def sspec(cols=1):
        return pl.BlockSpec((1, cols), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    vma_set = frozenset(vma) if vma else None
    out_shapes = (
        jax.ShapeDtypeStruct((n_planes * nmax, rp, cp), jnp.float32,
                             vma=vma_set),
        jax.ShapeDtypeStruct((1, rp, cp), jnp.float32, vma=vma_set),
        jax.ShapeDtypeStruct((1, rp, cp), jnp.int32, vma=vma_set),
    )
    ospec = [sspec(dim)] if use_field else []
    oarg = (origin_arr,) if use_field else ()
    common = [bspec(n_planes * nmax), bspec(1), bspec(dim), bspec(2 * dim)]
    if in_kernel_rng:
        in_specs = common + [sspec(2), sspec(), sspec()] + ospec \
            + [any_spec, any_spec]
        args = (own_p, occ_p, lb_p, masks_p, seed_arr, beta_arr, scale2_arr
                ) + oarg + (ext3, exto3)
    elif need_acc:
        in_specs = common + [bspec(n_m), bspec(n_m * dim), bspec(n_m),
                             sspec(), sspec()] + ospec \
            + [any_spec, any_spec]
        args = (own_p, occ_p, lb_p, masks_p, pick_p, disp_p, accu_p,
                beta_arr, scale2_arr) + oarg + (ext3, exto3)
    else:
        in_specs = common + [bspec(n_m), bspec(n_m * dim),
                             sspec(), sspec()] + ospec \
            + [any_spec, any_spec]
        args = (own_p, occ_p, lb_p, masks_p, pick_p, disp_p,
                beta_arr, scale2_arr) + oarg + (ext3, exto3)

    scratch = [
        pltpu.VMEM((2, U, n_planes * nmax, LR, 128), jnp.float32),
        pltpu.VMEM((2, U, LR, 128), jnp.int32),
        pltpu.VMEM((n_k * n_planes * nmax, TR, TC), jnp.float32),
        pltpu.VMEM((n_k, TR, TC), jnp.int32),
        pltpu.SemaphoreType.DMA((2, 2 * U)),
    ]
    vmem_bytes = (
        2 * 4 * U * (n_planes * nmax + 1) * L
        + 4 * n_k * (n_planes * nmax + 1) * T
        + 2 * 4 * T * (2 * n_planes * nmax + 1 + dim + 2 * dim
                       + n_m * (2 + dim) + 4)
        + 8 * 1024 * 1024)

    own_new_p, de_map, acc_map = pl.pallas_call(
        fused_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bspec(n_planes * nmax), bspec(1), bspec(1)),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 120 * 1024 * 1024)),
        interpret=interpret,
    )(*args)

    own_new = own_new_p.reshape(n_planes * nmax, padded)[:, :n_cells]
    de = jnp.sum(de_map)
    n_acc = jnp.sum(acc_map)
    n_prop = n_m * jnp.sum((occ_p > 0).astype(jnp.int32))
    return own_new, de, n_acc, n_prop


def make_fused_substep(tile_rows: int = 8, tile_cols: int = 128,
                       interpret: bool = False,
                       neighbor_unroll: int = 1, slot_group: int = 8,
                       in_kernel_rng: bool = False, ih_k: int = 0,
                       frozen_cache: bool = False):
    """A color_substep-compatible wrapper around the fused (in-kernel DMA)
    sub-sweep.  Single-chip flat path only; signature-compatible with
    sweep.mc_sweep's substep_fn (shift_fn/block_offset must stay default)."""
    def substep(cfg, pot, color, pos, occ, key,
                shift_fn=roll_shift_fn, beta=None, block_offset=None,
                scale=None, field=None, origin=None):
        if block_offset is not None or shift_fn is not roll_shift_fn:
            raise ValueError("fused substep is single-chip only")
        return pallas_color_substep_fused(
            cfg, pot, color, pos, occ, key, beta=beta, scale=scale,
            field=field, origin=origin,
            tile_rows=tile_rows, tile_cols=tile_cols, interpret=interpret,
            neighbor_unroll=neighbor_unroll, slot_group=slot_group,
            in_kernel_rng=in_kernel_rng, ih_k=ih_k,
            frozen_cache=frozen_cache)
    return substep


def run_sweeps_fused(cfg: SimConfig, pot: Potential, state: SimState,
                     n_sweeps: int, tile_rows: int = 16,
                     tile_cols: int = 128, interpret: bool = False,
                     neighbor_unroll: int = 1, slot_group: int = 8,
                     in_kernel_rng: bool = False, ih_k: int = 0,
                     shard_fold: int | None = None,
                     frozen_cache: bool = False
                     ) -> tuple[SimState, "xla_sweep.SweepMetrics"]:
    """Fused-engine run loop carrying the RING-EXTENDED state across the
    whole scan.

    The per-substep fixed cost of the fused path was rebuilding the full
    4-color ring apron (`_ring_state`: a whole-state concatenate+slice)
    every sub-step even though a sub-step changes only ONE color's planes.
    Here the ring is the carried representation: each sub-step slices its
    own tiles straight out of the ring (zero-cost: ring rows [M2/128,
    (M2+padded)/128) ARE the flat cell range) and writes back a one-color
    ring extension — 1/n_colors of the rebuild traffic — while the
    pack<->ring conversions happen once per run plus once per grid shift.
    Schedule randomness (color permutation, shift axis/distance) replays
    sweep.mc_sweep's tree exactly, so trajectories are BITWISE equal to
    run_sweeps_pallas(fused=True) via the per-substep path
    (tests/test_pallas_fused.py).

    ``shard_fold``: fold this integer into the substep key tree exactly as
    mc_sweep folds a shard id.  A single-chip run with shard_fold=0 then
    draws the SAME streams as shard 0 of a 1-device
    parallel.fused.make_sharded_run_fused run — the bitwise reference for
    bench.py's compiled 1-device-mesh fused check (works for the in-kernel
    RNG too: its seeds are a deterministic function of the substep key and
    the tile id, and the 1-shard tiling is identical)."""
    n_colors = cfg.n_colors
    P, padded, M2, W = _ring_geometry(cfg, tile_rows, tile_cols)
    ext3, exto3 = _ring_state(cfg, state.pos, state.occ, tile_rows,
                              tile_cols)
    pos_shape = state.pos.shape

    def substep_branch(c, ext3, exto3, k):
        return _fused_core(
            cfg, pot, c, ext3, exto3, k, tile_rows=tile_rows,
            tile_cols=tile_cols, interpret=interpret,
            neighbor_unroll=neighbor_unroll, slot_group=slot_group,
            in_kernel_rng=in_kernel_rng, ih_k=ih_k,
            frozen_cache=frozen_cache)

    branches = [partial(substep_branch, c) for c in range(n_colors)]

    def sweep_body(carry, _):
        ext3, exto3, key, sweep, ovf_acc = carry
        key_sweep = jax.random.fold_in(key, sweep)
        k_perm, k_axis, k_dist, k_sub = jax.random.split(key_sweep, 4)
        if shard_fold is not None:
            k_sub = jax.random.fold_in(k_sub, shard_fold)
        perm = jax.random.permutation(k_perm, n_colors)

        def color_body(i, carry2):
            e3, de, na, np_ = carry2
            k = jax.random.fold_in(k_sub, i)
            # branches return same-shaped flat planes, so the ring update
            # hoists OUT of the switch as one dynamic-update-slice — XLA
            # keeps it in-place inside the loop carry (an .at[c].set inside
            # each branch forced a full ext copy per sub-step)
            if ABLATE == "call":  # profiling: glue without the kernel
                PN = e3.shape[1]
                own_new = jax.lax.dynamic_index_in_dim(
                    e3, perm[i], 0, keepdims=False
                ).reshape(PN, W)[:, M2:M2 + P]
                de_i = jnp.zeros((), jnp.float32)
                na_i = np_i = jnp.zeros((), jnp.int32)
            else:
                own_new, de_i, na_i, np_i = jax.lax.switch(
                    perm[i], branches, e3, exto3, k)
            if ABLATE != "ringup":
                ring_c = _ring_one(own_new, P, M2, W).reshape(
                    1, own_new.shape[0], W // 128, 128)
                e3 = jax.lax.dynamic_update_slice(
                    e3, ring_c, (perm[i], 0, 0, 0))
            return e3, de + de_i, na + na_i, np_ + np_i

        zf = jnp.zeros((), jnp.float32)
        zi = jnp.zeros((), jnp.int32)
        ext3, de, n_acc, n_prop = jax.lax.fori_loop(
            0, n_colors, color_body, (ext3, zf, zi, zi))

        axis = jax.random.randint(k_axis, (), 0, cfg.dim)
        d = jax.random.uniform(k_dist, (),
                               minval=-cfg.cell_width / 2.0,
                               maxval=cfg.cell_width / 2.0)
        do_shift = (sweep + 1) % cfg.shift_every == 0
        if ABLATE == "shift":  # profiling: constant pred folds the cond away
            do_shift = False

        def with_shift():
            # stay FLAT end-to-end: ring -> flat slices -> flat-space merge
            # (shift_rebin auto-dispatches on flat input; bitwise-equal to
            # the packed merge) -> re-ring, with zero packed relayouts
            nmax = cfg.nmax
            PN = ext3.shape[1]
            fpos = ext3.reshape(n_colors, PN, W)[..., M2:M2 + P].reshape(
                n_colors, PN // nmax, nmax, P)
            focc = exto3.reshape(n_colors, W)[..., M2:M2 + P]
            pos2, occ2, ovf2 = cells.shift_rebin(
                cfg, fpos, focc, axis, d, xla_sweep.roll_shift_fn, None)
            e3, eo3 = _ring_state(cfg, pos2, occ2, tile_rows, tile_cols)
            return e3, eo3, ovf2

        def no_shift():
            return ext3, exto3, jnp.any(exto3 < 0)

        ext3_n, exto3_n, ovf = jax.lax.cond(do_shift, with_shift, no_shift)
        m = xla_sweep.SweepMetrics(de, n_acc, n_prop, ovf)
        return (ext3_n, exto3_n, key, sweep + 1, ovf_acc | ovf), m

    carry = (ext3, exto3, state.key, state.sweep, state.overflow)
    carry, metrics = jax.lax.scan(sweep_body, carry, length=n_sweeps)
    ext3, exto3, _, sweep, ovf = carry
    pos, occ = _unring_state(cfg, ext3, exto3, tile_rows, tile_cols)
    state = dataclasses.replace(state, pos=pos.reshape(pos_shape), occ=occ,
                                sweep=sweep, overflow=ovf)
    return state, metrics


def estimate_tile_vmem_bytes(cfg: SimConfig, tile_rows: int = 8,
                             tile_cols: int = 128) -> int:
    """Rough per-tile VMEM footprint of the sub-sweep kernel (x2 for the
    pipeline's double buffering)."""
    dim, nmax, n_m = cfg.dim, cfg.nmax, cfg.n_moves
    n_k = cfg.n_neighbors - 1
    return 2 * 4 * tile_rows * tile_cols * (
        2 * dim * nmax + 1 + dim * n_k * nmax + n_k + dim
        + n_m * (2 + dim) + 4)


def recommended_engine(cfg: SimConfig, vmem_budget: int = 24 * 2**20) -> str:
    """'pallas' when on TPU and the kernel's working set fits comfortably,
    else 'xla' (identical physics either way — same Threefry streams)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return "xla"
    return "pallas" if estimate_tile_vmem_bytes(cfg) <= vmem_budget else "xla"


def make_pallas_substep(tile_rows: int = 8, tile_cols: int = 128,
                        interpret: bool = False,
                        vma: tuple[str, ...] | None = None,
                        neighbor_unroll: int = 1, slot_group: int = 8,
                        in_kernel_rng: bool = False, ih_k: int = 0,
                        frozen_cache: bool = False):
    """A color_substep-compatible function with chosen tiling.

    ``vma``: mesh axis names the state varies over when running inside
    shard_map (e.g. ("y", "x")); None on a single chip."""
    return partial(pallas_color_substep, tile_rows=tile_rows,
                   tile_cols=tile_cols, interpret=interpret, vma=vma,
                   neighbor_unroll=neighbor_unroll, slot_group=slot_group,
                   in_kernel_rng=in_kernel_rng, ih_k=ih_k,
                   frozen_cache=frozen_cache)


def auto_tile_rows(cfg: SimConfig, tile_cols: int = 128,
                   vmem_budget: int = 24 * 2**20) -> int:
    """Largest row-tile (32/16/8) whose working set fits the VMEM budget —
    bigger tiles amortize grid/pipeline overhead (~15% at 1M hard disks)."""
    for tr in (32, 16, 8):
        if estimate_tile_vmem_bytes(cfg, tr, tile_cols) <= vmem_budget:
            return tr
    return 8


@partial(jax.jit,
         static_argnums=(0, 1, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def run_sweeps_pallas(cfg: SimConfig, pot: Potential, state: SimState,
                      n_sweeps: int, tile_rows: int = 0, tile_cols: int = 128,
                      interpret: bool = False, pallas_shift: bool = False,
                      neighbor_unroll: int = 1, slot_group: int = 8,
                      in_kernel_rng: bool = False, fused: bool = False,
                      ih_k: int = 0, frozen_cache: bool = False
                      ) -> tuple[SimState, "xla_sweep.SweepMetrics"]:
    """run_sweeps with the Pallas sub-sweep kernel (single chip).

    tile_rows=0 auto-selects the largest VMEM-fitting row tile.
    ``pallas_shift=True`` swaps in the Pallas grid-shift merge kernel —
    bitwise identical to the XLA cumsum shift (tests/test_pallas_shift.py)
    but measured slightly slower at N=1M (its donor prep re-does the
    lane-axis rolls; docs/PERF.md round-2 breakdown), so the XLA shift stays
    the default.

    ``ih_k`` (static, part of the jit cache key) sets the Irwin-Hall draw
    count for the in-kernel gaussian RNG; 0 = module default IH_K.  Prefer
    this over mutating pallas_sweep.IH_K, which is read at trace time and
    NOT part of any cache key (a later change silently reuses the kernel
    compiled with the old K).
    """
    if tile_rows == 0:
        tile_rows = auto_tile_rows(cfg, tile_cols)
    if fused and not pallas_shift:
        # ring-carry loop: one pack<->ring per run + per shift instead of a
        # full-state ring rebuild per sub-step (bitwise equal; docstring)
        return run_sweeps_fused(cfg, pot, state, n_sweeps, tile_rows,
                                tile_cols, interpret, neighbor_unroll,
                                slot_group, in_kernel_rng, ih_k,
                                frozen_cache=frozen_cache)
    if fused:
        substep = make_fused_substep(tile_rows, tile_cols, interpret,
                                     neighbor_unroll=neighbor_unroll,
                                     slot_group=slot_group,
                                     in_kernel_rng=in_kernel_rng, ih_k=ih_k,
                                     frozen_cache=frozen_cache)
    else:
        substep = make_pallas_substep(tile_rows, tile_cols, interpret,
                                      neighbor_unroll=neighbor_unroll,
                                      slot_group=slot_group,
                                      in_kernel_rng=in_kernel_rng, ih_k=ih_k,
                                      frozen_cache=frozen_cache)
    shift_rebin_fn = None
    if pallas_shift:
        from mcjax.ops.pallas_shift import pallas_shift_rebin
        shift_rebin_fn = partial(pallas_shift_rebin, tile_rows=tile_rows,
                                 tile_cols=tile_cols, interpret=interpret)

    # On lane-padded grids (3D), carry the state FLAT through the whole scan:
    # the substep and grid shift already run in flat cell space (their
    # reshapes become no-ops on flat input), so this removes the remaining
    # per-substep pack<->flat relayouts and runs the per-color state update
    # on the compact layout instead of the ~6x-padded one. Pack<->flat
    # happens once per run_sweeps call.
    flat_state = (_lane_pad_ratio(cfg.block_shape[-1]) >= 1.5
                  and not pallas_shift)
    pos_shape, occ_shape = state.pos.shape, state.occ.shape
    if flat_state:
        P = cfg.cells_per_color
        state = dataclasses.replace(
            state,
            pos=state.pos.reshape(cfg.n_colors, -1, cfg.nmax, P),
            occ=state.occ.reshape(cfg.n_colors, P))

    def body(st, _):
        st, m = xla_sweep.mc_sweep(cfg, pot, st, substep_fn=substep,
                                   shift_rebin_fn=shift_rebin_fn)
        return st, m

    state, metrics = jax.lax.scan(body, state, length=n_sweeps)
    if flat_state:
        state = dataclasses.replace(state, pos=state.pos.reshape(pos_shape),
                                    occ=state.occ.reshape(occ_shape))
    return state, metrics
