#!/usr/bin/env python
"""Minimal repros: Mosaic dynamic-op faults on this TPU (round 4).

Findings (jax 0.9.0, TPU v5e through the axon tunnel; docs/PERF.md):
  slice : scratch[pl.ds(r0, k)] with r0 from SMEM — COMPILES, then FAULTS
          the TPU worker at runtime (dynamic sublane start, likely the
          8-row sublane alignment requirement unenforced dynamically)
  roll  : pltpu.roll(x, -sh, lane_axis) with sh from SMEM — same fault
  dmarow: DMA with dynamic leading index AND dynamic row offset — OK
          (the primitive the in-place ring engine builds on)

Each variant runs standalone: python scripts/probe_mosaic_dynamic.py slice
(expect: "UNAVAILABLE: TPU worker process crashed" for slice/roll; an OK
line for dmarow).  Keep these for the day the toolchain fixes them —
pallas_ring.py can then drop its per-color static-compose branches.

All three pass in interpret mode (append a second arg): the faults are
compiled-Mosaic-only, exactly like the round-3 multi-plane
prng_random_bits inconsistency (scripts/repro_prng_multiplane.py).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

mode = sys.argv[1] if len(sys.argv) > 1 else "dmarow"
interpret = len(sys.argv) > 2
if interpret:
    jax.config.update("jax_platforms", "cpu")
TR, TC = 8, 128
LR = TR + 2
n_rows = 32


def kernel(c_ref, a_ref, x_ref, o_ref, scratch, sem):
    t = pl.program_id(0)
    if mode == "dmarow":
        c = c_ref[0, 0]
        r0 = a_ref[0, 1] // 128            # dynamic row offset (= 1)
        cp = pltpu.make_async_copy(
            x_ref.at[c, pl.ds(t * TR + r0, TR + 1), :],
            scratch.at[pl.ds(0, TR + 1)], sem)
        cp.start(); cp.wait()
        w = scratch[pl.ds(0, TR + 1), :]
        ua = jnp.roll(w[:TR], -7, axis=1)
        ub = jnp.roll(w[1:TR + 1], -7, axis=1)
        sh_v = 7
    elif mode == "smemidx":
        # DMA source index read from an SMEM TABLE at a program-id-derived
        # slot: src = table[rem(t, 2)] — the primitive a single-donor
        # ring_shift needs (host precomputes table[c] = c ^ (1 << axis);
        # arithmetic-derived indices like c ^ (1 << k_ax) fault in-kernel,
        # a pure table lookup may not).  In this mode the table holds the
        # index DIRECTLY (always 1), no in-kernel arithmetic on the value.
        src = a_ref[0, jax.lax.rem(t, 2)]
        cp = pltpu.make_async_copy(x_ref.at[src, pl.ds(t * TR, LR), :],
                                   scratch, sem)
        cp.start(); cp.wait()
        w = scratch[pl.ds(1, TR + 1), :]
        ua = jnp.roll(w[:TR], -7, axis=1)
        ub = jnp.roll(w[1:TR + 1], -7, axis=1)
        sh_v = 7
    else:
        cp = pltpu.make_async_copy(x_ref.at[1, pl.ds(t * TR, LR), :],
                                   scratch, sem)
        cp.start(); cp.wait()
        if mode == "slice":
            r0 = a_ref[0, 1] // 128        # dynamic sublane start (= 1)
            w = scratch[pl.ds(r0, TR + 1), :]          # <-- FAULTS
            ua = jnp.roll(w[:TR], -7, axis=1)
            ub = jnp.roll(w[1:TR + 1], -7, axis=1)
            sh_v = 7
        elif mode == "roll":
            sh = a_ref[0, 1] % 128         # dynamic lane shift (= 7)
            w = scratch[pl.ds(1, TR + 1), :]
            ua = pltpu.roll(w[:TR], -sh, 1)            # <-- FAULTS
            ub = pltpu.roll(w[1:TR + 1], -sh, 1)
            sh_v = sh
        else:
            raise SystemExit(f"unknown mode {mode}")
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, TC), 1)
    o_ref[...] = jnp.where(lane < 128 - sh_v, ua, ub)


x = jnp.arange(2 * (n_rows + 4) * 128, dtype=jnp.int32).reshape(
    2, n_rows + 4, 128)
a_tbl = jnp.asarray([[1, 1]] if mode == "smemidx" else [[7, 135]],
                    jnp.int32)
c = jnp.asarray([[1]], jnp.int32)
out = pl.pallas_call(
    kernel,
    grid=(n_rows // TR,),
    in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM),
              pl.BlockSpec((1, 2), lambda i: (0, 0),
                           memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((TR, TC), lambda i: (i, 0)),
    out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.int32),
    scratch_shapes=[pltpu.VMEM((LR, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA],
    interpret=interpret,
)(c, a_tbl, x)
out = np.asarray(out)
xs = np.asarray(x)
exp = np.empty_like(out)
for t in range(n_rows // TR):
    w = xs[1, t * TR:t * TR + LR]
    for r in range(TR):
        exp[t * TR + r] = np.concatenate([w[1 + r], w[2 + r]])[7:7 + 128]
assert np.array_equal(out, exp), (mode, out[:1, :8], exp[:1, :8])
print(f"{mode} OK", flush=True)
