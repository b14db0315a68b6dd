"""Minimal repro attempt: multi-plane pltpu.prng_random_bits inconsistency.

Context (mcjax round 3, docs/PERF.md): inside the production sub-sweep
kernel, a single `prng_random_bits((6, TR, TC))` draw produced planes that
were INCONSISTENT between their consumers — the Metropolis decision
evaluated one displacement, the position write applied another, breaking
the dE-anchor identity at rel ~1e-1.  (4, TR, TC) and (5, TR, TC) draws
were clean; the failure was bit-identical under full loop unroll, exact
divide, and VMEM scratch round-trips, which rules out everything except
the draw itself.  The production fix is one [TR, TC] plane per call.

This script is a MINIMAL standalone probe: one kernel seeds, draws a
(K, TR, TC) block, writes every plane to output A immediately, then again
to output B after a long fake dependency chain (to induce scheduling /
spill pressure).  Any A != B word is a smoking gun; A == B everywhere
means the minimal kernel does not reproduce the in-situ failure (register
pressure in the real kernel is far higher) — the evidence then remains
the production bisection above.

Run on a real TPU:  python scripts/repro_prng_multiplane.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR, TC = 16, 128


def make_probe(K: int, chain: int):
    def kernel(seed_ref, a_ref, b_ref):
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])
        bits = pltpu.prng_random_bits((K, TR, TC))
        # consumer 1: straight copy
        for k in range(K):
            a_ref[k] = bits[k]
        # fake long dependency chain on DERIVED values (mimics the move
        # chain between the draw and the write-back in the real kernel)
        acc = bits[0].astype(jnp.float32) * jnp.float32(2.0 ** -31)
        for k in range(K):
            u = bits[k].astype(jnp.float32) * jnp.float32(2.0 ** -31)
            for _ in range(chain):
                acc = acc * jnp.float32(0.9999) + u
        # consumer 2: the SAME planes again, after the chain
        for k in range(K):
            b_ref[k] = bits[k] + (acc < jnp.float32(-1e30)).astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((K, TR, TC), lambda i: (0, 0, 0)),
                   pl.BlockSpec((K, TR, TC), lambda i: (0, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((K, TR, TC), jnp.int32),
                   jax.ShapeDtypeStruct((K, TR, TC), jnp.int32)),
    )


def main():
    # Round-4 extension (VERDICT r3 item 4a): widen the sweep — tile
    # shapes, draw counts, dependency-chain lengths.  Round 4 also found
    # two MORE compiled-Mosaic-only miscompiles of the same flavor
    # (dynamic sublane slice and dynamic lane roll both fault the worker
    # at runtime — scripts/probe_mosaic_dynamic.py), which strengthens the
    # toolchain-side attribution: vector-shape/dynamic edge cases
    # miscompile instead of being rejected.  If this sweep still prints
    # all OK, the in-situ failure needs the full kernel's register
    # pressure to trigger; the per-plane-draw workaround stands either
    # way (it is gated statistically every bench run via rng_gate).
    global TR, TC
    bad = 0
    for tr in (8, 16, 32):
        TR = tr
        for K in (4, 5, 6, 8, 12, 16):
            for chain in (0, 64, 256):
                fn = make_probe(K, chain)
                a, b = fn(jnp.array([[12345, 67890]], jnp.int32))
                a, b = np.asarray(a), np.asarray(b)
                n_diff = int((a != b).sum())
                uniq = len({tuple(a[k, 0, :4].tolist()) for k in range(K)})
                status = "OK " if n_diff == 0 and uniq == K else "BAD"
                if status == "BAD":
                    bad = 1
                print(f"{status} TR={tr:2d} K={K:2d} chain={chain:3d}: "
                      f"{n_diff} words differ between consumers; "
                      f"{uniq}/{K} planes distinct", flush=True)
    sys.exit(bad)


if __name__ == "__main__":
    main()
