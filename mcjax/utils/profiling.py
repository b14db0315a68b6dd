"""Timing & throughput harness + profiler hooks (SURVEY.md §5 tracing row).

The reference's only performance instrumentation was an external wall clock
around the whole binary (pptx slide 14).  mcjax provides:

  * ``time_fn`` — robust device timing that forces completion by fetching a
    scalar to the host (``block_until_ready`` can be a no-op through remote
    TPU tunnels, so we never rely on it);
  * ``throughput`` — trial-moves/sec measurement for any engine;
  * ``trace`` — context manager around ``jax.profiler`` for XProf dumps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _force(x) -> float:
    """Force device completion by summing one leaf to a host float."""
    leaves = [l for l in jax.tree.leaves(x)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if leaves:
        return float(jnp.sum(leaves[0]))
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(jnp.max(leaves[0])) if leaves else 0.0


def time_fn(fn: Callable, *args, iters: int = 3, warmup: int = 1,
            **kwargs) -> tuple[float, object]:
    """Median wall time of fn(*args) with completion forced each call."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _force(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def throughput(cfg, pot, state, runner, n_sweeps: int = 10,
               warmup_sweeps: int = 2) -> dict:
    """Measure trial moves/sec of a run_sweeps-compatible engine."""
    st, m = runner(cfg, pot, state, warmup_sweeps)
    _force(m.delta_e)
    t0 = time.perf_counter()
    st2, m = runner(cfg, pot, st, n_sweeps)
    _force(m.delta_e)
    dt = time.perf_counter() - t0
    # per-sweep counters are int32 on device; sum in 64-bit on the host
    # (a long timed run at N=1M, n_M=64 overflows int32 within ~60 sweeps)
    import numpy as np
    proposed = int(np.sum(np.asarray(m.proposed, np.int64)))
    accepted = int(np.sum(np.asarray(m.accepted, np.int64)))
    return {
        "seconds": dt,
        "sweeps_per_s": n_sweeps / dt,
        "moves_per_s": proposed / dt,
        "acceptance": accepted / max(proposed, 1),
        "state": st2,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mcjax-trace"):
    """jax.profiler trace context (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
