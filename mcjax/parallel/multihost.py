"""Multi-host (multi-process) execution seam — SURVEY.md §5 halo row.

The reference caps at ONE process and ONE GPU (its only cross-block
aggregation is a host-mediated reduction, kernel.cu:672-677). mcjax's mesh
layer (mcjax.parallel.mesh) is written single-controller style: every
process runs the same program over a GLOBAL ``jax.sharding.Mesh`` whose
devices span all processes, and XLA routes the halo ``ppermute``/``psum``
traffic over ICI within a slice and DCN across slices. This module provides
the process-level seam:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (coordinator
  address / process count / process id from args or the standard env vars).
* :func:`spatial_mesh` — a process-count-agnostic mesh builder: factors the
  GLOBAL device count into an n-D mesh shape, preferring near-square
  spatial factorizations.
* :func:`host_local_state` / global array utilities for building a globally
  sharded :class:`SimState` from per-process host data.

On a real pod: run one process per host with the same script; the driver's
per-chip benchmark path is unchanged. On this box it is exercised by
``python -m mcjax.launch --processes 2`` (two localhost processes x 4
virtual CPU devices each — see mcjax/launch.py).
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_count: int | None = None) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    ``local_device_count`` (CPU only): number of virtual CPU devices this
    process contributes — must be set BEFORE the backend initializes.
    All arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    """
    import jax

    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def _near_square_factors(n: int, k: int) -> tuple[int, ...]:
    """Factor n into k factors, greedily as equal as possible (descending)."""
    out = []
    rem = n
    for i in range(k, 1, -1):
        target = round(rem ** (1.0 / i))
        f = max(1, target)
        # nearest divisor of rem to target
        best = 1
        for d in range(1, rem + 1):
            if rem % d == 0 and abs(d - target) < abs(best - target):
                best = d
        f = best
        out.append(f)
        rem //= f
    out.append(rem)
    return tuple(sorted(out, reverse=True))


def spatial_mesh(names: Sequence[str] = ("y", "x"),
                 shape: Sequence[int] | None = None):
    """Global mesh over ALL devices (every process sees the same mesh).

    ``shape=None`` factors the global device count into ``len(names)``
    near-equal axes. Works identically for 1 process (the single-chip and
    virtual-CPU cases) and N processes (pod slices over DCN).
    """
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = len(devs)
    if shape is None:
        shape = _near_square_factors(n, len(names))
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != global device count {n}")
    return Mesh(np.array(devs).reshape(tuple(shape)), tuple(names))


def process_summary() -> str:
    """One-line description of this process's view of the topology."""
    import jax

    return (f"process {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / {jax.device_count()} "
            f"global devices")


def put_global(x, s):
    """Materialize one host-replicated array as a global array with
    sharding ``s`` (each process provides only its addressable shards;
    every process must pass the SAME host values). Handles prng keys."""
    import jax

    if hasattr(x, "dtype") and jax.dtypes.issubdtype(
            x.dtype, jax.dtypes.prng_key):
        kd = np.asarray(jax.random.key_data(x))
        impl = jax.random.key_impl(x)
        g = jax.make_array_from_callback(kd.shape, s,
                                         lambda idx: kd[idx])
        return jax.jit(lambda a: jax.random.wrap_key_data(a, impl=impl),
                       out_shardings=s)(g)
    x = np.asarray(x)
    return jax.make_array_from_callback(
        x.shape, s, lambda idx: x[idx])


def make_global_state(cfg, state, mesh, spatial_axes,
                      replica_axis: str | None = None):
    """Place a host-replicated SimState onto a (possibly multi-process)
    global mesh.

    Every process must call this with the SAME host values (deterministic
    init from cfg.seed guarantees that); each process materializes only its
    addressable shards. Single-process: identical to mesh.shard_state.
    """
    import jax

    from mcjax.parallel.mesh import state_sharding, _check_divisible

    _check_divisible(cfg, mesh, spatial_axes)
    sh = state_sharding(cfg, mesh, spatial_axes, replica_axis)
    return jax.tree.map(put_global, state, sh)


def coordinator_on_localhost(port: int | None = None) -> str:
    """Coordinator address for same-box multi-process runs (tests/CI)."""
    port = port or int(os.environ.get("MCJAX_COORD_PORT", "47581"))
    return f"127.0.0.1:{port}"
