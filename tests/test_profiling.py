"""Profiling harness smoke tests."""

import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import LennardJones
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import profiling


def test_time_fn_returns_positive_time():
    f = lambda x: jnp.tanh(x).sum()
    dt, out = profiling.time_fn(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert dt > 0
    assert float(out) != 0


def test_throughput_harness():
    cfg = SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                    nmax=10, n_moves=4)
    st = init_state(cfg)
    res = profiling.throughput(cfg, LennardJones(), st, run_sweeps,
                               n_sweeps=3, warmup_sweeps=3)
    assert res["moves_per_s"] > 0
    assert 0 <= res["acceptance"] <= 1
    assert int(res["state"].sweep) == 6  # 3 warmup + 3 timed
