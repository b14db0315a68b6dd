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


def test_tune_step_size_moves_toward_target():
    from mcjax.models.potentials import HardSphere
    from mcjax.utils.tuning import tune_step_size
    import math
    n, phi = 256, 0.5
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0) - int(box // 1.0) % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=6, proposal="uniform", step_size=0.9,
                    beta=1.0)
    hs = HardSphere(1.0)
    st = init_state(cfg)
    tuned, st2, acc = tune_step_size(cfg, hs, st, target=0.5, rounds=5,
                                     sweeps_per_round=4)
    # 0.9 is far too large at phi=0.5 (acceptance ~0.1); tuning must shrink it
    assert tuned.step_size < 0.9
    assert 0.25 < acc < 0.8, acc
