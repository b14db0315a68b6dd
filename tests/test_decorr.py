"""Frame-corrected density modes: the decorrelation benchmark's physics.

The grid shift re-expresses stored coordinates in a drifting frame
(ops/extfield.py module docstring).  scripts/bench_ecmc_decorr.py compares
Metropolis vs ECMC decorrelation via the intermediate scattering function
F(k, t) built from rho(k) snapshots, which is only meaningful if the frame
drift is corrected exactly.  These tests pin the two ingredients:
``extfield.replay_origin`` (shift-schedule replay without running sweeps)
and ``observables.rho_k_cells`` (complex density modes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.geometry import wrap_into_box
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.ops.extfield import physical_positions, replay_origin
from mcjax.ops.sweep import run_sweeps
from mcjax.utils.observables import (k_lattice, rho_k_cells,
                                     structure_factor_cells)


def _cfg(n_moves: int, seed: int = 3, step: float = 0.15) -> SimConfig:
    return SimConfig(dim=2, n_atoms=120, box_length=16.0, cells_per_side=8,
                     nmax=8, n_moves=n_moves, proposal="uniform",
                     step_size=step, beta=1.0, seed=seed)


def _sorted_coords(cfg, state, origin):
    r = np.asarray(physical_positions(cfg, state.pos, state.occ, origin,
                                      n_out=cfg.n_atoms))[:, :cfg.dim]
    return r[np.lexsort(r.T[::-1])]


def test_replay_origin_frame_correction():
    """With step_size=0 the physics is frozen (every move proposes a zero
    displacement): only grid shifts touch the
    stored coordinates, so stored + replayed origin must reproduce the
    initial physical positions through many shifts."""
    cfg = _cfg(n_moves=1, step=0.0)
    pot = HardSphere(1.0)
    state0 = init_state(cfg)
    ref = _sorted_coords(cfg, state0, jnp.zeros((2,), jnp.float32))

    state, _ = run_sweeps(cfg, pot, state0, 9)
    origin = replay_origin(cfg, state0.key, state0.sweep, 9)
    got = _sorted_coords(cfg, state, origin)
    # wrap both into the primary box before comparing (a coordinate may sit
    # within fp noise of the boundary and wrap to the other side)
    assert np.allclose(got, ref, atol=2e-5), (
        f"max err {np.abs(got - ref).max()}")
    # and WITHOUT the correction the frame really has drifted
    raw = _sorted_coords(cfg, state, jnp.zeros((2,), jnp.float32))
    assert not np.allclose(raw, ref, atol=1e-3)


def test_replay_origin_accumulates_across_chunks():
    """Replaying [0, a) then [a, a+b) equals replaying [0, a+b) — the
    benchmark replays chunk by chunk between snapshots."""
    cfg = _cfg(n_moves=1)
    key = jax.random.key(7)
    o_ab = replay_origin(cfg, key, 0, 11)
    o_a = replay_origin(cfg, key, 0, 4)
    o_b = replay_origin(cfg, key, 4, 7, origin=o_a)
    assert np.allclose(np.asarray(o_b), np.asarray(o_ab), atol=1e-6)


def test_rho_k_matches_structure_factor():
    cfg = _cfg(n_moves=2)
    pot = HardSphere(1.0)
    state, _ = run_sweeps(cfg, pot, init_state(cfg), 3)
    kv = k_lattice(cfg, 3.0)
    rho = np.asarray(rho_k_cells(cfg, state.pos, state.occ, kv))
    sk = np.asarray(structure_factor_cells(cfg, state.pos, state.occ, kv))
    n = float(jnp.sum(state.occ))
    assert np.allclose((rho ** 2).sum(-1) / n, sk, rtol=1e-4, atol=1e-5)


def test_frame_corrected_rho_invariant_when_frozen():
    """exp(i k . origin) * rho_stored(k) is invariant when moves are frozen —
    the exact identity the benchmark's F(k, t) relies on."""
    cfg = _cfg(n_moves=1, step=0.0)
    pot = HardSphere(1.0)
    state0 = init_state(cfg)
    kv = k_lattice(cfg, 3.0)
    rho0 = np.asarray(rho_k_cells(cfg, state0.pos, state0.occ, kv))

    state, _ = run_sweeps(cfg, pot, state0, 6)
    origin = np.asarray(replay_origin(cfg, state0.key, state0.sweep, 6))
    rho1 = np.asarray(rho_k_cells(cfg, state.pos, state.occ, kv))
    phase = np.asarray(kv) @ origin                       # [K]
    c, s = np.cos(phase), np.sin(phase)
    corr_re = c * rho1[:, 0] - s * rho1[:, 1]
    corr_im = s * rho1[:, 0] + c * rho1[:, 1]
    assert np.allclose(corr_re, rho0[:, 0], atol=2e-2 * cfg.n_atoms ** 0.5)
    assert np.allclose(corr_im, rho0[:, 1], atol=2e-2 * cfg.n_atoms ** 0.5)


def test_wrap_into_box_idempotent():
    x = jnp.asarray([-8.0, -7.9999, 7.9999, 3.2])
    w = wrap_into_box(x, 16.0)
    assert np.allclose(np.asarray(wrap_into_box(w, 16.0)), np.asarray(w))


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
