"""The fused (in-kernel DMA) engine under the mesh: bitwise gates.

The strongest available check on forced-CPU: with HOST Threefry randomness,
the sharded fused engine's per-shard streams are identical to the sharded
XLA engine's (flat row-major reshape of the same draw, same shard_id fold),
so hard-core trajectories must be BITWISE equal between
``parallel.fused.make_sharded_run_fused`` (interpret Pallas) and
``parallel.mesh.make_sharded_run_sweeps`` (XLA) on the same CPU mesh —
kernel, ring/halo protocol, and shift plumbing all validated at once.

The in-kernel-RNG variant cannot run on CPU (no hardware PRNG in interpret
mode); its compiled gate is bench.py's 1-device TPU mesh check against
run_sweeps_fused(shard_fold=0).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.parallel import fused as pfused
from mcjax.parallel import mesh as pmesh


def _hd_config(n=13000, phi=0.42, seed=5):
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=seed)
    return cfg, HardSphere(1.0)


@pytest.mark.parametrize("n_shards,n_atoms", [(2, 13000), (4, 23500)])
def test_sharded_fused_bitwise_vs_sharded_xla(n_shards, n_atoms):
    """2 shards = the minimal pair; 4 shards adds shift traffic across
    three interior shard boundaries (VERDICT r4 weak #5 / item 8)."""
    cfg, pot = _hd_config(n=n_atoms)
    st = init_state(cfg)
    sweeps = 3
    devs = jax.devices()[:n_shards]
    mesh = Mesh(np.array(devs).reshape(n_shards), ("x",))

    run_f = pfused.make_sharded_run_fused(
        cfg, pot, mesh, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)
    st_f = pfused.shard_state_fused(cfg, st, mesh, "x")
    out_f, m_f = run_f(st_f)

    run_x = pmesh.make_sharded_run_sweeps(
        cfg, pot, mesh, ("x", None), sweeps, engine="xla")
    st_x = pmesh.shard_state(cfg, st, mesh, ("x", None))
    out_x, m_x = run_x(st_x)

    assert int(jnp.sum(out_f.occ)) == cfg.n_atoms
    np.testing.assert_array_equal(np.asarray(out_f.occ),
                                  np.asarray(out_x.occ))
    np.testing.assert_array_equal(np.asarray(out_f.pos),
                                  np.asarray(out_x.pos))
    np.testing.assert_array_equal(np.asarray(m_f.accepted),
                                  np.asarray(m_x.accepted))
    assert not bool(out_f.overflow)


def test_sharded_fused_shard_count_changes_streams():
    """1-shard and 2-shard runs fold different shard ids into the move
    randomness, so trajectories must differ — catching a silently ignored
    shard fold (which would also mean correlated streams across shards)."""
    cfg, pot = _hd_config(seed=7)
    st = init_state(cfg)
    sweeps = 2
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("x",))
    mesh2 = Mesh(np.array(jax.devices()[:2]).reshape(2), ("x",))

    out1, _ = pfused.make_sharded_run_fused(
        cfg, pot, mesh1, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)(pfused.shard_state_fused(cfg, st, mesh1, "x"))
    out2, _ = pfused.make_sharded_run_fused(
        cfg, pot, mesh2, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)(pfused.shard_state_fused(cfg, st, mesh2, "x"))

    assert int(jnp.sum(out1.occ)) == cfg.n_atoms
    assert int(jnp.sum(out2.occ)) == cfg.n_atoms
    assert not np.array_equal(np.asarray(out1.pos), np.asarray(out2.pos))


def test_fused_shard_geometry_rejects_thin_slices():
    cfg, _ = _hd_config(n=2000)
    with pytest.raises(ValueError):
        pfused.fused_shard_geometry(cfg, cfg.block_shape[0], tile_rows=8)


def test_max_1d_shards_headline_config():
    """The documented 1-D shard ceiling (docs/ARCHITECTURE.md, VERDICT r4
    item 5): 64 chips at the 2D N=1M headline geometry with tile_rows 8."""
    n = 1_048_576
    box = math.sqrt(n * math.pi / 4.0 / 0.5)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=7, n_moves=8, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    assert pfused.max_1d_shards(cfg, tile_rows=8) == 64
    # every admitted count must satisfy the apron-containment geometry
    Ps, padded, M2, W, Rr = pfused.fused_shard_geometry(cfg, 64, 8)
    assert Ps >= M2 and Ps >= Rr
