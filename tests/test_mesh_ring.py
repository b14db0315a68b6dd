"""The in-place RING engine under the mesh: bitwise gates (VERDICT r4 #2).

Same strategy as tests/test_mesh_fused.py: with HOST Threefry randomness
the sharded ring engine's per-shard streams are identical to the sharded
XLA engine's (flat row-major reshape of the same draw, same shard_id
fold), so hard-core trajectories must be BITWISE equal between
``parallel.ring.make_sharded_run_ring`` (interpret Pallas — aliased
in-place kernel + ppermuted apron slivers) and
``parallel.mesh.make_sharded_run_sweeps`` (XLA) on the same CPU mesh.
The 4-shard case exercises shift traffic across THREE interior shard
boundaries (VERDICT r4 asked >= 4 shards for the flagship halo).

The in-kernel-RNG variant cannot run on CPU (no hardware PRNG in
interpret mode); its compiled gate is bench.py's 1-device TPU mesh check
against run_sweeps_ring(shard_fold=0).
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
from mcjax.parallel import mesh as pmesh
from mcjax.parallel import ring as pringm


def _hd_config(n=13000, phi=0.42, seed=5):
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=8, n_moves=2, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=seed)
    return cfg, HardSphere(1.0)


@pytest.mark.parametrize("n_shards,n_atoms", [(2, 13000), (4, 23500)])
def test_sharded_ring_bitwise_vs_sharded_xla(n_shards, n_atoms):
    cfg, pot = _hd_config(n=n_atoms)
    st = init_state(cfg)
    sweeps = 2
    devs = jax.devices()[:n_shards]
    mesh = Mesh(np.array(devs).reshape(n_shards), ("x",))

    run_r = pringm.make_sharded_run_ring(
        cfg, pot, mesh, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)
    st_r = pringm.shard_state_ring(cfg, st, mesh, "x")
    out_r, m_r = run_r(st_r)

    run_x = pmesh.make_sharded_run_sweeps(
        cfg, pot, mesh, ("x", None), sweeps, engine="xla")
    st_x = pmesh.shard_state(cfg, st, mesh, ("x", None))
    out_x, m_x = run_x(st_x)

    assert int(jnp.sum(out_r.occ)) == cfg.n_atoms
    np.testing.assert_array_equal(np.asarray(out_r.occ),
                                  np.asarray(out_x.occ))
    np.testing.assert_array_equal(np.asarray(out_r.pos),
                                  np.asarray(out_x.pos))
    np.testing.assert_array_equal(np.asarray(m_r.accepted),
                                  np.asarray(m_x.accepted))
    np.testing.assert_array_equal(np.asarray(m_r.proposed),
                                  np.asarray(m_x.proposed))
    assert not bool(out_r.overflow)


def test_sharded_ring_shard_count_changes_streams():
    """1-shard and 2-shard runs fold different shard ids into the move
    randomness, so trajectories must differ — catching a silently ignored
    shard fold (correlated streams across shards)."""
    cfg, pot = _hd_config(seed=7)
    st = init_state(cfg)
    sweeps = 2
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1), ("x",))
    mesh2 = Mesh(np.array(jax.devices()[:2]).reshape(2), ("x",))

    out1, _ = pringm.make_sharded_run_ring(
        cfg, pot, mesh1, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)(pringm.shard_state_ring(cfg, st, mesh1, "x"))
    out2, _ = pringm.make_sharded_run_ring(
        cfg, pot, mesh2, "x", sweeps, tile_rows=8, interpret=True,
        check_vma=False)(pringm.shard_state_ring(cfg, st, mesh2, "x"))

    assert int(jnp.sum(out1.occ)) == cfg.n_atoms
    assert int(jnp.sum(out2.occ)) == cfg.n_atoms
    assert not np.array_equal(np.asarray(out1.pos), np.asarray(out2.pos))
