"""Pallas engine under domain sharding: bitwise parity with the XLA mesh path
(interpret mode on the virtual CPU mesh; check_vma off is an interpret-mode
limitation only)."""

import math

import jax
import numpy as np
from jax.sharding import Mesh

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere
from mcjax.models.reference import total_energy
from mcjax.ops import cells
from mcjax.parallel import mesh as pmesh


def test_sharded_pallas_bitwise_vs_sharded_xla():
    n, phi = 128, 0.4
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 4
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=6, n_moves=2, proposal="uniform", step_size=0.12,
                    beta=1.0)
    hs = HardSphere(1.0)
    m = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
    st = pmesh.shard_state(cfg, init_state(cfg), m, ("y", "x"))

    run_p = pmesh.make_sharded_run_sweeps(cfg, hs, m, ("y", "x"), 2,
                                          engine="pallas", interpret=True,
                                          check_vma=False)
    run_x = pmesh.make_sharded_run_sweeps(cfg, hs, m, ("y", "x"), 2)
    sp, mp = run_p(st)
    sx, mx = run_x(st)
    np.testing.assert_array_equal(np.asarray(sp.pos), np.asarray(sx.pos))
    np.testing.assert_array_equal(np.asarray(mp.accepted), np.asarray(mx.accepted))
    assert int(sp.occ.sum()) == n
    _, ov = total_energy(hs, cells.unbin(cfg, sp.pos, sp.occ), cfg.box_length)
    assert not bool(ov)
