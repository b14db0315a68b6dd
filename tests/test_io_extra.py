"""Orbax checkpoint backend + YAML/JSON config loading."""

import json

import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import LennardJones
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import io


def small_cfg():
    return SimConfig(dim=3, n_atoms=64, box_length=10.0, cells_per_side=4,
                     nmax=10, n_moves=4)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    cfg = small_cfg()
    lj = LennardJones()
    st = init_state(cfg)
    mid, _ = run_sweeps(cfg, lj, st, 5)
    p = str(tmp_path / "ck_orbax")
    io.save_checkpoint_orbax(p, cfg, mid, lj)
    cfg2, loaded, pot2 = io.load_checkpoint_orbax(p)
    assert cfg2 == cfg
    assert pot2 == lj
    resumed, _ = run_sweeps(cfg2, lj, loaded, 3)
    full, _ = run_sweeps(cfg, lj, st, 8)
    np.testing.assert_array_equal(np.asarray(resumed.pos), np.asarray(full.pos))


def test_config_from_yaml_and_json(tmp_path):
    cfg = small_cfg()
    import dataclasses
    d = dataclasses.asdict(cfg)
    jp = tmp_path / "c.json"
    jp.write_text(json.dumps(d))
    assert io.load_config_file(str(jp)) == cfg
    yaml = pytest.importorskip("yaml")
    yp = tmp_path / "c.yaml"
    yp.write_text(yaml.safe_dump(d))
    assert io.load_config_file(str(yp)) == cfg


def test_orbax_sharded_roundtrip_bitwise_resume(tmp_path):
    """Pod-story checkpoint (VERDICT r3 item 8): save a DOMAIN-SHARDED state
    per-shard via orbax on a 2x2 CPU mesh, restore DIRECTLY onto the mesh
    (no host gather), continue the sharded run, and require the resumed
    trajectory to be BITWISE equal to the uninterrupted one."""
    import math

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.parallel import mesh as pmesh
    from mcjax.utils.io import load_checkpoint_orbax, save_checkpoint_orbax

    n, phi = 1024, 0.42
    box = math.sqrt(n * math.pi / 4.0 / phi)
    cps = int(box // 1.0)
    cps -= cps % 4
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=3, proposal="uniform", step_size=0.15,
                    beta=1.0, seed=9)
    pot = HardSphere(1.0)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("y", "x"))
    axes = ("y", "x")
    run = pmesh.make_sharded_run_sweeps(cfg, pot, mesh, axes, 3)
    st = pmesh.shard_state(cfg, st0 := init_state(cfg), mesh, axes)
    del st0

    mid, _ = run(st)                      # 3 sweeps
    final_direct, _ = run(mid)            # + 3 more, uninterrupted

    path = str(tmp_path / "ck_orbax")
    save_checkpoint_orbax(path, cfg, mid, pot)  # per-shard save

    shardings = pmesh.state_sharding(cfg, mesh, axes)
    cfg2, restored, pot2 = load_checkpoint_orbax(path, shardings)
    assert cfg2 == cfg and pot2 == pot
    # restored arrays live on the mesh, not the host
    assert restored.pos.sharding == shardings.pos
    assert restored.occ.sharding == shardings.occ
    np.testing.assert_array_equal(np.asarray(restored.pos),
                                  np.asarray(mid.pos))

    final_resumed, _ = run(restored)
    np.testing.assert_array_equal(np.asarray(final_resumed.pos),
                                  np.asarray(final_direct.pos))
    np.testing.assert_array_equal(np.asarray(final_resumed.occ),
                                  np.asarray(final_direct.occ))
    assert int(final_resumed.sweep) == int(final_direct.sweep)
