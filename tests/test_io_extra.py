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
