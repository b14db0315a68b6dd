"""Debug/invariant checker + CLI driver smoke tests."""

import json
import math
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState, init_state
from mcjax.models.potentials import HardSphere, LennardJones
from mcjax.ops.sweep import run_sweeps
from mcjax.utils import debug


def hd_cfg():
    n, phi = 128, 0.4
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 1.0)
    cps -= cps % 2
    return SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                     nmax=8, n_moves=4, proposal="uniform", step_size=0.15,
                     beta=1.0), HardSphere(1.0)


def test_validate_state_accepts_valid_run():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    debug.validate_state(cfg, st, pot)
    st, _ = run_sweeps(cfg, pot, st, 10)
    debug.validate_state(cfg, st, pot)  # invariants survive sweeps + shifts


def test_validate_state_catches_corruption():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    # corrupt: move a live slab entry out of its cell (planes layout)
    occ = np.asarray(st.occ)
    c, by, bx = np.argwhere(occ > 0)[0]
    bad_pos = st.pos.at[c, 0, 0, by, bx].add(cfg.cell_width * 2.5)
    bad = SimState(pos=bad_pos, occ=st.occ, key=st.key, sweep=st.sweep,
                   overflow=st.overflow)
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad, expect_atoms=cfg.n_atoms)
    # corrupt: occupancy count
    bad2 = SimState(pos=st.pos, occ=st.occ.at[0, 0, 0].add(1), key=st.key,
                    sweep=st.sweep, overflow=st.overflow)
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad2, expect_atoms=cfg.n_atoms)
    # sticky overflow flag
    bad3 = SimState(pos=st.pos, occ=st.occ, key=st.key, sweep=st.sweep,
                    overflow=jnp.ones((), jnp.bool_))
    with pytest.raises(debug.StateInvariantError):
        debug.validate_state(cfg, bad3, expect_atoms=cfg.n_atoms)


def test_format_helpers():
    cfg, pot = hd_cfg()
    st = init_state(cfg)
    s = debug.format_state(cfg, st, max_cells=4)
    assert "atom 0 in flat-cell" in s
    s2 = debug.format_neighbor_plan(cfg)
    assert s2.count("color") == cfg.n_colors


def test_cli_reference_preset_smoke(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "mcjax.cli", "--preset", "reference-lj",
         "--sweeps", "4", "--chunk", "2",
         "--dump", str(tmp_path / "d.txt"),
         "--checkpoint", str(tmp_path / "ck.npz")],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "PYTHONPATH": "."},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if ":" in l]
    assert lines[0].startswith("0:")
    assert (tmp_path / "d.txt").exists()
    assert (tmp_path / "ck.npz").exists()
    # energy trace printed per chunk like the reference's per-sweep printf
    assert len(lines) == 3
