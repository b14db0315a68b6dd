"""Multi-process seam (mcjax.launch / parallel.multihost): a 2-process
localhost CPU dryrun — the sharded sweep's halo exchange crosses the
process boundary through the distributed runtime (SURVEY.md §5 "DCN across
slices"; removes the reference's single-process ceiling, kernel.cu:672-677).
"""

import os
import subprocess
import sys

import pytest

from mcjax.parallel.multihost import _near_square_factors


def test_near_square_factors():
    assert _near_square_factors(8, 2) == (4, 2)
    assert _near_square_factors(1, 2) == (1, 1)
    assert _near_square_factors(12, 2) in ((4, 3), (6, 2))
    f3 = _near_square_factors(8, 3)
    assert sorted(f3, reverse=True) == list(f3)
    import math
    assert math.prod(f3) == 8


def test_two_process_launch():
    """python -m mcjax.launch --processes 2 exits 0 (each process: 4 virtual
    CPU devices, conservation + live acceptance asserted in-process)."""
    env = dict(os.environ)
    # children force the CPU backend themselves; strip the test harness's
    # device-count flag so each child sets its own
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "mcjax.launch", "--processes", "2",
         "--sweeps", "2", "--port", "47919"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "launch: ok" in out.stdout
    assert out.stdout.count(": ok (atoms") == 2


def test_two_process_pallas_and_ensemble_legs():
    """Interpret-Pallas kernel + NPT + mixture legs under 2 processes
    (VERDICT r3 item 7): each leg asserts conservation / carried energy /
    species counts across the process boundary in-process; the pallas leg's
    acceptance count must equal the XLA leg's (identical Threefry streams
    through the cross-process halo)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "mcjax.launch", "--processes", "2",
         "--sweeps", "2", "--legs", "xla,pallas,npt,mixture",
         "--port", "47929"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "launch: ok" in out.stdout
    assert out.stdout.count(": ok (") == 2
    assert "npt: atoms" in out.stdout
    assert "mixture: atoms" in out.stdout
    # xla and pallas legs consume identical streams -> equal acceptance;
    # the regex must match BOTH process lines or the parity check is vacuous
    import re
    matches = [m for line in out.stdout.splitlines()
               if (m := re.search(r"xla: atoms \d+, accepted (\d+); pallas: "
                                  r"atoms \d+, accepted (\d+)", line))]
    assert len(matches) == 2, out.stdout[-2000:]
    for m in matches:
        assert m.group(1) == m.group(2)


def test_two_process_fused_leg():
    """The FLAGSHIP fused engine across the process boundary (VERDICT r4
    item 6): a 2-shard 1-D mesh with one shard per process, so the
    ring-apron halo ppermutes ride the inter-process transport; the leg
    itself asserts bitwise equality against the sharded XLA engine and the
    report line must confirm both the bitwise verdict and that the mesh
    actually crossed processes."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "mcjax.launch", "--processes", "2",
         "--devices-per-process", "1", "--sweeps", "2", "--legs", "fused",
         "--port", "47939"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=570)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "launch: ok" in out.stdout
    assert out.stdout.count("bitwise==xla") == 2
    assert out.stdout.count("cross-process=True") == 2
