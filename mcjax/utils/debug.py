"""Debug printers and state invariant checking.

Replaces the reference's scattered debug printers (``host_print_disk``
kernel.cu:549-556, ``print_nl`` kernel.cu:539-546, device ``print_ldisk``
kernel.cu:438-445) and — more importantly — makes the reference's
*by-construction* race/consistency guarantees (SURVEY.md §5) checkable:
``validate_state`` verifies every invariant the engine relies on, so any
would-be race or capacity corruption surfaces as a hard error in debug runs
instead of silent corruption.
"""

from __future__ import annotations

import io
from typing import TextIO

import jax.numpy as jnp
import numpy as np

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.models.reference import total_energy
from mcjax.ops import cells


class StateInvariantError(AssertionError):
    pass


def validate_state(cfg: SimConfig, state: SimState,
                   pot: Potential | None = None,
                   expect_atoms: int | None = None) -> None:
    """Check every structural invariant of a SimState; raise on violation.

    Checks (host-side, test/debug use):
      1. occupancy in [0, nmax] and totals match n_atoms;
      2. every slab entry below its cell's occupancy lies inside that cell's
         spatial bounds (the binning contract every sub-sweep relies on —
         in-cell rejection keeps it true, kernel.cu:192-206 analogue);
      3. coordinates are inside the box;
      4. the sticky overflow flag is unset;
      5. (optional) no hard-core overlaps for hard potentials.
    """
    occ = np.asarray(state.occ)
    pos = np.asarray(state.pos)
    n_expected = expect_atoms if expect_atoms is not None else cfg.n_atoms

    if occ.min() < 0 or occ.max() > cfg.nmax:
        raise StateInvariantError(f"occupancy out of range [0,{cfg.nmax}]: "
                                  f"min={occ.min()} max={occ.max()}")
    if occ.sum() != n_expected:
        raise StateInvariantError(
            f"particle count {occ.sum()} != expected {n_expected}")
    if bool(np.asarray(state.overflow)):
        raise StateInvariantError("sticky capacity-overflow flag is set")

    w = cfg.cell_width
    half_l = cfg.box_length / 2.0
    slot = np.arange(cfg.nmax)
    for color in range(cfg.n_colors):
        o = cells.color_bits(color, cfg.dim)
        occ_c = occ[color]                      # [*bs]
        pos_c = pos[color]                      # [dim, nmax, *bs] planes
        valid = slot.reshape((nmax_shape := (cfg.nmax,) + (1,) * cfg.dim)) \
            < occ_c[None]                       # [nmax, *bs]
        live = np.moveaxis(pos_c, 0, -1)[np.broadcast_to(valid, pos_c.shape[1:])]
        if live.size and (np.abs(live) > half_l + 1e-5).any():
            raise StateInvariantError("coordinates outside the box")
        for k in range(cfg.dim):
            bk = np.indices(cfg.block_shape)[k]
            ck = 2 * bk + o[k]
            lo = ck * w - half_l
            x = pos_c[k]                        # [nmax, *bs]
            bad = valid & ((x < lo[None] - 1e-5) | (x >= lo[None] + w + 1e-5))
            if bad.any():
                raise StateInvariantError(
                    f"color {color}: {bad.sum()} slab entries outside their "
                    f"cell bounds along axis {k}")

    if pot is not None and pot.has_hard_core:
        # n_out follows the LIVE count (GCMC states have N != cfg.n_atoms);
        # the default would append garbage slots and report phantom overlaps
        r = cells.unbin(cfg, state.pos, state.occ, n_out=int(occ.sum()))
        _, ov = total_energy(pot, r, cfg.box_length)
        if bool(ov):
            raise StateInvariantError("hard-core overlap present")


def format_state(cfg: SimConfig, state: SimState, max_cells: int = 16,
                 file: TextIO | None = None) -> str:
    """Readable per-cell listing — host_print_disk parity (kernel.cu:549-556)."""
    out = io.StringIO()
    occ = np.asarray(state.occ).reshape(-1)
    pos = np.moveaxis(np.asarray(state.pos), (1, 2), (-1, -2))
    pos = pos.reshape(-1, cfg.nmax, cfg.dim)
    print(f"# sweep={int(state.sweep)} atoms={occ.sum()} "
          f"overflow={bool(np.asarray(state.overflow))}", file=out)
    for c in range(min(len(occ), max_cells)):
        for j in range(occ[c]):
            coords = "\t".join(f"{v:.6f}" for v in pos[c, j])
            print(f"atom {j} in flat-cell {c}: {coords}", file=out)
    if len(occ) > max_cells:
        print(f"# ... {len(occ) - max_cells} more cells", file=out)
    s = out.getvalue()
    if file is not None:
        file.write(s)
    return s


def format_neighbor_plan(cfg: SimConfig) -> str:
    """Neighbor-plan dump — print_nl parity (kernel.cu:539-546)."""
    out = io.StringIO()
    for color in range(cfg.n_colors):
        plan = cells.neighbor_plan(cfg.dim, color)
        print(f"color {color}: "
              + " ".join(f"{src}@{shifts}" for src, shifts in plan), file=out)
    return out.getvalue()
