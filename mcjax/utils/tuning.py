"""Proposal step-size auto-tuning.

The reference hard-codes sigma = 0.5 (kernel.cu:27) with no way to adapt it;
acceptance is never even reported (SURVEY.md §5).  This utility tunes the
displacement scale toward a target acceptance ratio during warmup — tuning
must happen *before* production sweeps, since changing the proposal during
sampling would break detailed balance.
"""

from __future__ import annotations

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState
from mcjax.models.potentials import Potential
from mcjax.ops.sweep import run_sweeps


def tune_step_size(cfg: SimConfig, pot: Potential, state: SimState,
                   target: float = 0.4, rounds: int = 6,
                   sweeps_per_round: int = 5,
                   bounds: tuple[float, float] = (1e-3, None),
                   runner=run_sweeps
                   ) -> tuple[SimConfig, SimState, float]:
    """Multiplicatively adapt cfg.step_size toward ``target`` acceptance.

    Returns (tuned cfg, advanced state, final acceptance). Each round runs a
    few sweeps at the current step (which also equilibrates the system), then
    rescales by (acc/target) clipped to [0.5, 2.0] per round. The proposal
    stays within the cell-rejection regime: steps are capped at cell_width
    (larger steps are pointless — every move would leave the cell).
    ``runner`` lets the CLI tune on its selected engine (Pallas on TPU).
    Reachable from the CLI via --tune-acceptance.
    """
    hi_cap = bounds[1] if bounds[1] is not None else cfg.cell_width
    step = cfg.step_size
    acc = 0.0
    for _ in range(rounds):
        cur = cfg.replace(step_size=float(step))
        state, m = runner(cur, pot, state, sweeps_per_round)
        acc = float(m.accepted.sum()) / max(float(m.proposed.sum()), 1.0)
        ratio = max(0.5, min(2.0, (acc + 1e-3) / max(target, 1e-3)))
        step = min(max(step * ratio, bounds[0]), hi_cap)
    return cfg.replace(step_size=float(step)), state, acc
