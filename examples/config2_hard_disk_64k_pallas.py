"""BASELINE config 2: 2D hard disks, N=64k, checkerboard cell-set Pallas
sweeps + random grid shifts, single TPU core."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math
import time

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.core.state import init_state
from mcjax.models.potentials import HardSphere


def main():
    n, phi = 65536, 0.5
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 2.0)
    cps -= cps % 2
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=10, n_moves=16, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)
    state = init_state(cfg)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        from mcjax.ops.pallas_sweep import run_sweeps_pallas as runner
    else:  # CPU fallback: identical trajectories via the XLA twin engine
        from mcjax.ops.sweep import run_sweeps as runner

    sweeps = 50
    st, m = runner(cfg, pot, state, sweeps)
    _ = float(jnp.sum(m.delta_e))
    t0 = time.perf_counter()
    st, m = runner(cfg, pot, st, sweeps)
    _ = float(jnp.sum(m.delta_e))
    dt = time.perf_counter() - t0
    prop = int(jnp.sum(m.proposed))
    print(f"{sweeps} sweeps in {dt:.3f}s — {prop/dt:.3e} trial moves/s, "
          f"acceptance {int(jnp.sum(m.accepted))/prop:.3f}, "
          f"engine={'pallas' if on_tpu else 'xla'}")


if __name__ == "__main__":
    main()
