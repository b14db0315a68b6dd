"""BASELINE config 5: large hard-disk system, domain-sharded box over a
device mesh with halo exchange + psum observables.

On real hardware this runs over a TPU pod slice; here it works identically
over the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
— same shard_map program, same ppermute halo exchange.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import math
import os

import numpy as np


def main():
    if os.environ.get("FORCE_CPU_MESH", "1") == "1":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if jax.device_count() < 4:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mcjax.core.config import SimConfig
    from mcjax.core.state import init_state
    from mcjax.models.potentials import HardSphere
    from mcjax.parallel import mesh as pmesh

    # keep the demo CPU-friendly; raise n for a pod run
    n, phi = 16384, 0.5
    box = math.sqrt(n * math.pi / 4 / phi)
    cps = int(box // 2.0)
    cps -= cps % 8  # half_cps divisible by the 2x2 spatial mesh... and colors
    cfg = SimConfig(dim=2, n_atoms=n, box_length=box, cells_per_side=cps,
                    nmax=12, n_moves=6, proposal="uniform", step_size=0.18,
                    beta=1.0, seed=0)
    pot = HardSphere(1.0)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    m = Mesh(devs, ("y", "x"))
    run = pmesh.make_sharded_run_sweeps(cfg, pot, m, ("y", "x"), 20)
    st = pmesh.shard_state(cfg, init_state(cfg), m, ("y", "x"))
    st, metrics = run(st)
    print(f"devices: {[str(d) for d in m.devices.ravel()]}")
    print(f"atoms conserved: {int(jnp.sum(st.occ))} == {cfg.n_atoms}")
    prop = int(jnp.sum(metrics.proposed))
    print(f"20 sharded sweeps: acceptance "
          f"{int(jnp.sum(metrics.accepted))/prop:.3f} (psum'd over the mesh)")


if __name__ == "__main__":
    main()
