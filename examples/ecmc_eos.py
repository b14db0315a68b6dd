"""Hard-disk equation of state from event-chain MC — pressure for free.

Sweeps packing fractions and, at each phi, runs replica-vmapped straight
event chains (mcjax.ops.ecmc): the lift-excess estimator gives
beta*P/rho = Z(phi) directly from the chain statistics (Michel, Kapfer &
Krauth, JCP 140, 054116 (2014)) — no virial histogram, no contact-value
extrapolation. Printed against the Henderson closed form.

Run:  python examples/ecmc_eos.py [n_per_replica] [replicas]
CPU-friendly at the defaults; scale both up on a TPU chip.
"""

import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig
from mcjax.models.potentials import HardSphere
from mcjax.ops import ecmc
from mcjax.ops.cells import stratified_positions
from mcjax.parallel import ensemble
from mcjax.utils.observables import henderson_z_disks


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chains_eq, chains_ms = 200, 400
    pot = HardSphere(1.0)

    print(f"# N={n} x {replicas} replicas; {chains_eq}+{chains_ms} chains "
          f"of ell=L/2 per replica")
    print("# phi    Z_ecmc    Z_henderson   rel.err")
    for phi in (0.30, 0.40, 0.50, 0.60):
        box = math.sqrt(n * math.pi / 4.0 / phi)
        cps = int(box // 2.0)
        cps -= cps % 2
        cfg = SimConfig(dim=2, n_atoms=n, box_length=box,
                        cells_per_side=cps, nmax=10, n_moves=1,
                        proposal="uniform", step_size=0.1, beta=1.0, seed=0)
        states = ensemble.init_ensemble(
            cfg, replicas,
            positions=stratified_positions(cfg, min_separation=1.0))
        ell = float(box / 2.0)
        # equilibrate with chains themselves (ECMC is its own equilibrator)
        states, _ = ecmc.run_ecmc_ensemble(cfg, pot, states,
                                           jax.random.key(1), chains_eq,
                                           ell)
        states, m = ecmc.run_ecmc_ensemble(cfg, pot, states,
                                           jax.random.key(2), chains_ms,
                                           ell)
        z = float(ecmc.pressure_from_metrics(m))
        z_ref = henderson_z_disks(phi)
        assert int(jnp.sum(m.capped)) == 0
        print(f"  {phi:.2f}  {z:8.4f}  {z_ref:10.4f}   "
              f"{abs(z - z_ref) / z_ref:8.4f}")


if __name__ == "__main__":
    main()
