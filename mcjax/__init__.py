"""mcjax — TPU-native massively parallel Monte Carlo for many-particle systems.

A brand-new JAX/XLA/Pallas framework with the capabilities of the CUDA reference
``qingye3/parallel-monte-carlo`` (checkerboard cell-set Metropolis sub-sweeps,
random grid shifts for ergodicity, cell-list neighbor energy evaluation,
LJ / hard-particle models, energy & acceptance & trajectory observables),
re-designed TPU-first:

* state lives in *color-blocked coordinate planes* ``pos[2^dim, dim, nmax, (cps/2)^dim...]``
  so checkerboard neighbor access is a shifted read (``jnp.roll`` on one chip,
  halo ``ppermute`` across a mesh) instead of a gather;
* a full MC sweep (all 2^dim colors × n_M moves + grid shift) is one traced
  device program — the reference pays 9 kernel launches + 8 D2H copies per
  sweep (kernel.cu:652-701), we pay zero host round-trips;
* randomness is counter-based Threefry keyed on (seed, sweep, color), making
  runs bitwise reproducible and trivially vmappable over replica ensembles
  (the reference seeds cuRAND with ``clock()`` per launch, kernel.cu:284);
* hot sub-sweep is a fused Pallas TPU kernel; domain sharding over a device
  mesh uses ``shard_map`` + halo exchange over ICI.
"""

from mcjax.core.config import SimConfig
from mcjax.core.state import SimState, init_state
from mcjax.models.potentials import (HardSphere, LennardJones, SoftSphere,
                                     SquareWell, WCA, Yukawa)

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "SimState",
    "init_state",
    "LennardJones",
    "HardSphere",
    "SquareWell",
    "Yukawa",
    "SoftSphere",
    "WCA",
]
