from mcjax.models.potentials import (
    HardSphere,
    LennardJones,
    Potential,
    SoftSphere,
    WCA,
    pair_interaction,
)

__all__ = [
    "Potential",
    "LennardJones",
    "HardSphere",
    "SoftSphere",
    "WCA",
    "pair_interaction",
]
