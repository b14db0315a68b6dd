from mcjax.models.fields import (
    CompositeField,
    HarmonicTrap,
    LinearField,
    SlitWalls,
)
from mcjax.models.potentials import (
    HardSphere,
    LennardJones,
    Potential,
    SoftSphere,
    SquareWell,
    WCA,
    Yukawa,
    pair_interaction,
)

__all__ = [
    "Potential",
    "LennardJones",
    "HardSphere",
    "SoftSphere",
    "WCA",
    "SquareWell",
    "Yukawa",
    "pair_interaction",
    "HarmonicTrap",
    "LinearField",
    "SlitWalls",
    "CompositeField",
]
