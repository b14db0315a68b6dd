"""External (one-body) fields: traps, gravity, hard walls, compositions.

The reference framework is pure-bulk (periodic, translation-invariant —
kernel.cu has no one-body term anywhere); these fields extend mcjax to
confined and driven systems (sedimentation, slit pores, optical traps).

A field evaluates at PHYSICAL coordinates. The sweep engine's grid shift
re-expresses all stored coordinates in a drifting frame (a shift of the
cell grid by +d is implemented as shifting every coordinate by -d,
ops/cells.py _shift_rebin_axis), so field-aware runs carry a frame
``origin`` with physical x = wrap(stored + origin); ops/extfield.py owns
that bookkeeping.

All fields are frozen, hashable dataclasses (static jit args) with tuple
parameters, like the pair potentials (models/potentials.py).

Species coupling (mixtures): a field may additionally define
``energy_s(x, s)`` / ``forbidden_s(x, s)`` taking the per-particle float
species id ``s`` (broadcast against ``x[axis]``'s shape) — the mixture
sweep engine prefers those and falls back to the species-blind methods
(``species_energy`` / ``species_forbidden`` below implement the fallback).
``SpeciesField`` wraps any base field with per-species coupling constants
(e.g. gravity with per-species buoyant mass — sedimentation
fractionation); ``SlitWalls`` takes per-species contact ``diameters``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def species_energy(field, x, s=None):
    """field's one-body energy, species-resolved when both the field and the
    caller support it (the mixture engine's dispatch point)."""
    if s is not None and hasattr(field, "energy_s"):
        return field.energy_s(x, s)
    return field.energy(x)


def species_forbidden(field, x, s=None):
    """field's forbidden-region indicator, species-resolved when possible."""
    if s is not None and hasattr(field, "forbidden_s"):
        return field.forbidden_s(x, s)
    return field.forbidden(x)


def _select_by_species(values: tuple, s):
    """sum_k values[k] * [s == k] — branch-free per-particle table lookup
    (species counts are tiny; a masked polynomial beats a gather on TPU)."""
    out = 0.0
    for k, v in enumerate(values):
        out = out + v * (s == float(k))
    return out


def _as_tuple(v, dim: int) -> tuple:
    if isinstance(v, (int, float)):
        return (float(v),) * dim
    t = tuple(float(x) for x in v)
    if len(t) != dim:
        raise ValueError(f"expected {dim} per-axis values, got {len(t)}")
    return t


@dataclass(frozen=True)
class HarmonicTrap:
    """u(x) = sum_a k_a (x_a - c_a)^2 / 2 — an optical-trap / umbrella
    restraint. ``stiffness`` is a scalar or per-axis tuple; axes with
    stiffness 0 are unconfined."""
    stiffness: float | tuple = 1.0
    center: tuple = ()
    dim: int = 2

    has_energy = True

    def __post_init__(self):
        object.__setattr__(self, "stiffness",
                           _as_tuple(self.stiffness, self.dim))
        c = self.center if self.center else (0.0,) * self.dim
        object.__setattr__(self, "center", _as_tuple(c, self.dim))

    def energy(self, x):
        """x: [dim, *bs] physical coords -> [*bs] one-body energy."""
        e = 0.0
        for a in range(self.dim):
            d = x[a] - self.center[a]
            e = e + 0.5 * self.stiffness[a] * d * d
        return e

    def forbidden(self, x):
        return jnp.zeros(x.shape[1:], jnp.bool_)


@dataclass(frozen=True)
class LinearField:
    """u(x) = g * x_axis — gravity / uniform drive along one axis.

    In a periodic box this energy is discontinuous across the wrap; pair it
    with ``SlitWalls`` on the same axis (CompositeField) so no particle
    crosses the boundary — the standard sedimentation setup."""
    g: float = 1.0
    axis: int = 0

    has_energy = True

    def energy(self, x):
        return self.g * x[self.axis]

    def forbidden(self, x):
        return jnp.zeros(x.shape[1:], jnp.bool_)


@dataclass(frozen=True)
class SlitWalls:
    """Hard walls at x_axis = lo and x_axis = hi: particle CENTERS outside
    [lo + diameter/2, hi - diameter/2] are forbidden (zero energy inside —
    a slit pore). Start configurations must already satisfy the constraint
    (like hard-core overlaps, forbidden states are never re-created).

    ``diameters`` (optional per-species tuple) overrides ``diameter`` for
    mixture runs: species k's center must stay diameters[k]/2 off each wall.
    """
    lo: float
    hi: float
    axis: int = 0
    diameter: float = 0.0
    diameters: tuple = ()

    has_energy = False

    def __post_init__(self):
        object.__setattr__(self, "diameters",
                           tuple(float(d) for d in self.diameters))

    def energy(self, x):
        return jnp.zeros(x.shape[1:], jnp.float32)

    def forbidden(self, x):
        h = 0.5 * self.diameter
        return (x[self.axis] < self.lo + h) | (x[self.axis] > self.hi - h)

    def forbidden_s(self, x, s):
        if not self.diameters:
            return self.forbidden(x)
        h = 0.5 * _select_by_species(self.diameters, s)
        return (x[self.axis] < self.lo + h) | (x[self.axis] > self.hi - h)


@dataclass(frozen=True)
class SpeciesField:
    """Per-species coupling on a base field: u_k(x) = couplings[k] * u(x)
    (e.g. LinearField gravity with per-species buoyant masses — colloidal
    sedimentation fractionation). Mixture runs only: the species-blind
    ``energy`` raises, so accidentally feeding this to the single-species
    engine fails loudly instead of averaging the couplings away."""
    base: object
    couplings: tuple

    def __post_init__(self):
        object.__setattr__(self, "couplings",
                           tuple(float(c) for c in self.couplings))
        if not self.base.has_energy:
            raise ValueError("SpeciesField scales an energy; base field "
                             "has none (walls: use SlitWalls.diameters)")

    has_energy = True

    def energy(self, x):
        raise TypeError("SpeciesField is species-resolved; run it through "
                        "the mixture engine (ops/extfield.py with a mixture "
                        "potential)")

    def energy_s(self, x, s):
        return _select_by_species(self.couplings, s) * self.base.energy(x)

    def forbidden(self, x):
        return self.base.forbidden(x)

    def forbidden_s(self, x, s):
        return species_forbidden(self.base, x, s)


@dataclass(frozen=True)
class CompositeField:
    """Sum of fields: energies add, forbidden regions union
    (e.g. gravity + walls = sedimentation)."""
    fields: tuple

    def __post_init__(self):
        object.__setattr__(self, "fields", tuple(self.fields))

    @property
    def has_energy(self) -> bool:
        return any(f.has_energy for f in self.fields)

    def energy(self, x):
        e = jnp.zeros(x.shape[1:], jnp.float32)
        for f in self.fields:
            if f.has_energy:
                e = e + f.energy(x)
        return e

    def energy_s(self, x, s):
        e = jnp.zeros(x.shape[1:], jnp.float32)
        for f in self.fields:
            if f.has_energy:
                e = e + species_energy(f, x, s)
        return e

    def forbidden(self, x):
        bad = jnp.zeros(x.shape[1:], jnp.bool_)
        for f in self.fields:
            bad = bad | f.forbidden(x)
        return bad

    def forbidden_s(self, x, s):
        bad = jnp.zeros(x.shape[1:], jnp.bool_)
        for f in self.fields:
            bad = bad | species_forbidden(f, x, s)
        return bad
