"""Pair potentials / particle models.

The reference hard-codes one model: truncated (unshifted) Lennard-Jones 12-6
with cutoff rc = 2.5 inlined into its kernels (V2 kernel.cu:335-346, host
reference kernel.cu:452-470, V1 subsweep.h:90-103).  mcjax makes the model a
pluggable pure function of squared distance and adds the hard-core family
(hard disks / hard spheres — the BASELINE.json headline workload), soft
spheres, and WCA.

Every potential is a frozen (hashable) dataclass so it can be a static jit
argument; all evaluation is elementwise on squared distances, which keeps the
hot path on the VPU with no transcendentals for the hard family.

API: ``pair_energy(r2)`` (finite part, zero beyond cutoff) and
``overlap(r2)`` (True where the configuration is forbidden).  The Metropolis
rule is then: reject on any new overlap; otherwise accept with
min(1, exp(-beta dE)) on the finite part.  Keeping the hard core as a boolean
instead of an infinite energy avoids inf-inf NaNs under vectorized masking.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import jax.numpy as jnp


@runtime_checkable
class Potential(Protocol):
    """Structural interface all models satisfy."""

    r_cut: float
    has_energy: bool      # False for pure hard-core models (skip exp in accept)
    has_hard_core: bool   # True if overlap() can ever be True

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray: ...

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray: ...


def _safe_inv(r2: jnp.ndarray) -> jnp.ndarray:
    """1/r2 guarded against the masked-garbage r2=0 entries."""
    return 1.0 / jnp.maximum(r2, 1e-12)


# Newton refinement steps applied to the VPU's approximate reciprocal in
# _pl_safe_inv.  2 (default) is f32-exact (error ~(rel0)^4); 1 leaves a
# ~1e-5 relative error on 1/r2 — a deterministic potential perturbation far
# inside the f32-LJ modelling error, gated by the dE-anchor + EOS checks
# (scripts/validate_in_kernel_rng.py runs them on every bench).  Read at
# TRACE time (like pallas_sweep.IH_K): set it only in a fresh process
# (bench.py --inv-newton).
PL_INV_NEWTON = 2


def _pl_safe_inv(r2: jnp.ndarray) -> jnp.ndarray:
    """Guarded reciprocal for Pallas TPU kernels: the VPU's approximate
    reciprocal + PL_INV_NEWTON Newton refinements, ~5 one-cycle vector ops
    where an exact divide serializes for tens of cycles per pair slot —
    the divide was the single largest cost in the 3D LJ sub-sweep kernel
    (2 divides per pair slot)."""
    from jax.experimental import pallas as pl

    r2s = jnp.maximum(r2, 1e-12)
    x = pl.reciprocal(r2s, approx=True)
    for _ in range(PL_INV_NEWTON):
        x = x * (2.0 - r2s * x)
    return x


@dataclasses.dataclass(frozen=True)
class LennardJones:
    """Truncated LJ 12-6: 4 eps ((s/r)^12 - (s/r)^6) for r <= r_cut.

    ``shift=False`` reproduces the reference's bare truncation
    (kernel.cu:335-346 applies no tail shift); ``shift=True`` subtracts the
    cutoff value so the potential is continuous.
    """

    epsilon: float = 1.0
    sigma: float = 1.0
    r_cut: float = 2.5
    shift: bool = False
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return self._energy(r2, _safe_inv)

    def pair_energy_pl(self, r2: jnp.ndarray) -> jnp.ndarray:
        """Pallas-kernel variant (Newton-refined approximate reciprocal)."""
        return self._energy(r2, _pl_safe_inv)

    def _energy(self, r2, inv_fn):
        inv2 = (self.sigma * self.sigma) * inv_fn(r2)
        inv6 = inv2 * inv2 * inv2
        e = 4.0 * self.epsilon * (inv6 * inv6 - inv6)
        if self.shift:
            s6 = (self.sigma / self.r_cut) ** 6
            e = e - 4.0 * self.epsilon * (s6 * s6 - s6)
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.bool_)


@dataclasses.dataclass(frozen=True)
class HardSphere:
    """Hard disks (2D) / hard spheres (3D): forbidden if r < diameter.

    Pure excluded volume — no energy scale, acceptance is overlap-free-ness.
    This is the BASELINE.json north-star model (1M hard disks).
    """

    diameter: float = 1.0
    has_energy: bool = dataclasses.field(default=False, init=False)
    has_hard_core: bool = dataclasses.field(default=True, init=False)

    @property
    def r_cut(self) -> float:
        return self.diameter

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.float32)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return r2 < self.diameter * self.diameter


@dataclasses.dataclass(frozen=True)
class SoftSphere:
    """Inverse-power repulsion eps (sigma/r)^n, truncated at r_cut."""

    epsilon: float = 1.0
    sigma: float = 1.0
    exponent: int = 12
    r_cut: float = 2.5
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return self._energy(r2, _safe_inv)

    def pair_energy_pl(self, r2: jnp.ndarray) -> jnp.ndarray:
        """Pallas-kernel variant (Newton-refined approximate reciprocal)."""
        return self._energy(r2, _pl_safe_inv)

    def _energy(self, r2, inv_fn):
        inv2 = (self.sigma * self.sigma) * inv_fn(r2)
        if self.exponent % 2 == 0:
            # pow-by-squaring: keeps the hot path on 1-cycle vector muls
            p, base, acc = self.exponent // 2, inv2, None
            while p:
                if p & 1:
                    acc = base if acc is None else acc * base
                base, p = base * base, p >> 1
            e = self.epsilon * acc
        else:
            e = self.epsilon * inv2 ** (self.exponent / 2.0)
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.bool_)


@dataclasses.dataclass(frozen=True)
class WCA:
    """Weeks-Chandler-Andersen: LJ truncated at 2^(1/6) sigma, shifted by eps."""

    epsilon: float = 1.0
    sigma: float = 1.0
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)

    @property
    def r_cut(self) -> float:
        return 2.0 ** (1.0 / 6.0) * self.sigma

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return self._energy(r2, _safe_inv)

    def pair_energy_pl(self, r2: jnp.ndarray) -> jnp.ndarray:
        """Pallas-kernel variant (Newton-refined approximate reciprocal)."""
        return self._energy(r2, _pl_safe_inv)

    def _energy(self, r2, inv_fn):
        inv2 = (self.sigma * self.sigma) * inv_fn(r2)
        inv6 = inv2 * inv2 * inv2
        e = 4.0 * self.epsilon * (inv6 * inv6 - inv6) + self.epsilon
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.bool_)


@dataclasses.dataclass(frozen=True)
class SquareWell:
    """Hard core at ``diameter`` with an attractive well of depth ``epsilon``
    out to ``lam * diameter`` (the classic adhesive-fluid model).

    Exercises the combined accept path (hard-core rejection AND Metropolis on
    a finite dE) in both engines — the reference supports neither piece
    (its model is smooth LJ only, kernel.cu:335-346). Energies inside the
    core region are never sampled (overlap rejects first), so pair_energy may
    return -epsilon there without affecting the chain.
    """

    epsilon: float = 1.0
    diameter: float = 1.0
    lam: float = 1.5
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=True, init=False)

    @property
    def r_cut(self) -> float:
        return self.lam * self.diameter

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(r2 <= self.r_cut * self.r_cut,
                         jnp.float32(-self.epsilon), 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return r2 < self.diameter * self.diameter


@dataclasses.dataclass(frozen=True)
class Yukawa:
    """Screened-Coulomb repulsion: eps * (sigma/r) * exp(-kappa (r - sigma)),
    truncated at r_cut (charged colloids / dusty plasmas).

    Smooth everywhere we sample (guarded at r -> 0 like the LJ family);
    needs sqrt+exp per pair — still fully VPU-vectorized.
    """

    epsilon: float = 1.0
    sigma: float = 1.0
    kappa: float = 2.0
    r_cut: float = 3.0
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        e = (self.epsilon * self.sigma / r
             * jnp.exp(-self.kappa * (r - self.sigma)))
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.bool_)


@dataclasses.dataclass(frozen=True)
class Morse:
    """Morse potential: eps ((1 - e^{-a(r - r0)})^2 - 1), truncated at
    r_cut and optionally shifted to zero there (metallic bonding / deep
    smooth wells; a sets the stiffness, r0 the minimum).
    """

    epsilon: float = 1.0
    r0: float = 1.0
    a: float = 5.0
    r_cut: float = 2.5
    shift: bool = True
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)

    def _bare(self, r):
        x = 1.0 - jnp.exp(-self.a * (r - self.r0))
        return self.epsilon * (x * x - 1.0)

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        e = self._bare(r)
        if self.shift:
            import math as _m

            xc = 1.0 - _m.exp(-self.a * (self.r_cut - self.r0))
            e = e - self.epsilon * (xc * xc - 1.0)
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(r2.shape, jnp.bool_)


@dataclasses.dataclass(frozen=True)
class PolynomialPotential:
    """User-defined isotropic pair potential as a polynomial in u = 1/r2:
    e(r) = sum_k coeffs[k] u^k for r <= r_cut, optional hard core below
    ``core_diameter``.  Built by :func:`fit_pair_polynomial` from any
    (r, e) table.

    This is the TPU-native answer to LAMMPS-style tabulated pair styles:
    a table lookup is a per-lane gather (poison on the VPU — and
    unsupported in the Pallas sub-sweep's vector regs), while a Horner
    chain in the already-computed reciprocal is pure FMA at ~1
    cycle/degree/lane and drops into BOTH engines unchanged.  LJ itself
    is exactly degree 6 in u (terms 3 and 6), so the fit represents the
    smooth families exactly, not approximately.
    """

    coeffs: tuple = (0.0,)
    r_cut: float = 2.5
    core_diameter: float = 0.0
    has_energy: bool = dataclasses.field(default=True, init=False)

    def __post_init__(self):
        # coerce JSON-round-tripped lists back to a hashable tuple
        object.__setattr__(self, "coeffs",
                           tuple(float(c) for c in self.coeffs))

    @property
    def has_hard_core(self) -> bool:
        return self.core_diameter > 0.0

    def pair_energy(self, r2: jnp.ndarray) -> jnp.ndarray:
        return self._energy(r2, _safe_inv)

    def pair_energy_pl(self, r2: jnp.ndarray) -> jnp.ndarray:
        """Pallas-kernel variant (Newton-refined approximate reciprocal)."""
        return self._energy(r2, _pl_safe_inv)

    def _energy(self, r2, inv_fn):
        u = inv_fn(r2)
        e = jnp.full(r2.shape, jnp.float32(self.coeffs[-1]))
        for c in reversed(self.coeffs[:-1]):   # Horner in u
            e = e * u + jnp.float32(c)
        return jnp.where(r2 <= self.r_cut * self.r_cut, e, 0.0)

    def overlap(self, r2: jnp.ndarray) -> jnp.ndarray:
        if self.core_diameter <= 0.0:
            return jnp.zeros(r2.shape, jnp.bool_)
        return r2 < self.core_diameter * self.core_diameter


def fit_pair_polynomial(r, e, degree: int = 8, r_cut: float | None = None,
                        core_diameter: float = 0.0) -> PolynomialPotential:
    """Least-squares fit of a sampled pair potential e(r) to a polynomial
    in u = 1/r2 (see :class:`PolynomialPotential`), pinned to zero at the
    cutoff.  Returns the fitted potential and raises if the residual is
    worse than 1e-3 of the sampled energy scale (a bad basis/degree should
    fail loudly, not corrupt a simulation silently).

    Samples inside ``core_diameter`` are excluded (the hard core rejects
    before any energy is evaluated there)."""
    import numpy as _np

    r = _np.asarray(r, dtype=_np.float64).reshape(-1)
    e = _np.asarray(e, dtype=_np.float64).reshape(-1)
    if r.shape != e.shape or r.size < degree + 1:
        raise ValueError("need matching r/e samples, more than degree+1")
    if r_cut is None:
        r_cut = float(r.max())
    keep = (r > core_diameter) & (r <= r_cut)
    if keep.sum() < degree + 1:
        raise ValueError("too few samples inside (core, r_cut]")
    u = 1.0 / (r[keep] ** 2)
    # basis with the cutoff pinned: p(u) - p(u_cut) spans {u^k - u_cut^k}
    uc = 1.0 / (r_cut * r_cut)
    av = _np.stack([u**k - uc**k for k in range(1, degree + 1)], axis=1)
    sol, *_ = _np.linalg.lstsq(av, e[keep], rcond=None)
    resid = av @ sol - e[keep]
    scale = max(float(_np.abs(e[keep]).max()), 1e-12)
    if float(_np.abs(resid).max()) > 1e-3 * scale:
        raise ValueError(
            f"polynomial fit residual {float(_np.abs(resid).max()):.3g} "
            f"exceeds 1e-3 x energy scale {scale:.3g}; raise the degree, "
            f"add a hard core below the stiff region, or shrink r_cut")
    c0 = -float(_np.sum(sol * uc ** _np.arange(1, degree + 1)))
    return PolynomialPotential(coeffs=(c0, *map(float, sol)), r_cut=r_cut,
                               core_diameter=core_diameter)


_POTENTIAL_REGISTRY: dict[str, type] = {}


def _register(cls: type) -> type:
    _POTENTIAL_REGISTRY[cls.__name__] = cls
    return cls


for _cls in (LennardJones, HardSphere, SoftSphere, WCA, SquareWell, Yukawa,
             Morse, PolynomialPotential):
    _register(_cls)


def potential_to_dict(pot: Potential) -> dict:
    """JSON-serializable (class name, init params) — checkpoint payload.

    The reference has no checkpointing at all; mcjax checkpoints must carry
    the physics, not just the geometry, so a resumed run cannot silently
    continue under a different model (VERDICT r1 Weak #4)."""
    params = {f.name: getattr(pot, f.name)
              for f in dataclasses.fields(pot) if f.init}
    return {"kind": type(pot).__name__, "params": params}


def potential_from_dict(d: dict) -> Potential:
    """Inverse of potential_to_dict."""
    from mcjax.models import mixtures  # noqa: F401  (registers mixture kinds)
    try:
        cls = _POTENTIAL_REGISTRY[d["kind"]]
    except KeyError:
        raise ValueError(f"unknown potential kind {d.get('kind')!r}; "
                         f"known: {sorted(_POTENTIAL_REGISTRY)}") from None
    return cls(**d["params"])


def pair_interaction(pot: Potential, r2: jnp.ndarray,
                     valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked (energy, overlap) terms for an array of squared distances."""
    e = jnp.where(valid, pot.pair_energy(r2), 0.0)
    ov = jnp.logical_and(valid, pot.overlap(r2))
    return e, ov
