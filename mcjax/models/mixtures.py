"""Multi-species pair models (binary and general S-species mixtures).

The reference is strictly one-component (a single inlined LJ,
kernel.cu:335-346). mcjax mixtures give every particle a species id and every
species pair its own parameters — the workhorse being the Kob-Andersen 80:20
binary LJ glass former (Kob & Andersen, PRE 51, 4626 (1995)).

Mixture potentials evaluate on (r2, s_i, s_j) where the species operands are
float planes carrying small integer ids (they ride through the cell-list
transport machinery as an extra coordinate plane — see mcjax.ops.mixture).
Evaluation is a masked sum over the S(S+1)/2 unordered species pairs: still
branch-free, fully lane-vectorized VPU code.

Param tables are nested tuples (hashable) so a mixture is a static jit arg
like every other potential.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def _as_table(table):
    """Coerce a nested sequence to a nested tuple of floats.

    JSON round-trips tuples as lists; a reconstructed mixture must coerce
    them back or the dataclass is unhashable (breaks static-jit-arg use)."""
    return tuple(tuple(float(v) for v in row) for row in table)


def _sym(table):
    """Validate a nested-tuple [S][S] table is square and symmetric."""
    s = len(table)
    for row in table:
        if len(row) != s:
            raise ValueError(f"species table must be square, got {table}")
    for a in range(s):
        for b in range(s):
            if table[a][b] != table[b][a]:
                raise ValueError(f"species table must be symmetric, "
                                 f"got {table}")
    return s


def _poly3(f0: float, f1: float, f2: float) -> tuple[float, float, float]:
    """Quadratic through (0,f0), (1,f1), (2,f2) — Lagrange coefficients.

    For a BINARY mixture the unordered species pair is uniquely determined
    by u = s_i + s_j in {0, 1, 2} (AA, AB, BB), so any per-pair parameter
    table collapses to a quadratic in u: the kernel then pays ONE pair
    evaluation on blended coefficients instead of S(S+1)/2 masked
    evaluations (VERDICT r2 item 3 — 3 reciprocal chains -> 1 on the KA
    hot path). Coefficients are Python floats folded into the jaxpr.
    """
    return (f0, -1.5 * f0 + 2.0 * f1 - 0.5 * f2, 0.5 * f0 - f1 + 0.5 * f2)


def _blend(c: tuple[float, float, float], u, u2):
    return c[0] + c[1] * u + c[2] * u2


def _pair_mask(si, sj, a: int, b: int):
    m = (si == float(a)) & (sj == float(b))
    if a != b:
        m = m | ((si == float(b)) & (sj == float(a)))
    return m


@dataclasses.dataclass(frozen=True)
class LJMixture:
    """Truncated LJ 12-6 with per-species-pair (epsilon, sigma, r_cut).

    ``epsilon``/``sigma``/``r_cut_table`` are symmetric [S][S] nested tuples.
    ``shift=True`` subtracts each pair's cutoff value (continuous energies —
    the standard choice for Kob-Andersen).
    """

    epsilon: tuple
    sigma: tuple
    r_cut_table: tuple
    shift: bool = True
    has_energy: bool = dataclasses.field(default=True, init=False)
    has_hard_core: bool = dataclasses.field(default=False, init=False)
    is_mixture: bool = dataclasses.field(default=True, init=False)

    def __post_init__(self):
        # coerce JSON-round-tripped lists back to hashable nested tuples
        object.__setattr__(self, "epsilon", _as_table(self.epsilon))
        object.__setattr__(self, "sigma", _as_table(self.sigma))
        object.__setattr__(self, "r_cut_table", _as_table(self.r_cut_table))
        s = _sym(self.epsilon)
        if _sym(self.sigma) != s or _sym(self.r_cut_table) != s:
            raise ValueError("species tables disagree on S")

    @property
    def n_species(self) -> int:
        return len(self.epsilon)

    @property
    def r_cut(self) -> float:
        """Largest pair cutoff — what the cell width must cover."""
        return max(max(row) for row in self.r_cut_table)

    def _term(self, r2, eps, sig, rc, inv_fn=None):
        if inv_fn is None:
            inv2 = (sig * sig) / jnp.maximum(r2, 1e-12)
        else:
            inv2 = (sig * sig) * inv_fn(r2)
        inv6 = inv2 * inv2 * inv2
        e = 4.0 * eps * (inv6 * inv6 - inv6)
        if self.shift:
            s6 = (sig / rc) ** 6
            e = e - 4.0 * eps * (s6 * s6 - s6)
        return jnp.where(r2 <= rc * rc, e, 0.0)

    def _binary_coeffs(self):
        """Quadratic-in-(s_i+s_j) coefficients for (4*eps, sigma^2, rc^2,
        shift constant) — see _poly3."""
        def tab(t):
            return float(t[0][0]), float(t[0][1]), float(t[1][1])

        eps, sig, rc = tab(self.epsilon), tab(self.sigma), tab(self.r_cut_table)

        def sh(e, s, c):
            s6 = (s / c) ** 6
            return 4.0 * e * (s6 * s6 - s6)

        return (_poly3(*(4.0 * e for e in eps)),
                _poly3(*(s * s for s in sig)),
                _poly3(*(c * c for c in rc)),
                _poly3(*(sh(e, s, c) for e, s, c in zip(eps, sig, rc))))

    def _uniform_cutoff_ratio2(self):
        """(r_cut/sigma)^2 if that ratio is the same for EVERY species pair
        (Kob-Andersen: 2.5^2), else None.  Static Python, folded at trace."""
        s = self.n_species
        ratios = [self.r_cut_table[a][b] / self.sigma[a][b]
                  for a in range(s) for b in range(s)]
        if max(ratios) - min(ratios) <= 1e-12 * max(ratios):
            return ratios[0] * ratios[0]
        return None

    def _energy_binary(self, r2, si, sj, inv_fn=None):
        """One LJ evaluation on u-blended per-pair coefficients (S == 2).

        With a species-independent cutoff ratio c = r_cut/sigma (the
        Kob-Andersen convention) the cutoff test collapses to a compare on
        the already-computed inv2 (r2 <= rc^2  <=>  inv2*c^2 >= 1) and the
        shift constant becomes a fixed multiple of the 4*eps blend — the
        crc2 and csh blends drop entirely (2 of 4; ROADMAP r3 perf item 3).
        """
        ce4, cs2, crc2, csh = self._binary_coeffs()
        c2 = self._uniform_cutoff_ratio2()
        u = si + sj
        u2 = u * u
        inv = inv_fn(r2) if inv_fn is not None else 1.0 / jnp.maximum(r2, 1e-12)
        inv2 = _blend(cs2, u, u2) * inv
        inv6 = inv2 * inv2 * inv2
        poly = inv6 * inv6 - inv6
        if c2 is not None:
            if self.shift:
                ic6 = 1.0 / (c2 * c2 * c2)
                poly = poly - (ic6 * ic6 - ic6)
            e = _blend(ce4, u, u2) * poly
            return jnp.where(inv2 * c2 >= 1.0, e, 0.0)
        e = _blend(ce4, u, u2) * poly
        if self.shift:
            e = e - _blend(csh, u, u2)
        return jnp.where(r2 <= _blend(crc2, u, u2), e, 0.0)

    def _energy_masked(self, r2, si, sj, inv_fn=None):
        e = jnp.zeros(jnp.broadcast_shapes(r2.shape, si.shape, sj.shape),
                      jnp.float32)
        s = self.n_species
        for a in range(s):
            for b in range(a, s):
                e = e + jnp.where(
                    _pair_mask(si, sj, a, b),
                    self._term(r2, self.epsilon[a][b], self.sigma[a][b],
                               self.r_cut_table[a][b], inv_fn),
                    0.0)
        return e

    def _energy_s(self, r2, si, sj, inv_fn=None):
        if self.n_species == 2:
            return self._energy_binary(r2, si, sj, inv_fn)
        return self._energy_masked(r2, si, sj, inv_fn)

    def pair_energy_s(self, r2, si, sj):
        return self._energy_s(r2, si, sj)

    def pair_energy_s_pl(self, r2, si, sj):
        """Pallas-kernel variant (Newton-refined approximate reciprocal)."""
        from mcjax.models.potentials import _pl_safe_inv

        return self._energy_s(r2, si, sj, _pl_safe_inv)

    @property
    def supports_mover_hoist(self) -> bool:
        """True when pair_energy_mover_pl is valid: binary mixture with the
        species-independent cutoff ratio (Kob-Andersen convention)."""
        return (self.n_species == 2
                and self._uniform_cutoff_ratio2() is not None)

    def pair_energy_mover_pl(self, si):
        """Hoisted-blend binary fast path for the Pallas kernels (round 5,
        VERDICT r4 item 1's ka3d blend trim).

        Within one trial move the MOVER's species ``si`` is fixed, so the
        two quadratic u-blends of _energy_binary collapse to per-move
        planes plus ONE fma in ``sj`` per pair slot:

          blend(c; si + sj) = blend(c; si) + sj * (c1 + c2 * (2 si + 1))
                                             exactly, for sj in {0, 1},
        and since si in {0, 1} has si^2 == si, blend(c; si) is itself one
        fma in si.  The per-slot mixture overhead drops from ~6 ops
        (u, u^2, two 2-fma blends) to 2 fmas, off the critical dependency
        chain.  Returns ``f(r2, sj)``; fp rounding differs from
        _energy_binary (same terms — gated by the dE-anchor tests, not
        bitwise), which is why overlap_s keeps the unhoisted blend: hard-
        core trajectories must stay bitwise identical across engines.
        Callers must check ``supports_mover_hoist``.
        """
        from mcjax.models.potentials import _pl_safe_inv

        ce4, cs2, _, _ = self._binary_coeffs()
        c2r = self._uniform_cutoff_ratio2()

        def lin(c, s):
            # blend(c; s) and its unit-increment delta, each one fma in s
            return (c[0] + (c[1] + c[2]) * s,
                    (c[1] + c[2]) + (2.0 * c[2]) * s)

        a0, da = lin(cs2, si)      # sigma^2 blend at sj=0 / +1 per sj
        b0, db = lin(ce4, si)      # 4*eps blend likewise
        if self.shift:
            ic6 = 1.0 / (c2r * c2r * c2r)
            shift_c = ic6 * ic6 - ic6
        else:
            shift_c = None

        def pair(r2, sj):
            inv2 = (a0 + sj * da) * _pl_safe_inv(r2)
            inv6 = inv2 * inv2 * inv2
            poly = inv6 * inv6 - inv6
            if shift_c is not None:
                poly = poly - shift_c
            e = (b0 + sj * db) * poly
            return jnp.where(inv2 * c2r >= 1.0, e, 0.0)

        return pair

    def overlap_s(self, r2, si, sj):
        return jnp.zeros(jnp.broadcast_shapes(r2.shape, si.shape, sj.shape),
                         jnp.bool_)


@dataclasses.dataclass(frozen=True)
class HardSphereMixture:
    """Hard spheres/disks with a per-pair contact-distance table.

    Supports NON-additive mixtures (d_AB need not be (d_AA + d_BB)/2) — the
    Widom-Rowlinson / depletion playground one-component codes cannot touch.
    """

    diameter: tuple
    has_energy: bool = dataclasses.field(default=False, init=False)
    has_hard_core: bool = dataclasses.field(default=True, init=False)
    is_mixture: bool = dataclasses.field(default=True, init=False)

    def __post_init__(self):
        object.__setattr__(self, "diameter", _as_table(self.diameter))
        _sym(self.diameter)

    @property
    def n_species(self) -> int:
        return len(self.diameter)

    @property
    def r_cut(self) -> float:
        return max(max(row) for row in self.diameter)

    def pair_energy_s(self, r2, si, sj):
        return jnp.zeros(jnp.broadcast_shapes(r2.shape, si.shape, sj.shape),
                         jnp.float32)

    def overlap_s(self, r2, si, sj):
        s = self.n_species
        if s == 2:
            # one compare on the u-blended d^2 instead of 3 masked compares
            d = (float(self.diameter[0][0]), float(self.diameter[0][1]),
                 float(self.diameter[1][1]))
            u = si + sj
            return r2 < _blend(_poly3(*(x * x for x in d)), u, u * u)
        ov = jnp.zeros(jnp.broadcast_shapes(r2.shape, si.shape, sj.shape),
                       jnp.bool_)
        for a in range(s):
            for b in range(a, s):
                dab = self.diameter[a][b]
                ov = ov | (_pair_mask(si, sj, a, b) & (r2 < dab * dab))
        return ov


# checkpointable like every single-species model (ADVICE r2: an unregistered
# mixture made a long KA run's checkpoint unrecoverable)
from mcjax.models.potentials import _register  # noqa: E402

_register(LJMixture)
_register(HardSphereMixture)


def kob_andersen(shift: bool = True) -> LJMixture:
    """The canonical 80:20 binary LJ glass former (Kob-Andersen 1995):
    eps_AA=1.0 eps_AB=1.5 eps_BB=0.5; sig_AA=1.0 sig_AB=0.8 sig_BB=0.88;
    r_cut_ab = 2.5 sig_ab."""
    eps = ((1.0, 1.5), (1.5, 0.5))
    sig = ((1.0, 0.8), (0.8, 0.88))
    rc = tuple(tuple(2.5 * s for s in row) for row in sig)
    return LJMixture(epsilon=eps, sigma=sig, r_cut_table=rc, shift=shift)
