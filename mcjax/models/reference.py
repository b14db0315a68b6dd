"""Golden reference implementations (test oracles).

The reference verified its GPU kernels against an exact host O(N^2) energy
(``calc_energy``, kernel.cu:452-470) anchored at sweep 0 (kernel.cu:642) — we
adopt the same technique as an automated test (SURVEY.md §4), plus a fully
independent serial Metropolis chain (no cell lists, no checkerboard) whose
equilibrium observables the parallel engine must match within error bars.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mcjax.core.geometry import min_image, wrap_into_box
from mcjax.models.potentials import Potential, pair_interaction


def total_energy(pot: Potential, positions: jnp.ndarray,
                 box_length: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact O(N^2) total energy + any-overlap flag.

    Equivalent of the reference host ``calc_energy`` (kernel.cu:452-470), with
    proper L/2 minimum image (the reference's ``del > L/2 → del -= L`` on the
    absolute value is equivalent for its box).

    Args:
      positions: [N, dim] coordinates.
    Returns:
      (energy scalar, overlap bool scalar)
    """
    disp = positions[:, None, :] - positions[None, :, :]
    disp = min_image(disp, box_length)
    r2 = jnp.sum(disp * disp, axis=-1)
    n = positions.shape[0]
    iu = jnp.triu_indices(n, k=1)
    e, ov = pair_interaction(pot, r2[iu], jnp.ones(iu[0].shape, bool))
    return jnp.sum(e), jnp.any(ov)


def particle_energy(pot: Potential, x: jnp.ndarray, positions: jnp.ndarray,
                    self_idx: jnp.ndarray,
                    box_length: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Energy of a particle at ``x`` against all others (O(N))."""
    disp = min_image(x[None, :] - positions, box_length)
    r2 = jnp.sum(disp * disp, axis=-1)
    valid = jnp.arange(positions.shape[0]) != self_idx
    e, ov = pair_interaction(pot, r2, valid)
    return jnp.sum(e), jnp.any(ov)


@partial(jax.jit, static_argnums=(0, 3, 6, 7))
def serial_metropolis(pot: Potential, positions: jnp.ndarray, key: jax.Array,
                      n_steps: int, beta: float, box_length: float,
                      step_size: float = 0.5,
                      proposal: str = "gaussian") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Plain single-particle Metropolis chain — the physics oracle.

    Deliberately shares no code path with the parallel engine: random particle
    pick, unrestricted displacement (no cell-boundary rejection), O(N) energy.
    Used to validate equilibrium <E>, g(r), and EOS of the checkerboard engine.

    Returns:
      (final positions [N, dim], accepted count)
    """
    n = positions.shape[0]
    dim = positions.shape[1]

    def step(carry, k):
        pos, acc = carry
        k1, k2, k3 = jax.random.split(k, 3)
        i = jax.random.randint(k1, (), 0, n)
        old = pos[i]
        if proposal == "gaussian":
            dx = step_size * jax.random.normal(k2, (dim,))
        else:
            dx = jax.random.uniform(k2, (dim,), minval=-step_size,
                                    maxval=step_size)
        new = wrap_into_box(old + dx, box_length)
        e_old, _ = particle_energy(pot, old, pos, i, box_length)
        e_new, ov_new = particle_energy(pot, new, pos, i, box_length)
        de = e_new - e_old
        u = jax.random.uniform(k3, ())
        accept = jnp.logical_and(~ov_new, u < jnp.exp(-beta * de))
        pos = pos.at[i].set(jnp.where(accept, new, old))
        return (pos, acc + accept.astype(jnp.int32)), None

    keys = jax.random.split(key, n_steps)
    (pos, acc), _ = jax.lax.scan(step, (positions, jnp.int32(0)), keys)
    return pos, acc
