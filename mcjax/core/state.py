"""Simulation state as a JAX pytree.

The reference's mutable device state is the dense cell-list ``disk`` array
(``disk[cell*3*nmax + dim*nmax + i]``, alloc kernel.cu:600) plus the occupancy
array ``short n[CPS3]`` (kernel.cu:599).  mcjax keeps the same fixed-capacity
slab idea (it is what makes ragged cells vectorizable) but reorganizes it
TPU-first into *color-blocked* slabs:

    pos[color, dim, nmax, b1, ..., b_dim]   float32   (coordinate planes)
    occ[color, b1, ..., b_dim]              int32

where ``color`` is the 2^dim checkerboard parity class of the cell and
``(b1..b_dim)`` its index inside the (cps/2)^dim color block.  During a
checkerboard sub-sweep the active cells are exactly ``pos[color]`` — a
contiguous block — and every neighbor cell is a ±1 *shifted read* of one of the
other color blocks, so the 27-cell gather of the reference (kernel.cu:270-279)
becomes ``jnp.roll`` on one chip and a halo ``ppermute`` across a mesh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mcjax.core.config import SimConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Full MC state; a pytree (so it can be scanned, vmapped, sharded).

    Attributes:
      pos: [n_colors, dim, nmax, *block_shape] coordinate planes, global
        coordinates in [-L/2, L/2); the cell grid occupies the trailing
        (TPU lane) axes. Slots with index >= occ are garbage and always
        masked.
      occ: [n_colors, *block_shape] per-cell particle counts.
      key: Threefry key; the root of the run's deterministic randomness tree
        (replaces the reference's ``clock()``-seeded cuRAND, kernel.cu:284).
      sweep: number of completed sweeps.
      overflow: sticky flag — True if any cell ever exceeded nmax capacity
        (the reference silently corrupts memory in that case, kernel.cu:137-145).
    """

    pos: jax.Array
    occ: jax.Array
    key: jax.Array
    sweep: jax.Array
    overflow: jax.Array

    @property
    def n_atoms(self) -> jax.Array:
        return jnp.sum(self.occ)


def zeros_state(cfg: SimConfig, key: jax.Array) -> SimState:
    """Empty state with correctly-shaped buffers."""
    return SimState(
        pos=jnp.zeros((cfg.n_colors, cfg.dim, cfg.nmax, *cfg.block_shape),
                      jnp.float32),
        occ=jnp.zeros((cfg.n_colors, *cfg.block_shape), jnp.int32),
        key=key,
        sweep=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.bool_),
    )


def init_state(cfg: SimConfig, seed: int | None = None,
               positions: jax.Array | None = None) -> SimState:
    """Build the initial state: lattice (or given) positions binned into slabs.

    Mirrors the reference init pipeline ``init_r`` → ``assign``
    (kernel.cu:626-646): uniform lattice placement followed by cell binning.
    """
    from mcjax.ops import cells  # local import: ops depends on core, not vice versa

    if seed is None:
        seed = cfg.seed
    key = jax.random.key(seed)
    if positions is None:
        positions = cells.lattice_positions(cfg)
    pos, occ, overflow = cells.bin_particles(cfg, positions)
    return SimState(
        pos=pos,
        occ=occ,
        key=key,
        sweep=jnp.zeros((), jnp.int32),
        overflow=overflow,
    )
