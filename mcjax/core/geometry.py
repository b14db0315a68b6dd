"""Periodic-boundary geometry helpers.

The reference implements minimum-image with the shortcut threshold ``2w``
instead of ``L/2`` (subsweep.h:139-151, kernel.cu:324-331 — correct only
because L = 4w there; SURVEY.md Q8).  mcjax uses the exact minimum-image
convention for any box.
"""

from __future__ import annotations

import jax.numpy as jnp


def min_image(disp: jnp.ndarray, box_length: float) -> jnp.ndarray:
    """Exact minimum-image displacement for a cubic box of side ``box_length``."""
    return disp - box_length * jnp.round(disp / box_length)


def wrap_into_box(x: jnp.ndarray, box_length: float) -> jnp.ndarray:
    """Wrap coordinates into [-L/2, L/2)."""
    half = box_length / 2.0
    return jnp.mod(x + half, box_length) - half
