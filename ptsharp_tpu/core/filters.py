"""Pixel reconstruction filters (Filter.cs / TriangleFilter.cs parity).

The reference carries a pbrt-style Filter interface that only feeds the
unused Program.Filter static (SURVEY.md L0b); BASELINE config #5 names the
"TriangleFilter clamp" explicitly, so filters are first-class here: the
renderer weights each sample by the filter evaluated at its subpixel offset
(jitter - 0.5), which plugs directly into the Welford film's per-sample
weights.
"""

from __future__ import annotations

import jax.numpy as jnp

BOX = "box"
TRIANGLE = "triangle"
GAUSSIAN = "gaussian"


def evaluate(name: str, dx, dy, radius: float = 0.5, alpha: float = 2.0):
    """Filter weight for subpixel offsets dx, dy in [-0.5, 0.5]."""
    if name == BOX:
        return jnp.ones_like(dx)
    if name == TRIANGLE:
        wx = jnp.maximum(0.0, radius - jnp.abs(dx))
        wy = jnp.maximum(0.0, radius - jnp.abs(dy))
        return (wx * wy) / (radius * radius)
    if name == GAUSSIAN:
        g = lambda d: jnp.exp(-alpha * d * d) - jnp.exp(-alpha * radius * radius)
        return jnp.maximum(0.0, g(dx)) * jnp.maximum(0.0, g(dy))
    raise ValueError(f"unknown filter {name!r}")
