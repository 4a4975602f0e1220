"""Color utilities over (..., 3) linear-RGB arrays.

Parity with reference Colour.cs: hex decode (sRGB->linear via pow 2.2,
Colour.cs:125-132), blackbody Kelvin fit (Colour.cs:157-217), Rec.709
luminance, mix, gamma. Everything batched jnp; colors are just (...,3) arrays.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# numpy, not jnp: module-level device arrays would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize for
# multi-host users who import the library before joining the pod
BLACK = np.zeros(3, np.float32)
WHITE = np.ones(3, np.float32)

GAMMA = 2.2


def rgb(r, g, b):
    return jnp.array([r, g, b], jnp.float32)


def hex_color(x: int):
    """0xRRGGBB -> linear rgb (pow-2.2 decode, matching HexColor)."""
    r = ((x >> 16) & 0xFF) / 255.0
    g = ((x >> 8) & 0xFF) / 255.0
    b = (x & 0xFF) / 255.0
    return jnp.array([r**GAMMA, g**GAMMA, b**GAMMA], jnp.float32)


def kelvin(k: float):
    """Blackbody color temperature fit — same piecewise log fit as
    reference Colour.Kelvin (Colour.cs:157-217). Host-side scalar math
    (scene-build time), returns a (3,) linear-ish RGB in [0,1]."""
    if k >= 6600.0:
        x = k / 100.0 - 55.0
        red = 351.97690566805693 + 0.114206453784165 * x - 40.25366309332127 * math.log(x)
    else:
        red = 255.0
    if k >= 6600.0:
        x = k / 100.0 - 50.0
        green = 325.4494125711974 + 0.07943456536662342 * x - 28.0852963507957 * math.log(x)
    elif k >= 1000.0:
        x = k / 100.0 - 2.0
        green = -155.25485562709179 - 0.44596950469579133 * x + 104.49216199393888 * math.log(x)
    else:
        green = 0.0
    if k >= 6600.0:
        blue = 255.0
    elif k >= 2000.0:
        x = k / 100.0 - 10.0
        blue = -254.76935184120902 + 0.8274096064007395 * x + 115.67994401066147 * math.log(x)
    else:
        blue = 0.0
    return jnp.array(
        [
            min(1.0, max(0.0, red / 255.0)),
            min(1.0, max(0.0, green / 255.0)),
            min(1.0, max(0.0, blue / 255.0)),
        ],
        jnp.float32,
    )


def luminance(c):
    """Rec.709 luma (Colour.cs:97)."""
    w = jnp.array([0.2126, 0.7152, 0.0722], c.dtype)
    return jnp.sum(c * w, axis=-1)


def mix(a, b, pct):
    """lerp(a, b, pct) — Colour.Mix. pct may be scalar or (...,) matching
    the batch shape of a/b (it is broadcast over the rgb axis)."""
    pct = jnp.asarray(pct, a.dtype)
    if pct.ndim == a.ndim - 1:
        pct = pct[..., None]
    return a + (b - a) * pct


def to_srgb(c):
    """Linear -> display: pow(1/2.2) + clip, matching Buffer.cs Image()."""
    return jnp.clip(jnp.abs(c) ** (1.0 / GAMMA), 0.0, 1.0)


def from_srgb(c):
    return jnp.clip(c, 0.0, 1.0) ** GAMMA
