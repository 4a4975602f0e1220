"""Signed-distance-field CSG shapes with batched sphere tracing.

Capability parity with reference SDF.cs (primitives: supersphere, cube,
cylinder, capsule, torus; operators: union/difference/intersection,
transform, scale, repeat; sphere tracing with jump-back refinement,
SDF.cs:32-76) — but the CSG tree is *specialized at trace time*: each host
node contributes straight-line jnp ops over the whole ray batch, so XLA sees
one fused branch-free distance function per SDF object and the sphere-trace
loop is a single `lax.while_loop` over the wavefront. No virtual dispatch,
no per-ray recursion.

Distance parameters may be jnp scalars, in which case renders are
differentiable w.r.t. them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.core import vec

# Sphere-trace constants (reference SDFShape.Intersect, SDF.cs:34-37).
TRACE_EPS = 1e-5
TRACE_START = 1e-4
TRACE_JUMP = 1e-3
TRACE_MAX_STEPS = 1000


class Sdf:
    """Base class: host CSG node. Subclasses implement
    `evaluate(p) -> (...,)` over (..., 3) points and `bounds() -> (lo, hi)`
    numpy arrays."""

    def evaluate(self, p):  # pragma: no cover - abstract
        raise NotImplementedError

    def bounds(self):  # pragma: no cover - abstract
        raise NotImplementedError

    # operator sugar
    def __or__(self, other):
        return SdfUnion(self, other)

    def __and__(self, other):
        return SdfIntersection(self, other)

    def __sub__(self, other):
        return SdfDifference(self, other)


@dataclass(eq=False)
class SdfSphere(Sdf):
    """Supersphere |p|_n - r (SphereSDF, SDF.cs:115-139)."""

    radius: Any = 1.0
    exponent: Any = 2.0

    def evaluate(self, p):
        if float(np.asarray(self.exponent)) == 2.0:
            return vec.length(p) - self.radius
        return vec.length_n(p, self.exponent) - self.radius

    def bounds(self):
        r = float(np.asarray(self.radius))
        return np.full(3, -r, np.float32), np.full(3, r, np.float32)


@dataclass(eq=False)
class SdfCube(Sdf):
    """Axis box of half-extents `size/2` centered at origin (CubeSDF)."""

    size: Any = (1.0, 1.0, 1.0)

    def evaluate(self, p):
        half = jnp.asarray(self.size, jnp.float32) / 2.0
        q = jnp.abs(p) - half
        outside = vec.length(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    def bounds(self):
        half = np.asarray(self.size, np.float32) / 2.0
        return -half, half


@dataclass(eq=False)
class SdfCylinder(Sdf):
    """Capped Y-axis cylinder (CylinderSDF, SDF.cs:197-252)."""

    radius: Any = 1.0
    height: Any = 1.0

    def evaluate(self, p):
        r = jnp.asarray(self.radius, jnp.float32)
        h = jnp.asarray(self.height, jnp.float32) / 2.0
        dx = jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2) - r
        dy = jnp.abs(p[..., 1]) - h
        q = jnp.stack([dx, dy], axis=-1)
        outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside

    def bounds(self):
        r = float(np.asarray(self.radius))
        h = float(np.asarray(self.height)) / 2.0
        return np.array([-r, -h, -r], np.float32), np.array([r, h, r], np.float32)


@dataclass(eq=False)
class SdfCapsule(Sdf):
    """Capsule from a to b (CapsuleSDF, SDF.cs:254-285)."""

    a: Any = (0.0, -0.5, 0.0)
    b: Any = (0.0, 0.5, 0.0)
    radius: Any = 0.25
    exponent: Any = 2.0

    def evaluate(self, p):
        a = jnp.asarray(self.a, jnp.float32)
        b = jnp.asarray(self.b, jnp.float32)
        pa = p - a
        ba = b - a
        h = jnp.clip(
            jnp.sum(pa * ba, axis=-1) / jnp.maximum(jnp.sum(ba * ba), 1e-12), 0.0, 1.0
        )
        d = pa - ba * h[..., None]
        if float(np.asarray(self.exponent)) == 2.0:
            return vec.length(d) - self.radius
        return vec.length_n(d, self.exponent) - self.radius

    def bounds(self):
        a = np.asarray(self.a, np.float32)
        b = np.asarray(self.b, np.float32)
        r = float(np.asarray(self.radius))
        return np.minimum(a, b) - r, np.maximum(a, b) + r


@dataclass(eq=False)
class SdfTorus(Sdf):
    """Torus in the XY plane (TorusSDF, SDF.cs:287-319)."""

    major: Any = 1.0
    minor: Any = 0.25
    major_exponent: Any = 2.0
    minor_exponent: Any = 2.0

    def evaluate(self, p):
        maj = jnp.asarray(self.major, jnp.float32)
        xy = jnp.stack([p[..., 0], p[..., 1]], axis=-1)
        if float(np.asarray(self.major_exponent)) == 2.0:
            a = jnp.sqrt(jnp.sum(xy * xy, axis=-1)) - maj
        else:
            a = jnp.sum(jnp.abs(xy) ** self.major_exponent, axis=-1) ** (
                1.0 / self.major_exponent
            ) - maj
        q = jnp.stack([a, p[..., 2]], axis=-1)
        if float(np.asarray(self.minor_exponent)) == 2.0:
            return jnp.sqrt(jnp.sum(q * q, axis=-1)) - self.minor
        return jnp.sum(jnp.abs(q) ** self.minor_exponent, axis=-1) ** (
            1.0 / self.minor_exponent
        ) - self.minor

    def bounds(self):
        b = float(np.asarray(self.major)) + float(np.asarray(self.minor))
        a = float(np.asarray(self.minor))
        return np.array([-b, -b, -a], np.float32), np.array([b, b, a], np.float32)


class SdfUnion(Sdf):
    """min over children (UnionSDF)."""

    def __init__(self, *items):
        self.items = items

    def evaluate(self, p):
        d = self.items[0].evaluate(p)
        for it in self.items[1:]:
            d = jnp.minimum(d, it.evaluate(p))
        return d

    def bounds(self):
        los, his = zip(*(it.bounds() for it in self.items))
        return np.min(np.stack(los), 0), np.max(np.stack(his), 0)


class SdfDifference(Sdf):
    """Successive subtraction max(d0, -d_i) (DifferenceSDF, SDF.cs:437-477)."""

    def __init__(self, *items):
        self.items = items

    def evaluate(self, p):
        d = self.items[0].evaluate(p)
        for it in self.items[1:]:
            d = jnp.maximum(d, -it.evaluate(p))
        return d

    def bounds(self):
        return self.items[0].bounds()


class SdfIntersection(Sdf):
    """max over children (IntersectionSDF)."""

    def __init__(self, *items):
        self.items = items

    def evaluate(self, p):
        d = self.items[0].evaluate(p)
        for it in self.items[1:]:
            d = jnp.maximum(d, it.evaluate(p))
        return d

    def bounds(self):
        los, his = zip(*(it.bounds() for it in self.items))
        # Conservative: intersection fits inside every child's box.
        return np.max(np.stack(los), 0), np.min(np.stack(his), 0)


class SdfTransform(Sdf):
    """Evaluate child at M^-1 p (TransformSDF, SDF.cs:321-352).
    `matrix` is a host 4x4 (numpy)."""

    def __init__(self, sdf: Sdf, matrix):
        self.sdf = sdf
        self.matrix = np.asarray(matrix, np.float32)
        self.inv = np.linalg.inv(self.matrix)

    def evaluate(self, p):
        inv = jnp.asarray(self.inv)
        q = jnp.einsum("ij,...j->...i", inv[:3, :3], p) + inv[:3, 3]
        return self.sdf.evaluate(q)

    def bounds(self):
        lo, hi = self.sdf.bounds()
        corners = np.array(
            [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
            np.float32,
        )
        world = corners @ self.matrix[:3, :3].T + self.matrix[:3, 3]
        return world.min(0), world.max(0)


class SdfScale(Sdf):
    """Uniform scale: f * child(p / f) (ScaleSDF, SDF.cs:355-381)."""

    def __init__(self, sdf: Sdf, factor):
        self.sdf = sdf
        self.factor = factor

    def evaluate(self, p):
        f = jnp.asarray(self.factor, jnp.float32)
        return self.sdf.evaluate(p / f) * f

    def bounds(self):
        lo, hi = self.sdf.bounds()
        f = float(np.asarray(self.factor))
        return lo * f, hi * f


class SdfRepeat(Sdf):
    """Mod-space tiling (RepeatSDF, SDF.cs:533-558). Bounded by an explicit
    box (the reference returns an empty box; we require finite bounds so the
    sphere tracer can clip)."""

    def __init__(self, sdf: Sdf, step, bounds_lo, bounds_hi):
        self.sdf = sdf
        self.step = np.asarray(step, np.float32)
        self._lo = np.asarray(bounds_lo, np.float32)
        self._hi = np.asarray(bounds_hi, np.float32)

    def evaluate(self, p):
        step = jnp.asarray(self.step)
        q = jnp.mod(p, step) - step / 2.0
        return self.sdf.evaluate(q)

    def bounds(self):
        return self._lo, self._hi


# ---------------------------------------------------------------------------
# Sphere tracing (batched)
# ---------------------------------------------------------------------------


def sphere_trace(sdf: Sdf, org, dirn, t_enter, t_exit,
                 max_steps: int = TRACE_MAX_STEPS):
    """March rays against one SDF object. org/dirn (R, 3) with *unit*
    directions (instance transforms are applied by the caller through an
    affine whose scale is folded into t); t_enter/t_exit from the bbox clip.

    Reference control flow (SDF.cs:47-75): step t += d; on first sign flip
    jump back once and continue with refinement; accept when d < eps.
    Returns t (R,) with INF misses.
    """
    # while_loop is not reverse-differentiable: detach the march (gradients
    # w.r.t. SDF params would need an implicit-function reparameterization,
    # future work; material/shading grads still flow outside this call).
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    t_enter = jax.lax.stop_gradient(t_enter)
    t_exit = jax.lax.stop_gradient(t_exit)
    R = org.shape[0]
    t0 = jnp.maximum(TRACE_START, t_enter)
    active0 = t_exit >= jnp.maximum(t_enter, 0.0)

    def cond(state):
        _, _, active, _, i = state
        return jnp.logical_and(jnp.any(active), i < max_steps)

    def body(state):
        t, jump, active, hit_t, i = state
        p = org + dirn * t[..., None]
        d = sdf.evaluate(p)
        # jump-back refinement on penetrating the surface
        do_jump_back = jump & (d < 0.0)
        hit_now = active & ~do_jump_back & (d < TRACE_EPS)
        hit_t = jnp.where(hit_now, t, hit_t)
        step = jnp.where(jump & (d < TRACE_JUMP), TRACE_JUMP, d)
        new_t = jnp.where(do_jump_back, t - TRACE_JUMP, t + step)
        new_jump = jump & ~do_jump_back
        out = new_t > t_exit
        active = active & ~hit_now & ~out
        return new_t, new_jump, active, hit_t, i + 1

    init = (
        t0,
        jnp.ones(R, bool) & active0,
        active0,
        jnp.full(R, vec.INF, jnp.float32),
        jnp.int32(0),
    )
    _, _, _, hit_t, _ = jax.lax.while_loop(cond, body, init)
    return hit_t


def sdf_normal(sdf: Sdf, p, eps: float = 1e-4):
    """Central-difference normal (SDFShape.NormalAt, SDF.cs:83-92)."""
    ex = jnp.array([eps, 0.0, 0.0], jnp.float32)
    ey = jnp.array([0.0, eps, 0.0], jnp.float32)
    ez = jnp.array([0.0, 0.0, eps], jnp.float32)
    n = jnp.stack(
        [
            sdf.evaluate(p + ex) - sdf.evaluate(p - ex),
            sdf.evaluate(p + ey) - sdf.evaluate(p - ey),
            sdf.evaluate(p + ez) - sdf.evaluate(p - ez),
        ],
        axis=-1,
    )
    return vec.normalize(n)
