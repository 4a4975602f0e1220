"""Stackless flattened-BVH traversal over ray wavefronts.

Replaces the reference's recursive pointer k-d tree descent
(Tree.cs:67-128) with a skip-link walk: one int32 cursor per ray, advanced
`idx+1` on AABB hit and `skip[idx]` on miss, leaves intersecting a
fixed-width contiguous triangle block. The whole ray batch advances in
lockstep inside a single `lax.while_loop` with masked updates — the
TPU-shaped answer to divergent traversal (no per-ray call stack, static
shapes, batched gathers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ptsharp_tpu.core import vec
from ptsharp_tpu.geometry import primitives


class MeshArrays(NamedTuple):
    """Device-side flattened BVH + sorted triangle soup for one or more
    meshes concatenated; traversal operates on a node slice [base, base+n)
    and triangle indices are global."""

    node_bmin: jnp.ndarray  # (N, 3)
    node_bmax: jnp.ndarray  # (N, 3)
    node_first: jnp.ndarray  # (N,) leaf -> first sorted-triangle index
    node_count: jnp.ndarray  # (N,) 0 = internal
    node_skip: jnp.ndarray  # (N,)
    v0: jnp.ndarray  # (T + pad, 3) BVH-sorted vertices
    e1: jnp.ndarray  # (T + pad, 3) v1 - v0 (precomputed M-T edges)
    e2: jnp.ndarray  # (T + pad, 3) v2 - v0
    max_leaf: int


def traverse(
    mesh: MeshArrays,
    org,
    dirn,
    t_max,
    node_base,
    node_end,
    max_iters: int = 8192,
):
    """Closest-hit traversal for a ray batch against nodes
    [node_base, node_end). org/dirn (R, 3) may be unnormalized (instance
    space); t is parametric in the given direction scale.

    Returns (t, tri_idx, u, v): t = INF and tri_idx = -1 on miss; tri_idx
    indexes the *sorted* triangle arrays.
    """
    # while_loop is not reverse-differentiable: detach ray geometry here.
    # Gradients flow through shading (material/emitter params), not through
    # the discrete traversal — the detached-sampling estimator SURVEY.md §7
    # calls for.
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    t_max = jax.lax.stop_gradient(t_max)
    r = org.shape[0]
    leaf = mesh.max_leaf
    inv_d = 1.0 / jnp.where(jnp.abs(dirn) < 1e-30, jnp.where(dirn < 0, -1e-30, 1e-30), dirn)

    def cond(state):
        idx, best_t, best_tri, best_u, best_v, it = state
        return jnp.logical_and(jnp.any(idx < node_end), it < max_iters)

    def body(state):
        idx, best_t, best_tri, best_u, best_v, it = state
        active = idx < node_end
        safe_idx = jnp.where(active, idx, node_base)
        nb_min = mesh.node_bmin[safe_idx]
        nb_max = mesh.node_bmax[safe_idx]
        n_first = mesh.node_first[safe_idx]
        n_count = mesh.node_count[safe_idx]
        n_skip = mesh.node_skip[safe_idx]

        lo = (nb_min - org) * inv_d
        hi = (nb_max - org) * inv_d
        tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
        tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < best_t)

        is_leaf = n_count > 0
        do_leaf = active & box_hit & is_leaf

        # --- leaf block intersection (fixed-width, masked) ---------------
        start = jnp.where(do_leaf, n_first, 0)
        tv0 = _gather_block(mesh.v0, start, leaf)  # (R, leaf, 3)
        te1 = _gather_block(mesh.e1, start, leaf)
        te2 = _gather_block(mesh.e2, start, leaf)
        d = dirn[:, None, :]
        o = org[:, None, :]
        h = jnp.cross(d, te2)
        det = jnp.sum(te1 * h, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        s = o - tv0
        u = jnp.sum(s * h, axis=-1) * inv_det
        q = jnp.cross(s, te1)
        v = jnp.sum(d * q, axis=-1) * inv_det
        t = jnp.sum(te2 * q, axis=-1) * inv_det
        lane = jax.lax.broadcasted_iota(jnp.int32, (r, leaf), 1)
        ok = (
            do_leaf[:, None]
            & (lane < n_count[:, None])
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > primitives.EPS_T)
            & (t < best_t[:, None])
        )
        t_ok = jnp.where(ok, t, vec.INF)
        lane_best = jnp.argmin(t_ok, axis=-1)
        # min/masked-sum instead of take_along_axis: the gather form is
        # ~100x slower on TPU than these fused reductions
        t_lane = jnp.min(t_ok, axis=-1)
        sel = lane == lane_best[:, None]
        u_lane = jnp.sum(jnp.where(sel, u, 0.0), axis=-1)
        v_lane = jnp.sum(jnp.where(sel, v, 0.0), axis=-1)
        got = t_lane < best_t
        best_t = jnp.where(got, t_lane, best_t)
        best_tri = jnp.where(got, start + lane_best, best_tri)
        best_u = jnp.where(got, u_lane, best_u)
        best_v = jnp.where(got, v_lane, best_v)

        # --- advance cursor ----------------------------------------------
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, idx + 1, n_skip)
        idx = jnp.where(active, nxt, idx)
        return idx, best_t, best_tri, best_u, best_v, it + 1

    init = (
        jnp.full((r,), 0, jnp.int32) + node_base,
        jnp.full((r,), t_max, jnp.float32)
        if jnp.ndim(t_max) == 0
        else t_max.astype(jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.int32(0),
    )
    idx, best_t, best_tri, best_u, best_v, _ = jax.lax.while_loop(cond, body, init)
    best_t = jnp.where(best_tri >= 0, best_t, vec.INF)
    return best_t, best_tri, best_u, best_v


def _gather_block(arr, start, width: int):
    """Per-ray contiguous block gather: arr (T, 3), start (R,) ->
    (R, width, 3). Leaf blocks are contiguous by construction so this is a
    strided gather, not a general scatter."""
    offs = jax.lax.broadcasted_iota(jnp.int32, (start.shape[0], width), 1)
    idx = start[:, None] + offs
    idx = jnp.clip(idx, 0, arr.shape[0] - 1)
    return arr[idx]
