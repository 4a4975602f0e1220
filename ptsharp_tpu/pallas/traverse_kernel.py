"""Pallas TPU kernel: fused BVH traversal + Möller–Trumbore closest-hit.

The Pallas packet formulation of the skip-link walk (accel/traverse.py;
reference hot loop Tree.cs:67-128 + Triangle.cs:95-124): the grid tiles the
ray wavefront; each tile of T rays walks the flattened BVH in lockstep with
ONE shared scalar cursor. Node and triangle tables are VMEM-resident, so a
step costs a scalar row read plus (T,)-wide VPU arithmetic — ZERO gathers
(the measured bottleneck of the XLA walk, scripts/exp_gather.py). The tile
visits the union of nodes its rays need, so the kernel wins when tiles are
coherent (primary/shadow rays, or bounce rays after Morton sorting) and
loses when a tile's rays diverge; the dispatcher in intersect.py keeps the
gather-based walk as the general path. Full measurements: BASELINE.md.

SUPERSEDED by pallas/wide_kernel.py (the production `intersector="pallas"`
path). This kernel's (N, 10) node table is lane-padded by Mosaic to
(N, 128) — a silent 12.8x VMEM inflation that made 82k-triangle compiles
fail. The wide kernel makes the 128-lane row explicit (and fills it with
K child boxes), fixing the scale ceiling; this file is kept as the
minimal binary-row formulation with its interpret-mode parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptsharp_tpu.core import vec

TILE = 1024  # rays per grid step (8 x 128 lanes)


def _kernel(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
            t_ref, slot_ref, u_ref, v_ref,
            *, base, end, leaf_size, max_iters):
    ox = org_ref[0, :]
    oy = org_ref[1, :]
    oz = org_ref[2, :]
    dx = dir_ref[0, :]
    dy = dir_ref[1, :]
    dz = dir_ref[2, :]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def cond(s):
        j, it, bt, bs, bu, bv = s
        return jnp.logical_and(j < end, it < max_iters)

    def body(s):
        j, it, bt, bs, bu, bv = s
        nrow = rows_ref[j]  # (10,) scalar-indexed node row
        # Mosaic only bitcasts vectors: convert the whole row, then index
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        bits1 = bits[6]       # first
        cnt = bits[7] & 0xFF  # kind<<8 | count
        skip = bits[8]

        lox = (nrow[0] - ox) * ix
        hix = (nrow[3] - ox) * ix
        loy = (nrow[1] - oy) * iy
        hiy = (nrow[4] - oy) * iy
        loz = (nrow[2] - oz) * iz
        hiz = (nrow[5] - oz) * iz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
            jnp.minimum(loz, hiz),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
            jnp.maximum(loz, hiz),
        )
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
        any_hit = jnp.any(box_hit)
        is_leaf = cnt > 0

        def do_leaf(args):
            bt, bs, bu, bv = args
            blk = leaf_ref[bits1 // leaf_size]  # (leaf*9,)
            # static unroll over slots with scalar lane-extracts (Mosaic
            # supports neither cross-lane reshapes nor vector gathers);
            # each slot is a scalar-coefficient Möller–Trumbore over the
            # (T,) ray vectors, sequentially tightening bt
            for l in range(leaf_size):
                v0x, v0y, v0z = blk[l * 9 + 0], blk[l * 9 + 1], blk[l * 9 + 2]
                e1x, e1y, e1z = blk[l * 9 + 3], blk[l * 9 + 4], blk[l * 9 + 5]
                e2x, e2y, e2z = blk[l * 9 + 6], blk[l * 9 + 7], blk[l * 9 + 8]
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                det = e1x * hx + e1y * hy + e1z * hz
                inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                sx = ox - v0x
                sy = oy - v0y
                sz = oz - v0z
                uu = (sx * hx + sy * hy + sz * hz) * inv_det
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                got = (
                    box_hit
                    & (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0) & (uu <= 1.0)
                    & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > 1e-4)
                    & (tt < bt)
                )
                bt = jnp.where(got, tt, bt)
                bs = jnp.where(got, bits1 + l, bs)
                bu = jnp.where(got, uu, bu)
                bv = jnp.where(got, vv, bv)
            return bt, bs, bu, bv

        bt, bs, bu, bv = jax.lax.cond(
            jnp.logical_and(any_hit, is_leaf), do_leaf,
            lambda a: a, (bt, bs, bu, bv),
        )
        descend = any_hit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, j + 1, skip)
        return nxt, it + 1, bt, bs, bu, bv

    t0 = tmax_ref[0, :]
    init = (
        jnp.int32(base), jnp.int32(0), t0,
        jnp.full(t0.shape, -1, jnp.int32),
        jnp.zeros(t0.shape, jnp.float32),
        jnp.zeros(t0.shape, jnp.float32),
    )
    _, _, bt, bs, bu, bv = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = jnp.where(bs >= 0, bt, vec.INF)
    slot_ref[0, :] = bs
    u_ref[0, :] = bu
    v_ref[0, :] = bv


def pallas_traverse(rows, leaf_rows, org, dirn, t_max, base: int, end: int,
                    leaf_size: int, tile: int = TILE,
                    max_iters: int = 65536, interpret: bool = False):
    """Drop-in replacement for traverse_packed on VMEM-sized scenes.
    base/end must be Python ints (the kernel specializes on them)."""
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tm = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_max, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tm = jnp.concatenate([tm, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tm2 = tm.reshape(1, rp)

    kern = functools.partial(
        _kernel, base=int(base), end=int(end), leaf_size=int(leaf_size),
        max_iters=max_iters,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.int32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    t, slot, u, v = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # node rows (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # leaf rows (full)
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        interpret=interpret,
    )(rows, leaf_rows, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


def fits_vmem(rows, leaf_rows, budget_bytes: int = 10 * 1024 * 1024) -> bool:
    """Both tables must sit in VMEM alongside ray tiles."""
    return (rows.size + leaf_rows.size) * 4 <= budget_bytes
