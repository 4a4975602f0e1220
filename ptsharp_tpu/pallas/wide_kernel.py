"""Pallas TPU kernel: K-wide fused BVH traversal + Möller–Trumbore.

The production Pallas mesh path (north star: hot stages as Pallas kernels
over SoA buffers; reference hot loop Tree.cs:67-128 + Triangle.cs:95-124).
Supersedes pallas/traverse_kernel.py's binary-row kernel, whose (N, 10)
node table Mosaic lane-pads to (N, 128) — a silent 12.8x VMEM inflation
that crashed the compiler at 82k-triangle scale. Here every table row IS a
128-lane VMEM row:

  * node rows: the K-wide layout of accel/wide.py (own box, leaf payload,
    skip, K child boxes + preorder indices — 9 + 7K <= 65 slots for K=8),
    one node per (128,) row;
  * leaf rows: leaf_size*9 <= 126 slots (14 triangles max), one leaf block
    per (128,) row.

A tile of T rays walks in lockstep with ONE shared scalar cursor (the
packet formulation): each step reads one node row (dynamic sublane index —
zero gathers, the measured XLA-walk bottleneck, scripts/exp_gather.py),
slab-tests the K child boxes per ray, and jumps to the minimum preorder
index any ray wants next. Per-ray best-t masking keeps results exact; the
tile visits the union of nodes its rays need, so coherence sets the speed
(the integrator's compaction sort feeds it coherent bounce tiles).

Completeness: child subtrees are preorder-contiguous and `skip` exits a
subtree, so from the tile cursor min every ray's wanted node is reached
through descend/skip steps exactly as in the XLA wide walk
(accel/wide.py docstring has the proof sketch).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptsharp_tpu.core import vec

TILE = 1024  # rays per grid step (8 sublanes x 128 lanes)
ROW = 128    # lanes per table row
BIG = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Shared packet arithmetic (pure jnp on (G, L) tiles — traced inline, so
# every kernel compiles the same Mosaic code it did when these blocks were
# copy-pasted; one source of truth for the intersection math).
# ---------------------------------------------------------------------------


def packet_safe_inv(d):
    return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                           jnp.where(d < 0, -1e-30, 1e-30), d)


def packet_slab(nrow, lo_col, hi_col, o3, i3):
    """Slab test of the box at columns [lo_col:lo_col+3], [hi_col:+3] of
    each group's node row against the packet rays. o3/i3: (ox, oy, oz) /
    inverse-direction triples, each (G, L). Returns (tmin, tmax)."""
    ox, oy, oz = o3
    ix, iy, iz = i3
    lox = (nrow[:, lo_col + 0:lo_col + 1] - ox) * ix
    loy = (nrow[:, lo_col + 1:lo_col + 2] - oy) * iy
    loz = (nrow[:, lo_col + 2:lo_col + 3] - oz) * iz
    hix = (nrow[:, hi_col + 0:hi_col + 1] - ox) * ix
    hiy = (nrow[:, hi_col + 1:hi_col + 2] - oy) * iy
    hiz = (nrow[:, hi_col + 2:hi_col + 3] - oz) * iz
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(lox, hix), jnp.minimum(loy, hiy)),
        jnp.minimum(loz, hiz),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
        jnp.maximum(loz, hiz),
    )
    return tmin, tmax


def packet_mt(blkrow, leaf_size, leaf_ok, o3, d3, first, state, accept):
    """Moller-Trumbore unroll over a packed leaf block (Triangle.cs:95-124
    semantics). For each slot l, computes `ok` (mask of lanes whose ray
    intersects slot l's triangle at tt > 1e-4, pre-best-t) and folds
    state = accept(state, ok, tt, first + l, uu, vv) — accept applies its
    own best-t / occlusion policy."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    for l in range(leaf_size):
        c = l * 9
        v0x = blkrow[:, c + 0:c + 1]
        v0y = blkrow[:, c + 1:c + 2]
        v0z = blkrow[:, c + 2:c + 3]
        e1x = blkrow[:, c + 3:c + 4]
        e1y = blkrow[:, c + 4:c + 5]
        e1z = blkrow[:, c + 5:c + 6]
        e2x = blkrow[:, c + 6:c + 7]
        e2y = blkrow[:, c + 7:c + 8]
        e2z = blkrow[:, c + 8:c + 9]
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
        ok = (
            leaf_ok
            & (jnp.abs(det) > 1e-12)
            & (uu >= 0.0) & (uu <= 1.0)
            & (vv >= 0.0) & (uu + vv <= 1.0)
            & (tt > 1e-4)
        )
        state = accept(state, ok, tt, first + l, uu, vv)
    return state


def packet_descend(nrow, bits, k, o3, i3, bt):
    """K-way min-preorder child selection: slab-test the K child boxes in
    each group's row and return the smallest hit child's preorder index
    per lane (BIG where none hit). Absent children carry index 0 +
    inverted boxes and are never selected."""
    G, L = bt.shape
    target = jnp.full((G, L), BIG, jnp.int32)
    for c in range(k):
        cb = 9 + 6 * c
        ctmin, ctmax = packet_slab(nrow, cb, cb + 3, o3, i3)
        cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
        chit = (
            (ctmax >= jnp.maximum(ctmin, 0.0))
            & (ctmin < bt)
            & (cidx > 0)
        )
        target = jnp.where(chit & (cidx < target), cidx, target)
    return target


def accept_closest(state, ok, tt, slot, uu, vv):
    """Closest-hit accept policy: refine (bt, bs, bu, bv)."""
    bt, bs, bu, bv = state
    got = ok & (tt < bt)
    return (jnp.where(got, tt, bt), jnp.where(got, slot, bs),
            jnp.where(got, uu, bu), jnp.where(got, vv, bv))


class PallasTables(NamedTuple):
    """Device tables for the wide Pallas kernel, one 128-lane row per node
    and per leaf block. slot_map sends kernel-local triangle slots to the
    scene's slot-ordered triangle arrays (the kernel re-packs leaves with
    its own leaf_size, so slot spaces differ)."""

    rows: jnp.ndarray       # (Nw, 128) f32 wide node rows
    leaf: jnp.ndarray       # (NL, 128) f32 leaf MT rows (v0,e1,e2 x leaf)
    slot_map: jnp.ndarray   # (NL * leaf_size,) i32 -> scene slot (or -1)
    inst_base: np.ndarray   # (I,) host ints: wide-row range per instance
    inst_end: np.ndarray    # (I,)
    leaf_size: int
    k: int


def _kernel(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
            t_ref, slot_ref, u_ref, v_ref,
            *, base, end, leaf_size, k, max_iters):
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
        nrow = rows_ref[j]  # (128,) — the only node access this step
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[6]
        cnt = bits[7] & 0xFF
        skip = bits[8]

        # own-box slab test (masks leaf hits per ray)
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
            blk = leaf_ref[first // leaf_size]  # (128,)
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
                bs = jnp.where(got, first + l, bs)
                bu = jnp.where(got, uu, bu)
                bv = jnp.where(got, vv, bv)
            return bt, bs, bu, bv

        bt, bs, bu, bv = jax.lax.cond(
            jnp.logical_and(any_hit, is_leaf), do_leaf,
            lambda a: a, (bt, bs, bu, bv),
        )

        # K-way descent: per ray, the first (min preorder) hit child; tile
        # cursor = min over rays (union visit). Absent children have
        # inverted boxes + index 0 — never selected.
        target = jnp.full(ox.shape, BIG, jnp.int32)
        for c in range(k):
            cb = 9 + 6 * c
            clox = (nrow[cb + 0] - ox) * ix
            cloy = (nrow[cb + 1] - oy) * iy
            cloz = (nrow[cb + 2] - oz) * iz
            chix = (nrow[cb + 3] - ox) * ix
            chiy = (nrow[cb + 4] - oy) * iy
            chiz = (nrow[cb + 5] - oz) * iz
            ctmin = jnp.maximum(
                jnp.maximum(jnp.minimum(clox, chix), jnp.minimum(cloy, chiy)),
                jnp.minimum(cloz, chiz),
            )
            ctmax = jnp.minimum(
                jnp.minimum(jnp.maximum(clox, chix), jnp.maximum(cloy, chiy)),
                jnp.maximum(cloz, chiz),
            )
            cidx = bits[9 + 6 * k + c]
            chit = (
                (ctmax >= jnp.maximum(ctmin, 0.0))
                & (ctmin < bt)
                & (cidx > 0)
            )
            target = jnp.where(chit & (cidx < target), cidx, target)

        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target, skip)
        nxt = jnp.min(ray_next)
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


def pallas_traverse_wide(rows, leaf, org, dirn, t_max, base: int, end: int,
                         leaf_size: int, k: int, tile: int = TILE,
                         max_iters: int | None = None,
                         interpret: bool | None = None):
    """Closest-hit over [base, end) wide rows. Returns (t, slot, u, v) with
    slot in KERNEL leaf order (map through PallasTables.slot_map).
    base/end are Python ints (the kernel specializes on them).

    max_iters defaults to end - base, which is EXACT: the tile cursor is
    strictly increasing (a descend target is a preorder child index > j
    and a skip link exits j's subtree, also > j), so a walk visits at most
    every row once and the cap can never truncate results."""
    if max_iters is None:
        max_iters = int(end) - int(base)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
        k=int(k), max_iters=max_iters,
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
    )(rows, leaf, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


# ---------------------------------------------------------------------------
# 8-packet sublane kernel: 8 independent 128-ray packets per (8, 128) tile
# ---------------------------------------------------------------------------
#
# The shared-cursor packet kernel above issues (tile,)-wide VPU ops for ONE
# node per step; at tile=1024 that is a full (8, 128) VPU tile of work per
# node, but the 1024-ray union of visited nodes is large. This variant
# gives each SUBLANE GROUP of 128 rays its own cursor: every loop step
# advances 8 different nodes at once, the per-op VPU shape is the same
# (8, 128) tile, and the union shrinks to that of 128-ray packets. Per-group
# node rows are copied into an (8, 128) VMEM scratch (8 dynamic row reads),
# after which every slab test / Möller–Trumbore term is a dense (8, 128)
# op broadcasting the group's (8, 1) row columns against its ray lanes.


def _kernel8(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
             t_ref, slot_ref, u_ref, v_ref, nscr, lscr,
             *, base, end, leaf_size, k, max_iters):
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(packet_safe_inv(d) for d in d3)

    def cond(s):
        cur, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, bt, bs, bu, bv = s  # cur (G, 1) i32
        active = cur < end           # (G, 1)
        # fetch each group's node row into the scratch tile
        for g in range(G):
            j = jnp.minimum(cur[g, 0], end - 1)
            nscr[g, :] = rows_ref[j]
        nrow = nscr[:]                                   # (G, 128) f32
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]                             # (G, 1)
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active

        # leaf phase, skipped entirely when NO group sits at a hit leaf
        # (group depths are correlated, so whole iterations often have
        # none — the Möller–Trumbore unroll is the iteration's main cost)
        leaf_ok = box_hit & is_leaf
        any_leaf = jnp.any(leaf_ok)

        def do_leaf(args):
            for g in range(G):
                lj = jnp.where((bits[g, 7] & 0xFF) > 0,
                               bits[g, 6] // leaf_size, 0)
                lscr[g, :] = leaf_ref[jnp.minimum(lj, leaf_ref.shape[0] - 1)]
            return packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3, first,
                             args, accept_closest)

        bt, bs, bu, bv = jax.lax.cond(any_leaf, do_leaf, lambda a: a,
                                      (bt, bs, bu, bv))

        target = packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)   # (G, 1)
        cur = jnp.where(active, nxt, cur)
        return cur, it + 1, bt, bs, bu, bv

    t0 = tmax_ref[0, :].reshape(G, L)
    init = (
        jnp.full((G, 1), base, jnp.int32), jnp.int32(0), t0,
        jnp.full((G, L), -1, jnp.int32),
        jnp.zeros((G, L), jnp.float32),
        jnp.zeros((G, L), jnp.float32),
    )
    _, _, bt, bs, bu, bv = jax.lax.while_loop(cond, body, init)
    t_ref[0, :] = jnp.where(bs >= 0, bt, vec.INF).reshape(G * L)
    slot_ref[0, :] = bs.reshape(G * L)
    u_ref[0, :] = bu.reshape(G * L)
    v_ref[0, :] = bv.reshape(G * L)


def pallas_traverse_wide8(rows, leaf, org, dirn, t_max, base: int, end: int,
                          leaf_size: int, k: int,
                          max_iters: int | None = None,
                          interpret: bool | None = None):
    """8-packet variant: tile = 8 sublane groups x 128 rays, each group
    with an independent cursor. Same tables and results as
    pallas_traverse_wide; faster when 128-ray packets are markedly more
    coherent than 1024-ray ones (they always are).

    max_iters defaults to end - base — exact, never truncates (each group
    cursor is strictly increasing; see pallas_traverse_wide)."""
    if max_iters is None:
        max_iters = int(end) - int(base)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tile = 1024
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
        _kernel8, base=int(base), end=int(end), leaf_size=int(leaf_size),
        k=int(k), max_iters=max_iters,
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
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


# ---------------------------------------------------------------------------
# Any-hit (occlusion) kernel: NEE shadow rays only need "is anything opaque
# before the light?" (Sampler.cs:261-265 visibility semantics reduced to a
# boolean), not the closest hit. This variant retires a lane on its FIRST
# accepted intersection with t < t_cut: the lane's bound collapses to -INF
# so every subsequent box test fails for it, and a packet whose 128 lanes
# are all occluded jumps its cursor straight to `end`. Roughly half of all
# mesh traversal in a NEE render is shadow rays, so the early-outs here are
# the single largest lever on full-trace throughput.
# ---------------------------------------------------------------------------


def _kernel8_any(rows_ref, leaf_ref, org_ref, dir_ref, tcut_ref,
                 occ_ref, nscr, lscr,
                 *, base, end, leaf_size, k, max_iters):
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(packet_safe_inv(d) for d in d3)
    t0 = tcut_ref[0, :].reshape(G, L)
    # lanes with a collapsed cut (facing-away, dead, padding) are resolved
    # from the start: without this the packet-wide early exit below could
    # never fire in mixed packets (they can never set occ)
    inact = (t0 <= 0.0).astype(jnp.int32)

    def cond(s):
        cur, it, occ = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        # occ is carried as i32 0/1 — Mosaic mis-lays-out (8,128) i1
        # vectors yielded through scf.if (lax.cond), measured on-chip
        cur, it, occ = s            # cur (G, 1) i32, occ (G, L) i32
        active = cur < end
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)  # occluded lanes test nothing
        for g in range(G):
            j = jnp.minimum(cur[g, 0], end - 1)
            nscr[g, :] = rows_ref[j]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active

        leaf_ok = box_hit & is_leaf
        any_leaf = jnp.any(leaf_ok)

        def accept_any(occ_in, ok, tt, _slot, _uu, _vv):
            # bt == t_cut while un-occluded, -INF after
            return jnp.maximum(occ_in, (ok & (tt < bt)).astype(jnp.int32))

        def do_leaf(occ_in):
            for g in range(G):
                lj = jnp.where((bits[g, 7] & 0xFF) > 0,
                               bits[g, 6] // leaf_size, 0)
                lscr[g, :] = leaf_ref[jnp.minimum(lj, leaf_ref.shape[0] - 1)]
            return packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3, first,
                             occ_in, accept_any)

        occ = jax.lax.cond(any_leaf, do_leaf, lambda o: o, occ)
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)

        # descent (any order is fine for any-hit; keep min-preorder)
        target = packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf) & jnp.logical_not(occ_b)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
        # packet-wide early exit: every lane occluded OR inactive -> done
        all_done = jnp.min(jnp.maximum(occ, inact), axis=1,
                           keepdims=True) > 0
        nxt = jnp.where(all_done, end, nxt)
        cur = jnp.where(active, nxt, cur)
        return cur, it + 1, occ

    init = (
        jnp.full((G, 1), base, jnp.int32), jnp.int32(0),
        jnp.zeros((G, L), jnp.int32),
    )
    _, _, occ = jax.lax.while_loop(cond, body, init)
    occ_ref[0, :] = occ.reshape(G * L)


def pallas_occluded_wide8(rows, leaf, org, dirn, t_cut, base: int, end: int,
                          leaf_size: int, k: int,
                          max_iters: int | None = None,
                          interpret: bool | None = None):
    """Any-hit query over [base, end) wide rows: returns (R,) bool, True
    where SOME triangle intersects at t in (1e-4, t_cut). Pass t_cut
    already shrunk below the light distance (the light's own surface must
    not self-occlude); lanes whose t_cut <= 0 are never occluded and cost
    nothing (their box tests all fail)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if max_iters is None:
        max_iters = int(end) - int(base)
    tile = 1024
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    tc = jnp.broadcast_to(
        jax.lax.stop_gradient(jnp.asarray(t_cut, jnp.float32)), (r,)
    )
    pad = (-r) % tile
    if pad:
        org = jnp.concatenate([org, jnp.zeros((pad, 3), org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.ones((pad, 3), dirn.dtype)])
        tc = jnp.concatenate([tc, jnp.full((pad,), -vec.INF, jnp.float32)])
    rp = r + pad
    n_tiles = rp // tile
    org_t = org.T.reshape(3, rp)
    dir_t = dirn.T.reshape(3, rp)
    tc2 = tc.reshape(1, rp)

    kern = functools.partial(
        _kernel8_any, base=int(base), end=int(end), leaf_size=int(leaf_size),
        k=int(k), max_iters=max_iters,
    )
    ray_spec = pl.BlockSpec((3, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((1, rp), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # node rows (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # leaf rows (full)
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tc2)
    return occ[0, :r] != 0


# ---------------------------------------------------------------------------
# Host-side table packing
# ---------------------------------------------------------------------------


def pack_flat_tables(tri_v0, tri_e1, tri_e2, instances,
                     leaf_size: int, k: int):
    """Flatten ALL mesh instances into ONE world-space wide BVH + leaf
    table for the packet kernels (the instancing answer for the Pallas
    path: instead of unrolling one kernel launch per instance over every
    ray — n_inst sequential full walks, the round-3 verdict's item 5 —
    every instance's triangles are transformed to world space at build
    time and a single tree serves the whole wavefront in one launch; the
    reference reaches the same geometry through TransformedShape re-entry,
    TransformedShape.cs:43-72 + Tree.cs:67-128).

    tri_v0/e1/e2: (S, 3) scene-slot-ordered arrays (padding slots are
    degenerate zeros). instances: list of (slot_lo, slot_hi, world34,
    inst_id) — each instance's mesh occupies scene slots [lo, hi).

    Returns (rows, leaf, slot_tri, slot_inst):
      rows (Nw, 128) f32, leaf (NL, 128) f32 — kernel tables;
      slot_tri (NL*leaf_size,) i32 kernel slot -> scene slot (-1 pad);
      slot_inst (NL*leaf_size,) i32 kernel slot -> instance id (-1 pad).
    """
    assert leaf_size * 9 <= ROW and 9 + 7 * k <= ROW
    from ptsharp_tpu.accel import bvh as bvh_mod
    from ptsharp_tpu.accel import wide as wide_mod

    wv0_l, we1_l, we2_l, src_l, inst_l = [], [], [], [], []
    for lo, hi, world, iid in instances:
        v0 = np.asarray(tri_v0[lo:hi], np.float32)
        e1 = np.asarray(tri_e1[lo:hi], np.float32)
        e2 = np.asarray(tri_e2[lo:hi], np.float32)
        # drop padding slots (degenerate zero triangles)
        real = (np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0
        idx = np.nonzero(real)[0]
        lin = np.asarray(world, np.float32)[:, :3]
        off = np.asarray(world, np.float32)[:, 3]
        wv0_l.append(v0[idx] @ lin.T + off)
        we1_l.append(e1[idx] @ lin.T)
        we2_l.append(e2[idx] @ lin.T)
        src_l.append(idx.astype(np.int64) + lo)
        inst_l.append(np.full(idx.shape[0], iid, np.int32))
    if not wv0_l:
        return (np.zeros((0, ROW), np.float32),
                np.zeros((0, ROW), np.float32),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    wv0 = np.concatenate(wv0_l)
    we1 = np.concatenate(we1_l)
    we2 = np.concatenate(we2_l)
    src = np.concatenate(src_l)
    iid = np.concatenate(inst_l)

    bmin_t = np.minimum(wv0, np.minimum(wv0 + we1, wv0 + we2))
    bmax_t = np.maximum(wv0, np.maximum(wv0 + we1, wv0 + we2))
    tree = bvh_mod.build(bmin_t, bmax_t, leaf_size=leaf_size)
    order = tree.order

    # vectorized leaf packing (a per-leaf Python loop costs minutes at
    # dragon scale): every leaf owns exactly leaf_size slots; slot j of
    # leaf l holds sorted-triangle first[l] + j when j < count[l]
    leaf_ids = np.where(tree.count > 0)[0]
    nl = leaf_ids.shape[0]
    firsts = tree.first[leaf_ids].astype(np.int64)
    counts = tree.count[leaf_ids].astype(np.int64)
    lanes = np.arange(leaf_size, dtype=np.int64)
    sidx = firsts[:, None] + lanes[None, :]          # (nl, leaf)
    valid = lanes[None, :] < counts[:, None]
    tri = order[np.where(valid, sidx, 0)]            # (nl, leaf) global tri
    vm = valid[..., None]
    # per-slot [v0, e1, e2] triples
    tri9 = np.stack([
        np.where(vm, wv0[tri], 0.0),
        np.where(vm, we1[tri], 0.0),
        np.where(vm, we2[tri], 0.0),
    ], axis=2)                                        # (nl, leaf, 3, 3)
    leaf_rows = np.zeros((nl, ROW), np.float32)
    leaf_rows[:, :leaf_size * 9] = tri9.reshape(nl, leaf_size * 9)
    slot_tri = np.where(valid, src[tri], -1).astype(np.int32).reshape(-1)
    slot_inst = np.where(valid, iid[tri], -1).astype(np.int32).reshape(-1)
    new_first = tree.first.copy()
    new_first[leaf_ids] = (np.arange(nl, dtype=np.int64)
                           * leaf_size).astype(new_first.dtype)
    w = wide_mod.collapse(tree.bmin, tree.bmax, new_first,
                          np.minimum(tree.count, leaf_size),
                          tree.skip, k=k)
    rows = _pack_rows_128(w, 0)
    return rows, leaf_rows, slot_tri, slot_inst


# Measured ceiling on this chip (scripts/exp_vmem_ceiling.py): 16.6 MB of
# tables compiles and runs; 40 MB fails. The budget is the measured-GOOD
# point, not an interpolation — tables past it switch to the fat-row HBM
# streaming kernel at build time (scene.py -> pallas/hbm_kernel.py), so
# this VMEM-resident kernel never sees an unproven table size.
VMEM_TABLE_BUDGET = int(16.6 * 1024 * 1024)


def fits_vmem(tables: PallasTables,
              budget_bytes: int = VMEM_TABLE_BUDGET) -> bool:
    """Node + leaf tables must sit in VMEM alongside the ray tiles."""
    return (tables.rows.size + tables.leaf.size) * 4 <= budget_bytes


def pack_tables(tri_v0, tri_e1, tri_e2, inst_tri_lists,
                leaf_size: int = 12, k: int = 8) -> PallasTables:
    """Build kernel tables from the scene's slot-ordered triangle arrays.

    tri_v0/e1/e2: (S, 3) numpy, the scene's slot-ordered triangles (padding
    slots are all-zero). inst_tri_lists: per instance, the array of SCENE
    slots holding its real triangles (mesh order). A fresh median BVH is
    built per instance with the kernel's own leaf size (<= 14 so one leaf
    row is one 128-lane VMEM row), collapsed K-wide, and packed.
    """
    assert leaf_size * 9 <= ROW and 9 + 7 * k <= ROW
    from ptsharp_tpu.accel import bvh as bvh_mod
    from ptsharp_tpu.accel import wide as wide_mod

    all_rows = []
    all_leaf = []
    all_map = []
    inst_base = []
    inst_end = []
    row_off = 0
    leaf_off = 0
    for slots in inst_tri_lists:
        slots = np.asarray(slots, np.int64)
        v0 = np.asarray(tri_v0[slots], np.float32)
        e1 = np.asarray(tri_e1[slots], np.float32)
        e2 = np.asarray(tri_e2[slots], np.float32)
        bmin_t = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
        bmax_t = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
        tree = bvh_mod.build(bmin_t, bmax_t, leaf_size=leaf_size)
        order = tree.order  # sorted-tri -> instance-local tri index
        # re-slot leaves: node_first indexes prim_order runs; pack each
        # leaf's triangles into one 128-lane row
        nl = int(np.sum(tree.count > 0))
        leaf_rows = np.zeros((nl, ROW), np.float32)
        smap = np.full(nl * leaf_size, -1, np.int32)
        new_first = tree.first.copy()
        li = 0
        for ni in range(tree.count.shape[0]):
            c = int(tree.count[ni])
            if c <= 0:
                continue
            f = int(tree.first[ni])
            tri = order[f:f + c]
            row = np.zeros(ROW, np.float32)
            for j, t in enumerate(tri):
                row[j * 9:j * 9 + 3] = v0[t]
                row[j * 9 + 3:j * 9 + 6] = e1[t]
                row[j * 9 + 6:j * 9 + 9] = e2[t]
                smap[li * leaf_size + j] = slots[t]
            leaf_rows[li] = row
            new_first[ni] = (leaf_off + li) * leaf_size
            li += 1
        w = wide_mod.collapse(tree.bmin, tree.bmax, new_first,
                              np.minimum(tree.count, leaf_size),
                              tree.skip, k=k)
        rows = _pack_rows_128(w, row_off)
        all_rows.append(rows)
        all_leaf.append(leaf_rows)
        all_map.append(smap)
        inst_base.append(row_off)
        inst_end.append(row_off + rows.shape[0])
        row_off += rows.shape[0]
        leaf_off += li
    rows = np.concatenate(all_rows) if all_rows else np.zeros((0, ROW), np.float32)
    leaf = np.concatenate(all_leaf) if all_leaf else np.zeros((0, ROW), np.float32)
    smap = np.concatenate(all_map) if all_map else np.zeros((0,), np.int32)
    return PallasTables(
        rows=jnp.asarray(rows), leaf=jnp.asarray(leaf),
        slot_map=jnp.asarray(smap),
        inst_base=np.asarray(inst_base, np.int64),
        inst_end=np.asarray(inst_end, np.int64),
        leaf_size=leaf_size, k=k,
    )


def _pack_rows_128(w, node_offset: int) -> np.ndarray:
    """accel/wide.pack_rows layout, lane-padded to one node per 128-lane
    row (what Mosaic materializes anyway for any row width — make the
    padding explicit so VMEM budgeting is honest)."""
    from ptsharp_tpu.accel import wide as wide_mod

    base = wide_mod.pack_rows(w, node_offset)
    nw = base.shape[0]
    rows = np.zeros((nw, ROW), np.float32)
    rows[:, :base.shape[1]] = base
    return rows
