"""HBM-streaming Pallas traversal for larger-than-VMEM meshes.

The VMEM packet kernel (pallas/wide_kernel.py) requires node + leaf tables
resident in VMEM and tops out at ~16.6 MB — dragon-class meshes (1.3M tris,
~120 MB of tables) previously fell back to the 0.61 Mrays/s XLA wide walk.

PRODUCTION PATH: the FAT-ROW kernel (`pack_fat` + `pallas_traverse_hbm8_fat`).
Each node's wide row is interleaved with its leaf MT block so every packet
step issues exactly ONE (2, 128) DMA per group from the HBM table into
VMEM scratch. One DMA cluster per loop body is the load-bearing property:
kernels with TWO DMA clusters per body (the block-cache and row variants
kept below for the record) compile but desynchronize on genuinely
HBM-resident buffers — the first cluster's reads race its copies and see
zeros (measured: zero hits at bunny scale, exact parity at small scales
where the "HBM" buffers evidently land in VMEM; bisected in
scripts/exp_hbm_debug2.py — even a constant-index second DMA corrupts the
first cluster's fetches).

Traversal semantics and results are identical to pallas_traverse_wide8
(reference hot loop Tree.cs:67-128 + Triangle.cs:95-124); only row
fetches differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas import wide_kernel as wk

BIG = np.int32(2**31 - 1)
BLK = 64  # rows per cache block (32 KB DMA)


def _kernel8_hbm(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
                 t_ref, slot_ref, u_ref, v_ref,
                 ncache, lcache, nscr, lscr, nblk_s, lblk_s, nsem, lsem,
                 *, base, end, leaf_size, k, max_iters, n_lblk,
                 leaf_mode=0):
    # leaf_mode: 0 = tag-cached leaf blocks (production), 1 = fetch every
    # iteration with parallel start/wait loops, 2 = fetch every iteration
    # serially (start+wait per group) — debug knobs for isolating the
    # compiled-DMA behavior.
    G, L = 8, 128
    # cached-block state lives in SMEM scalars, not loop carries: Mosaic's
    # layout inference rejects (G, ...) i32 vector carries whose init is a
    # splat ("replicated in destination but not in source"), while SMEM
    # refs mutate freely across while_loop iterations.
    for g in range(G):
        nblk_s[g] = -1
        lblk_s[g] = -1
    ox = org_ref[0, :].reshape(G, L)
    oy = org_ref[1, :].reshape(G, L)
    oz = org_ref[2, :].reshape(G, L)
    dx = dir_ref[0, :].reshape(G, L)
    dy = dir_ref[1, :].reshape(G, L)
    dz = dir_ref[2, :].reshape(G, L)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def cond(s):
        cur, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, bt, bs, bu, bv = s
        active = cur < end
        j = jnp.minimum(cur, end - 1)          # (G, 1)

        # --- node block fetch: start every needed DMA, then wait; the
        # cache tags update only after every wait has re-read them --------
        jg = [j[g, 0] for g in range(G)]
        nbg = [jg[g] // BLK for g in range(G)]
        for g in range(G):
            need = nbg[g] != nblk_s[g]

            @pl.when(need)
            def _(bg=nbg[g], g=g):
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(bg * BLK, BLK)],
                    ncache.at[pl.ds(g * BLK, BLK)],
                    nsem.at[g],
                ).start()
        for g in range(G):
            need = nbg[g] != nblk_s[g]

            @pl.when(need)
            def _(bg=nbg[g], g=g):
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(bg * BLK, BLK)],
                    ncache.at[pl.ds(g * BLK, BLK)],
                    nsem.at[g],
                ).wait()
        for g in range(G):
            nblk_s[g] = nbg[g]

        for g in range(G):
            nscr[g, :] = ncache[g * BLK + jg[g] % BLK]
        nrow = nscr[:]                                   # (G, 128)
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        def slab(lo_col, hi_col):
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

        tmin, tmax = slab(0, 3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        # --- leaf block fetch (any group whose node is a leaf; scalar
        # bookkeeping per group, see the carry-layout note above) ----------
        lmax = n_lblk * BLK - 1
        cg = [bits[g, 7] & 0xFF for g in range(G)]
        ljg = [jnp.minimum(
            jnp.where(cg[g] > 0, bits[g, 6] // leaf_size, 0), lmax)
            for g in range(G)]
        lbg = [ljg[g] // BLK for g in range(G)]
        if leaf_mode == 2:
            for g in range(G):
                @pl.when(cg[g] > 0)
                def _(g=g, bg=lbg[g]):
                    cp = pltpu.make_async_copy(
                        leaf_ref.at[pl.ds(bg * BLK, BLK)],
                        lcache.at[pl.ds(g * BLK, BLK)],
                        lsem.at[g])
                    cp.start()
                    cp.wait()
        else:
            def lneed(g):
                if leaf_mode == 1:
                    return cg[g] > 0
                return (cg[g] > 0) & (lbg[g] != lblk_s[g])

            for g in range(G):
                @pl.when(lneed(g))
                def _(g=g, bg=lbg[g]):
                    pltpu.make_async_copy(
                        leaf_ref.at[pl.ds(bg * BLK, BLK)],
                        lcache.at[pl.ds(g * BLK, BLK)],
                        lsem.at[g],
                    ).start()
            for g in range(G):
                @pl.when(lneed(g))
                def _(g=g, bg=lbg[g]):
                    pltpu.make_async_copy(
                        leaf_ref.at[pl.ds(bg * BLK, BLK)],
                        lcache.at[pl.ds(g * BLK, BLK)],
                        lsem.at[g],
                    ).wait()
            for g in range(G):
                @pl.when(cg[g] > 0)
                def _(g=g, bg=lbg[g]):
                    lblk_s[g] = bg

        for g in range(G):
            lscr[g, :] = lcache[g * BLK + ljg[g] % BLK]
        blkrow = lscr[:]                                 # (G, 128)

        # --- Möller–Trumbore over the leaf block (masked by leaf_ok) ------
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
            got = (
                leaf_ok
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

        # --- K-way descent per group --------------------------------------
        target = jnp.full((G, L), BIG, jnp.int32)
        for c in range(k):
            cb = 9 + 6 * c
            ctmin, ctmax = slab(cb, cb + 3)
            cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
            chit = (
                (ctmax >= jnp.maximum(ctmin, 0.0))
                & (ctmin < bt)
                & (cidx > 0)
            )
            target = jnp.where(chit & (cidx < target), cidx, target)

        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
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


def _kernel8_hbm_row(rows_ref, leaf_ref, org_ref, dir_ref, tmax_ref,
                     t_ref, slot_ref, u_ref, v_ref,
                     nscr, lscr, nsem,
                     *, base, end, leaf_size, k, max_iters, n_lblk):
    # ONE DMA semaphore array serves both node and leaf copies (they never
    # overlap: node start/wait completes before leaf start/wait begins)
    lsem = nsem
    """Row-DMA variant: every iteration copies each group's node row (and
    leaf row when at a leaf) straight from HBM into the (8, 128) row
    tiles — no block cache, no tags. Baseline for validating the
    streaming path's correctness and DMA cost."""
    G, L = 8, 128
    ox = org_ref[0, :].reshape(G, L)
    oy = org_ref[1, :].reshape(G, L)
    oz = org_ref[2, :].reshape(G, L)
    dx = dir_ref[0, :].reshape(G, L)
    dy = dir_ref[1, :].reshape(G, L)
    dz = dir_ref[2, :].reshape(G, L)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.where(d < 0, -1e-30, 1e-30), d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def cond(s):
        cur, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, bt, bs, bu, bv = s
        active = cur < end
        j = jnp.minimum(cur, end - 1)
        jg = [j[g, 0] for g in range(G)]
        for g in range(G):
            pltpu.make_async_copy(
                rows_ref.at[jg[g]], nscr.at[g], nsem.at[g]).start()
        for g in range(G):
            pltpu.make_async_copy(
                rows_ref.at[jg[g]], nscr.at[g], nsem.at[g]).wait()
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        def slab(lo_col, hi_col):
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

        tmin, tmax = slab(0, 3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        lmax = n_lblk * BLK - 1
        cg = [bits[g, 7] & 0xFF for g in range(G)]
        ljg = [jnp.minimum(
            jnp.where(cg[g] > 0, bits[g, 6] // leaf_size, 0), lmax)
            for g in range(G)]
        for g in range(G):
            pltpu.make_async_copy(
                leaf_ref.at[ljg[g]], lscr.at[g], lsem.at[g]).start()
        for g in range(G):
            pltpu.make_async_copy(
                leaf_ref.at[ljg[g]], lscr.at[g], lsem.at[g]).wait()
        blkrow = lscr[:]

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
            got = (
                leaf_ok
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

        target = jnp.full((G, L), BIG, jnp.int32)
        for c in range(k):
            cb = 9 + 6 * c
            ctmin, ctmax = slab(cb, cb + 3)
            cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
            chit = (
                (ctmax >= jnp.maximum(ctmin, 0.0))
                & (ctmin < bt)
                & (cidx > 0)
            )
            target = jnp.where(chit & (cidx < target), cidx, target)

        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
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


def pallas_traverse_hbm8_row(rows, leaf, org, dirn, t_max,
                             base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None):
    """Row-DMA streaming closest-hit (see _kernel8_hbm_row)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if max_iters is None:
        max_iters = int(end) - int(base)
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
        _kernel8_hbm_row, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        n_lblk=max(leaf.shape[0] // BLK, 1),
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
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


def pack_fat(rows, leaf, leaf_size: int):
    """Interleave node rows with their leaf blocks: fat row pair 2i =
    node i's wide row, 2i+1 = its leaf MT block (zeros for internal
    nodes). ONE DMA then fetches everything an iteration needs — the
    measured Mosaic failure mode is two DMA clusters per while-loop
    body desynchronizing the first cluster's semaphore wait once the
    source buffer is genuinely HBM-resident (reads race the copies and
    see zeros; scripts/exp_hbm_debug2.py run_lmode: even a constant-index
    second DMA corrupts the node fetch at bunny scale while any single
    cluster is correct). Doubles the table; HBM has room.

    rows (Nw, 128), leaf (NL, 128) numpy or jax arrays -> (2*Nw, 128)."""
    rows = np.asarray(rows)
    leaf = np.asarray(leaf)
    nw = rows.shape[0]
    fat = np.zeros((2 * nw, 128), np.float32)
    fat[0::2] = rows
    meta = rows[:, 7].view(np.int32)
    cnt = meta & 0xFF
    first = rows[:, 6].view(np.int32)
    lj = np.where(cnt > 0, first // leaf_size, 0)
    lj = np.clip(lj, 0, max(leaf.shape[0] - 1, 0))
    if leaf.shape[0]:
        fat[1::2] = np.where((cnt > 0)[:, None], leaf[lj], 0.0)
    return fat


def _kernel8_hbm_fat(fat_ref, org_ref, dir_ref, tmax_ref,
                     t_ref, slot_ref, u_ref, v_ref,
                     fscr, nscr, lscr, nsem,
                     *, base, end, leaf_size, k, max_iters):
    """Fat-row streaming kernel: one (2, 128) DMA per group per iteration
    delivers the node row AND its leaf block (pack_fat layout)."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)

    def cond(s):
        cur, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, bt, bs, bu, bv = s
        active = cur < end
        j = jnp.minimum(cur, end - 1)
        jg = [j[g, 0] for g in range(G)]
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * jg[g], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).start()
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * jg[g], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).wait()
        for g in range(G):
            nscr[g, :] = fscr[2 * g]
            lscr[g, :] = fscr[2 * g + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        # the leaf block arrived with the node row — no cond, no 2nd DMA
        bt, bs, bu, bv = wk.packet_mt(
            lscr[:], leaf_size, leaf_ok, o3, d3, first,
            (bt, bs, bu, bv), wk.accept_closest)

        target = wk.packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
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


def pallas_traverse_hbm8_fat(fat, org, dirn, t_max, base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None):
    """Closest-hit over a pack_fat table (2*Nw, 128). Same contract as
    pallas_traverse_wide8 otherwise."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if max_iters is None:
        max_iters = int(end) - int(base)
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
        _kernel8_hbm_fat, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
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
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),   # fat pair per group
            pltpu.VMEM((8, 128), jnp.float32),    # node rows
            pltpu.VMEM((8, 128), jnp.float32),    # leaf rows
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


CBLK = 32  # fat-row PAIRS per cache block (32 KB DMA per miss)


def _kernel8_hbm_fat_cache(fat_ref, org_ref, dir_ref, tmax_ref,
                           t_ref, slot_ref, u_ref, v_ref,
                           cache, nscr, lscr, tag_s, nsem,
                           *, base, end, leaf_size, k, max_iters):
    """Fat-row kernel with a per-group BLOCK cache: ONE fat-block DMA
    (2*CBLK rows) per cache miss, SMEM tags, still exactly one DMA
    cluster per loop body — the rung the round-4 bisection left open (it
    condemned two CLUSTERS per body, not one bigger copy). Preorder
    traversal (cur+1 adjacency gives coherent walks high hit rates)."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    for g in range(G):
        tag_s[g] = -1

    def cond(s):
        cur, it, bt, bs, bu, bv = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, bt, bs, bu, bv = s
        active = cur < end
        j = jnp.minimum(cur, end - 1)
        jg = [j[g, 0] for g in range(G)]
        bg = [jg[g] // CBLK for g in range(G)]
        # ONE DMA cluster: start every needed block copy, then wait
        for g in range(G):
            @pl.when(bg[g] != tag_s[g])
            def _(g=g, b=bg[g]):
                pltpu.make_async_copy(
                    fat_ref.at[pl.ds(2 * b * CBLK, 2 * CBLK)],
                    cache.at[pl.ds(g * 2 * CBLK, 2 * CBLK)],
                    nsem.at[g]).start()
        for g in range(G):
            @pl.when(bg[g] != tag_s[g])
            def _(g=g, b=bg[g]):
                pltpu.make_async_copy(
                    fat_ref.at[pl.ds(2 * b * CBLK, 2 * CBLK)],
                    cache.at[pl.ds(g * 2 * CBLK, 2 * CBLK)],
                    nsem.at[g]).wait()
        for g in range(G):
            tag_s[g] = bg[g]
        for g in range(G):
            off = g * 2 * CBLK + 2 * (jg[g] % CBLK)
            nscr[g, :] = cache[off]
            lscr[g, :] = cache[off + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        bt, bs, bu, bv = wk.packet_mt(
            lscr[:], leaf_size, leaf_ok, o3, d3, first,
            (bt, bs, bu, bv), wk.accept_closest)

        target = wk.packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
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


def pallas_traverse_hbm8_fat_cache(fat, org, dirn, t_max,
                                   base: int, end: int,
                                   leaf_size: int, k: int,
                                   max_iters: int | None = None,
                                   interpret: bool | None = None):
    """Closest-hit over a pack_fat table through the per-group block
    cache (see _kernel8_hbm_fat_cache). Same contract as
    pallas_traverse_hbm8_fat."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if max_iters is None:
        max_iters = int(end) - int(base)
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
    # pad the fat table to a CBLK multiple so block DMAs never run off
    nfat = fat.shape[0]
    padrows = (-nfat) % (2 * CBLK)
    if padrows:
        fat = jnp.concatenate(
            [fat, jnp.zeros((padrows, 128), fat.dtype)])
    kern = functools.partial(
        _kernel8_hbm_fat_cache, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
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
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((8 * 2 * CBLK, 128), jnp.float32),  # block cache
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]


def _kernel8_hbm_fat_any(fat_ref, org_ref, dir_ref, tcut_ref,
                         occ_ref, fscr, nscr, lscr, nsem,
                         *, base, end, leaf_size, k, max_iters):
    """Any-hit fat-row streaming kernel: boolean occlusion with lane
    retirement + packet early-exit (wide_kernel._kernel8_any semantics,
    fat-row single-DMA fetches)."""
    G, L = 8, 128
    o3 = tuple(org_ref[a, :].reshape(G, L) for a in range(3))
    d3 = tuple(dir_ref[a, :].reshape(G, L) for a in range(3))
    i3 = tuple(wk.packet_safe_inv(d) for d in d3)
    t0 = tcut_ref[0, :].reshape(G, L)
    # inactive lanes (collapsed cut) count as resolved for the early exit
    inact = (t0 <= 0.0).astype(jnp.int32)

    def cond(s):
        cur, it, occ = s
        return jnp.logical_and(jnp.any(cur < end), it < max_iters)

    def body(s):
        cur, it, occ = s                 # occ (G, L) i32 0/1
        active = cur < end
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)
        j = jnp.minimum(cur, end - 1)
        jg = [j[g, 0] for g in range(G)]
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * jg[g], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).start()
        for g in range(G):
            pltpu.make_async_copy(
                fat_ref.at[pl.ds(2 * jg[g], 2)],
                fscr.at[pl.ds(2 * g, 2)], nsem.at[g]).wait()
        for g in range(G):
            nscr[g, :] = fscr[2 * g]
            lscr[g, :] = fscr[2 * g + 1]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
        first = bits[:, 6:7]
        cnt = bits[:, 7:8] & 0xFF
        skip = bits[:, 8:9]
        is_leaf = cnt > 0

        tmin, tmax = wk.packet_slab(nrow, 0, 3, o3, i3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
        leaf_ok = box_hit & is_leaf

        def accept_any(occ_in, ok, tt, _slot, _uu, _vv):
            return jnp.maximum(occ_in, (ok & (tt < bt)).astype(jnp.int32))

        occ = wk.packet_mt(lscr[:], leaf_size, leaf_ok, o3, d3, first,
                           occ, accept_any)
        occ_b = occ != 0
        bt = jnp.where(occ_b, -vec.INF, t0)

        target = wk.packet_descend(nrow, bits, k, o3, i3, bt)
        descend = box_hit & jnp.logical_not(is_leaf) & jnp.logical_not(occ_b)
        ray_next = jnp.where(descend & (target < BIG), target,
                             jnp.broadcast_to(skip, (G, L)))
        nxt = jnp.min(ray_next, axis=1, keepdims=True)
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


def pallas_occluded_hbm8_fat(fat, org, dirn, t_cut, base: int, end: int,
                             leaf_size: int, k: int,
                             max_iters: int | None = None,
                             interpret: bool | None = None):
    """Any-hit query over a pack_fat table: (R,) bool, True where some
    triangle intersects at t in (eps, t_cut). Same contract as
    wide_kernel.pallas_occluded_wide8."""
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
        _kernel8_hbm_fat_any, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
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
            pl.BlockSpec(memory_space=pltpu.HBM),
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=row_spec,
        scratch_shapes=[
            pltpu.VMEM((16, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(fat, org_t, dir_t, tc2)
    return occ[0, :r] != 0


def pallas_traverse_hbm8(rows, leaf, org, dirn, t_max, base: int, end: int,
                         leaf_size: int, k: int,
                         max_iters: int | None = None,
                         interpret: bool | None = None,
                         leaf_mode: int = 0):
    """Closest-hit over [base, end) wide rows with HBM-resident tables via
    the block-cache design. RETAINED FOR THE RECORD ONLY: its two DMA
    clusters per loop body desynchronize on genuinely HBM-resident
    buffers (module docstring) — production uses pallas_traverse_hbm8_fat
    and scene.build no longer produces the BLK-padded split tables this
    entry point requires (pad both to BLK-row multiples if calling it
    directly)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if max_iters is None:
        max_iters = int(end) - int(base)
    assert rows.shape[0] % BLK == 0 and leaf.shape[0] % BLK == 0, \
        (rows.shape, leaf.shape)
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
        _kernel8_hbm, base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), max_iters=int(max_iters),
        n_lblk=leaf.shape[0] // BLK, leaf_mode=int(leaf_mode),
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
            # explicit HBM (not ANY): with ~VMEM-sized tables the compiler
            # may place one ANY input in VMEM, and the block DMAs then read
            # garbage for the other (measured on-chip: node fetches fine,
            # leaf fetches zero -> no hits). Pinning both to HBM makes
            # every copy an HBM->VMEM DMA.
            pl.BlockSpec(memory_space=pltpu.HBM),   # node rows
            pl.BlockSpec(memory_space=pltpu.HBM),   # leaf rows
            ray_spec, ray_spec, row_spec,
        ],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        scratch_shapes=[
            pltpu.VMEM((8 * BLK, 128), jnp.float32),  # node cache
            pltpu.VMEM((8 * BLK, 128), jnp.float32),  # leaf cache
            pltpu.VMEM((8, 128), jnp.float32),        # node row tile
            pltpu.VMEM((8, 128), jnp.float32),        # leaf row tile
            pltpu.SMEM((8,), jnp.int32),              # cached node blocks
            pltpu.SMEM((8,), jnp.int32),              # cached leaf blocks
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t, tm2)
    return t[0, :r], slot[0, :r], u[0, :r], v[0, :r]
