"""Increment the working node-only debug kernel toward the full HBM
kernel until it breaks (compiled, bunny scale):
  D1 = node walk + leaf row DMA + lscr read (result: sum of lscr)
  D2 = D1 + Moller-Trumbore updating bt/bs
Outputs cursors (per group) and a checksum; compared against CPU
interpret in the harness that calls this with JAX_PLATFORMS variants."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptsharp_tpu.pallas.hbm_kernel import BLK


def make_kernel(with_mt: bool):
    def kern(rows_ref, leaf_ref, org_ref, dir_ref,
             cur_ref, chk_ref, nscr, lscr, nsem, lsem,
             *, base, end, leaf_size, k, n_iters, n_lblk):
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
        BIG = np.int32(2**31 - 1)

        def cond(s):
            cur, it, bt, bs, acc = s
            return jnp.logical_and(jnp.any(cur < end), it < n_iters)

        def body(s):
            cur, it, bt, bs, acc = s
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
                    jnp.maximum(jnp.minimum(lox, hix),
                                jnp.minimum(loy, hiy)),
                    jnp.minimum(loz, hiz))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(lox, hix),
                                jnp.maximum(loy, hiy)),
                    jnp.maximum(loz, hiz))
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
            acc = acc + jnp.sum(blkrow, axis=1, keepdims=True)

            if with_mt:
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
                    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12,
                                              1e-12, det)
                    sx = ox - v0x
                    sy = oy - v0y
                    sz = oz - v0z
                    uu = (sx * hx + sy * hy + sz * hz) * inv_det
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    got = (leaf_ok & (jnp.abs(det) > 1e-12)
                           & (uu >= 0.0) & (uu <= 1.0)
                           & (vv >= 0.0) & (uu + vv <= 1.0)
                           & (tt > 1e-4) & (tt < bt))
                    bt = jnp.where(got, tt, bt)
                    bs = jnp.where(got, first + l, bs)

            target = jnp.full((G, L), BIG, jnp.int32)
            for c in range(k):
                cb = 9 + 6 * c
                ctmin, ctmax = slab(cb, cb + 3)
                cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
                chit = ((ctmax >= jnp.maximum(ctmin, 0.0)) & (ctmin < bt)
                        & (cidx > 0))
                target = jnp.where(chit & (cidx < target), cidx, target)
            descend = box_hit & jnp.logical_not(is_leaf)
            ray_next = jnp.where(descend & (target < BIG), target,
                                 jnp.broadcast_to(skip, (G, L)))
            nxt = jnp.min(ray_next, axis=1, keepdims=True)
            cur = jnp.where(active, nxt, cur)
            return cur, it + 1, bt, bs, acc

        init = (jnp.full((G, 1), base, jnp.int32), jnp.int32(0),
                jnp.full((G, L), 1e9, jnp.float32),
                jnp.full((G, L), -1, jnp.int32),
                jnp.zeros((G, 1), jnp.float32))
        cur, _, bt, bs, acc = jax.lax.while_loop(cond, body, init)
        cur_ref[0, :] = jnp.broadcast_to(cur, (G, L)).reshape(G * L)
        hits = jnp.sum((bs >= 0).astype(jnp.float32), axis=1, keepdims=True)
        chk_ref[0, :] = jnp.broadcast_to(
            acc + hits, (G, L)).reshape(G * L)

    return kern


def run(rows, leaf, org, dirn, base, end, leaf_size, k, n_iters,
        with_mt, interpret):
    r = org.shape[0]
    org_t = org.T.reshape(3, r)
    dir_t = dirn.T.reshape(3, r)
    kern = functools.partial(
        make_kernel(with_mt), base=int(base), end=int(end),
        leaf_size=int(leaf_size), k=int(k), n_iters=int(n_iters),
        n_lblk=max(leaf.shape[0] // BLK, 1))
    cur, chk = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, 1024), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1024), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((8,)),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t)
    return np.asarray(cur)[0, ::128], np.asarray(chk)[0, ::128]


def main():
    from ptsharp_tpu import examples
    from exp_hbm2 import aimed_rays

    scene, _c, _r, _i = examples.build("bunny", intersector="pallas",
                                       wide_k=8)

    def pad(a):
        p = (-a.shape[0]) % BLK
        if p:
            return jnp.concatenate([a, jnp.zeros((p, 128), jnp.float32)])
        return a

    rows, leaf = pad(scene.p_rows), pad(scene.p_leaf)
    lo = np.asarray(jnp.min(scene.tri_v0, axis=0))
    hi = np.asarray(jnp.max(scene.tri_v0 + scene.tri_e1, axis=0))
    org, d = aimed_rays(1024, lo, hi, jax.random.PRNGKey(0))
    b0, e0 = scene.p_inst_base[0], scene.p_inst_end[0]
    for with_mt in (False, True):
        for n in (4, 16):
            cc, kc = run(rows, leaf, org, d, b0, e0, scene.max_leaf,
                         scene.wide_k, n, with_mt, False)
            print(f"D{'2' if with_mt else '1'} n={n} cur={cc.tolist()} "
                  f"chk={np.round(kc, 1).tolist()}")


if __name__ == "__main__":
    main()


def run_combined(tab, n_rows, org, dirn, base, end, leaf_size, k, n_iters,
                 interpret):
    """Same as D1 but ONE combined HBM buffer [rows; leaf] — leaf row j
    lives at tab[n_rows + j]."""
    import functools

    def kern(tab_ref, org_ref, dir_ref, cur_ref, chk_ref,
             nscr, lscr, nsem, lsem,
             *, base, end, leaf_size, k, n_iters, n_rows, n_lblk):
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
        BIG = np.int32(2**31 - 1)

        def cond(s):
            cur, it, bt, acc = s
            return jnp.logical_and(jnp.any(cur < end), it < n_iters)

        def body(s):
            cur, it, bt, acc = s
            active = cur < end
            j = jnp.minimum(cur, end - 1)
            jg = [j[g, 0] for g in range(G)]
            for g in range(G):
                pltpu.make_async_copy(
                    tab_ref.at[jg[g]], nscr.at[g], nsem.at[g]).start()
            for g in range(G):
                pltpu.make_async_copy(
                    tab_ref.at[jg[g]], nscr.at[g], nsem.at[g]).wait()
            nrow = nscr[:]
            bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
            skip = bits[:, 8:9]
            cnt = bits[:, 7:8] & 0xFF
            is_leaf = cnt > 0

            def slab(lo_col, hi_col):
                lox = (nrow[:, lo_col + 0:lo_col + 1] - ox) * ix
                loy = (nrow[:, lo_col + 1:lo_col + 2] - oy) * iy
                loz = (nrow[:, lo_col + 2:lo_col + 3] - oz) * iz
                hix = (nrow[:, hi_col + 0:hi_col + 1] - ox) * ix
                hiy = (nrow[:, hi_col + 1:hi_col + 2] - oy) * iy
                hiz = (nrow[:, hi_col + 2:hi_col + 3] - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(lox, hix),
                                jnp.minimum(loy, hiy)),
                    jnp.minimum(loz, hiz))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(lox, hix),
                                jnp.maximum(loy, hiy)),
                    jnp.maximum(loz, hiz))
                return tmin, tmax

            tmin, tmax = slab(0, 3)
            box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
            lmax = n_lblk * BLK - 1
            cg = [bits[g, 7] & 0xFF for g in range(G)]
            ljg = [jnp.minimum(
                jnp.where(cg[g] > 0, bits[g, 6] // leaf_size, 0), lmax)
                for g in range(G)]
            for g in range(G):
                pltpu.make_async_copy(
                    tab_ref.at[n_rows + ljg[g]], lscr.at[g],
                    lsem.at[g]).start()
            for g in range(G):
                pltpu.make_async_copy(
                    tab_ref.at[n_rows + ljg[g]], lscr.at[g],
                    lsem.at[g]).wait()
            acc = acc + jnp.sum(lscr[:], axis=1, keepdims=True)

            target = jnp.full((G, L), BIG, jnp.int32)
            for c in range(k):
                cb = 9 + 6 * c
                ctmin, ctmax = slab(cb, cb + 3)
                cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
                chit = ((ctmax >= jnp.maximum(ctmin, 0.0)) & (ctmin < bt)
                        & (cidx > 0))
                target = jnp.where(chit & (cidx < target), cidx, target)
            descend = box_hit & jnp.logical_not(is_leaf)
            ray_next = jnp.where(descend & (target < BIG), target,
                                 jnp.broadcast_to(skip, (G, L)))
            nxt = jnp.min(ray_next, axis=1, keepdims=True)
            cur = jnp.where(active, nxt, cur)
            return cur, it + 1, bt, acc

        init = (jnp.full((G, 1), base, jnp.int32), jnp.int32(0),
                jnp.full((G, L), 1e9, jnp.float32),
                jnp.zeros((G, 1), jnp.float32))
        cur, _, _, acc = jax.lax.while_loop(cond, body, init)
        cur_ref[0, :] = jnp.broadcast_to(cur, (G, L)).reshape(G * L)
        chk_ref[0, :] = jnp.broadcast_to(acc, (G, L)).reshape(G * L)

    r = org.shape[0]
    org_t = org.T.reshape(3, r)
    dir_t = dirn.T.reshape(3, r)
    kern2 = functools.partial(
        kern, base=int(base), end=int(end), leaf_size=int(leaf_size),
        k=int(k), n_iters=int(n_iters), n_rows=int(n_rows),
        n_lblk=max((tab.shape[0] - n_rows) // BLK, 1))
    cur, chk = pl.pallas_call(
        kern2,
        out_shape=(jax.ShapeDtypeStruct((1, 1024), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1024), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((8,)),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(tab, org_t, dir_t)
    return np.asarray(cur)[0, ::128], np.asarray(chk)[0, ::128]


def run_lmode(rows, leaf, org, dirn, base, end, leaf_size, k, n_iters,
              lidx_mode, interpret):
    """D1 with the leaf-DMA index swapped: 'bits' = derived from fetched
    node data (the production dependency), 'const' = constant row 3,
    'carry' = derived from the loop carry (cur) only."""
    def kern(rows_ref, leaf_ref, org_ref, dir_ref,
             cur_ref, chk_ref, nscr, lscr, nsem, lsem,
             *, base, end, leaf_size, k, n_iters, n_lblk):
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
        BIG = np.int32(2**31 - 1)
        nlr = leaf.shape[0]

        def cond(s):
            cur, it, bt, acc = s
            return jnp.logical_and(jnp.any(cur < end), it < n_iters)

        def body(s):
            cur, it, bt, acc = s
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
            skip = bits[:, 8:9]
            cnt = bits[:, 7:8] & 0xFF
            is_leaf = cnt > 0

            def slab(lo_col, hi_col):
                lox = (nrow[:, lo_col + 0:lo_col + 1] - ox) * ix
                loy = (nrow[:, lo_col + 1:lo_col + 2] - oy) * iy
                loz = (nrow[:, lo_col + 2:lo_col + 3] - oz) * iz
                hix = (nrow[:, hi_col + 0:hi_col + 1] - ox) * ix
                hiy = (nrow[:, hi_col + 1:hi_col + 2] - oy) * iy
                hiz = (nrow[:, hi_col + 2:hi_col + 3] - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(lox, hix),
                                jnp.minimum(loy, hiy)),
                    jnp.minimum(loz, hiz))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(lox, hix),
                                jnp.maximum(loy, hiy)),
                    jnp.maximum(loz, hiz))
                return tmin, tmax

            tmin, tmax = slab(0, 3)
            box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
            lmax = n_lblk * BLK - 1
            if lidx_mode == "const":
                lj = [np.int32(3) for g in range(G)]
            elif lidx_mode == "carry":
                lj = [jnp.minimum(jg[g], nlr - 1) for g in range(G)]
            else:
                cg = [bits[g, 7] & 0xFF for g in range(G)]
                lj = [jnp.minimum(
                    jnp.where(cg[g] > 0, bits[g, 6] // leaf_size, 0), lmax)
                    for g in range(G)]
            for g in range(G):
                pltpu.make_async_copy(
                    leaf_ref.at[lj[g]], lscr.at[g], lsem.at[g]).start()
            for g in range(G):
                pltpu.make_async_copy(
                    leaf_ref.at[lj[g]], lscr.at[g], lsem.at[g]).wait()
            acc = acc + jnp.sum(lscr[:], axis=1, keepdims=True)

            target = jnp.full((G, L), BIG, jnp.int32)
            for c in range(k):
                cb = 9 + 6 * c
                ctmin, ctmax = slab(cb, cb + 3)
                cidx = bits[:, 9 + 6 * k + c:9 + 6 * k + c + 1]
                chit = ((ctmax >= jnp.maximum(ctmin, 0.0)) & (ctmin < bt)
                        & (cidx > 0))
                target = jnp.where(chit & (cidx < target), cidx, target)
            descend = box_hit & jnp.logical_not(is_leaf)
            ray_next = jnp.where(descend & (target < BIG), target,
                                 jnp.broadcast_to(skip, (G, L)))
            nxt = jnp.min(ray_next, axis=1, keepdims=True)
            cur = jnp.where(active, nxt, cur)
            return cur, it + 1, bt, acc

        init = (jnp.full((G, 1), base, jnp.int32), jnp.int32(0),
                jnp.full((G, L), 1e9, jnp.float32),
                jnp.zeros((G, 1), jnp.float32))
        cur, _, _, acc = jax.lax.while_loop(cond, body, init)
        cur_ref[0, :] = jnp.broadcast_to(cur, (G, L)).reshape(G * L)
        chk_ref[0, :] = jnp.broadcast_to(acc, (G, L)).reshape(G * L)

    r = org.shape[0]
    org_t = org.T.reshape(3, r)
    dir_t = dirn.T.reshape(3, r)
    kern2 = functools.partial(
        kern, base=int(base), end=int(end), leaf_size=int(leaf_size),
        k=int(k), n_iters=int(n_iters),
        n_lblk=max(leaf.shape[0] // BLK, 1))
    cur, chk = pl.pallas_call(
        kern2,
        out_shape=(jax.ShapeDtypeStruct((1, 1024), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1024), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((8,)),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(rows, leaf, org_t, dir_t)
    return np.asarray(cur)[0, ::128], np.asarray(chk)[0, ::128]
