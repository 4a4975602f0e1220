"""Debug the compiled HBM streaming kernel: run exactly N iterations and
dump per-group cursors + the node row each group read; compare compiled
vs interpret at increasing N to find the first divergence."""

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


def dbg_kernel(rows_ref, org_ref, dir_ref,
               cur_ref, row_ref,
               ncache, nscr, nblk_s, nsem,
               *, base, end, k, n_iters):
    G, L = 8, 128
    for g in range(G):
        nblk_s[g] = -1
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
        cur, it, bt = s
        return it < n_iters

    def body(s):
        cur, it, bt = s
        active = cur < end
        j = jnp.minimum(cur, end - 1)
        jg = [j[g, 0] for g in range(G)]
        nbg = [jg[g] // BLK for g in range(G)]
        for g in range(G):
            need = nbg[g] != nblk_s[g]

            @pl.when(need)
            def _(bg=nbg[g], g=g):
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(bg * BLK, BLK)],
                    ncache.at[pl.ds(g * BLK, BLK)],
                    nsem.at[g]).start()
        for g in range(G):
            need = nbg[g] != nblk_s[g]

            @pl.when(need)
            def _(bg=nbg[g], g=g):
                pltpu.make_async_copy(
                    rows_ref.at[pl.ds(bg * BLK, BLK)],
                    ncache.at[pl.ds(g * BLK, BLK)],
                    nsem.at[g]).wait()
        for g in range(G):
            nblk_s[g] = nbg[g]
        for g in range(G):
            nscr[g, :] = ncache[g * BLK + jg[g] % BLK]
        nrow = nscr[:]
        bits = jax.lax.bitcast_convert_type(nrow, jnp.int32)
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
                jnp.minimum(loz, hiz))
            tmax = jnp.minimum(
                jnp.minimum(jnp.maximum(lox, hix), jnp.maximum(loy, hiy)),
                jnp.maximum(loz, hiz))
            return tmin, tmax

        tmin, tmax = slab(0, 3)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt) & active
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
        return cur, it + 1, bt

    init = (jnp.full((G, 1), base, jnp.int32), jnp.int32(0),
            jnp.full((G, L), 1e9, jnp.float32))
    cur, _, _ = jax.lax.while_loop(cond, body, init)
    cur_ref[0, :] = jnp.broadcast_to(cur, (G, L)).reshape(G * L)
    # read back the rows the final cursors point at (fresh fetch)
    j = jnp.minimum(cur, end - 1)
    for g in range(G):
        bg = j[g, 0] // BLK

        @pl.when(bg != nblk_s[g])
        def _(bg=bg, g=g):
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(bg * BLK, BLK)],
                ncache.at[pl.ds(g * BLK, BLK)],
                nsem.at[g]).start()
    for g in range(G):
        bg = j[g, 0] // BLK

        @pl.when(bg != nblk_s[g])
        def _(bg=bg, g=g):
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(bg * BLK, BLK)],
                ncache.at[pl.ds(g * BLK, BLK)],
                nsem.at[g]).wait()
    for g in range(G):
        nscr[g, :] = ncache[g * BLK + j[g, 0] % BLK]
    row_ref[:, :] = nscr[:]


def run_debug(rows, org, dirn, base, end, k, n_iters, interpret):
    r = org.shape[0]
    org_t = org.T.reshape(3, r)
    dir_t = dirn.T.reshape(3, r)
    kern = functools.partial(dbg_kernel, base=int(base), end=int(end),
                             k=int(k), n_iters=int(n_iters))
    cur, row = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, 1024), jnp.int32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8 * BLK, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((8,), jnp.int32),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=interpret,
    )(rows, org_t, dir_t)
    return np.asarray(cur)[0, ::128], np.asarray(row)


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

    rows = pad(scene.p_rows)
    lo = np.asarray(jnp.min(scene.tri_v0, axis=0))
    hi = np.asarray(jnp.max(scene.tri_v0 + scene.tri_e1, axis=0))
    org, d = aimed_rays(1024, lo, hi, jax.random.PRNGKey(0))
    b0, e0 = scene.p_inst_base[0], scene.p_inst_end[0]
    for n in (1, 2, 3, 5):
        ci, rowi = run_debug(rows, org, d, b0, e0, scene.wide_k, n, True)
        cc, rowc = run_debug(rows, org, d, b0, e0, scene.wide_k, n, False)
        same_cur = np.array_equal(ci, cc)
        same_row = np.allclose(rowi, rowc)
        print(f"n={n} cur_interp={ci.tolist()} cur_comp={cc.tolist()} "
              f"cur_match={same_cur} row_match={same_row}")
        if not same_row:
            g = int(np.argmax(~np.all(np.isclose(rowi, rowc), axis=1)))
            print("  g", g, "interp", rowi[g, :6], "comp", rowc[g, :6])


if __name__ == "__main__":
    main()
