"""Decompose the wide-walk step cost on the tunnel TPU.

Variants (bunny 82k, coherent + incoherent, R=256k):
  a) full wide walk, chunk in {4k, 16k, 64k}   — lockstep sensitivity
  b) node-stepping only (leaf intersect replaced by constant)  — how much
     of the step is leaf work (the (R, leaf*9) gather + 8-slot MT)?
  c) step counter: max while_loop iterations per chunk — how many steps
     the lockstep actually pays vs the binary walk.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.accel import traverse as tr
from ptsharp_tpu.core import vec

R = 1 << 18


def sync(x):
    return float(jnp.asarray(x).sum())


def bench(name, f, o, d, reps=3):
    try:
        t = f(o, d)
        sync(t)
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            t = f(o, d)
            sync(t)
            best = min(best, time.time() - t0)
        print(f"{name:28s} {best*1e3:8.1f} ms {R/best/1e6:7.2f} Mrays/s",
              flush=True)
        return np.asarray(t)
    except Exception as e:
        print(f"{name:28s} FAIL {str(e)[:120]}", flush=True)
        return None


def traverse_wide_nodes_only(rows, leaf_rows, org, dirn, t_max, base, end,
                             leaf_size, k):
    """Wide walk with the leaf stage stubbed out (returns node-stepping
    cost only; finds no hits)."""
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(dirn) < 1e-30, jnp.where(dirn < 0, -1e-30, 1e-30), dirn)

    def cond(s):
        idx, _bt, it = s
        return jnp.logical_and(jnp.any(idx < end), it < 65536)

    def body(s):
        idx, bt, it = s
        active = idx < end
        safe = jnp.where(active, idx, base)
        nrow = rows[safe]
        first, _kind, cnt, skip, cidx = tr.unpack_wide_bits(nrow, k)
        lo = (nrow[:, 0:3] - org) * inv_d
        hi = (nrow[:, 3:6] - org) * inv_d
        tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
        tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
        is_leaf = cnt > 0
        # fake leaf result: just tighten bt slightly using tmin
        got = active & box_hit & is_leaf & (tmin > 0)
        bt = jnp.where(got, jnp.minimum(bt, tmin * 1.0001), bt)
        target, _ = tr.wide_child_step(nrow, k, org, inv_d, bt, cidx, skip)
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, target, skip)
        idx = jnp.where(active, nxt, idx)
        return idx, bt, it + 1

    init = (jnp.full((r,), base, jnp.int32),
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)),
            jnp.int32(0))
    _, bt, it = jax.lax.while_loop(cond, body, init)
    return bt, it


def count_steps(rows, leaf_rows, org, dirn, base, end, leaf_size, k,
                chunk, wide=True):
    """Max while-iterations per chunk (the lockstep bound actually paid)."""
    r = org.shape[0]
    n = r // chunk

    def one(args):
        o, d = args
        if wide:
            f = tr.traverse_wide
        else:
            f = tr.traverse_packed

        # re-implement just enough to get the iteration count
        org_, dirn_ = o, d
        inv_d = 1.0 / jnp.where(
            jnp.abs(dirn_) < 1e-30, jnp.where(dirn_ < 0, -1e-30, 1e-30),
            dirn_)

        def cond(s):
            idx, bt, it = s
            return jnp.logical_and(jnp.any(idx < end), it < 65536)

        def body(s):
            idx, bt, it = s
            active = idx < end
            safe = jnp.where(active, idx, base)
            nrow = rows[safe]
            if wide:
                first, _kind, cnt, skip, cidx = tr.unpack_wide_bits(nrow, k)
            else:
                first, skip, _kind, cnt = tr.unpack_bits(nrow)
            lo = (nrow[:, 0:3] - org_) * inv_d
            hi = (nrow[:, 3:6] - org_) * inv_d
            tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
            tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
            box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
            is_leaf = cnt > 0
            do_leaf = active & box_hit & is_leaf
            t_lane, lane_best, _u, _v = tr.leaf_intersect(
                leaf_rows, jnp.where(do_leaf, first // leaf_size, 0),
                org_, dirn_, bt, leaf_size, do_leaf)
            bt = jnp.minimum(bt, t_lane)
            if wide:
                target, _ = tr.wide_child_step(nrow, k, org_, inv_d, bt,
                                               cidx, skip)
                nxt = jnp.where(box_hit & ~is_leaf, target, skip)
            else:
                nxt = jnp.where(box_hit & ~is_leaf, idx + 1, skip)
            idx = jnp.where(active, nxt, idx)
            return idx, bt, it + 1

        init = (jnp.full((chunk,), base, jnp.int32),
                jnp.full((chunk,), vec.INF, jnp.float32),
                jnp.int32(0))
        _, _, it = jax.lax.while_loop(cond, body, init)
        return it

    its = jax.lax.map(one, (org.reshape(n, chunk, 3),
                            dirn.reshape(n, chunk, 3)))
    return its


def main():
    sys.path.insert(0, os.path.dirname(__file__))
    from exp_wide import bunny_scene, ray_sets
    from ptsharp_tpu import examples

    _s, cam, _r, _i = examples.build("bunny")
    (org_c, dir_c), (org_i, d_i) = ray_sets(cam)

    for K in (4, 8):
        scene = bunny_scene(K)
        wb, we = int(scene.w_inst_base[0]), int(scene.w_inst_end[0])
        ub, ue = int(scene.u_inst_base[0]), int(scene.u_inst_end[0])

        for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
            if K == 4:
                its_b = jax.jit(lambda o_, d_: count_steps(
                    scene.u_rows, scene.leaf_rows, o_, d_, ub, ue, 8, K,
                    1 << 14, wide=False))(o, d)
                print(f"binary steps {lab}: mean-max/chunk "
                      f"{float(jnp.mean(its_b)):.0f} max {int(jnp.max(its_b))}",
                      flush=True)
            its_w = jax.jit(lambda o_, d_: count_steps(
                scene.w_rows, scene.leaf_rows, o_, d_, wb, we, 8, K,
                1 << 14, wide=True))(o, d)
            print(f"wide{K} steps {lab}: mean-max/chunk "
                  f"{float(jnp.mean(its_w)):.0f} max {int(jnp.max(its_w))}",
                  flush=True)

        for chunk in (1 << 12, 1 << 14, 1 << 16):
            f = jax.jit(lambda o, d, c=chunk, s=scene: tr.traverse_wide_chunked(
                s.w_rows, s.leaf_rows, o, d, vec.INF, wb, we, 8, K,
                chunk=c)[0])
            bench(f"wide{K} coh chunk={chunk}", f, org_c, dir_c)
            bench(f"wide{K} inc chunk={chunk}", f, org_i, d_i)

        def nodes_only(o, d, s=scene):
            bt, _ = traverse_wide_nodes_only(
                s.w_rows, s.leaf_rows, o, d, vec.INF, wb, we, 8, K)
            return bt

        # nodes-only runs unchunked (single while loop over all R rays)
        f = jax.jit(nodes_only)
        bench(f"wide{K} coh nodes-only", f, org_c, dir_c)
        bench(f"wide{K} inc nodes-only", f, org_i, d_i)


if __name__ == "__main__":
    main()
