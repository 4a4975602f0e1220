"""TPU traversal micro-benchmarks: find the fastest BVH walk shape.

Variants:
  base       — current accel/traverse.py loop (5 gathers/step + 3-array
               leaf block gathers)
  packed     — one (N, 8) f32 row-gather per step (bounds + bitcast ints),
               leaf = aligned 8-slot blocks fetched as ONE (72,) row per ray
  packed_map — packed + lax.map over sub-chunks so each chunk's while_loop
               exits at its own max depth (lockstep waste bound per chunk)

Run on the TPU: python scripts/exp_traverse.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel import traverse as trav
from ptsharp_tpu.core import vec

R = 1 << 20


def true_sync(x):
    return float(jnp.asarray(x).sum())


def build_inputs():
    scene, cam, _r, _i = examples.build("bunny")
    w, h = 1920, 1080
    xs = jnp.arange(R, dtype=jnp.int32)
    px, py = xs % w, (xs // w) % h
    ju = jnp.full((R,), 0.5)
    org, dirn = cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    org2 = jnp.asarray(
        rng.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
        + np.array([0, 1, 0], np.float32)
    )
    return scene, org, dirn, org2, jnp.asarray(d2)


def make_packed(scene):
    """Packed node rows + aligned leaf slots from SceneData arrays."""
    bmin = np.asarray(scene.node_bmin)
    bmax = np.asarray(scene.node_bmax)
    first = np.asarray(scene.node_first)
    count = np.asarray(scene.node_count)
    skip = np.asarray(scene.node_skip)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)

    leaf_ids = np.where(count > 0)[0]
    n_l = leaf_ids.shape[0]
    slot = np.zeros((n_l, 8, 9), np.float32)
    for li, ni in enumerate(leaf_ids):
        f, c = first[ni], count[ni]
        slot[li, :c, 0:3] = v0[f : f + c]
        slot[li, :c, 3:6] = e1[f : f + c]
        slot[li, :c, 6:9] = e2[f : f + c]
    slot_rows = slot.reshape(n_l, 72)
    # remap: leaf node first -> leaf block id; also map back slot->orig id
    new_first = first.copy()
    new_first[leaf_ids] = np.arange(n_l, dtype=np.int32)

    n = bmin.shape[0]
    packed = np.zeros((n, 8), np.float32)
    packed[:, 0:3] = bmin
    packed[:, 3:6] = bmax
    packed[:, 6] = new_first.view(np.float32)
    sc = (skip.astype(np.int64) << 8) | count.astype(np.int64)
    packed[:, 7] = sc.astype(np.int32).view(np.float32)
    return jnp.asarray(packed), jnp.asarray(slot_rows)


def traverse_packed(packed, slots, org, dirn, t_max, node_end,
                    max_iters=65536):
    org = jax.lax.stop_gradient(org)
    dirn = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    inv_d = 1.0 / jnp.where(
        jnp.abs(dirn) < 1e-30, jnp.where(dirn < 0, -1e-30, 1e-30), dirn
    )

    def cond(s):
        idx, bt, bs, it = s
        return jnp.logical_and(jnp.any(idx < node_end), it < max_iters)

    def body(s):
        idx, bt, bs, it = s
        active = idx < node_end
        safe = jnp.where(active, idx, 0)
        rows = packed[safe]  # (R, 8) one gather
        nb_min = rows[:, 0:3]
        nb_max = rows[:, 3:6]
        first = jax.lax.bitcast_convert_type(rows[:, 6], jnp.int32)
        sc = jax.lax.bitcast_convert_type(rows[:, 7], jnp.int32)
        skip = jax.lax.shift_right_logical(sc, 8)
        cnt = sc & 0xFF

        lo = (nb_min - org) * inv_d
        hi = (nb_max - org) * inv_d
        tmin = jnp.max(jnp.minimum(lo, hi), axis=-1)
        tmax = jnp.min(jnp.maximum(lo, hi), axis=-1)
        box_hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)

        is_leaf = cnt > 0
        do_leaf = active & box_hit & is_leaf
        blk_id = jnp.where(do_leaf, first, 0)
        blk = slots[blk_id].reshape(r, 8, 9)  # (R, 72) one gather
        tv0 = blk[:, :, 0:3]
        te1 = blk[:, :, 3:6]
        te2 = blk[:, :, 6:9]
        d = dirn[:, None, :]
        o = org[:, None, :]
        hxv = jnp.cross(d, te2)
        det = jnp.sum(te1 * hxv, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        sv = o - tv0
        u = jnp.sum(sv * hxv, axis=-1) * inv_det
        q = jnp.cross(sv, te1)
        v = jnp.sum(d * q, axis=-1) * inv_det
        t = jnp.sum(te2 * q, axis=-1) * inv_det
        lane = jax.lax.broadcasted_iota(jnp.int32, (r, 8), 1)
        ok = (
            do_leaf[:, None]
            & (lane < cnt[:, None])
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t > 1e-4)
            & (t < bt[:, None])
        )
        t_ok = jnp.where(ok, t, vec.INF)
        t_lane = jnp.min(t_ok, axis=-1)
        got = t_lane < bt
        bt = jnp.where(got, t_lane, bt)
        bs = jnp.where(got, blk_id, bs)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, idx + 1, skip)
        idx = jnp.where(active, nxt, idx)
        return idx, bt, bs, it + 1

    init = (
        jnp.zeros((r,), jnp.int32),
        jnp.full((r,), t_max, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.int32(0),
    )
    _, bt, bs, _ = jax.lax.while_loop(cond, body, init)
    return bt, bs


def main():
    scene, org, dirn, org2, d2 = build_inputs()
    n_nodes = scene.node_bmin.shape[0]
    print("nodes", n_nodes, "tris", scene.tri_v0.shape[0], flush=True)
    packed, slots = make_packed(scene)
    mesh = trav.MeshArrays(
        node_bmin=scene.node_bmin, node_bmax=scene.node_bmax,
        node_first=scene.node_first, node_count=scene.node_count,
        node_skip=scene.node_skip, v0=scene.tri_v0, e1=scene.tri_e1,
        e2=scene.tri_e2, max_leaf=scene.max_leaf,
    )

    @jax.jit
    def f_base(o, d):
        t, tri, u, v = trav.traverse(mesh, o, d, vec.INF, 0, n_nodes)
        return t.sum(), (t < 1e8).sum()

    @jax.jit
    def f_packed(o, d):
        t, bs = traverse_packed(packed, slots, o, d, vec.INF, n_nodes)
        return t.sum(), (t < 1e8).sum()

    def make_map(chunk):
        @jax.jit
        def f(o, d):
            oc = o.reshape(-1, chunk, 3)
            dc = d.reshape(-1, chunk, 3)

            def one(args):
                o1, d1 = args
                t, _ = traverse_packed(packed, slots, o1, d1, vec.INF, n_nodes)
                return t

            t = jax.lax.map(one, (oc, dc)).reshape(-1)
            return t.sum(), (t < 1e8).sum()

        return f

    variants = [
        ("base", f_base),
        ("packed", f_packed),
        ("packed_map64k", make_map(1 << 16)),
        ("packed_map16k", make_map(1 << 14)),
    ]
    for name, f in variants:
        for label, o, d in [("coherent", org, dirn), ("incoherent", org2, d2)]:
            try:
                s, nh = f(o, d)
                true_sync(s)
                t0 = time.time()
                s, nh = f(o, d)
                true_sync(s)
                dt = time.time() - t0
                print(f"{name:16s} {label:10s} {dt*1e3:8.1f} ms  "
                      f"{R/dt/1e6:7.2f} Mrays/s  hits={int(nh)}", flush=True)
            except Exception as e:
                print(name, label, "FAIL", str(e)[:120], flush=True)


if __name__ == "__main__":
    main()
