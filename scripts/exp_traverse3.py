"""Traversal measurements with REAL ray coverage (previous 'coherent' sets
hit only sky). Adds: sorted-incoherent (Morton sort before walk) and an
approx_min_k cluster variant."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel import cluster as cl
from ptsharp_tpu.accel.traverse import traverse_packed_chunked
from ptsharp_tpu.core import vec

R = 1 << 18


def sync(x):
    return float(jnp.asarray(x).sum())


def bench(name, f, o, d, reps=2):
    try:
        t = f(o, d)
        sync(t)
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            t = f(o, d)
            sync(t)
            best = min(best, time.time() - t0)
        nh = int((np.asarray(t) < 1e8).sum())
        print(f"{name:24s} {best*1e3:8.1f} ms {R/best/1e6:7.2f} Mrays/s "
              f"hits={nh}", flush=True)
        return np.asarray(t)
    except Exception as e:
        print(f"{name:24s} FAIL {str(e)[:110]}", flush=True)
        return None


def main():
    scene, cam, _r, _i = examples.build("bunny")
    tpc = scene.cluster_rows.shape[1] // 9
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    cb = int(scene.inst_cluster_base[0])
    ce = int(scene.inst_cluster_end[0])

    w, h = 1920, 1080
    stride = (w * h) // R
    xs = (jnp.arange(R, dtype=jnp.int32) * stride) % (w * h)
    px, py = xs % w, xs // w
    ju = jnp.full((R,), 0.5)
    org_c, dir_c = cam.cast_rays(px, py, w, h, ju, ju)

    rng = np.random.default_rng(0)
    org_i = jnp.asarray(rng.uniform(-1.2, 1.2, (R, 3)).astype(np.float32)
                        * np.array([1, 0.9, 1], np.float32)
                        + np.array([0, 1, 0], np.float32))
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)

    def fw(o, d):
        return traverse_packed_chunked(
            scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
            scene.max_leaf)[0]

    fw_j = jax.jit(fw)

    # sorted walk: 3-bit direction octant + 9-bit origin Morton, sort,
    # walk, unsort
    def fsort(o, d):
        oct_ = ((d[:, 0] > 0).astype(jnp.int32)
                | ((d[:, 1] > 0).astype(jnp.int32) << 1)
                | ((d[:, 2] > 0).astype(jnp.int32) << 2))
        lo = jnp.min(o, axis=0)
        hi = jnp.max(o, axis=0)
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9) * 7.999, 0, 7)
        qi = q.astype(jnp.int32)
        key = (oct_ << 9) | (qi[:, 0] << 6) | (qi[:, 1] << 3) | qi[:, 2]
        perm = jnp.argsort(key)
        t = traverse_packed_chunked(
            scene.u_rows, scene.leaf_rows, o[perm], d[perm], vec.INF,
            base, end, scene.max_leaf)[0]
        inv = jnp.argsort(perm)
        return t[inv]

    fsort_j = jax.jit(fsort)

    def fcl(o, d, use_approx):
        return cl.intersect_clustered(
            (scene.cluster_bmin, scene.cluster_bmax, scene.cluster_rows,
             tpc, cb, ce, scene.u_rows, scene.leaf_rows, base, end,
             scene.max_leaf), o, d, vec.INF, k_cand=8, chunk=8192)[0]

    for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
        t1 = bench(f"walk {lab}", fw_j, o, d)
        t2 = bench(f"walk-sorted {lab}", fsort_j, o, d)
        if t1 is not None and t2 is not None:
            ok = np.allclose(t1, t2, rtol=1e-5, atol=1e-5)
            print(f"  sorted parity: {ok}", flush=True)
        bench(f"cluster {lab}", jax.jit(lambda o_, d_: fcl(o_, d_, False)),
              o, d)


if __name__ == "__main__":
    main()
