"""Cluster intersector vs packed walk on TPU (bunny, 82k tris)."""

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


def main():
    scene, cam, _r, _i = examples.build("bunny")
    tpc = scene.cluster_rows.shape[1] // 9
    print("clusters", scene.cluster_bmin.shape[0], "tris/cluster", tpc,
          flush=True)
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    cb = int(scene.inst_cluster_base[0])
    ce = int(scene.inst_cluster_end[0])

    w, h = 1920, 1080
    xs = jnp.arange(R, dtype=jnp.int32)
    px, py = xs % w, (xs // w) % h
    ju = jnp.full((R,), 0.5)
    org_c, dir_c = cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    org_i = jnp.asarray(rng.uniform(-0.8, 0.8, (R, 3)).astype(np.float32)
                        + np.array([0, 1, 0], np.float32))
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)

    fw = jax.jit(lambda o, d: traverse_packed_chunked(
        scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
        scene.max_leaf)[0])

    variants = [("walk16k", fw)]
    for k in (8, 12, 16):
        for chunk in (8192, 16384):
            variants.append((
                f"clusterK{k}c{chunk>>10}k",
                jax.jit(lambda o, d, k=k, c=chunk: cl.intersect_clustered(
                    (scene.cluster_bmin, scene.cluster_bmax,
                     scene.cluster_rows, tpc, cb, ce,
                     scene.u_rows, scene.leaf_rows, base, end,
                     scene.max_leaf), o, d, vec.INF, k_cand=k, chunk=c)[0]),
            ))

    ref = {}
    for name, f in variants:
        for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
            try:
                t = f(o, d)
                s = sync(t)
                t0 = time.time()
                sync(f(o, d))
                dt = time.time() - t0
                nh = int((np.asarray(t) < 1e8).sum())
                key = lab
                if key not in ref:
                    ref[key] = nh
                ok = "OK" if nh == ref[key] else f"HITS {nh} != {ref[key]}"
                print(f"{name:16s} {lab} {dt*1e3:8.1f} ms "
                      f"{R/dt/1e6:7.2f} Mrays/s  {ok}", flush=True)
            except Exception as e:
                print(f"{name} {lab} FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
