"""Cluster intersector round 2: -inf fallback fix, candidate-selection
microbench (top_k vs K x argmin vs approx_min_k), walk re-baseline."""

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


def bench(name, f, *args):
    try:
        sync(f(*args))
        t0 = time.time()
        out = f(*args)
        sync(out)
        dt = time.time() - t0
        print(f"{name:22s} {dt*1e3:8.1f} ms  {R/dt/1e6:7.2f} Mrays/s",
              flush=True)
        return out
    except Exception as e:
        print(f"{name:22s} FAIL {str(e)[:110]}", flush=True)


def main():
    scene, cam, _r, _i = examples.build("bunny")
    tpc = scene.cluster_rows.shape[1] // 9
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    cb = int(scene.inst_cluster_base[0])
    ce = int(scene.inst_cluster_end[0])
    n_c = scene.cluster_bmin.shape[0]

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

    # candidate-selection microbench on a (8192, n_c) score matrix
    score = jnp.asarray(rng.uniform(0, 10, (8192, n_c)).astype(np.float32))

    def via_topk(s):
        v, i = jax.lax.top_k(-s, 8)
        return v.sum() + i.sum()

    def via_argmin(s):
        tot = jnp.float32(0)
        cur = s
        for _ in range(8):
            i = jnp.argmin(cur, axis=1)
            v = jnp.min(cur, axis=1)
            tot = tot + v.sum() + i.sum()
            cur = cur.at[jnp.arange(cur.shape[0]), i].set(jnp.inf)
        return tot

    def via_approx(s):
        v, i = jax.lax.approx_min_k(s, 8)
        return v.sum() + i.sum()

    for name, f in (("topk8", via_topk), ("argmin8", via_argmin),
                    ("approx_min_k8", via_approx)):
        try:
            g = jax.jit(f)
            sync(g(score))
            t0 = time.time()
            sync(g(score))
            print(f"sel {name:18s} {(time.time()-t0)*1e3:8.2f} ms / 8k rays",
                  flush=True)
        except Exception as e:
            print(f"sel {name} FAIL {str(e)[:100]}", flush=True)

    fw = jax.jit(lambda o, d: traverse_packed_chunked(
        scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
        scene.max_leaf)[0])
    fc = jax.jit(lambda o, d: cl.intersect_clustered(
        (scene.cluster_bmin, scene.cluster_bmax, scene.cluster_rows, tpc,
         cb, ce, scene.u_rows, scene.leaf_rows, base, end, scene.max_leaf),
        o, d, vec.INF, k_cand=8, chunk=8192)[0])

    for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
        tw = bench(f"walk {lab}", fw, o, d)
        tc = bench(f"clusterK8fix {lab}", fc, o, d)
        if tw is not None and tc is not None:
            hw = int((np.asarray(tw) < 1e8).sum())
            hc = int((np.asarray(tc) < 1e8).sum())
            print(f"  hits walk={hw} cluster={hc} {'OK' if hw==hc else 'MISMATCH'}",
                  flush=True)


if __name__ == "__main__":
    main()
