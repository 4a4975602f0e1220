"""Controlled HBM-vs-VMEM kernel comparison: rays aimed AT the mesh from
a hemisphere of viewpoints (all hit or near-hit the root), per-call
timing, on both bunny (82k tris, fits VMEM) and dragon_hd (1.3M tris,
HBM-only). Establishes the real streaming-kernel cost structure."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.core import vec
from ptsharp_tpu.integrator import _morton_key
from ptsharp_tpu.pallas import hbm_kernel as hk
from ptsharp_tpu.pallas import wide_kernel as wk


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def aimed_rays(r, lo, hi, key, spread=0.15):
    """Rays from a shell around the mesh bbox aimed at jittered targets
    inside it — 100% root-box hits, bounce-like divergence, Morton-sorted."""
    c = (jnp.asarray(lo) + jnp.asarray(hi)) / 2
    rad = float(np.linalg.norm(np.asarray(hi) - np.asarray(lo))) * 0.9
    k1, k2 = jax.random.split(key)
    d0 = jax.random.normal(k1, (r, 3))
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    org = c + d0 * rad
    tgt = c + jax.random.normal(k2, (r, 3)) * spread * rad
    d = tgt - org
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    perm = jnp.argsort(_morton_key(org, d))
    return org[perm], d[perm]


def run(name, r=1 << 17, **kw):
    scene, _cam, _rc, _ic = examples.build(name, **kw)

    def pad(a):
        p = (-a.shape[0]) % hk.BLK
        if p:
            return jnp.concatenate([a, jnp.zeros((p, 128), jnp.float32)])
        return a

    rows_p, leaf_p = pad(scene.p_rows), pad(scene.p_leaf)
    lo = np.asarray(scene.u_bmin[scene.tlas_end]) if scene.tlas_end else \
        np.asarray(jnp.min(scene.tri_v0, axis=0))
    hi_ = np.asarray(jnp.max(scene.tri_v0 + scene.tri_e1, axis=0))
    lo = np.asarray(jnp.min(scene.tri_v0, axis=0))
    org, d = aimed_rays(r, lo, hi_, jax.random.PRNGKey(0))
    b0, e0 = scene.p_inst_base[0], scene.p_inst_end[0]
    ls, kk = scene.max_leaf, scene.wide_k
    print(f"{name}: rows {rows_p.shape[0]} leaf {leaf_p.shape[0]} "
          f"range [{b0},{e0})")

    fits = (scene.p_rows.size + scene.p_leaf.size) * 4 <= 16 * 2**20

    @jax.jit
    def hbm(o, dd):
        return hk.pallas_traverse_hbm8(rows_p, leaf_p, o, dd,
                                       vec.INF, b0, e0, ls, kk)[0]

    if fits:
        @jax.jit
        def vmem(o, dd):
            return wk.pallas_traverse_wide8(scene.p_rows, scene.p_leaf,
                                            o, dd, vec.INF, b0, e0,
                                            ls, kk)[0]
        try:
            dt = timeit(vmem, org, d)
            tv = vmem(org, d)
            hits = float(jnp.mean((tv < 1e8).astype(jnp.float32)))
            print(f"  vmem: {r/dt/1e6:.2f} Mrays/s (hit frac {hits:.2f})")
        except Exception as e:
            print(f"  vmem FAILED {str(e)[:120]}")
    try:
        dt = timeit(hbm, org, d)
        th = hbm(org, d)
        hits = float(jnp.mean((th < 1e8).astype(jnp.float32)))
        print(f"  hbm : {r/dt/1e6:.2f} Mrays/s (hit frac {hits:.2f})")
    except Exception as e:
        print(f"  hbm FAILED {str(e)[:120]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("bunny", "both"):
        run("bunny", intersector="pallas", wide_k=8)
    if which in ("dragon", "both"):
        run("dragon_hd", intersector="pallas", wide_k=8)
