"""Pallas packet kernel vs XLA packed walk on TPU (bunny, 82k tris).
Coherent (real image coverage), sorted-incoherent, raw-incoherent."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel.traverse import traverse_packed_chunked
from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas.traverse_kernel import pallas_traverse

R = 1 << 18


def sync(x):
    return float(jnp.asarray(x).sum())


def main():
    scene, cam, _r, _i = examples.build("bunny")
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    print("vmem tables MB",
          round((scene.u_rows.size + scene.leaf_rows.size) * 4 / 2**20, 1),
          flush=True)

    w, h = 1920, 1080
    stride = (w * h) // R
    xs = (jnp.arange(R, dtype=jnp.int32) * stride) % (w * h)
    px, py = xs % w, xs // w
    ju = jnp.full((R,), 0.5)
    org_c, dir_c = cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    org_i = jnp.asarray(rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32)
                        + np.array([0, 1, 0], np.float32))
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)

    fw = jax.jit(lambda o, d: traverse_packed_chunked(
        scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
        scene.max_leaf)[0])

    results = {}
    for tile in (512, 1024, 2048):
        fp = jax.jit(lambda o, d, t=tile: pallas_traverse(
            scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
            scene.max_leaf, tile=t)[0])
        for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
            try:
                t = fp(o, d)
                sync(t)
                t0 = time.time()
                sync(fp(o, d))
                dt = time.time() - t0
                nh = int((np.asarray(t) < 1e8).sum())
                print(f"pallas t{tile:5d} {lab} {dt*1e3:8.1f} ms "
                      f"{R/dt/1e6:7.2f} Mrays/s hits={nh}", flush=True)
                results[(tile, lab)] = np.asarray(t)
            except Exception as e:
                print(f"pallas t{tile} {lab} FAIL {str(e)[:120]}", flush=True)

    for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
        t = fw(o, d)
        sync(t)
        t0 = time.time()
        sync(fw(o, d))
        dt = time.time() - t0
        nh = int((np.asarray(t) < 1e8).sum())
        print(f"walk        {lab} {dt*1e3:8.1f} ms {R/dt/1e6:7.2f} Mrays/s "
              f"hits={nh}", flush=True)
        for tile in (512, 1024, 2048):
            if (tile, lab) in results:
                ok = np.allclose(results[(tile, lab)], np.asarray(t),
                                 rtol=1e-4, atol=1e-4)
                print(f"  parity t{tile} {lab}: {ok}", flush=True)


if __name__ == "__main__":
    main()
