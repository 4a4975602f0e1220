"""A/B: HBM-streaming kernel vs VMEM-resident kernel on the SAME bunny
tables + Morton-primary rays (dragon_hd measured 14.3 Mrays/s through the
streaming path — is the block-cache structure also competitive when the
tables would fit VMEM?), plus sorted bounce-like rays."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _morton_pixel_order
from ptsharp_tpu import examples
from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas import hbm_kernel as hk
from ptsharp_tpu.pallas import wide_kernel as wk


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(r=1 << 18):
    scene, cam, _rc, _ic = examples.build("bunny", intersector="pallas",
                                          wide_k=8)

    def pad(a):
        p = (-a.shape[0]) % hk.BLK
        if p:
            return jnp.concatenate([a, jnp.zeros((p, 128), jnp.float32)])
        return a

    rows_p, leaf_p = pad(scene.p_rows), pad(scene.p_leaf)
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)

    # coherent Morton primaries (mid-frame chunk)
    xs = morder[(2 * r + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
    px, py = xs % w, xs // w
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
        px, py, w, h, ju, jv)

    # sorted bounce-like rays: random origins on geometry-ish box, random
    # dirs, octant+Morton sorted
    from ptsharp_tpu.integrator import _morton_key
    k1, k2 = jax.random.split(key)
    borg = jax.random.uniform(k1, (r, 3), minval=-1.0, maxval=1.0) \
        * jnp.asarray([1.0, 0.8, 1.0]) + jnp.asarray([0.0, 0.9, 0.0])
    bd = jax.random.normal(k2, (r, 3))
    bd = bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)
    perm = jnp.argsort(_morton_key(borg, bd))
    borg, bd = borg[perm], bd[perm]

    b0, e0 = scene.p_inst_base[0], scene.p_inst_end[0]
    ls, kk = scene.max_leaf, scene.wide_k

    @jax.jit
    def vmem(o, d):
        return wk.pallas_traverse_wide8(scene.p_rows, scene.p_leaf, o, d,
                                        vec.INF, b0, e0, ls, kk)[0].sum()

    @jax.jit
    def hbm(o, d):
        return hk.pallas_traverse_hbm8(rows_p, leaf_p, o, d,
                                       vec.INF, b0, e0, ls, kk)[0].sum()

    for label, o, d in (("coherent", org, dirn), ("sorted-bounce", borg, bd)):
        try:
            dt_v = timeit(vmem, o, d)
        except Exception as e:
            print(f"{label} vmem FAILED {str(e)[:100]}")
            dt_v = None
        try:
            dt_h = timeit(hbm, o, d)
        except Exception as e:
            print(f"{label} hbm FAILED {str(e)[:100]}")
            dt_h = None
        vs = f"{r/dt_v/1e6:.2f}" if dt_v else "-"
        hs = f"{r/dt_h/1e6:.2f}" if dt_h else "-"
        print(f"bunny {label}: vmem {vs} Mrays/s   hbm-stream {hs} Mrays/s")


if __name__ == "__main__":
    main()
