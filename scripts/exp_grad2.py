"""fwd+bwd throughput vs remat strategy on cornell (the bench.py grad
metric): remat off / full remat / hits-saved remat, plus fwd-only for the
bwd-cost ratio."""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace

W, H = 640, 360
R = 1 << 18


def main():
    scene, cam, _r, icfg0 = examples.build("cornell")
    xs = jnp.arange(R, dtype=jnp.int32) % (W * H)
    px, py = xs % W, xs // W

    def loss_fn(icfg):
        def f(colors, key):
            mats = scene.materials._replace(color=colors)
            s = replace(scene, materials=mats)
            kj, kt = jax.random.split(key)
            ju, jv = jax.random.uniform(kj, (2, R))
            org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
            res = trace(s, icfg, org, dirn, kt)
            return jnp.mean(res.radiance), res.rays_traced
        return f

    def timed(g, *a):
        out = g(*a)
        jax.block_until_ready(out)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            out = g(*a)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best, out

    f_fwd = jax.jit(loss_fn(icfg0))
    dt, (_l, traced) = timed(f_fwd, scene.materials.color,
                             jax.random.PRNGKey(0))
    print(f"fwd only        : {int(traced)/dt/1e6:7.2f} Mrays/s", flush=True)

    for lab, icfg in (
        ("remat=False    ", replace(icfg0, remat=False)),
        ("remat full     ", replace(icfg0, remat=True, remat_policy="full")),
        ("remat hits     ", replace(icfg0, remat=True, remat_policy="hits")),
    ):
        try:
            g = jax.jit(jax.grad(loss_fn(icfg), has_aux=True))
            dt, (_g, traced) = timed(g, scene.materials.color,
                                     jax.random.PRNGKey(0))
            print(f"{lab}: {int(traced)/dt/1e6:7.2f} Mrays/s", flush=True)
        except Exception as e:
            print(f"{lab}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
