"""Which exact bunny-trace program shape SIGILLs the tunnel compiler?

Variants: ray count 1<<16..1<<20, cast_rays inside vs outside jit,
radiance-sum output vs full radiance. No compilation cache.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace

W, H = 1920, 1080


def main():
    scene, cam, _r, icfg = examples.build("bunny")

    def chunk(r):
        xs = jnp.arange(r, dtype=jnp.int32) % (W * H)
        return xs % W, xs // W

    def attempt(label, f, *args):
        try:
            t0 = time.time()
            out = jax.jit(f)(*args)
            jax.block_until_ready(out)
            dt = time.time() - t0
            t0 = time.time()
            out = jax.jit(f)(*args)
            jax.block_until_ready(out)
            dt2 = time.time() - t0
            print(f"{label}: OK compile {dt:.0f}s run {dt2*1e3:.0f}ms",
                  flush=True)
        except Exception as e:
            print(f"{label}: FAIL {str(e)[:90]}", flush=True)

    for shift in (16, 17, 18):
        r = 1 << shift
        px, py = chunk(r)

        def inside(key, px=px, py=py, r=r):
            kj, kt = jax.random.split(key)
            ju, jv = jax.random.uniform(kj, (2, r))
            org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
            res = trace(scene, icfg, org, dirn, kt)
            return jnp.sum(res.radiance), res.rays_traced

        attempt(f"inside 1<<{shift}", inside, jax.random.PRNGKey(0))

        ju = jnp.full((r,), 0.5)
        org, dirn = cam.cast_rays(px, py, W, H, ju, ju)

        def outside(o, d):
            res = trace(scene, icfg, o, d, jax.random.PRNGKey(1))
            return jnp.sum(res.radiance), res.rays_traced

        attempt(f"outside 1<<{shift}", outside, org, dirn)


if __name__ == "__main__":
    main()
