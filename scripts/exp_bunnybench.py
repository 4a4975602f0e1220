"""Find a bunny-trace program shape the tunnel compiler handles.

Bisects pix_per_chunk for the full integrator trace on the bunny scene and
reports compile success + Mrays/s per size. The winning shape goes into
bench.py's fallback ladder.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace

W, H = 1920, 1080


def try_size(scene, cam, icfg, shift, n_chunks=4):
    r = 1 << shift

    @jax.jit
    def render_chunk(key, pix_x, pix_y):
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, r))
        org, dirn = cam.cast_rays(pix_x, pix_y, W, H, ju, jv)
        result = trace(scene, icfg, org, dirn, kt)
        return jnp.sum(result.radiance), result.rays_traced

    def chunk(ci):
        start = (ci * r) % (W * H)
        xs = (start + jnp.arange(r, dtype=jnp.int32)) % (W * H)
        return xs % W, xs // W

    t0 = time.time()
    px, py = chunk(0)
    out = render_chunk(jax.random.PRNGKey(999), px, py)
    jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    outs = []
    for i in range(n_chunks):
        px, py = chunk(i)
        _s, traced = render_chunk(jax.random.PRNGKey(i), px, py)
        outs.append(traced)
    total = sum(int(t) for t in outs)
    dt = time.time() - t0
    return tc, total / dt / 1e6


def main():
    for intersector, leaf in (("wide", 8), ("walk", 8)):
        scene, cam, _r, icfg = examples.build("bunny")
        if intersector != "wide":
            from dataclasses import replace
            scene = replace(scene, intersector=intersector)
        for shift in (16, 18, 20):
            try:
                tc, mrays = try_size(scene, cam, icfg, shift)
                print(f"{intersector} 1<<{shift}: compile {tc:.1f}s "
                      f"{mrays:.2f} Mrays/s", flush=True)
            except Exception as e:
                print(f"{intersector} 1<<{shift}: FAIL {str(e)[:140]}",
                      flush=True)


if __name__ == "__main__":
    main()
