"""Per-stage wall-clock attribution for the bunny trace at 256k rays:
argsort alone, sorted closest-hit (primaries vs bounce-like), sorted
any-hit occlusion, shading-only (hit_info + bounce sampling), raygen.
Names where the full-trace time goes (BASELINE round-4 table)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _morton_pixel_order
from ptsharp_tpu import examples
from ptsharp_tpu.integrator import (
    IntegratorConfig, RayState, _morton_key, _sorted_closest_hit,
    _sorted_occlusion, _step,
)
from ptsharp_tpu.intersect import hit_info


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(r=1 << 18):
    scene, cam, _rc, icfg = examples.build("bunny", intersector="pallas",
                                           wide_k=8)
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)
    xs = morder[(3 * r + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
    px, py = xs % w, xs // w
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
        px, py, w, h, ju, jv)
    jax.block_until_ready((org, dirn))

    # bounce-like rays: trace depth 0, take the real continuation rays
    state0 = RayState(org=org, dirn=dirn,
                      throughput=jnp.ones((r, 3)),
                      radiance=jnp.zeros((r, 3)),
                      emission_ok=jnp.ones(r, bool),
                      alive=jnp.ones(r, bool))

    @jax.jit
    def one_step(s):
        s2, _, _, _ = _step(scene, icfg, s, jnp.int32(0), key, ju, jv,
                            None, 0)
        return s2

    state1 = one_step(state0)
    jax.block_until_ready(state1.org)
    print(f"alive after depth0: {int(jnp.sum(state1.alive))}/{r}")

    @jax.jit
    def f_sort(o, d):
        return jnp.argsort(_morton_key(o, d)).sum()

    @jax.jit
    def f_ch(o, d, tm):
        return _sorted_closest_hit(scene, o, d, t_max=tm).t.sum()

    @jax.jit
    def f_occ(o, d):
        tc = jnp.full((o.shape[0],), 4.0, jnp.float32)
        return _sorted_occlusion(scene, o, d, tc).sum()

    @jax.jit
    def f_shade(s):
        from ptsharp_tpu.intersect import closest_hit

        hit = closest_hit(scene, s.org, s.dirn,
                          t_max=jnp.where(s.alive, 1e9, -1e9))
        info = hit_info(scene, s.org, s.dirn, hit)
        return info.position.sum() + info.normal.sum()

    lane_tm = jnp.where(state1.alive, 1e9, -1e9)
    print(f"argsort 256k          : {timeit(f_sort, state1.org, state1.dirn)*1e3:7.1f} ms")
    print(f"closest-hit primaries  : {timeit(f_ch, org, dirn, jnp.full((r,), 1e9))*1e3:7.1f} ms")
    print(f"closest-hit bounce     : {timeit(f_ch, state1.org, state1.dirn, lane_tm)*1e3:7.1f} ms")
    print(f"anyhit occlusion bounce: {timeit(f_occ, state1.org, state1.dirn)*1e3:7.1f} ms")
    print(f"full one _step (d0)    : {timeit(one_step, state0)*1e3:7.1f} ms")
    print(f"full one _step (d1)    : {timeit(one_step, state1)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
