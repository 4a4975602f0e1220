"""Measure the any-hit shadow-ray path (round 4 item 1).

A/B on the real chip:
  1. raw occlusion query vs closest-hit visibility on bunny-mesh shadow-like
     rays (sorted bounce distribution);
  2. full 4-bounce bunny trace with anyhit_shadows on/off;
  3. full cornell trace with anyhit_shadows on/off (analytic scene).

Usage: python scripts/exp_anyhit.py [bunny|cornell|raw|all]
"""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def full_trace(name, r=1 << 18, n_chunks=4, **kw):
    """bench.py-style workload: Morton-ordered pixel chunks covering the
    whole 1080p frame (chunk 0 alone is top-of-frame sky — useless for
    shadow-ray A/B)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _morton_pixel_order

    scene, cam, _rcfg, icfg = examples.build(name, **kw)
    key = jax.random.PRNGKey(0)
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    chunks = []
    for ci in range(n_chunks):
        start = (ci * r) % (w * h)
        xs = morder[(start + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
        px, py = xs % w, xs // w
        ju, jv = jax.random.uniform(jax.random.fold_in(key, ci), (2, r))
        org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
            px, py, w, h, ju, jv)
        jax.block_until_ready((org, dirn))
        chunks.append((org, dirn))

    for anyhit in (False, True):
        icfg2 = replace(icfg, anyhit_shadows=anyhit)

        @jax.jit
        def tr(org, dirn):
            res = trace(scene, icfg2, org, dirn, key)
            return jnp.sum(res.radiance), res.rays_traced

        try:
            out = tr(*chunks[0])
            jax.block_until_ready(out)
            t0 = time.time()
            outs = [tr(*c) for c in chunks]
            rays = sum(int(o[1]) for o in outs)
            dt = time.time() - t0
            mrays = rays / dt / 1e6
            s = sum(float(o[0]) for o in outs)
            print(f"{name} anyhit={anyhit}: {mrays:.2f} Mrays/s "
                  f"({dt*1e3:.1f} ms, rays={rays}, sum={s:.1f})")
        except Exception as e:
            print(f"{name} anyhit={anyhit}: FAILED {str(e)[:160]}")


def raw(r=1 << 18):
    """Raw occlusion vs closest-hit on bunny shadow-like rays."""
    import numpy as np

    from ptsharp_tpu.integrator import _morton_key
    from ptsharp_tpu.intersect import closest_hit, occlusion_query

    scene, _cam, _r, _i = examples.build("bunny", intersector="pallas",
                                         wide_k=8)
    key = jax.random.PRNGKey(1)
    # shadow-like rays: origins on a plane under the bunny, directions
    # toward a light point with jitter
    k1, k2 = jax.random.split(key)
    org = jax.random.uniform(k1, (r, 3), minval=-1.0, maxval=1.0)
    org = org.at[:, 1].set(org[:, 1] * 0.5 + 1.0)
    light = jnp.array([3.5, 6.0, -3.0])
    dirn = light[None, :] - org + jax.random.normal(k2, (r, 3)) * 0.4
    dirn = dirn / jnp.linalg.norm(dirn, axis=-1, keepdims=True)
    mk = _morton_key(org, dirn)
    perm = jnp.argsort(mk)
    org, dirn = org[perm], dirn[perm]
    t_cut = jnp.full((r,), 6.0, jnp.float32)

    @jax.jit
    def occ_q(o, d, tc):
        return occlusion_query(scene, o, d, tc)

    @jax.jit
    def ch_q(o, d, tc):
        h = closest_hit(scene, o, d, t_max=tc)
        return h.t < 1e9

    dt_o = timeit(occ_q, org, dirn, t_cut)
    dt_c = timeit(ch_q, org, dirn, t_cut)
    o = occ_q(org, dirn, t_cut)
    c = ch_q(org, dirn, t_cut)
    agree = float(jnp.mean((o == c).astype(jnp.float32)))
    print(f"raw occlusion: {r/dt_o/1e6:.2f} Mrays/s  closest-hit: "
          f"{r/dt_c/1e6:.2f} Mrays/s  speedup {dt_c/dt_o:.2f}x  "
          f"agree {agree:.4f}  occluded_frac {float(jnp.mean(o.astype(jnp.float32))):.3f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("raw", "all"):
        raw()
    if which in ("bunny", "all"):
        full_trace("bunny", intersector="pallas", wide_k=8)
    if which in ("cornell", "all"):
        full_trace("cornell", r=1 << 20)
