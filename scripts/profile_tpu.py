"""Component timing on the TPU for the cornell bench scene.

Times closest_hit / hit_info / NEE / material sampling / full trace
separately on a 1M-ray wavefront so optimization targets the real
bottleneck. Run: python scripts/profile_tpu.py [n_rays_log2]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import IntegratorConfig, sample_lights, trace, _bounce
from ptsharp_tpu.intersect import closest_hit, hit_info


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    r = 1 << n
    scene, cam, _rcfg, icfg = examples.build("cornell")
    key = jax.random.PRNGKey(0)
    xs = jnp.arange(r, dtype=jnp.int32)
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = cam.cast_rays(xs % 1920, (xs // 1920) % 1080, 1920, 1080, ju, jv)

    print(f"rays: {r}")
    f_hit = jax.jit(lambda o, d: closest_hit(scene, o, d).t)
    t_hit = bench("closest_hit", f_hit, org, dirn)

    def hitinfo_fn(o, d):
        h = closest_hit(scene, o, d)
        return hit_info(scene, o, d, h).normal

    t_info = bench("closest_hit+info", jax.jit(hitinfo_fn), org, dirn)

    def nee_fn(o, d, k):
        h = closest_hit(scene, o, d)
        info = hit_info(scene, o, d, h)
        dl, _ = sample_lights(scene, icfg, info.position, info.normal, k)
        return dl

    t_nee = bench("hit+info+nee", jax.jit(nee_fn), org, dirn, key)

    def trace_fn(o, d, k):
        return trace(scene, icfg, o, d, k).radiance

    t_tr = bench("full trace (5 bounces)", jax.jit(trace_fn), org, dirn, key)

    # RNG cost probe: 10 uniform draws over the wavefront
    def rng_fn(k):
        ks = jax.random.split(k, 10)
        return sum(jax.random.uniform(kk, (r,)) for kk in ks)

    t_rng = bench("10x uniform draws", jax.jit(rng_fn), key)

    traced_per_trace = r * (icfg.max_bounces + 1) * 2  # upper bound
    print(f"\nimplied Mrays/s (upper bound): {traced_per_trace / t_tr / 1e6:.1f}")


if __name__ == "__main__":
    main()
