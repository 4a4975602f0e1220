"""trace vs trace_compacted_static on cornell RR d8 (the compaction
default decision), plus a dragon_hd (1.3M tris) closest-hit number."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import (IntegratorConfig, trace,
                                    trace_compacted_static)

R = 1 << 20


def main():
    scene, cam, _r, _i = examples.build("cornell")
    icfg = IntegratorConfig(max_bounces=8, russian_roulette=True,
                            rr_start_depth=2)
    w, h = 1920, 1080
    xs = jnp.arange(R, dtype=jnp.int32)
    px, py = xs % w, (xs // w) % h
    kj, kt = jax.random.split(jax.random.PRNGKey(0))
    ju, jv = jax.random.uniform(kj, (2, R))
    org, dirn = cam.cast_rays(px, py, w, h, ju, jv)

    for lab, f in (("plain ", trace), ("static", trace_compacted_static)):
        g = jax.jit(lambda o, d, k, f=f: f(scene, icfg, o, d, k))
        res = g(org, dirn, kt)
        jax.block_until_ready(res.radiance)
        best = 1e9
        for i in range(3):
            t0 = time.time()
            r2 = g(org, dirn, jax.random.fold_in(kt, i))
            jax.block_until_ready(r2.radiance)
            best = min(best, time.time() - t0)
        traced = int(res.rays_traced)
        print(f"cornell RR d8 {lab}: {traced/best/1e6:7.2f} Mrays/s "
              f"({traced} rays, {best*1e3:.0f} ms)", flush=True)

    # dragon-scale closest-hit (wide walk; pallas tables exceed VMEM)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        scene2, cam2, _r2, _i2 = examples.build("dragon_hd")
    w2, h2 = 960, 540
    R2 = 1 << 18
    xs2 = jnp.arange(R2, dtype=jnp.int32) % (w2 * h2)
    ju2 = jnp.full((R2,), 0.5)
    o2, d2 = cam2.cast_rays(xs2 % w2, xs2 // w2, w2, h2, ju2, ju2)
    from ptsharp_tpu.intersect import closest_hit

    g2 = jax.jit(lambda o, d: closest_hit(scene2, o, d).t)
    t = g2(o2, d2)
    jax.block_until_ready(t)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g2(o2, d2))
        best = min(best, time.time() - t0)
    import numpy as np
    nh = int((np.asarray(t) < 1e8).sum())
    print(f"dragon_hd 1.3M tris closest-hit: {R2/best/1e6:7.2f} Mrays/s "
          f"(hits {nh}/{R2})", flush=True)


if __name__ == "__main__":
    main()
