"""Round-4 fwd+bwd attribution (VERDICT item 3): with any-hit shadows the
saved NEE residual is one boolean per ray, so re-measure the remat
policies, plus fwd-only on the same shape for the bwd/fwd cost ratio.

Usage: python scripts/exp_grad3.py
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

W, H = 1920, 1080
R = 1 << 20
CHUNKS = 6


def _pix(ci):
    start = (ci * R) % (W * H)
    xs = (start + jnp.arange(R, dtype=jnp.int32)) % (W * H)
    return xs % W, xs // W


def measure(icfg, mode):
    scene, cam, _rc, icfg0 = examples.build("cornell")
    icfg = replace(icfg0, **icfg)

    def loss_fn(colors, key, px, py):
        mats = scene.materials._replace(color=colors)
        from dataclasses import replace as drep

        s = drep(scene, materials=mats)
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, R))
        org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
        res = trace(s, icfg, org, dirn, kt)
        return jnp.mean(res.radiance), res.rays_traced

    if mode == "fwd":
        fn = jax.jit(loss_fn)
    else:
        fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    px0, py0 = _pix(0)
    out = fn(scene.materials.color, jax.random.PRNGKey(9), px0, py0)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = []
    for i in range(CHUNKS):
        px, py = _pix(i)
        _g, traced = fn(scene.materials.color, jax.random.PRNGKey(i), px, py)
        outs.append(traced)
    total = sum(int(t) for t in outs)
    dt = time.time() - t0
    return total / dt / 1e6


if __name__ == "__main__":
    jobs = [
        ("fwd-only", dict(), "fwd"),
        ("grad remat=full", dict(remat=True, remat_policy="full"), "grad"),
        ("grad remat=hits", dict(remat=True, remat_policy="hits"), "grad"),
        ("grad remat=off", dict(remat=False), "grad"),
    ]
    for label, cfg, mode in jobs:
        try:
            v = measure(cfg, mode)
            print(f"GRAD3 {label}: {v:.2f} Mrays/s")
        except Exception as e:
            print(f"GRAD3 {label}: FAILED {str(e)[:140]}")
