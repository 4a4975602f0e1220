"""fwd+bwd floor attribution (round 4): ablate NEE, depth, RNG impl, and
compaction to name where the 3x-of-forward gradient cost lives.

Usage: python scripts/exp_grad4.py <variant>
  variants: base nee_off depth2 rbg compact
(each variant runs in its own process — the PRNG impl is global config)
"""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

variant = sys.argv[1] if len(sys.argv) > 1 else "base"

import jax

if variant == "rbg":
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace, trace_compacted_static

W, H = 1920, 1080
R = 1 << 20
CHUNKS = 6


def _pix(ci):
    start = (ci * R) % (W * H)
    xs = (start + jnp.arange(R, dtype=jnp.int32)) % (W * H)
    return xs % W, xs // W


def main():
    scene, cam, _rc, icfg = examples.build("cornell")
    if variant == "nee_off":
        icfg = replace(icfg, direct_lighting=False)
    elif variant == "depth2":
        icfg = replace(icfg, max_bounces=2)
    elif variant == "compact_nore":
        icfg = replace(icfg, remat=False)
    elif variant == "compact_hits":
        icfg = replace(icfg, remat_policy="hits")
    tracer = (trace_compacted_static
              if variant.startswith("compact") else trace)

    def loss_fn(colors, key, px, py):
        mats = scene.materials._replace(color=colors)
        s = replace(scene, materials=mats)
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, R))
        org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
        res = tracer(s, icfg, org, dirn, kt)
        return jnp.mean(res.radiance), res.rays_traced

    fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    px0, py0 = _pix(0)
    out = fn(scene.materials.color, jax.random.PRNGKey(9), px0, py0)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = []
    for i in range(CHUNKS):
        px, py = _pix(i)
        _g, traced = fn(scene.materials.color, jax.random.PRNGKey(i),
                        px, py)
        outs.append(traced)
    total = sum(int(t) for t in outs)
    dt = time.time() - t0
    print(f"GRAD4 {variant}: {total / dt / 1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()


# extra variants appended round 4: compaction combined with remat modes
# (compact alone measured 35.3; does skipping remat help at the reduced
# tail widths?)
