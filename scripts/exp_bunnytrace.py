"""Full bunny trace on TPU: wide walk vs pallas v1 vs pallas packet8.

Ray-gen is a SEPARATE jit program: fusing cast_rays+RNG into the trace
program SIGILLs the tunnel compiler at every size (scripts/exp_sigill2.py).
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
SHIFT = 18
R = 1 << SHIFT


def bench(label, scene, cam, icfg, n_chunks=8):
    @jax.jit
    def gen(key, ci):
        kj, kt = jax.random.split(key)
        xs = (ci * R + jnp.arange(R, dtype=jnp.int32)) % (W * H)
        px, py = xs % W, xs // W
        ju, jv = jax.random.uniform(kj, (2, R))
        org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
        return org, dirn, kt

    @jax.jit
    def tr(org, dirn, kt):
        res = trace(scene, icfg, org, dirn, kt)
        return jnp.sum(res.radiance), res.rays_traced

    try:
        t0 = time.time()
        o, d, kt = gen(jax.random.PRNGKey(0), jnp.int32(0))
        out = tr(o, d, kt)
        jax.block_until_ready(out)
        tc = time.time() - t0
        t0 = time.time()
        outs = []
        for i in range(n_chunks):
            o, d, kt = gen(jax.random.PRNGKey(i), jnp.int32(i))
            _s, traced = tr(o, d, kt)
            outs.append(traced)
        total = sum(int(t) for t in outs)
        dt = time.time() - t0
        print(f"{label}: compile {tc:.0f}s  {total/dt/1e6:.2f} Mrays/s "
              f"({total} rays / {dt:.2f}s)", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:120]}", flush=True)


def main():
    for label, kw in (
        ("wide k4 ", dict()),
        ("pallas k8", dict(intersector="pallas", wide_k=8)),
    ):
        scene, cam, _r, icfg = examples.build("bunny", **kw)
        bench(label, scene, cam, icfg)
    # packet8 via a patched dispatch: monkey-select kernel8
    from ptsharp_tpu.pallas import wide_kernel as wk

    orig = wk.pallas_traverse_wide

    def wide8(rows, leaf, org, dirn, t_max, base, end, leaf_size, k,
              **kwargs):
        return wk.pallas_traverse_wide8(rows, leaf, org, dirn, t_max,
                                        base, end, leaf_size, k)

    wk.pallas_traverse_wide = wide8
    try:
        scene, cam, _r, icfg = examples.build(
            "bunny", intersector="pallas", wide_k=8)
        bench("packet8 k8", scene, cam, icfg)
    finally:
        wk.pallas_traverse_wide = orig


if __name__ == "__main__":
    main()
