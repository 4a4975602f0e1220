"""fwd+bwd throughput A/B: remat (jax.checkpoint per scanned bounce) vs
residual-saving backward, on the bench.py grad workload (cornell 640x360).
Diagnoses VERDICT weak-point #2 (0.387x fwd+bwd)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace

W, H = 640, 360
CHUNK = 1 << 18
REPS = 8


def main():
    scene, cam, _r, icfg = examples.build("cornell")
    for remat in (False, True):
        cfg = dataclasses.replace(icfg, remat=remat)

        def loss_fn(colors, key, px, py):
            from dataclasses import replace

            mats = scene.materials._replace(color=colors)
            s = replace(scene, materials=mats)
            kj, kt = jax.random.split(key)
            ju, jv = jax.random.uniform(kj, (2, px.shape[0]))
            org, dirn = cam.cast_rays(px, py, W, H, ju, jv)
            res = trace(s, cfg, org, dirn, kt)
            return jnp.mean(res.radiance), res.rays_traced

        grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
        xs = jnp.arange(CHUNK, dtype=jnp.int32) % (W * H)
        px, py = xs % W, xs // W
        out = grad_fn(scene.materials.color, jax.random.PRNGKey(0), px, py)
        jax.block_until_ready(out)
        t0 = time.time()
        traced = 0
        for i in range(REPS):
            xs = ((jnp.arange(CHUNK, dtype=jnp.int32) + i * CHUNK)
                  % (W * H))
            _g, tr_ = grad_fn(scene.materials.color,
                              jax.random.PRNGKey(i), xs % W, xs // W)
            traced += int(tr_)
        dt = time.time() - t0
        print(f"remat={remat}: {traced/dt/1e6:7.2f} Mrays/s fwd+bwd "
              f"({dt*1e3/REPS:.0f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
