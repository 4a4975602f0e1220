"""Benchmark harness: Mrays/s/chip on the Cornell flagship scene.

Prints ONE JSON line:
  {"metric": "Mrays_per_s_per_chip_cornell_1080p",
   "value": N, "unit": "Mrays/s", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json per-chip target implied
by ">= 1 Grays/s aggregate on v5e-16": 1000/16 = 62.5 Mrays/s/chip.
Runs on the default backend (the TPU tunnel when present); a warmup pass
excludes compile time from the measurement.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 62.5  # 1 Grays/s / 16 chips (BASELINE.json target)


def run(width=1920, height=1080, spp=64, warmup_spp=4):
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import trace
    from ptsharp_tpu.camera import Camera

    scene, cam, _rcfg, icfg = examples.build("cornell")

    rays_per_chunk = 1 << 20
    n_pixels = width * height
    total_rays_primary = n_pixels * spp

    @jax.jit
    def render_chunk(key, pix_x, pix_y):
        r = pix_x.shape[0]
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, r))
        org, dirn = cam.cast_rays(pix_x, pix_y, width, height, ju, jv)
        result = trace(scene, icfg, org, dirn, kt)
        return jnp.sum(result.radiance), result.rays_traced

    # chunk = a block of pixels x samples
    pix_per_chunk = rays_per_chunk
    xs = jnp.arange(pix_per_chunk, dtype=jnp.int32)
    pix_x = xs % width
    pix_y = (xs // width) % height

    # warmup (compile)
    out = render_chunk(jax.random.PRNGKey(999), pix_x, pix_y)
    jax.block_until_ready(out)

    n_chunks = max(1, total_rays_primary // pix_per_chunk)
    # measure a capped number of chunks and extrapolate (full 1080p@64spp is
    # 132M primary rays; timing stabilizes after a few chunks). Chunks are
    # dispatched without per-chunk blocking so device work pipelines — the
    # renderer runs the same way.
    measured_chunks = min(n_chunks, 16)
    t0 = time.time()
    outs = []
    for i in range(measured_chunks):
        s, traced = render_chunk(jax.random.PRNGKey(i), pix_x, pix_y)
        outs.append(traced)
    total_traced = sum(int(t) for t in outs)  # blocks once at the end
    dt = time.time() - t0
    mrays = total_traced / dt / 1e6
    return mrays, total_traced, dt


def main():
    mrays, traced, dt = run()
    print(
        json.dumps(
            {
                "metric": "Mrays_per_s_per_chip_cornell_1080p",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
