"""Benchmark harness: Mrays/s/chip at 1080p.

Prints one JSON line per benchmark config (the headline first):
  {"metric": "Mrays_per_s_per_chip_cornell_1080p", "value": N,
   "unit": "Mrays/s", "vs_baseline": N}
  {"metric": "Mrays_per_s_per_chip_bunny82k_1080p", ...}
  {"metric": "Mrays_per_s_fwd_bwd_cornell", ...}

vs_baseline measures against the BASELINE.json per-chip target implied by
">= 1 Grays/s aggregate on v5e-16": 1000/16 = 62.5 Mrays/s/chip.

Configs:
  cornell  — BASELINE config #2 (area-light NEE, specular/refractive
             spheres); analytic primitives only.
  bunny    — BASELINE config #3: 81,920-triangle textured mesh, flattened
             BVH traversal (the hottest kernel).
  grad     — forward+backward differentiable render step (north star:
             "forward+backward kernels at speed-of-light per chip").

Chunks cycle over *distinct* pixel blocks so the whole image contributes
(no fixed-row re-tracing); a warmup pass excludes compile time. Chunks are
dispatched without per-chunk blocking so device work pipelines — the
renderer drives the device the same way.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 62.5  # 1 Grays/s / 16 chips (BASELINE.json target)


def _pixel_chunk(ci, pix_per_chunk, width, height):
    n_pixels = width * height
    start = (ci * pix_per_chunk) % n_pixels
    xs = (start + jnp.arange(pix_per_chunk, dtype=jnp.int32)) % n_pixels
    return xs % width, xs // width


def run_scene(name, width=1920, height=1080, spp=64, max_measured_chunks=16,
              **scene_kw):
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import trace

    scene, cam, _rcfg, icfg = examples.build(name, **scene_kw)

    pix_per_chunk = 1 << 20

    @jax.jit
    def render_chunk(key, pix_x, pix_y):
        r = pix_x.shape[0]
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, r))
        org, dirn = cam.cast_rays(pix_x, pix_y, width, height, ju, jv)
        result = trace(scene, icfg, org, dirn, kt)
        return jnp.sum(result.radiance), result.rays_traced

    px0, py0 = _pixel_chunk(0, pix_per_chunk, width, height)
    out = render_chunk(jax.random.PRNGKey(999), px0, py0)
    jax.block_until_ready(out)

    total_rays_primary = width * height * spp
    n_chunks = max(1, total_rays_primary // pix_per_chunk)
    measured = min(n_chunks, max_measured_chunks)
    t0 = time.time()
    outs = []
    for i in range(measured):
        px, py = _pixel_chunk(i, pix_per_chunk, width, height)
        _s, traced = render_chunk(jax.random.PRNGKey(i), px, py)
        outs.append(traced)
    total_traced = sum(int(t) for t in outs)  # blocks once at the end
    dt = time.time() - t0
    return total_traced / dt / 1e6


def run_grad(width=640, height=360, chunks=8):
    """Forward+backward Mrays/s: gradient of the mean image luminance w.r.t.
    the material table (the differentiable train-step shape of
    parallel/shard.py)."""
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import trace

    scene, cam, _rcfg, icfg = examples.build("cornell")
    pix_per_chunk = 1 << 18

    from dataclasses import replace

    def loss_fn(colors, key, pix_x, pix_y):
        mats = scene.materials._replace(color=colors)
        s = replace(scene, materials=mats)
        r = pix_x.shape[0]
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, r))
        org, dirn = cam.cast_rays(pix_x, pix_y, width, height, ju, jv)
        result = trace(s, icfg, org, dirn, kt)
        return jnp.mean(result.radiance), result.rays_traced

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    px0, py0 = _pixel_chunk(0, pix_per_chunk, width, height)
    out = grad_fn(scene.materials.color, jax.random.PRNGKey(99), px0, py0)
    jax.block_until_ready(out)

    t0 = time.time()
    outs = []
    for i in range(chunks):
        px, py = _pixel_chunk(i, pix_per_chunk, width, height)
        _g, traced = grad_fn(scene.materials.color, jax.random.PRNGKey(i), px, py)
        outs.append(traced)
    total = sum(int(t) for t in outs)
    dt = time.time() - t0
    # rays_traced counts forward rays; backward replays them, so report
    # forward-equivalent throughput of the fused fwd+bwd step
    return total / dt / 1e6


def main():
    results = []
    for metric, fn in [
        ("Mrays_per_s_per_chip_cornell_1080p", lambda: run_scene("cornell")),
        ("Mrays_per_s_per_chip_bunny82k_1080p",
         lambda: run_scene("bunny", max_measured_chunks=6)),
        ("Mrays_per_s_fwd_bwd_cornell", run_grad),
    ]:
        try:
            mrays = fn()
            results.append(
                {
                    "metric": metric,
                    "value": round(mrays, 2),
                    "unit": "Mrays/s",
                    "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 3),
                }
            )
        except Exception as e:  # pragma: no cover
            results.append({"metric": metric, "error": str(e)[:200]})
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
