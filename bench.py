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
             BVH traversal (the hottest kernel). Uses the 8-packet Pallas
             traversal kernel (pallas/wide_kernel.py) with XLA-walk
             fallbacks.
  grad     — forward+backward differentiable render step (north star:
             "forward+backward kernels at speed-of-light per chip").

COMPILE RELIABILITY (scripts/exp_sigill2.py): fusing camera ray-gen + RNG
into the same jit program as a mesh trace SIGILLs this image's tunnel
compile helper at every wavefront size; with ray-gen in its OWN jit
program every size compiles. Mesh configs therefore split the two
programs, and every config walks a fallback ladder of (intersector,
chunk-size) shapes so a compile failure degrades to a smaller recorded
number instead of an error row.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 62.5  # 1 Grays/s / 16 chips (BASELINE.json target)


def _log_builder(scene_name):
    """Record WHICH BVH builder produced this scene's tables (stderr note;
    round-4 verdict: nothing recorded whether the benched tables were SAH
    or Morton, so the builder-quality lever could not be ranked)."""
    import sys

    from ptsharp_tpu.accel import bvh as bvh_mod

    print(json.dumps({
        "note": "bvh_builder", "scene": scene_name,
        "last": bvh_mod.last_builder,
        "counts": dict(bvh_mod.build_counts),
    }), file=sys.stderr)


def _pixel_chunk(ci, pix_per_chunk, width, height):
    n_pixels = width * height
    start = (ci * pix_per_chunk) % n_pixels
    xs = (start + jnp.arange(pix_per_chunk, dtype=jnp.int32)) % n_pixels
    return xs % width, xs // width


def _morton_pixel_order(width, height):
    """Pixel indices in 2D-Morton order: every 1024-ray traversal packet
    covers a compact ~32x32 pixel block instead of a thin scanline strip
    (smaller BVH visit-unions; +50% measured, scripts/exp_rayorder.py)."""
    import numpy as np

    x = np.arange(width, dtype=np.uint64)[None, :]
    y = np.arange(height, dtype=np.uint64)[:, None]

    def ex(v):
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    key = (ex(x) | (ex(y) << np.uint64(1))).reshape(-1)
    return jnp.asarray(np.argsort(key, kind="stable").astype(np.int32))


def run_scene(name, width=1920, height=1080, spp=64, max_measured_chunks=16,
              shift=20, split_raygen=False, compacted=False, **scene_kw):
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import trace, trace_compacted_static

    scene, cam, _rcfg, icfg = examples.build(name, **scene_kw)
    _log_builder(name)
    tracer = trace_compacted_static if compacted else trace
    pix_per_chunk = 1 << shift

    # Closure-capture the scene when its tables are SMALL: XLA constant-
    # folds closure scenes (cornell measured 74 vs 52 Mrays/s as a traced
    # arg). Big scenes (dragon_hd fat table ~286 MB) must ride as traced
    # args or the remote compile request blows up (HTTP 413, round 4).
    scene_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(scene)
        if hasattr(x, "size"))
    scene_as_arg = scene_bytes > 48 * 1024 * 1024
    if split_raygen:
        morder = _morton_pixel_order(width, height)

        @jax.jit
        def gen(key, ci):
            kj, kt = jax.random.split(key)
            start = (ci * pix_per_chunk) % (width * height)
            xs = (start + jnp.arange(pix_per_chunk, dtype=jnp.int32)) \
                % (width * height)
            xs = morder[xs]
            px, py = xs % width, xs // width
            ju, jv = jax.random.uniform(kj, (2, pix_per_chunk))
            org, dirn = cam.cast_rays(px, py, width, height, ju, jv)
            return org, dirn, kt

        if scene_as_arg:
            @jax.jit
            def tr(scn, org, dirn, kt):
                result = tracer(scn, icfg, org, dirn, kt)
                return jnp.sum(result.radiance), result.rays_traced

            def render_chunk(key, ci):
                org, dirn, kt = gen(key, jnp.int32(ci))
                return tr(scene, org, dirn, kt)
        else:
            @jax.jit
            def tr(org, dirn, kt):
                result = tracer(scene, icfg, org, dirn, kt)
                return jnp.sum(result.radiance), result.rays_traced

            def render_chunk(key, ci):
                org, dirn, kt = gen(key, jnp.int32(ci))
                return tr(org, dirn, kt)
    else:
        def _chunk_rays(key, ci):
            kj, kt = jax.random.split(key)
            start = (ci * pix_per_chunk) % (width * height)
            xs = (start + jnp.arange(pix_per_chunk, dtype=jnp.int32)) \
                % (width * height)
            px, py = xs % width, xs // width
            ju, jv = jax.random.uniform(kj, (2, pix_per_chunk))
            org, dirn = cam.cast_rays(px, py, width, height, ju, jv)
            return org, dirn, kt

        if scene_as_arg:
            @jax.jit
            def _render_chunk(scn, key, ci):
                org, dirn, kt = _chunk_rays(key, ci)
                result = tracer(scn, icfg, org, dirn, kt)
                return jnp.sum(result.radiance), result.rays_traced

            def render_chunk(key, ci):
                return _render_chunk(scene, key, ci)
        else:
            @jax.jit
            def render_chunk(key, ci):
                org, dirn, kt = _chunk_rays(key, ci)
                result = tracer(scene, icfg, org, dirn, kt)
                return jnp.sum(result.radiance), result.rays_traced

    out = render_chunk(jax.random.PRNGKey(999), 0)
    jax.block_until_ready(out)

    total_rays_primary = width * height * spp
    n_chunks = max(1, total_rays_primary // pix_per_chunk)
    measured = min(n_chunks, max_measured_chunks)
    t0 = time.time()
    outs = []
    for i in range(measured):
        _s, traced = render_chunk(jax.random.PRNGKey(i), i)
        outs.append(traced)
    total_traced = sum(int(t) for t in outs)  # blocks once at the end
    dt = time.time() - t0
    return total_traced / dt / 1e6


def run_grad(width=1920, height=1080, chunks=8, mode="tape"):
    """Forward+backward Mrays/s: gradient of the mean image luminance w.r.t.
    the material table (the differentiable train-step shape of
    parallel/shard.py). 1M-ray chunks dispatched without blocking — the
    same pipelining the fwd-only metric gets.

    mode="tape": analytic tape backward (tape.py custom_vjp) — the
    backward replays a ~10-scalar/ray/depth tape pointwise instead of
    re-running traversal+shading through AD (round-5, VERDICT item 2).
    mode="ad": AD through the sync-free compacted trace (the round-4
    path: reservoir compaction measured 35.3 vs 26.6 plain)."""
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import trace_compacted_static
    from ptsharp_tpu.tape import trace_tape_radiance

    scene, cam, _rcfg, icfg = examples.build("cornell")
    pix_per_chunk = 1 << 20
    tracer = trace_tape_radiance if mode == "tape" else trace_compacted_static

    from dataclasses import replace

    def loss_fn(colors, key, pix_x, pix_y):
        mats = scene.materials._replace(color=colors)
        s = replace(scene, materials=mats)
        r = pix_x.shape[0]
        kj, kt = jax.random.split(key)
        ju, jv = jax.random.uniform(kj, (2, r))
        org, dirn = cam.cast_rays(pix_x, pix_y, width, height, ju, jv)
        result = tracer(s, icfg, org, dirn, kt)
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


def run_closest_hit(name, r=1 << 20, chunks=4, **scene_kw):
    """Coherent closest-hit throughput (Morton-ordered primaries) — the
    raw traversal metric for large meshes whose full trace would swamp the
    bench budget (dragon_hd: 1.3M tris)."""
    from ptsharp_tpu import examples
    from ptsharp_tpu.intersect import closest_hit

    scene, cam, _rcfg, _icfg = examples.build(name, **scene_kw)
    _log_builder(name)
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(7)

    @jax.jit
    def gen(ci):
        start = (ci * r) % (w * h)
        xs = morder[(start + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
        px, py = xs % w, xs // w
        ju, jv = jax.random.uniform(jax.random.fold_in(key, ci), (2, r))
        return cam.cast_rays(px, py, w, h, ju, jv)

    # scene rides as a traced argument, NOT a closure constant: closure
    # capture embeds the tables in the program and the remote compile
    # request (dragon_hd's fat table is ~280 MB -> HTTP 413)
    @jax.jit
    def ch(scn, org, dirn):
        hit = closest_hit(scn, org, dirn)
        return jnp.sum(hit.t * (hit.t < 1e9))

    rays = [gen(jnp.int32(i)) for i in range(chunks)]
    jax.block_until_ready(rays)
    out = ch(scene, *rays[0])
    jax.block_until_ready(out)

    # correctness gate: a miscompiled fast path must never record a
    # number — compare a 4096-ray sample against the XLA wide walk and
    # fail the ladder rung on mismatch (a compiled-Pallas wrong-result
    # regression was caught exactly this way in round 4)
    if scene.intersector != "wide":
        ref_scene, _c2, _r2, _i2 = examples.build(name)
        o_s, d_s = (rays[0][0][:4096], rays[0][1][:4096])
        t_fast = closest_hit(scene, o_s, d_s).t
        t_ref = closest_hit(ref_scene, o_s, d_s).t
        ok = jnp.mean((jnp.abs(t_fast - t_ref) < 1e-3).astype(jnp.float32))
        if float(ok) < 0.999:
            raise RuntimeError(
                f"{name}: fast intersector disagrees with wide walk on "
                f"{(1 - float(ok)) * 100:.2f}% of sample rays")
    t0 = time.time()
    outs = [ch(scene, *c) for c in rays]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    return chunks * r / dt / 1e6


def run_ladder(ladder, repeats=3):
    """Try benchmark shapes in order; the first that runs is repeated
    `repeats` times (compiles cache after the first) and the MEDIAN is
    reported with the min/max spread — tunnel run-to-run variance has
    measured same-day swings of 1.5x+, so a single sample is noise."""
    last_err = None
    for label, fn in ladder:
        try:
            vals = [fn()]
        except Exception as e:  # noqa: BLE001 — record and fall through
            last_err = f"{label}: {str(e)[:120]}"
            continue
        for _ in range(repeats - 1):
            try:
                vals.append(fn())
            except Exception:  # noqa: BLE001 — keep what we have
                break
        vals.sort()
        med = vals[len(vals) // 2] if len(vals) % 2 else 0.5 * (
            vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
        return med, vals, label, last_err
    raise RuntimeError(last_err or "empty ladder")


def main():
    jobs = [
        (
            "Mrays_per_s_per_chip_cornell_1080p",
            [
                # compacted trace measured 86.9 vs 103.0 plain at this
                # pipelined 1M-chunk shape (compaction wins in the GRAD
                # step where dead lanes cost double, not here)
                ("cornell/1M", lambda: run_scene("cornell")),
                ("cornell/256k", lambda: run_scene("cornell", shift=18)),
            ],
        ),
        (
            "Mrays_per_s_per_chip_bunny82k_1080p",
            [
                # 256k chunks beat 1M (1.85 vs 1.68 measured): the larger
                # wavefront's per-bounce argsorts cost more than the saved
                # ~24 ms dispatches. compacted=True engages the no-RR
                # reservoir schedule (round-5: 2.37 vs 1.79 plain — the
                # depth profile showed ~40% of the trace was fixed-width
                # work on dead lanes) on top of the ordered-stack kernel.
                ("bunny/pallas8/256k/compact", lambda: run_scene(
                    "bunny", shift=18, max_measured_chunks=8,
                    split_raygen=True, intersector="pallas", wide_k=8,
                    compacted=True)),
                ("bunny/pallas8/256k", lambda: run_scene(
                    "bunny", shift=18, max_measured_chunks=8,
                    split_raygen=True, intersector="pallas", wide_k=8)),
                ("bunny/wide/256k", lambda: run_scene(
                    "bunny", shift=18, max_measured_chunks=8,
                    split_raygen=True)),
                ("bunny/wide/64k", lambda: run_scene(
                    "bunny", shift=16, max_measured_chunks=8,
                    split_raygen=True)),
            ],
        ),
        (
            # dragon END-TO-END (the reference renders its dragon fully,
            # Example.cs:977-995): full trace with NEE at HBM-table scale
            # through the fat-row streaming kernels
            "Mrays_per_s_per_chip_dragon_full_trace",
            [
                ("dragon_hd/full/256k/compact", lambda: run_scene(
                    "dragon_hd", shift=18, max_measured_chunks=4,
                    split_raygen=True, intersector="pallas", wide_k=8,
                    compacted=True)),
                ("dragon_hd/full/256k", lambda: run_scene(
                    "dragon_hd", shift=18, max_measured_chunks=4,
                    split_raygen=True, intersector="pallas", wide_k=8)),
            ],
        ),
        (
            "Mrays_per_s_fwd_bwd_cornell",
            [
                ("grad/tape/1M", lambda: run_grad(mode="tape")),
                ("grad/ad/1M", lambda: run_grad(mode="ad")),
            ],
        ),
        (
            "Mrays_per_s_closest_hit_dragon1p3M",
            [
                ("dragon_hd/pallas8/1M", lambda: run_closest_hit(
                    "dragon_hd", intersector="pallas", wide_k=8)),
                ("dragon_hd/wide/1M", lambda: run_closest_hit("dragon_hd")),
            ],
        ),
    ]
    results = []
    for metric, ladder in jobs:
        try:
            mrays, vals, shape, warn = run_ladder(ladder)
            row = {
                "metric": metric,
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 3),
                "shape": shape,
                "runs": [round(v, 2) for v in vals],
                "min": round(min(vals), 2),
                "max": round(max(vals), 2),
            }
            if warn:
                row["fallback_from"] = warn
            results.append(row)
        except Exception as e:  # pragma: no cover
            results.append({"metric": metric, "error": str(e)[:200]})
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
