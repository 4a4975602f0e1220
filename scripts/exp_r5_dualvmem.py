"""Round-5: can the dual-packet pipelined FAT kernel (HBM DMA) beat the
direct-VMEM ordered kernel on bunny-scale tables? The VMEM kernel's per
iteration serial chain includes two dynamic row loads (node + leaf) per
group; the dual-fat kernel replaces them with one DMA whose latency
hides behind the other packet's slab+descent+MT. If DMA-over-VMEM wins,
the bunny bounce wall moves without touching the traversal order.

Usage: python scripts/exp_r5_dualvmem.py [r_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(r=1 << 18, reps=5):
    from bench import _morton_pixel_order
    from ptsharp_tpu import examples
    from ptsharp_tpu.integrator import _morton_key
    from ptsharp_tpu.intersect import closest_hit
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok

    scene, cam, _rc, icfg = examples.build("bunny", intersector="pallas",
                                           wide_k=8)
    assert not scene.p_hbm, "bunny should be VMEM-resident"
    rows, leaf = scene.p_rows, scene.p_leaf
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    fat = jnp.asarray(hk.pack_fat(np.asarray(rows), np.asarray(leaf), ls))
    print(f"tables: rows {rows.shape} leaf {leaf.shape} "
          f"fat {fat.shape} = {fat.size * 4 / 1e6:.1f} MB", flush=True)

    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)
    xs = morder[jnp.arange(r, dtype=jnp.int32) % (w * h)]
    px, py = xs % w, xs // w
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
        px, py, w, h, ju, jv)

    @jax.jit
    def mk_bounce(scn, o, d, key):
        hit = closest_hit(scn, o, d)
        t = jnp.where(hit.t < 1e9, hit.t, 2.0)
        p = o + d * (t[:, None] * 0.999)
        kd = jax.random.normal(key, d.shape)
        nd = kd / jnp.linalg.norm(kd, axis=1, keepdims=True)
        mk = _morton_key(p, nd)
        perm = jnp.argsort(mk)
        return p[perm], nd[perm]

    bo, bd = mk_bounce(scene, org, dirn, key)
    jax.block_until_ready((bo, bd))

    @jax.jit
    def f_vmem(o, d):
        t, s, _, _ = ok.pallas_traverse_ordered8(
            rows, leaf, o, d, 1e9, 0, end, ls, k, order_mode="near")
        return t.sum(), s.sum()

    @jax.jit
    def f_fat_pipe(ft, o, d):
        t, s, _, _ = ok.pallas_traverse_ordered8_fat(
            ft, o, d, 1e9, 0, end, ls, k, order_mode="near",
            pipelined=True)
        return t.sum(), s.sum()

    @jax.jit
    def f_fat_gate(ft, o, d):
        t, s, _, _ = ok.pallas_traverse_ordered8_fat(
            ft, o, d, 1e9, 0, end, ls, k, order_mode="near",
            pipelined=True, mt_gate=True)
        return t.sum(), s.sum()

    @jax.jit
    def f_fat_dual(ft, o, d):
        t, s, _, _ = ok.pallas_traverse_ordered8_fat_dual(
            ft, o, d, 1e9, 0, end, ls, k)
        return t.sum(), s.sum()

    cands = [
        ("ord-vmem (prod)", lambda o, d: f_vmem(o, d)),
        ("ord-fat-pipe", lambda o, d: f_fat_pipe(fat, o, d)),
        ("ord-fat-gate", lambda o, d: f_fat_gate(fat, o, d)),
        ("ord-fat-dual", lambda o, d: f_fat_dual(fat, o, d)),
    ]
    for label, (o, d) in (("primaries", (org, dirn)),
                          ("bounce-sorted", (bo, bd))):
        times = {n: [] for n, _ in cands}
        for rep in range(reps):
            for n, f in cands:
                try:
                    times[n].append(timeit(f, o, d, iters=2))
                except Exception as e:
                    print(f"{label} {n}: FAIL {str(e)[:130]}", flush=True)
                    times[n].append(float("inf"))
        for n, _ in cands:
            v = sorted(times[n])
            med = v[len(v) // 2]
            print(f"{label:14s} {n:16s}: {r/med/1e6:7.2f} Mrays/s "
                  f"[{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]", flush=True)

    # parity gate on-chip
    t0 = f_vmem(bo[:8192], bd[:8192])[0]
    t1 = f_fat_dual(fat, bo[:8192], bd[:8192])[0]
    print("sum parity vmem-vs-dual:", float(t0), float(t1), flush=True)


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    main(r=1 << r)
