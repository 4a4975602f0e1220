"""Fat-row HBM kernel variants on dragon_hd (1.3M tris, ~240 MB fat
table): preorder skip-walk (round-4 production) vs ordered-stack vs
ordered-stack + pipelined DMA (next fetch starts before the MT unroll).

Modes: parity (CPU interpret, small soup forced through pack_fat),
raw (on-chip dragon closest-hit + sorted bounce-like rays).
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


def run_parity():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk

    rng = np.random.default_rng(1)
    v0 = rng.uniform(-1, 1, (800, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (800, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (800, 3)).astype(np.float32)
    inst = [(0, 800, np.eye(4, dtype=np.float32)[:3], 0)]
    rows, leaf, st, si = wk.pack_flat_tables(v0, e1, e2, inst, 12, 8)
    fat = jnp.asarray(hk.pack_fat(rows, leaf, 12))
    end = rows.shape[0]
    r = 2048
    org = rng.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(org), jnp.asarray(d)
    t0, s0, _, _ = wk.pallas_traverse_wide8(
        jnp.asarray(rows), jnp.asarray(leaf), o_j, d_j, 1e9,
        0, end, 12, 8, interpret=True)
    tf, sf, _, _ = hk.pallas_traverse_hbm8_fat(
        fat, o_j, d_j, 1e9, 0, end, 12, 8, interpret=True)
    print("fat-preorder parity:", np.allclose(t0, tf, atol=1e-4),
          np.array_equal(np.asarray(s0), np.asarray(sf)))
    for pl_ in (False, True):
        t1, s1, _, _ = ok.pallas_traverse_ordered8_fat(
            fat, o_j, d_j, 1e9, 0, end, 12, 8, interpret=True,
            order_mode="near", pipelined=pl_)
        print(f"ord-fat pipelined={pl_} parity:",
              np.allclose(t0, t1, atol=1e-4),
              np.array_equal(np.asarray(s0), np.asarray(s1)))


def run_raw(r=1 << 20, reps=4):
    from bench import _morton_pixel_order
    from ptsharp_tpu import examples
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok

    scene, cam, _rc, icfg = examples.build("dragon_hd", intersector="pallas",
                                           wide_k=8)
    assert scene.p_hbm, "expected HBM fat tables"
    fat = scene.p_rows
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    print("fat table:", fat.shape, f"{fat.size * 4 / 1e6:.0f} MB",
          "stack bound n/a (fat)")
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)
    xs = morder[jnp.arange(r, dtype=jnp.int32) % (w * h)]
    px, py = xs % w, xs // w
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
        px, py, w, h, ju, jv)
    jax.block_until_ready((org, dirn))

    # bounce-like rays: reflect primaries off their hits (cheap proxy:
    # random cosine directions from hit points), Morton-sorted
    from ptsharp_tpu.integrator import _morton_key
    from ptsharp_tpu.intersect import closest_hit

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

    def mk(fn, **kw):
        @jax.jit
        def f(ft, o, d):
            t, s, _, _ = fn(ft, o, d, 1e9, 0, end, ls, k, **kw)
            return t.sum(), s.sum()
        return f

    all_cands = [
        ("fat-preorder", mk(hk.pallas_traverse_hbm8_fat)),
        ("ord-fat", mk(ok.pallas_traverse_ordered8_fat,
                       order_mode="near", pipelined=False)),
        ("ord-fat-pipe", mk(ok.pallas_traverse_ordered8_fat,
                            order_mode="near", pipelined=True)),
        ("ord-fat-dual", mk(ok.pallas_traverse_ordered8_fat_dual)),
        ("ord-fat-mtgate", mk(ok.pallas_traverse_ordered8_fat,
                              order_mode="near", pipelined=True,
                              mt_gate=True)),
        ("ord-fat-dual-gate", mk(ok.pallas_traverse_ordered8_fat_dual,
                                 mt_gate=True)),
        ("ord-fat-bothgate", mk(ok.pallas_traverse_ordered8_fat,
                                order_mode="near", pipelined=True,
                                mt_gate=True, desc_gate=True)),
    ]
    only = os.environ.get("ORDFAT_ONLY", "")
    cands = ([c for c in all_cands if c[0] in only.split(",")]
             if only else all_cands)
    times = {n: [] for n, _ in cands}
    for label, rays in (("primaries", (org, dirn)),
                        ("bounce-sorted", (bo, bd))):
        o, d = rays
        for n, f in cands:
            times[n] = []
        for rep in range(reps):
            for n, f in cands:
                try:
                    times[n].append(timeit(f, fat, o, d, iters=2))
                except Exception as e:
                    print(f"{label} {n}: FAIL {str(e)[:130]}", flush=True)
                    times[n].append(float("inf"))
        for n, _ in cands:
            v = sorted(times[n])
            med = v[len(v) // 2]
            print(f"{label:14s} {n:13s}: {r/med/1e6:7.2f} Mrays/s "
                  f"[{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]", flush=True)

    # correctness gate on-chip: ord-fat-pipe vs fat-preorder
    f0 = jax.jit(lambda ft, o, d: hk.pallas_traverse_hbm8_fat(
        ft, o, d, 1e9, 0, end, ls, k)[0])
    f1 = jax.jit(lambda ft, o, d: ok.pallas_traverse_ordered8_fat(
        ft, o, d, 1e9, 0, end, ls, k, order_mode="near", pipelined=True)[0])
    a = f0(fat, org[:8192], dirn[:8192])
    b = f1(fat, org[:8192], dirn[:8192])
    print("on-chip parity (pipe):",
          float(jnp.mean((jnp.abs(a - b) < 1e-3).astype(jnp.float32))))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        run_parity()
    else:
        run_raw()
