"""Ray-order effect on packet kernels: scanline vs 2D-Morton pixel order.
128-ray packets of consecutive scanline pixels form long thin frusta with
huge BVH unions; Morton-ordered pixels form ~11x11 blocks."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas import wide_kernel as wk

R = 1 << 18
W, H = 640, 360


def morton2(x, y):
    def ex(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x0000FFFF0000FFFF
        v = (v | (v << 8)) & 0x00FF00FF00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
        v = (v | (v << 2)) & 0x3333333333333333
        v = (v | (v << 1)) & 0x5555555555555555
        return v
    return ex(x) | (ex(y) << 1)


def main():
    scene, cam, _r, _i = examples.build("bunny")
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    real = np.nonzero((np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0)[0]
    tabs = wk.pack_tables(v0, e1, e2, [real], leaf_size=12, k=8)

    xs = np.arange(R) % (W * H)
    px, py = (xs % W).astype(np.int32), (xs // W).astype(np.int32)
    mk = morton2(px.astype(np.uint32), py.astype(np.uint32))
    mo = np.argsort(mk, kind="stable")
    ju = jnp.full((R,), 0.5)

    def rays(order):
        return cam.cast_rays(jnp.asarray(px[order]), jnp.asarray(py[order]),
                             W, H, ju, ju)

    o_scan, d_scan = rays(np.arange(R))
    o_mort, d_mort = rays(mo)

    # incoherent bounce-like rays: random origins near the mesh + cosine
    # directions; raw vs sorted by the integrator's octant+Morton key
    rng = np.random.default_rng(0)
    o_inc = (rng.uniform(-1.0, 1.0, (R, 3)) + [0, 1, 0]).astype(np.float32)
    d_inc = rng.normal(size=(R, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)
    from ptsharp_tpu.integrator import _morton_key

    mk3 = np.asarray(_morton_key(jnp.asarray(o_inc), jnp.asarray(d_inc)))
    so = np.argsort(mk3, kind="stable")

    def key_dirfine(o, d, db):
        """db bits/axis of direction (Morton-interleaved, major) + origin
        Morton (minor)."""
        dq = np.clip(((d + 1.0) * 0.5 * (1 << db)), 0,
                     (1 << db) - 1).astype(np.uint64)
        lo, hi = o.min(0), o.max(0)
        oq = np.clip((o - lo) / np.maximum(hi - lo, 1e-9) * 255, 0,
                     255).astype(np.uint64)

        def ex3(v, bits):
            out = np.zeros_like(v)
            for b in range(bits):
                out |= ((v >> b) & 1) << (3 * b)
            return out

        dkey = (ex3(dq[:, 0], db) << 2) | (ex3(dq[:, 1], db) << 1) \
            | ex3(dq[:, 2], db)
        okey = (ex3(oq[:, 0], 8) << 2) | (ex3(oq[:, 1], 8) << 1) \
            | ex3(oq[:, 2], 8)
        return (dkey << np.uint64(24)) | okey

    so_d2 = np.argsort(key_dirfine(o_inc, d_inc, 2), kind="stable")
    so_d4 = np.argsort(key_dirfine(o_inc, d_inc, 4), kind="stable")
    cases = (("scan", o_scan, d_scan), ("mort", o_mort, d_mort),
             ("incraw", jnp.asarray(o_inc), jnp.asarray(d_inc)),
             ("incsort", jnp.asarray(o_inc[so]), jnp.asarray(d_inc[so])),
             ("incd2", jnp.asarray(o_inc[so_d2]), jnp.asarray(d_inc[so_d2])),
             ("incd4", jnp.asarray(o_inc[so_d4]), jnp.asarray(d_inc[so_d4])))

    for name, entry in (("packet8", "p8"), ("v1_2048", "v1")):
        for lab, o, d in cases:
            if entry == "p8":
                f = jax.jit(lambda o, d: wk.pallas_traverse_wide8(
                    tabs.rows, tabs.leaf, o, d, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k)[0])
            else:
                f = jax.jit(lambda o, d: wk.pallas_traverse_wide(
                    tabs.rows, tabs.leaf, o, d, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k, tile=2048)[0])
            out = f(o, d)
            jax.block_until_ready(out)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(o, d))
                best = min(best, time.time() - t0)
            print(f"{name} {lab}: {R/best/1e6:7.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
