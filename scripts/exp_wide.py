"""Measure the K-wide walk vs the binary packed walk on the 82k-tri bunny
(real image coverage, coherent primaries + incoherent bounce-like rays).

Run on the tunnel TPU: python scripts/exp_wide.py [K ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel.traverse import (
    traverse_packed_chunked,
    traverse_wide_chunked,
)
from ptsharp_tpu.core import vec

R = 1 << 18


def sync(x):
    return float(jnp.asarray(x).sum())


def bench(name, f, o, d, reps=3):
    try:
        t = f(o, d)
        sync(t)
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            t = f(o, d)
            sync(t)
            best = min(best, time.time() - t0)
        nh = int((np.asarray(t) < 1e8).sum())
        print(f"{name:24s} {best*1e3:8.1f} ms {R/best/1e6:7.2f} Mrays/s "
              f"hits={nh}", flush=True)
        return np.asarray(t)
    except Exception as e:
        print(f"{name:24s} FAIL {str(e)[:140]}", flush=True)
        return None


def ray_sets(cam):
    w, h = 1920, 1080
    stride = (w * h) // R
    xs = (jnp.arange(R, dtype=jnp.int32) * stride) % (w * h)
    px, py = xs % w, xs // w
    ju = jnp.full((R,), 0.5)
    org_c, dir_c = cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    org_i = jnp.asarray(rng.uniform(-1.2, 1.2, (R, 3)).astype(np.float32)
                        * np.array([1, 0.9, 1], np.float32)
                        + np.array([0, 1, 0], np.float32))
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    return (org_c, dir_c), (org_i, jnp.asarray(d_i))


def bunny_scene(wide_k):
    from ptsharp_tpu.examples import _bunny_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.scene import SceneBuilder

    b = SceneBuilder()
    m = _bunny_mesh(6).fit_inside([-1, 0, -1], [1, 2, 1], [0.5, 0.0, 0.5])
    b.add_mesh(m, diffuse_material([0.7, 0.65, 0.55]))
    return b.build(leaf_size=8, wide_k=wide_k)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [4, 8]
    _scene, cam, _r, _i = examples.build("bunny")
    (org_c, dir_c), (org_i, d_i) = ray_sets(cam)
    ref = {}
    scene = bunny_scene(4)
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])

    def fb(o, d, s=scene, base=base, end=end):
        return traverse_packed_chunked(
            s.u_rows, s.leaf_rows, o, d, vec.INF, base, end, s.max_leaf)[0]

    fj = jax.jit(fb)
    ref["coh"] = bench("binary coh", fj, org_c, dir_c)
    ref["inc"] = bench("binary inc", fj, org_i, d_i)

    for K in ks:
        scene = bunny_scene(K)
        wb = int(scene.w_inst_base[0])
        we = int(scene.w_inst_end[0])
        print(f"K={K}: wide rows {tuple(scene.w_rows.shape)}", flush=True)

        def fwde(o, d, s=scene, wb=wb, we=we):
            return traverse_wide_chunked(
                s.w_rows, s.leaf_rows, o, d, vec.INF, wb, we,
                s.max_leaf, s.wide_k)[0]

        fj = jax.jit(fwde)
        for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
            t = bench(f"wide{K} {lab}", fj, o, d)
            if t is not None and ref.get(lab) is not None:
                ok = np.allclose(t, ref[lab], rtol=1e-4, atol=1e-4)
                print(f"  parity vs binary: {ok}", flush=True)


if __name__ == "__main__":
    main()
