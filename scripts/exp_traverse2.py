"""Packed-traversal benchmark on TPU: chunk-size sweep, coherent vs
incoherent, vs leaf_size. Short programs (the tunnel kills long ones)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel.traverse import traverse_packed, traverse_packed_chunked
from ptsharp_tpu.core import vec

R = 1 << 18  # 256k rays per measurement (keep programs short)


def sync(x):
    return float(jnp.asarray(x).sum())


def rays(scene, cam, coherent=True):
    w, h = 1920, 1080
    if coherent:
        xs = jnp.arange(R, dtype=jnp.int32)
        px, py = xs % w, (xs // w) % h
        ju = jnp.full((R,), 0.5)
        return cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    o = rng.uniform(-0.8, 0.8, (R, 3)).astype(np.float32) + np.array(
        [0, 1, 0], np.float32
    )
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def main():
    for leaf in (8, 16, 32):
        scene, cam, _r, _i = examples.build("bunny")
        # rebuild at this leaf size
        import ptsharp_tpu.examples as ex

        scene, cam, _rc, _ic = ex.bunny(width=1920, height=1080)
        if leaf != 8:
            from ptsharp_tpu.examples import _bunny_mesh
            from ptsharp_tpu.materials import diffuse_material, light_material
            from ptsharp_tpu.scene import SceneBuilder

            b = SceneBuilder()
            b.add_mesh(_bunny_mesh(6).fit_inside([-1, 0, -1], [1, 2, 1],
                                                 [0.5, 0, 0.5]),
                       diffuse_material([0.7, 0.65, 0.55]))
            b.add_plane([0, 0, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
            b.add_sphere([3.5, 6, -3], 1.6, light_material([1, 1, 1], 9.0))
            scene = b.build(leaf_size=leaf)
        base = int(scene.u_inst_base[0])
        end = int(scene.u_inst_end[0])
        print(f"--- leaf={leaf} nodes={scene.u_rows.shape[0]} "
              f"leaf_rows={scene.leaf_rows.shape}", flush=True)
        for coh in (True, False):
            o, d = rays(scene, cam, coh)
            o, d = jax.block_until_ready((o, d))
            for chunk in (0, 1 << 16, 1 << 14, 1 << 12):
                if chunk == 0:
                    f = jax.jit(lambda o_, d_: traverse_packed(
                        scene.u_rows, scene.leaf_rows, o_, d_, vec.INF,
                        base, end, leaf)[0].sum())
                    name = "full"
                else:
                    f = jax.jit(lambda o_, d_, c=chunk: traverse_packed_chunked(
                        scene.u_rows, scene.leaf_rows, o_, d_, vec.INF,
                        base, end, leaf, chunk=c)[0].sum())
                    name = f"chunk{chunk>>10}k"
                try:
                    sync(f(o, d))
                    t0 = time.time()
                    sync(f(o, d))
                    dt = time.time() - t0
                    lab = "coh" if coh else "inc"
                    print(f"  {name:10s} {lab}  {dt*1e3:8.1f} ms "
                          f"{R/dt/1e6:7.2f} Mrays/s", flush=True)
                except Exception as e:
                    print(f"  {name} FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
