"""Leaf-size sweep for the packet kernels on bunny (round-4 item:
sorted-bounce throughput). The Moller-Trumbore unroll is leaf_size wide
and dominates iteration cost; smaller leaves cut per-iteration FLOPs but
deepen the tree (more iterations). Measures coherent + sorted-bounce
closest-hit for leaf_size in {4, 6, 8, 12}."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _morton_pixel_order
from ptsharp_tpu import examples
from ptsharp_tpu.core import vec
from ptsharp_tpu.integrator import _morton_key
from ptsharp_tpu.pallas import wide_kernel as wk


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(r=1 << 18):
    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    borg = jax.random.uniform(k1, (r, 3), minval=-1.0, maxval=1.0) \
        * jnp.asarray([1.0, 0.8, 1.0]) + jnp.asarray([0.0, 0.9, 0.0])
    bd = jax.random.normal(k2, (r, 3))
    bd = bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)
    perm = jnp.argsort(_morton_key(borg, bd))
    borg, bd = borg[perm], bd[perm]

    for ls in (4, 6, 8, 12):
        scene, cam, _rc, _ic = examples.build(
            "bunny", intersector="pallas", wide_k=8)
        # rebuild with the requested leaf size
        from ptsharp_tpu.geometry.mesh import TriMesh  # noqa: F401
        from ptsharp_tpu.examples import _bunny_mesh
        from ptsharp_tpu.materials import diffuse_material
        from ptsharp_tpu.scene import SceneBuilder

        b = SceneBuilder()
        m = _bunny_mesh(6).fit_inside([-1, 0, -1], [1, 2, 1],
                                      [0.5, 0.0, 0.5])
        b.add_mesh(m, diffuse_material([0.6, 0.6, 0.6]))
        sp = b.build(leaf_size=ls, intersector="pallas", wide_k=8)
        b0, e0 = sp.p_inst_base[0], sp.p_inst_end[0]

        # coherent Morton primaries
        xs = morder[(2 * r + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
        px, py = xs % w, xs // w
        ju, jv = jax.random.uniform(key, (2, r))
        org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
            px, py, w, h, ju, jv)

        @jax.jit
        def f(sp_, o, d):
            return wk.pallas_traverse_wide8(
                sp_.p_rows, sp_.p_leaf, o, d, vec.INF, b0, e0,
                ls, 8)[0].sum()

        try:
            dt_c = timeit(f, sp, org, dirn)
            dt_b = timeit(f, sp, borg, bd)
            print(f"LEAF ls={ls} rows={sp.p_rows.shape[0]} "
                  f"coherent={r/dt_c/1e6:.2f} sorted-bounce={r/dt_b/1e6:.2f}")
        except Exception as e:
            print(f"LEAF ls={ls}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
