"""Per-iteration cost of the packet kernels: difference timings of
truncated max_iters runs (every tile runs exactly max_iters iterations
when truncated below its natural depth)."""

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


def main():
    scene, cam, _r, _i = examples.build("bunny")
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    real = np.nonzero((np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0)[0]
    tabs = wk.pack_tables(v0, e1, e2, [real], leaf_size=12, k=8)

    w, h = 640, 360
    xs = jnp.arange(R, dtype=jnp.int32) % (w * h)
    px, py = xs % w, xs // w
    ju = jnp.full((R,), 0.5)
    org, dirn = cam.cast_rays(px, py, w, h, ju, ju)

    def timed(f):
        out = f()
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f())
            best = min(best, time.time() - t0)
        return best

    for name, entry, tile in (("packet8", wk.pallas_traverse_wide8, 1024),
                              ("v1_2048", None, 2048)):
        ts = {}
        for mi in (32, 96):
            if entry is None:
                f = jax.jit(lambda mi=mi: wk.pallas_traverse_wide(
                    tabs.rows, tabs.leaf, org, dirn, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k, tile=tile, max_iters=mi)[0])
            else:
                f = jax.jit(lambda mi=mi: entry(
                    tabs.rows, tabs.leaf, org, dirn, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k, max_iters=mi)[0])
            ts[mi] = timed(f)
        n_tiles = R // tile
        d = (ts[96] - ts[32]) / (64 * n_tiles)
        print(f"{name}: t32={ts[32]*1e3:.1f}ms t96={ts[96]*1e3:.1f}ms "
              f"-> {d*1e9:.0f} ns/iter/tile (~{d*0.94e9:.0f} cyc)", flush=True)


if __name__ == "__main__":
    main()
