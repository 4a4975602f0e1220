"""Probe the real table-size ceiling of the wide Pallas kernel on this
chip: compile + run at increasing mesh sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.core import vec
from ptsharp_tpu.geometry.mesh import sphere_mesh
from ptsharp_tpu.pallas import wide_kernel as wk

R = 1 << 16


def main():
    for subdiv in (6, 7):
        m = sphere_mesh([0, 1, 0], 1.0, subdivisions=subdiv)
        v = m.v.astype(np.float32)
        v0 = v[:, 0]
        e1 = v[:, 1] - v0
        e2 = v[:, 2] - v0
        tabs = wk.pack_tables(v0, e1, e2, [np.arange(v0.shape[0])],
                              leaf_size=12, k=8)
        mb = (tabs.rows.size + tabs.leaf.size) * 4 / 2**20
        rng = np.random.default_rng(0)
        org = jnp.asarray((rng.uniform(-3, 3, (R, 3))).astype(np.float32))
        tgt = rng.uniform(-1, 1, (R, 3)).astype(np.float32) + [0, 1, 0]
        d = (tgt - np.asarray(org)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        f = jax.jit(lambda o, dd: wk.pallas_traverse_wide8(
            tabs.rows, tabs.leaf, o, dd, vec.INF,
            int(tabs.inst_base[0]), int(tabs.inst_end[0]),
            tabs.leaf_size, tabs.k)[0])
        try:
            t0 = time.time()
            out = f(org, d)
            jax.block_until_ready(out)
            nh = int((np.asarray(out) < 1e8).sum())
            print(f"subdiv {subdiv} ({v0.shape[0]} tris, {mb:.1f} MB): "
                  f"OK {time.time()-t0:.0f}s hits={nh}", flush=True)
        except Exception as e:
            print(f"subdiv {subdiv} ({v0.shape[0]} tris, {mb:.1f} MB): "
                  f"FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
