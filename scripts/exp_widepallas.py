"""Wide Pallas kernel: parity vs the XLA walk + (on TPU) throughput.

CPU: interpret-mode parity on a small mesh scene.
TPU: compile + parity + Mrays/s at full bunny scale (the scale that broke
the binary-row kernel's VMEM-padded tables).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu import examples
from ptsharp_tpu.accel.traverse import traverse_packed_chunked
from ptsharp_tpu.core import vec
from ptsharp_tpu.pallas import wide_kernel as wk


def main():
    on_tpu = jax.default_backend() == "tpu"
    name = "bunny" if on_tpu else "teapot"
    scene, cam, _r, _i = examples.build(name)
    # real slots = those with a nonzero triangle (pad slots are zero rows)
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    real = np.nonzero((np.abs(e1).sum(1) + np.abs(e2).sum(1)) > 0)[0]
    print(f"{name}: {len(real)} real tri slots", flush=True)
    t0 = time.time()
    tabs = wk.pack_tables(v0, e1, e2, [real], leaf_size=12, k=8)
    print(f"pack {time.time()-t0:.1f}s rows {tabs.rows.shape} leaf "
          f"{tabs.leaf.shape} = "
          f"{(tabs.rows.size + tabs.leaf.size)*4/2**20:.1f} MB", flush=True)

    R = (1 << 18) if on_tpu else (1 << 12)
    w, h = 640, 360
    stride = max(1, (w * h) // R)
    xs = (jnp.arange(R, dtype=jnp.int32) * stride) % (w * h)
    px, py = xs % w, xs // w
    ju = jnp.full((R,), 0.5)
    org_c, dir_c = cam.cast_rays(px, py, w, h, ju, ju)
    rng = np.random.default_rng(0)
    org_i = jnp.asarray(rng.uniform(-1.0, 1.0, (R, 3)).astype(np.float32)
                        + np.array([0, 1, 0], np.float32))
    d_i = rng.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    d_i = jnp.asarray(d_i)

    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    fw = jax.jit(lambda o, d: traverse_packed_chunked(
        scene.u_rows, scene.leaf_rows, o, d, vec.INF, base, end,
        scene.max_leaf)[0])

    variants = [("v1 t1024", lambda o, d: wk.pallas_traverse_wide(
                    tabs.rows, tabs.leaf, o, d, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k, tile=1024)),
                ("v1 t2048", lambda o, d: wk.pallas_traverse_wide(
                    tabs.rows, tabs.leaf, o, d, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k, tile=2048)),
                ("packet8 ", lambda o, d: wk.pallas_traverse_wide8(
                    tabs.rows, tabs.leaf, o, d, vec.INF,
                    int(tabs.inst_base[0]), int(tabs.inst_end[0]),
                    tabs.leaf_size, tabs.k))]
    for tile, pf in (variants if on_tpu else variants[:1]):
        fp = jax.jit(pf)
        for lab, o, d in (("coh", org_c, dir_c), ("inc", org_i, d_i)):
            try:
                t, slot, u, v = fp(o, d)
                jax.block_until_ready(t)
                t0 = time.time()
                jax.block_until_ready(fp(o, d))
                dt = time.time() - t0
                tw = fw(o, d)
                jax.block_until_ready(tw)
                t0 = time.time()
                jax.block_until_ready(fw(o, d))
                dtw = time.time() - t0
                ok = np.allclose(np.asarray(t), np.asarray(tw),
                                 rtol=1e-4, atol=1e-4)
                print(f"t{tile} {lab}: pallas {R/dt/1e6:7.2f} Mrays/s  "
                      f"walk {R/dtw/1e6:7.2f}  parity={ok}", flush=True)
                if not ok:
                    bad = np.nonzero(~np.isclose(np.asarray(t),
                                                 np.asarray(tw),
                                                 rtol=1e-4, atol=1e-4))[0]
                    print(f"  {len(bad)} mismatches, first "
                          f"{bad[:5]} t={np.asarray(t)[bad[:5]]} "
                          f"tw={np.asarray(tw)[bad[:5]]}", flush=True)
            except Exception as e:
                print(f"t{tile} {lab}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
