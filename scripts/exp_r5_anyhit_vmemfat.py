"""Round-5: should VMEM-scale scenes use the pipelined fat ANY-HIT
kernel instead of the wide8 VMEM any-hit (production NEE path)? Bunny
bounce-distribution rays, t_cut 4.0 (the exp_ordered2 shadow proxy)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from exp_ordered import build_bunny, get_rays


def measure(f, o, d, iters=3):
    out = f(o, d)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(o, d)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main(r=1 << 18, reps=5):
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk

    scene, cam, _rc, icfg = build_bunny()
    rows, leaf = scene.p_rows, scene.p_leaf
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    fat = scene.p_fat
    _prim, (bo, bd) = get_rays(scene, cam, icfg, r)

    @jax.jit
    def f_wide8(o, d):
        tc = jnp.full((o.shape[0],), 4.0, jnp.float32)
        return wk.pallas_occluded_wide8(
            rows, leaf, o, d, tc, 0, end, ls, k).sum()

    @jax.jit
    def f_fat_pipe(o, d):
        tc = jnp.full((o.shape[0],), 4.0, jnp.float32)
        return ok.pallas_occluded_fat_pipe(
            fat, o, d, tc, 0, end, ls, k).sum()

    cands = [("wide8-vmem (prod)", f_wide8), ("fat-pipe", f_fat_pipe)]
    times = {n: [] for n, _ in cands}
    for rep in range(reps):
        for n, f in cands:
            times[n].append(measure(f, bo, bd))
    for n, _ in cands:
        v = sorted(times[n])
        med = v[len(v) // 2]
        print(f"anyhit {n:18s}: {r/med/1e6:7.2f} Mrays/s "
              f"[{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]", flush=True)
    a = int(f_wide8(bo[:8192], bd[:8192]))
    b = int(f_fat_pipe(bo[:8192], bd[:8192]))
    print("parity:", a, b, flush=True)


if __name__ == "__main__":
    main()
