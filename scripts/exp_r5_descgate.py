"""Round-5: desc_gate on the VMEM ordered kernel (bunny) — skip the k
child slabs + ordering when NO group can descend (all groups at
leaf/miss pops). Interleaved A/B on primaries and sorted bounce rays."""

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

    scene, cam, _rc, icfg = build_bunny()
    rows, leaf = scene.p_rows, scene.p_leaf
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    fat = jnp.asarray(hk.pack_fat(np.asarray(rows), np.asarray(leaf), ls))
    prim, (bo, bd) = get_rays(scene, cam, icfg, r)

    def mk(**kw):
        @jax.jit
        def f(o, d):
            out = ok.pallas_traverse_ordered8(
                rows, leaf, o, d, 1e9, 0, end, ls, k, **kw)
            return out[0].sum()
        return f

    def mk_fat(**kw):
        @jax.jit
        def f(o, d):
            out = ok.pallas_traverse_ordered8_fat(
                fat, o, d, 1e9, 0, end, ls, k, **kw)
            return out[0].sum()
        return f

    cands = [
        ("near", mk(order_mode="near")),
        ("near+descgate", mk(order_mode="near", desc_gate=True)),
        ("fat-pipe", mk_fat(order_mode="near", pipelined=True)),
        ("fat-pipe+gate", mk_fat(order_mode="near", pipelined=True,
                                 mt_gate=True)),
    ]
    for label, (o, d) in (("primaries", prim), ("bounce-sorted", (bo, bd))):
        times = {n: [] for n, _ in cands}
        for rep in range(reps):
            for n, f in cands:
                times[n].append(measure(f, o, d))
        for n, _ in cands:
            v = sorted(times[n])
            med = v[len(v) // 2]
            print(f"{label:14s} {n:14s}: {r/med/1e6:7.2f} Mrays/s "
                  f"[{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]", flush=True)
    a = cands[0][1](bo[:8192], bd[:8192])
    b = cands[1][1](bo[:8192], bd[:8192])
    print("sum parity:", float(a), float(b), flush=True)


if __name__ == "__main__":
    main()
