"""Interleaved repeated A/B: wide8 vs ordered(full) vs ordered(near) on
sorted bounce rays (the wall shape) + the any-hit shadow comparison.
Interleaving cancels the tunnel's slow drift; medians reported."""

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
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk

    scene, cam, _rc, icfg = build_bunny()
    rows, leaf = scene.p_rows, scene.p_leaf
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    _prim, (bo, bd) = get_rays(scene, cam, icfg, r)

    def mk_ch(fn, **kw):
        @jax.jit
        def f(o, d):
            out = fn(rows, leaf, o, d, 1e9, 0, end, ls, k, **kw)
            return out[0].sum()
        return f

    def mk_occ(fn, **kw):
        @jax.jit
        def f(o, d):
            tc = jnp.full((o.shape[0],), 4.0, jnp.float32)
            return fn(rows, leaf, o, d, tc, 0, end, ls, k, **kw).sum()
        return f

    cands = [
        ("ch/wide8", mk_ch(wk.pallas_traverse_wide8)),
        ("ch/ord-full", mk_ch(ok.pallas_traverse_ordered8,
                              order_mode="full")),
        ("ch/ord-near", mk_ch(ok.pallas_traverse_ordered8,
                              order_mode="near")),
        ("occ/wide8", mk_occ(wk.pallas_occluded_wide8)),
        ("occ/ord-full", mk_occ(ok.pallas_occluded_ordered8,
                                order_mode="full")),
        ("occ/ord-near", mk_occ(ok.pallas_occluded_ordered8,
                                order_mode="near")),
    ]
    times = {n: [] for n, _ in cands}
    for rep in range(reps):
        for n, f in cands:
            times[n].append(measure(f, bo, bd))
        print(f"rep {rep}: " + "  ".join(
            f"{n}={r/times[n][-1]/1e6:.2f}" for n, _ in cands), flush=True)
    print("\nmedians (Mrays/s):")
    for n, _ in cands:
        v = sorted(times[n])
        med = v[len(v) // 2]
        print(f"  {n:12s}: {r/med/1e6:7.2f}  "
              f"[{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]")

    # occlusion parity
    occ0 = mk_occ(wk.pallas_occluded_wide8)
    f0 = jax.jit(lambda o, d: wk.pallas_occluded_wide8(
        rows, leaf, o, d, jnp.full((o.shape[0],), 4.0), 0, end, ls, k))
    f1 = jax.jit(lambda o, d: ok.pallas_occluded_ordered8(
        rows, leaf, o, d, jnp.full((o.shape[0],), 4.0), 0, end, ls, k,
        order_mode="full"))
    a = f0(bo[:8192], bd[:8192])
    b = f1(bo[:8192], bd[:8192])
    print("occ parity:", float(jnp.mean((a == b).astype(jnp.float32))))


if __name__ == "__main__":
    main()
