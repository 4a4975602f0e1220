"""Ordered-stack packet kernel vs the preorder skip-walk packet kernel.

Round-5 item 1 (VERDICT): measure an alternative traversal kernel on the
bounce-ray closest-hit wall instead of asserting the 128-lane visit union
is the architecture's floor.

Modes:
  parity  — CPU interpret-mode result parity on a small mesh
  raw     — on-chip Mrays/s + per-packet iteration counts for wide8 vs
            ordered8(full) vs ordered8(near), on Morton primaries AND
            depth-1 bounce rays (sorted), bunny 82k
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def build_bunny(intersector="pallas"):
    from ptsharp_tpu import examples

    return examples.build("bunny", intersector=intersector, wide_k=8)


def get_rays(scene, cam, icfg, r):
    from bench import _morton_pixel_order
    from ptsharp_tpu.integrator import RayState, _morton_key, _step

    w, h = 1920, 1080
    morder = _morton_pixel_order(w, h)
    key = jax.random.PRNGKey(0)
    xs = morder[(3 * r + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
    px, py = xs % w, xs // w
    ju, jv = jax.random.uniform(key, (2, r))
    org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(
        px, py, w, h, ju, jv)
    state0 = RayState(org=org, dirn=dirn,
                      throughput=jnp.ones((r, 3)),
                      radiance=jnp.zeros((r, 3)),
                      emission_ok=jnp.ones(r, bool),
                      alive=jnp.ones(r, bool))

    @jax.jit
    def one_step(s):
        s2, _, _, _ = _step(scene, icfg, s, jnp.int32(0), key, ju, jv,
                            None, 0)
        return s2

    s1 = one_step(state0)
    # sorted bounce rays (the production shape: _sorted_closest_hit sorts)
    mk = _morton_key(s1.org, s1.dirn)
    perm = jnp.argsort(mk)
    return (org, dirn), (s1.org[perm], s1.dirn[perm])


def run_parity():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ptsharp_tpu.geometry import mesh as mesh_mod
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk

    rng = np.random.default_rng(0)
    # random triangle soup, 500 tris
    v0 = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
    inst = [(0, 500, np.eye(4, dtype=np.float32)[:3], 0)]
    rows, leaf, st, si = wk.pack_flat_tables(v0, e1, e2, inst, 12, 8)
    print("rows", rows.shape, "leaf", leaf.shape,
          "stack bound", ok.max_stack_bound(rows, 8))
    r = 2048
    org = rng.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rows_j = jnp.asarray(rows)
    leaf_j = jnp.asarray(leaf)
    t0, s0, u0, vv0 = wk.pallas_traverse_wide8(
        rows_j, leaf_j, jnp.asarray(org), jnp.asarray(d), 1e9,
        0, rows.shape[0], 12, 8, interpret=True)
    for mode in ("full", "near"):
        t1, s1, u1, v1, it1 = ok.pallas_traverse_ordered8(
            rows_j, leaf_j, jnp.asarray(org), jnp.asarray(d), 1e9,
            0, rows.shape[0], 12, 8, interpret=True, order_mode=mode,
            return_iters=True)
        ok_t = np.allclose(np.asarray(t0), np.asarray(t1), atol=1e-4)
        ok_s = np.array_equal(np.asarray(s0), np.asarray(s1))
        print(f"mode={mode}: t match {ok_t}, slot match {ok_s}, "
              f"mean iters {float(jnp.mean(it1)):.1f}")
        if not ok_t:
            bad = np.nonzero(~np.isclose(np.asarray(t0), np.asarray(t1),
                                         atol=1e-4))[0]
            print("  mismatches:", bad[:10], np.asarray(t0)[bad[:5]],
                  np.asarray(t1)[bad[:5]])


def run_raw(r=1 << 18):
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk
    from ptsharp_tpu.accel import bvh

    scene, cam, _rc, icfg = build_bunny()
    print("bvh builder:", bvh.build_counts)
    rows, leaf = scene.p_rows, scene.p_leaf
    end = int(scene.p_inst_end[0])
    ls, k = scene.max_leaf, scene.wide_k
    print("rows", rows.shape, "stack bound",
          ok.max_stack_bound(np.asarray(rows), k))
    prim, bounce = get_rays(scene, cam, icfg, r)

    def make(fn, **kw):
        @jax.jit
        def f(o, d):
            out = fn(rows, leaf, o, d, 1e9, 0, end, ls, k, **kw)
            return out[0].sum(), out[1].sum(), (out[4].astype(jnp.float32)
                                                .mean() if len(out) > 4
                                                else jnp.float32(0))
        return f

    f_wide = make(wk.pallas_traverse_wide8)
    f_full = make(ok.pallas_traverse_ordered8, order_mode="full",
                  return_iters=True)
    f_near = make(ok.pallas_traverse_ordered8, order_mode="near",
                  return_iters=True)

    for label, rays in (("primaries", prim), ("bounce-sorted", bounce)):
        o, d = rays
        for name, f in (("wide8", f_wide), ("ord-full", f_full),
                        ("ord-near", f_near)):
            try:
                dt = timeit(f, o, d)
                ts, ss, its = f(o, d)
                print(f"{label:14s} {name:9s}: {r/dt/1e6:7.2f} Mrays/s  "
                      f"mean iters/packet {float(its):7.1f}")
            except Exception as e:
                print(f"{label:14s} {name:9s}: FAIL {str(e)[:150]}")

    # parity spot-check on-chip
    o, d = bounce
    t0, s0, _, _ = jax.jit(lambda o, d: wk.pallas_traverse_wide8(
        rows, leaf, o, d, 1e9, 0, end, ls, k))(o[:4096], d[:4096])
    t1, s1, _, _, _ = jax.jit(lambda o, d: ok.pallas_traverse_ordered8(
        rows, leaf, o, d, 1e9, 0, end, ls, k, order_mode="full",
        return_iters=True))(o[:4096], d[:4096])
    agree = float(jnp.mean((jnp.abs(t0 - t1) < 1e-3).astype(jnp.float32)))
    print(f"on-chip parity (bounce 4096): {agree:.4f}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        run_parity()
    else:
        run_raw()
