"""Round-5: per-depth step cost + alive decay on bunny (the evidence
behind no-RR compaction: fixed-width stages pay full width for dead
lanes). Results in BASELINE.md round-5 section."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import _morton_pixel_order
from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace, RayState, _step

r = 1 << 18
scene, cam, _rc, icfg = examples.build("bunny", intersector="pallas", wide_k=8)
w, h = 1920, 1080
morder = _morton_pixel_order(w, h)
key = jax.random.PRNGKey(0)
xs = morder[(3 * r + jnp.arange(r, dtype=jnp.int32)) % (w * h)]
px, py = xs % w, xs // w
ju, jv = jax.random.uniform(key, (2, r))
org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(px, py, w, h, ju, jv)

def timeit(fn, *a, iters=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

@jax.jit
def one_step(s, d):
    s2, _, _, _ = _step(scene, icfg, s, jnp.int32(0),
                        jax.random.fold_in(key, d), ju, jv, None, 1,
                        sort_rays=True)
    return s2

s = RayState(org=org, dirn=dirn, throughput=jnp.ones((r, 3)),
             radiance=jnp.zeros((r, 3)), emission_ok=jnp.ones(r, bool),
             alive=jnp.ones(r, bool))
states = [s]
for d in range(4):
    s = one_step(s, d)
    states.append(s)
jax.block_until_ready(s.org)
for d, st in enumerate(states):
    alive = int(jnp.sum(st.alive))
    dt = timeit(one_step, st, d)
    print(f"step at depth-state {d}: {dt*1e3:7.1f} ms  alive={alive}", flush=True)

from dataclasses import replace
for mb in (0, 1, 2, 3, 4):
    cfg = replace(icfg, max_bounces=mb)
    f = jax.jit(lambda o, d, k: trace(scene, cfg, o, d, k).radiance.sum())
    dt = timeit(f, org, dirn, key)
    print(f"trace max_bounces={mb}: {dt*1e3:7.1f} ms", flush=True)
