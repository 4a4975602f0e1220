"""Round-5: tape backward attribution (plain fwd / tape fwd / backward
alone / grad total) on cornell 1M. Drove the one-hot-matmul aggregation
rewrite (381 -> 43 ms backward)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from dataclasses import replace
from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace
from ptsharp_tpu import tape as tape_mod

scene, cam, _rc, icfg = examples.build("cornell")
w, h = 1920, 1080
pix = 1 << 20
key = jax.random.PRNGKey(0)
xs = jnp.arange(pix, dtype=jnp.int32)
ju, jv = jax.random.uniform(key, (2, pix))
org, dirn = cam.cast_rays(xs % w, (xs // w) % h, w, h, ju, jv)

def timeit(f, *a, iters=4):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

f_plain = jax.jit(lambda o, d, k: trace(scene, icfg, o, d, k).radiance.sum())
print(f"plain fwd       : {timeit(f_plain, org, dirn, key)*1e3:7.1f} ms", flush=True)

f_tapefwd = jax.jit(lambda o, d, k: jax.tree.map(
    lambda x: x.sum(), tape_mod._trace_tape(scene, icfg, o, d, k)[0]))
print(f"tape fwd        : {timeit(f_tapefwd, org, dirn, key)*1e3:7.1f} ms", flush=True)

p = tape_mod.DiffParams(scene.materials.color, scene.materials.emittance,
                        scene.materials.tint, jnp.asarray(scene.env_color),
                        scene.textures.data)
@jax.jit
def f_fwd_tape_full(o, d, k):
    rad, aux, tp = tape_mod._trace_tape(scene, icfg, o, d, k)
    return rad.sum(), tp
_, tp = f_fwd_tape_full(org, dirn, key)
jax.block_until_ready(tp)

f_bwd = jax.jit(lambda tp_, g: jax.tree.map(
    lambda x: x.sum(), tape_mod._tape_backward(scene, icfg, p, tp_, g)))
g = jnp.ones((pix, 3), jnp.float32) / pix
print(f"tape bwd alone  : {timeit(f_bwd, tp, g)*1e3:7.1f} ms", flush=True)

def loss_tape(colors, k):
    s = replace(scene, materials=scene.materials._replace(color=colors))
    return jnp.mean(tape_mod.trace_tape_radiance(s, icfg, org, dirn, k).radiance)
f_grad = jax.jit(jax.grad(loss_tape))
print(f"tape grad total : {timeit(f_grad, scene.materials.color, key)*1e3:7.1f} ms", flush=True)
