"""Round-5: single-cluster fat-BLOCK cache vs plain fat vs
ordered+pipelined on dragon primaries (cache: correct but not faster -
negative result in BASELINE.md)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import _morton_pixel_order
from ptsharp_tpu import examples
from ptsharp_tpu.pallas import hbm_kernel as hk
from ptsharp_tpu.pallas import ordered_kernel as ok

def measure(f, o, d, iters=2):
    out = f(o, d); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = f(o, d)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

r = 1 << 20
scene, cam, _rc, icfg = examples.build("dragon_hd", intersector="pallas", wide_k=8)
assert scene.p_hbm
fat = scene.p_rows
end = int(scene.p_inst_end[0])
ls, k = scene.max_leaf, scene.wide_k
w, h = 1920, 1080
morder = _morton_pixel_order(w, h)
key = jax.random.PRNGKey(0)
xs = morder[jnp.arange(r, dtype=jnp.int32) % (w * h)]
px, py = xs % w, xs // w
ju, jv = jax.random.uniform(key, (2, r))
org, dirn = jax.jit(cam.cast_rays, static_argnums=(2, 3))(px, py, w, h, ju, jv)
jax.block_until_ready((org, dirn))

cands = [
    ("fat-preorder", jax.jit(lambda o, d: hk.pallas_traverse_hbm8_fat(
        fat, o, d, 1e9, 0, end, ls, k)[0].sum())),
    ("fat-cache", jax.jit(lambda o, d: hk.pallas_traverse_hbm8_fat_cache(
        fat, o, d, 1e9, 0, end, ls, k)[0].sum())),
    ("ord-fat-pipe", jax.jit(lambda o, d: ok.pallas_traverse_ordered8_fat(
        fat, o, d, 1e9, 0, end, ls, k, order_mode="near",
        pipelined=True)[0].sum())),
]
times = {n: [] for n, _ in cands}
for rep in range(3):
    for n, f in cands:
        try:
            times[n].append(measure(f, org, dirn))
        except Exception as e:
            print(n, "FAIL", str(e)[:120], flush=True)
            times[n].append(float("inf"))
for n, _ in cands:
    v = sorted(times[n]); med = v[len(v)//2]
    print(f"prim {n:13s}: {r/med/1e6:7.2f} Mrays/s", flush=True)

# correctness gate on-chip for the cache kernel
f0 = jax.jit(lambda o, d: hk.pallas_traverse_hbm8_fat(
    fat, o, d, 1e9, 0, end, ls, k)[0])
f1 = jax.jit(lambda o, d: hk.pallas_traverse_hbm8_fat_cache(
    fat, o, d, 1e9, 0, end, ls, k)[0])
a = f0(org[:8192], dirn[:8192]); b = f1(org[:8192], dirn[:8192])
print("on-chip cache parity:", float(jnp.mean((jnp.abs(a-b) < 1e-3).astype(jnp.float32))))
