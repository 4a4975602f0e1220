"""Round-5: deferred-leaf batching A/B on bunny (bounce +3%, primaries
-22% - negative result, flag kept off by default)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import jax, jax.numpy as jnp
from exp_ordered import build_bunny, get_rays
from ptsharp_tpu.pallas import ordered_kernel as ok

def measure(f, o, d, iters=3):
    out = f(o, d); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = f(o, d)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

r = 1 << 18
scene, cam, _rc, icfg = build_bunny()   # leaf-14 tables now
rows, leaf = scene.p_rows, scene.p_leaf
end = int(scene.p_inst_end[0])
ls, k = scene.max_leaf, scene.wide_k
prim, (bo, bd) = get_rays(scene, cam, icfg, r)

cands = []
for dl in (False, True):
    @jax.jit
    def f(o, d, dl=dl):
        t, s, u, v = ok.pallas_traverse_ordered8(
            rows, leaf, o, d, 1e9, 0, end, ls, k,
            order_mode="near", defer_leaf=dl)
        return t.sum(), s.sum()
    cands.append((f"defer={dl}", f))

times = {n: [] for n, _ in cands}
for rep in range(4):
    for n, f in cands:
        times[n].append(measure(f, bo, bd))
for n, _ in cands:
    v = sorted(times[n]); med = v[len(v)//2]
    print(f"bounce {n}: {r/med/1e6:.2f} Mrays/s [{r/max(v)/1e6:.2f}-{r/min(v)/1e6:.2f}]", flush=True)
po, pd = prim
for n, f in cands:
    dt = measure(f, po, pd)
    print(f"prim   {n}: {r/dt/1e6:.2f} Mrays/s", flush=True)
# parity on-chip
a = cands[0][1](bo[:8192], bd[:8192])
b = cands[1][1](bo[:8192], bd[:8192])
print("parity:", float(jnp.mean((jnp.abs(a[0]-b[0]) < 1e-2).astype(jnp.float32))),
      float(a[0]), float(b[0]))
