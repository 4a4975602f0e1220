"""Round-5: renderer-level compaction A/B (warm, REUSED renderer - the
per-rep-rebuild version recompiled every rep and measured garbage).
Justifies RenderConfig.compaction=True."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import ptsharp_tpu as pt
from ptsharp_tpu import examples
from dataclasses import replace as drep

def run(name, icfg_mut=None, n_iter=2, reps=3, **kw):
    for compact in (True, False):
        scene, cam, rcfg, icfg = examples.build(name, **kw)
        if icfg_mut:
            icfg = icfg_mut(icfg)
        rcfg = drep(rcfg, compaction=compact)
        r = pt.Renderer(scene, cam, rcfg, icfg)
        r.iterative_render(1, key=jax.random.PRNGKey(0))  # warm/compile
        vals = []
        for rep in range(reps):
            r0 = int(r.rays_traced)
            t0 = time.time()
            r.iterative_render(n_iter, key=jax.random.PRNGKey(rep + 1))
            dt = time.time() - t0
            vals.append((int(r.rays_traced) - r0) / dt / 1e6)
        vals.sort()
        print(f"{name} compaction={compact}: {vals[len(vals)//2]:.2f} Mrays/s "
              f"[{vals[0]:.2f}-{vals[-1]:.2f}]", flush=True)

run("cornell", icfg_mut=lambda c: drep(c, max_bounces=8,
                                       russian_roulette=True, rr_start_depth=2))
run("cornell")
run("bunny", intersector="pallas", wide_k=8)
