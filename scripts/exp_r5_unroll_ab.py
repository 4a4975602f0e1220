"""Round-5: scan vs python-unrolled depth loop on cornell - the decisive
negative result for the (3,R) layout flip (identical timing, so the
scan-boundary layout copies are noise)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from ptsharp_tpu import examples
from ptsharp_tpu.integrator import trace, RayState, _step
import jax.random as jr

scene, cam, _rc, icfg = examples.build("cornell")
w, h = 1920, 1080
pix = 1 << 20

def trace_unrolled(scene, cfg, org, dirn, key):
    r = org.shape[0]
    state = RayState(org=org, dirn=dirn, throughput=jnp.ones((r, 3)),
                     radiance=jnp.zeros((r, 3)),
                     emission_ok=jnp.ones(r, bool), alive=jnp.ones(r, bool))
    rays = jnp.int32(0)
    k0, krest = jr.split(key)
    k0a, k0u, k0v = jr.split(k0, 3)
    ju = jr.uniform(k0u, (r,)); jv = jr.uniform(k0v, (r,))
    state, rays, alb, nrm = _step(scene, cfg, state, rays, k0a, ju, jv, None, 0)
    for depth in range(1, cfg.max_bounces + 1):
        dk = jr.fold_in(jr.fold_in(krest, 0), depth)
        ku_, kv_ = jr.split(jr.fold_in(dk, 7))
        uu = jr.uniform(ku_, (r,)); vv = jr.uniform(kv_, (r,))
        state, rays, _, _ = _step(scene, cfg, state, rays, dk, uu, vv, None,
                                  depth, sort_rays=True)
    return state.radiance, rays

def mk(tr):
    @jax.jit
    def rc(key, ci):
        kj, kt = jr.split(key)
        start = (ci * pix) % (w * h)
        xs = (start + jnp.arange(pix, dtype=jnp.int32)) % (w * h)
        px, py = xs % w, xs // w
        ju, jv = jr.uniform(kj, (2, pix))
        org, dirn = cam.cast_rays(px, py, w, h, ju, jv)
        out = tr(scene, icfg, org, dirn, kt)
        if hasattr(out, "radiance"):
            return out.radiance.sum(), out.rays_traced
        return out[0].sum(), out[1]
    return rc

fns = {"scan": mk(trace), "unrolled": mk(trace_unrolled)}
for n, f in fns.items():
    out = f(jr.PRNGKey(0), jnp.int32(0)); jax.block_until_ready(out)
    print("warm", n, flush=True)
for rep in range(3):
    line = []
    for n, f in fns.items():
        t0 = time.time()
        tot = 0
        for i in range(8):
            _s, nn = f(jr.PRNGKey(i), jnp.int32(i)); tot += int(nn)
        dt = time.time() - t0
        line.append(f"{n}: {tot/dt/1e6:.1f}")
    print(f"rep {rep}: " + "  ".join(line) + " Mrays/s", flush=True)
