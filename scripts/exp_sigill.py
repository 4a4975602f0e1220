"""Isolate the construct that SIGILLs the tunnel compile helper on bunny.

The bare while-loop traversal compiles; the full trace never has. Bisect:
closest_hit alone, closest_hit in a python loop, closest_hit in lax.scan,
with/without checkpoint, chunked (lax.map) vs not.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ptsharp_tpu import examples
from ptsharp_tpu.intersect import closest_hit
from ptsharp_tpu.integrator import trace

R = 1 << 16
W, H = 1920, 1080


def rays(cam):
    xs = jnp.arange(R, dtype=jnp.int32) * ((W * H) // R)
    px, py = xs % W, xs // W
    ju = jnp.full((R,), 0.5)
    return cam.cast_rays(px, py, W, H, ju, ju)


def attempt(label, f, *args):
    try:
        t0 = time.time()
        out = jax.jit(f)(*args)
        jax.block_until_ready(out)
        print(f"{label}: OK compile+run {time.time()-t0:.1f}s", flush=True)
        return True
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:100]}", flush=True)
        return False


def main():
    scene, cam, _r, icfg = examples.build("bunny")
    org, dirn = rays(cam)

    attempt("closest_hit x1", lambda o, d: closest_hit(scene, o, d).t, org, dirn)

    def pyloop(o, d):
        t = jnp.zeros(R)
        for i in range(3):
            h = closest_hit(scene, o, d)
            t = t + h.t
            o = o + d * 0.01 * (1.0 + h.t[:, None] * 0.0)
        return t

    attempt("closest_hit pyloop x3", pyloop, org, dirn)

    def scanloop(o, d):
        def step(carry, _):
            o, d, acc = carry
            h = closest_hit(scene, o, d)
            return (o + d * 1e-2, d, acc + h.t), None

        (o2, d2, acc), _ = jax.lax.scan(step, (o, d, jnp.zeros(R)), None,
                                        length=3)
        return acc

    attempt("closest_hit scan x3", scanloop, org, dirn)

    def scanloop_ckpt(o, d):
        def step(carry, _):
            o, d, acc = carry
            h = closest_hit(scene, o, d)
            return (o + d * 1e-2, d, acc + h.t), None

        step = jax.checkpoint(step)
        (o2, d2, acc), _ = jax.lax.scan(step, (o, d, jnp.zeros(R)), None,
                                        length=3)
        return acc

    attempt("closest_hit scan+ckpt x3", scanloop_ckpt, org, dirn)

    from dataclasses import replace
    attempt("trace d1", lambda o, d: trace(
        scene, replace(icfg, max_bounces=1), o, d,
        jax.random.PRNGKey(0)).radiance, org, dirn)
    attempt("trace d4", lambda o, d: trace(
        scene, icfg, o, d, jax.random.PRNGKey(0)).radiance, org, dirn)
    attempt("trace d4 noremat", lambda o, d: trace(
        scene, replace(icfg, remat=False), o, d,
        jax.random.PRNGKey(0)).radiance, org, dirn)


if __name__ == "__main__":
    main()
