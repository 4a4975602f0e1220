"""Microbenchmarks for the primitives that decide traversal design on this
TPU: gather shapes/costs and while_loop step overhead. Run with small
batches (the tunnel kills long programs)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 16  # rays
N = 28 * 1024  # nodes


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, f, *args, reps=3):
    try:
        sync(f(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            sync(f(*args))
            best = min(best, time.time() - t0)
        print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)
        return best
    except Exception as e:
        print(f"{name:34s} FAIL {str(e)[:90]}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))
    t3 = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    t8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    t72 = jnp.asarray(rng.normal(size=(N, 72)).astype(np.float32))
    t648 = jnp.asarray(rng.normal(size=(N // 8, 648)).astype(np.float32))
    idx8 = jnp.asarray(rng.integers(0, N // 8, R).astype(np.int32))
    tv = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    timeit("gather (N,) x1", jax.jit(lambda i: tv[i].sum()), idx)
    timeit("gather (N,3) row", jax.jit(lambda i: t3[i].sum()), idx)
    timeit("gather (N,8) row", jax.jit(lambda i: t8[i].sum()), idx)
    timeit("gather (N,72) row", jax.jit(lambda i: t72[i].sum()), idx)
    timeit("gather (N/8,648) row", jax.jit(lambda i: t648[i].sum()), idx8)
    timeit(
        "gather 5x mixed (cur node fetch)",
        jax.jit(lambda i: t3[i].sum() + t3[i].sum() + tv[i].sum()
                + tv[i].sum() + tv[i].sum()),
        idx,
    )
    # take_along vs onehot-matmul gather for small tables
    small = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
    idx_s = jnp.asarray(rng.integers(0, 256, R).astype(np.int32))
    timeit("gather small (256,8) row", jax.jit(lambda i: small[i].sum()), idx_s)

    def onehot_gather(i):
        oh = jax.nn.one_hot(i, 256, dtype=jnp.bfloat16)
        return jnp.dot(oh, small.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).sum()

    timeit("onehot-matmul small (256,8)", jax.jit(onehot_gather), idx_s)

    # while_loop step overhead: 512 iterations of a trivial masked body
    def loop_cost(x):
        def body(s):
            i, acc = s
            acc = acc + jnp.where(i % 2 == 0, x, 0.0)
            return i + 1, acc

        _, acc = jax.lax.while_loop(lambda s: s[0] < 512, body,
                                    (jnp.int32(0), jnp.zeros_like(x)))
        return acc.sum()

    timeit("while 512 steps, (R,) body", jax.jit(loop_cost),
           jnp.ones((R,), jnp.float32))

    # gather inside a while loop (the actual traversal pattern): 128 steps
    def loop_gather(i0):
        def body(s):
            it, cur, acc = s
            row = t8[cur]  # (R, 8)
            acc = acc + row.sum(-1)
            cur = (cur * 1103515245 + 12345) % N
            return it + 1, cur, acc

        _, _, acc = jax.lax.while_loop(
            lambda s: s[0] < 128, body,
            (jnp.int32(0), i0, jnp.zeros((R,), jnp.float32)))
        return acc.sum()

    t = timeit("while 128 x gather (N,8)", jax.jit(loop_gather), idx)
    if t:
        print(f"  -> {R*128/t/1e9:.2f} G gathered-rows/s")


if __name__ == "__main__":
    main()
