"""Microbenchmark Mosaic loop costs: dynamic VMEM row reads vs (8,128)
vector compute, to budget the packet8 traversal kernel's iteration."""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 8192
ITERS = 4096


def make(nreads, nops, scratch=True):
    def kern(rows_ref, out_ref, nscr):
        def body(s):
            it, j, acc = s
            jj = j
            if nreads == 1:
                nscr[0, :] = rows_ref[jj]
                acc = acc + nscr[0, :] * 1e-9
                jj = (jj * 1103515245 + 12345) % N
            elif nreads > 1:
                for g in range(nreads):
                    nscr[g, :] = rows_ref[(jj + g * 37) % N]
                acc = acc + nscr[:nreads if nreads > 1 else 1, :].sum(
                    axis=0, keepdims=True) * 1e-9 if False else acc
                v = nscr[:]
                acc = acc + v[0:1, :] * 1e-9
                jj = (jj * 1103515245 + 12345) % N
            x = jnp.broadcast_to(acc, (8, 128))
            for _ in range(nops):
                x = x * 1.0000001 + 0.0000001
            acc = x[0:1, :]
            return it + 1, jj, acc

        def cond(s):
            return s[0] < ITERS

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(1),
                         jnp.zeros((1, 128), jnp.float32)))
        out_ref[0, :] = acc[0, :]

    return kern


def run(nreads, nops):
    rows = jnp.asarray(np.random.rand(N, 128).astype(np.float32))
    f = pl.pallas_call(
        make(nreads, nops),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    g = jax.jit(lambda r: f(r))
    out = g(rows)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(g(rows))
        best = min(best, time.time() - t0)
    ns_per_iter = best / ITERS * 1e9
    print(f"reads={nreads:2d} ops={nops:3d}: {ns_per_iter:8.1f} ns/iter "
          f"(~{ns_per_iter*0.94:.0f} cycles)", flush=True)


def main():
    for nreads, nops in ((0, 0), (1, 0), (4, 0), (8, 0), (16, 0),
                         (0, 50), (0, 200), (0, 400),
                         (8, 200), (8, 400)):
        run(nreads, nops)


if __name__ == "__main__":
    main()
