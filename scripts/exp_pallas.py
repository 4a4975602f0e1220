"""Pallas-on-axon viability probes: (1) trivial kernel compiles/runs,
(2) vector gather from a VMEM table inside a kernel, (3) scalar-cursor
packet step (dynamic slice + broadcast test), (4) a full per-tile packet
BVH walk microkernel. Each probe is tiny and independent."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x).sum())


def probe(name, fn):
    try:
        t0 = time.time()
        out = fn()
        s = sync(out)
        print(f"{name:28s} OK  compile+run {time.time()-t0:6.1f}s  sum={s:.3f}",
              flush=True)
        t0 = time.time()
        sync(fn())
        print(f"{name:28s}     run {1e3*(time.time()-t0):8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s} FAIL {str(e)[:160]}", flush=True)


def main():
    # 1. trivial
    def k_double(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((8, 128), jnp.float32)

    def trivial():
        return pl.pallas_call(
            k_double,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    probe("trivial", jax.jit(trivial))

    # 2. vector gather from VMEM table
    N, R = 8192, 4096
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))

    def k_gather(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:]]

    def vgather():
        return pl.pallas_call(
            k_gather,
            out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    probe("vector gather (N,8)", jax.jit(vgather))

    # 2b. repeated vector gather in a fori loop (throughput)
    def k_gather_loop(t_ref, i_ref, o_ref):
        def body(j, acc):
            cur = (i_ref[:] + j * 2654435761) % N
            return acc + t_ref[cur].sum(axis=-1)

        o_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((R,), jnp.float32))

    def vgather_loop():
        return pl.pallas_call(
            k_gather_loop,
            out_shape=jax.ShapeDtypeStruct((R,), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    probe("vector gather x64 loop", jax.jit(vgather_loop))

    # 3. scalar-cursor packet step: dynamic row slice + broadcast compare
    T = 1024

    def k_packet(t_ref, o_ref):
        org = jnp.zeros((8, T), jnp.float32)

        def body(j, acc):
            row = t_ref[j % N, :]  # scalar dynamic index -> (8,)
            return acc + row[:, None] * org + row.sum()

        o_ref[:] = jax.lax.fori_loop(0, 512, body, jnp.zeros((8, T), jnp.float32))

    def packet():
        return pl.pallas_call(
            k_packet,
            out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table)

    probe("scalar-cursor 512 steps", jax.jit(packet))


if __name__ == "__main__":
    main()
