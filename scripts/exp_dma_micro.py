"""Micro-repro for the HBM streaming kernel's DMA pattern: does a
dynamically-indexed block DMA (index extracted from a vector register)
land correctly in compiled Mosaic? Three variants isolate the moving
parts: static index, SMEM-scalar index, vector-extracted index, and a
predicated (@pl.when) fetch driven by SMEM cache tags."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 64


def make_table(n_rows=1024):
    return jnp.asarray(
        np.arange(n_rows * 128, dtype=np.float32).reshape(n_rows, 128))


def variant_static(table):
    def kern(tab_ref, idx_ref, out_ref, cache, sem):
        pltpu.make_async_copy(
            tab_ref.at[pl.ds(3 * BLK, BLK)], cache, sem).start()
        pltpu.make_async_copy(
            tab_ref.at[pl.ds(3 * BLK, BLK)], cache, sem).wait()
        out_ref[0, :] = cache[5]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=False,
    )(table, jnp.zeros((1, 128), jnp.int32))


def variant_vector_extract(table):
    """Index comes from a vector register extraction (the kernel's jg[g])."""
    def kern(tab_ref, idx_ref, out_ref, cache, sem):
        iv = idx_ref[0, :].reshape(8, 16)
        bg = iv[2, 0] // BLK  # vector-extracted scalar
        pltpu.make_async_copy(
            tab_ref.at[pl.ds(bg * BLK, BLK)], cache, sem).start()
        pltpu.make_async_copy(
            tab_ref.at[pl.ds(bg * BLK, BLK)], cache, sem).wait()
        out_ref[0, :] = cache[5]

    idx = jnp.full((1, 128), 3 * BLK + 7, jnp.int32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=False,
    )(table, idx)


def variant_while_when(table):
    """Full pattern: while_loop + SMEM tags + @pl.when-predicated DMA +
    vector-extracted dynamic index."""
    def kern(tab_ref, idx_ref, out_ref, cache, tag, sem):
        tag[0] = -1

        def cond(s):
            it, acc = s
            return it < 4

        def body(s):
            it, acc = s
            iv = idx_ref[0, :].reshape(8, 16)
            bg = (iv[2, 0] + it * BLK) // BLK
            need = bg != tag[0]

            @pl.when(need)
            def _():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(bg * BLK, BLK)], cache, sem).start()

            @pl.when(need)
            def _():
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(bg * BLK, BLK)], cache, sem).wait()
            tag[0] = bg
            acc = acc + cache[5]
            return it + 1, acc

        _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((128,), jnp.float32)))
        out_ref[0, :] = acc

    idx = jnp.full((1, 128), 2 * BLK, jnp.int32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=False,
    )(table, idx)


if __name__ == "__main__":
    tab = make_table()
    ref = np.asarray(tab)

    out = np.asarray(variant_static(tab))[0]
    want = ref[3 * BLK + 5]
    print("static  :", "OK" if np.array_equal(out, want) else
          f"MISMATCH got {out[:3]} want {want[:3]}")

    out = np.asarray(variant_vector_extract(tab))[0]
    want = ref[3 * BLK + 5]
    print("vec-ext :", "OK" if np.array_equal(out, want) else
          f"MISMATCH got {out[:3]} want {want[:3]}")

    out = np.asarray(variant_while_when(tab))[0]
    # blocks 2,3,4,5 -> rows 2*64+5, 3*64+5, ...
    want = sum(ref[(2 + i) * BLK + 5] for i in range(4))
    print("while   :", "OK" if np.allclose(out, want) else
          f"MISMATCH got {out[:3]} want {want[:3]}")


def variant_groups(table, idx_vals):
    """Kernel-faithful fetch: 8 groups, per-group sem, sliced destination,
    predicated by SMEM tags, then dynamic row read back (one iteration)."""
    G = 8

    def kern(tab_ref, idx_ref, out_ref, cache, nscr, tag, sem):
        for g in range(G):
            tag[g] = -1
        iv = idx_ref[0, :].reshape(8, 16)
        jg = [iv[g, 0] for g in range(G)]
        bg = [jg[g] // BLK for g in range(G)]
        for g in range(G):
            need = bg[g] != tag[g]

            @pl.when(need)
            def _(g=g, b=bg[g]):
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(b * BLK, BLK)],
                    cache.at[pl.ds(g * BLK, BLK)], sem.at[g]).start()
        for g in range(G):
            need = bg[g] != tag[g]

            @pl.when(need)
            def _(g=g, b=bg[g]):
                pltpu.make_async_copy(
                    tab_ref.at[pl.ds(b * BLK, BLK)],
                    cache.at[pl.ds(g * BLK, BLK)], sem.at[g]).wait()
        for g in range(G):
            tag[g] = bg[g]
        for g in range(G):
            nscr[g, :] = cache[g * BLK + jg[g] % BLK]
        out_ref[:, :] = nscr[:]

    idx = jnp.zeros((1, 128), jnp.int32)
    idx = idx.at[0, ::16].set(jnp.asarray(idx_vals, jnp.int32))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8 * BLK, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SMEM((8,), jnp.int32),
                        pltpu.SemaphoreType.DMA((8,))],
        interpret=False,
    )(table, idx)
