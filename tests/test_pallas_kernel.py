"""Pallas fused BVH+Möller-Trumbore kernel: parity with the packed walk
(interpret mode on CPU; the compiled path is exercised on real TPUs by
scripts/exp_pallas2.py and the intersector dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.accel.traverse import traverse_packed
from ptsharp_tpu.core import vec
from ptsharp_tpu.geometry.mesh import sphere_mesh
from ptsharp_tpu.materials import diffuse_material
from ptsharp_tpu.pallas.traverse_kernel import fits_vmem, pallas_traverse
from ptsharp_tpu.scene import SceneBuilder


def _scene():
    b = SceneBuilder()
    b.add_mesh(sphere_mesh([0, 0.4, 0], 1.0, subdivisions=2),
               diffuse_material([0.5, 0.5, 0.5]))
    return b.build(leaf_size=8)


def test_pallas_traverse_matches_walk():
    scene = _scene()
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    rng = np.random.default_rng(0)
    n = 512
    org = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    # aim half the rays at the sphere so hits are plentiful
    tgt = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32) + [0, 0.4, 0]
    d = np.where(rng.random((n, 1)) < 0.5,
                 tgt - np.asarray(org),
                 rng.normal(size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    t_ref, s_ref, u_ref, v_ref = traverse_packed(
        scene.u_rows, scene.leaf_rows, org, d, vec.INF, base, end, 8
    )
    t, s, u, v = pallas_traverse(
        scene.u_rows, scene.leaf_rows, org, d, vec.INF, base, end, 8,
        tile=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(t_ref) < 1e8
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(s)[hit], np.asarray(s_ref)[hit])
    np.testing.assert_allclose(np.asarray(u)[hit], np.asarray(u_ref)[hit],
                               rtol=1e-4, atol=1e-5)


def test_pallas_traverse_tmax_and_padding():
    scene = _scene()
    base = int(scene.u_inst_base[0])
    end = int(scene.u_inst_end[0])
    rng = np.random.default_rng(1)
    n = 300  # not a tile multiple -> exercises padding
    org = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_ref, *_ = traverse_packed(
        scene.u_rows, scene.leaf_rows, org, d, 2.0, base, end, 8
    )
    t, *_ = pallas_traverse(scene.u_rows, scene.leaf_rows, org, d, 2.0,
                            base, end, 8, tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)


def test_fits_vmem_guard():
    scene = _scene()
    assert fits_vmem(scene.u_rows, scene.leaf_rows)
    assert not fits_vmem(scene.u_rows, scene.leaf_rows, budget_bytes=64)
