"""Compiled-kernel parity on a REAL TPU chip (VERDICT r3 item 7).

The interpret-mode tests (test_pallas_wide.py, test_anyhit.py) validate
kernel logic but cannot catch Mosaic miscompiles. These tests run the
compiled kernels against the XLA wide walk and are skipped everywhere
except a genuine TPU backend (the CPU CI mesh skips them; the tunnel chip
runs them when available):

    JAX_PLATFORMS= PTSHARP_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py

Note conftest.py forces the cpu platform for the rest of the suite, so
these opt in via the PTSHARP_TPU_TESTS env var BEFORE conftest's override
is undone — the module re-initializes jax on the default backend.
"""

import os

import numpy as np
import pytest

RUN = os.environ.get("PTSHARP_TPU_TESTS", "") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="set PTSHARP_TPU_TESTS=1 on a machine with a TPU")

if RUN:
    import jax

    jax.config.update("jax_platforms", None)
    if jax.default_backend() not in ("tpu", "axon"):
        pytestmark = pytest.mark.skip(reason="no TPU backend present")


def _scene():
    import jax.numpy as jnp  # noqa: F401

    from ptsharp_tpu.geometry.mesh import cube_mesh, sphere_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add_mesh(sphere_mesh([0, 0.4, 0], 1.0, subdivisions=3),
               diffuse_material([0.5, 0.5, 0.5]))
    b.add_mesh(cube_mesh([1.6, -0.3, -0.3], [2.2, 0.3, 0.3]),
               diffuse_material([0.9, 0.6, 0.2]))
    return b.build(leaf_size=8, intersector="pallas", wide_k=8)


def _rays(n, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32) + [0.5, 0.3, 0]
    d = np.where(rng.random((n, 1)) < 0.6,
                 tgt - org, rng.normal(size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_compiled_wide8_matches_xla_walk():
    """Compiled flat-table kernel vs the XLA wide walk union over both
    instances (t parity + slot parity through the p_slot_tri map)."""
    import jax.numpy as jnp

    from ptsharp_tpu.accel.traverse import traverse_wide_chunked
    from ptsharp_tpu.core import vec
    from ptsharp_tpu.pallas import wide_kernel as wk

    sp = _scene()
    org, d = _rays(4096)
    t_ref = jnp.full((4096,), vec.INF)
    s_ref = jnp.full((4096,), -1, jnp.int32)
    for i in range(2):
        ti, si, _u, _v = traverse_wide_chunked(
            sp.w_rows, sp.leaf_rows, org, d, t_ref,
            sp.w_inst_base[i], sp.w_inst_end[i], sp.max_leaf, sp.wide_k)
        better = ti < t_ref
        t_ref = jnp.where(better, ti, t_ref)
        s_ref = jnp.where(better, si, s_ref)
    t, s, _u2, _v2 = wk.pallas_traverse_wide8(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(t_ref) < 1e8
    s_mapped = np.asarray(sp.p_slot_tri)[np.clip(np.asarray(s), 0, None)]
    np.testing.assert_array_equal(s_mapped[hit], np.asarray(s_ref)[hit])


def test_compiled_anyhit_matches_bounded_walk():
    from ptsharp_tpu.pallas import wide_kernel as wk

    sp = _scene()
    org, d = _rays(4096, seed=5)
    rng = np.random.default_rng(9)
    import jax.numpy as jnp

    t_cut = jnp.asarray(rng.uniform(0.2, 5.0, 4096).astype(np.float32))
    for b0, e0 in zip(sp.p_inst_base, sp.p_inst_end):
        t_ref, _s, _u, _v = wk.pallas_traverse_wide8(
            sp.p_rows, sp.p_leaf, org, d, t_cut,
            b0, e0, sp.max_leaf, sp.wide_k, interpret=False)
        occ = wk.pallas_occluded_wide8(
            sp.p_rows, sp.p_leaf, org, d, t_cut,
            b0, e0, sp.max_leaf, sp.wide_k, interpret=False)
        np.testing.assert_array_equal(np.asarray(occ),
                                      np.asarray(t_ref) < 1e8)


def test_compiled_hbm_fat_matches_vmem_kernel():
    """Small-scene fat-row streaming-kernel parity (fast compile)."""
    import jax.numpy as jnp

    from ptsharp_tpu.core import vec
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import wide_kernel as wk

    sp = _scene()
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(4096, seed=2)
    t1, s1, _u1, _v1 = wk.pallas_traverse_wide8(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    t2, s2, _u2, _v2 = hk.pallas_traverse_hbm8_fat(
        fat, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-6)
    hit = np.asarray(t1) < 1e8
    np.testing.assert_array_equal(np.asarray(s2)[hit], np.asarray(s1)[hit])


def test_compiled_hbm_fat_matches_vmem_kernel_bunny_scale():
    """Bunny-scale (82k tris) streaming-kernel parity: the round-4
    two-DMA-cluster miscompile returned ZERO hits at exactly this scale
    while passing at small scale (pack_fat docstring) — this test is the
    on-chip regression gate for the single-DMA fat-row design."""
    import jax.numpy as jnp

    from ptsharp_tpu.core import vec
    from ptsharp_tpu.geometry.mesh import sphere_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import wide_kernel as wk
    from ptsharp_tpu.scene import SceneBuilder

    from ptsharp_tpu.examples import _bunny_mesh

    b = SceneBuilder()
    # the displaced-bunny mesh: the plain sphere-subdiv6 table shape
    # crashes the tunnel's compile helper (exit 1, the exp_sigill hazard
    # class) for the VMEM kernel; bunny-class tables compile reliably
    b.add_mesh(_bunny_mesh(6), diffuse_material([0.5, 0.5, 0.5]))
    sp = b.build(leaf_size=8, intersector="pallas", wide_k=8)
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(4096, seed=4)
    t1, _s1, _u1, _v1 = wk.pallas_traverse_wide8(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    t2, _s2, _u2, _v2 = hk.pallas_traverse_hbm8_fat(
        fat, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    assert (np.asarray(t1) < 1e8).mean() > 0.1  # rays do hit the mesh
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-6)


def test_compiled_ordered8_matches_wide8_bunny_scale():
    """Compiled ordered-stack kernel (the round-5 production closest-hit
    for VMEM tables) vs the preorder skip-walk at bunny scale."""
    import jax.numpy as jnp

    from ptsharp_tpu.core import vec
    from ptsharp_tpu.examples import _bunny_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas import wide_kernel as wk
    from ptsharp_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add_mesh(_bunny_mesh(6), diffuse_material([0.5, 0.5, 0.5]))
    sp = b.build(leaf_size=8, intersector="pallas", wide_k=8)
    assert not sp.p_hbm
    org, d = _rays(4096, seed=11)
    t1, s1, _u1, _v1 = wk.pallas_traverse_wide8(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    for mode in ("near", "full"):
        t2, s2, _u2, _v2 = ok.pallas_traverse_ordered8(
            sp.p_rows, sp.p_leaf, org, d, vec.INF,
            sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
            interpret=False, order_mode=mode)
        assert (np.asarray(t1) < 1e8).mean() > 0.1
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                                   rtol=1e-6)
        hit = np.asarray(t1) < 1e8
        np.testing.assert_array_equal(np.asarray(s2)[hit],
                                      np.asarray(s1)[hit])


def test_compiled_ordered_fat_pipelined_beyond_vmem_budget():
    """HBM-REGIME compiled parity (VERDICT r4 item 8): tables provably
    exceed VMEM_TABLE_BUDGET, so the streaming path's whole reason to
    exist — the scale regime — is what runs on-chip here. Compares the
    round-5 production ordered+pipelined-DMA fat kernel against the
    preorder fat kernel on a 327k-tri mesh (~61 MB of tables)."""
    import jax.numpy as jnp

    from ptsharp_tpu.core import vec
    from ptsharp_tpu.examples import _bunny_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok
    from ptsharp_tpu.pallas.wide_kernel import VMEM_TABLE_BUDGET
    from ptsharp_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add_mesh(_bunny_mesh(7), diffuse_material([0.5, 0.5, 0.5]))
    sp = b.build(leaf_size=14, intersector="pallas", wide_k=8)
    assert sp.p_hbm, "scene must be in the HBM streaming regime"
    assert sp.p_rows.size * 4 > 2 * VMEM_TABLE_BUDGET
    org, d = _rays(4096, seed=12)
    t1, s1, _u1, _v1 = hk.pallas_traverse_hbm8_fat(
        sp.p_rows, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    t2, s2, _u2, _v2 = ok.pallas_traverse_ordered8_fat(
        sp.p_rows, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False, order_mode="near", pipelined=True)
    assert (np.asarray(t1) < 1e8).mean() > 0.1
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-6)
    hit = np.asarray(t1) < 1e8
    np.testing.assert_array_equal(np.asarray(s2)[hit], np.asarray(s1)[hit])


def test_compiled_hbm_fat_anyhit_bunny_scale():
    """Compiled fat-row any-hit vs fat closest-hit boolean at bunny scale."""
    import jax.numpy as jnp

    from ptsharp_tpu.geometry.mesh import sphere_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.scene import SceneBuilder

    from ptsharp_tpu.examples import _bunny_mesh

    b = SceneBuilder()
    b.add_mesh(_bunny_mesh(6), diffuse_material([0.5, 0.5, 0.5]))
    sp = b.build(leaf_size=8, intersector="pallas", wide_k=8)
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(4096, seed=6)
    rng = np.random.default_rng(3)
    t_cut = jnp.asarray(rng.uniform(0.2, 5.0, 4096).astype(np.float32))
    t_ref, _s, _u, _v = hk.pallas_traverse_hbm8_fat(
        fat, org, d, t_cut,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    occ = hk.pallas_occluded_hbm8_fat(
        fat, org, d, t_cut,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        interpret=False)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(t_ref) < 1e8)
