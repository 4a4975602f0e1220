"""Wide Pallas kernel (pallas/wide_kernel.py): parity with the XLA walks
through both the raw entry point and the intersector="pallas" dispatch
(interpret mode on CPU; the compiled path is exercised on real TPUs by
scripts/exp_widepallas.py and bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.core import vec
from ptsharp_tpu.geometry.mesh import cube_mesh, sphere_mesh
from ptsharp_tpu.intersect import closest_hit
from ptsharp_tpu.materials import diffuse_material
from ptsharp_tpu.pallas import wide_kernel as wk
from ptsharp_tpu.scene import SceneBuilder


def _builder(two_meshes=False):
    b = SceneBuilder()
    b.add_mesh(sphere_mesh([0, 0.4, 0], 1.0, subdivisions=2),
               diffuse_material([0.5, 0.5, 0.5]))
    if two_meshes:
        # second mesh with a leaf count that is not a CLUSTER_GROUP
        # multiple (the round-2 slot-layout regression shape)
        b.add_mesh(cube_mesh([1.6, -0.3, -0.3], [2.2, 0.3, 0.3]),
                   diffuse_material([0.9, 0.6, 0.2]))
    return b


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32) + [0.5, 0.3, 0]
    d = np.where(rng.random((n, 1)) < 0.6,
                 tgt - org, rng.normal(size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_wide_pallas_matches_walk_raw():
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    org, d = _rays(512)
    from ptsharp_tpu.accel.traverse import traverse_packed

    t_ref, s_ref, u_ref, v_ref = traverse_packed(
        sp.u_rows, sp.leaf_rows, org, d, vec.INF,
        int(sp.u_inst_base[0]), int(sp.u_inst_end[0]), sp.max_leaf)
    t, s, u, v = wk.pallas_traverse_wide(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        tile=256)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(t_ref) < 1e8
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(s)[hit], np.asarray(s_ref)[hit])
    np.testing.assert_allclose(np.asarray(u)[hit], np.asarray(u_ref)[hit],
                               rtol=1e-4, atol=1e-5)


def test_wide_pallas8_matches_walk():
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    org, d = _rays(1024 + 128, seed=11)  # padding path too
    from ptsharp_tpu.accel.traverse import traverse_packed

    t_ref, s_ref, u_ref, _ = traverse_packed(
        sp.u_rows, sp.leaf_rows, org, d, vec.INF,
        int(sp.u_inst_base[0]), int(sp.u_inst_end[0]), sp.max_leaf)
    t, s, u, v = wk.pallas_traverse_wide8(
        sp.p_rows, sp.p_leaf, org, d, vec.INF,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(t_ref) < 1e8
    assert hit.sum() > 100
    np.testing.assert_array_equal(np.asarray(s)[hit], np.asarray(s_ref)[hit])
    np.testing.assert_allclose(np.asarray(u)[hit], np.asarray(u_ref)[hit],
                               rtol=1e-4, atol=1e-5)


def test_wide_pallas_dispatch_multimesh():
    org, d = _rays(384, seed=2)  # not a tile multiple -> padding path
    sw = _builder(two_meshes=True).build(leaf_size=8, use_tlas=False)
    sp = _builder(two_meshes=True).build(leaf_size=8, intersector="pallas",
                                         wide_k=4)
    h_ref = closest_hit(sw, org, d)
    h = closest_hit(sp, org, d)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(h_ref.t),
                               rtol=1e-5, atol=1e-5)
    hit = np.asarray(h_ref.t) < 1e8
    assert hit.sum() > 30
    np.testing.assert_array_equal(np.asarray(h.pindex)[hit],
                                  np.asarray(h_ref.pindex)[hit])
    np.testing.assert_array_equal(np.asarray(h.inst)[hit],
                                  np.asarray(h_ref.inst)[hit])


def test_wide_pallas_tmax():
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    org, d = _rays(256, seed=5)
    from ptsharp_tpu.accel.traverse import traverse_packed

    t_ref, *_ = traverse_packed(
        sp.u_rows, sp.leaf_rows, org, d, 2.0,
        int(sp.u_inst_base[0]), int(sp.u_inst_end[0]), sp.max_leaf)
    t, *_ = wk.pallas_traverse_wide(
        sp.p_rows, sp.p_leaf, org, d, 2.0,
        sp.p_inst_base[0], sp.p_inst_end[0], sp.max_leaf, sp.wide_k,
        tile=256)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref),
                               rtol=1e-5, atol=1e-5)


def test_wide_pallas_render_smoke():
    """Full trace through the pallas dispatch matches the wide-walk trace
    (same scene, same key -> identical sampling decisions)."""
    from ptsharp_tpu.integrator import IntegratorConfig, trace

    b1 = _builder()
    b1.add_plane([0, -1, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
    b1.add_sphere([2, 4, -2], 1.0,
                  __import__("ptsharp_tpu.materials",
                             fromlist=["light_material"]).light_material(
                      [1, 1, 1], 5.0))
    sw = b1.build(leaf_size=8)
    b2 = _builder()
    b2.add_plane([0, -1, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
    b2.add_sphere([2, 4, -2], 1.0,
                  __import__("ptsharp_tpu.materials",
                             fromlist=["light_material"]).light_material(
                      [1, 1, 1], 5.0))
    sp = b2.build(leaf_size=8, intersector="pallas", wide_k=8)
    org, d = _rays(256, seed=7)
    icfg = IntegratorConfig(max_bounces=2)
    key = jax.random.PRNGKey(0)
    r_ref = trace(sw, icfg, org, d, key).radiance
    r = trace(sp, icfg, org, d, key).radiance
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_vmem_fallback():
    """Oversized meshes fall back to the wide walk with a warning instead
    of failing at kernel compile (tables must be VMEM-resident)."""
    import warnings

    from ptsharp_tpu.geometry.mesh import sphere_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.scene import SceneBuilder

    b2 = SceneBuilder()
    b2.add_mesh(sphere_mesh([0, 0, 0], 1.0, subdivisions=6),
                diffuse_material([0.5, 0.5, 0.5]))  # 81,920 tris
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        s2 = b2.build(leaf_size=1, intersector="pallas", wide_k=8)
    assert s2.intersector == "wide"
    assert any("VMEM budget" in str(x.message) for x in w2)


def test_pallas_tables_budget():
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    from ptsharp_tpu.pallas.wide_kernel import PallasTables, fits_vmem

    tabs = PallasTables(sp.p_rows, sp.p_leaf, None, None, None,
                        sp.max_leaf, sp.wide_k)
    assert fits_vmem(tabs)
