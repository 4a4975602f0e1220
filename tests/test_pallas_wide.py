"""Wide Pallas kernel (pallas/wide_kernel.py): parity with the XLA walks
through both the raw entry point and the intersector="pallas" dispatch
(interpret mode on CPU; the compiled path is exercised on real TPUs by
scripts/exp_widepallas.py and bench.py)."""

import pytest
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
    """Raw kernel vs XLA walk. The pallas tables are now the FLAT
    world-space tree (one tree over all instances) whose kernel slots map
    through p_slot_tri back to scene slots."""
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    assert sp.p_flat
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
    s_mapped = np.asarray(sp.p_slot_tri)[np.clip(np.asarray(s), 0, None)]
    np.testing.assert_array_equal(s_mapped[hit], np.asarray(s_ref)[hit])
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
    s_mapped = np.asarray(sp.p_slot_tri)[np.clip(np.asarray(s), 0, None)]
    np.testing.assert_array_equal(s_mapped[hit], np.asarray(s_ref)[hit])
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


@pytest.mark.slow
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


def test_pallas_oversized_goes_hbm():
    """Oversized tables no longer fall back to the XLA walk: they stay on
    the pallas path with an HBM-resident FAT table (interleaved node +
    leaf rows, one DMA per packet step) streamed by pallas/hbm_kernel.py,
    and closest-hit still matches."""
    from ptsharp_tpu.geometry.mesh import sphere_mesh
    from ptsharp_tpu.materials import diffuse_material
    from ptsharp_tpu.scene import SceneBuilder

    b2 = SceneBuilder()
    b2.add_mesh(sphere_mesh([0, 0, 0], 1.0, subdivisions=6),
                diffuse_material([0.5, 0.5, 0.5]))  # 81,920 tris
    s2 = b2.build(leaf_size=1, intersector="pallas", wide_k=8)
    assert s2.intersector == "pallas"
    assert s2.p_hbm
    assert s2.p_rows.shape[0] % 2 == 0  # fat pairs
    assert s2.p_leaf.shape[0] == 0      # folded into the fat table
    b3 = SceneBuilder()
    b3.add_mesh(sphere_mesh([0, 0, 0], 1.0, subdivisions=6),
                diffuse_material([0.5, 0.5, 0.5]))
    s3 = b3.build(leaf_size=1)  # wide-walk reference
    org, d = _rays(256, seed=13)
    h = closest_hit(s2, org, d)
    h_ref = closest_hit(s3, org, d)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(h_ref.t),
                               rtol=1e-5, atol=1e-5)


def test_pallas_tables_budget():
    sp = _builder().build(leaf_size=8, intersector="pallas", wide_k=8)
    from ptsharp_tpu.pallas.wide_kernel import PallasTables, fits_vmem

    tabs = PallasTables(sp.p_rows, sp.p_leaf, None, None, None,
                        sp.max_leaf, sp.wide_k)
    assert fits_vmem(tabs)


def test_flat_tables_instancing_parity():
    """Instancing scenes (reference toybrick/go class, Example.cs:1229,
    :248) run ONE flat world-space kernel launch: closest-hit must match
    the TLAS wide-walk build (pindex/inst map through the slot tables)."""
    from ptsharp_tpu.core import transform
    from ptsharp_tpu.geometry.mesh import cube_mesh

    def build_wall(**bkw):
        b = SceneBuilder()
        brick = cube_mesh([0, 0, 0], [1.9, 0.9, 0.9])
        mid = None
        for r_ in range(3):
            for c_ in range(4):
                t = transform.translate(
                    [c_ * 2.0 + (1.0 if r_ % 2 else 0.0) - 4, r_ * 1.0, 0])
                mat = diffuse_material([0.2 + 0.2 * c_, 0.3, 0.8 - 0.2 * r_])
                if mid is None:
                    mid = b.add_mesh(brick, mat, transform=t)
                else:
                    b.add_mesh_instance(mid, transform=t, material=mat)
        b.add_plane([0, 0, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
        return b.build(leaf_size=4, **bkw)

    sw = build_wall()
    sp = build_wall(intersector="pallas", wide_k=8)
    assert sp.p_flat and len(sp.p_inst_base) == 1
    rng = np.random.default_rng(21)
    n = 512
    org = jnp.asarray(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32) * [6, 2, 3]
        + [0, 1.5, -8])
    tgt = jnp.asarray(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32) * [4, 1.5, 0.4]
        + [0, 1.5, 0.5])
    d = tgt - org
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h_ref = closest_hit(sw, org, d)
    h = closest_hit(sp, org, d)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(h_ref.t),
                               rtol=1e-4, atol=1e-4)
    hit = (np.asarray(h_ref.ptype) == 5) & (np.asarray(h_ref.t) < 1e8)
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(h.inst)[hit],
                                  np.asarray(h_ref.inst)[hit])
    np.testing.assert_array_equal(np.asarray(h.pindex)[hit],
                                  np.asarray(h_ref.pindex)[hit])
