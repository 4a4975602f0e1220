"""Any-hit occlusion path (round-4 NEE shadow fast path): the Pallas
any-hit kernel vs brute-force triangle tests, occlusion_query vs
closest-hit visibility, and estimator parity of anyhit_shadows on/off
(Sampler.cs:261-296 visibility semantics)."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ptsharp_tpu.integrator import IntegratorConfig, trace
from ptsharp_tpu.intersect import closest_hit, light_hit_t, occlusion_query
from ptsharp_tpu.materials import diffuse_material, light_material
from ptsharp_tpu.pallas import wide_kernel as wk
from ptsharp_tpu.scene import PT_SPHERE, SceneBuilder
from ptsharp_tpu.geometry.mesh import cube_mesh, sphere_mesh


def _mesh_scene(intersector="pallas"):
    b = SceneBuilder()
    b.add_mesh(sphere_mesh([0, 0.4, 0], 1.0, subdivisions=2),
               diffuse_material([0.5, 0.5, 0.5]))
    b.add_mesh(cube_mesh([1.6, -0.3, -0.3], [2.2, 0.3, 0.3]),
               diffuse_material([0.9, 0.6, 0.2]))
    return b.build(leaf_size=8, intersector=intersector, wide_k=8)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32) + [0.5, 0.3, 0]
    d = np.where(rng.random((n, 1)) < 0.6,
                 tgt - org, rng.normal(size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_anyhit_kernel_matches_closest_hit_boolean():
    """occluded(t_cut) must equal (closest-hit t < t_cut) for every ray
    and a spread of cut distances, including t_cut <= 0 lanes."""
    sp = _mesh_scene()
    org, d = _rays(512)
    rng = np.random.default_rng(3)
    t_cut = jnp.asarray(
        np.where(rng.random(512) < 0.1, -1.0,
                 rng.uniform(0.2, 6.0, 512)).astype(np.float32))
    # flat tables: one range covers every instance
    for b0, e0 in zip(sp.p_inst_base, sp.p_inst_end):
        t_ref, _s, _u, _v = wk.pallas_traverse_wide(
            sp.p_rows, sp.p_leaf, org, d, t_cut,
            b0, e0, sp.max_leaf, sp.wide_k, tile=256)
        occ = wk.pallas_occluded_wide8(
            sp.p_rows, sp.p_leaf, org, d, t_cut,
            b0, e0, sp.max_leaf, sp.wide_k)
        np.testing.assert_array_equal(
            np.asarray(occ), np.asarray(t_ref) < 1e8)


def test_occlusion_query_matches_closest_hit():
    """Scene-level boolean query == bounded closest-hit on both pallas and
    wide intersectors."""
    for inter in ("pallas", "wide"):
        sp = _mesh_scene(inter)
        org, d = _rays(512, seed=7)
        t_cut = jnp.full((512,), 3.0, jnp.float32)
        occ = occlusion_query(sp, org, d, t_cut)
        h = closest_hit(sp, org, d, t_max=t_cut)
        np.testing.assert_array_equal(np.asarray(occ),
                                      np.asarray(h.t) < 1e8)


def test_light_hit_t_sphere():
    b = SceneBuilder()
    b.add_plane([0, 0, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
    b.add_sphere([0, 5, 0], 1.0, light_material([1, 1, 1], 10.0))
    sp = b.build()
    assert sp.light_types == (PT_SPHERE,)
    org = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    lidx = jnp.zeros(2, jnp.int32)
    t = np.asarray(light_hit_t(sp, org, dirn, lidx))
    assert abs(t[0] - 4.0) < 1e-4       # straight up into the sphere
    assert t[1] > 1e8                   # parallel line misses


def test_trace_anyhit_matches_closest_visibility():
    """Full NEE estimator with anyhit on vs off agrees in expectation
    (per-lane visibility can differ only at epsilon-grazing samples)."""
    b = SceneBuilder()
    b.add_plane([0, 0, 0], [0, 1, 0], diffuse_material([0.7, 0.7, 0.7]))
    b.add_mesh(sphere_mesh([0, 0.6, 0], 0.6, subdivisions=2),
               diffuse_material([0.6, 0.3, 0.2]))
    b.add_sphere([2.0, 4.0, -1.0], 0.8, light_material([1, 1, 1], 12.0))
    sp = b.build(leaf_size=8, intersector="pallas", wide_k=8)
    icfg = IntegratorConfig(max_bounces=3)
    key = jax.random.PRNGKey(5)
    n = 2048
    rng = np.random.default_rng(11)
    org = jnp.asarray(
        rng.uniform(-2, 2, (n, 3)).astype(np.float32) * [1, 0.3, 1]
        + [0, 1.5, -3.0])
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r_any = trace(sp, replace(icfg, anyhit_shadows=True), org, d, key)
    r_cls = trace(sp, replace(icfg, anyhit_shadows=False), org, d, key)
    a = np.asarray(r_any.radiance)
    c = np.asarray(r_cls.radiance)
    # identical RNG chain: lanes differ only where visibility eps flips
    frac_diff = np.mean(np.any(np.abs(a - c) > 1e-5, axis=-1))
    assert frac_diff < 0.02, frac_diff
    assert abs(a.mean() - c.mean()) / max(c.mean(), 1e-9) < 0.02


def test_fat_anyhit_matches_fat_closest_boolean():
    """pallas_occluded_hbm8_fat == (fat closest-hit t < t_cut) on the same
    fat table (interpret mode; the compiled path is gated by
    tests/test_tpu_compiled.py on a real chip)."""
    from ptsharp_tpu.pallas import hbm_kernel as hk

    sp = _mesh_scene()
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(512, seed=17)
    rng = np.random.default_rng(8)
    t_cut = jnp.asarray(
        np.where(rng.random(512) < 0.1, -1.0,
                 rng.uniform(0.2, 6.0, 512)).astype(np.float32))
    b0, e0 = sp.p_inst_base[0], sp.p_inst_end[0]
    t_ref, _s, _u, _v = hk.pallas_traverse_hbm8_fat(
        fat, org, d, t_cut, b0, e0, sp.max_leaf, sp.wide_k)
    occ = hk.pallas_occluded_hbm8_fat(
        fat, org, d, t_cut, b0, e0, sp.max_leaf, sp.wide_k)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(t_ref) < 1e8)


def test_fat_anyhit_pipe_mt_gate_matches():
    """The pipelined any-hit kernel with the MT gate (production HBM
    occlusion path) must agree with the ungated fat any-hit kernel."""
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok

    sp = _mesh_scene()
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(512, seed=21)
    rng = np.random.default_rng(9)
    t_cut = jnp.asarray(
        np.where(rng.random(512) < 0.1, -1.0,
                 rng.uniform(0.2, 6.0, 512)).astype(np.float32))
    b0, e0 = sp.p_inst_base[0], sp.p_inst_end[0]
    ref = hk.pallas_occluded_hbm8_fat(
        fat, org, d, t_cut, b0, e0, sp.max_leaf, sp.wide_k)
    for gate in (False, True):
        occ = ok.pallas_occluded_fat_pipe(
            fat, org, d, t_cut, b0, e0, sp.max_leaf, sp.wide_k,
            mt_gate=gate)
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_ordered_fat_mt_gate_and_dual_match():
    """Round-5 closest-hit variants over a pack_fat table: the MT-gated
    pipelined kernel (production) and the dual-packet kernel must return
    identical (t, slot, u, v) to the preorder fat kernel."""
    from ptsharp_tpu.pallas import hbm_kernel as hk
    from ptsharp_tpu.pallas import ordered_kernel as ok

    sp = _mesh_scene()
    fat = jnp.asarray(hk.pack_fat(sp.p_rows, sp.p_leaf, sp.max_leaf))
    org, d = _rays(3000, seed=23)   # non-multiple of 2048: dual padding
    b0, e0 = sp.p_inst_base[0], sp.p_inst_end[0]
    t0, s0, u0, v0 = hk.pallas_traverse_hbm8_fat(
        fat, org, d, 1e9, b0, e0, sp.max_leaf, sp.wide_k)
    t1, s1, u1, v1 = ok.pallas_traverse_ordered8_fat(
        fat, org, d, 1e9, b0, e0, sp.max_leaf, sp.wide_k,
        order_mode="near", pipelined=True, mt_gate=True)
    t2, s2, u2, v2 = ok.pallas_traverse_ordered8_fat_dual(
        fat, org, d, 1e9, b0, e0, sp.max_leaf, sp.wide_k, mt_gate=True)
    for t, s, u, v in ((t1, s1, u1, v1), (t2, s2, u2, v2)):
        np.testing.assert_allclose(np.asarray(t), np.asarray(t0),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))
        np.testing.assert_allclose(np.asarray(u), np.asarray(u0),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0),
                                   atol=1e-4)
