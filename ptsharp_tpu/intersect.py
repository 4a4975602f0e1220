"""Scene-wide closest-hit over ray wavefronts.

The replacement for the reference's Scene.Intersect -> k-d tree descent ->
virtual IShape.Intersect chain (Scene.cs:75-79, Tree.cs:67-128). Per
primitive *type* the whole batch is intersected in one vectorized pass
(brute-force SoA tables for analytic primitives, flattened-BVH traversal for
triangles, while-loop marches for SDF/volume), then a min-t select across
types yields the winner. Python-level `if` on table sizes specializes each
scene's kernel at trace time — absent types cost nothing.

Hit record semantics mirror Hit.Info (Hit.cs:26-55): shading normal flipped
toward the ray, `inside` flag set on flip except for SDF/volume shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ptsharp_tpu.core import vec
from ptsharp_tpu.geometry import function as fn_mod
from ptsharp_tpu.geometry import primitives, sdf as sdf_mod, volume as vol_mod
from ptsharp_tpu.accel import traverse
from ptsharp_tpu.scene import (
    PT_CUBE,
    PT_CYLINDER,
    PT_FUNCTION,
    PT_NONE,
    PT_PLANE,
    PT_SDF,
    PT_SPHERE,
    PT_TRIANGLE,
    PT_VOLUME,
    SceneData,
)

INF = vec.INF


class Hit(NamedTuple):
    """Per-ray closest hit. pindex is the within-type primitive index
    (sorted-triangle index for meshes); inst is the mesh instance id
    (-1 otherwise)."""

    t: jnp.ndarray
    ptype: jnp.ndarray
    pindex: jnp.ndarray
    inst: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


class HitInfo(NamedTuple):
    """Shading data for hit rays (garbage where ptype == PT_NONE)."""

    position: jnp.ndarray
    normal: jnp.ndarray  # flipped toward the ray (Hit.cs:36-47)
    inside: jnp.ndarray
    mat_id: jnp.ndarray
    tex_u: jnp.ndarray
    tex_v: jnp.ndarray


def _xform_point(aff, p):
    """aff (..., 3, 4) applied to points p (..., 3)."""
    return jnp.einsum("...ij,...j->...i", aff[..., :3], p) + aff[..., 3]


def _xform_dir(aff, d):
    return jnp.einsum("...ij,...j->...i", aff[..., :3], d)


def _xform_normal(aff_inv, n):
    """normal transform = inverse-transpose of the linear part; aff_inv is
    already the world->object affine, so n_world ~ aff_inv_lin^T n_obj."""
    return vec.normalize(jnp.einsum("...ji,...j->...i", aff_inv[..., :3], n))


def closest_hit(scene: SceneData, org, dirn) -> Hit:
    """org/dirn (R, 3), unit directions. Returns the closest hit per ray."""
    r = org.shape[0]
    best_t = jnp.full(r, INF, jnp.float32)
    best_type = jnp.zeros(r, jnp.int32)
    best_idx = jnp.full(r, -1, jnp.int32)
    best_inst = jnp.full(r, -1, jnp.int32)
    best_u = jnp.zeros(r, jnp.float32)
    best_v = jnp.zeros(r, jnp.float32)

    def take(t_new, ptype, pidx, inst=None, u=None, v=None):
        nonlocal best_t, best_type, best_idx, best_inst, best_u, best_v
        better = t_new < best_t
        best_t = jnp.where(better, t_new, best_t)
        best_type = jnp.where(better, ptype, best_type)
        best_idx = jnp.where(better, pidx, best_idx)
        best_inst = jnp.where(better, inst if inst is not None else -1, best_inst)
        best_u = jnp.where(better, u if u is not None else 0.0, best_u)
        best_v = jnp.where(better, v if v is not None else 0.0, best_v)

    o1 = org[:, None, :]
    d1 = dirn[:, None, :]

    # --- spheres ----------------------------------------------------------
    if scene.sphere_center.shape[0] > 0:
        if scene.sphere_xform:
            o = _xform_point(scene.sphere_inv[None], o1)
            d = _xform_dir(scene.sphere_inv[None], d1)
        else:
            o, d = o1, d1
        ts = primitives.intersect_spheres(o, d, scene.sphere_center, scene.sphere_radius)
        idx = jnp.argmin(ts, axis=1)
        tmin = jnp.min(ts, axis=1)
        take(tmin, PT_SPHERE, idx.astype(jnp.int32))

    # --- planes -----------------------------------------------------------
    if scene.plane_point.shape[0] > 0:
        ts = primitives.intersect_planes(o1, d1, scene.plane_point, scene.plane_normal)
        idx = jnp.argmin(ts, axis=1)
        tmin = jnp.min(ts, axis=1)
        take(tmin, PT_PLANE, idx.astype(jnp.int32))

    # --- cubes ------------------------------------------------------------
    if scene.cube_min.shape[0] > 0:
        if scene.cube_xform:
            o = _xform_point(scene.cube_inv[None], o1)
            d = _xform_dir(scene.cube_inv[None], d1)
        else:
            o, d = o1, d1
        ts = primitives.intersect_cubes(o, d, scene.cube_min, scene.cube_max)
        idx = jnp.argmin(ts, axis=1)
        tmin = jnp.min(ts, axis=1)
        take(tmin, PT_CUBE, idx.astype(jnp.int32))

    # --- cylinders --------------------------------------------------------
    if scene.cyl_radius.shape[0] > 0:
        if scene.cyl_xform:
            o = _xform_point(scene.cyl_inv[None], o1)
            d = _xform_dir(scene.cyl_inv[None], d1)
        else:
            o, d = o1, d1
        ts = primitives.intersect_cylinders(o, d, scene.cyl_radius, scene.cyl_z0, scene.cyl_z1)
        idx = jnp.argmin(ts, axis=1)
        tmin = jnp.min(ts, axis=1)
        take(tmin, PT_CYLINDER, idx.astype(jnp.int32))

    # --- mesh instances (flattened BVH traversal) -------------------------
    n_inst = scene.inst_inv.shape[0]
    if n_inst > 0:
        mesh_arrays = traverse.MeshArrays(
            node_bmin=scene.node_bmin,
            node_bmax=scene.node_bmax,
            node_first=scene.node_first,
            node_count=scene.node_count,
            node_skip=scene.node_skip,
            v0=scene.tri_v0,
            e1=scene.tri_e1,
            e2=scene.tri_e2,
            max_leaf=scene.max_leaf,
        )
        for i in range(n_inst):
            inv = scene.inst_inv[i]
            o = _xform_point(inv[None], org)
            d = _xform_dir(inv[None], dirn)
            t, tri, u, v = traverse.traverse(
                mesh_arrays, o, d, best_t,
                scene.inst_node_base[i], scene.inst_node_end[i],
            )
            take(t, PT_TRIANGLE, tri, inst=jnp.int32(i), u=u, v=v)

    # --- SDF objects (sphere trace) ---------------------------------------
    for i, (sdf_obj, _mid, lo, hi) in enumerate(scene.sdf_objects):
        lo_a = jnp.asarray(lo, jnp.float32)
        hi_a = jnp.asarray(hi, jnp.float32)
        te, tx = primitives.box_entry_exit(org, dirn, lo_a, hi_a)
        tx = jnp.minimum(tx, best_t)
        t = sdf_mod.sphere_trace(sdf_obj, org, dirn, te, tx)
        take(t, PT_SDF, jnp.int32(i))

    # --- volumes ----------------------------------------------------------
    for i, vol in enumerate(scene.volumes):
        lo_a = jnp.asarray(vol.bmin, jnp.float32)
        hi_a = jnp.asarray(vol.bmax, jnp.float32)
        te, tx = primitives.box_entry_exit(org, dirn, lo_a, hi_a)
        tx = jnp.minimum(tx, best_t)
        t = vol_mod.intersect(scene.volume_data[i], vol, org, dirn, te, tx)
        take(t, PT_VOLUME, jnp.int32(i))

    # --- heightfield functions --------------------------------------------
    for i, (hf, _mid) in enumerate(scene.functions):
        lo_a = jnp.asarray(hf.bmin, jnp.float32)
        hi_a = jnp.asarray(hf.bmax, jnp.float32)
        te, tx = primitives.box_entry_exit(org, dirn, lo_a, hi_a)
        tx = jnp.minimum(tx, best_t)
        t = fn_mod.intersect(hf, org, dirn, te, tx)
        take(t, PT_FUNCTION, jnp.int32(i))

    return Hit(best_t, best_type, best_idx, best_inst, best_u, best_v)


def hit_info(scene: SceneData, org, dirn, hit: Hit) -> HitInfo:
    """Compute shading data for the winning primitive of each ray. Every
    present type's info is computed masked and selected — branchless over
    the wavefront (types absent from the scene are skipped statically)."""
    r = org.shape[0]
    pos = org + dirn * hit.t[..., None]
    normal = jnp.zeros((r, 3), jnp.float32)
    # default up-normal avoids NaNs in the miss lanes
    normal = normal.at[:, 1].set(1.0)
    mat_id = jnp.zeros(r, jnp.int32)
    tex_u = jnp.zeros(r, jnp.float32)
    tex_v = jnp.zeros(r, jnp.float32)

    def sel(mask, new_n, new_m, new_u=None, new_v=None):
        nonlocal normal, mat_id, tex_u, tex_v
        normal = jnp.where(mask[:, None], new_n, normal)
        mat_id = jnp.where(mask, new_m, mat_id)
        if new_u is not None:
            tex_u = jnp.where(mask, new_u, tex_u)
        if new_v is not None:
            tex_v = jnp.where(mask, new_v, tex_v)

    idx = jnp.maximum(hit.pindex, 0)

    if scene.sphere_center.shape[0] > 0:
        m = hit.ptype == PT_SPHERE
        c = scene.sphere_center[idx]
        rad = scene.sphere_radius[idx]
        if scene.sphere_xform:
            inv = scene.sphere_inv[idx]
            p_obj = _xform_point(inv, pos)
            n_obj = vec.normalize(p_obj - c)
            n = _xform_normal(inv, n_obj)
            u, v = primitives.sphere_uv(p_obj, c, rad)
        else:
            n = primitives.sphere_normal(pos, c)
            u, v = primitives.sphere_uv(pos, c, rad)
        sel(m, n, scene.sphere_mat[idx], u, v)

    if scene.plane_point.shape[0] > 0:
        m = hit.ptype == PT_PLANE
        sel(m, scene.plane_normal[idx], scene.plane_mat[idx])

    if scene.cube_min.shape[0] > 0:
        m = hit.ptype == PT_CUBE
        lo = scene.cube_min[idx]
        hi = scene.cube_max[idx]
        if scene.cube_xform:
            inv = scene.cube_inv[idx]
            p_obj = _xform_point(inv, pos)
            n = _xform_normal(inv, primitives.cube_normal(p_obj, lo, hi))
            u, v = primitives.cube_uv(p_obj, lo, hi)
        else:
            n = primitives.cube_normal(pos, lo, hi)
            u, v = primitives.cube_uv(pos, lo, hi)
        sel(m, n, scene.cube_mat[idx], u, v)

    if scene.cyl_radius.shape[0] > 0:
        m = hit.ptype == PT_CYLINDER
        z0 = scene.cyl_z0[idx]
        z1 = scene.cyl_z1[idx]
        if scene.cyl_xform:
            inv = scene.cyl_inv[idx]
            p_obj = _xform_point(inv, pos)
            n = _xform_normal(inv, primitives.cylinder_normal(p_obj, z0, z1))
        else:
            n = primitives.cylinder_normal(pos, z0, z1)
        sel(m, n, scene.cyl_mat[idx])

    if scene.inst_inv.shape[0] > 0:
        m = hit.ptype == PT_TRIANGLE
        n0 = scene.tri_n0[idx]
        n1 = scene.tri_n1[idx]
        n2 = scene.tri_n2[idx]
        n_obj = vec.normalize(
            primitives.triangle_interpolate(n0, n1, n2, hit.u, hit.v)
        )
        uv = primitives.triangle_interpolate(
            scene.tri_uv0[idx], scene.tri_uv1[idx], scene.tri_uv2[idx],
            hit.u, hit.v,
        )
        inst = jnp.maximum(hit.inst, 0)
        over = scene.inst_mat[inst]
        tm = jnp.where(over >= 0, over, scene.tri_mat[idx])

        # tangent-space normal mapping + bump mapping
        # (Triangle.cs:142-186); only when the scene carries any maps
        mats = scene.materials
        if scene.has_surface_maps:  # static: set at scene build
            tri_mat_g = mats.gather(tm)
            duv1 = scene.tri_uv1[idx] - scene.tri_uv0[idx]
            duv2 = scene.tri_uv2[idx] - scene.tri_uv0[idx]
            e1 = scene.tri_e1[idx]
            e2 = scene.tri_e2[idx]
            tangent = vec.normalize(
                e1 * duv2[..., 1:2] - e2 * duv1[..., 1:2]
            )
            bitangent = vec.normalize(
                e2 * duv1[..., 0:1] - e1 * duv2[..., 0:1]
            )
            # normal map: tangent-space RGB -> world
            ns = scene.textures.normal_sample(
                tri_mat_g.normal_texture, uv[..., 0], uv[..., 1]
            )
            tbn_n = vec.normalize(vec.cross(tangent, bitangent))
            mapped = vec.normalize(
                tangent * ns[..., 0:1]
                + bitangent * ns[..., 1:2]
                + tbn_n * ns[..., 2:3]
            )
            use_nmap = tri_mat_g.normal_texture >= 0
            n_obj = jnp.where(use_nmap[..., None], mapped, n_obj)
            # bump map: height-gradient perturbation
            bump = scene.textures.bump_sample(
                tri_mat_g.bump_texture, uv[..., 0], uv[..., 1]
            )
            bumped = vec.normalize(
                n_obj
                + tangent * (bump[..., 0:1] * tri_mat_g.bump_multiplier[..., None])
                + bitangent * (bump[..., 1:2] * tri_mat_g.bump_multiplier[..., None])
            )
            use_bump = tri_mat_g.bump_texture >= 0
            n_obj = jnp.where(use_bump[..., None], bumped, n_obj)

        inv = scene.inst_inv[inst]
        n = _xform_normal(inv, n_obj)
        sel(m, n, tm, uv[..., 0], uv[..., 1])

    for i, (sdf_obj, mid, _lo, _hi) in enumerate(scene.sdf_objects):
        m = (hit.ptype == PT_SDF) & (hit.pindex == i)
        n = sdf_mod.sdf_normal(sdf_obj, pos)
        sel(m, n, jnp.int32(mid))

    for i, vol in enumerate(scene.volumes):
        m = (hit.ptype == PT_VOLUME) & (hit.pindex == i)
        n = vol_mod.normal_at(scene.volume_data[i], vol, pos)
        vm = vol_mod.material_at(scene.volume_data[i], vol, pos)
        sel(m, n, vm)

    for i, (hf, mid) in enumerate(scene.functions):
        m = (hit.ptype == PT_FUNCTION) & (hit.pindex == i)
        n = fn_mod.normal_at(hf, pos)
        sel(m, n, jnp.int32(mid))

    # normal flip toward the ray + inside flag (Hit.cs:36-47); SDF and
    # volume shapes never report inside.
    facing = vec.dot(normal, dirn) > 0.0
    normal = jnp.where(facing[:, None], -normal, normal)
    no_inside = (hit.ptype == PT_SDF) | (hit.ptype == PT_VOLUME)
    inside = facing & ~no_inside & (hit.ptype != PT_NONE)

    return HitInfo(
        position=pos,
        normal=normal,
        inside=inside,
        mat_id=mat_id,
        tex_u=tex_u,
        tex_v=tex_v,
    )
