"""Independent scalar recursive path tracer (pure numpy, no jax).

A deliberately naive re-implementation of the reference integrator's
estimator (recursive, per-ray — the shape PTSharp's Sampler.cs has) used as
the golden oracle for the wavefront integrator: both must converge to the
same radiance on shared scenes. Supports spheres + planes, diffuse +
specular/refract materials, cosine-hemisphere sampling, NEE with the
r^2/(h^2-r^2) coverage model, and flat environments.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Mat:
    color: np.ndarray
    emittance: float = 0.0
    index: float = 1.0
    gloss: float = 0.0
    tint: float = 0.0
    reflectivity: float = -1.0
    transparent: bool = False


@dataclass
class Sph:
    center: np.ndarray
    radius: float
    mat: Mat


@dataclass
class Pln:
    point: np.ndarray
    normal: np.ndarray
    mat: Mat


class RefScene:
    def __init__(self, shapes, env=(0.0, 0.0, 0.0)):
        self.shapes = shapes
        self.env = np.asarray(env, np.float64)
        self.lights = [s for s in shapes if s.mat.emittance > 0]


def _norm(v):
    return v / max(np.linalg.norm(v), 1e-20)


def intersect(scene, o, d, eps=1e-4):
    best_t, best = np.inf, None
    for s in scene.shapes:
        if isinstance(s, Sph):
            oc = o - s.center
            b = 2 * np.dot(oc, d)
            c = np.dot(oc, oc) - s.radius**2
            disc = b * b - 4 * c
            if disc <= 0:
                continue
            sq = np.sqrt(disc)
            for t in ((-b - sq) / 2, (-b + sq) / 2):
                if eps < t < best_t:
                    best_t, best = t, s
                    break
        else:
            dn = np.dot(d, s.normal)
            if abs(dn) < 1e-9:
                continue
            t = np.dot(s.point - o, s.normal) / dn
            if eps < t < best_t:
                best_t, best = t, s
    return best_t, best


def normal_at(shape, p):
    if isinstance(shape, Sph):
        return _norm(p - shape.center)
    return shape.normal


def fresnel(n, i, n1, n2):
    nr2 = (n1 * n1) / (n2 * n2)
    cos_i = -np.dot(n, i)
    sin_t2 = nr2 * (1 - cos_i * cos_i)
    if sin_t2 > 1:
        return 1.0
    cos_t = np.sqrt(1 - sin_t2)
    a, b = n1 * cos_i, n2 * cos_t
    r_orth = (a - b) / (a + b)
    r_par = (b - a) / (b + a)
    return 0.5 * (r_orth**2 + r_par**2)


def refract(n, i, n1, n2):
    nr = n1 / n2
    cos_i = -np.dot(n, i)
    sin_t2 = nr * nr * (1 - cos_i * cos_i)
    if sin_t2 > 1:
        return None
    cos_t = np.sqrt(1 - sin_t2)
    return _norm(nr * i + (nr * cos_i - cos_t) * n)


def cosine_dir(n, rng):
    u1, u2 = rng.random(2)
    r = np.sqrt(u1)
    th = 2 * np.pi * u2
    # arbitrary ONB
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    t = _norm(np.cross(n, a))
    b = np.cross(n, t)
    return _norm(t * r * np.cos(th) + b * r * np.sin(th) + n * np.sqrt(1 - u1))


def sample_light(scene, p, n, light, rng, soft=True):
    c, r = light.center, light.radius
    if soft:
        l = _norm(c - p)
        a = np.array([1.0, 0, 0]) if abs(l[0]) < 0.9 else np.array([0, 1.0, 0])
        u_ax = _norm(np.cross(l, a))
        v_ax = np.cross(l, u_ax)
        th = rng.random() * 2 * np.pi
        rad = np.sqrt(rng.random()) * r
        point = c + u_ax * np.cos(th) * rad + v_ax * np.sin(th) * rad
    else:
        point = c
    d = _norm(point - p)
    cos_t = np.dot(d, n)
    if cos_t <= 0:
        return np.zeros(3)
    t, hit = intersect(scene, p, d)
    if hit is not light:
        return np.zeros(3)
    h = np.linalg.norm(c - p)
    if h < r:
        cov = 1.0
    else:
        cov = min(r * r / max(h * h - r * r, 1e-12), 1.0)
    return light.mat.color * (light.mat.emittance * cos_t * cov)


def radiance(scene, o, d, depth, max_bounces, rng, emission=True):
    if depth > max_bounces:
        return np.zeros(3)
    t, shape = intersect(scene, o, d)
    if shape is None:
        return scene.env.copy()
    p = o + d * t
    n = normal_at(shape, p)
    inside = False
    if np.dot(n, d) > 0:
        n = -n
        inside = True
    m = shape.mat
    out = np.zeros(3)
    if m.emittance > 0:
        if not emission:
            return np.zeros(3)
        out += m.color * m.emittance
    n1, n2 = (m.index, 1.0) if inside else (1.0, m.index)
    pr = m.reflectivity if m.reflectivity >= 0 else fresnel(n, d, n1, n2)
    if rng.random() < pr:
        nd = _norm(d - 2 * np.dot(n, d) * n)
        ind = radiance(scene, p + nd * 1e-4, nd, depth + 1, max_bounces, rng, True)
        tinted = ind + (m.color * ind - ind) * m.tint
        out += tinted
    elif m.transparent:
        nd = refract(n, d, n1, n2)
        if nd is None:
            nd = _norm(d - 2 * np.dot(n, d) * n)
        ind = radiance(scene, p + nd * 1e-4, nd, depth + 1, max_bounces, rng, True)
        tinted = ind + (m.color * ind - ind) * m.tint
        out += tinted
    else:
        nd = cosine_dir(n, rng)
        ind = radiance(scene, p + nd * 1e-4, nd, depth + 1, max_bounces, rng, False)
        direct = np.zeros(3)
        if scene.lights:
            li = rng.integers(len(scene.lights))
            direct = sample_light(scene, p, n, scene.lights[li], rng) * len(
                scene.lights
            )
        out += m.color * (direct + ind)
    return out


def render(scene, cam_eye, cam_center, fov_deg, w, h, spp, max_bounces, seed=0):
    """Tiny pinhole render matching Camera.cast_rays NDC math."""
    rng = np.random.default_rng(seed)
    eye = np.asarray(cam_eye, np.float64)
    fwd = _norm(np.asarray(cam_center, np.float64) - eye)
    up = np.array([0.0, 1.0, 0.0])
    u_ax = _norm(np.cross(up, fwd))
    v_ax = _norm(np.cross(fwd, u_ax))
    m = 1.0 / np.tan(np.deg2rad(fov_deg) / 2)
    aspect = w / h
    img = np.zeros((h, w, 3))
    for y in range(h):
        for x in range(w):
            acc = np.zeros(3)
            for _ in range(spp):
                ju, jv = rng.random(2)
                px = ((x + ju - 0.5) / (w - 1.0)) * 2 - 1
                py = ((y + jv - 0.5) / (h - 1.0)) * 2 - 1
                d = _norm(-px * aspect * u_ax - py * v_ax + m * fwd)
                acc += radiance(scene, eye, d, 0, max_bounces, rng, True)
            img[y, x] = acc / spp
    return img
