"""Material model: the reference's 7 archetypes over a flat SoA device table.

Reference Material.cs stores one struct per shape with factory ctors
(Material.cs:64-97). Here materials live in a single (M, ...) SoA table on
device; shapes carry an int32 material id. Shading reads the table with a
gather — differentiable w.r.t. every field, so material optimization "just
works" through the renderer.

Fields (Material.cs:10-46 parity):
  color         (M, 3) base albedo/tint (linear RGB)
  emittance     (M,)   radiant exitance scale (>0 = light)
  index         (M,)   refractive index
  gloss         (M,)   cone half-angle (radians) for glossy scatter
  tint          (M,)   specular tint mix factor
  reflectivity  (M,)   fixed reflect prob; < 0 means "use Fresnel"
  transparent   (M,)   bool: refract on non-reflect branch
  texture       (M,)   int32 id into the texture atlas (-1 = none)
  normal_texture(M,)   int32 normal-map id (-1 = none)
  bump_texture  (M,)   int32 bump-map id (-1 = none)
  gloss_texture (M,)   int32 gloss-map id (-1 = none)
  bump_multiplier (M,) bump strength
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Material:
    """Host-side material description (scene-build time)."""

    color: tuple = (1.0, 1.0, 1.0)
    emittance: float = 0.0
    index: float = 1.0
    gloss: float = 0.0
    tint: float = 0.0
    reflectivity: float = -1.0
    transparent: bool = False
    texture: int = -1
    normal_texture: int = -1
    bump_texture: int = -1
    gloss_texture: int = -1
    bump_multiplier: float = 1.0


def _c3(color) -> tuple:
    arr = np.asarray(color, np.float32).reshape(3)
    return (float(arr[0]), float(arr[1]), float(arr[2]))


def diffuse_material(color) -> Material:
    return Material(color=_c3(color))


def specular_material(color, index: float) -> Material:
    return Material(color=_c3(color), index=index)


def glossy_material(color, index: float, gloss: float) -> Material:
    return Material(color=_c3(color), index=index, gloss=gloss)


def clear_material(index: float, gloss: float) -> Material:
    return Material(color=(0.0, 0.0, 0.0), index=index, gloss=gloss, transparent=True)


def transparent_material(color, index: float, gloss: float, tint: float) -> Material:
    return Material(color=_c3(color), index=index, gloss=gloss, tint=tint, transparent=True)


def metallic_material(color, gloss: float, tint: float) -> Material:
    return Material(color=_c3(color), gloss=gloss, tint=tint, reflectivity=1.0)


def light_material(color, emittance: float) -> Material:
    return Material(color=_c3(color), emittance=emittance)


class MaterialTable(NamedTuple):
    """Frozen device SoA table of all scene materials."""

    color: jnp.ndarray
    emittance: jnp.ndarray
    index: jnp.ndarray
    gloss: jnp.ndarray
    tint: jnp.ndarray
    reflectivity: jnp.ndarray
    transparent: jnp.ndarray
    texture: jnp.ndarray
    normal_texture: jnp.ndarray
    bump_texture: jnp.ndarray
    gloss_texture: jnp.ndarray
    bump_multiplier: jnp.ndarray

    @staticmethod
    def build(materials: list[Material]) -> "MaterialTable":
        if not materials:
            materials = [Material()]
        return MaterialTable(
            color=jnp.array([m.color for m in materials], jnp.float32),
            emittance=jnp.array([m.emittance for m in materials], jnp.float32),
            index=jnp.array([m.index for m in materials], jnp.float32),
            gloss=jnp.array([m.gloss for m in materials], jnp.float32),
            tint=jnp.array([m.tint for m in materials], jnp.float32),
            reflectivity=jnp.array([m.reflectivity for m in materials], jnp.float32),
            transparent=jnp.array([m.transparent for m in materials], jnp.bool_),
            texture=jnp.array([m.texture for m in materials], jnp.int32),
            normal_texture=jnp.array([m.normal_texture for m in materials], jnp.int32),
            bump_texture=jnp.array([m.bump_texture for m in materials], jnp.int32),
            gloss_texture=jnp.array([m.gloss_texture for m in materials], jnp.int32),
            bump_multiplier=jnp.array([m.bump_multiplier for m in materials], jnp.float32),
        )

    def gather(self, mat_id):
        """Gather per-ray material fields for an int32 id array (...,)."""
        i = jnp.clip(mat_id, 0, self.color.shape[0] - 1)
        return MaterialTable(
            color=self.color[i],
            emittance=self.emittance[i],
            index=self.index[i],
            gloss=self.gloss[i],
            tint=self.tint[i],
            reflectivity=self.reflectivity[i],
            transparent=self.transparent[i],
            texture=self.texture[i],
            normal_texture=self.normal_texture[i],
            bump_texture=self.bump_texture[i],
            gloss_texture=self.gloss_texture[i],
            bump_multiplier=self.bump_multiplier[i],
        )
