"""Device-resident scene: SoA arrays for geometry, materials and lighting.

This is the TPU-native replacement for the reference's host->device upload
path: the `TriangleData` vectors + flattened `g_vertices/g_normals/
g_texcoords` buffers (reference optixSphere.cpp:845-858), the per-material
`HitGroupData` SBT records (cpp:1129-1281, optixSphere.h:67-102) and the
`MissData` env-map record (optixSphere.h:58-63).

Key differences from the reference, by design:

* One flat texture pool: all texture maps live in a single [P,3] float32
  buffer addressed by (offset, width, height) per material map.  The
  reference instead keeps four *global* device pointers shared by every
  material (cpp:395-398), so multi-file scenes alias the last-loaded maps —
  a bug we do not reproduce (SURVEY.md "quirks to fix").
* Materials are a struct-of-arrays table indexed by per-triangle material
  id — the software analog of per-material SBT hit records.
* Everything is a JAX pytree, so a Scene can be donated to jit, sharded
  with shard_map, checkpointed with orbax, etc.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MaterialTable:
    """Per-material constants + texture-map descriptors ([M] each).

    Software equivalent of N HitGroupData SBT records
    (reference optixSphere.h:67-102).
    """

    diffuse_color: jnp.ndarray   # [M,3] f32
    specular: jnp.ndarray        # [M,3] f32 (kept for parity; unused by BSDF
    #                              just like the reference's `specular`)
    emission_color: jnp.ndarray  # [M,3] f32 = color * emission (cpp:1213)
    roughness: jnp.ndarray       # [M]   f32
    metallic: jnp.ndarray        # [M]   f32 (0/1 from bool)
    transparent: jnp.ndarray     # [M]   f32 (0/1 from bool)

    # Texture-map descriptors; offset indexes `texture_pool` rows.
    # kind order: 0=albedo, 1=roughness, 2=normal, 3=metallic.
    has_map: jnp.ndarray         # [M,4] bool
    map_offset: jnp.ndarray      # [M,4] i32
    map_width: jnp.ndarray       # [M,4] i32
    map_height: jnp.ndarray      # [M,4] i32

    texture_pool: jnp.ndarray    # [P,3] f32 rgb texels (P >= 1)

    @property
    def num_materials(self) -> int:
        return self.diffuse_color.shape[0]


@struct.dataclass
class EnvironmentMap:
    """Equirectangular HDR environment (reference MissData,
    optixSphere.h:58-63).  `data` is [H,W,3] float32 radiance.

    CDF tables (built by `tpu_pathtracer.render.envmap.build_env_cdf`) enable
    importance sampling — a capability beyond the reference, whose NEE path
    is dead code (optixSphere.cu:134-156, 858)."""

    data: jnp.ndarray                      # [H,W,3] f32
    cdf_rows: Optional[jnp.ndarray] = None  # [H] marginal row CDF
    cdf_cols: Optional[jnp.ndarray] = None  # [H,W] conditional column CDF

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]


@struct.dataclass
class Scene:
    """Complete device scene (geometry + materials + lighting + accel)."""

    vertices: jnp.ndarray   # [T,3,3] f32 — v0,v1,v2 per triangle
    normals: jnp.ndarray    # [T,3,3] f32 — per-vertex shading normals
    uvs: jnp.ndarray        # [T,3,2] f32 — per-vertex texcoords
    mat_ids: jnp.ndarray    # [T]     i32 — material index per triangle
    materials: MaterialTable
    env: EnvironmentMap
    # Acceleration structure; filled by tpu_pathtracer.accel (None = brute).
    accel: Optional["object"] = None

    @property
    def num_triangles(self) -> int:
        return self.vertices.shape[0]


def default_env(height: int = 8, width: int = 16, color=(0.4, 0.4, 0.6)) -> EnvironmentMap:
    """A tiny constant environment (used when env_mode != equirect)."""
    data = jnp.broadcast_to(
        jnp.asarray(color, dtype=jnp.float32), (height, width, 3)
    )
    return EnvironmentMap(data=jnp.array(data))


def make_material_table(materials: list[dict], texture_pool: Optional[np.ndarray] = None) -> MaterialTable:
    """Build a MaterialTable from a list of material dicts.

    Each dict supports keys: color (3,), specular (3,), emission (float),
    roughness (float), metallic (bool), transparent (bool), and per-map
    descriptors `maps` = {kind: (offset, width, height)} where kind in
    {"albedo","roughness","normal","metallic"}.

    Mirrors the SBT fill at reference optixSphere.cpp:1196-1262 (notably
    emission_color = color * emission, cpp:1213).
    """
    kinds = ["albedo", "roughness", "normal", "metallic"]
    m = len(materials)
    diffuse = np.zeros((m, 3), np.float32)
    specular = np.zeros((m, 3), np.float32)
    emission = np.zeros((m, 3), np.float32)
    roughness = np.zeros((m,), np.float32)
    metallic = np.zeros((m,), np.float32)
    transparent = np.zeros((m,), np.float32)
    has_map = np.zeros((m, 4), bool)
    map_off = np.zeros((m, 4), np.int32)
    map_w = np.ones((m, 4), np.int32)
    map_h = np.ones((m, 4), np.int32)

    for i, mat in enumerate(materials):
        color = np.asarray(mat.get("color", (0.5, 0.5, 0.5)), np.float32)
        diffuse[i] = color
        specular[i] = np.asarray(mat.get("specular", color), np.float32)
        emission[i] = color * np.float32(mat.get("emission", 0.0))
        roughness[i] = np.float32(mat.get("roughness", 0.5))
        metallic[i] = np.float32(1.0 if mat.get("metallic", False) else 0.0)
        transparent[i] = np.float32(1.0 if mat.get("transparent", False) else 0.0)
        for k, kind in enumerate(kinds):
            desc = mat.get("maps", {}).get(kind)
            if desc is not None:
                off, w, h = desc
                has_map[i, k] = True
                map_off[i, k] = off
                map_w[i, k] = w
                map_h[i, k] = h

    if texture_pool is None or len(texture_pool) == 0:
        texture_pool = np.zeros((1, 3), np.float32)

    return MaterialTable(
        diffuse_color=jnp.asarray(diffuse),
        specular=jnp.asarray(specular),
        emission_color=jnp.asarray(emission),
        roughness=jnp.asarray(roughness),
        metallic=jnp.asarray(metallic),
        transparent=jnp.asarray(transparent),
        has_map=jnp.asarray(has_map),
        map_offset=jnp.asarray(map_off),
        map_width=jnp.asarray(map_w),
        map_height=jnp.asarray(map_h),
        texture_pool=jnp.asarray(np.asarray(texture_pool, np.float32)),
    )


def make_scene(
    vertices: np.ndarray,
    normals: np.ndarray,
    uvs: Optional[np.ndarray],
    mat_ids: np.ndarray,
    materials: MaterialTable,
    env: Optional[EnvironmentMap] = None,
) -> Scene:
    """Assemble a Scene from host numpy arrays ([T,3,3]/[T,3,2]/[T])."""
    t = vertices.shape[0]
    if uvs is None:
        uvs = np.zeros((t, 3, 2), np.float32)
    if env is None:
        env = default_env()
    return Scene(
        vertices=jnp.asarray(vertices, dtype=jnp.float32),
        normals=jnp.asarray(normals, dtype=jnp.float32),
        uvs=jnp.asarray(uvs, dtype=jnp.float32),
        mat_ids=jnp.asarray(mat_ids, dtype=jnp.int32),
        materials=materials,
        env=env,
    )
