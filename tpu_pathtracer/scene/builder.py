"""Scene assembly from OBJ files, reproducing the reference's conventions.

Replaces `createSceneGeometry` (reference optixSphere.cpp:400-652):

* one material per OBJ *file* (cpp:419-424 — MTL materials are parsed but
  the reference largely ignores them in favour of its own Material struct);
* texture discovery by filename convention:
  `<stem>_albedo/_roughness/_normal/_metallic.png` (cpp:522-546);
* files with any map get the neutral textured material (gray 0.5,
  roughness 0.4, cpp:558-575); files without get the random material
  (random colour/roughness, 10% chance emissive x100, metallic band
  decider in (0.5, 0.65), cpp:577-585);
* an auto floor plane at the scene's min vertex height, size 200
  (cpp:597-648).

Beyond the reference (opt-in): `material_source="mtl"` honours the parsed
MTL constants/maps instead of the convention+random scheme, and the
texture pool fixes the reference's global-texture-pointer aliasing bug
(cpp:395-398).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from tpu_pathtracer.assets.obj import ObjMaterial, parse_mtl, parse_obj, triangulate
from tpu_pathtracer.scene.scene import (
    EnvironmentMap,
    Scene,
    make_material_table,
    make_scene,
)
from tpu_pathtracer.utils.image import load_image

_KINDS = ("albedo", "roughness", "normal", "metallic")


class TexturePoolBuilder:
    """Accumulates texture images into one flat [P,4] quad-packed pool
    (see scene.make_texture_quads for the TPU layout rationale)."""

    def __init__(self):
        self.rows: List[np.ndarray] = []
        self.offset = 0
        self._cache = {}

    def add(self, path: str) -> Optional[tuple]:
        """Load `path` and append; returns (offset, w, h) or None."""
        if not os.path.exists(path):
            return None
        if path in self._cache:
            return self._cache[path]
        from tpu_pathtracer.scene.scene import make_texture_quads

        img = load_image(path)  # [H,W,3] f32
        h, w = img.shape[:2]
        quads = make_texture_quads(img)
        desc = (self.offset, w, h)
        self.rows.append(quads)
        self.offset += quads.shape[0]
        self._cache[path] = desc
        return desc

    def build(self) -> np.ndarray:
        if not self.rows:
            return np.zeros((1, 4), np.uint32)
        return np.concatenate(self.rows, axis=0)


def _load_file(path, scale, skip_non_triangles, use_native, mtl_basepath):
    """Per-file geometry load: native C++ parser when available (10-30x
    faster, bit-identical output), pure-Python fallback otherwise.

    Returns (vertices [T,3,3], normals, uvs, face_mat_ids [T],
    materials) where face ids index `materials` (ObjMaterial list)."""
    if use_native:
        from tpu_pathtracer.assets.native import parse_obj_native

        out = parse_obj_native(path, scale, skip_non_triangles)
        if out is not None:
            tv, tn, tuv, tm, names, libs = out
            mdir = mtl_basepath or os.path.dirname(os.path.abspath(path))
            mtl_map = {}
            for libname in libs:
                mtl_map.update(parse_mtl(os.path.join(mdir, libname)))
            mats = [mtl_map.get(nm, ObjMaterial(name=nm)) for nm in names]
            return tv, tn, tuv, tm, mats
    model = parse_obj(path, mtl_basepath=mtl_basepath)
    tv, tn, tuv, tm = triangulate(
        model, scale=scale, skip_non_triangles=skip_non_triangles
    )
    return tv, tn, tuv, tm, model.materials


def discover_convention_maps(obj_path: str, pool: TexturePoolBuilder) -> dict:
    """Filename-convention texture discovery (cpp:522-546)."""
    stem = os.path.splitext(obj_path)[0]
    maps = {}
    for kind in _KINDS:
        desc = pool.add(f"{stem}_{kind}.png")
        if desc is not None:
            maps[kind] = desc
    return maps


def load_scene(
    filenames: Sequence[str],
    scale: float = 1.0,
    env: Optional[EnvironmentMap] = None,
    material_source: str = "convention",
    add_floor: bool = True,
    floor_size: float = 200.0,
    skip_non_triangles: bool = False,
    rng_seed: Optional[int] = 0,
    mtl_basepath: Optional[str] = None,
    use_native: bool = True,
    accel: Optional[str] = None,
    accel_kw: Optional[dict] = None,
) -> Scene:
    """Load OBJ files into a Scene.

    material_source:
      "convention" — reference behaviour: one material per file, filename
        convention maps, random fallback materials (cpp:553-595).
        rng_seed fixes the random materials (the reference's are seeded by
        std::random_device, cpp:141-143 — non-reproducible; we default to
        seed 0 and allow None for entropy).
      "mtl" — one material per MTL material, honouring Kd/Ke/Pr/Pm/d and
        texture maps resolved relative to the MTL.
    """
    if material_source not in ("convention", "mtl"):
        raise ValueError(f"invalid material_source: {material_source!r}")

    rs = np.random.RandomState(rng_seed)
    pool = TexturePoolBuilder()

    all_v, all_n, all_uv, all_mid = [], [], [], []
    materials: List[dict] = []
    min_height = 10.0  # reference init, cpp:418

    for path in filenames:
        tv, tn, tuv, face_mats, obj_materials = _load_file(
            path, scale, skip_non_triangles, use_native, mtl_basepath
        )
        if len(tv):
            min_height = min(min_height, float(tv[:, :, 1].min()))

        if material_source == "convention":
            maps = discover_convention_maps(path, pool)
            if maps:
                mat = dict(
                    color=(0.5, 0.5, 0.5),
                    specular=(0.5, 0.5, 0.5),
                    emission=0.0,
                    roughness=0.4,
                    metallic=False,
                    transparent=False,
                    maps=maps,
                )  # cpp:560-575
            else:
                color = tuple(rs.rand(3).astype(np.float32).tolist())
                decider = float(rs.rand())
                mat = dict(
                    color=color,
                    specular=color,
                    emission=100.0 if decider < 0.1 else 0.0,   # cpp:580
                    roughness=float(rs.rand()),                 # cpp:581
                    metallic=0.5 < decider < 0.65,              # cpp:582
                    transparent=False,
                )
            mat_idx = len(materials)
            materials.append(mat)
            all_mid.append(np.full(len(tv), mat_idx, np.int32))
        else:  # mtl
            base = len(materials)
            mdir = mtl_basepath or os.path.dirname(os.path.abspath(path))
            if obj_materials:
                for m in obj_materials:
                    maps = {}
                    for kind, texname in (
                        ("albedo", m.diffuse_texname),
                        ("roughness", m.roughness_texname),
                        ("normal", m.normal_texname or m.bump_texname),
                        ("metallic", m.metallic_texname),
                    ):
                        if texname:
                            desc = pool.add(os.path.join(mdir, texname))
                            if desc is not None:
                                maps[kind] = desc
                    emission_mag = float(np.max(m.emission))
                    color = m.diffuse if emission_mag == 0.0 else m.emission
                    materials.append(
                        dict(
                            color=m.diffuse,
                            specular=m.specular,
                            emission=emission_mag,
                            roughness=(
                                m.roughness
                                if m.roughness is not None
                                # Blinn-Phong shininess -> roughness
                                else float(np.sqrt(2.0 / (m.shininess + 2.0)))
                                if m.shininess > 0
                                else 0.5
                            ),
                            metallic=(m.metallic or 0.0) > 0.5,
                            transparent=m.dissolve < 0.99 or m.illum in (4, 6, 7, 9),
                            # MTL `Ni` (> 1 = specified); 0 defers to cfg.ior.
                            ior=m.ior if m.ior > 1.0 else 0.0,
                            maps=maps,
                        )
                    )
                # emissive MTLs: emission vector / diffuse mismatch — patch
                for i, m in enumerate(obj_materials):
                    if float(np.max(m.emission)) > 0:
                        materials[base + i]["color"] = m.emission
                        materials[base + i]["emission"] = 1.0
                remapped = np.where(face_mats >= 0, face_mats + base, 0)
                all_mid.append(remapped.astype(np.int32))
            else:
                materials.append(dict(color=(0.7, 0.7, 0.7), roughness=0.5))
                all_mid.append(np.full(len(tv), base, np.int32))

        all_v.append(tv)
        all_n.append(tn)
        all_uv.append(tuv)

    if add_floor:
        # Floor material: gray 0.2, roughness 0.1 (cpp:601-608).
        floor_idx = len(materials)
        materials.append(
            dict(color=(0.2, 0.2, 0.2), specular=(0.2, 0.2, 0.2), roughness=0.1)
        )
        from tpu_pathtracer.scene.procedural import ground_plane

        fv, fn = ground_plane(min_height, floor_size)
        all_v.append(fv)
        all_n.append(fn)
        all_uv.append(np.zeros((2, 3, 2), np.float32))
        all_mid.append(np.full(2, floor_idx, np.int32))

    vertices = np.concatenate(all_v, axis=0) if all_v else np.zeros((0, 3, 3), np.float32)
    normals = np.concatenate(all_n, axis=0) if all_n else np.zeros((0, 3, 3), np.float32)
    uvs = np.concatenate(all_uv, axis=0) if all_uv else np.zeros((0, 3, 2), np.float32)
    mat_ids = np.concatenate(all_mid, axis=0) if all_mid else np.zeros((0,), np.int32)

    table = make_material_table(materials, pool.build())

    accel_obj = None
    if accel is not None and len(vertices):
        # Build on host arrays *before* the device upload: the first
        # device->host readback on a tunneled TPU can stall for minutes,
        # which scene.accel.build_accel(scene) would trigger.
        from tpu_pathtracer.accel.build import build_accel_arrays

        perm, accel_obj = build_accel_arrays(
            vertices, kind=accel, **(accel_kw or {})
        )
        vertices = vertices[perm]
        normals = normals[perm]
        uvs = uvs[perm]
        mat_ids = mat_ids[perm]

    scene = make_scene(vertices, normals, uvs, mat_ids, table, env=env)
    if accel_obj is not None:
        scene = scene.replace(accel=accel_obj)
    return scene
