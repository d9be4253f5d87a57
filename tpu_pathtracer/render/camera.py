"""Pinhole / thin-lens camera with a sutil-compatible UVW frame.

Replaces the reference's external `sutil::Camera` + `sutil::Trackball`
(configured at reference optixSphere.cpp:102-120): eye (0,2,6), look-at
origin, up +Y, vertical FOV 50 degrees.

The UVW frame follows sutil::Camera::UVWFrame():
    W = lookat - eye                      (|W| = focal length)
    U = normalize(cross(W, up)) * |W| * tan(fovY/2) * aspect
    V = normalize(cross(U, W)) * |W| * tan(fovY/2)
Primary rays: dir = normalize(d.x*U + d.y*V + W) with d in NDC [-1,1]
(reference optixSphere.cu:332-346).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np


Vec3 = Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Camera:
    """Host-side camera state (hashable; arrays derived on demand)."""

    eye: Vec3 = (0.0, 2.0, 6.0)       # reference optixSphere.cpp:104
    lookat: Vec3 = (0.0, 0.0, 0.0)    # cpp:105
    up: Vec3 = (0.0, 1.0, 0.0)        # cpp:106
    fov_y: float = 50.0               # degrees, cpp:107
    aspect: float = 4.0 / 3.0         # set from W/H, cpp:119

    def with_aspect(self, width: int, height: int) -> "Camera":
        return dataclasses.replace(self, aspect=float(width) / float(height))

    def uvw_frame(self):
        """Returns (U, V, W) as float32 numpy [3] arrays (sutil semantics)."""
        eye = np.asarray(self.eye, dtype=np.float64)
        lookat = np.asarray(self.lookat, dtype=np.float64)
        up = np.asarray(self.up, dtype=np.float64)

        w = lookat - eye
        wlen = np.linalg.norm(w)
        u = np.cross(w, up)
        u /= np.linalg.norm(u)
        v = np.cross(u, w)
        v /= np.linalg.norm(v)

        vlen = wlen * math.tan(0.5 * math.radians(self.fov_y))
        ulen = vlen * self.aspect
        return (
            (u * ulen).astype(np.float32),
            (v * vlen).astype(np.float32),
            w.astype(np.float32),
        )

    def eye_np(self):
        return np.asarray(self.eye, dtype=np.float32)

    # ---- trackball-style interaction (viewer) -------------------------
    def orbit(self, d_yaw: float, d_pitch: float) -> "Camera":
        """Orbit the eye around the look-at point (degrees).

        Stands in for sutil::Trackball's LookAtFixed mode (reference
        optixSphere.cpp:151-187).
        """
        eye = np.asarray(self.eye, dtype=np.float64)
        lookat = np.asarray(self.lookat, dtype=np.float64)
        rel = eye - lookat
        r = np.linalg.norm(rel)
        yaw = math.atan2(rel[0], rel[2]) + math.radians(d_yaw)
        pitch = math.asin(np.clip(rel[1] / max(r, 1e-9), -1.0, 1.0))
        pitch = np.clip(pitch + math.radians(d_pitch), -1.55, 1.55)
        new_rel = r * np.array(
            [math.cos(pitch) * math.sin(yaw), math.sin(pitch), math.cos(pitch) * math.cos(yaw)]
        )
        return dataclasses.replace(self, eye=tuple((lookat + new_rel).tolist()))

    def zoom(self, factor: float) -> "Camera":
        """Dolly toward/away from the look-at point (scroll-wheel analog,
        reference optixSphere.cpp:231-235)."""
        eye = np.asarray(self.eye, dtype=np.float64)
        lookat = np.asarray(self.lookat, dtype=np.float64)
        rel = (eye - lookat) * factor
        return dataclasses.replace(self, eye=tuple((lookat + rel).tolist()))

    def pan(self, dx: float, dy: float) -> "Camera":
        """Translate eye and look-at in the view plane."""
        u, v, _ = self.uvw_frame()
        delta = (dx * u + dy * v).astype(np.float64)
        eye = np.asarray(self.eye, dtype=np.float64) + delta
        lookat = np.asarray(self.lookat, dtype=np.float64) + delta
        return dataclasses.replace(self, eye=tuple(eye.tolist()), lookat=tuple(lookat.tolist()))
