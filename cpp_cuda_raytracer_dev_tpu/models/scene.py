"""Scene data model: triangle soup, objects with poses, materials, lights.

Replaces the reference's ``Trixel``/``Object``/``Color`` triple
(``TEST_Dungeonrun/Trixel.h:39-133``, ``Object.h``, ``Color.h``) with
immutable pytrees of batched arrays:

- `Triangles` is the SoA the reference builds on-device in
  ``init_tri_mem_cuda`` (Trixel.cu:11-27): first vertex p1, edges e1=p2-p1,
  e2=p3-p1, unit normal n = normalize(e1 x e2), plus per-triangle radiance
  color. Here the precompute is one fused jnp expression.
- `SceneObject` binds geometry + a `Pose` (Object.h:4-17 binds Trixel* +
  Quaternion). Geometry never moves: the pose is applied to rays at render
  time (the reference's pose-on-the-ray trick, Trixel.cu:60-66), so pose
  updates are O(1) and differentiation w.r.t. pose flows only through the
  ray transform.
- `PhongParams` promotes the shading constants hardcoded in the kernel
  (light at (2,2,2), 0.6 diffuse, 0.3 spec, exponent 5 — Camera.cu:32,44-45)
  to learnable parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import vecmath
from ..ops.quaternion import Pose


class Triangles(struct.PyTreeNode):
    """Triangle soup in SoA form (T, 3) arrays."""

    p1: jax.Array      # (T, 3) first vertex
    e1: jax.Array      # (T, 3) p2 - p1
    e2: jax.Array      # (T, 3) p3 - p1
    n: jax.Array       # (T, 3) unit geometric normal
    color: jax.Array   # (T, 3) per-triangle radiance rgb

    @classmethod
    def from_vertices(cls, tri_vertices, color=None,
                      dtype=jnp.float32) -> "Triangles":
        """Build from (T, 3, 3) vertex blocks; the analogue of
        init_tri_mem_cuda (Trixel.cu:11-27). Default color matches the
        scene setup at WinMain.cpp:118-120: (0.1, 0.55, 0.20).

        ``dtype`` is the runtime analogue of the reference's compile-time
        precision switch (typedefs.h:11-29 PPP_TAG -> T_fp float/double):
        the scene's dtype flows through every downstream op. float64
        requires jax_enable_x64; the "brute"/"fixed"/"kd" intersect paths
        run fully in the scene dtype, while the cluster/Pallas paths store
        acceleration geometry in f32 (the TPU has no f64 vector unit)."""
        tv = jnp.asarray(tri_vertices, dtype)
        p1 = tv[:, 0]
        e1 = tv[:, 1] - p1
        e2 = tv[:, 2] - p1
        n = vecmath.normalize(vecmath.cross(e1, e2))
        if color is None:
            color = jnp.broadcast_to(
                jnp.array([0.1, 0.55, 0.20], dtype), p1.shape)
        else:
            color = jnp.broadcast_to(
                jnp.asarray(color, dtype), p1.shape)
        return cls(p1=p1, e1=e1, e2=e2, n=n, color=color)

    @property
    def num_triangles(self) -> int:
        return self.p1.shape[0]

    def vertices(self) -> jax.Array:
        """Back to (T, 3, 3) vertex blocks (p1, p2, p3)."""
        return jnp.stack([self.p1, self.p1 + self.e1, self.p1 + self.e2],
                         axis=1)

    def aabbs(self) -> tuple[jax.Array, jax.Array]:
        v = self.vertices()
        return v.min(axis=1), v.max(axis=1)

    def centroid(self) -> jax.Array:
        """Mid-point of the overall AABB — the reference's ``zero_offset``
        (Trixel.h:468-471)."""
        lo, hi = self.aabbs()
        return (lo.min(axis=0) + hi.max(axis=0)) / 2.0


class SceneObject(struct.PyTreeNode):
    """Geometry + pose. Multiple objects may share geometry (the reference
    creates two Objects over one Trixel list, WinMain.cpp:152-156)."""

    tris: Triangles
    pose: Pose

    @classmethod
    def create(cls, tris: Triangles, pose: Pose | None = None
               ) -> "SceneObject":
        return cls(tris=tris, pose=pose if pose is not None
                   else Pose.identity(tris.p1.dtype))


class PhongParams(struct.PyTreeNode):
    """Learnable Phong/lighting parameters (kernel literals in
    Camera.cu:32,44-52 promoted to parameters)."""

    light_pos: jax.Array     # (3,) — reference: (2, 2, 2)
    light_color: jax.Array   # (3,) — reference: implicit 1
    diffuse: jax.Array       # scalar — reference: 0.6
    specular: jax.Array      # scalar — reference: 0.3
    exponent: jax.Array      # scalar — reference: 5

    @classmethod
    def reference(cls, dtype=jnp.float32) -> "PhongParams":
        fp = lambda x: jnp.asarray(x, dtype)
        return cls(light_pos=fp([2.0, 2.0, 2.0]),
                   light_color=fp([1.0, 1.0, 1.0]),
                   diffuse=fp(0.6), specular=fp(0.3), exponent=fp(5.0))


class Scene(struct.PyTreeNode):
    """A renderable scene: objects + lighting parameters."""

    objects: tuple[SceneObject, ...]
    phong: PhongParams

    @classmethod
    def create(cls, objects, phong: PhongParams | None = None) -> "Scene":
        objects = tuple(objects)
        if phong is None:
            dtype = (objects[0].tris.p1.dtype if objects
                     else jnp.float32)
            phong = PhongParams.reference(dtype)
        return cls(objects=objects, phong=phong)


def default_colors(num_tri: int) -> np.ndarray:
    """Per-triangle color init used by the reference scene
    (WinMain.cpp:117-121)."""
    return np.broadcast_to(
        np.array([0.1, 0.55, 0.20], np.float32), (num_tri, 3)).copy()
