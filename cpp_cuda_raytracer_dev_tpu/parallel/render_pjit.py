"""Sharded rendering and training over a device mesh.

Scaling design (SURVEY.md §5/§7, BASELINE.json north star): the image's row
axis is sharded over the "rays" mesh axis — forward rendering is then
embarrassingly parallel (zero cross-chip traffic: scene tables replicated,
each chip culls + intersects + shades its own row band). The backward pass
all-reduces parameter gradients over ICI; with `shard_map` + `jax.grad`, XLA
inserts and overlaps those psums automatically.

Optionally the triangle axis is also sharded ("prims"): each device holds a
contiguous primitive range and the per-ray nearest hit is min-combined with
`allreduce_nearest_hit`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.camera import Camera
from ..models.renderer import RenderOutput, render_rays
from ..models.scene import Scene
from ..utils.config import RenderConfig
from .mesh import RAYS_AXIS


def _check_band(camera: Camera, mesh: Mesh, config: RenderConfig) -> int:
    n = mesh.shape[RAYS_AXIS]
    if camera.res_h % n:
        raise ValueError(
            f"res_h={camera.res_h} must divide over {n} devices")
    return camera.res_h // n


def render_sharded(scene: Scene, camera: Camera, config: RenderConfig,
                   mesh: Mesh, accel=None) -> RenderOutput:
    """Forward frame with image rows sharded over mesh axis "rays".

    Jit this with everything but config traced; scene/camera replicate,
    per-pixel outputs come back row-sharded (harvest or all-gather as
    needed).
    """
    band_h = _check_band(camera, mesh, config)
    rmd = camera.ray_directions().reshape(camera.res_h, camera.res_w, 3)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(RAYS_AXIS, None, None)),
             out_specs=P(RAYS_AXIS),
             check_rep=False)
    def worker(scene_, origin, band):
        flat = render_rays(scene_, origin, band.reshape(-1, 3), config,
                           accel, band_h, camera.res_w)
        return jax.tree.map(
            lambda x: x.reshape(band_h, camera.res_w, *x.shape[1:]), flat)

    out = worker(scene, camera.pos, rmd)
    return RenderOutput(**out)


def radiance_sharded(scene: Scene, camera: Camera, config: RenderConfig,
                     mesh: Mesh, accel=None) -> jax.Array:
    """Differentiable sharded radiance image (H, W, 3) — the loss input."""
    return render_sharded(scene, camera, config, mesh, accel).radiance


def make_loss_fn(config: RenderConfig, mesh: Mesh | None, accel=None):
    """L2 image loss vs a target, differentiable w.r.t. (scene, camera).

    With mesh=None runs single-device (uses models.renderer.render).
    """
    def loss_fn(params, target):
        scene, camera = params["scene"], params["camera"]
        if mesh is None:
            from ..models.renderer import render
            rad = render(scene, camera, config, accel).radiance
        else:
            rad = radiance_sharded(scene, camera, config, mesh, accel)
        return jnp.mean((rad - target) ** 2)
    return loss_fn


def make_train_step(optimizer, config: RenderConfig, mesh: Mesh | None,
                    accel=None):
    """SGD step over scene/camera parameters: grads of the sharded loss are
    all-reduced by XLA (ICI psum overlapped with backward)."""
    loss_fn = make_loss_fn(config, mesh, accel)

    def step(params, opt_state, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
