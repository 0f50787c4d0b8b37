import jax
import jax.numpy as jnp
import numpy as np

from cpp_cuda_raytracer_dev_tpu import (Camera, Pose, RenderConfig, Scene,
                                        SceneObject, Triangles, render)


def make_scene(simple_tris):
    tris = Triangles.from_vertices(simple_tris)
    return Scene.create([SceneObject.create(tris)])


def make_camera(res=32):
    return Camera.create(res, res,
                         pos=[0.0, 0.0, -1.0], look_at=[0.0, 0.0, 0.0],
                         up=[0.0, 1.0, 0.0], film_h=0.024, focal=0.01)


def test_render_smoke(simple_tris):
    scene = make_scene(simple_tris)
    cam = make_camera()
    out = render(scene, cam, RenderConfig(method="brute", chunk=2))
    img = np.asarray(out.image)
    assert img.shape == (32, 32, 3)
    hits = np.asarray(out.hit_tri) >= 0
    assert hits.any(), "camera should see the square"
    # background where missed (240, 130, 0) per Camera.cpp:72
    if (~hits).any():
        miss_px = img[~hits]
        assert (miss_px == np.array([240, 130, 0])).all()
    # hit pixels tonemapped: max channel = 255 (Camera.cu:56-59)
    assert (img[hits].max(axis=-1) == 255).all()


def test_render_methods_agree(simple_tris):
    scene = make_scene(simple_tris)
    cam = make_camera()
    out_b = render(scene, cam, RenderConfig(method="brute", chunk=2))
    out_f = render(scene, cam, RenderConfig(method="fixed", chunk=2))
    np.testing.assert_array_equal(out_b.hit_tri, out_f.hit_tri)
    np.testing.assert_allclose(out_b.radiance, out_f.radiance,
                               rtol=1e-4, atol=1e-5)


def test_pose_on_ray_equivalence(simple_tris):
    """Moving the object via its pose == moving the geometry (pose applied
    to rays only, per the reference's design, Trixel.cu:60-66)."""
    import cpp_cuda_raytracer_dev_tpu.ops.quaternion as quat

    cam = make_camera()
    cfg = RenderConfig(method="brute", chunk=2)
    dq = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.2)
    trans = jnp.array([0.1, 0.0, 0.3])
    pose = Pose(quat=dq, translation=trans)

    tris = Triangles.from_vertices(jnp.asarray(simple_tris))
    scene_posed = Scene.create([SceneObject.create(tris, pose)])

    # bake the same transform into the vertices
    baked = pose.apply(jnp.asarray(simple_tris).reshape(-1, 3)).reshape(-1, 3, 3)
    scene_baked = Scene.create([SceneObject.create(
        Triangles.from_vertices(baked))])

    out_p = render(scene_posed, cam, cfg)
    out_b = render(scene_baked, cam, cfg)
    agree = np.mean(np.asarray(out_p.hit_tri) == np.asarray(out_b.hit_tri))
    assert agree > 0.995
    mask = (np.asarray(out_p.hit_tri) >= 0) & (np.asarray(out_b.hit_tri) >= 0)
    np.testing.assert_allclose(np.asarray(out_p.hit_t)[mask],
                               np.asarray(out_b.hit_t)[mask],
                               rtol=1e-4, atol=1e-5)
    # world-space normals must match too (rotated back correctly,
    # Trixel.cu:140)
    np.testing.assert_allclose(np.asarray(out_p.normal)[mask],
                               np.asarray(out_b.normal)[mask],
                               rtol=1e-3, atol=1e-4)


def test_two_objects_nearest_combine(simple_tris):
    tris = Triangles.from_vertices(simple_tris)
    # second copy of the geometry pushed further away: front object wins
    far_pose = Pose.identity().translated(jnp.array([0.0, 0.0, 1.0]))
    scene = Scene.create([
        SceneObject.create(tris, far_pose),
        SceneObject.create(tris),
    ])
    cam = make_camera()
    out = render(scene, cam, RenderConfig(method="fixed", chunk=2))
    hits = np.asarray(out.hit_obj)
    assert (hits[hits >= 0] == 1).all(), "nearer object must win"


def test_render_on_walls_mesh(walls_path):
    from cpp_cuda_raytracer_dev_tpu.io import ply
    mesh = ply.load_mesh(walls_path)
    scene = Scene.create([SceneObject.create(
        Triangles.from_vertices(mesh.tri_vertices))])
    lo = mesh.tri_vertices.reshape(-1, 3).min(0)
    hi = mesh.tri_vertices.reshape(-1, 3).max(0)
    center = (lo + hi) / 2
    cam = Camera.create(48, 48,
                        pos=center + np.array([0, 0, -2 * (hi - lo)[2] - 1]),
                        look_at=center, up=[0, 1, 0],
                        film_h=0.024, focal=0.03)
    cfg = RenderConfig(method="fixed", chunk=64,
                       draw_distance=float(np.linalg.norm(hi - lo)) * 100)
    out = render(scene, cam, cfg)
    assert (np.asarray(out.hit_tri) >= 0).any()
