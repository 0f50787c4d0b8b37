import jax.numpy as jnp
import numpy as np

from cpp_cuda_raytracer_dev_tpu.models.camera import Camera, RayBuffers


def reference_camera(res_w=8, res_h=6):
    # WinMain.cpp:69-74 scene camera
    return Camera.create(
        res_w, res_h,
        pos=[0.0, 0.10, -1.0], look_at=[0.0, 0.10, 0.0], up=[0.0, 1.0, 0.0],
        film_h=0.024, focal=0.055)


def test_basis_matches_reference_configuration():
    cam = reference_camera()
    n, u, v = cam.basis()
    # camera looks +z, up is +y, right is +x (Camera.cpp:32-58 math)
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(u, [1, 0, 0], atol=1e-6)


def test_center_ray_looks_forward():
    cam = reference_camera(9, 9)  # odd res: center pixel exactly on axis
    d = cam.ray_directions().reshape(9, 9, 3)
    np.testing.assert_allclose(d[4, 4], [0, 0, 1], atol=1e-6)


def test_even_res_half_pixel_adjust():
    # Camera.cpp:61-63: even res shifts the bottom-left dir by half a pixel
    cam = reference_camera(8, 8)
    d = cam.ray_directions().reshape(8, 8, 3)
    # mean of the 4 center pixels is on-axis by symmetry
    center = d[3:5, 3:5].mean(axis=(0, 1))
    center = center / np.linalg.norm(center)
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)


def test_rays_unit_norm_and_bottom_up():
    cam = reference_camera(16, 12)
    d = cam.ray_directions()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)
    g = d.reshape(12, 16, 3)
    # row 0 = bottom of the image: its y-component < top row's
    assert float(g[0, 8, 1]) < float(g[-1, 8, 1])


def test_ray_buffers():
    cam = reference_camera()
    buf = RayBuffers.create(cam, draw_distance=400.0)
    np.testing.assert_allclose(buf.inv_rmd, 1.0 / buf.rmd, rtol=1e-6)
    assert (np.asarray(buf.dist) == 400.0).all()
    assert (np.asarray(buf.rmi) == -1).all()
    np.testing.assert_array_equal(buf.sign_rmd,
                                  np.asarray(buf.rmd) < 0)
