import jax.numpy as jnp
import numpy as np

from cpp_cuda_raytracer_dev_tpu.ops import quaternion, vecmath


def test_cross_matches_reference_convention():
    # vector.cpp:31-36 component order
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-4.0, 0.5, 2.0])
    c = vecmath.cross(a, b)
    np.testing.assert_allclose(c, np.cross(a, b), rtol=1e-6)


def test_normalize_and_invnorm():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    unit, inv = vecmath.normalize_with_invnorm(v)
    np.testing.assert_allclose(np.linalg.norm(unit, axis=-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(inv, [0.2, 0.5], rtol=1e-6)


def test_quake_rsqrt_close_to_true_rsqrt():
    # the reference's vector_norm (vector.cpp:13-26) after 8 Newton steps
    s = jnp.array([0.25, 1.0, 9.0, 1e4])
    np.testing.assert_allclose(
        vecmath.quake_rsqrt(s), 1.0 / np.sqrt(s), rtol=1e-6)


def test_quaternion_rotation_matches_matrix():
    q = quaternion.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    rotated = quaternion.rotate(q, v)
    # +90deg about y: x -> -z  (right-hand rule)
    np.testing.assert_allclose(rotated, [0.0, 0.0, -1.0], atol=1e-6)


def test_quaternion_mul_matches_reference_key_rotation():
    # WinMain.cpp:187: repeated R-key quat (0, 0.0995..., 0, 0.995...) has
    # half-angle atan(0.1) -> rotation angle 2*atan(0.1) about +y; composing
    # it with itself must give the quat of twice that rotation.
    half = 0.09966865249116204  # atan(0.1)
    qk = jnp.array([0.0, np.sin(half), 0.0, np.cos(half)], jnp.float32)
    q2 = quaternion.qmul(qk, qk)
    expected = quaternion.from_axis_angle(
        jnp.array([0.0, 1.0, 0.0]), 4 * half)
    np.testing.assert_allclose(q2, expected, atol=1e-6)


def test_pose_roundtrip():
    q = quaternion.from_axis_angle(jnp.array([1.0, 2.0, -0.5]), 0.7)
    pose = quaternion.Pose(quat=q, translation=jnp.array([1.0, -2.0, 3.0]))
    pts = jnp.array([[0.1, 0.2, 0.3], [5.0, -1.0, 0.0]])
    np.testing.assert_allclose(
        pose.inv_apply(pose.apply(pts)), pts, atol=1e-5)


def test_pose_rotate_about_pivot_keeps_pivot_fixed():
    pose = quaternion.Pose.identity().translated(jnp.array([2.0, 0.0, 0.0]))
    pivot = jnp.array([2.0, 0.0, 0.0])
    dq = quaternion.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.3)
    rotated = pose.rotated(dq, pivot=pivot)
    # the object-frame origin maps to the same world point (the pivot)
    np.testing.assert_allclose(
        rotated.apply(jnp.zeros(3)), pivot, atol=1e-6)


def test_profiling_timer_and_metrics():
    from cpp_cuda_raytracer_dev_tpu.utils import profiling
    import jax.numpy as jnp

    tm = profiling.Timer()
    with tm.phase("warm"):
        x = jnp.ones((8, 8)) * 2.0
    with tm.phase("mul", fence=x):
        x = x * 3.0
    rep = tm.report()
    assert "warm" in rep and "mul" in rep

    m = profiling.FrameMetrics(frame_ms=10.0, num_rays=518_400, hit_rate=0.9)
    assert abs(m.fps - 100.0) < 1e-9
    assert abs(m.rays_per_sec - 5.184e7) < 1.0
    assert "FPS" in profiling.metrics_line(m)
