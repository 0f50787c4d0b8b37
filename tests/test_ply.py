import numpy as np

from cpp_cuda_raytracer_dev_tpu.io import ply


def test_rabbit_ascii(rabbit_path):
    mesh = ply.load_mesh(rabbit_path)
    # header: 35947 vertices, 69451 faces, all triangles
    assert mesh.vertices.shape == (35947, 3)
    assert mesh.num_triangles == 69451
    # reference rewind (read_ply.cpp:138-148): stored tri = (p3, p1, p2)
    # first face line of rabbit is "3 21216 21215 20399"
    p1, p2, p3 = 21216, 21215, 20399
    np.testing.assert_allclose(mesh.tri_vertices[0],
                               mesh.vertices[[p3, p1, p2]])
    # AABBs bound their triangles
    assert (mesh.aabb_min <= mesh.tri_vertices.min(axis=1) + 1e-6).all()
    assert (mesh.aabb_max >= mesh.tri_vertices.max(axis=1) - 1e-6).all()


def test_walls_binary(walls_path):
    mesh = ply.load_mesh(walls_path)
    assert mesh.vertices.shape == (14, 3)
    # 18 faces; blender exports tris here
    assert mesh.num_triangles >= 18
    assert np.isfinite(mesh.tri_vertices).all()


def test_tester_headerless(tester_path):
    mesh = ply.load_mesh(tester_path)
    assert mesh.vertices.shape == (961, 3)
    assert mesh.num_triangles >= 744
    assert np.isfinite(mesh.tri_vertices).all()


def test_quad_split(tmp_path):
    # quads split (A,B,C)+(A,C,D) per read_ply.cpp:70-125
    content = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""
    p = tmp_path / "quad.ply"
    p.write_text(content)
    mesh = ply.load_mesh(str(p))
    assert mesh.num_triangles == 2
    v = mesh.vertices
    np.testing.assert_allclose(mesh.tri_vertices[0], v[[0, 1, 2]])
    np.testing.assert_allclose(mesh.tri_vertices[1], v[[0, 2, 3]])
