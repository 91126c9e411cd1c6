"""Mesh generator tests: ordering parity with the reference conventions
(layer-major extrusion, CCW quads, [bottom|top] hex connectivity)."""
import numpy as np

import fea_tpu as ft


def test_quad_grid_ordering():
    """2x2 grid of unit size: node order x-fastest then y (reference
    cubebeam.py:43-45), winding [n1, n2, n4, n3] (cubebeam.py:55)."""
    nodes, quads = ft.mesh.generate_quad_grid(2, 2, 1.0, 1.0)
    assert nodes.shape == (9, 2)
    assert np.allclose(nodes[0], [0.0, 0.0])
    assert np.allclose(nodes[1], [0.5, 0.0])
    assert np.allclose(nodes[3], [0.0, 0.5])
    assert np.array_equal(quads[0], [0, 1, 4, 3])
    assert np.array_equal(quads[3], [4, 5, 8, 7])


def test_extrude_layer_major():
    """Layer i owns node rows [i*n, (i+1)*n) (utils.py:363-365); element
    connectivity is bottom-face-4 then top-face-4 (utils.py:371-374)."""
    nodes2d = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    quads = np.array([[0, 1, 2, 3]])
    z = np.array([0.0, 0.5, 1.0])
    nodes, elements = ft.mesh.extrude_quads(nodes2d, quads, z)
    assert nodes.shape == (12, 3)
    assert np.allclose(nodes[:4, 2], 0.0)
    assert np.allclose(nodes[4:8, 2], 0.5)
    assert np.allclose(nodes[4:8, :2], nodes2d)
    assert elements.shape == (2, 8)
    assert np.array_equal(elements[0], [0, 1, 2, 3, 4, 5, 6, 7])
    assert np.array_equal(elements[1], [4, 5, 6, 7, 8, 9, 10, 11])


def test_box_mesh_counts_match_cubebeam_config():
    """The cubebeam demo mesh (cubebeam.py:60-66): 4x4 grid extruded to 50
    layers -> 1,250 nodes, 784 elements, 3,750 DOF (BASELINE.md)."""
    nodes, elements = ft.mesh.box_hex_mesh(4, 4, 49, 0.1, 0.1, 1.0)
    assert nodes.shape == (1250, 3)
    assert elements.shape == (784, 8)


def test_annulus_section_matches_tube_config():
    """The fea.py tube section (fea.py:28-48): 26 segments -> 52 nodes
    (inner ring then outer), 26 quads with modular wraparound."""
    nodes2d, quads = ft.mesh.annulus_section(26, 3.9 * ft.units.inch, 4 * ft.units.inch)
    assert nodes2d.shape == (52, 2)
    assert quads.shape == (26, 4)
    assert np.allclose(np.linalg.norm(nodes2d[:26], axis=1), 3.9 * ft.units.inch)
    assert np.allclose(np.linalg.norm(nodes2d[26:], axis=1), 4.0 * ft.units.inch)
    assert np.array_equal(quads[0], [0, 26, 27, 1])
    assert np.array_equal(quads[25], [25, 51, 26, 0])  # wraparound


def test_positive_jacobians_everywhere():
    """Every generated mesh must have detJ > 0 for all elements/qps."""
    import jax.numpy as jnp
    from fea_tpu.elements import hex8

    for nodes, elements in [
        ft.mesh.box_hex_mesh(3, 2, 4, 0.3, 0.2, 0.4),
        ft.mesh.extrude_quads(*ft.mesh.annulus_section(12, 0.9, 1.0), np.linspace(0, 1, 4)),
    ]:
        geom = hex8.precompute_geometry(
            jnp.asarray(nodes, jnp.float64), jnp.asarray(elements, jnp.int32)
        )
        assert float(geom.min_detj) > 0.0


def test_faces_from_nodes():
    sel = np.arange(10, 18)
    faces = ft.mesh.faces_from_nodes(sel)
    assert faces.shape == (6, 4)
    assert np.array_equal(faces[0], [10, 11, 12, 13])
    assert np.array_equal(faces[2], [10, 11, 15, 14])
    faces2d = ft.mesh.faces_from_nodes2d(np.array([3, 1, 4, 7]))
    assert np.array_equal(faces2d, [[3, 1, 4, 7]])


def test_structured_corner_array_matches_reference_recipe():
    """VTK ExplicitStructuredGrid corner ordering — independently re-derived
    repeat/tile recipe from /root/reference/render_test.py:1-29."""
    from fea_tpu.mesh import structured_corner_array

    ni, nj, nk = 4, 5, 6
    si, sj, sk = 20, 10, 1
    xcorn = np.tile(np.repeat(np.arange(0, (ni + 1) * si, si), 2)[1:-1], 4 * nj * nk)
    ycorn = np.repeat(np.arange(0, (nj + 1) * sj, sj), 2)[1:-1]
    ycorn = np.transpose(np.tile(ycorn, (2 * ni, 2 * nk))).flatten()
    zcorn = np.repeat(np.repeat(np.arange(0, (nk + 1) * sk, sk), 2)[1:-1], 4 * ni * nj)
    want = np.stack((xcorn, ycorn, zcorn)).T.astype(float)
    got = structured_corner_array((ni, nj, nk), (si, sj, sk))
    assert np.array_equal(got, want)
