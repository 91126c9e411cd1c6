"""Structured (stencil-form) operator: exact equivalence with the
unstructured operator on the same voxel mesh, and end-to-end solve."""
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene


def make(nx=3, ny=2, nz=5):
    mat = ft.Material(2e6, 0.3)
    scene, dims = structured_scene(nx, ny, nz, 0.3, 0.2, 0.5, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.5, 1] = 1.5
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat, dtype=jnp.float64
    )
    return scene, dims


def test_structured_apply_equals_unstructured(rng):
    scene, dims = make()
    op_s = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_u = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    got = np.asarray(op_s.apply_raw(x))
    want = np.asarray(op_u.apply_raw(x))
    assert np.max(np.abs(got - want)) < 1e-9 * np.max(np.abs(want))


def test_structured_diag_equals_unstructured():
    scene, dims = make()
    op_s = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_u = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    assert np.allclose(
        np.asarray(op_s.diag_raw()), np.asarray(op_u.diag_raw()), rtol=1e-10
    )


def test_structured_solve_matches_unstructured():
    scene, dims = make()
    op_s = build_structured_operator(scene, dims, dtype=jnp.float64)
    zero = scene.prescribed_or_zero(jnp.float64)
    sol_s = ft.solve_operator(op_s, scene.loads, zero, tol=1e-11)
    sol_u = ft.solve(scene, method="cg", tol=1e-11)
    u_s = np.asarray(sol_s.displacements)
    u_u = np.asarray(sol_u.displacements)
    assert bool(sol_s.stats.converged)
    assert np.max(np.abs(u_s - u_u)) < 1e-8 * np.max(np.abs(u_u))


def test_corner_accumulate_region_fill_matches_padadd(rng):
    """The 27-region fast fill in corner_accumulate_np must equal the
    literal 8-corner pad-add it replaced."""
    from fea_tpu.ops.structured import _CORNERS, corner_accumulate_np

    per_row = rng.normal(size=24)
    for dims in [(1, 1, 1), (1, 2, 3), (3, 2, 5), (4, 4, 8)]:
        nx, ny, nz = dims
        want = np.zeros((nz + 1, ny + 1, nx + 1, 3))
        for a, (dz, dy, dx) in enumerate(_CORNERS):
            block = np.broadcast_to(per_row[3 * a : 3 * a + 3], (nz, ny, nx, 3))
            want = want + np.pad(block, ((dz, 1 - dz), (dy, 1 - dy), (dx, 1 - dx), (0, 0)))
        got = corner_accumulate_np(per_row, dims)
        assert np.allclose(got, want, atol=1e-14), dims


def test_stencil_apply_grid_scan_matches_unrolled(rng):
    """The scan-form certification apply (8x smaller executable for warm
    restarts) must match the unrolled stencil to roundoff."""
    import numpy as np

    from fea_tpu.elements.hex8 import stiffness_matrix_np
    from fea_tpu.ops.structured import (
        stencil_apply_grid,
        stencil_apply_grid_scan,
    )

    nx, ny, nz = 5, 4, 7
    corners = 0.1 * np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float
    )
    ke = jnp.asarray(stiffness_matrix_np(corners, ft.Material(E=1e7, nu=0.3)))
    g = jnp.asarray(rng.standard_normal((nz + 1, ny + 1, nx + 1, 3)))
    a = stencil_apply_grid(ke, g, (nx, ny, nz))
    b = stencil_apply_grid_scan(ke, g, (nx, ny, nz))
    assert float(jnp.max(jnp.abs(a - b))) < 1e-13 * float(jnp.max(jnp.abs(a)))
