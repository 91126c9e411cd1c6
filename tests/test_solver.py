"""Solver tests: PCG on SPD systems, masking == reduction equivalence,
prescribed displacements, convergence reporting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.solvers import pcg
from fea_tpu.dtypes import Policy

from oracle import assemble_sparse, solve_reduced


def test_pcg_random_spd(rng):
    n = 200
    A_half = rng.normal(size=(n, n))
    A = jnp.asarray(A_half @ A_half.T + n * np.eye(n), jnp.float64)
    b = jnp.asarray(rng.normal(size=n), jnp.float64)
    policy = Policy(compute=jnp.dtype(jnp.float64), accum=jnp.dtype(jnp.float64))
    x, stats = pcg(lambda v: A @ v, b, precond_diag=jnp.diag(A), tol=1e-12, policy=policy)
    assert bool(stats.converged)
    assert np.linalg.norm(np.asarray(A @ x - b)) < 1e-10 * np.linalg.norm(np.asarray(b))


def test_pcg_zero_rhs():
    A = jnp.eye(8, dtype=jnp.float64)
    x, stats = pcg(lambda v: A @ v, jnp.zeros(8, jnp.float64), tol=1e-10)
    assert bool(stats.converged)
    assert np.allclose(np.asarray(x), 0.0)


def test_masking_equals_reduction():
    """The masked operator's solution equals the reference-style
    reduce-and-solve on free DOFs (SURVEY.md §7 'Dynamic free-DOF sets:
    must prove masking preserves the solution')."""
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 5, 0.1, 0.1, 0.5)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.5, 0] = 3.0
    E, nu = 5e6, 0.3
    scene = ft.make_scene(nodes, elements, fixed, loads, ft.Material(E, nu), dtype=jnp.float64)

    sol = ft.solve(scene, method="cg", tol=1e-13)
    K = assemble_sparse(nodes, elements, E, nu)
    u_oracle = solve_reduced(K, loads, fixed)
    scale = np.max(np.abs(u_oracle))
    assert np.max(np.abs(np.asarray(sol.displacements) - u_oracle)) < 1e-8 * scale

    # reactions = K @ u over all DOFs (reference parity, fea.py:113)
    r_oracle = (K @ u_oracle.reshape(-1)).reshape(loads.shape)
    assert np.allclose(np.asarray(sol.reactions), r_oracle, rtol=1e-6, atol=1e-8 * np.max(np.abs(r_oracle)))


def test_prescribed_displacements():
    """Nonzero prescribed displacement at the constrained face — a
    capability beyond the reference (it only supports zero BCs)."""
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 4, 0.1, 0.1, 0.4)
    fixed = ft.fix_where(nodes, lambda p: (p[:, 2] == 0.0) | (p[:, 2] == 0.4), 3)
    prescribed = np.zeros_like(nodes)
    stretch = 1e-3
    prescribed[nodes[:, 2] == 0.4, 2] = stretch
    scene = ft.make_scene(
        nodes, elements, fixed, np.zeros_like(nodes), ft.Material(1e7, 0.0),
        prescribed=prescribed, dtype=jnp.float64,
    )
    sol = ft.solve(scene, method="cg", tol=1e-12)
    u = np.asarray(sol.displacements)
    # nu = 0 uniaxial stretch: u_z linear in z, no lateral contraction
    expected_uz = stretch * nodes[:, 2] / 0.4
    assert np.max(np.abs(u[:, 2] - expected_uz)) < 1e-8 * stretch / 1e-3
    assert np.max(np.abs(u[:, :2])) < 1e-9


def test_solve_operator_is_jittable_and_stats_reported():
    nodes, elements = ft.mesh.box_hex_mesh(1, 1, 3, 0.1, 0.1, 0.3)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    loads = np.zeros_like(nodes)
    loads[-1, 1] = 1.0
    scene = ft.make_scene(nodes, elements, fixed, loads, ft.Material(1e6, 0.3), dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64)
    sol = ft.solve_operator(op, scene.loads, scene.prescribed_or_zero(jnp.float64), tol=1e-10)
    assert int(sol.stats.iterations) > 0
    assert float(sol.stats.relative_residual) < 1e-10
    assert bool(sol.stats.converged)


def test_inverted_element_raises_on_host():
    nodes, elements = ft.mesh.box_hex_mesh(1, 1, 2, 0.1, 0.1, 0.2)
    elements = elements.copy()
    elements[0, [0, 1]] = elements[0, [1, 0]]  # invert one element
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(
        nodes, elements, fixed, np.zeros_like(nodes), ft.Material(1e6, 0.3), dtype=jnp.float64
    )
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    with pytest.raises(ValueError, match="Jacobian"):
        ft.solve(scene, operator=op)


def test_vmap_material_sweep():
    """Batched design sweep: vmap the jit-pure solve over Young's modulus;
    linear elasticity scales u ~ 1/E (SURVEY.md §2 'Batch/sweep parallel'
    — absent from the reference)."""
    nodes, elements = ft.mesh.box_hex_mesh(1, 1, 4, 0.1, 0.1, 0.4)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.4, 0] = 1.0
    Es = jnp.asarray([1e6, 2e6, 4e6], jnp.float64)

    def solve_for_E(E):
        scene = ft.make_scene(
            nodes, elements, fixed, loads, ft.Material(E, 0.3), dtype=jnp.float64
        )
        op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
        return ft.solve_displacements(op, scene.loads, scene.prescribed_or_zero(jnp.float64), tol=1e-11)

    u_batch = jax.vmap(solve_for_E)(Es)
    u0, u1, u2 = (np.asarray(u_batch[i]) for i in range(3))
    assert np.allclose(u0, 2 * u1, rtol=1e-6)
    assert np.allclose(u1, 2 * u2, rtol=1e-6)


def test_solve_auto_routes_voxel_boxes_to_multigrid_fpcg():
    """A large regular voxel box through plain ft.solve() must take the
    structured multigrid fpcg path automatically: mesh-independent ~12
    iterations (Jacobi-CG would need hundreds here)."""
    from fea_tpu.ops.structured import structured_scene

    mat = ft.Material(E=1e7, nu=0.3)
    scene, _ = structured_scene(16, 16, 80, 0.1, 0.1, 0.5, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.5, 1] = 1.0
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
        dtype=jnp.float64,
    )
    assert scene.n_dof >= 50_000
    sol = ft.solve(scene, tol=1e-8)
    assert bool(sol.stats.converged)
    assert int(sol.stats.iterations) <= 40
    # equilibrium: root reactions balance the applied load
    react = np.asarray(sol.reactions)
    assert abs(react[nodes[:, 2] == 0.0, 1].sum() + loads[:, 1].sum()) < 1e-6 * abs(loads[:, 1].sum())
