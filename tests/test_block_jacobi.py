"""Nodal block-Jacobi preconditioner (SURVEY.md §7 "Jacobi adequacy":
"block-Jacobi per node 3x3" is the named next step beyond scalar Jacobi
for the unstructured path — the structured/extruded families have
multigrid instead)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft


def cantilever(nx=2, ny=2, nz=10, kind=None):
    nodes, elements = ft.mesh.box_hex_mesh(nx, ny, nz, 0.1, 0.1, 1.0)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, dofs_per_node=3)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 1.0
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(nodes, elements, fixed, loads,
                          ft.Material(E=1e7, nu=0.3), dtype=jnp.float64)
    return scene


@pytest.mark.parametrize("uniform", [True, False])
def test_block_diag_matches_dense_oracle(uniform):
    """Assembled (N,3,3) blocks == the dense K's nodal diagonal blocks,
    for both the shared-Ke and the matrix-free element paths."""
    scene = cantilever(2, 2, 4)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=uniform)
    K = np.asarray(op.dense())
    N = scene.n_nodes
    want = np.stack([K[3 * n:3 * n + 3, 3 * n:3 * n + 3] for n in range(N)])
    got = np.asarray(op.block_diag_raw())
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8 * abs(want).max())


def test_block_diag_inv_masked_is_inverse():
    """Closed-form adjugate inverse == numpy inverse of the masked blocks,
    with identity blocks on fully fixed nodes."""
    scene = cantilever(2, 2, 4)
    op = ft.build_operator(scene, dtype=jnp.float64)
    B = np.asarray(op.block_diag_raw())
    F = np.asarray(scene.fixed) == 0  # free mask (N, 3)
    Binv = np.asarray(op.block_diag_inv_masked())
    eye = np.eye(3)
    for n in range(scene.n_nodes):
        f = F[n].astype(np.float64)
        Bm = np.outer(f, f) * B[n] + np.diag(1.0 - f)
        np.testing.assert_allclose(Binv[n] @ Bm, eye, atol=1e-10)


def test_block_jacobi_converges_no_slower_and_matches():
    """Block-Jacobi PCG reaches the same solution in no more iterations
    than scalar Jacobi (it strictly refines the preconditioner), and both
    match the dense solve."""
    scene = cantilever(2, 2, 10)
    op = ft.build_operator(scene, dtype=jnp.float64)
    zero = jnp.zeros_like(scene.loads)
    sol_s = ft.solve_operator(op, scene.loads, zero, method="cg",
                              tol=1e-10, max_iters=20_000, precondition=True)
    sol_b = ft.solve_operator(op, scene.loads, zero, method="cg",
                              tol=1e-10, max_iters=20_000, precondition="block")
    assert bool(sol_s.stats.converged) and bool(sol_b.stats.converged)
    it_s, it_b = int(sol_s.stats.iterations), int(sol_b.stats.iterations)
    assert it_b <= it_s, (it_b, it_s)
    sol_d = ft.solve_operator(op, scene.loads, zero, method="dense")
    np.testing.assert_allclose(
        np.asarray(sol_b.displacements), np.asarray(sol_d.displacements),
        rtol=1e-7, atol=1e-12,
    )


def test_solve_auto_routes_block_at_scale(monkeypatch):
    """solve()'s unstructured-CG fallthrough uses block-Jacobi above the
    size threshold (monkeypatched down; the scene is distorted so it
    cannot take the structured/extruded fast paths)."""
    import importlib

    S = importlib.import_module("fea_tpu.solve")

    scene = cantilever(2, 2, 10)
    nodes = np.asarray(scene.nodes).copy()
    rng = np.random.default_rng(3)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
    nodes = nodes + 0.01 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    scene = ft.make_scene(nodes, np.asarray(scene.elements),
                          np.asarray(scene.fixed), np.asarray(scene.loads),
                          scene.material, dtype=jnp.float64)
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)

    calls = {}
    real = S.solve_operator

    def spy(op, loads, prescribed, **kw):
        calls["precondition"] = kw.get("precondition")
        return real(op, loads, prescribed, **kw)

    monkeypatch.setattr(S, "solve_operator", spy)
    sol = ft.solve(scene, method="cg", tol=1e-8)
    assert calls["precondition"] == "block"
    assert bool(sol.stats.converged)
