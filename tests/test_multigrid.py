"""Geometric multigrid: transfer-operator adjointness, V-cycle symmetry
(validity as a PCG preconditioner), and convergence acceleration."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.multigrid import _prolong, _restrict, build_multigrid
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.solvers import pcg
from fea_tpu.dtypes import Policy


def case(nx=8, ny=8, nz=16, lz=0.8):
    mat = ft.Material(E=2e9, nu=0.3)
    scene, dims = structured_scene(nx, ny, nz, 0.1, 0.1, lz, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == lz
    loads[tip, 1] = 10.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
        dtype=jnp.float64,
    )
    return scene, dims, mat, (0.1 / nx, 0.1 / ny, lz / nz)


def test_prolong_restrict_adjoint(rng):
    c = jnp.asarray(rng.normal(size=(5, 4, 3, 3)), jnp.float64)
    f = jnp.asarray(rng.normal(size=(9, 7, 5, 3)), jnp.float64)
    lhs = float(jnp.vdot(_prolong(c), f))
    rhs = float(jnp.vdot(c, _restrict(f)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_vcycle_is_symmetric(rng):
    scene, dims, mat, spacing = case()
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op, spacing, mat, dtype=jnp.float64, coarse_dof_limit=200)
    assert len(mg.levels) >= 3
    shape = (scene.n_nodes, 3)
    r1 = jnp.asarray(rng.normal(size=shape), jnp.float64) * op.free
    r2 = jnp.asarray(rng.normal(size=shape), jnp.float64) * op.free
    s12 = float(jnp.vdot(mg(r1), r2))
    s21 = float(jnp.vdot(r1, mg(r2)))
    assert s12 == pytest.approx(s21, rel=1e-10)


def test_mg_pcg_converges_much_faster_and_agrees():
    scene, dims, mat, spacing = case()
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op, spacing, mat, dtype=jnp.float64)
    b = op.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))
    pol = Policy(jnp.dtype(jnp.float64), jnp.dtype(jnp.float64))

    x_mg, st_mg = pcg(op.apply, b, precond=mg, tol=1e-10, max_iters=300, policy=pol)
    x_j, st_j = pcg(op.apply, b, precond_diag=op.diag_masked(), tol=1e-10, max_iters=20000, policy=pol)

    assert bool(st_mg.converged)
    assert bool(st_j.converged)
    assert int(st_mg.iterations) < int(st_j.iterations) / 5
    u_mg, u_j = np.asarray(x_mg), np.asarray(x_j)
    assert np.max(np.abs(u_mg - u_j)) < 1e-8 * np.max(np.abs(u_j))


def test_mg_as_inner_preconditioner_in_refinement():
    """The production large-scale path: f64 refinement around f32 MG-PCG."""
    scene, dims, mat, spacing = case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    mg_lo = build_multigrid(op_lo, spacing, mat, dtype=jnp.float32)
    sol = ft.solve_operator_refined(
        op_hi, op_lo, scene.loads, scene.prescribed_or_zero(jnp.float64), mg_lo,
        tol=1e-9, inner_tol=1e-2, inner_iters=200,
    )
    assert bool(sol.stats.converged)
    b64 = op_hi.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))
    r_true = np.asarray(b64) - np.asarray(op_hi.apply(sol.displacements))
    assert np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b64)) < 1e-9


def test_coarse_ke_is_exact_double_of_fine():
    """The hierarchy derives coarse Ke by 2x scaling instead of
    re-integration; this pins the underlying identity Ke(2h) == 2 Ke(h)."""
    from fea_tpu.ops.multigrid import _reference_ke_np

    mat = ft.Material(E=3e6, nu=0.25)
    k1 = _reference_ke_np(0.01, 0.02, 0.015, mat)
    k2 = _reference_ke_np(0.02, 0.04, 0.03, mat)
    assert np.max(np.abs(k2 - 2.0 * k1)) <= 1e-12 * np.max(np.abs(k2))
