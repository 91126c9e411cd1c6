"""Transposed-layout (component-major) pipeline == flat-grid pipeline.

The Pallas-kernel solve path (ops/transposed.py, solve_operator_fpcg_t)
re-expresses the whole flagship solver in (3, Y, X, Z); these tests pin
that every stage — raw stencil apply, V-cycle, full fpcg solve — matches
the validated flat-grid implementation on CPU.  On-chip agreement is
asserted separately by tools/tpu_check.py inside the benchmark run.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.multigrid import build_multigrid
from fea_tpu.ops.structured import (
    build_structured_operator,
    stencil_apply_grid,
    structured_scene,
)
from fea_tpu.ops.transposed import (
    build_multigrid_t,
    grid_of_t,
    masked_apply_dd_T,
    stencil_apply_grid_T,
    t_of_grid,
    transpose_multigrid,
)
from fea_tpu.solve import solve_operator_fpcg, solve_operator_fpcg_t

MAT = ft.Material(E=1e7, nu=0.3)


def _cantilever(nx, ny, nz):
    scene, dims = structured_scene(nx, ny, nz, 0.1, 0.1, 0.5, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 10.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    return scene, dims


def test_apply_T_matches_flat_apply(rng):
    for dims in [(3, 2, 5), (1, 1, 1), (4, 4, 8)]:
        scene, dims = _cantilever(*dims)
        op = build_structured_operator(scene, dims, dtype=jnp.float64)
        Z, Y, X = op.grid_shape
        g = jnp.asarray(rng.normal(size=(Z, Y, X, 3)))
        want = np.asarray(stencil_apply_grid(op.ke, g, dims))
        got = np.asarray(grid_of_t(stencil_apply_grid_T(op.ke, t_of_grid(g))))
        assert np.allclose(got, want, rtol=1e-13, atol=1e-13 * np.abs(want).max())


def test_transpose_involution(rng):
    g = jnp.asarray(rng.normal(size=(4, 3, 5, 3)))
    assert np.array_equal(np.asarray(grid_of_t(t_of_grid(g))), np.asarray(g))


def test_vcycle_T_matches_flat_vcycle(rng):
    scene, dims = _cantilever(4, 4, 8)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    op32 = op.astype(jnp.float32)
    mg = build_multigrid(op32, degree=3, dtype=jnp.float32, small_level_dof=0)
    mg_t = transpose_multigrid(mg, use_pallas=False)
    Z, Y, X = op.grid_shape
    r = rng.normal(size=(Z * Y * X, 3)).astype(np.float32)
    want = np.asarray(mg(jnp.asarray(r)))
    rT = t_of_grid(jnp.asarray(r).reshape(Z, Y, X, 3))
    got = np.asarray(grid_of_t(mg_t(rT))).reshape(-1, 3)
    # same math, different slice/transpose order: f32 rounding only
    assert np.allclose(got, want, rtol=2e-5, atol=2e-5 * np.abs(want).max())


def test_build_multigrid_t_matches_converted_hierarchy():
    """The direct transposed builder (host-side NumPy transposes, one
    device transfer per array) produces bitwise the same hierarchy as
    converting the flat-grid build."""
    scene, dims = _cantilever(4, 4, 8)
    op32 = build_structured_operator(scene, dims, dtype=jnp.float64).astype(jnp.float32)
    mg_t1 = transpose_multigrid(
        build_multigrid(
            op32, degree=3, dtype=jnp.float32, small_level_dof=0, coarse_dof_limit=100
        ),
        use_pallas=False,
    )
    mg_t2 = build_multigrid_t(
        op32, degree=3, dtype=jnp.float32, small_level_dof=0, coarse_dof_limit=100
    )
    assert len(mg_t1.levels) == len(mg_t2.levels) > 1
    for l1, l2 in zip(mg_t1.levels, mg_t2.levels):
        assert np.array_equal(np.asarray(l1.ke), np.asarray(l2.ke))
        assert np.array_equal(np.asarray(l1.free), np.asarray(l2.free))
        assert np.array_equal(np.asarray(l1.inv_diag), np.asarray(l2.inv_diag))
        assert float(l1.lam_max) == float(l2.lam_max)
    assert np.array_equal(np.asarray(mg_t1.coarse_inv), np.asarray(mg_t2.coarse_inv))


@pytest.mark.slow
def test_masked_dd_apply_matches_f64(rng):
    from fea_tpu.ops.pallas_stencil import split_ke_dd

    scene, dims = _cantilever(3, 3, 6)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    Z, Y, X = op.grid_shape
    x = jnp.asarray(rng.normal(size=(Z * Y * X, 3)))
    want = np.asarray(op.apply(x))
    ksplits = tuple(jnp.asarray(k) for k in split_ke_dd(np.asarray(op.ke)))
    freeT = t_of_grid(op.free.reshape(Z, Y, X, 3))
    xT = t_of_grid(x.reshape(Z, Y, X, 3))
    got = np.asarray(grid_of_t(
        masked_apply_dd_T(ksplits, freeT, xT, interpret=True)
    )).reshape(-1, 3)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-9, err  # double-f32 EFT accuracy, far beyond plain f32


def test_fpcg_t_matches_fpcg():
    scene, dims = _cantilever(4, 4, 12)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op.astype(jnp.float32), dtype=jnp.float32, small_level_dof=0)
    zero = scene.prescribed_or_zero(jnp.float64)
    want = solve_operator_fpcg(op, scene.loads, zero, mg, tol=1e-10, max_iters=100)
    got = solve_operator_fpcg_t(
        op, scene.loads, zero, mg, tol=1e-10, max_iters=100, use_pallas=False
    )
    assert bool(got.stats.converged)
    u_w = np.asarray(want.displacements)
    u_g = np.asarray(got.displacements)
    assert np.allclose(u_g, u_w, rtol=1e-8, atol=1e-10 * np.abs(u_w).max())
    r_w = np.asarray(want.reactions)
    r_g = np.asarray(got.reactions)
    assert np.allclose(r_g, r_w, rtol=1e-6, atol=1e-8 * np.abs(r_w).max())
    # same preconditioner, same recurrence: iteration counts agree closely
    assert abs(int(got.stats.iterations) - int(want.stats.iterations)) <= 2


@pytest.mark.slow
def test_fpcg_t_pallas_interpret_smoke():
    """Full Pallas path (fused f32 V-cycle kernels + double-f32 dd apply)
    in interpreter mode on a tiny mesh: converges and matches the
    non-Pallas transposed solve."""
    scene, dims = _cantilever(2, 2, 4)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    # degree=2 / tol=1e-7 halve the interpret-mode kernel passes (this
    # was the suite's second-slowest item); the Pallas-vs-XLA agreement
    # being pinned is iteration-for-iteration, not tolerance-dependent
    mg = build_multigrid(
        op.astype(jnp.float32), dtype=jnp.float32, small_level_dof=0, degree=2
    )
    zero = scene.prescribed_or_zero(jnp.float64)
    want = solve_operator_fpcg_t(
        op, scene.loads, zero, mg, tol=1e-7, max_iters=60, use_pallas=False
    )
    got = solve_operator_fpcg_t(
        op, scene.loads, zero, mg, tol=1e-7, max_iters=60,
        use_pallas=True, interpret=True,
    )
    assert bool(got.stats.converged)
    u_w = np.asarray(want.displacements)
    u_g = np.asarray(got.displacements)
    assert np.allclose(u_g, u_w, rtol=1e-6, atol=1e-8 * np.abs(u_w).max())


@pytest.mark.slow
def test_fpcg_t_pallas_dd_nonzero_prescribed():
    """The double-f32 pair-space solver (fpcg_dd + dd kernels, interpret
    mode) handles prescribed-displacement BCs: its rhs assembles in pair
    arithmetic and must match the f64 flat-grid solve."""
    scene, dims = _cantilever(2, 2, 4)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op.astype(jnp.float32), dtype=jnp.float32, small_level_dof=0)
    presc = np.zeros((scene.n_nodes, 3))
    fixed = np.asarray(scene.fixed) > 0
    presc[fixed[:, 1], 1] = -2e-4
    presc_j = jnp.asarray(presc)
    want = solve_operator_fpcg(op, scene.loads, presc_j, mg, tol=1e-9, max_iters=60)
    got = solve_operator_fpcg_t(
        op, scene.loads, presc_j, mg, tol=1e-9, max_iters=60,
        use_pallas=True, interpret=True,
    )
    assert bool(got.stats.converged)
    u_w = np.asarray(want.displacements)
    u_g = np.asarray(got.displacements)
    assert np.allclose(u_g, u_w, rtol=1e-6, atol=1e-8 * np.abs(u_w).max())
    assert np.allclose(u_g[fixed[:, 1], 1], -2e-4)


def test_fpcg_t_nonzero_prescribed():
    """Prescribed (settlement) BCs flow through the transposed rhs path."""
    scene, dims = _cantilever(2, 2, 6)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op.astype(jnp.float32), dtype=jnp.float32, small_level_dof=0)
    presc = np.zeros((scene.n_nodes, 3))
    fixed = np.asarray(scene.fixed) > 0
    presc[fixed[:, 0], 0] = 1e-4  # uniform root settlement in x
    presc_j = jnp.asarray(presc)
    want = solve_operator_fpcg(op, scene.loads, presc_j, mg, tol=1e-10, max_iters=100)
    got = solve_operator_fpcg_t(
        op, scene.loads, presc_j, mg, tol=1e-10, max_iters=100, use_pallas=False
    )
    assert bool(got.stats.converged)
    u_w = np.asarray(want.displacements)
    u_g = np.asarray(got.displacements)
    assert np.allclose(u_g, u_w, rtol=1e-8, atol=1e-10 * np.abs(u_w).max())
    # prescribed values present verbatim on the fixed DOFs
    assert np.allclose(u_g[fixed[:, 0], 0], 1e-4)
