"""Mixed-precision iterative refinement: must reach f64-level residuals
on systems where all-f32 CG stagnates with a fake recurrence residual
(the failure observed on TPU at bench scale — SURVEY.md §7 'Precision')."""
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.solvers import pcg, pcg_refined
from fea_tpu.dtypes import Policy


def slender_case(nx=4, ny=4, nz=32):
    """Slender f64 cantilever whose conditioning defeats f32-only CG."""
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(nx, ny, nz, 0.05, 0.05, 1.0, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 1.0
    loads[tip, 1] = 100.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
        dtype=jnp.float64,
    )
    return scene, dims


def test_refined_reaches_f64_residual():
    scene, dims = slender_case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    sol = ft.solve_operator_refined(
        op_hi, op_lo, scene.loads, scene.prescribed_or_zero(jnp.float64),
        tol=1e-9, inner_tol=1e-2, inner_iters=3000,
    )
    assert bool(sol.stats.converged)
    # verify against an all-f64 solve
    ref = ft.solve_operator(op_hi, scene.loads, scene.prescribed_or_zero(jnp.float64), tol=1e-12, max_iters=30000)
    u = np.asarray(sol.displacements)
    u_ref = np.asarray(ref.displacements)
    assert np.max(np.abs(u - u_ref)) < 1e-7 * np.max(np.abs(u_ref))
    # the true residual, recomputed here in f64, really is small
    b64 = op_hi.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))
    r_true = np.asarray(b64) - np.asarray(op_hi.apply(sol.displacements))
    rel_true = np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b64))
    assert rel_true < 1e-9
    assert float(sol.stats.relative_residual) < 1e-9


def test_refined_host_outer_matches_fused():
    """The host-outer-loop variant is the same algorithm as the fused one."""
    scene, dims = slender_case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    from fea_tpu.solve import solve_operator_refined_host

    kwargs = dict(tol=1e-9, inner_tol=1e-2, inner_iters=3000)
    sol_f = ft.solve_operator_refined(
        op_hi, op_lo, scene.loads, scene.prescribed_or_zero(jnp.float64), **kwargs
    )
    sol_h = solve_operator_refined_host(
        op_hi, op_lo, scene.loads, scene.prescribed_or_zero(jnp.float64), **kwargs
    )
    assert bool(sol_h.stats.converged)
    u_f = np.asarray(sol_f.displacements)
    u_h = np.asarray(sol_h.displacements)
    assert np.max(np.abs(u_f - u_h)) < 1e-8 * np.max(np.abs(u_f))


def test_f32_only_cg_is_insufficient_here():
    """Documents why refinement exists: the all-f32 path on the same
    system reports a recurrence residual it cannot actually have."""
    scene, dims = slender_case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    b32 = op_lo.rhs(scene.loads.astype(jnp.float32), jnp.zeros_like(scene.loads, jnp.float32))
    x32, stats32 = pcg(
        op_lo.apply, b32, precond_diag=op_lo.diag_masked(), tol=1e-10, max_iters=8000,
        policy=Policy(compute=jnp.dtype(jnp.float32), accum=jnp.dtype(jnp.float32)),
    )
    # true residual in f64 of the f32 "solution"
    b64 = op_hi.rhs(scene.loads, jnp.zeros_like(scene.loads))
    r_true = np.asarray(b64) - np.asarray(op_hi.apply(x32.astype(jnp.float64)))
    rel_true = np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b64))
    # the f32 recurrence either stalls before 1e-10 or mis-reports; the
    # true residual stays far above f64 refinement territory
    assert rel_true > 1e-9


def test_fpcg_reaches_f64_residual_in_few_vcycles():
    """The production large-scale path: f64 flexible-PCG with the f32
    multigrid V-cycle as preconditioner.  Unlike refinement (whose
    per-outer gain ~kappa*eps_f32 stalls at scale), the f64 recurrence
    tracks the true residual and converges mesh-independently (~12
    iterations measured at 140k and 1.05M DOF)."""
    from fea_tpu.ops.multigrid import build_multigrid

    scene, dims = slender_case(4, 4, 32)
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    mg = build_multigrid(op_lo, (0.05 / 4, 0.05 / 4, 1.0 / 32), scene.material, dtype=jnp.float32)
    sol = ft.solve_operator_fpcg(
        op_hi, scene.loads, scene.prescribed_or_zero(jnp.float64), mg,
        tol=1e-9, max_iters=60,
    )
    assert bool(sol.stats.converged)
    assert int(sol.stats.iterations) <= 40
    b64 = op_hi.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))
    r_true = np.asarray(b64) - np.asarray(op_hi.apply(sol.displacements))
    rel_true = np.linalg.norm(r_true) / np.linalg.norm(np.asarray(b64))
    assert rel_true < 1e-9
    # the f64 recurrence must track the true residual closely (the whole
    # point vs the f32 inner recurrence, which lies by orders of magnitude)
    assert abs(float(sol.stats.relative_residual) - rel_true) < 0.1 * rel_true + 1e-14
