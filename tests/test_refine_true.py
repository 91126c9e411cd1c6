"""True-residual certification / iterative refinement (solve._refine_true).

Hard-won context (2026-08-18, on-chip): the dd Pallas kernel's apply
error is ~1e-10 relative to its INPUT, but at equilibrium K@u cancels to
~b, so the error relative to the OUTPUT is amplified by the cancellation
factor — a 140k-DOF cantilever's recurrence claimed 8e-10 while the true
f64 residual was 1.1e-5.  The recurrence is self-consistent with the
flawed apply and cannot see it.  The production solvers therefore wrap
the dd pipeline in classic iterative refinement: exact-f64 residual
between passes, corrections solved by the fast dd pipeline, iterate
accumulated in f64, stats reporting the TRUE residual.  These tests pin
the wrapper's contraction behavior with a deliberately corrupted inner
solver (the CPU suite's inner paths are exact-f64, so the floor itself
only manifests on-chip — validated there by bench and tools).
"""
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.ops.transposed import build_multigrid_t
from fea_tpu.solve import (
    Solution,
    _refine_true,
    _t_true_residual,
    solve_operator_fpcg_t_staged,
)

MAT = ft.Material(E=1e7, nu=0.3)


def _case():
    scene, dims = structured_scene(4, 4, 16, 0.1, 0.1, 0.4, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_multigrid_t(
        op.astype(jnp.float32), dtype=jnp.float32, use_pallas=False,
        free_np=free_np, coarse_dof_limit=2000,
    )
    return scene, op, mg, free_np


def test_refine_contracts_a_corrupted_inner_solver():
    """An inner solver whose answers carry a 1e-6-relative smooth error
    (the dd floor's signature: invisible to its own recurrence) must be
    driven to the requested TRUE tolerance by the refinement wrapper."""
    scene, op, mg, free_np = _case()
    zero = scene.prescribed_or_zero(jnp.float64)
    calls = {"n": 0}

    def corrupted_solve(l, p, tol_hint=None):
        s = solve_operator_fpcg_t_staged(op, l, p, mg, tol=1e-9)
        calls["n"] += 1
        u = s.displacements
        pert = (
            1e-6 * jnp.max(jnp.abs(u))
            * (free_np.reshape(-1, 3) * np.sin(np.arange(u.size).reshape(u.shape)))
        )
        return Solution(displacements=u + pert, reactions=s.reactions, stats=s.stats)

    ref = _refine_true(
        corrupted_solve, op, scene.loads, zero, tol=1e-9, max_refine=4
    )
    assert bool(ref.stats.converged)
    assert float(ref.stats.relative_residual) <= 1e-9
    assert 2 <= calls["n"] <= 5  # pass 1 + >=1 correction, bounded
    # reported residual is the INDEPENDENT exact one
    _, r, rn, Au = _t_true_residual(
        op.ke, op.free, scene.loads.astype(jnp.float64), ref.displacements,
        grid_shape=op.grid_shape,
    )
    assert abs(float(rn) - float(ref.stats.residual_norm)) <= 1e-12 * max(float(rn), 1e-300)
    # reactions are the exact raw apply of the refined iterate
    assert np.allclose(np.asarray(ref.reactions), np.asarray(Au), rtol=0, atol=0)


def test_refine_is_noop_for_an_honest_solver():
    """An exact-f64 inner solve already satisfies the true tolerance:
    the wrapper must not add correction passes, and its stats must match
    the independent residual."""
    scene, op, mg, _ = _case()
    zero = scene.prescribed_or_zero(jnp.float64)
    calls = {"n": 0}

    def honest_solve(l, p, tol_hint=None):
        calls["n"] += 1
        return solve_operator_fpcg_t_staged(op, l, p, mg, tol=1e-10)

    ref = _refine_true(honest_solve, op, scene.loads, zero, tol=1e-8, max_refine=3)
    assert calls["n"] == 1
    assert bool(ref.stats.converged)
    assert float(ref.stats.relative_residual) <= 1e-8


def test_host_certification_tier_catches_noisy_device_residual(monkeypatch):
    """Above ~8M DOF the DEVICE residual itself is noise-limited (TPU
    f64 is ~2^-48 double-f32 emulation; noise ~2^-48 * |||K||u||| crosses
    tol there) and device-driven refinement stagnates chasing it.  The
    wrapper must then escalate to host IEEE-f64 residuals and still
    converge.  Simulated here by injecting noise into the device
    certifier."""
    import importlib

    S = importlib.import_module("fea_tpu.solve")
    scene, op, mg, free_np = _case()
    zero = scene.prescribed_or_zero(jnp.float64)
    real_t_true = S._t_true_residual
    rng = np.random.default_rng(0)

    def noisy_device_residual(ke, free, loads, u, du=None, *, grid_shape):
        u_acc, r, rn, Au = real_t_true(ke, free, loads, u, du, grid_shape=grid_shape)
        bn = float(jnp.linalg.norm(loads))
        noise = jnp.asarray(
            rng.standard_normal(np.asarray(r).shape) * free_np.reshape(-1, 3)
        )
        noise = 3e-8 * bn * noise / float(jnp.linalg.norm(noise))
        r_noisy = r + noise
        return u_acc, r_noisy, jnp.linalg.norm(r_noisy), Au

    monkeypatch.setattr(S, "_t_true_residual", noisy_device_residual)

    def honest_solve(l, p, tol_hint=None):
        return solve_operator_fpcg_t_staged(
            op, l, p, mg, tol=tol_hint if tol_hint is not None else 1e-10,
            refine_true=False,
        )

    ref = S._refine_true(
        honest_solve, op, scene.loads, zero, tol=1e-9, max_refine=3,
        solve_exact=honest_solve,
    )
    # the device loop stagnates at the injected 3e-8 noise floor; the
    # host tier must certify/refine to the requested true tolerance
    assert bool(ref.stats.converged)
    assert float(ref.stats.relative_residual) <= 1e-9
    _, r, rn, _ = real_t_true(
        op.ke, op.free, scene.loads.astype(jnp.float64), ref.displacements,
        grid_shape=op.grid_shape,
    )
    bn = float(jnp.linalg.norm(scene.loads.astype(jnp.float64)))
    assert float(rn) / bn <= 1e-9


def test_refine_skips_nonconverged_inner_pass():
    """Refinement addresses the accuracy floor, not non-convergence: a
    failed inner pass returns as-is (loud via converged=False)."""
    scene, op, mg, _ = _case()
    zero = scene.prescribed_or_zero(jnp.float64)
    sol = solve_operator_fpcg_t_staged(
        op, scene.loads, zero, mg, tol=1e-30, max_iters=2
    )
    assert not bool(sol.stats.converged)
    assert int(sol.stats.iterations) == 2
