"""Failure-path guards added in round 2 (VERDICT.md next-round #2/#7/#8):
a broken inner solver must produce a graceful ``converged=False``, never a
10^14x residual explosion; structured operators must reject scenes whose
connectivity is not the voxel grid; ``solve()`` must not stay silent on
non-convergence; the multigrid lambda_max bound must really be an upper
bound."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.solvers.refine import pcg_refined, pcg_refined_host


def small_case(nx=2, ny=2, nz=8):
    mat = ft.Material(E=1e7, nu=0.3)
    scene, dims = structured_scene(nx, ny, nz, 0.1, 0.1, 0.8, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.8, 1] = 1.0
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
        dtype=jnp.float64,
    )
    return scene, dims


@pytest.mark.parametrize("refiner", [pcg_refined, pcg_refined_host])
@pytest.mark.parametrize("breakage", ["nan", "negated"])
def test_refinement_survives_broken_inner_solver(refiner, breakage):
    """Feed a deliberately broken inner operator: the line-searched outer
    loop must stay finite, keep a monotone residual, and report
    converged=False instead of exploding (round-1 failure mode)."""
    scene, dims = small_case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    b = op_hi.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))

    if breakage == "nan":
        apply_lo = lambda x: jnp.full_like(x, jnp.nan)  # noqa: E731
    else:
        apply_lo = lambda x: -op_hi.apply(x.astype(jnp.float64)).astype(x.dtype)  # noqa: E731

    x, stats = refiner(
        op_hi.apply, apply_lo, b, tol=1e-9, max_outer=10, inner_tol=1e-2, inner_iters=50,
    )
    assert not bool(stats.converged)
    assert np.all(np.isfinite(np.asarray(x)))
    b_norm = float(np.linalg.norm(np.asarray(b)))
    # monotone guard: the reported residual never exceeds the initial one
    assert float(stats.residual_norm) <= b_norm * (1 + 1e-12)


def test_refinement_line_search_still_converges_healthy():
    """The guard must not break the healthy path."""
    scene, dims = small_case()
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    op_lo = op_hi.astype(jnp.float32)
    b = op_hi.rhs(scene.loads, scene.prescribed_or_zero(jnp.float64))
    x, stats = pcg_refined(
        op_hi.apply, op_lo.apply, b,
        precond_diag_lo=op_lo.diag_masked(), tol=1e-9, max_outer=20,
        inner_tol=1e-2, inner_iters=2000,
    )
    assert bool(stats.converged)
    r = np.asarray(b) - np.asarray(op_hi.apply(x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9


def test_structured_rejects_permuted_connectivity():
    """Right element count, wrong connectivity -> loud ValueError
    (VERDICT.md weak #7: the count-only check silently produced wrong
    answers)."""
    scene, dims = small_case()
    elements = np.asarray(scene.elements).copy()
    elements[[0, 1]] = elements[[1, 0]]  # permute two elements
    bad = ft.make_scene(
        np.asarray(scene.nodes), elements, np.asarray(scene.fixed),
        np.asarray(scene.loads), ft.Material(E=1e7, nu=0.3), dtype=jnp.float64,
    )
    with pytest.raises(ValueError, match="connectivity"):
        build_structured_operator(bad, dims, dtype=jnp.float64)


def test_structured_rejects_noncongruent_elements():
    scene, dims = small_case()
    nodes = np.asarray(scene.nodes).copy()
    nodes[-1, 2] *= 1.5  # stretch one voxel corner
    bad = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed),
        np.asarray(scene.loads), ft.Material(E=1e7, nu=0.3), dtype=jnp.float64,
    )
    with pytest.raises(ValueError, match="congruent"):
        build_structured_operator(bad, dims, dtype=jnp.float64)


def test_solve_warns_and_raises_on_nonconvergence():
    scene, _ = small_case()
    with pytest.warns(RuntimeWarning, match="did not converge"):
        ft.solve(scene, method="cg", tol=1e-12, max_iters=3)
    with pytest.raises(RuntimeError, match="did not converge"):
        ft.solve(scene, method="cg", tol=1e-12, max_iters=3, on_nonconverged="raise")
    sol = ft.solve(scene, method="cg", tol=1e-12, max_iters=3, on_nonconverged="ignore")
    assert not bool(sol.stats.converged)


def test_gershgorin_bound_dominates_true_lambda_max():
    """The certified Chebyshev window top must bound the true
    lambda_max(D^-1 A) of the masked operator (round-1's power-iteration
    estimate sat BELOW it at the fine level — the divergence root cause)."""
    from fea_tpu.ops.multigrid import _gershgorin_lam_max
    from fea_tpu.ops.structured import stencil_apply_np, stencil_diag_np

    scene, dims = small_case(4, 4, 8)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    ke = np.asarray(op.ke, np.float64)
    free = np.asarray(op.free, np.float64).reshape(op.grid_shape + (3,))
    bound = _gershgorin_lam_max(ke)

    diag = stencil_diag_np(ke, dims)
    mdiag = np.where(free > 0, diag, 1.0)
    inv_sq = 1.0 / np.sqrt(mdiag)

    def sym_apply(v):
        g = inv_sq * v.reshape(free.shape)
        ag = free * stencil_apply_np(ke, free * g, dims) + (1 - free) * g
        return (inv_sq * ag).ravel()

    n = free.size
    A = np.empty((n, n))
    eye = np.eye(n)
    for i in range(n):
        A[:, i] = sym_apply(eye[:, i])
    lam_true = np.linalg.eigvalsh(0.5 * (A + A.T))[-1]
    assert lam_true <= bound
    assert bound <= 2.5 * lam_true  # and not uselessly loose


def test_pcg_bails_out_early_on_divergence():
    """An exploding recurrence exits well before max_iters with
    converged=False (round-1 burned 123 s producing garbage)."""
    from fea_tpu.solvers.cg import pcg

    # indefinite "operator" masquerading as SPD: CG blows up on it
    d = jnp.asarray(np.concatenate([np.full(50, 1.0), np.full(50, -1.0)]))
    apply = lambda x: d * x  # noqa: E731
    b = jnp.asarray(np.random.default_rng(0).normal(size=100))
    x, stats = pcg(apply, b, tol=1e-10, max_iters=100_000)
    assert not bool(stats.converged)
    assert int(stats.iterations) < 100_000


def test_solve_is_bitwise_deterministic():
    """Two identical solves (including an operator rebuild) produce
    bit-identical displacements — segment-sum/incidence-plan assembly has
    no nondeterministic reduction order (SURVEY.md §5.2 analog)."""
    scene, dims = small_case(4, 4, 12)

    def run():
        op = build_structured_operator(scene, dims, dtype=jnp.float64)
        sol = ft.solve_operator(
            op, scene.loads, scene.prescribed_or_zero(jnp.float64),
            method="cg", tol=1e-10, max_iters=5000,
        )
        return np.asarray(sol.displacements)

    u1, u2 = run(), run()
    assert u1.tobytes() == u2.tobytes()


def test_solve_runs_clean_under_debug_nans():
    """jax_debug_nans CI hook (SURVEY.md §5.2): the whole solve pipeline
    must produce no intermediate NaNs even where guards use jnp.where."""
    import jax

    scene, dims = small_case(2, 2, 6)
    try:
        jax.config.update("jax_debug_nans", True)
        sol = ft.solve(scene, method="cg", tol=1e-8, max_iters=2000)
        assert bool(sol.stats.converged)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_debug_nans_flag_catches_nan_at_source():
    """solve(debug_nans=True) — the first-class sanitizer hook — raises
    FloatingPointError at the first NaN-producing primitive (here a NaN
    load), instead of returning a garbage Solution; the same scene with
    the flag off completes (the blow-up guard path)."""
    import jax

    scene, dims = small_case(2, 2, 6)
    loads = np.asarray(scene.loads).copy()
    loads[0, 0] = np.nan
    bad = ft.make_scene(
        np.asarray(scene.nodes), np.asarray(scene.elements),
        np.asarray(scene.fixed), loads, scene.material, dtype=jnp.float64,
    )
    with pytest.raises(FloatingPointError):
        ft.solve(bad, method="cg", tol=1e-8, max_iters=50, debug_nans=True,
                 on_nonconverged="ignore")
    assert not jax.config.jax_debug_nans  # scoped: restored on exit
    # flag off: no raise (guards bail; result flagged non-converged)
    sol = ft.solve(bad, method="cg", tol=1e-8, max_iters=50,
                   on_nonconverged="ignore")
    assert not bool(sol.stats.converged)


def test_debug_nans_via_config():
    """SolverConfig(debug_nans=True) routes through the same hook."""
    scene, dims = small_case(2, 2, 6)
    cfg = ft.SolverConfig(debug_nans=True, method="cg", tol=1e-8)
    sol = ft.solve(scene, config=cfg, max_iters=2000)
    assert bool(sol.stats.converged)


def test_large_unstructured_without_x64_raises():
    """The AUTO-routed >=50k-DOF unstructured fallthrough fails loudly
    without x64 (same contract as the structured/extruded guards), while
    an EXPLICIT method='cg' is the documented escape hatch and must NOT
    raise.  Threshold faked instead of building a 50k-DOF scene."""
    import importlib

    S = importlib.import_module("fea_tpu.solve")
    import fea_tpu.dtypes as D

    scene, dims = small_case(4, 4, 40)  # 3,075 DOF: above the dense cutoff
    nodes = np.asarray(scene.nodes).copy()
    nodes[10] += 1e-4  # distorted: defeats structured/extruded detection
    bad = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed),
        np.asarray(scene.loads), scene.material, dtype=jnp.float64,
    )
    import unittest.mock as mock

    with mock.patch.object(S, "_BLOCK_PRECOND_MIN_DOF", 100), \
         mock.patch.object(S, "solve_operator") as spy, \
         mock.patch.object(D, "x64_enabled", return_value=False):
        with pytest.raises(RuntimeError, match="x64"):
            ft.solve(bad, tol=1e-8)  # auto: guarded
        ft.solve(bad, method="cg", tol=1e-8, on_nonconverged="ignore")
        assert spy.called  # explicit cg: plain path ran, no raise
