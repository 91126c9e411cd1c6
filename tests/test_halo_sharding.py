"""z-sharded production pipeline (parallel/halo.py) vs single device.

The flagship transposed Pallas pipeline — dd stencil apply, f32
multigrid V-cycle, staged FCG — decomposed into z-slabs over an
8-virtual-device CPU mesh with the kernels in interpreter mode, pinned
against the single-device staged solver (VERDICT.md round-2 #4).

Shape choice: 2x2x12 gives Z = 13 vertex planes over 8 devices ->
Zl = 2 with 3 planes of padding, so the global z-max plane (12) sits on
shard 6 (of 7) — exercising the thin-slab XLA correction at its static
dev_corr/cl location, not just the easy last-shard case.  (Sized for
the one-core CPU runner: the sharded interpret-mode kernel calls
dominate suite time — the 4x4 section cost 2.5x this one at identical
coverage.)  The single-device references run the XLA dd twin
(use_pallas=False): same pair arithmetic, ~1e-11 apply-level agreement
with the kernels (pinned by test_staged.py::
test_apply_dot_xla_matches_f64_oracle), and it keeps the suite's
interpret-Pallas compiles to the sharded programs actually under test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import fea_tpu as ft
from fea_tpu.ops import df64
from fea_tpu.ops.pallas_stencil import stencil_tables_dd
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.ops.transposed import build_multigrid_t, t_of_grid
from fea_tpu.parallel.halo import build_zsharded_solver
from fea_tpu.parallel.sharding import make_device_mesh
from fea_tpu.solve import _st_apply_dot, solve_operator_fpcg_t_staged

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    mat = ft.Material(E=6.9e10, nu=0.3)
    scene, dims = structured_scene(2, 2, 12, 0.1, 0.1, 1.0, mat, dtype=jnp.float64)
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    free_host = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_multigrid_t(
        op_hi.astype(jnp.float32), degree=2, dtype=jnp.float32,
        small_level_dof=0, use_pallas=False, coarse_dof_limit=300,
        free_np=free_host,
    )
    assert len(mg.levels) >= 2  # fine level shards, the rest replicates
    mesh = make_device_mesh(8, "z")
    solver = build_zsharded_solver(op_hi, mg, mesh, "z", interpret=True)
    return scene, op_hi, mg, solver


@pytest.mark.slow
def test_sharded_dd_apply_matches_single_device(setup, rng):
    scene, op_hi, mg, solver = setup
    Z, Y, X = op_hi.grid_shape
    x64 = rng.normal(size=(Z * Y * X, 3))
    p_pair = solver.pair_of_f64(x64)
    Ap, pAp = solver._apply_dot(solver.ddtabs, solver.ones32, p_pair)
    got = np.asarray(solver.from_T_pair(Ap))[: Z * Y * X]  # padded flat

    ddtabs = stencil_tables_dd(np.asarray(op_hi.ke, np.float64))
    xT = t_of_grid(jnp.asarray(x64.reshape(Z, Y, X, 3)))
    pair = (
        xT.astype(jnp.float32),
        (xT - xT.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32),
    )
    ones = jnp.ones((3, Y, X, Z), jnp.float32)
    ref_pair, ref_dot = _st_apply_dot(ones, ddtabs, pair, interpret=True)
    ref = np.transpose(
        np.asarray(df64.combine(ref_pair, jnp.float64)), (3, 1, 2, 0)
    ).reshape(-1, 3)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 5e-11
    # the psum'd pair dot agrees with the single-device tree reduction
    assert float(pAp) == pytest.approx(float(ref_dot), rel=1e-12)


def test_sharded_staged_solve_matches_single_device(setup):
    scene, op_hi, mg, solver = setup
    Z, Y, X = op_hi.grid_shape
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 1.0
    loads[tip, 1] = 1000.0 / tip.sum()

    # recurrence pin WITHOUT refinement: identical recurrence =>
    # identical iteration count (dots differ only by reduction order).
    # With refinement on, totals include correction-pass iterations whose
    # lengths legitimately vary between the two (independently refined)
    # paths, so that part is asserted separately below.
    sol_sh_raw = solver.solve(loads, tol=1e-7, max_iters=100, refine_true=False)
    sol_1_raw = solve_operator_fpcg_t_staged(
        op_hi, jnp.asarray(loads), None, mg,
        tol=1e-7, max_iters=100, use_pallas=False,
        refine_true=False,
    )
    assert bool(sol_sh_raw.stats.converged) and bool(sol_1_raw.stats.converged)
    assert abs(int(sol_sh_raw.stats.iterations) - int(sol_1_raw.stats.iterations)) <= 1

    # refined (production-default) solves: both must certify the TRUE
    # residual and agree
    sol_sh = solver.solve(loads, tol=1e-7, max_iters=100)
    assert bool(sol_sh.stats.converged)
    sol_1 = solve_operator_fpcg_t_staged(
        op_hi, jnp.asarray(loads), None, mg,
        tol=1e-7, max_iters=100, use_pallas=False,
    )
    assert bool(sol_1.stats.converged)

    u_sh = np.asarray(sol_sh.displacements)
    u_1 = np.asarray(sol_1.displacements)
    assert np.abs(u_sh - u_1).max() / np.abs(u_1).max() < 1e-6
    r_sh = np.asarray(sol_sh.reactions)
    r_1 = np.asarray(sol_1.reactions)
    assert np.abs(r_sh - r_1).max() / np.abs(r_1).max() < 1e-6
    # equilibrium: reactions balance the applied load
    assert np.allclose(r_sh.sum(axis=0)[1], 0.0, atol=1e-6 * np.abs(loads).sum())


def test_solve_auto_routes_sharded_and_stays_distributed(setup):
    """The z-sharded solver keeps every internal array z-slab DISTRIBUTED
    (no full-mesh array on a single device — VERDICT.md r2 #4 "Done"),
    and its certified residual agrees with an independent host check.
    Reuses the module fixture's solver so the shard programs compiled by
    the other tests serve this one too."""
    scene, op_hi, mg, solver = setup
    Z, Y, X = op_hi.grid_shape
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == nodes[:, 2].max(), 1] = 1.0

    loadsT64, b_pair, b2, x0, r_pair, rr = solver._setup_from_loads(
        jnp.asarray(loads, jnp.float64), None
    )
    n_dev = len(solver.mesh.devices.ravel())
    for arr in (loadsT64, b_pair[0], r_pair[0], solver.freeT64):
        shards = arr.addressable_shards
        assert len(shards) == n_dev
        # each device holds exactly one z-slab, never the full z extent
        assert shards[0].data.shape[-1] == arr.shape[-1] // n_dev

    sol = solver.solve(jnp.asarray(loads, jnp.float64), None, tol=1e-8)
    assert bool(sol.stats.converged)
    # independent host IEEE-f64 certification of the reported residual
    from fea_tpu.ops.structured import stencil_apply_np

    u = np.asarray(sol.displacements)
    dims = (X - 1, Y - 1, Z - 1)
    Au = stencil_apply_np(
        np.asarray(op_hi.ke, np.float64), u.reshape(Z, Y, X, 3), dims
    ).reshape(-1, 3)
    free = np.asarray(op_hi.free, np.float64)
    r = free * (loads.reshape(-1, 3) - Au)
    rel = np.linalg.norm(r) / np.linalg.norm(free * loads.reshape(-1, 3))
    assert rel <= 1.1 * max(float(sol.stats.relative_residual), 1e-10)


@pytest.fixture(scope="module")
def setup_l1():
    """3-level hierarchy so level 1 shards too (round-4, VERDICT r3 #8)."""
    mat = ft.Material(E=6.9e10, nu=0.3)
    scene, dims = structured_scene(4, 4, 16, 0.1, 0.1, 1.0, mat, dtype=jnp.float64)
    op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
    free_host = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_multigrid_t(
        op_hi.astype(jnp.float32), degree=2, dtype=jnp.float32,
        small_level_dof=0, use_pallas=False, coarse_dof_limit=200,
        free_np=free_host,
    )
    assert len(mg.levels) >= 3
    mesh = make_device_mesh(8, "z")
    solver = build_zsharded_solver(op_hi, mg, mesh, "z", interpret=True)
    return scene, op_hi, mg, solver


def test_level1_mg_state_is_sharded(setup_l1):
    """Per-device multigrid state scales ~1/n_dev: the level-1 mask/
    diagonal buffers are z-slab sharded (NOT replicated), each device
    holding 1/8 of the planes (round-4 directive #8 'done' assertion)."""
    scene, op_hi, mg, solver = setup_l1
    assert solver.shard_l1 and solver.l1 is not None
    n = 8
    for key in ("free", "inv_diag"):
        arr = solver.l1[key]
        shards = arr.addressable_shards
        assert len(shards) == n
        # each shard holds 1/n of the z planes — not the full array
        assert shards[0].data.shape[-1] * n == arr.shape[-1]
        assert shards[0].data.shape[-1] < arr.shape[-1]
    # the replicated remainder starts at level 2: <= 1/64-size defect
    lvl2 = solver.mg_rest.levels[0]
    Z1 = mg.levels[1].free.shape[-1]
    assert lvl2.free.shape[-1] <= (Z1 + 1) // 2 + 1


@pytest.mark.slow
def test_level1_sharded_solve_matches_single_device(setup_l1):
    """Recurrence parity of the level-1-sharded V-cycle against the
    single-device staged solver (same pin as the fine-only-sharded
    test, now over the deeper sharded hierarchy)."""
    scene, op_hi, mg, solver = setup_l1
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 1.0
    loads[tip, 1] = 1000.0 / tip.sum()
    sol_sh = solver.solve(loads, tol=1e-7, max_iters=100, refine_true=False)
    sol_1 = solve_operator_fpcg_t_staged(
        op_hi, jnp.asarray(loads), None, mg,
        tol=1e-7, max_iters=100, use_pallas=False, refine_true=False,
    )
    assert bool(sol_sh.stats.converged)
    assert int(sol_sh.stats.iterations) == int(sol_1.stats.iterations)
    uw = np.asarray(sol_1.displacements)
    ug = np.asarray(sol_sh.displacements)
    scale = np.abs(uw).max()
    # the sharded LEVEL-1 apply (gated tables + slab correction) and the
    # single-device level-1 XLA pad-add are different f32 summation
    # structures, so the V-cycle is a slightly different (equally valid)
    # preconditioner — flexible CG converges in the same iteration count
    # to the same tolerance with iterates agreeing at the f32-noise ×
    # conditioning level, not bitwise (measured 3.8e-7 relative)
    assert np.abs(uw - ug).max() <= 2e-6 * scale
