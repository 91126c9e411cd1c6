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


def test_solve_auto_routes_twolevel_at_scale(monkeypatch):
    """solve()'s unstructured-CG fallthrough uses the two-level
    preconditioner above the size threshold (monkeypatched down; the
    scene is distorted so it cannot take the structured/extruded fast
    paths), and matches the dense solve."""
    # round-5: the AMG/BCSR route is the unstructured default; this
    # test pins the ddq/two-level FALLBACK route explicitly
    monkeypatch.setenv("FEA_TPU_NO_AMG", "1")
    import importlib

    S = importlib.import_module("fea_tpu.solve")

    scene = cantilever(4, 4, 40)  # 3,075 DOF: above the dense cutoff
    nodes = np.asarray(scene.nodes).copy()
    rng = np.random.default_rng(3)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
    nodes = nodes + 0.005 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    scene = ft.make_scene(nodes, np.asarray(scene.elements),
                          np.asarray(scene.fixed), np.asarray(scene.loads),
                          scene.material, dtype=jnp.float64)
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)

    import fea_tpu.ops.twolevel as TL

    calls = {}
    real_build = TL.build_two_level_cheb

    def spy(op, nodes, **kw):
        tl = real_build(op, nodes, **kw)
        calls["n_aggs"] = tl.n_aggs
        return tl

    monkeypatch.setattr(TL, "build_two_level_cheb", spy)
    sol = ft.solve(scene, tol=1e-10)  # auto: routes to smoothed two-level
    assert calls["n_aggs"] > 1
    assert bool(sol.stats.converged)
    op = ft.build_operator(scene, dtype=jnp.float64)
    sol_d = ft.solve_operator(
        op, scene.loads, jnp.zeros_like(scene.loads), method="dense"
    )
    np.testing.assert_allclose(
        np.asarray(sol.displacements), np.asarray(sol_d.displacements),
        rtol=1e-6, atol=1e-12,
    )


# -- two-level (coarse space + block-Jacobi) ---------------------------------


def test_twolevel_coarse_matrix_is_galerkin():
    """Chunked device assembly of A_c == P^T A_dense P with the masked
    dense operator and the rigid-body-mode P (exactness, incl. chunking:
    chunk=3 forces several partial accumulations; ridge=0 for the pin)."""
    from fea_tpu.ops.twolevel import (
        aggregate_nodes,
        coarse_matrix,
        rigid_body_geometry,
    )

    scene = cantilever(2, 2, 6)
    op = ft.build_operator(scene, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    agg, n_aggs = aggregate_nodes(nodes, 8)
    xrel = rigid_body_geometry(nodes, agg, n_aggs)
    K = np.asarray(op.dense())
    F = (np.asarray(scene.fixed) == 0).astype(np.float64).reshape(-1)
    A = np.diag(F) @ K @ np.diag(F) + np.diag(1.0 - F)
    ndof = K.shape[0]
    P = np.zeros((ndof, 6 * n_aggs))
    for n in range(scene.n_nodes):
        v = xrel[n]
        S = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        Pn = np.concatenate([np.eye(3), S], axis=1)  # (3, 6)
        P[3 * n:3 * n + 3, 6 * agg[n]:6 * agg[n] + 6] = Pn
    want = P.T @ A @ P
    got = coarse_matrix(op, agg, n_aggs, xrel, chunk=3, ridge=0.0)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8 * abs(want).max())


def test_twolevel_cuts_iterations_and_matches_dense():
    """The coarse correction must cut CG iterations well below
    block-Jacobi alone on a slender beam (global error transport), and
    the solution still matches the dense solve."""
    from fea_tpu.ops.twolevel import build_two_level
    from fea_tpu.solvers.cg import pcg

    scene = cantilever(2, 2, 40)
    op = ft.build_operator(scene, dtype=jnp.float64)
    zero = jnp.zeros_like(scene.loads)
    sol_b = ft.solve_operator(op, scene.loads, zero, method="cg",
                              tol=1e-10, max_iters=20_000, precondition="block")
    tl = build_two_level(op, scene.nodes, target_aggregates=16)
    b = op.rhs(scene.loads, zero)
    u, stats = pcg(op.apply, b, precond=tl, tol=1e-10, max_iters=20_000)
    assert bool(stats.converged)
    it_b, it_t = int(sol_b.stats.iterations), int(stats.iterations)
    assert it_t < 0.7 * it_b, (it_t, it_b)
    sol_d = ft.solve_operator(op, scene.loads, zero, method="dense")
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(sol_d.displacements), rtol=1e-6, atol=1e-12,
    )


def test_preconditioners_are_vmap_compatible():
    """Batch/sweep parallelism (SURVEY §2 'batch/sweep parallel') must
    keep working with the round-2 preconditioners: vmap over load cases
    with precondition='block' and with a closed-over TwoLevelPrecond."""
    from fea_tpu.ops.twolevel import build_two_level

    scene = cantilever(2, 2, 10)
    op = ft.build_operator(scene, dtype=jnp.float64)
    zero = jnp.zeros_like(scene.loads)
    batch = jnp.stack([scene.loads, 2.0 * scene.loads, -0.5 * scene.loads])
    ref = np.asarray(ft.solve_operator(
        op, scene.loads, zero, method="cg", tol=1e-10, max_iters=20_000,
        precondition="block",
    ).displacements)

    U = jax.vmap(lambda l: ft.solve_operator(
        op, l, zero, method="cg", tol=1e-10, max_iters=20_000,
        precondition="block",
    ).displacements)(batch)
    np.testing.assert_allclose(np.asarray(U[1]), 2 * ref, rtol=1e-7,
                               atol=1e-9 * np.abs(ref).max())

    tl = build_two_level(op, scene.nodes, target_aggregates=8)
    U2 = jax.vmap(lambda l: ft.solve_operator(
        op, l, zero, method="cg", tol=1e-10, max_iters=20_000, precond=tl,
    ).displacements)(batch)
    np.testing.assert_allclose(np.asarray(U2[2]), -0.5 * ref, rtol=1e-7,
                               atol=1e-9 * np.abs(ref).max())


def test_block_diag_chunked_matches_unchunked():
    """The TPU HBM-bounded chunked accumulation (operator.py
    block_diag_raw, matfree kind) equals the one-shot path."""
    scene = cantilever(2, 2, 7)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    want = np.asarray(op.block_diag_raw())
    got = np.asarray(op.block_diag_raw(chunk=3))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9 * abs(want).max())


def test_two_level_cheb_cuts_iterations_vs_additive():
    """The Chebyshev-smoothed multiplicative two-level preconditioner
    (fpcg path) converges in ~2x fewer iterations than the additive
    TwoLevelPrecond and agrees with it (CPU-measured 43 -> 18 at
    4x4x30 distorted; pinned loosely here on a smaller case)."""
    from fea_tpu.ops.twolevel import build_two_level, build_two_level_cheb
    from fea_tpu.solvers.cg import fpcg, pcg

    scene = cantilever(3, 3, 18)
    nodes = np.asarray(scene.nodes).copy()
    rng = np.random.default_rng(5)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < nodes[:, 2].max())
    nodes = nodes + 0.006 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    scene = ft.make_scene(nodes, np.asarray(scene.elements),
                          np.asarray(scene.fixed), np.asarray(scene.loads),
                          scene.material, dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64)
    b = op.rhs(scene.loads, jnp.zeros_like(scene.loads))
    tl_add = build_two_level(op, scene.nodes, target_aggregates=24)
    u1, s1 = pcg(op.apply, b, precond=tl_add, tol=1e-9, max_iters=2000)
    tl_cheb = build_two_level_cheb(op, scene.nodes, target_aggregates=24)
    u2, s2 = fpcg(op.apply, b, precond=tl_cheb, tol=1e-9, max_iters=2000)
    assert bool(s1.converged) and bool(s2.converged)
    assert int(s2.iterations) <= 0.7 * int(s1.iterations)
    scale = float(jnp.max(jnp.abs(u1)))
    assert float(jnp.max(jnp.abs(u1 - u2))) <= 1e-7 * scale


def test_jacobi_gershgorin_bound_is_certified():
    """The chunked Gershgorin bound dominates the true lambda_max of
    D^-1 A (computed densely), and the diag matches the dense diagonal."""
    from fea_tpu.ops.twolevel import jacobi_gershgorin

    scene = cantilever(2, 2, 6)
    op = ft.build_operator(scene, dtype=jnp.float64)
    inv_diag, lam = jacobi_gershgorin(op, chunk=7)  # force multiple chunks
    K = np.asarray(op.dense())  # RAW stiffness; mask it like the operator
    F = (np.asarray(scene.fixed) == 0).astype(np.float64).reshape(-1)
    A = np.diag(F) @ K @ np.diag(F) + np.diag(1.0 - F)
    d = np.diag(A)
    np.testing.assert_allclose(
        inv_diag.reshape(-1), 1.0 / d, rtol=1e-12
    )
    lam_true = np.max(np.abs(np.linalg.eigvals(A / d[:, None])))
    assert lam >= lam_true * (1 - 1e-12)
    # ... and is not uselessly loose (triangle inequality costs < 3x here)
    assert lam <= 3.0 * lam_true


def test_matfree_apply_chunked_matches_unchunked():
    """The lax.map element-chunked matfree apply (the > ~50k-element TPU
    f64 HBM decomposition) is exact vs the one-shot apply, including a
    non-divisible tail."""
    import dataclasses as dc

    scene = cantilever(2, 2, 7)  # 28 elements
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)))
    want = np.asarray(op.apply_raw(u))
    op_ch = dc.replace(op, matfree_chunk=5)  # 5 chunks + tail of 3
    got = np.asarray(jax.jit(op_ch.apply_raw)(u))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9 * np.abs(want).max())


def test_fpcg_dd64_staged_matches_while_loop():
    """The host-loop staged dd64 FCG (the TPU-robust production route:
    short dispatches, operator as a pytree argument) follows the same
    recurrence as the while_loop fpcg_dd64: identical iteration count,
    solutions agreeing to roundoff (the two are DIFFERENT XLA fusions of
    the same arithmetic, so last-ulp FMA-contraction differences are
    expected — not bitwise)."""
    from fea_tpu.ops.twolevel import build_two_level_cheb
    from fea_tpu.solvers.cg import fpcg_dd64, fpcg_dd64_staged

    scene = cantilever(2, 2, 12)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    b = op.rhs(scene.loads, jnp.zeros_like(scene.loads))
    tl = build_two_level_cheb(op, scene.nodes, target_aggregates=12)
    u1, s1 = fpcg_dd64(op.apply, b, precond32=tl, tol=1e-9, max_iters=500)
    u2, s2 = fpcg_dd64_staged(op, b, precond=tl, tol=1e-9, max_iters=500)
    assert int(s1.iterations) == int(s2.iterations)
    scale = float(jnp.max(jnp.abs(u1)))
    assert float(jnp.max(jnp.abs(u1 - u2))) <= 1e-12 * scale
    assert bool(s2.converged)


def test_merged_gershgorin_matches_standalone():
    """coarse_matrix(with_gershgorin=True)'s device-accumulated smoother
    data == the standalone host jacobi_gershgorin pass."""
    from fea_tpu.ops.twolevel import (
        aggregate_nodes,
        coarse_matrix,
        jacobi_gershgorin,
        rigid_body_geometry,
    )

    scene = cantilever(2, 2, 9)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    agg, n_aggs = aggregate_nodes(np.asarray(scene.nodes), 8)
    xrel = rigid_body_geometry(np.asarray(scene.nodes), agg, n_aggs)
    Ac0 = coarse_matrix(op, agg, n_aggs, xrel, chunk=5)
    Ac1, inv_diag, lam = coarse_matrix(
        op, agg, n_aggs, xrel, chunk=5, with_gershgorin=True
    )
    np.testing.assert_allclose(Ac1, Ac0, rtol=0, atol=0)  # same accumulation
    want_inv, want_lam = jacobi_gershgorin(op, chunk=5)
    np.testing.assert_allclose(inv_diag, want_inv, rtol=1e-13)
    assert lam == pytest.approx(want_lam, rel=1e-13)


def test_cheb_route_honors_prescribed_displacements(monkeypatch):
    """The auto-routed smoothed two-level solve with nonzero prescribed
    displacements: fixed DOFs hold their prescribed values exactly and
    the solution matches the dense solve."""
    # round-5: the AMG/BCSR route is the unstructured default; this
    # test pins the ddq/two-level FALLBACK route explicitly
    monkeypatch.setenv("FEA_TPU_NO_AMG", "1")
    import importlib

    S = importlib.import_module("fea_tpu.solve")
    scene0 = cantilever(3, 3, 12)
    nodes = np.asarray(scene0.nodes).copy()
    rng = np.random.default_rng(4)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
    nodes = nodes + 0.004 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    presc = np.zeros_like(nodes)
    root = nodes[:, 2] == 0.0
    presc[root, 0] = 1e-4  # imposed root shift
    scene = ft.make_scene(nodes, np.asarray(scene0.elements),
                          np.asarray(scene0.fixed), np.asarray(scene0.loads),
                          scene0.material, prescribed=presc,
                          dtype=jnp.float64)
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)
    sol = ft.solve(scene, tol=1e-10)
    assert bool(sol.stats.converged)
    u = np.asarray(sol.displacements)
    fixed = np.asarray(scene.fixed) > 0
    np.testing.assert_array_equal(u[fixed], presc[fixed])
    op = ft.build_operator(scene, dtype=jnp.float64)
    sol_d = ft.solve_operator(
        op, scene.loads, jnp.asarray(presc), method="dense"
    )
    np.testing.assert_allclose(
        u, np.asarray(sol_d.displacements), rtol=1e-6, atol=1e-13,
    )


def test_f32_coarse_build_matches_f64_quality():
    """The f32-dtype coarse build (the TPU build-time cut: every consumer
    in TwoLevelChebPrecond is f32 anyway) produces (a) a coarse matrix
    within f32 roundoff of the f64 one, (b) a Gershgorin bound that still
    DOMINATES the f64-certified one (inflation covers the accumulation
    noise — an under-estimate diverges Chebyshev), and (c) identical-class
    FCG convergence: same-or-±2 iterations, solutions agreeing at tol."""
    from fea_tpu.ops.twolevel import (
        aggregate_nodes,
        build_two_level_cheb,
        coarse_matrix,
        rigid_body_geometry,
    )
    from fea_tpu.solvers.cg import fpcg

    scene = cantilever(3, 3, 15)
    nodes = np.asarray(scene.nodes).copy()
    rng = np.random.default_rng(11)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < nodes[:, 2].max())
    nodes = nodes + 0.005 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    scene = ft.make_scene(nodes, np.asarray(scene.elements),
                          np.asarray(scene.fixed), np.asarray(scene.loads),
                          scene.material, dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    agg, n_aggs = aggregate_nodes(nodes, 24)
    xrel = rigid_body_geometry(nodes, agg, n_aggs)
    Ac64, _, lam64 = coarse_matrix(op, agg, n_aggs, xrel, chunk=64,
                                   with_gershgorin=True)
    Ac32, _, lam32 = coarse_matrix(op, agg, n_aggs, xrel, chunk=64,
                                   with_gershgorin=True, dtype=jnp.float32)
    scale = np.abs(Ac64).max()
    assert np.abs(Ac32 - Ac64).max() <= 1e-4 * scale  # f32 class + ridge
    assert lam32 >= lam64  # still certified (inflation > accumulation err)
    assert lam32 <= 1.01 * lam64  # ... and not uselessly loose

    b = op.rhs(scene.loads, jnp.zeros_like(scene.loads))
    tl64 = build_two_level_cheb(op, scene.nodes, target_aggregates=24,
                                build_dtype=jnp.float64)
    tl32 = build_two_level_cheb(op, scene.nodes, target_aggregates=24)
    u64, s64 = fpcg(op.apply, b, precond=tl64, tol=1e-9, max_iters=2000)
    u32, s32 = fpcg(op.apply, b, precond=tl32, tol=1e-9, max_iters=2000)
    assert bool(s64.converged) and bool(s32.converged)
    assert abs(int(s32.iterations) - int(s64.iterations)) <= 2
    uscale = float(jnp.max(jnp.abs(u64)))
    assert float(jnp.max(jnp.abs(u32 - u64))) <= 1e-7 * uscale
