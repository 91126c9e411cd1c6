"""Staged (host-outer-loop) flagship solver == fused one-jit solver.

solve_operator_fpcg_t_staged splits the FCG loop into compact device
programs to cut cold-cache compile from ~25 min to ~3 min on the TPU
toolchain (VERDICT.md round-2 #1); these tests pin that the split
changes NOTHING about the mathematics: same iterate path, same
convergence, same displacements/reactions as the fused _fpcg_t_dd_jit
program, for homogeneous and prescribed-displacement BCs.

Suite-cost note: the always-on pins run both pipelines on the XLA dd
twin (``use_pallas=False``) — the staged-vs-fused claim is about LOOP
ORCHESTRATION (same per-stage arithmetic, host loop vs while_loop), so
the apply implementation is irrelevant to it, and the interpret-mode
Pallas compiles it avoids cost ~160 s of one-core suite time (the
fused interpret compile alone measured ~100 s).  The same pin over the
interpret-mode Pallas kernels is kept as the `-m slow` test at the
bottom; the kernels themselves are pinned by tests/test_pallas.py and
on-chip by tools/tpu_check.py.

Ordering note (slow test): ALL staged solves run before ANY fused
solve.  In interpret mode, executing the fused while-loop program
poisons subsequently-traced programs with an effects token that the
pjit fast path then miscounts ("supplied 5 buffers but compiled program
expected 6") — a jax-0.9 interaction, reproduced and bisected; tracing
the staged programs first sidesteps it.  The production TPU bench runs
only one pipeline per process, so it is unaffected.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.ops.transposed import build_multigrid_t
from fea_tpu.solve import solve_operator_fpcg_t, solve_operator_fpcg_t_staged

MAT = ft.Material(E=1e7, nu=0.3)


def _scene_and_mg(*, use_pallas, interpret):
    scene, dims = structured_scene(2, 2, 6, 0.1, 0.1, 0.5, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 10.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    # degree=2 and 2 levels keep solve cost down; the staged-vs-fused pin
    # is per-ITERATION exact, so fewer iterations lose nothing
    mg = build_multigrid_t(
        op.astype(jnp.float32), dtype=jnp.float32, use_pallas=use_pallas,
        interpret=interpret, free_np=free_np, max_levels=2, degree=2,
    )
    return scene, op, mg


@pytest.fixture(scope="module")
def solutions():
    scene, op, mg = _scene_and_mg(use_pallas=False, interpret=False)
    nodes = np.asarray(scene.nodes)
    presc = np.zeros_like(nodes)
    presc[nodes[:, 2] == 0.0, 1] = 1e-5
    presc_j = jnp.asarray(presc)
    kw = dict(use_pallas=False)
    staged = {
        "homog": solve_operator_fpcg_t_staged(op, scene.loads, None, mg, tol=1e-6, **kw),
        "presc": solve_operator_fpcg_t_staged(op, scene.loads, presc_j, mg, tol=1e-6, **kw),
        "nonconv": solve_operator_fpcg_t_staged(
            op, scene.loads, None, mg, tol=1e-30, max_iters=2, **kw
        ),
        "zero": solve_operator_fpcg_t_staged(
            op, jnp.zeros_like(scene.loads), None, mg, tol=1e-9, **kw
        ),
    }
    fused = {
        "homog": solve_operator_fpcg_t(op, scene.loads, None, mg, tol=1e-6, **kw),
        # the prescribed-BC twin uses a tighter-tol fused reference
        "presc": solve_operator_fpcg_t(
            op, scene.loads, presc_j, mg, tol=1e-10, use_pallas=False
        ),
    }
    return scene, presc, staged, fused


def _assert_staged_matches_fused(want, got):
    assert bool(got.stats.converged)
    assert int(got.stats.iterations) == int(want.stats.iterations)
    uw = np.asarray(want.displacements)
    ug = np.asarray(got.displacements)
    scale = np.max(np.abs(uw))
    # identical per-stage arithmetic, but the staged and fused programs
    # are different XLA fusions: the compiler may FMA-contract the
    # axpy's 2^-48-tail cross terms differently per fusion (the exact-
    # product EFT core is contraction-proof — see ops/df64.py), and
    # kappa amplifies that tail noise into the iterate.  Pin at the
    # level the shared algorithm guarantees, not bitwise.
    assert np.max(np.abs(uw - ug)) <= 1e-9 * scale
    rw = np.asarray(want.reactions)
    rg = np.asarray(got.reactions)
    assert np.max(np.abs(rw - rg)) <= 1e-8 * max(np.max(np.abs(rw)), 1e-300)


def test_staged_matches_fused_homogeneous(solutions):
    _, _, staged, fused = solutions
    _assert_staged_matches_fused(fused["homog"], staged["homog"])


def test_staged_matches_fused_prescribed(solutions):
    scene, presc, staged, fused = solutions
    want, got = fused["presc"], staged["presc"]
    assert bool(got.stats.converged)
    uw = np.asarray(want.displacements)
    ug = np.asarray(got.displacements)
    scale = np.max(np.abs(uw))
    # reference is the tol-1e-10 fused solve vs the staged pipeline at
    # tol 1e-6: agreement to the staged tolerance
    assert np.max(np.abs(uw - ug)) <= 2e-6 * scale
    # prescribed values honored exactly
    fixed = np.asarray(scene.fixed) > 0
    assert np.array_equal(ug[fixed], presc[fixed])


def test_staged_nonconvergence_reported(solutions):
    _, _, staged, _ = solutions
    got = staged["nonconv"]
    assert not bool(got.stats.converged)
    # iterations = pass 1 (stops at the dd floor, <= max_iters) plus one
    # refinement correction that hits max_iters without reaching the
    # impossible tol and aborts the loop — bounded, honestly reported
    assert 2 <= int(got.stats.iterations) <= 4


def test_staged_zero_rhs(solutions):
    _, _, staged, _ = solutions
    got = staged["zero"]
    assert bool(got.stats.converged)
    assert int(got.stats.iterations) == 0
    assert np.max(np.abs(np.asarray(got.displacements))) == 0.0


@pytest.mark.slow
def test_staged_matches_fused_interpret_pallas():
    """The same per-iteration staged==fused pin over the interpret-mode
    Pallas kernel pipeline (the exact program pair the TPU bench runs).
    ~160 s of one-core XLA compile — slow-marked; the always-on twin
    above pins the identical claim on the XLA dd twin."""
    scene, op, mg = _scene_and_mg(use_pallas=True, interpret=True)
    kw = dict(use_pallas=True, interpret=True)
    # staged first (see module docstring), fused after
    staged = solve_operator_fpcg_t_staged(op, scene.loads, None, mg, tol=1e-6, **kw)
    fused = solve_operator_fpcg_t(op, scene.loads, None, mg, tol=1e-6, **kw)
    _assert_staged_matches_fused(fused, staged)


def test_apply_dot_xla_matches_f64_oracle(rng):
    """The XLA emulated-f64 outer apply (the > dd-kernel-VMEM-fit
    fallback, solve.py::_st_apply_dot_xla) agrees with a direct f64
    masked-apply + dot oracle to the pair representation's accuracy.

    (Was pinned against the interpret-mode dd Pallas kernel — same
    assertion strength, but that reference cost a 59 s interpret
    compile; the dd kernel itself is pinned by tests/test_pallas.py and
    on-chip by tools/tpu_check.py.)"""
    from fea_tpu.ops import df64
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import stencil_apply_grid_T, t_of_grid
    from fea_tpu.solve import _st_apply_dot_xla

    scene, dims = structured_scene(3, 2, 6, 0.3, 0.2, 0.6, MAT, dtype=jnp.float64)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    Z, Y, X = op.grid_shape
    x = rng.normal(size=(Z, Y, X, 3))
    xT = t_of_grid(jnp.asarray(x))
    pair = (
        xT.astype(jnp.float32),
        (xT - xT.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32),
    )
    freeT32 = t_of_grid(op.free.astype(jnp.float32).reshape(Z, Y, X, 3))
    ke64 = jnp.asarray(np.asarray(op.ke, np.float64))
    got_pair, got_dot = _st_apply_dot_xla(freeT32, ke64, pair)
    # oracle: combined-f64 masked apply and dot, straight jnp
    F = freeT32.astype(jnp.float64)
    x64 = df64.combine(pair, jnp.float64)
    want = np.asarray(F * stencil_apply_grid_T(ke64, F * x64) + (1.0 - F) * x64)
    want_dot = float(jnp.sum(x64 * jnp.asarray(want)))
    got = np.asarray(df64.combine(got_pair, jnp.float64))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-9
    assert float(got_dot) == pytest.approx(want_dot, rel=1e-9)
