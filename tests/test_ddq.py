"""Pair-space quadrature apply (ops/ddq.py) — the unstructured route's
in-loop operator.

Accuracy contract: the double-f32 pair apply carries the same ~2^-48
accuracy class as an exact-f64 apply (it IS the f64 apply, re-expressed
as error-free transformations), so on CPU — where f64 is true IEEE —
the pair apply must agree with StiffnessOperator.apply to ~1e-13
relative on distorted meshes, eagerly AND under jit (the XLA:CPU
FMA-contraction regime that broke the naive Dekker axpy — see
docs/PERF.md "Pair-arithmetic integrity").
"""
import dataclasses
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops import df64
from fea_tpu.ops.ddq import build_pair_operator

MAT = ft.Material(E=1e7, nu=0.3)


def distorted_scene(nx=3, ny=3, nz=12, length=1.2, seed=0):
    nodes, elements = ft.mesh.box_hex_mesh(nx, ny, nz, 0.1, 0.1, length)
    rng = np.random.default_rng(seed)
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < length)
    nodes = nodes + 0.006 * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, dofs_per_node=3)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == length
    loads[tip, 1] = 1.0 / tip.sum()
    return ft.make_scene(nodes, elements, fixed, loads, MAT, dtype=jnp.float64)


@pytest.fixture(scope="module")
def setup():
    scene = distorted_scene()
    op = ft.build_operator(scene, dtype=jnp.float64)
    pop = build_pair_operator(op, scene.nodes)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(np.asarray(scene.nodes).shape) * 1e-3)
    return scene, op, pop, x


def _rel(got64, want64):
    return float(jnp.linalg.norm(got64 - want64) / jnp.linalg.norm(want64))


def test_pair_apply_matches_f64_oracle(setup):
    scene, op, pop, x = setup
    want = op.apply(x)
    got = df64.combine(pop.apply(df64.split(x)))
    assert _rel(got, want) < 1e-13
    want_raw = op.apply_raw(x)
    got_raw = df64.combine(pop.apply_raw(df64.split(x)))
    assert _rel(got_raw, want_raw) < 1e-13


def test_pair_apply_under_jit(setup):
    """Same accuracy inside jit — the EFTs only ever feed EXACT products
    into additions, so LLVM-level FMA contraction cannot break them."""
    scene, op, pop, x = setup
    f = jax.jit(lambda p, v: p.apply(v))
    got = df64.combine(f(pop, df64.split(x)))
    assert _rel(got, op.apply(x)) < 1e-13


def test_chunked_matches_unchunked(setup):
    """lax.map element chunking is per-element identical math; the
    combined values agree to the 2^-48 tail (the plain-f32 cross terms
    may contract/fuse differently in the two compilation contexts and
    _renorm folds that tail into hi — by design, that tail is noise)."""
    scene, op, pop, x = setup
    xp = df64.split(x)
    h0, l0 = pop.apply(xp)
    h1, l1 = dataclasses.replace(pop, chunk=37).apply(xp)
    v0 = np.asarray(h0, np.float64) + np.asarray(l0, np.float64)
    v1 = np.asarray(h1, np.float64) + np.asarray(l1, np.float64)
    assert np.linalg.norm(v0 - v1) < 1e-13 * np.linalg.norm(v0)


def test_masked_apply_is_identity_on_fixed_dofs(setup):
    """Constrained rows are the identity, to the pair representation's
    ~2^-48 (split(x) itself only carries 48 mantissa bits)."""
    scene, op, pop, x = setup
    xh, xl = pop.apply(df64.split(x))
    fixed = np.asarray(scene.fixed) == 1
    got = np.asarray(xh, np.float64)[fixed] + np.asarray(xl, np.float64)[fixed]
    np.testing.assert_allclose(got, np.asarray(x)[fixed], rtol=1e-14)


def test_uniform_kind_requires_nodes():
    """The congruent-element ('uniform') operator stores no per-element
    gradients; build_pair_operator must say so, and must work when
    handed the nodes."""
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 4, 0.1, 0.1, 0.4)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, dofs_per_node=3)
    scene = ft.make_scene(nodes, elements, fixed, np.zeros_like(nodes), MAT,
                          dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=True)
    assert op.kind == "uniform"
    with pytest.raises(ValueError, match="material"):
        build_pair_operator(op, scene.nodes)
    with pytest.raises(ValueError, match="geometry"):
        build_pair_operator(op, material=MAT)
    pop = build_pair_operator(op, scene.nodes, material=MAT)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(nodes.shape) * 1e-3)
    assert _rel(df64.combine(pop.apply(df64.split(x))), op.apply(x)) < 1e-13


def test_route_solves_with_certified_stats(monkeypatch):
    """solve()'s unstructured auto route runs the pair-space apply and
    reports the CERTIFIED (exact-apply) residual: the stats must equal
    an independently recomputed true residual bit-for-bit, and the
    solution must match the dense oracle."""
    # round-5: the AMG/BCSR route is the unstructured default; this
    # test pins the ddq/two-level FALLBACK route explicitly
    monkeypatch.setenv("FEA_TPU_NO_AMG", "1")
    S = importlib.import_module("fea_tpu.solve")
    scene = distorted_scene(4, 4, 40, length=2.0, seed=3)
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)

    import fea_tpu.ops.ddq as DDQ

    built = {}
    real = DDQ.build_pair_operator

    def spy(op, nodes=None, **kw):
        pop = real(op, nodes, **kw)
        built["pop"] = pop
        return pop

    # solve.py imports the symbol from the module at call time, so the
    # spy observes the route's build
    monkeypatch.setattr(DDQ, "build_pair_operator", spy)
    sol = ft.solve(scene, tol=1e-10)
    assert "pop" in built, "route did not build the pair operator"
    assert bool(sol.stats.converged)

    op = ft.build_operator(scene, dtype=jnp.float64)
    b = op.rhs(scene.loads, jnp.zeros_like(scene.loads))
    r = b - op.apply(sol.displacements)
    true_rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert true_rel <= 1e-10
    np.testing.assert_allclose(
        float(sol.stats.relative_residual), true_rel, rtol=1e-12
    )
    sol_d = ft.solve_operator(
        op, scene.loads, jnp.zeros_like(scene.loads), method="dense"
    )
    assert _rel(sol.displacements, sol_d.displacements) < 1e-8
