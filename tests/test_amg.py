"""AMG/BCSR arbitrary-topology route (round-5, VERDICT r4 #3): node-major
block-CSR apply + multilevel smoothed-aggregation preconditioner
(ops/amg.py) with host exact-IEEE certification
(solve/unstructured.py::_solve_unstructured_amg)."""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops import amg

MAT = ft.Material(E=1e7, nu=0.3)


def l_scene(nx, nz, *, seed=7, distort=0.2, presc=False):
    lz = 0.1 * nz / nx
    nodes, elements = ft.mesh.l_hex_mesh(nx, nx, nz, 0.1, 0.1, lz)
    nodes = np.asarray(nodes, np.float64)
    rng = np.random.default_rng(seed)
    h = 0.1 / nx
    interior = (nodes[:, 2] > 1e-12) & (nodes[:, 2] < lz - 1e-12)
    nodes = nodes + distort * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), 3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], lz)
    loads[tip, 1] = 1.0 / tip.sum()
    kwargs = {}
    if presc:
        p = np.zeros_like(nodes)
        p[np.isclose(nodes[:, 2], 0.0), 0] = 1e-4
        kwargs["prescribed"] = p
    return ft.make_scene(nodes, np.asarray(elements), fixed, loads, MAT,
                         dtype=jnp.float64, **kwargs)


def test_bcsr_apply_matches_operator_oracle():
    """Assembled BCSR == the element-loop operator, exactly up to f64
    summation order (same K, different assembly path)."""
    scene = l_scene(4, 10)
    host = amg.assemble_bcsr(
        np.asarray(scene.nodes), np.asarray(scene.elements), MAT,
        np.asarray(scene.fixed),
    )
    op = ft.build_operator(scene, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    u = rng.standard_normal(np.asarray(scene.nodes).shape)
    a_host = amg.bcsr_apply_np(host, u)
    a_op = np.asarray(op.apply(jnp.asarray(u)))
    assert np.abs(a_host - a_op).max() <= 1e-12 * np.abs(a_op).max()
    # device f32 op matches at f32 accuracy
    dev = amg.BCSROperator.from_row_major(host.nbr, host.W, host.free)
    a_dev = np.asarray(dev.apply(jnp.asarray(u, jnp.float32)))
    assert np.abs(a_dev - a_host).max() <= 1e-5 * np.abs(a_host).max()


def test_bcsr_pair_apply_accuracy():
    """The EFT pair apply reproduces the exact host apply to ~2^-48
    class accuracy (far beyond f32)."""
    from fea_tpu.ops import df64

    scene = l_scene(4, 10)
    host = amg.assemble_bcsr(
        np.asarray(scene.nodes), np.asarray(scene.elements), MAT,
        np.asarray(scene.fixed),
    )
    pair = amg.split_bcsr_pair(host)
    rng = np.random.default_rng(3)
    u = rng.standard_normal(np.asarray(scene.nodes).shape)
    ph, pl = pair.apply(df64.split(jnp.asarray(u)))
    got = np.asarray(ph, np.float64) + np.asarray(pl, np.float64)
    want = amg.bcsr_apply_np(host, u)
    assert np.abs(got - want).max() <= 1e-12 * np.abs(want).max()


def test_amg_iterations_flat_in_n():
    """The multilevel hierarchy keeps FCG iteration counts ~flat with
    mesh size on the L-domain (the two-level scheme's count grew) —
    VERDICT r4 #3's core ask."""
    from fea_tpu.solvers.cg import fpcg_dd64_staged

    iters = []
    for nx, nz in [(8, 24), (12, 36)]:
        scene = l_scene(nx, nz)
        nodes = np.asarray(scene.nodes)
        host = amg.assemble_bcsr(
            nodes, np.asarray(scene.elements), MAT, np.asarray(scene.fixed)
        )
        mg = amg.build_amg(nodes, host)
        assert len(mg.levels) >= 2  # actually multilevel at these sizes
        pair = amg.split_bcsr_pair(host)
        b = jnp.asarray(host.free * np.asarray(scene.loads, np.float64))
        u, stats = fpcg_dd64_staged(
            pair, b, jnp.zeros_like(b), precond=mg, tol=1e-8,
            max_iters=200, pair_apply=True,
        )
        assert bool(stats.converged)
        # host-certified residual really meets tol
        r = host.free * (np.asarray(scene.loads) - amg.bcsr_apply_np(
            host, np.asarray(u), masked=False))
        rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
        assert rel <= 2e-8
        iters.append(int(stats.iterations))
    assert iters[1] <= iters[0] + 8, iters  # flat-ish, not growing


def test_solve_routes_amg_and_matches_dense(monkeypatch):
    """ft.solve auto-routes large arbitrary-topology scenes through the
    AMG/BCSR route; result matches the dense oracle and the reported
    residual is host-certified."""
    S = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)
    # round-5: box-subset meshes default to the subgrid embedding; this
    # test pins the no-structure AMG route explicitly
    monkeypatch.setenv("FEA_TPU_NO_EMBED", "1")
    scene = l_scene(6, 20, distort=0.06)
    assert scene.n_dof >= 2000  # above the dense auto cutoff
    built = {}
    real = S.build_amg_setup

    def spy(sc, **kw):
        out = real(sc, **kw)
        built["setup"] = out
        return out

    monkeypatch.setattr(S, "build_amg_setup", spy)
    sol = ft.solve(scene, tol=1e-10)
    assert "setup" in built, "solve() did not take the AMG route"
    assert bool(sol.stats.converged)
    assert isinstance(sol.reactions, np.ndarray)  # host-certified tier
    op = ft.build_operator(scene, dtype=jnp.float64)
    sol_d = ft.solve_operator(
        op, scene.loads, jnp.zeros_like(scene.loads), method="dense"
    )
    scale = float(np.abs(np.asarray(sol_d.displacements)).max())
    assert np.abs(
        np.asarray(sol.displacements) - np.asarray(sol_d.displacements)
    ).max() <= 1e-6 * scale
    # independently recomputed host residual agrees with the stat
    host = built["setup"][0]
    r = host.free * (
        np.asarray(scene.loads, np.float64)
        - amg.bcsr_apply_np(host, np.asarray(sol.displacements), masked=False)
    )
    b = host.free * np.asarray(scene.loads, np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    np.testing.assert_allclose(
        float(sol.stats.relative_residual), rel, rtol=1e-10
    )


def test_amg_route_prescribed_exact(monkeypatch):
    """Prescribed displacements: fixed rows exact, solution matches the
    dense oracle (regression for the double-K·xp residual bug caught at
    build time)."""
    S = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)
    scene = l_scene(6, 20, distort=0.03, presc=True)
    sol = ft.solve(scene, tol=1e-10)
    assert bool(sol.stats.converged)
    u = np.asarray(sol.displacements)
    fx = np.asarray(scene.fixed) > 0
    np.testing.assert_array_equal(u[fx], np.asarray(scene.prescribed)[fx])
    op = ft.build_operator(scene, dtype=jnp.float64)
    sol_d = ft.solve_operator(
        op, scene.loads, scene.prescribed, method="dense"
    )
    scale = float(np.abs(np.asarray(sol_d.displacements)).max())
    assert np.abs(u - np.asarray(sol_d.displacements)).max() <= 1e-6 * scale


def test_amg_falls_back_on_build_failure(monkeypatch):
    """A failing AMG build degrades (with a warning) to the ddq/two-level
    route instead of failing the solve."""
    S = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(S, "_BLOCK_PRECOND_MIN_DOF", 100)
    # round-5: the subgrid embedding would otherwise serve this L-domain
    # before the AMG route is ever consulted
    monkeypatch.setenv("FEA_TPU_NO_EMBED", "1")

    def boom(scene, **kw):
        raise RuntimeError("synthetic AMG failure")

    monkeypatch.setattr(S, "build_amg_setup", boom)
    scene = l_scene(6, 20, distort=0.03)
    with pytest.warns(RuntimeWarning, match="AMG setup failed"):
        sol = ft.solve(scene, tol=1e-9)
    assert bool(sol.stats.converged)
