"""Subgrid embedding: detector exactness and embedded-solve parity with
the element-gather oracle (round-5, the arbitrary-topology speed path)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.canonical import infer_renumbered_grid, infer_subgrid_embedding


MAT = ft.Material(E=2.0e9, nu=0.3)


def l_scene(nx, nz, *, amp=0.15, seed=5):
    nodes, elements = ft.mesh.l_hex_mesh(nx, nx, nz, 0.1, 0.1, 0.1 * nz / nx)
    nodes = np.asarray(nodes, np.float64)
    rng = np.random.default_rng(seed)
    h = 0.1 / nx
    lz = 0.1 * nz / nx
    interior = (nodes[:, 2] > 1e-12) & (nodes[:, 2] < lz - 1e-12)
    nodes = nodes + amp * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), 3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], lz)
    loads[tip, 1] = 1.0 / tip.sum()
    return ft.make_scene(nodes, np.asarray(elements), fixed, loads, MAT,
                         dtype=jnp.float64)


def test_detector_finds_l_domain():
    scene = l_scene(6, 12)
    assert infer_renumbered_grid(scene) is None  # defeats full-grid pass
    det = infer_subgrid_embedding(scene)
    assert det is not None
    dims, lat, valid = det
    assert dims == (6, 6, 12)
    assert int(valid.sum()) == scene.elements.shape[0]
    assert np.unique(lat).size == scene.n_nodes
    # node order never consulted: a random renumbering detects the same
    rng = np.random.default_rng(1)
    perm = rng.permutation(scene.n_nodes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    s2 = ft.make_scene(
        np.asarray(scene.nodes)[inv], perm[np.asarray(scene.elements)],
        np.asarray(scene.fixed)[inv], np.asarray(scene.loads)[inv], MAT,
        dtype=jnp.float64,
    )
    det2 = infer_subgrid_embedding(s2)
    assert det2 is not None and det2[0] == dims


def test_detector_rejects_non_embeddable():
    """Two grids glued through a quarter-twisted face cannot live on one
    lattice — the fixpoint propagation must find the contradiction."""
    scene = l_scene(4, 8)
    el = np.asarray(scene.elements).copy()
    # twist one element's corner order 90 deg about z: x-edges become
    # y-edges for that element only -> coordinate conflict
    el[0] = el[0][[3, 0, 1, 2, 7, 4, 5, 6]]
    s2 = ft.make_scene(
        np.asarray(scene.nodes), el, np.asarray(scene.fixed),
        np.asarray(scene.loads), MAT, dtype=jnp.float64,
    )
    assert infer_subgrid_embedding(s2) is None


def test_detector_full_grid_is_trivial_embedding():
    nodes, elements = ft.mesh.box_hex_mesh(3, 4, 5, 0.3, 0.4, 0.5)
    fixed = np.zeros_like(nodes)
    fixed[nodes[:, 2] == 0.0] = 1.0
    scene = ft.make_scene(nodes, elements, fixed, np.zeros_like(nodes), MAT,
                          dtype=jnp.float64)
    det = infer_subgrid_embedding(scene)
    assert det is not None
    assert det[0] == (3, 4, 5)
    assert bool(det[2].all())


def test_embedded_operator_matches_element_oracle(rng):
    """The embedded stencil restricted to real DOFs IS the mesh's
    stiffness: raw apply parity with the element-gather operator."""
    from fea_tpu.solve.embed import build_subgrid_embedded

    scene = l_scene(4, 8)
    det = infer_subgrid_embedding(scene)
    base, op, mg, lat = build_subgrid_embedded(scene, det)
    op_u = ft.build_operator(scene, dtype=jnp.float64)
    u = rng.standard_normal((scene.n_nodes, 3))
    u_emb = np.zeros((base.n_nodes, 3))
    u_emb[lat] = u
    a_emb = np.asarray(op.apply_raw(jnp.asarray(u_emb)))[lat]
    a_ref = np.asarray(op_u.apply_raw(jnp.asarray(u)))
    assert np.abs(a_emb - a_ref).max() <= 1e-11 * np.abs(a_ref).max()


def test_embedded_solve_matches_dense():
    from fea_tpu.solve.embed import build_subgrid_embedded, solve_subgrid_embedded

    scene = l_scene(4, 8)
    det = infer_subgrid_embedding(scene)
    built = build_subgrid_embedded(scene, det)
    sol = solve_subgrid_embedded(scene, built, tol=1e-9)
    assert bool(sol.stats.converged)
    sol_d = ft.solve(scene, method="dense")
    u = np.asarray(sol.displacements)
    ud = np.asarray(sol_d.displacements)
    assert np.abs(u - ud).max() <= 1e-7 * np.abs(ud).max()
    # reactions balance the applied loads (free rows ~ loads)
    F = 1.0 - np.asarray(scene.fixed, np.float64)
    r = np.asarray(sol.reactions)
    assert np.abs(F * (r - np.asarray(scene.loads))).max() <= 1e-7


def test_auto_route_uses_embedding(monkeypatch):
    """solve() auto-routes box-subset meshes through the embedding once
    past the large-scene threshold; a fresh load case on the cached
    build must NOT replay stale loads (ADVICE r4)."""
    import sys

    solve_mod = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(solve_mod, "_BLOCK_PRECOND_MIN_DOF", 100)
    scene = l_scene(4, 8)
    sol = ft.solve(scene, tol=1e-9)
    sol_d = ft.solve(scene, method="dense")
    u = np.asarray(sol.displacements)
    ud = np.asarray(sol_d.displacements)
    assert np.abs(u - ud).max() <= 1e-7 * np.abs(ud).max()
    # second solve, same mesh, different loads: cache must re-place them
    loads2 = 2.5 * np.asarray(scene.loads)
    s2 = dataclasses.replace(scene, loads=jnp.asarray(loads2, jnp.float64))
    sol2 = ft.solve(s2, tol=1e-9)
    assert np.abs(np.asarray(sol2.displacements) - 2.5 * ud).max() <= (
        2.5e-7 * np.abs(ud).max()
    )


def test_embedded_operator_shards(rng):
    """The embedded operator is a CurvilinearOperator, so the z-slab
    GSPMD path (parallel.shard_curvilinear) serves box-subset meshes
    too: sharded apply == single-device, on 8 virtual devices."""
    import jax

    from fea_tpu.parallel import make_device_mesh, shard_curvilinear
    from fea_tpu.solve.embed import build_subgrid_embedded

    scene = l_scene(4, 15)  # Z = 16 planes, 2 per device
    det = infer_subgrid_embedding(scene)
    base, op, mg, lat = build_subgrid_embedded(scene, det)
    mesh = make_device_mesh(8, axis_name="ze")
    op_s, mg_s, constrain = shard_curvilinear(op, mg, mesh)
    x = jnp.asarray(rng.standard_normal((base.n_nodes, 3)), jnp.float64)
    want = np.asarray(op.apply_raw(x))
    got_arr = jax.jit(op_s.apply_raw)(constrain(x))
    assert np.allclose(np.asarray(got_arr), want,
                       rtol=1e-13, atol=1e-13 * np.abs(want).max())
    assert len(got_arr.sharding.device_set) == 8
    assert not op_s.w.sharding.is_fully_replicated


def test_solve_many_embedded_route():
    """solve_many on a box-subset mesh runs the embedded batched program
    and matches per-case dense solves (one mesh, many loads — the
    reference's own usage pattern, extended to arbitrary box-subset
    topology)."""
    scene = l_scene(4, 8)
    scales = np.array([1.0, -0.5, 3.0])
    loads = np.asarray(scene.loads)
    batch = scales[:, None, None] * loads[None]
    sol = ft.solve_many(scene, batch, tol=1e-9)
    assert np.asarray(sol.stats.converged).all()
    ud = np.asarray(ft.solve(scene, method="dense").displacements)
    u = np.asarray(sol.displacements)
    assert u.shape == (3, scene.n_nodes, 3)
    for i, s in enumerate(scales):
        assert np.abs(u[i] - s * ud).max() <= 3e-7 * np.abs(s * ud).max()
    # reactions balance per case on free rows
    F = 1.0 - np.asarray(scene.fixed, np.float64)
    r = np.asarray(sol.reactions)
    assert np.abs(F * (r - batch)).max() <= 1e-6
