"""Connectivity canonicalization (ops/canonical.py, round-4 VERDICT r3
#5): renumbered grid meshes are detected by pure index arithmetic,
verified exactly, and routed through the production grid pipelines."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.canonical import canonicalize_scene, infer_renumbered_grid
from fea_tpu.ops.curvilinear import infer_topo_dims

MAT = ft.Material(E=1e7, nu=0.3)


def _renumbered_scene(dims=(4, 5, 7), seed=3, distort=0.0):
    rng = np.random.default_rng(seed)
    nodes, elements = ft.mesh.box_hex_mesh(*dims, 0.4, 0.5, 0.7)
    nodes = np.asarray(nodes, np.float64)
    if distort:
        h = 0.4 / dims[0]
        lo, hi = nodes.min(0), nodes.max(0)
        interior = (nodes > lo + 1e-9) & (nodes < hi - 1e-9)
        nodes = nodes + distort * h * rng.uniform(-1, 1, nodes.shape) * interior
    N = nodes.shape[0]
    p = rng.permutation(N)  # old id -> new id
    inv = np.empty_like(p)
    inv[p] = np.arange(N)
    nodes_r = nodes[inv]
    el_r = p[np.asarray(elements)]
    el_r = el_r[rng.permutation(el_r.shape[0])]  # rows shuffled too
    fixed = ft.fix_where(nodes_r, lambda q: np.isclose(q[:, 2], 0.0), 3)
    loads = np.zeros_like(nodes_r)
    tip = np.isclose(nodes_r[:, 2], nodes_r[:, 2].max())
    loads[tip, 1] = 1.0 / tip.sum()
    return ft.make_scene(nodes_r, el_r, fixed, loads, MAT, dtype=jnp.float64)


def test_detects_and_verifies_renumbered_grid():
    scene = _renumbered_scene()
    assert infer_topo_dims(scene) is None  # scrambled as-given
    det = infer_renumbered_grid(scene)
    assert det is not None
    dims, perm = det
    assert dims == (4, 5, 7)
    sc = canonicalize_scene(scene, dims, perm)
    assert infer_topo_dims(sc) == dims
    # geometry rides along: canonical node perm[n] is original node n
    assert np.allclose(
        np.asarray(sc.nodes)[perm], np.asarray(scene.nodes)
    )


def test_rejects_non_grid_connectivity():
    # a grid with one element removed is not a full box grid
    nodes, elements = ft.mesh.box_hex_mesh(3, 3, 4, 1.0, 1.0, 1.0)
    el = np.asarray(elements)[:-1]
    fixed = ft.fix_where(np.asarray(nodes), lambda q: np.isclose(q[:, 2], 0.0), 3)
    scene = ft.make_scene(np.asarray(nodes), el, fixed,
                          np.zeros((np.asarray(nodes).shape[0], 3)), MAT,
                          dtype=jnp.float64)
    assert infer_renumbered_grid(scene) is None
    # two disjoint copies of a grid: consistent edges but wrong counts
    n2 = np.vstack([np.asarray(nodes), np.asarray(nodes) + 10.0])
    e2 = np.vstack([np.asarray(elements),
                    np.asarray(elements) + np.asarray(nodes).shape[0]])
    f2 = np.zeros((n2.shape[0], 3), np.int32)
    scene2 = ft.make_scene(n2, e2, f2, np.zeros_like(n2), MAT,
                           dtype=jnp.float64)
    assert infer_renumbered_grid(scene2) is None


def test_solve_routes_renumbered_grid_and_permutes_back(monkeypatch):
    """solve() auto-detects the renumbered distorted grid, runs the
    canonical (curvilinear) pipeline, and returns solution/reactions in
    the CALLER's node order."""
    import sys

    S = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(S, "_STRUCTURED_MIN_DOF", 500)
    scene = _renumbered_scene(dims=(4, 4, 10), seed=11, distort=0.2)
    sol = ft.solve(scene, tol=1e-9)
    assert bool(sol.stats.converged)
    # oracle: the generic route on the same (renumbered) scene
    ref = ft.solve(scene, method="cg", tol=1e-10)
    scale = float(np.abs(np.asarray(ref.displacements)).max())
    du = np.abs(
        np.asarray(sol.displacements) - np.asarray(ref.displacements)
    ).max()
    assert du <= 1e-6 * scale
    # reactions balance the load in the caller's ordering
    react = np.asarray(sol.reactions)
    loads = np.asarray(scene.loads)
    assert abs(react[:, 1].sum()) <= 1e-8 * max(abs(loads[:, 1]).sum(), 1.0)


def test_canonical_cache_respects_new_loads(monkeypatch):
    """Regression (ADVICE r4 high): the canonical-scene cache keys on
    topology identity only — a repeat solve on the SAME mesh with
    DIFFERENT loads (the 'one mesh, many loads' pattern) must solve the
    new load case, not replay the cached one."""
    import dataclasses
    import sys

    S = sys.modules["fea_tpu.solve"]
    monkeypatch.setattr(S, "_STRUCTURED_MIN_DOF", 500)
    scene = _renumbered_scene(dims=(4, 4, 10), seed=13, distort=0.15)
    sol_a = ft.solve(scene, tol=1e-9)
    # same nodes/elements/fixed identities -> canonical-scene cache hit
    loads_b = 2.5 * np.asarray(scene.loads)
    loads_b[:, 0] += 0.3 * loads_b[:, 1]  # different direction too
    scene_b = dataclasses.replace(scene, loads=jnp.asarray(loads_b))
    sol_b = ft.solve(scene_b, tol=1e-9)
    ua = np.asarray(sol_a.displacements)
    ub = np.asarray(sol_b.displacements)
    assert not np.allclose(ub, ua)  # the stale-cache bug returned ua
    # oracle for the new load case
    ref_b = ft.solve(scene_b, method="cg", tol=1e-10)
    scale = float(np.abs(np.asarray(ref_b.displacements)).max())
    assert np.abs(ub - np.asarray(ref_b.displacements)).max() <= 1e-6 * scale
