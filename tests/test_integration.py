"""End-to-end integration tests on the reference's own demo configurations
(SURVEY.md §4 tier 3): displacements must match a side-by-side sparse
oracle to 1e-6 relative, and the cubebeam correctness anchor
max|u| = 3.0504e-4 m (BASELINE.md) must reproduce."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.materials import units

from oracle import assemble_sparse, solve_reduced


def cubebeam_scene():
    """The reference cubebeam demo (cubebeam.py:14-25, 60-66, 112-118):
    0.1 m square-section cantilever, 784 hex8, E=10^7 psi, nu=0.3, +y
    face load on y==0 nodes."""
    nodes, elements = ft.mesh.box_hex_mesh(4, 4, 49, 0.1, 0.1, 1.0)
    linear_load = 100.0 * units.lbf / units.ft
    total_load = linear_load * 1.0
    force_per_node = total_load / ((4 + 1) * (50 + 1))
    loads = np.zeros_like(nodes)
    loads[nodes[:, 1] == 0.0, 1] += force_per_node
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    mat = ft.Material(E=10_000_000 * units.psi, nu=0.3)
    return ft.make_scene(nodes, elements, fixed, loads, mat, dtype=jnp.float64), (
        nodes,
        elements,
        fixed,
        loads,
        mat,
    )


def tube_scene(n_layers=10):
    """The fea.py tube demo geometry (fea.py:28-65) at reduced layer count,
    with the cosine load distribution *correctly tiled* per layer — the
    reference replicates it with np.repeat, which scrambles the layer-major
    node ordering (the L1 bug, SURVEY.md §2; intent is np.tile)."""
    n_seg = 26
    outer = 4 * units.inch
    nodes2d, quads = ft.mesh.annulus_section(n_seg, 3.9 * units.inch, outer)
    forces2d = np.zeros_like(nodes2d)
    sel = slice(n_seg, (3 * n_seg) // 2)
    forces2d[sel, 1] = -np.cos(np.pi / 2 * nodes2d[sel, 0] / outer) * np.pi / 4 / outer
    nodes, elements = ft.mesh.extrude_quads(nodes2d, quads, np.linspace(0.0, 1.0, n_layers))
    loads = np.zeros_like(nodes)
    loads[:, :2] = np.tile(forces2d, (n_layers, 1))
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    mat = ft.Material(E=10_000_000 * units.psi, nu=0.3)
    return ft.make_scene(nodes, elements, fixed, loads, mat, dtype=jnp.float64), (
        nodes,
        elements,
        fixed,
        loads,
        mat,
    )


def test_cubebeam_matches_oracle_and_anchor():
    scene, (nodes, elements, fixed, loads, mat) = cubebeam_scene()
    sol = ft.solve(scene, method="cg", tol=1e-10, max_iters=50_000)
    u = np.asarray(sol.displacements)

    # correctness anchor from BASELINE.md (identical on the reference's
    # dense path and the scipy sparse path)
    assert np.max(np.abs(u)) == pytest.approx(3.0504e-4, rel=1e-3)

    K = assemble_sparse(nodes, elements, float(np.asarray(mat.E)), 0.3)
    u_oracle = solve_reduced(K, loads, fixed)
    scale = np.max(np.abs(u_oracle))
    assert np.max(np.abs(u - u_oracle)) < 1e-6 * scale  # north-star criterion

    # equilibrium: reactions at the root balance the applied +y load
    r = np.asarray(sol.reactions)
    root = nodes[:, 2] == 0.0
    assert r[root, 1].sum() + loads[~root, 1].sum() == pytest.approx(0.0, abs=1e-8 * np.abs(loads).sum())


def test_tube_matches_oracle():
    scene, (nodes, elements, fixed, loads, mat) = tube_scene(n_layers=10)
    sol = ft.solve(scene, method="cg", tol=1e-10, max_iters=50_000)
    u = np.asarray(sol.displacements)
    K = assemble_sparse(nodes, elements, float(np.asarray(mat.E)), 0.3)
    u_oracle = solve_reduced(K, loads, fixed)
    scale = np.max(np.abs(u_oracle))
    assert np.max(np.abs(u - u_oracle)) < 1e-6 * scale


def test_hex8_slender_cantilever_vs_beam_theory():
    """Tier-3 analytic check (SURVEY.md §4): tip deflection of a slender
    hex8 cantilever under a tip shear load approaches PL^3/3EI."""
    W, Lb = 0.05, 1.0
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 40, W, W, Lb)
    E = 70e9
    P = 100.0
    tip = nodes[:, 2] == Lb
    loads = np.zeros_like(nodes)
    loads[tip, 1] = P / tip.sum()
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(nodes, elements, fixed, loads, ft.Material(E, 0.0), dtype=jnp.float64)
    sol = ft.solve(scene, method="cg", tol=1e-10, max_iters=50_000)
    u = np.asarray(sol.displacements)
    I = W**4 / 12.0
    exact = P * Lb**3 / (3 * E * I)
    tip_deflection = u[tip, 1].mean()
    # trilinear hexes are stiff in bending at this resolution; accept the
    # usual mesh/shear correction band around beam theory
    assert tip_deflection == pytest.approx(exact, rel=0.12)


def test_stress_recovery_uniaxial_bar():
    """Pull a bar with prescribed end displacement: centroid stress must be
    E * strain everywhere (nu = 0)."""
    Lb = 1.0
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 10, 0.1, 0.1, Lb)
    stretch = 1e-3
    fixed = ft.fix_where(nodes, lambda p: (p[:, 2] == 0.0) | (p[:, 2] == Lb), 3)
    prescribed = np.zeros_like(nodes)
    prescribed[nodes[:, 2] == Lb, 2] = stretch
    E = 5e6
    scene = ft.make_scene(
        nodes, elements, fixed, np.zeros_like(nodes), ft.Material(E, 0.0),
        prescribed=prescribed, dtype=jnp.float64,
    )
    sol = ft.solve(scene, method="cg", tol=1e-12)
    eps, sig, vm = ft.post.hex8_stress(scene, sol.displacements)
    sig = np.asarray(sig)
    vm = np.asarray(vm)
    expected = E * stretch / Lb
    assert np.allclose(sig[:, 2], expected, rtol=1e-6)
    assert np.allclose(vm, expected, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    scene, _ = tube_scene(n_layers=3)
    sol = ft.solve(scene, method="cg", tol=1e-8)
    path = str(tmp_path / "sol.npz")
    ft.post.save_solution(path, scene, sol.displacements, sol.reactions)
    data = ft.post.load_solution(path)
    assert np.allclose(data["displacements"], np.asarray(sol.displacements))
    assert data["elements"].shape == (np.asarray(scene.elements)).shape
