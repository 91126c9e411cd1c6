"""Section-RBM coarse space for the extruded hierarchy + the f64 Thomas
chain fix.

Round-3 work (VERDICT.md r2 weak #7): z-only coarsening leaves the
shell-bending modes of thin tubes to the FCG outer loop; the z-resolved
per-layer section-RBM coarse space removes them.  Bundled here is the
regression test for the divergence it uncovered: the all-f32 Schur
chain of the z-coarse Thomas factorization measured 30% error in G on a
slender tube (catastrophic cancellation) — a garbage "exact" coarse
solve that diverged the production V-cycle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.extruded import extruded_scene_tube, infer_extruded
from fea_tpu.solve import build_extruded, solve_extruded


def _tube_scene(nseg, nlay, r_in, r_out, length):
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene0, detected = extruded_scene_tube(
        nseg, nlay, r_in, r_out, length, mat, dtype=jnp.float64
    )
    nodes = np.asarray(scene0.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    r_xy = np.hypot(nodes[:, 0], nodes[:, 1])
    sel = tip & (np.abs(r_xy - r_out) < 1e-9) & (nodes[:, 1] < 0)
    w = np.cos(0.5 * np.pi * nodes[sel, 0] / r_out)
    loads[sel, 1] = -1000.0 * w / w.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene0.elements), np.asarray(scene0.fixed), loads,
        mat, dtype=jnp.float64,
    )
    return scene, detected


@pytest.fixture(scope="module")
def slender_tube():
    # slender thin-walled tube (L/R = 20, one element through the wall):
    # the configuration whose all-f32 Thomas chain diverged
    return _tube_scene(32, 64, 0.0974, 0.1, 2.0)


def test_slender_tube_device_build_converges(slender_tube):
    """Regression: the DEVICE (default) hierarchy build must converge on
    a slender tube.  Before the f64 Thomas-chain fix the f32 Schur
    recurrence produced ~30%-wrong G factors and the solve diverged
    (residual growing x100s)."""
    scene, detected = slender_tube
    pre = build_extruded(scene, detected, section_coarse=False)
    sol = solve_extruded(scene, detected, tol=1e-8, prebuilt=pre, max_iters=250)
    assert bool(sol.stats.converged)
    # slender shells are the hard case; anything convergent and bounded
    # is the regression line (measured ~80 with the fix, divergent before)
    assert int(sol.stats.iterations) <= 150


def test_section_coarse_cuts_iterations(slender_tube):
    """The z-resolved section-RBM coarse space must cut FCG iterations
    substantially on a thin tube (measured 54 -> 25 at As=32 on the
    bench-proportioned tube; ~80 -> ~36 on this slender one)."""
    scene, detected = slender_tube
    base = solve_extruded(
        scene, detected, tol=1e-8, max_iters=250,
        prebuilt=build_extruded(scene, detected, section_coarse=False),
    )
    with_sc = solve_extruded(
        scene, detected, tol=1e-8, max_iters=250,
        prebuilt=build_extruded(scene, detected, section_coarse=True,
                                section_aggregates=32),
    )
    assert bool(with_sc.stats.converged)
    assert int(with_sc.stats.iterations) <= 0.7 * int(base.stats.iterations)
    # same answer
    scale = float(jnp.max(jnp.abs(base.displacements)))
    assert float(jnp.max(jnp.abs(
        with_sc.displacements - base.displacements
    ))) < 1e-6 * scale


def test_section_coarse_matches_dense_oracle():
    """SectionCoarse (projected block-tridiagonal + Thomas) must equal
    the dense Galerkin solve P (P^T A_masked P)^-1 P^T r built from the
    unstructured operator."""
    from fea_tpu.ops.extruded_mg import build_section_coarse
    from fea_tpu.ops.twolevel import _skew

    scene, detected = _tube_scene(12, 8, 0.08, 0.1, 0.5)
    sc = build_section_coarse(scene, detected, target_section_aggregates=6)
    assert sc.n_aggs > 1  # 2D binning must not degenerate (regression)
    _, n2, L = detected
    nodes = np.asarray(scene.nodes)
    N = nodes.shape[0]
    op_u = ft.build_operator(scene, dtype=jnp.float64)
    A = np.asarray(op_u.dense())
    f = (1.0 - np.asarray(scene.fixed, np.float64)).reshape(-1)
    Am = f[:, None] * A * f[None, :]
    Am[np.diag_indices_from(Am)] += 1.0 - f
    agg3 = np.asarray(sc.agg)
    xrel3 = np.asarray(sc.xrel, np.float64)
    P = np.zeros((3 * N, 6 * L * sc.n_aggs))
    for i in range(N):
        a = agg3[i]
        P[3 * i : 3 * i + 3, 6 * a : 6 * a + 3] = np.eye(3)
        P[3 * i : 3 * i + 3, 6 * a + 3 : 6 * a + 6] = _skew(xrel3[i : i + 1])[0]
    Ac = P.T @ Am @ P
    r = np.random.default_rng(5).standard_normal((N, 3))
    rc = P.T @ r.reshape(-1)
    zc = np.linalg.solve(Ac, rc)  # Ac is nonsingular on this scene
    z_oracle = (P @ zc).reshape(N, 3)
    z_sc = np.asarray(sc(jnp.asarray(r)))
    assert np.max(np.abs(z_sc - z_oracle)) < 1e-6 * np.max(np.abs(z_oracle))
