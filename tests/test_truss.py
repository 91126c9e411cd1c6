"""Truss tests: linear bar element vs hand statics, and the Newton-Krylov
nonlinear path on the reference's own scene (SURVEY.md §3.4)."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.elements import truss

# The reference truss scene (/root/reference/truss.py:6-25): two bars of
# axial stiffness k=1000 from (0,0) and (0,1) meeting at (1, 0.5), loaded
# with (0, -100) at the apex; both wall nodes fully fixed.
K_AX = 1000.0
NODES = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.5]])
MEMBERS = np.array([[0, 2], [1, 2]])
LOAD = np.array([0.0, -100.0])


def reference_scene():
    fixed = np.zeros((3, 2), dtype=bool)
    fixed[0] = fixed[1] = True
    loads = np.zeros((3, 2))
    loads[2] = LOAD
    return ft.make_scene(
        NODES, MEMBERS, fixed, loads, ft.Material(1.0, 0.0),
        family="bar2d", section=np.full(2, K_AX), dtype=jnp.float64,
    )


def test_linear_solution_hand_statics():
    """By symmetry the apex stiffness is k*[[1.6, 0], [0, 0.4]] (bar
    direction cosines (2, +-1)/sqrt(5)), so u_apex = (0, -0.25)."""
    sol = ft.solve(reference_scene(), method="dense")
    u = np.asarray(sol.displacements)
    assert u[2, 0] == pytest.approx(0.0, abs=1e-12)
    assert u[2, 1] == pytest.approx(-100.0 / (K_AX * 0.4), rel=1e-12)
    assert np.allclose(u[:2], 0.0)


def test_linear_cg_matches_dense():
    scene = reference_scene()
    sol_d = ft.solve(scene, method="dense")
    sol_c = ft.solve(scene, method="cg", tol=1e-13)
    assert np.allclose(
        np.asarray(sol_d.displacements), np.asarray(sol_c.displacements), atol=1e-10
    )


def test_member_forces_equilibrium():
    """Axial member forces at the linear solution balance the load: each
    bar carries F such that 2 * F * sin(theta) = -load_y."""
    scene = reference_scene()
    sol = ft.solve(scene, method="dense")
    # linearized member force: k * (unit_axis . relative displacement)
    Ke = truss.stiffness_matrices(
        jnp.asarray(NODES, jnp.float64), jnp.asarray(MEMBERS, jnp.int32), K_AX
    )
    assert np.asarray(Ke).shape == (2, 4, 4)
    r = np.asarray(sol.reactions)
    # global equilibrium: reactions at supports balance applied load
    assert r[:2, 1].sum() == pytest.approx(100.0, rel=1e-10)
    assert r[:2, 0].sum() == pytest.approx(0.0, abs=1e-9)


def test_newton_krylov_reference_scene():
    """The nonlinear path converges (unlike the reference's endless
    relaxation loop, truss.py:97) and satisfies the reference's own
    residual definition loads + f_int = 0 at the loaded node
    (truss.py:101-103)."""
    scene = reference_scene()
    u, stats = ft.solve_nonlinear(scene, tol=1e-12)
    assert bool(stats.converged)
    f_int = truss.internal_forces(
        scene.nodes, scene.elements, u, scene.section
    )
    residual = LOAD + np.asarray(f_int)[2]
    assert np.linalg.norm(residual) < 1e-8

    # geometric nonlinearity is real: apex drop exceeds the linear 0.25
    u = np.asarray(u)
    assert u[2, 1] < -0.25
    # and the solution stays close to the linear one in character
    assert abs(u[2, 0]) < 0.15


def test_newton_reduces_to_linear_for_small_loads():
    """At tiny load the nonlinear solution matches the linear one."""
    fixed = np.zeros((3, 2), dtype=bool)
    fixed[0] = fixed[1] = True
    loads = np.zeros((3, 2))
    loads[2] = [0.0, -1e-4]
    scene = ft.make_scene(
        NODES, MEMBERS, fixed, loads, ft.Material(1.0, 0.0),
        family="bar2d", section=np.full(2, K_AX), dtype=jnp.float64,
    )
    u_nl, stats = ft.solve_nonlinear(scene, tol=1e-8)
    u_lin = ft.solve(scene, method="dense").displacements
    assert bool(stats.converged)
    assert np.allclose(np.asarray(u_nl), np.asarray(u_lin), rtol=1e-3, atol=1e-12)


def test_bar3d():
    """3D tripod under vertical load: symmetric, vertical-only deflection."""
    s32 = np.sqrt(3.0) / 2.0
    nodes = np.array(
        [[1.0, 0.0, 0.0], [-0.5, s32, 0.0], [-0.5, -s32, 0.0], [0.0, 0.0, 1.0]]
    )
    members = np.array([[0, 3], [1, 3], [2, 3]])
    fixed = np.zeros((4, 3), dtype=bool)
    fixed[:3] = True
    loads = np.zeros((4, 3))
    loads[3, 2] = -50.0
    scene = ft.make_scene(
        nodes, members, fixed, loads, ft.Material(1.0, 0.0),
        family="bar3d", section=np.full(3, K_AX), dtype=jnp.float64,
    )
    sol = ft.solve(scene, method="dense")
    u = np.asarray(sol.displacements)
    assert abs(u[3, 0]) < 1e-9 and abs(u[3, 1]) < 1e-9
    # apex vertical stiffness = 3 * k * cos^2(angle to vertical); bar length
    # sqrt(2), vertical component 1/sqrt(2) -> k_eff = 3k/2
    assert u[3, 2] == pytest.approx(-50.0 / (1.5 * K_AX), rel=1e-9)
