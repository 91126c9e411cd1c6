"""Euler-Bernoulli beam tests against closed-form solutions (SURVEY.md §4
tier 3: the reference's euler_bernoulli.py demo is implicitly validated by
qL^4/384EI — here that becomes an explicit acceptance test, plus a
cantilever case and internal-action recovery)."""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.elements import beam


E, I, L, Q = 210e9, 1e-6, 1.0, 1000.0  # reference constants, euler_bernoulli.py:5-8


def beam_scene(n_elements, fixed_mask, loads=None):
    x = np.linspace(0.0, L, n_elements + 1)[:, None]
    elements = np.stack([np.arange(n_elements), np.arange(n_elements) + 1], axis=1)
    if loads is None:
        loads = np.zeros((n_elements + 1, 2))
    return ft.make_scene(
        x, elements, fixed_mask, loads, ft.Material(E, 0.0),
        family="eb_beam", section=np.float64(I), dtype=jnp.float64,
    )


def consistent_uniform_load(n_elements):
    """Assembled consistent nodal load for uniform q (parity with
    euler_bernoulli.py:52-57)."""
    x = jnp.linspace(0.0, L, n_elements + 1)[:, None]
    elements = jnp.stack(
        [jnp.arange(n_elements), jnp.arange(n_elements) + 1], axis=1
    ).astype(jnp.int32)
    fe = beam.uniform_load_vector(x, elements, Q)  # (E, 4)
    loads = np.zeros((n_elements + 1, 2))
    np.add.at(loads.reshape(-1), np.asarray(
        (elements[:, :, None] * 2 + np.arange(2)[None, None, :]).reshape(-1)
    ), np.asarray(fe).reshape(-1))
    return loads


def test_fixed_fixed_midspan_deflection():
    """Reference demo config: 100 elements, fixed-fixed, uniform load.
    Midspan deflection must equal qL^4 / 384EI (reference matches to
    7e-12, BASELINE.md)."""
    n = 100
    fixed = np.zeros((n + 1, 2), dtype=bool)
    fixed[0] = True
    fixed[-1] = True
    scene = beam_scene(n, fixed, consistent_uniform_load(n))
    sol = ft.solve(scene, method="dense")
    w = np.asarray(sol.displacements)[:, 0]
    exact = Q * L**4 / (384 * E * I)
    assert w[n // 2] == pytest.approx(exact, rel=1e-9)


def test_fixed_fixed_cg_matches_dense():
    n = 40
    fixed = np.zeros((n + 1, 2), dtype=bool)
    fixed[0] = True
    fixed[-1] = True
    scene = beam_scene(n, fixed, consistent_uniform_load(n))
    sol_d = ft.solve(scene, method="dense")
    sol_c = ft.solve(scene, method="cg", tol=1e-12, max_iters=5000)
    du = np.max(np.abs(np.asarray(sol_d.displacements - sol_c.displacements)))
    assert du < 1e-9 * np.max(np.abs(np.asarray(sol_d.displacements)))


def test_cantilever_tip_load():
    """Tip deflection PL^3/3EI and tip rotation PL^2/2EI."""
    n, P = 50, 750.0
    fixed = np.zeros((n + 1, 2), dtype=bool)
    fixed[0] = True
    loads = np.zeros((n + 1, 2))
    loads[-1, 0] = P
    scene = beam_scene(n, fixed, loads)
    sol = ft.solve(scene, method="dense")
    w = np.asarray(sol.displacements)
    assert w[-1, 0] == pytest.approx(P * L**3 / (3 * E * I), rel=1e-9)
    assert w[-1, 1] == pytest.approx(P * L**2 / (2 * E * I), rel=1e-9)


def test_moment_shear_recovery():
    """Internal actions for the fixed-fixed uniform-load case in the
    M = EI w'' / V = EI w''' convention (w, q positive the same way):
    the exact solution w = q x^2 (L-x)^2 / 24EI gives M(0) = +qL^2/12,
    M(L/2) = -qL^2/24, V(0) = -qL/2, V(L) = +qL/2.
    (The reference's recovery formulas are mislabeled — see
    fea_tpu/elements/beam.py docstring; these are the physical values.)"""
    n = 100
    fixed = np.zeros((n + 1, 2), dtype=bool)
    fixed[0] = True
    fixed[-1] = True
    scene = beam_scene(n, fixed, consistent_uniform_load(n))
    sol = ft.solve(scene, method="dense")
    M0, M1, V = (np.asarray(a) for a in ft.post.beam_moment_shear(scene, sol.displacements))
    q_l_sq = Q * L**2
    assert M0[0] == pytest.approx(q_l_sq / 12, rel=1e-3)
    mid = n // 2
    assert M0[mid] == pytest.approx(-q_l_sq / 24, rel=1e-3)
    # V is element-constant and exact at element midpoints:
    # V(x) = q (2x - L) / 2, so element 0 (midpoint h/2) carries q(h-L)/2.
    h = L / n
    assert V[0] == pytest.approx(Q * (h - L) / 2, rel=1e-9)
    assert V[-1] == pytest.approx(Q * (L - h) / 2, rel=1e-9)
    assert V[mid] == pytest.approx(0.0, abs=Q * h)


def test_reactions_balance_load():
    """Equilibrium of reactions = K @ u (the reference's recovery,
    fea.py:113): since a uniform w-translation is a rigid-body mode,
    sum_w (K u) = 0, so the K@u values at the two fixed ends balance the
    transverse load applied at *free* DOFs — total qL minus the
    consistent-load share qh/2 assigned to each support node (which never
    enters the solve)."""
    n = 20
    h = L / n
    fixed = np.zeros((n + 1, 2), dtype=bool)
    fixed[0] = True
    fixed[-1] = True
    loads = consistent_uniform_load(n)
    scene = beam_scene(n, fixed, loads)
    sol = ft.solve(scene, method="dense")
    r = np.asarray(sol.reactions)
    free_load = Q * L - 2 * (Q * h / 2)
    assert r[0, 0] + r[-1, 0] == pytest.approx(-free_load, rel=1e-9)
    # and by symmetry each support carries half
    assert r[0, 0] == pytest.approx(-free_load / 2, rel=1e-9)
