"""Euler-Bernoulli bending element (2 DOF/node: deflection w, rotation theta).

Reference element: the closed-form 4x4 Ke at
``/root/reference/euler_bernoulli.py:22-39`` and the consistent nodal load
for a uniform distributed load at ``euler_bernoulli.py:52-57``.  Batched
here over all elements at once (the reference builds one Ke and reuses it
because its mesh is uniform; this version permits per-element lengths and
section properties).

Post-processing note: the reference's moment/shear recovery
(``euler_bernoulli.py:78-102``) mislabels the quantities — its "moment"
expression is EI/L^2 (12 w0 - 6L th0 - 12 w1 + 6L th1), which is L * EI v'''
with a sign flip on the rotation terms, and its "shear" expression equals
EI v''(L), i.e. the bending moment at the element's right end.  This module
implements the physically correct recovery (M = EI v'', V = EI v''' from the
Hermite interpolant) and is validated against the closed-form fixed-fixed
solution (M_end = qL^2/12, M_mid = qL^2/24, V_end = qL/2) instead of
replicating the defect (SURVEY.md §7 "match intent, not defect").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..materials import Material

__all__ = ["stiffness_matrices", "uniform_load_vector", "moment_shear"]


def element_lengths(nodes: jax.Array, elements: jax.Array) -> jax.Array:
    """(E,) element lengths from 1D node coordinates (N,) or (N,1).

    Signed: node ordering must satisfy x[n1] > x[n0] per element —
    a reversed element would corrupt Ke through L**3 with no numerical
    error, so ``build_operator`` validates positivity on the host at
    build time (jit-traced callers cannot raise data-dependently).
    """
    x = nodes.reshape(-1)
    return x[elements[:, 1]] - x[elements[:, 0]]


def stiffness_matrices(nodes: jax.Array, elements: jax.Array, material: Material, inertia) -> jax.Array:
    """Batched (E, 4, 4) Euler-Bernoulli stiffness: (EI/L^3) * closed form.

    DOF order per element: (w0, th0, w1, th1), matching the reference's
    global map [2i, 2i+1, 2i+2, 2i+3] (euler_bernoulli.py:44).
    """
    L = element_lengths(nodes, elements)
    dtype = L.dtype
    EI = jnp.broadcast_to(jnp.asarray(material.E * inertia, dtype), L.shape)
    one = jnp.ones_like(L)
    rows = [
        [12.0 * one, 6.0 * L, -12.0 * one, 6.0 * L],
        [6.0 * L, 4.0 * L**2, -6.0 * L, 2.0 * L**2],
        [-12.0 * one, -6.0 * L, 12.0 * one, -6.0 * L],
        [6.0 * L, 2.0 * L**2, -6.0 * L, 4.0 * L**2],
    ]
    Ke = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)  # (E, 4, 4)
    return (EI / L**3)[:, None, None] * Ke


def uniform_load_vector(nodes: jax.Array, elements: jax.Array, q) -> jax.Array:
    """Consistent nodal load (E, 4) for uniform transverse load q.

    q L / 2 * [1, L/6, 1, -L/6] per element (euler_bernoulli.py:52-57).
    """
    L = element_lengths(nodes, elements)
    q = jnp.broadcast_to(jnp.asarray(q, L.dtype), L.shape)
    half = q * L / 2.0
    return jnp.stack([half, half * L / 6.0, half, -half * L / 6.0], axis=-1)


def moment_shear(nodes: jax.Array, elements: jax.Array, u: jax.Array, material: Material, inertia):
    """Correct per-element internal actions from the Hermite interpolant.

    Returns (M0, M1, V): bending moment at each element end (E,), (E,) and
    the (constant) shear force per element (E,).

      v''(0) = (-6 w0 - 4 L th0 + 6 w1 - 2 L th1) / L^2
      v''(L) = ( 6 w0 + 2 L th0 - 6 w1 + 4 L th1) / L^2
      v'''   = (12 w0 + 6 L th0 - 12 w1 + 6 L th1) / L^3
    """
    L = element_lengths(nodes, elements)
    dtype = L.dtype
    EI = jnp.broadcast_to(jnp.asarray(material.E * inertia, dtype), L.shape)
    dof = u.reshape(-1, 2)
    w0, th0 = dof[elements[:, 0], 0], dof[elements[:, 0], 1]
    w1, th1 = dof[elements[:, 1], 0], dof[elements[:, 1], 1]
    M0 = EI * (-6.0 * w0 - 4.0 * L * th0 + 6.0 * w1 - 2.0 * L * th1) / L**2
    M1 = EI * (6.0 * w0 + 2.0 * L * th0 - 6.0 * w1 + 4.0 * L * th1) / L**2
    V = EI * (12.0 * w0 + 6.0 * L * th0 - 12.0 * w1 + 6.0 * L * th1) / L**3
    return M0, M1, V
