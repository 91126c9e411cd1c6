"""Pin-jointed axial bar (truss) element, 2D and 3D, batched.

The reference's truss (``/root/reference/truss.py``) has no stiffness
matrix at all: it recomputes geometrically-nonlinear spring forces from
the *displaced* geometry (truss.py:78-92) and relaxes them in an
unterminated pseudo-dynamic loop (truss.py:97-119).  This module provides
both regimes properly:

  * linear bar stiffness matrices for the standard K u = f path
  * a batched nonlinear internal-force function ``internal_forces`` with
    the same constitutive law as the reference (force = k * stretch along
    the current member direction) that plugs into the Newton-Krylov
    solver (fea_tpu.solvers.newton) — the convergent, jit-compiled
    replacement for the reference's relaxation loop.

Section convention: ``stiffness`` is the per-element axial stiffness
k = E A / L0 (pass the reference's constant k = 1000 directly, or compute
from material and area).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["stiffness_matrices", "internal_forces", "member_forces"]


def _directions(nodes: jax.Array, elements: jax.Array):
    """Unit direction (E, dim) and length (E,) of each member."""
    d = nodes[elements[:, 1]] - nodes[elements[:, 0]]
    L = jnp.linalg.norm(d, axis=-1)
    return d / L[:, None], L


def stiffness_matrices(nodes: jax.Array, elements: jax.Array, stiffness) -> jax.Array:
    """Batched linear bar Ke, (E, 2*dim, 2*dim).

    Ke = k [[cc, -cc], [-cc, cc]] with cc = outer(c, c) for unit axis c.
    """
    c, L = _directions(nodes, elements)
    k = jnp.broadcast_to(jnp.asarray(stiffness, c.dtype), L.shape)
    cc = c[:, :, None] * c[:, None, :]  # (E, dim, dim)
    top = jnp.concatenate([cc, -cc], axis=-1)
    bot = jnp.concatenate([-cc, cc], axis=-1)
    return k[:, None, None] * jnp.concatenate([top, bot], axis=-2)


def internal_forces(nodes: jax.Array, elements: jax.Array, displacement: jax.Array, stiffness) -> jax.Array:
    """Nodal internal forces (N, dim) of the displaced truss.

    Geometrically nonlinear, matching the reference's constitutive law
    (truss.py:83-92): member force magnitude = -k * (L0 - L_current),
    directed along the *current* member axis, accumulated +/- into the
    end nodes.  Batched over members with a scatter-add instead of the
    reference's Python loop; differentiable, so the tangent operator for
    Newton's method is a free ``jax.jvp``.
    """
    current = nodes + displacement
    d = current[elements[:, 1]] - current[elements[:, 0]]
    L = jnp.linalg.norm(d, axis=-1)
    _, L0 = _directions(nodes, elements)
    k = jnp.broadcast_to(jnp.asarray(stiffness, L.dtype), L.shape)
    force = -k * (L0 - L)  # tension positive
    fvec = (force / L)[:, None] * d  # (E, dim) force on start node
    f = jnp.zeros_like(nodes)
    f = f.at[elements[:, 0]].add(fvec)
    f = f.at[elements[:, 1]].add(-fvec)
    return f


def member_forces(nodes: jax.Array, elements: jax.Array, displacement: jax.Array, stiffness) -> jax.Array:
    """Axial force per member (E,), tension positive."""
    current = nodes + displacement
    d = current[elements[:, 1]] - current[elements[:, 0]]
    L = jnp.linalg.norm(d, axis=-1)
    _, L0 = _directions(nodes, elements)
    k = jnp.broadcast_to(jnp.asarray(stiffness, L.dtype), L.shape)
    return k * (L - L0)
