"""Material models and unit constants.

The reference hard-codes an isotropic 3D elasticity matrix inline at
``/root/reference/utils.py:144-153`` and unit-conversion constants at
``/root/reference/fea.py:10-13``.  Here materials are a pytree dataclass so
scenes can be vmapped over material parameters (batched design sweeps —
a capability the reference lacks, SURVEY.md §2 "Batch/sweep parallel").
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["Material", "lame_parameters", "elasticity_matrix", "units"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Material:
    """Linear isotropic material.

    Both fields are pytree leaves, so a batch of materials is just a
    Material with array-valued fields under ``jax.vmap``.
    """

    E: jax.Array | float  # Young's modulus
    nu: jax.Array | float  # Poisson's ratio


def lame_parameters(material: Material):
    """(lambda, mu) Lamé parameters from (E, nu).

    The matrix-free element apply uses sigma = lam*tr(eps)*I + 2*mu*eps
    directly instead of a 6x6 Voigt matrix — fewer bytes touched per
    quadrature point on TPU.
    """
    E = jnp.asarray(material.E)
    nu = jnp.asarray(material.nu)
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    return lam, mu


def elasticity_matrix(material: Material, dtype=jnp.float64) -> jax.Array:
    """6x6 isotropic elasticity matrix in Voigt order (xx,yy,zz,xy,yz,zx).

    Behavioral parity with ``/root/reference/utils.py:144-153`` (same
    Voigt ordering and engineering-shear convention); used by the
    explicit-Ke path and by tests as the constitutive oracle.
    """
    lam, mu = lame_parameters(material)
    lam = jnp.asarray(lam, dtype)
    mu = jnp.asarray(mu, dtype)
    C = jnp.zeros((6, 6), dtype)
    diag = lam + 2.0 * mu
    C = C.at[:3, :3].set(lam)
    C = C.at[jnp.arange(3), jnp.arange(3)].set(diag)
    C = C.at[jnp.arange(3, 6), jnp.arange(3, 6)].set(mu)
    return C


class units:
    """US-customary → SI conversion constants (parity: /root/reference/fea.py:10-13)."""

    psi = 6894.76
    lbf = 4.44822
    ft = 0.3048
    inch = 0.0254
