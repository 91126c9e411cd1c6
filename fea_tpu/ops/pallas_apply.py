"""Pallas TPU kernels for the batched element apply (unstructured path).

The element-by-element SpMV's compute stage is f_e[e] = Ke[e] @ u_e[e]
for hundreds of thousands of independent 24-vectors.  A naive batched
matvec puts the 24-wide contraction on the lane axis (wasting 104 of 128
lanes); these kernels instead lay elements on the lane axis
("element-on-lanes", structure-of-arrays):

    u_e   viewed as (24, E)    — E on lanes, DOF index on sublanes
    Ke    viewed as (24, 24, E) for the stored mode
    f_e   = sum_b Ke[a, b, :] * u_e[b, :]   — 576 VPU FMAs per tile

Each grid step processes a TILE_E-wide block of elements entirely in
VMEM.  The kernels are numerically identical to the XLA einsum paths
(tests/test_pallas.py) and selected via ``use_pallas`` on the operator
build; on CPU test runs they execute in interpreter mode.

Reference context: the compute this replaces is the reference's per-
element ``Ke @ u`` inside its dense assembly loop
(/root/reference/fea.py:89-97) — here it is the inner stage of the
matrix-free operator (SURVEY.md §2 "native components": the Pallas tier
is this framework's C++-equivalent layer).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_matvec_stored", "batched_matvec_uniform"]

TILE_E = 512  # elements per grid step; 512 f32 lanes * 24 sublanes ~ 48 KB/operand


def _stored_kernel(ke_ref, u_ref, out_ref):
    """One tile: ke (24, 24, TILE_E), u (24, TILE_E) -> out (24, TILE_E)."""
    u = u_ref[:]  # (24, T)
    acc = jnp.zeros_like(u)
    for b in range(24):
        acc = acc + ke_ref[:, b, :] * u[b, :][None, :]
    out_ref[:] = acc


def batched_matvec_stored(ke: jax.Array, u_e: jax.Array, *, interpret: bool = False) -> jax.Array:
    """f_e = einsum('eab,eb->ea', ke, u_e) via an element-on-lanes kernel.

    ke (E, k, k), u_e (E, k) with k = 24 (hex8).  E is padded to TILE_E
    internally; the caller sees exact shapes.
    """
    E, k = u_e.shape
    if ke.shape != (E, k, k):
        raise ValueError(f"ke must be (E, {k}, {k}), got {ke.shape}")
    pad = (-E) % TILE_E
    if pad:
        ke = jnp.concatenate([ke, jnp.zeros((pad, k, k), ke.dtype)], axis=0)
        u_e = jnp.concatenate([u_e, jnp.zeros((pad, k), u_e.dtype)], axis=0)
    E_pad = E + pad

    # element-on-lanes layout
    ke_t = jnp.transpose(ke, (1, 2, 0))  # (k, k, E_pad)
    u_t = jnp.transpose(u_e, (1, 0))  # (k, E_pad)

    grid = (E_pad // TILE_E,)
    out_t = pl.pallas_call(
        _stored_kernel,
        out_shape=jax.ShapeDtypeStruct((k, E_pad), u_e.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, k, TILE_E), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, TILE_E), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ke_t, u_t)
    return jnp.transpose(out_t, (1, 0))[:E]


def _uniform_kernel(ke_ref, u_ref, out_ref):
    """One tile with a single shared Ke: u (TILE_E, 24) @ ke^T -> (TILE_E, 24).
    Rides the MXU via jnp.dot."""
    out_ref[:] = jnp.dot(
        u_ref[:], ke_ref[:].T, preferred_element_type=u_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def batched_matvec_uniform(ke: jax.Array, u_e: jax.Array, *, interpret: bool = False) -> jax.Array:
    """f_e = u_e @ ke^T with one shared (k, k) Ke — MXU matmul in tiles."""
    E, k = u_e.shape
    pad = (-E) % TILE_E
    if pad:
        u_e = jnp.concatenate([u_e, jnp.zeros((pad, k), u_e.dtype)], axis=0)
    E_pad = E + pad
    grid = (E_pad // TILE_E,)
    out = pl.pallas_call(
        _uniform_kernel,
        out_shape=jax.ShapeDtypeStruct((E_pad, k), u_e.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_E, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_E, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ke.astype(u_e.dtype), u_e)
    return out[:E]
