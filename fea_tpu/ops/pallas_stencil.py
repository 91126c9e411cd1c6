"""Fused Pallas TPU kernel for the structured voxel stencil apply.

The XLA lowering of :func:`ops.structured.stencil_apply_grid` (64
corner-pair shifted multiply-adds with 8 live full-grid accumulators)
moves ~80x the speed-of-light HBM traffic: each of the 64 terms re-reads
its g slice and read-modify-writes a spilled accumulator (measured
1.8-2.5 ms at 1.05M DOF vs a ~31 us read+write floor — docs/PERF.md).
This kernel computes the whole stencil for one y-row of the grid per
grid step entirely in VMEM: g is read ~3x (the y-halo), f written once.

Layout: component-major transposed, ``gT (3, Y, X, Z)`` — Z (the long
axis) rides the 128-wide lanes, X the sublanes; z/x shifts are in-VMEM
slices and the y shift picks one of the three loaded rows.  The wrapper
:func:`stencil_apply_transposed` takes/returns this layout; callers
transpose once around whole pipelines, not per apply.

Boundary conditions: corner-pair masking, exactly like the reference
form — the element (n - ca) must exist.  z/x masks are iota comparisons
baked per corner; the y mask is a scalar from the grid position.

Equivalence with the XLA path is tested in tests/test_pallas.py
(interpreter mode on CPU) and on-chip by tools/tpu_check.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import _CORNERS

__all__ = ["stencil_apply_transposed"]


def _shift_xz(plane: jax.Array, dx: int, dz: int) -> jax.Array:
    """plane (3, X, Z) shifted so out[x, z] = plane[x + dx, z + dz],
    zero-filled out of range.  dx, dz in {-1, 0, 1} (static)."""
    C, X, Z = plane.shape
    out = plane
    if dx == 1:
        out = jnp.pad(out[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    elif dx == -1:
        out = jnp.pad(out[:, : X - 1, :], ((0, 0), (1, 0), (0, 0)))
    if dz == 1:
        out = jnp.pad(out[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    elif dz == -1:
        out = jnp.pad(out[:, :, : Z - 1], ((0, 0), (0, 0), (1, 0)))
    return out


def _kernel(ke_ref, gm_ref, g0_ref, gp_ref, out_ref):
    """One output y-row: out (3, 1, X, Z) from rows y-1, y, y+1."""
    y = pl.program_id(0)
    n_y = pl.num_programs(0)
    # clamped halo rows must not contribute at the y boundaries
    rows = {
        -1: gm_ref[:, 0, :, :] * (y > 0).astype(jnp.float32),
        0: g0_ref[:, 0, :, :],
        1: gp_ref[:, 0, :, :] * (y < n_y - 1).astype(jnp.float32),
    }
    C, X, Z = rows[0].shape
    # all 27 shifted source planes, hoisted out of the corner-pair loops
    shifted = {
        (dy, dx, dz): _shift_xz(rows[dy], dx, dz)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        for dz in (-1, 0, 1)
    }
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (X, Z), 0)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (X, Z), 1)

    acc = [jnp.zeros((X, Z), jnp.float32) for _ in range(3)]
    for a, (az, ay, ax) in enumerate(_CORNERS):
        # element (z - az, y - ay, x - ax) must exist:
        #   0 <= z - az <= Z - 2  etc. (element counts are dim - 1)
        mz = jnp.logical_and(z_iota >= az, z_iota - az <= Z - 2)
        mx = jnp.logical_and(x_iota >= ax, x_iota - ax <= X - 2)
        # y existence is scalar per grid step
        my = jnp.logical_and(y >= ay, y - ay <= n_y - 2).astype(jnp.float32)
        mask = my * jnp.where(jnp.logical_and(mz, mx), 1.0, 0.0).astype(jnp.float32)
        acc_a = [jnp.zeros((X, Z), jnp.float32) for _ in range(3)]
        for b, (bz, by, bx) in enumerate(_CORNERS):
            src = shifted[(by - ay, bx - ax, bz - az)]
            # 3x3 block contraction: c_out <- sum_cin ke[3a+c_out, 3b+cin]
            for c_out in range(3):
                acc_a[c_out] = acc_a[c_out] + (
                    src[0] * ke_ref[3 * a + c_out, 3 * b + 0]
                    + src[1] * ke_ref[3 * a + c_out, 3 * b + 1]
                    + src[2] * ke_ref[3 * a + c_out, 3 * b + 2]
                )
        for c_out in range(3):
            acc[c_out] = acc[c_out] + mask * acc_a[c_out]
    out_ref[:, 0, :, :] = jnp.stack(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_apply_transposed(ke: jax.Array, gT: jax.Array, *, interpret: bool = False) -> jax.Array:
    """K @ u in transposed grid layout: gT (3, Y, X, Z) f32 -> (3, Y, X, Z).

    Identical (to f32 rounding) to ``stencil_apply_grid`` on the
    corresponding (Z, Y, X, 3) array.
    """
    C, Y, X, Z = gT.shape
    gT = gT.astype(jnp.float32)
    spec_row = lambda off: pl.BlockSpec(  # noqa: E731
        (3, 1, X, Z),
        lambda y: (0, jnp.clip(y + off, 0, Y - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, Y, X, Z), jnp.float32),
        grid=(Y,),
        in_specs=[
            pl.BlockSpec((24, 24), lambda y: (0, 0), memory_space=pltpu.VMEM),
            spec_row(-1),
            spec_row(0),
            spec_row(1),
        ],
        out_specs=pl.BlockSpec(
            (3, 1, X, Z), lambda y: (0, y, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(ke.astype(jnp.float32), gT, gT, gT)
