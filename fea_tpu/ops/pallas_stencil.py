"""Fused Pallas TPU kernel for the structured voxel stencil apply.

The XLA lowering of :func:`ops.structured.stencil_apply_grid` (64
corner-pair shifted multiply-adds with 8 live full-grid accumulators)
moves ~80x the speed-of-light HBM traffic: each of the 64 terms re-reads
its g slice and read-modify-writes a spilled accumulator (measured
1.8-2.5 ms at 1.05M DOF vs a ~31 us read+write floor — docs/PERF.md).
This kernel computes the whole stencil for a TY-row y-slab per grid
step entirely in VMEM: g is read ~(1 + 2/TY)x (the y-halo), f written
once.  Measured on the v5e at 1.05M DOF (f32): 0.86 ms vs 1.05 ms for
the XLA pad-add — correct (1.4e-7 vs the host f64 oracle) and ~1.2x
faster, compiling in seconds.  NOT yet wired into the production solve:
a layout transpose costs ~30 ms, so integration requires the whole
solver pipeline to run in this transposed layout (docs/PERF.md lever 1).

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

__all__ = ["stencil_apply_transposed", "stencil_apply_transposed_dd", "split_ke_dd"]


def _shift_xz(vol: jax.Array, dx: int, dz: int) -> jax.Array:
    """Shift the last two axes: out[..., x, z] = vol[..., x + dx, z + dz],
    zero-filled out of range.  dx, dz in {-1, 0, 1} (static)."""
    nd = vol.ndim
    X, Z = vol.shape[-2], vol.shape[-1]

    def shift(axis: int, d: int, v: jax.Array) -> jax.Array:
        if d == 0:
            return v
        n = v.shape[axis]
        pad = [(0, 0)] * nd
        if d == 1:
            pad[axis] = (0, 1)
            return jnp.pad(jax.lax.slice_in_dim(v, 1, n, axis=axis), pad)
        pad[axis] = (1, 0)
        return jnp.pad(jax.lax.slice_in_dim(v, 0, n - 1, axis=axis), pad)

    return shift(nd - 1, dz, shift(nd - 2, dx, vol))


def _shift_y(vol: jax.Array, dy: int) -> jax.Array:
    """vol (3, TY+2, X, Z) -> (3, TY, X, Z): rows [1+dy, 1+dy+TY)."""
    TY = vol.shape[1] - 2
    return jax.lax.slice_in_dim(vol, 1 + dy, 1 + dy + TY, axis=1)


def _kernel(y_true, ke_ref, gm_ref, g0_ref, gp_ref, out_ref):
    """One output y-block of TY rows: out (3, TY, X, Z) from the three
    TY-row input blocks (previous / current / next — clamped at ends).
    ``y_true`` is the unpadded node count along y (static, via partial)."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    C, TY, X, Z = out_ref.shape
    # stitch rows [i*TY - 1, (i+1)*TY + 1) from the three loaded blocks;
    # clamped end blocks alias the current one — zero their phantom rows
    # via the y existence mask below (global row index arithmetic).
    gm = gm_ref[:, TY - 1 : TY, :, :] * (i > 0).astype(jnp.float32)
    gp = gp_ref[:, 0:1, :, :] * (i < n_blk - 1).astype(jnp.float32)
    vol = jnp.concatenate([gm, g0_ref[:, :, :, :], gp], axis=1)  # (3, TY+2, X, Z)
    # one zero-padded halo volume: every (dy, dx, dz) "shift" below is a
    # pure static slice of it (no per-pair pad/copy chains; hoisting all
    # 27 shifted copies instead overflows the 16 MB VMEM scope)
    vol_p = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)))
    y_glob = i * TY + jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 0)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 2)
    n_y = y_true  # NOT the padded count: phantom rows carry no elements

    acc = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    for a, (az, ay, ax) in enumerate(_CORNERS):
        # element (z - az, y - ay, x - ax) must exist:
        #   0 <= z - az <= Z - 2  etc. (element counts are dim - 1)
        mz = jnp.logical_and(z_iota >= az, z_iota - az <= Z - 2)
        mx = jnp.logical_and(x_iota >= ax, x_iota - ax <= X - 2)
        my = jnp.logical_and(y_glob >= ay, y_glob - ay <= n_y - 2)
        # explicit f32 constants: weak-typed literals become f64 under
        # x64 and Mosaic's f64 conversion rule recurses forever
        mask = jnp.where(
            jnp.logical_and(jnp.logical_and(mz, mx), my),
            jnp.float32(1.0),
            jnp.float32(0.0),
        )
        acc_a = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
        for b, (bz, by, bx) in enumerate(_CORNERS):
            dy, dx, dz = by - ay, bx - ax, bz - az
            src = jax.lax.slice(
                vol_p,
                (0, 1 + dy, 1 + dx, 1 + dz),
                (3, 1 + dy + TY, 1 + dx + X, 1 + dz + Z),
            )
            # 3x3 block contraction: c_out <- sum_cin ke[3a+c_out, 3b+cin]
            for c_out in range(3):
                acc_a[c_out] = acc_a[c_out] + (
                    src[0] * ke_ref[3 * a + c_out, 3 * b + 0]
                    + src[1] * ke_ref[3 * a + c_out, 3 * b + 1]
                    + src[2] * ke_ref[3 * a + c_out, 3 * b + 2]
                )
        for c_out in range(3):
            acc[c_out] = acc[c_out] + mask * acc_a[c_out]
    out_ref[:, :, :, :] = jnp.stack(acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_apply_transposed(ke: jax.Array, gT: jax.Array, *, interpret: bool = False) -> jax.Array:
    """K @ u in transposed grid layout: gT (3, Y, X, Z) f32 -> (3, Y, X, Z).

    Identical (to f32 rounding) to ``stencil_apply_grid`` on the
    corresponding (Z, Y, X, 3) array.
    """
    C, Y, X, Z = gT.shape
    gT = gT.astype(jnp.float32)
    TY = min(4, Y)  # TY=8 overflows the 16 MB VMEM scope at bench size
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    if Y_pad != Y:
        gT = jnp.pad(gT, ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0)))
    spec_blk = lambda off: pl.BlockSpec(  # noqa: E731
        (3, TY, X, Z),
        # every component explicitly int32: under x64, Python-int literals
        # trace as i64 (jnp.clip even recurses) and Mosaic rejects i64
        # index-map returns
        lambda i: (
            jnp.int32(0),
            jax.lax.clamp(jnp.int32(0), (i + off).astype(jnp.int32), jnp.int32(n_blk - 1)),
            jnp.int32(0),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, Y),
        out_shape=jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((24, 24), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM),
            spec_blk(-1),
            spec_blk(0),
            spec_blk(1),
        ],
        out_specs=pl.BlockSpec(
            (3, TY, X, Z),
            lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(ke.astype(jnp.float32), gT, gT, gT)
    return out[:, :Y]


# -- double-f32 ("dd") variant: the f64 apply without emulated f64 ----------
#
# The production solve pays one emulated-f64 stencil apply per FCG
# iteration (17 ms measured — the dominant cost).  This kernel computes
# the same apply from f32 data using error-free transformations:
#
#   Ke (f64)   -> khi + klo (f32 pair), khi -> k1 + k2 (exact 12-bit halves)
#   x  (f64)   -> xhi + xlo (f32 pair), xhi -> s1 + s2 in-kernel (Veltkamp)
#   k*x        =  k1*s1 + k1*s2 + k2*s1 [all EXACT f32 products]
#                 + khi*xlo + klo*xhi  [2^-24-scale, plain f32]
#                 + k2*s2 (~2^-24 of main, dropped)
#
# The exact k1*s1 products accumulate through TwoSum chains (a running
# f32 (hi, lo) pair); the 2^-12-scale and 2^-24-scale parts accumulate in
# a plain f32 side accumulator.  Output = (hi, lo + side) as an f32 pair;
# target apply accuracy ~1e-10 relative — enough for a 1e-8 solver
# tolerance, at a fraction of XLA's emulated-f64 cost.


def _veltkamp_split(a: jax.Array):
    """a -> (a1, a2) with a = a1 + a2 exactly, a1 carrying the top ~12
    bits (splitter 2^12 + 1).  Requires IEEE f32 ops (holds in interpret
    mode; validated on-chip by the accompanying test/probe)."""
    c = jnp.float32(4097.0) * a
    a1 = c - (c - a)
    return a1, a - a1


def _two_sum(hi: jax.Array, lo: jax.Array, x: jax.Array):
    """(hi, lo) + x with error-free hi and accumulated lo."""
    s = hi + x
    bp = s - hi
    err = (hi - (s - bp)) + (x - bp)
    return s, lo + err


def _kernel_dd(y_true, k1_ref, k2_ref, khi_ref, klo_ref,
               hm_ref, h0_ref, hp_ref, lm_ref, l0_ref, lp_ref,
               out_hi_ref, out_lo_ref):
    """dd stencil for one y-slab: inputs are the hi/lo f32 row blocks."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    C, TY, X, Z = out_hi_ref.shape
    edge = ((i > 0).astype(jnp.float32), (i < n_blk - 1).astype(jnp.float32))

    def stitched(m_ref, c_ref, p_ref):
        gm = m_ref[:, TY - 1 : TY, :, :] * edge[0]
        gp = p_ref[:, 0:1, :, :] * edge[1]
        vol = jnp.concatenate([gm, c_ref[:, :, :, :], gp], axis=1)
        return jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)))

    volp_hi = stitched(hm_ref, h0_ref, hp_ref)
    volp_lo = stitched(lm_ref, l0_ref, lp_ref)
    v1p, v2p = _veltkamp_split(volp_hi)

    y_glob = i * TY + jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 0)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 1)
    z_iota = jax.lax.broadcasted_iota(jnp.int32, (TY, X, Z), 2)

    acc_hi = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    acc_lo = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    acc_sm = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    for a, (az, ay, ax) in enumerate(_CORNERS):
        mz = jnp.logical_and(z_iota >= az, z_iota - az <= Z - 2)
        mx = jnp.logical_and(x_iota >= ax, x_iota - ax <= X - 2)
        my = jnp.logical_and(y_glob >= ay, y_glob - ay <= y_true - 2)
        # explicit f32 constants: weak-typed literals become f64 under
        # x64 and Mosaic's f64 conversion rule recurses forever
        mask = jnp.where(
            jnp.logical_and(jnp.logical_and(mz, mx), my),
            jnp.float32(1.0),
            jnp.float32(0.0),
        )
        ah = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
        al = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
        asm = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
        for b, (bz, by, bx) in enumerate(_CORNERS):
            dy, dx, dz = by - ay, bx - ax, bz - az
            lim = (3, 1 + dy + TY, 1 + dx + X, 1 + dz + Z)
            start = (0, 1 + dy, 1 + dx, 1 + dz)
            s1 = jax.lax.slice(v1p, start, lim)
            s2 = jax.lax.slice(v2p, start, lim)
            shi = jax.lax.slice(volp_hi, start, lim)
            slo = jax.lax.slice(volp_lo, start, lim)
            for c_out in range(3):
                for c_in in range(3):
                    k1 = k1_ref[3 * a + c_out, 3 * b + c_in]
                    k2 = k2_ref[3 * a + c_out, 3 * b + c_in]
                    khi = khi_ref[3 * a + c_out, 3 * b + c_in]
                    klo = klo_ref[3 * a + c_out, 3 * b + c_in]
                    # exact main product k1*s1 into the TwoSum chain
                    ah[c_out], al[c_out] = _two_sum(ah[c_out], al[c_out], k1 * s1[c_in])
                    # 2^-12/2^-24-scale parts: plain f32 accumulation
                    asm[c_out] = asm[c_out] + (
                        k1 * s2[c_in] + k2 * shi[c_in]
                        + khi * slo[c_in] + klo * shi[c_in]
                    )
        for c_out in range(3):
            acc_hi[c_out], acc_lo[c_out] = _two_sum(
                acc_hi[c_out], acc_lo[c_out], mask * ah[c_out]
            )
            acc_lo[c_out] = acc_lo[c_out] + mask * al[c_out]
            acc_sm[c_out] = acc_sm[c_out] + mask * asm[c_out]
    out_hi_ref[:, :, :, :] = jnp.stack(acc_hi)
    out_lo_ref[:, :, :, :] = jnp.stack([l + s for l, s in zip(acc_lo, acc_sm)])


def split_ke_dd(ke64: "np.ndarray"):
    """Host-side split of the f64 Ke into (k1, k2, khi, klo) f32 arrays:
    khi + klo == ke64 (to f64 rounding), k1 + k2 == khi exactly with k1
    carrying the top ~12 bits (so k1*s1 products are exact in f32)."""
    import numpy as np

    ke64 = np.asarray(ke64, np.float64)
    khi = ke64.astype(np.float32)
    klo = (ke64 - khi).astype(np.float32)
    c = np.float32(4097.0) * khi
    k1 = c - (c - khi)
    k2 = khi - k1
    return k1, k2, khi, klo


@functools.partial(jax.jit, static_argnames=("interpret",))
def stencil_apply_transposed_dd(
    k1: jax.Array,
    k2: jax.Array,
    khi: jax.Array,
    klo: jax.Array,
    gT_hi: jax.Array,
    gT_lo: jax.Array,
    *,
    interpret: bool = False,
):
    """~f64-accurate K @ u from f32 pairs, transposed layout.

    Inputs: the four (24,24) f32 Ke splits from :func:`split_ke_dd` and
    the state as an f32 pair (gT_hi = f32(x), gT_lo = f32(x - gT_hi)),
    both (3, Y, X, Z).  Returns (f_hi, f_lo) f32 pair with
    f_hi + f_lo ~= A_f64(x) to ~1e-11 relative.
    """
    C, Y, X, Z = gT_hi.shape
    TY = min(2, Y)
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    if Y_pad != Y:
        pad = ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0))
        gT_hi = jnp.pad(gT_hi, pad)
        gT_lo = jnp.pad(gT_lo, pad)
    spec_blk = lambda off: pl.BlockSpec(  # noqa: E731
        (3, TY, X, Z),
        # every component explicitly int32: under x64, Python-int literals
        # trace as i64 (jnp.clip even recurses) and Mosaic rejects i64
        # index-map returns
        lambda i: (
            jnp.int32(0),
            jax.lax.clamp(jnp.int32(0), (i + off).astype(jnp.int32), jnp.int32(n_blk - 1)),
            jnp.int32(0),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    spec_ke = pl.BlockSpec((24, 24), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM)
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_kernel_dd, Y),
        out_shape=(
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        ),
        grid=(n_blk,),
        in_specs=[spec_ke] * 4
        + [spec_blk(-1), spec_blk(0), spec_blk(1)] * 2,
        out_specs=(
            pl.BlockSpec(
                (3, TY, X, Z),
                lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, TY, X, Z),
                lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ),
        # the unrolled EFT body keeps many temporaries live; raise the
        # scoped-VMEM budget (default 16M) toward the physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        k1.astype(jnp.float32), k2.astype(jnp.float32),
        khi.astype(jnp.float32), klo.astype(jnp.float32),
        gT_hi, gT_hi, gT_hi, gT_lo, gT_lo, gT_lo,
    )
    return out_hi[:, :Y], out_lo[:, :Y]
