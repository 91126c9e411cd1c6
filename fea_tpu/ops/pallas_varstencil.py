"""Pallas TPU kernels for the VARIABLE-coefficient 27-offset block
stencil (the curvilinear / topologically-structured mesh apply).

Why these exist: every XLA lowering tried for

    y[n] = sum_{d in 27} W_d[n] @ x[n + d]        (3x3 blocks per node)

is catastrophically far from the HBM floor on TPU — measured at 182k
DOF: 55 ms (einsum, f32), 98 ms (plane-major elementwise), 161 ms
(product-reduce), 525 ms (einsum f64) against a ~0.1 ms traffic floor —
and the fused elementwise-chain forms additionally MISCOMPILE
(shape-dependent wrong results / NaN; see ops/curvilinear.py
curv_apply_grid).  The fix is the same as the constant-coefficient
flagship's (ops/pallas_stencil.py): a fused kernel that streams the
state once and accumulates the 27 shifted multiply-adds in VMEM — with
the (125, 3, 3) weight TABLE replaced by per-node weight FIELDS
``(27, 3, 3, Y, X, Z)``, blocked along Y with the state.

Massive simplification vs the constant-Ke kernels: ASSEMBLED weights
already encode every boundary (they are zero toward non-existent
neighbors), so there are NO phantom-element corrections, no
inclusion-exclusion pieces, no boundary tables — the kernel is just the
interior form with zero padding.

Layout: component-major transposed ``(3, Y, X, Z)`` with Z on the
128-wide lanes, exactly like pallas_stencil; weight fields are
``(27, 3, 3, Y, X, Z)`` so each (offset, row, col) plane is contiguous.

Two kernels:
  * f32 (:func:`var_apply_transposed`) — the V-cycle workhorse;
  * double-f32 (:func:`var_apply_transposed_dd`) — the f64-accurate
    in-loop apply from f32 (hi, lo) pairs, same error-free-
    transformation scheme as ``stencil_apply_transposed_dd`` (exact
    12-bit-split main products through a TwoSum chain, small parts in a
    plain f32 side accumulator; ~1e-11 relative vs the f64 oracle).

Equivalence with the host oracle is tested in tests/test_curvilinear.py
(interpreter mode on CPU) and on-chip by tools/curv_bench.py's
certification step.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "VarTables",
    "VarTablesDD",
    "var_fields_f32",
    "var_fields_dd",
    "var_apply_transposed",
    "var_apply_transposed_dd",
    "var_kernel_ty",
]

# the 27 node offsets in (dz, dy, dx) order — identical enumeration to
# ops.curvilinear._OFFSETS, so field index d couples node n to n + d
_OFFSETS = tuple(
    (dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VarTables:
    w: jax.Array  # (27, 3, 3, Y, X, Z) f32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VarTablesDD:
    # only the value pair ships to the kernel; the exact 12-bit halves
    # (w1, w2) are recomputed IN-KERNEL by a Veltkamp split — passing
    # them as fields doubled the dominant VMEM/HBM cost and OOMed the
    # 812k grid (107 MB scoped vmem vs the 100 MB limit)
    whi: jax.Array  # f32(W64)
    wlo: jax.Array  # f32(W64 - whi)


@jax.jit
def _to_field(w):
    # (27, Z, Y, X, 3, 3) -> (27, r, c, Y, X, Z)
    return jnp.transpose(w, (0, 4, 5, 2, 3, 1))


def var_fields_f32(w) -> VarTables:
    """Weight field for the f32 kernel from the flat-layout
    (27, Z, Y, X, 3, 3) array (any float dtype)."""
    return VarTables(w=_to_field(w).astype(jnp.float32))


def var_fields_dd(w64, *, host_split: bool | None = None) -> VarTablesDD:
    """dd weight fields from the f64 flat-layout array (value pair only;
    the exact 12-bit Veltkamp halves are formed in-kernel — Pallas
    kernels compile their own arithmetic, outside XLA:CPU's
    FMA-contraction hazard)."""
    if host_split is None:
        host_split = jax.default_backend() != "tpu"
    if host_split:
        w_np = np.asarray(w64, np.float64)
        whi = w_np.astype(np.float32)
        wlo = (w_np - whi).astype(np.float32)
        return VarTablesDD(
            whi=_to_field(jnp.asarray(whi)), wlo=_to_field(jnp.asarray(wlo)),
        )
    return _var_fields_dd_dev(w64)


@jax.jit
def _var_fields_dd_dev(w64):
    wT = _to_field(w64)
    whi = wT.astype(jnp.float32)
    wlo = (wT - whi.astype(jnp.float64)).astype(jnp.float32)
    return VarTablesDD(whi=whi, wlo=wlo)


def var_kernel_ty(X: int, Z: int, n_fields: int, *, budget_bytes=40 * 1024 * 1024,
                  ty_max: int = 8) -> int:
    """Largest y-slab row count whose weight blocks fit the VMEM budget
    (the weight fields dominate: n_fields * 243 * TY * X * Z * 4 bytes)."""
    per_row = n_fields * 243 * X * Z * 4
    return max(1, min(ty_max, budget_bytes // max(per_row, 1)))


def _y_specs(TY, X, Zin, n_blk):
    spec_blk = lambda off: pl.BlockSpec(  # noqa: E731
        (3, TY, X, Zin),
        # explicitly int32: under x64 Python-int literals trace as i64
        # and Mosaic rejects i64 index-map returns (pallas_stencil note)
        lambda i: (
            jnp.int32(0),
            jax.lax.clamp(jnp.int32(0), (i + off).astype(jnp.int32), jnp.int32(n_blk - 1)),
            jnp.int32(0),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    spec_w = pl.BlockSpec(
        (27, 3, 3, TY, X, Zin),
        lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                   i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    spec_out = pl.BlockSpec(
        (3, TY, X, Zin),
        lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    return spec_blk, spec_w, spec_out


def _kernel_var27(w_ref, gm_ref, g0_ref, gp_ref, out_ref):
    """f32 variable-weight 27-offset apply for one TY-row y-slab."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    C, TY, X, Z = out_ref.shape
    gm = gm_ref[:, TY - 1 : TY, :, :] * (i > 0).astype(jnp.float32)
    gp = gp_ref[:, 0:1, :, :] * (i < n_blk - 1).astype(jnp.float32)
    vol = jnp.concatenate([gm, g0_ref[:, :, :, :], gp], axis=1)
    vol_p = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1)))

    acc = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    for o, (dz, dy, dx) in enumerate(_OFFSETS):
        src = jax.lax.slice(
            vol_p, (0, 1 + dy, 1 + dx, 1 + dz),
            (3, 1 + dy + TY, 1 + dx + X, 1 + dz + Z),
        )
        for c_out in range(3):
            acc[c_out] = acc[c_out] + (
                src[0] * w_ref[o, c_out, 0]
                + src[1] * w_ref[o, c_out, 1]
                + src[2] * w_ref[o, c_out, 2]
            )
    out_ref[:, :, :, :] = jnp.stack(acc)


def var_apply_transposed(tables: VarTables, gT: jax.Array, *,
                         interpret: bool = False) -> jax.Array:
    """Variable-weight K @ u, transposed layout: gT (3, Y, X, Z) f32 ->
    (3, Y, X, Z) f32.  Boundary behavior comes from the assembled
    weights (zero toward absent neighbors) — exact, no corrections."""
    C, Y, X, Z = gT.shape
    gT = gT.astype(jnp.float32)
    # scoped VMEM ~= 4x the weight block (double buffering + temps):
    # a 25.7 MB block measured 106 MB scoped and OOMed the 100 MB limit
    TY = var_kernel_ty(X, Z, 1, budget_bytes=16 * 1024 * 1024)
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    gp = jnp.pad(gT, ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0))) if Y_pad != Y else gT
    w = tables.w
    if Y_pad != Y:
        w = jnp.pad(w, ((0, 0),) * 3 + ((0, Y_pad - Y), (0, 0), (0, 0)))
    spec_blk, spec_w, spec_out = _y_specs(TY, X, Z, n_blk)
    out = pl.pallas_call(
        _kernel_var27,
        out_shape=jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        grid=(n_blk,),
        in_specs=[spec_w, spec_blk(-1), spec_blk(0), spec_blk(1)],
        out_specs=spec_out,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(w, gp, gp, gp)
    return out[:, :Y]


def _veltkamp_split(a):
    c = jnp.float32(4097.0) * a
    a1 = c - (c - a)
    return a1, a - a1


def _two_sum(hi, lo, x):
    s = hi + x
    bp = s - hi
    err = (hi - (s - bp)) + (x - bp)
    return s, lo + err


def _kernel_var27_dd(whi_ref, wlo_ref,
                     hm_ref, h0_ref, hp_ref, lm_ref, l0_ref, lp_ref,
                     out_hi_ref, out_lo_ref):
    """Variable-weight dd apply: exact main products (12-bit splits of
    weights AND state) through a TwoSum chain, 2^-12-scale parts in a
    plain f32 side accumulator — the ops/pallas_stencil EFT scheme with
    array-valued weights."""
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

    ahi = [None, None, None]
    alo = [None, None, None]
    asm = [None, None, None]
    for o, (dz, dy, dx) in enumerate(_OFFSETS):
        start = (0, 1 + dy, 1 + dx, 1 + dz)
        lim = (3, 1 + dy + TY, 1 + dx + X, 1 + dz + Z)
        s1 = jax.lax.slice(v1p, start, lim)
        s2 = jax.lax.slice(v2p, start, lim)
        shi = jax.lax.slice(volp_hi, start, lim)
        slo = jax.lax.slice(volp_lo, start, lim)
        for c_out in range(3):
            for c_in in range(3):
                whi = whi_ref[o, c_out, c_in]
                wlo = wlo_ref[o, c_out, c_in]
                w1, w2 = _veltkamp_split(whi)
                main = w1 * s1[c_in]
                if ahi[c_out] is None:
                    ahi[c_out] = main
                    alo[c_out] = jnp.zeros_like(main)
                    asm[c_out] = jnp.zeros_like(main)
                else:
                    ahi[c_out], alo[c_out] = _two_sum(ahi[c_out], alo[c_out], main)
                asm[c_out] = asm[c_out] + (
                    w1 * s2[c_in] + w2 * shi[c_in]
                    + whi * slo[c_in] + wlo * shi[c_in]
                )
    out_hi_ref[:, :, :, :] = jnp.stack(ahi)
    out_lo_ref[:, :, :, :] = jnp.stack([l + s for l, s in zip(alo, asm)])


def var_apply_transposed_dd(tables: VarTablesDD, gT_hi: jax.Array,
                            gT_lo: jax.Array, *, interpret: bool = False):
    """~f64-accurate variable-weight K @ u from f32 (hi, lo) pairs,
    transposed layout -> (f_hi, f_lo) pair (~1e-11 relative vs the f64
    oracle, boundaries included via the assembled weights)."""
    C, Y, X, Z = gT_hi.shape
    TY = var_kernel_ty(X, Z, 2, budget_bytes=20 * 1024 * 1024, ty_max=2)
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    ghi, glo = gT_hi, gT_lo
    pads = ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0))
    if Y_pad != Y:
        ghi = jnp.pad(ghi, pads)
        glo = jnp.pad(glo, pads)
    wpad = ((0, 0),) * 3 + ((0, Y_pad - Y), (0, 0), (0, 0))
    whi, wlo = tables.whi, tables.wlo
    if Y_pad != Y:
        whi, wlo = jnp.pad(whi, wpad), jnp.pad(wlo, wpad)
    spec_blk, spec_w, spec_out = _y_specs(TY, X, Z, n_blk)
    out_hi, out_lo = pl.pallas_call(
        _kernel_var27_dd,
        out_shape=(
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        ),
        grid=(n_blk,),
        in_specs=[spec_w] * 2 + [spec_blk(-1), spec_blk(0), spec_blk(1)] * 2,
        out_specs=(spec_out, spec_out),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(whi, wlo, ghi, ghi, ghi, glo, glo, glo)
    return out_hi[:, :Y], out_lo[:, :Y]
