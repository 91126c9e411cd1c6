"""Geometric multigrid preconditioner for the structured voxel operator.

Jacobi-PCG iteration counts on elasticity grow like O(1/h) with mesh
refinement — thousands of iterations at 10^6 DOF.  On a voxel grid the
classical geometric multigrid hierarchy is essentially free to construct
and every component maps onto dense TPU primitives:

  * level operators: the fine 24x24 reference Ke scaled by 2x per
    coarsening (hex8 elasticity Ke is exactly linear in h under uniform
    scaling — pinned by test) applied through the shared stencil kernel
    (ops.structured.stencil_apply_grid);
  * prolongation: trilinear interpolation = three axis-wise passes of
    [1/2, 1, 1/2] stencils (pure slicing);
  * restriction: the exact adjoint P^T (FEM residual restriction);
  * smoother: Chebyshev polynomial on the Jacobi-scaled operator,
    targeting [lambda_max/6, lambda_max] where lambda_max is a CERTIFIED
    Gershgorin upper bound computed on the host (see
    ``_gershgorin_lam_max``).  Round 1 used 15-step power iteration with
    a 1.1 safety factor; measured at the 16x16x160 level the estimate was
    2.785 against a true lambda_max of 3.087 — 1.1 * 2.785 = 3.06 < 3.087,
    so the Chebyshev window EXCLUDED the top of the spectrum and the
    smoother amplified those modes, which is exactly the scale-dependent
    divergence BENCH_r01 hit at 1M DOF.  The Gershgorin bound (5.36 for
    this element, ~1.74x the true value) can never under-estimate; the
    wider window costs ~2 extra MG-PCG iterations (measured) and buys
    unconditional smoother stability.  (Plain damped Jacobi is NOT stable
    here either: lambda_max(D^-1 A) ~ 3.1 for hex8 elasticity, so the
    usual omega = 0.7 diverges — measured before this was switched.)
  * coarsest level: a precomputed dense inverse of the masked matrix,
    assembled directly on the host in f64 NumPy.

The entire hierarchy is built on the HOST (NumPy): no device dispatches,
no TPU numerics, nothing re-traced — construction is milliseconds even
when re-run inside every benchmark repeat.

Boundary conditions coarsen by even-index subsampling of the fine free
mask; because fixed DOFs carry identity rows and zero residuals, the
V-cycle preserves them exactly.  With equal pre/post Jacobi sweeps the
V-cycle is a fixed symmetric positive-definite linear operator, so it is
a valid PCG preconditioner.

Everything is jit-compatible; the recursion over levels is unrolled in
Python at trace time (level count is static).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..elements import hex8 as hex8_el
from ..materials import Material
from .structured import (
    StructuredOperator,
    corner_table_np,
    fill_regions_np,
    stencil_apply_grid,
)

__all__ = ["MultigridPreconditioner", "build_multigrid", "coarsen_dims", "chebyshev_smooth"]


def chebyshev_smooth(apply_fn, inv_diag, lam_max, lam_min_frac, degree, x, r):
    """Chebyshev smoothing on the Jacobi-scaled operator (standard
    d-vector recurrence, as in hypre/PETSc), ``degree`` applications of
    ``apply_fn`` per call.  Layout-agnostic: shared by the flat-grid
    V-cycle below and the transposed-layout one (ops.transposed).

    The recurrence runs as a ``lax.scan`` over a precomputed scalar
    coefficient schedule (``d_k = a_k d_{k-1} + b_k z_k``, ``a_0 = 0``),
    so the traced program embeds ONE ``apply_fn`` instance per smooth
    instead of ``degree`` — with the fused Pallas stencil as the apply,
    an unrolled degree-4 V-cycle serialized ~9 kernel bodies per level
    into the executable, which tripled both cold-compile time and the
    persistent-cache entry that must stream through the TPU tunnel on
    every fresh process (docs/PERF.md "Compile-time behavior")."""
    lam_max = (lam_max * 1.0).astype(x.dtype)
    lam_min = lam_max * lam_min_frac
    theta = 0.5 * (lam_max + lam_min)
    delta = 0.5 * (lam_max - lam_min)
    sigma = theta / delta
    inv_d = inv_diag.astype(x.dtype)

    # data-independent scalar schedule (traced scalars, zero kernels)
    rho = 1.0 / sigma
    a_k = [jnp.zeros_like(theta)]
    b_k = [1.0 / theta]
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        a_k.append(rho_new * rho)
        b_k.append(2.0 * rho_new / delta)
        rho = rho_new

    def body(carry, ab):
        xc, dc = carry
        a, b = ab
        z = inv_d * (r - apply_fn(xc))
        dc = a * dc + b * z
        return (xc + dc, dc), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), (jnp.stack(a_k), jnp.stack(b_k)))
    return x


def coarsen_dims(dims: tuple[int, int, int]) -> Optional[tuple[int, int, int]]:
    """Halve element counts; None when any axis is odd or would vanish."""
    if any(d % 2 or d < 2 for d in dims):
        return None
    return tuple(d // 2 for d in dims)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Level:
    ke: jax.Array  # (24, 24) reference Ke for this level's element size
    free: jax.Array  # (Z, Y, X, 3) free mask grid
    inv_diag: jax.Array  # (Z, Y, X, 3) 1 / diag of the MASKED operator
    lam_max: jax.Array  # () estimated lambda_max of D^-1 A (masked)
    dims: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))

    def apply(self, g: jax.Array) -> jax.Array:
        """Masked operator in grid space."""
        F = self.free.astype(g.dtype)
        return F * stencil_apply_grid(self.ke, F * g, self.dims) + (1.0 - F) * g


def _prolong(c: jax.Array, axes: tuple[int, int, int] = (0, 1, 2)) -> jax.Array:
    """Trilinear interpolation: coarse grid (Zc,Yc,Xc,3) -> fine grid
    (2Zc-1, 2Yc-1, 2Xc-1, 3); axis-wise [1/2, 1, 1/2].  ``axes`` selects
    the three spatial axes (the transposed layout passes (1, 2, 3))."""

    def interp_axis(a, axis):
        n = a.shape[axis]
        out_shape = list(a.shape)
        out_shape[axis] = 2 * n - 1
        out = jnp.zeros(out_shape, a.dtype)
        sl_even = [slice(None)] * a.ndim
        sl_even[axis] = slice(0, None, 2)
        out = out.at[tuple(sl_even)].set(a)
        lo = [slice(None)] * a.ndim
        hi = [slice(None)] * a.ndim
        lo[axis] = slice(0, n - 1)
        hi[axis] = slice(1, n)
        mid = 0.5 * (a[tuple(lo)] + a[tuple(hi)])
        sl_odd = [slice(None)] * a.ndim
        sl_odd[axis] = slice(1, None, 2)
        return out.at[tuple(sl_odd)].set(mid)

    out = c
    for ax in axes:
        out = interp_axis(out, ax)
    return out


def _restrict(f: jax.Array, axes: tuple[int, int, int] = (0, 1, 2)) -> jax.Array:
    """Exact adjoint of _prolong: c[i] = f[2i] + (f[2i-1] + f[2i+1]) / 2."""

    def adj_axis(a, axis):
        sl = lambda s: tuple(s if d == axis else slice(None) for d in range(a.ndim))
        even = a[sl(slice(0, None, 2))]
        odd = a[sl(slice(1, None, 2))]
        n_c = even.shape[axis]
        # odd fine points contribute half to both coarse neighbors
        pad_lo = [(0, 0)] * a.ndim
        pad_lo[axis] = (1, 0)
        pad_hi = [(0, 0)] * a.ndim
        pad_hi[axis] = (0, 1)
        return even + 0.5 * (jnp.pad(odd, pad_lo) + jnp.pad(odd, pad_hi))

    out = f
    for ax in reversed(axes):
        out = adj_axis(out, ax)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """V-cycle preconditioner z = M^-1 r for the masked structured operator.

    Callable on flat (N, 3) residuals (the shape PCG works in).
    """

    levels: tuple[_Level, ...]
    coarse_inv: jax.Array  # (nc, nc) dense inverse of coarsest masked A
    # degree 4 measured best end-to-end on the v5e: the costlier V-cycle
    # saves an FCG iteration (11 vs 12) and each iteration carries a ~29 ms
    # f64 apply, so fewer iterations win (docs/PERF.md cost model).
    degree: int = dataclasses.field(metadata=dict(static=True), default=4)
    # lam_max is a certified upper bound (Gershgorin), so the window top
    # needs no safety factor; 1/6 (vs the textbook 1/4) re-covers the low
    # end the ~1.74x over-estimate would otherwise leave to the coarse grid.
    lam_min_frac: float = dataclasses.field(metadata=dict(static=True), default=1.0 / 6.0)
    lam_max_safety: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    def _smooth(self, level: _Level, x: jax.Array, r: jax.Array) -> jax.Array:
        return chebyshev_smooth(
            level.apply,
            level.inv_diag,
            level.lam_max * self.lam_max_safety,
            self.lam_min_frac,
            self.degree,
            x,
            r,
        )

    def _vcycle(self, idx: int, r: jax.Array) -> jax.Array:
        level = self.levels[idx]
        if idx == len(self.levels) - 1:
            flat = r.reshape(-1)
            return (self.coarse_inv.astype(r.dtype) @ flat).reshape(r.shape)
        z = self._smooth(level, jnp.zeros_like(r), r)
        coarse = self.levels[idx + 1]
        c_dtype = coarse.ke.dtype  # levels may run at different precisions
        rc = coarse.free * _restrict(r - level.apply(z)).astype(c_dtype)
        zc = self._vcycle(idx + 1, rc)
        Ff = level.free.astype(r.dtype)
        z = z + Ff * _prolong(coarse.free * zc).astype(r.dtype)
        return self._smooth(level, z, r)

    def __call__(self, r_flat: jax.Array) -> jax.Array:
        g = r_flat.reshape(self.levels[0].free.shape)
        return self._vcycle(0, g).reshape(r_flat.shape)


def _reference_ke_np(hx: float, hy: float, hz: float, material: Material) -> np.ndarray:
    corners = np.array(
        [
            [0, 0, 0], [hx, 0, 0], [hx, hy, 0], [0, hy, 0],
            [0, 0, hz], [hx, 0, hz], [hx, hy, hz], [0, hy, hz],
        ],
        dtype=np.float64,
    )
    # O(1) work: pure host NumPy (tiny-shape eager programs compile
    # pathologically slowly on the tunneled TPU backend)
    return hex8_el.stiffness_matrix_np(corners, material)


def _gershgorin_lam_max(ke_np: np.ndarray) -> float:
    """Certified upper bound on lambda_max of D^-1 A (masked), host-side.

    Gershgorin on the Jacobi-scaled operator: lambda_max <= max_i
    (sum_j |A_ij|) / D_ii.  Row sums of |A| are over-counted as
    sum_e sum_j |Ke_ij| (triangle inequality, so still an upper bound)
    and on a uniform voxel box both the row sums and the diagonal are
    constant over the 27 boundary-class regions — so the bound is pure
    O(1) table math, no grid arrays.  The max runs over ALL regions
    regardless of the BC mask (masked rows are identity, lambda = 1;
    masked columns only shrink true row sums), so it can never
    under-estimate — Chebyshev smoothing diverges when the window top
    sits below the true lambda_max (the BENCH_r01 failure).  Scale
    invariance (Ke -> 2 Ke) makes it level-independent.
    """
    ke64 = np.asarray(ke_np, np.float64)
    rowsum_tab = corner_table_np(np.abs(ke64).sum(axis=1))
    diag_tab = corner_table_np(np.ascontiguousarray(np.diagonal(ke64)))
    return float(max((rowsum_tab / diag_tab).max(), 1.0))


def _assemble_coarse_dense_np(ke_np: np.ndarray, free_np: np.ndarray, dims) -> np.ndarray:
    """Dense masked stiffness of a coarse level, assembled on the host.

    Node ordering matches the stencil's grid flattening (z layer-major,
    y rows, x fastest — the box_hex_mesh convention), so a flat grid
    vector multiplies this matrix directly.  f64 throughout.
    """
    from ..mesh import box_hex_mesh

    _, elements = box_hex_mesh(*dims, 1.0, 1.0, 1.0)
    n_dof = free_np.size
    ke64 = np.asarray(ke_np, np.float64)
    A = np.zeros((n_dof, n_dof))
    for el in elements:
        dof = (3 * el[:, None] + np.arange(3)).ravel()
        A[np.ix_(dof, dof)] += ke64
    f = free_np.reshape(-1).astype(np.float64)
    A = A * f[:, None] * f[None, :]
    A[np.diag_indices_from(A)] += 1.0 - f
    return A


def _build_hierarchy_host(
    op: StructuredOperator,
    *,
    coarse_dof_limit: int = 3000,
    max_levels: int = 10,
    dtype=jnp.float32,
    small_level_dof: int = 100_000,
    free_np: Optional[np.ndarray] = None,
    grids: bool = True,
) -> tuple[list[dict], np.ndarray]:
    """Host-side (NumPy) hierarchy construction shared by the flat-grid
    and transposed-layout preconditioners.

    Returns (levels, coarse_inv) where each level is a dict of NumPy
    arrays ``{ke, free, inv_diag, inv_tab, lam, dims, dtype}`` in the
    flat (Z, Y, X, 3) grid layout; packing (device transfer, optional
    layout transpose) is the caller's job.  Entirely host-side: no
    device dispatches, no TPU numerics, nothing re-traced —
    construction is milliseconds even when re-run inside every
    benchmark repeat.

    With ``grids=False`` the full-grid ``inv_diag`` fills are skipped
    (``inv_diag`` is None; the per-level region table ``inv_tab`` and
    the subsampled ``free`` views are still present) — for callers that
    derive the level grids on DEVICE from the fine mask
    (``transposed._pack_levels_T``), where shipping ~10 MB of host
    grids through the tunnel costs more than the whole hierarchy math.
    """
    from ..dtypes import x64_enabled

    small_dtype = jnp.float64 if x64_enabled() else dtype
    levels: list[dict] = []
    dims = op.dims
    if free_np is None:
        # device -> host pull of the fine mask (~25 MB at 1M DOF through
        # the TPU tunnel); callers that hold the mask host-side (the
        # benchmark, solve()) pass ``free_np`` to skip it
        free_np = np.asarray(op.free, np.float64)
    free_np = np.asarray(free_np, np.float64).reshape(op.grid_shape + (3,))
    level_idx = 0
    ke_np = None
    while True:
        n_dof_level = 3 * (dims[0] + 1) * (dims[1] + 1) * (dims[2] + 1)
        level_dtype = dtype if (level_idx == 0 or n_dof_level >= small_level_dof) else small_dtype
        # Uniform coarsening doubles every edge; hex8 elasticity Ke scales
        # exactly linearly in h (B ~ 1/h, detJ ~ h^3 => B^T C B detJ ~ h),
        # so each level's Ke is 2x the finer one — verified exact vs
        # re-integration.  One host integration total (from op.ke).
        ke_np = np.asarray(op.ke, np.float64) if level_idx == 0 else 2.0 * ke_np
        if level_idx == 0:
            # both are scale-invariant region-table quantities: the
            # Gershgorin bound is O(1), and 1/diag scales by exactly
            # 0.5 per level (Ke doubles) — no per-level grid passes
            lam = _gershgorin_lam_max(ke_np)
            inv_diag_tab = 1.0 / corner_table_np(np.ascontiguousarray(np.diagonal(ke_np)))
        else:
            inv_diag_tab = 0.5 * inv_diag_tab
        # one full-grid write (region fill) + one masked-select pass
        inv_diag = (
            np.where(free_np > 0, fill_regions_np(inv_diag_tab, dims), 1.0)
            if grids
            else None
        )
        levels.append(
            dict(
                ke=ke_np,
                free=free_np,
                inv_diag=inv_diag,
                inv_tab=inv_diag_tab,
                lam=lam,
                dims=dims,
                dtype=level_dtype,
            )
        )
        nxt = coarsen_dims(dims)
        if nxt is None or n_dof_level <= coarse_dof_limit or level_idx + 1 >= max_levels:
            break
        dims = nxt
        free_np = free_np[::2, ::2, ::2]  # even-index subsampling of BCs
        level_idx += 1

    # dense f64 inverse of the coarsest masked operator, assembled directly
    # on the host (same Ke, same masking -> consistent with the stencil)
    A_c = _assemble_coarse_dense_np(levels[-1]["ke"], free_np, levels[-1]["dims"])
    return levels, np.linalg.inv(A_c)


def build_multigrid(
    op: StructuredOperator,
    spacing=None,
    material: Optional[Material] = None,
    *,
    degree: int = 4,
    coarse_dof_limit: int = 3000,
    max_levels: int = 10,
    dtype=jnp.float32,
    small_level_dof: int = 100_000,
    free_np: Optional[np.ndarray] = None,
) -> MultigridPreconditioner:
    """Construct the hierarchy under a fine-level structured operator.

    Coarsening stops when an axis count goes odd or the level drops under
    ``coarse_dof_limit`` DOFs, where a dense masked inverse is taken.
    ``spacing`` and ``material`` are accepted for backward compatibility
    and ignored: uniform coarsening scales the hex8 Ke exactly linearly,
    so every level's matrix derives from ``op.ke`` (see
    ``_build_hierarchy_host``).

    Levels below ``small_level_dof`` DOFs run in f64 when x64 is enabled:
    on the TPU backend, small-shape f32 stencil programs hit a
    minutes-long compiler path while the f64 lowering compiles in
    seconds, and at those sizes the runtime cost of emulated f64 is
    negligible (the V-cycle stays a fixed SPD linear operator — per-level
    precision does not change that).
    """
    levels_np, coarse_inv_np = _build_hierarchy_host(
        op,
        coarse_dof_limit=coarse_dof_limit,
        max_levels=max_levels,
        dtype=dtype,
        small_level_dof=small_level_dof,
        free_np=free_np,
    )
    levels = tuple(
        _Level(
            ke=jnp.asarray(lv["ke"], lv["dtype"]),
            free=jnp.asarray(lv["free"], lv["dtype"]),
            inv_diag=jnp.asarray(lv["inv_diag"], lv["dtype"]),
            lam_max=jnp.asarray(lv["lam"], lv["dtype"]),
            dims=lv["dims"],
        )
        for lv in levels_np
    )
    coarse_inv = jnp.asarray(coarse_inv_np, levels[-1].ke.dtype)
    return MultigridPreconditioner(
        levels=levels, coarse_inv=coarse_inv, degree=degree
    )
