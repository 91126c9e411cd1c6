"""Transposed-layout (component-major) solve pipeline for the voxel path.

The flagship solve's per-iteration cost is dominated by HBM traffic in
the stencil applies.  The fused Pallas kernels (ops/pallas_stencil.py)
cut that traffic — f32 apply 0.86 ms vs 1.05 ms XLA, f64-accurate
double-f32 apply 4.1 ms vs 17 ms emulated f64 (docs/PERF.md) — but they
require the component-major layout ``(3, Y, X, Z)`` (Z on the 128-wide
lanes), and an XLA layout transpose costs ~30 ms, far more than a kernel
saves.  So the WHOLE pipeline here lives in that layout: the masked
operator, every multigrid level, the Chebyshev smoother, prolongation/
restriction, and all FCG Krylov vectors.  A solve converts (b, x0) in
once and u out once.

Components:
  * :func:`stencil_apply_grid_T` — XLA twin of
    ``ops.structured.stencil_apply_grid`` in the transposed layout (the
    CPU / non-Pallas fallback, and the f64 reference for tests).
  * :class:`MultigridT` — the V-cycle of ``ops.multigrid`` re-expressed
    in the transposed layout, sharing the same Chebyshev recurrence and
    level data (built host-side by ``build_multigrid`` and converted by
    :func:`transpose_multigrid`); fine f32 levels run the fused Pallas
    stencil kernel on TPU.
  * :func:`masked_apply_dd_T` — the f64-accurate masked operator apply
    from f32 pairs via the double-f32 Pallas kernel.

Replaces (at the performance tier) the per-element ``Ke @ u_e`` inside
the reference's assembly/solve loop (/root/reference/fea.py:87-105) —
same math, zero index traffic, near-speed-of-light layout.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .multigrid import (
    MultigridPreconditioner,
    _build_hierarchy_host,
    _prolong,
    _restrict,
    chebyshev_smooth,
)
from .pallas_stencil import (
    stencil_apply_transposed,
    stencil_apply_transposed_dd,
    stencil_tables,
)
from .structured import _CORNERS

__all__ = [
    "t_of_grid",
    "grid_of_t",
    "stencil_apply_grid_T",
    "MultigridT",
    "build_multigrid_t",
    "transpose_multigrid",
    "masked_apply_dd_T",
]

_T_PERM = (3, 1, 2, 0)  # (Z, Y, X, 3) <-> (3, Y, X, Z); its own inverse


def t_of_grid(g: jax.Array) -> jax.Array:
    """(Z, Y, X, 3) -> (3, Y, X, Z)."""
    return jnp.transpose(g, _T_PERM)


def grid_of_t(gT: jax.Array) -> jax.Array:
    """(3, Y, X, Z) -> (Z, Y, X, 3)."""
    return jnp.transpose(gT, _T_PERM)


def stencil_apply_grid_T(ke: jax.Array, gT: jax.Array) -> jax.Array:
    """K @ u in transposed grid space: gT (3, Y, X, Z) -> (3, Y, X, Z).

    Same corner-pair pad-add structure as ``stencil_apply_grid`` (see the
    VPU-vs-MXU rationale there), re-axed so results match
    ``t_of_grid(stencil_apply_grid(ke, grid_of_t(gT), dims))`` to dtype
    rounding (pinned by test).
    """
    C, Yn, Xn, Zn = gT.shape
    nx, ny, nz = Xn - 1, Yn - 1, Zn - 1
    ke = ke.astype(gT.dtype)
    f = jnp.zeros_like(gT)
    for a, (az, ay, ax) in enumerate(_CORNERS):
        f_a = jnp.zeros((3, ny, nx, nz), gT.dtype)
        for b, (bz, by, bx) in enumerate(_CORNERS):
            u_b = jax.lax.slice(gT, (0, by, bx, bz), (3, by + ny, bx + nx, bz + nz))
            kab = ke[3 * a : 3 * a + 3, 3 * b : 3 * b + 3][:, :, None, None, None]
            f_a = f_a + (u_b[0] * kab[:, 0] + u_b[1] * kab[:, 1] + u_b[2] * kab[:, 2])
        f = f + jnp.pad(f_a, ((0, 0), (ay, 1 - ay), (ax, 1 - ax), (az, 1 - az)))
    return f


def _apply_T(
    ke: jax.Array,
    gT: jax.Array,
    *,
    use_pallas: bool,
    interpret: bool = False,
    tables=None,
) -> jax.Array:
    """Layout-T stencil apply; the fused Pallas kernel is f32-only.
    ``tables`` (precomputed :func:`pallas_stencil.stencil_tables`) must
    be passed when ke is traced inside an enclosing jit."""
    if use_pallas and gT.dtype == jnp.float32:
        return stencil_apply_transposed(ke, gT, tables=tables, interpret=interpret)
    return stencil_apply_grid_T(ke, gT)


def masked_apply_dd_T(
    ksplits: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    freeT: jax.Array,
    xT: jax.Array,
    *,
    tables=None,
    interpret: bool = False,
) -> jax.Array:
    """Masked operator F·A(F·x) + (1-F)·x at ~f64 accuracy from f32 pairs.

    ``ksplits`` is ``split_ke_dd(ke_f64)``; ``xT`` is f64 (3, Y, X, Z) and
    ``freeT`` the 0/1 mask (any float dtype).  One double-f32 Pallas apply
    replaces the 17 ms emulated-f64 XLA apply (4.1 ms measured, 2.3e-11
    relative accuracy — docs/PERF.md lever 2).

    All masking runs in f32-PAIR space: F ∈ {0, 1} so F·hi / F·lo and the
    (1-F)·x identity term are EXACT on the split representation (hi + lo
    reproduces x to ~2^-48 relative) — this keeps the emulated-f64
    elementwise work per apply down to one split-subtract and one final
    combine-add instead of six mask/combine ops (measured ~1.5 ms each on
    the chip; they were rivaling the kernel itself)."""
    f64 = xT.dtype
    F = freeT.astype(jnp.float32)
    G = (1.0 - freeT).astype(jnp.float32)
    hi32 = xT.astype(jnp.float32)
    lo32 = (xT - hi32.astype(f64)).astype(jnp.float32)
    fh, fl = stencil_apply_transposed_dd(
        *ksplits, F * hi32, F * lo32, tables=tables, interpret=interpret
    )
    out_hi = F * fh + G * hi32
    out_lo = F * fl + G * lo32
    return out_hi.astype(f64) + out_lo.astype(f64)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _LevelT:
    """One multigrid level, transposed layout (see multigrid._Level)."""

    ke: jax.Array  # (24, 24)
    free: jax.Array  # (3, Y, X, Z)
    inv_diag: jax.Array  # (3, Y, X, Z)
    lam_max: jax.Array  # ()
    use_pallas: bool = dataclasses.field(metadata=dict(static=True), default=False)
    interpret: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # precomputed kernel weight tables (pallas_stencil.stencil_tables);
    # required for the Pallas path inside jits where ke is traced
    tables: object = None

    def apply(self, g: jax.Array) -> jax.Array:
        F = self.free.astype(g.dtype)
        Ag = _apply_T(
            self.ke, F * g,
            use_pallas=self.use_pallas, interpret=self.interpret, tables=self.tables,
        )
        return F * Ag + (1.0 - F) * g


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MultigridT:
    """V-cycle preconditioner in the transposed layout.

    Callable on (3, Y, X, Z) residuals — the layout FCG's Krylov vectors
    live in.  Same algorithm, level data, and Chebyshev windows as
    ``MultigridPreconditioner`` (equivalence pinned by test); only the
    axes and the stencil kernel differ.
    """

    levels: tuple[_LevelT, ...]
    coarse_inv: jax.Array  # (nc, nc), in the FLAT (Z,Y,X,3) dof order
    degree: int = dataclasses.field(metadata=dict(static=True), default=4)
    lam_min_frac: float = dataclasses.field(metadata=dict(static=True), default=1.0 / 6.0)
    lam_max_safety: float = dataclasses.field(metadata=dict(static=True), default=1.0)

    def _smooth(self, level: _LevelT, x: jax.Array, r: jax.Array) -> jax.Array:
        return chebyshev_smooth(
            level.apply, level.inv_diag, level.lam_max * self.lam_max_safety,
            self.lam_min_frac, self.degree, x, r,
        )

    def _vcycle(self, idx: int, r: jax.Array) -> jax.Array:
        level = self.levels[idx]
        if idx == len(self.levels) - 1:
            # coarsest: tiny (≲3k DOF) — transpose to the dense inverse's
            # flat (Z,Y,X,3) ordering and back, negligible cost
            rg = grid_of_t(r)
            z = (self.coarse_inv.astype(r.dtype) @ rg.reshape(-1)).reshape(rg.shape)
            return t_of_grid(z)
        z = self._smooth(level, jnp.zeros_like(r), r)
        coarse = self.levels[idx + 1]
        c_dtype = coarse.ke.dtype
        rc = coarse.free.astype(c_dtype) * _restrict(
            r - level.apply(z), axes=(1, 2, 3)
        ).astype(c_dtype)
        zc = self._vcycle(idx + 1, rc)
        Ff = level.free.astype(r.dtype)
        z = z + Ff * _prolong(coarse.free.astype(zc.dtype) * zc, axes=(1, 2, 3)).astype(r.dtype)
        return self._smooth(level, z, r)

    def __call__(self, rT: jax.Array) -> jax.Array:
        return self._vcycle(0, rT)


from functools import partial


@partial(jax.jit, static_argnames=("shapes", "dtypes"))
def _pack_levels_T(free_fine, inv_tab0, shapes, dtypes):
    """Derive every level's (freeT, inv_diagT) ON DEVICE.

    ``free_fine`` is the fine-level 0/1 free mask already resident on
    device ((N, 3), any float dtype); ``inv_tab0`` the fine level's
    (3, 3, 3, 3) f64 region table ``1 / corner_table(diag Ke)``.
    Coarser masks are even-index subsampling; coarser tables are exactly
    ``0.5**l`` times the fine one (Ke doubles per level).  Replaces a
    ~10 MB host->device transfer of pre-built grids with one tiny table
    transfer + a few grid-sized device ops (bitwise-identical output —
    all the f64 math here is exact, pinned by
    tests/test_transposed.py::test_build_multigrid_t_matches_converted_hierarchy).
    """
    Z0, Y0, X0 = shapes[0]
    g0 = free_fine.reshape(Z0, Y0, X0, 3).astype(jnp.float64)
    # tabT[c, iy, ix, iz] = inv_tab0[iz, iy, ix, c]
    tabT = jnp.transpose(inv_tab0, (3, 1, 2, 0))

    def region_idx(n: int) -> np.ndarray:
        # boundary class per node index: 0 = min face, 1 = interior,
        # 2 = max face (max wins when n == 1, matching fill_regions_np's
        # write order)
        r = np.ones(n, np.int32)
        r[0] = 0
        r[-1] = 2
        return r

    out = []
    for l, ((Z, Y, X), dt) in enumerate(zip(shapes, dtypes)):
        s = 2**l
        freeT = jnp.transpose(g0[::s, ::s, ::s], _T_PERM)
        ry, rx, rz = region_idx(Y), region_idx(X), region_idx(Z)
        inv = tabT[:, ry[:, None, None], rx[None, :, None], rz[None, None, :]]
        inv_d = jnp.where(freeT > 0, inv * (0.5**l), 1.0)
        out.append((freeT.astype(dt), inv_d.astype(dt)))
    return tuple(out)


def build_multigrid_t(
    op,
    *,
    degree: int = 4,
    coarse_dof_limit: int = 3000,
    max_levels: int = 10,
    dtype=jnp.float32,
    small_level_dof: int = 100_000,
    use_pallas: bool = False,
    pallas_min_dof: int = 0,
    interpret: bool = False,
    free_np: "np.ndarray | None" = None,
    device_pack: bool = True,
) -> MultigridT:
    """Build the hierarchy directly in the transposed layout.

    Host-side construction shares ``_build_hierarchy_host`` with
    ``build_multigrid``.  By default the per-level free/inv_diag GRIDS
    are derived on device from the fine mask (:func:`_pack_levels_T`) —
    at 1M DOF that replaces ~0.2 s of host->device grid transfers plus
    ~0.1 s of host region fills with a few ms of device work, the
    largest single win in the benchmark's ``multigrid_build`` stage.
    ``device_pack=False`` keeps the all-host path (NumPy transposes, one
    transfer per array); both produce bitwise-identical hierarchies."""
    from ..dtypes import x64_enabled

    # the pack's bitwise equivalence with the host build relies on exact
    # f64 table math on device
    device_pack = device_pack and x64_enabled()
    levels_np, coarse_inv_np = _build_hierarchy_host(
        op,
        coarse_dof_limit=coarse_dof_limit,
        max_levels=max_levels,
        dtype=dtype,
        small_level_dof=small_level_dof,
        free_np=free_np,
        grids=not device_pack,
    )
    if device_pack:
        shapes = tuple(lv["free"].shape[:3] for lv in levels_np)
        dtypes = tuple(jnp.dtype(lv["dtype"]).name for lv in levels_np)
        packed = _pack_levels_T(
            op.free, jnp.asarray(levels_np[0]["inv_tab"], jnp.float64), shapes, dtypes
        )
    levels = []
    for i, lv in enumerate(levels_np):
        n_dof = int(np.prod(lv["free"].shape))
        pall = bool(
            use_pallas and jnp.dtype(lv["dtype"]) == jnp.float32 and n_dof >= pallas_min_dof
        )
        if device_pack:
            free_T, inv_T = packed[i]
        else:
            free_T = jnp.asarray(np.transpose(lv["free"], _T_PERM), lv["dtype"])
            inv_T = jnp.asarray(np.transpose(lv["inv_diag"], _T_PERM), lv["dtype"])
        levels.append(
            _LevelT(
                ke=jnp.asarray(lv["ke"], lv["dtype"]),
                free=free_T,
                inv_diag=inv_T,
                lam_max=jnp.asarray(lv["lam"], lv["dtype"]),
                use_pallas=pall,
                interpret=interpret,
                # host-built weight tables: ~500 tiny ops ONCE here vs
                # per apply instance inside the jitted V-cycle
                tables=stencil_tables(lv["ke"]) if pall else None,
            )
        )
    coarse_inv = jnp.asarray(coarse_inv_np, levels[-1].ke.dtype)
    return MultigridT(levels=tuple(levels), coarse_inv=coarse_inv, degree=degree)


def transpose_multigrid(
    mg: MultigridPreconditioner,
    *,
    use_pallas: bool = False,
    pallas_min_dof: int = 0,
    interpret: bool = False,
) -> MultigridT:
    """Convert a host-built hierarchy to the transposed layout.

    ``use_pallas`` selects the fused stencil kernel for f32 levels with
    at least ``pallas_min_dof`` DOFs (tiny levels gain nothing and each
    distinct shape costs a kernel compile)."""
    levels = []
    for lvl in mg.levels:
        n_dof = int(np.prod(lvl.free.shape))
        pall = bool(
            use_pallas
            and lvl.ke.dtype == jnp.float32
            and n_dof >= pallas_min_dof
        )
        levels.append(
            _LevelT(
                ke=lvl.ke,
                free=t_of_grid(lvl.free),
                inv_diag=t_of_grid(lvl.inv_diag),
                lam_max=lvl.lam_max,
                use_pallas=pall,
                interpret=interpret,
                # one host pull of the tiny Ke, then host-built tables
                tables=stencil_tables(np.asarray(lvl.ke, np.float64)) if pall else None,
            )
        )
    return MultigridT(
        levels=tuple(levels),
        coarse_inv=mg.coarse_inv,
        degree=mg.degree,
        lam_min_frac=mg.lam_min_frac,
        lam_max_safety=mg.lam_max_safety,
    )
