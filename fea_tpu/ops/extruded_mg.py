"""z-semicoarsened multigrid for extruded meshes (the tube scale path).

The voxel multigrid (ops/multigrid.py) needs a structured section; an
extruded mesh is structured only along z.  This preconditioner therefore
coarsens ONLY z — restriction/prolongation are the 1D [1/2, 1, 1/2]
transfers along the layer axis — and compensates with a LINE smoother:
per-layer section-block Jacobi (every layer's full 3*n2 x 3*n2 coupling
block inverted) accelerated by Chebyshev.  That is the textbook robust
combination for extruded/anisotropic problems: z-coarsening makes
elements long in z, which strengthens in-layer coupling, which is
exactly what the per-layer block solve removes.  The coarsest level is
solved EXACTLY by a block-tridiagonal (Thomas) factorization — the
extruded stiffness couples only adjacent layers, so the coarse system is
block-tridiagonal by construction.

All construction is host-side NumPy f64 (one Ke re-integration per
section quad per level — anisotropic z-scaling changes Ke, unlike the
uniform voxel case where it is exactly linear); the V-cycle on device is
batched MXU matmuls + the extruded stencil apply.  λmax for the
Chebyshev window uses a certified ∞-norm bound on the block-Jacobi-
preconditioned operator (ρ(M⁻¹A) ≤ ‖M⁻¹A‖∞, rows computed exactly on
the host per distinct layer class), the lesson of the round-1 1M-DOF
divergence (power iteration under-estimates; see ops/multigrid.py).

Used by ``solve_extruded`` via ``solve_operator_fpcg`` — f64 FCG outer,
this V-cycle in f32 as the preconditioner.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..elements import hex8 as hex8_el
from .extruded import ExtrudedOperator, _section_incidence
from .multigrid import _prolong, _restrict

_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "ComposedExtrudedPrecond",
    "ExtrudedMultigrid",
    "SectionCoarse",
    "build_extruded_multigrid",
    "build_section_coarse",
]


def _section_block_np(kes: np.ndarray, quads: np.ndarray, n2: int, rows: slice, cols: slice) -> np.ndarray:
    """Assemble sum_q Ke_q[rows, cols] into a (3 n2, 3 n2) section block.
    rows/cols select the bottom (0:12) or top (12:24) corner DOFs."""
    B = np.zeros((3 * n2, 3 * n2))
    for q, quad in enumerate(quads):
        blk = kes[q][rows, cols]  # (12, 12)
        for c in range(4):
            i = quad[c]
            for cp in range(4):
                j = quad[cp]
                B[3 * i : 3 * i + 3, 3 * j : 3 * j + 3] += blk[3 * c : 3 * c + 3, 3 * cp : 3 * cp + 3]
    return B


def _mask_block(D: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Masked diagonal block F D F + (1 - F) for a per-layer DOF mask f."""
    Dm = D * f[:, None] * f[None, :]
    Dm[np.diag_indices_from(Dm)] += 1.0 - f
    return Dm


def _thomas_solve(uinv: jax.Array, G: jax.Array, rf: jax.Array) -> jax.Array:
    """Block-tridiagonal solve from Thomas factors, rf (L, b) in the
    factors' dtype: forward y_l = r_l - G_{l-1}^T y_{l-1}, diagonal
    u = Uinv y, back x_l = u_l - G_l x_{l+1} (U symmetric ->
    O^T Uinv = G^T).  Shared by the z-coarsest exact solve and the
    section-RBM coarse correction."""

    def fwd(y_prev, inp):
        r_l, G_prev = inp
        y_l = r_l - jnp.einsum("ab,a->b", G_prev, y_prev, precision=_HIGHEST)
        return y_l, y_l

    y0 = rf[0]
    _, y_rest = jax.lax.scan(fwd, y0, (rf[1:], G))
    y = jnp.concatenate([y0[None], y_rest], axis=0)
    u = jnp.einsum("lab,lb->la", uinv, y, precision=_HIGHEST)

    def bwd(x_next, inp):
        u_l, G_l = inp
        x_l = u_l - jnp.einsum("ab,b->a", G_l, x_next, precision=_HIGHEST)
        return x_l, x_l

    x_last = u[-1]
    _, x_rest = jax.lax.scan(bwd, x_last, (u[:-1], G), reverse=True)
    return jnp.concatenate([x_rest, x_last[None]], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _ELevel:
    """One z-level of the extruded hierarchy."""

    op: ExtrudedOperator  # level operator (f32 payloads)
    minv_interior: jax.Array  # (b, b) inverse of the interior masked layer block
    special_idx: tuple = dataclasses.field(metadata=dict(static=True))  # layer indices
    minv_special: jax.Array  # (n_special, b, b)
    lam_max: jax.Array  # () certified upper bound on rho(M^-1 A)

    def apply(self, g: jax.Array) -> jax.Array:
        """Masked operator on (L, n2, 3) level grids."""
        x = g.reshape(-1, 3)
        return self.op.apply(x).reshape(g.shape)

    def block_jacobi(self, r: jax.Array) -> jax.Array:
        """z = blockdiag(M)^-1 r on (L, n2, 3): one batched MXU matmul for
        every layer with the interior inverse, then the few special layers
        (first/last/BC patterns) overwritten with their own inverses."""
        L, n2, _ = r.shape
        rf = r.reshape(L, 3 * n2)
        z = jnp.einsum("ab,lb->la", self.minv_interior.astype(r.dtype), rf,
                       precision=_HIGHEST)
        if self.special_idx:
            idx = jnp.asarray(self.special_idx, jnp.int32)
            rs = rf[idx]  # (n_special, b)
            zs = jnp.einsum("sab,sb->sa", self.minv_special.astype(r.dtype), rs,
                            precision=_HIGHEST)
            z = z.at[idx].set(zs)
        return z.reshape(L, n2, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ExtrudedMultigrid:
    """V-cycle preconditioner z = M^-1 r for the masked extruded operator.

    Callable on flat (N, 3) residuals.  Chebyshev line smoothing on each
    level, exact block-Thomas solve at the coarsest.
    """

    levels: tuple[_ELevel, ...]
    # block-Thomas factors of the coarsest masked system
    thomas_uinv: jax.Array  # (Lc, b, b)
    thomas_g: jax.Array  # (Lc - 1, b, b)  G_l = U_l^-1 O_l
    degree: int = dataclasses.field(metadata=dict(static=True), default=2)
    lam_min_frac: float = dataclasses.field(metadata=dict(static=True), default=1.0 / 6.0)

    def _smooth(self, level: _ELevel, x: jax.Array, r: jax.Array) -> jax.Array:
        """Chebyshev on the block-Jacobi-preconditioned operator (same
        d-vector recurrence as ops.multigrid.chebyshev_smooth, with the
        pointwise inv-diag replaced by the per-layer block solve)."""
        lam_max = (level.lam_max * 1.0).astype(x.dtype)
        lam_min = lam_max * self.lam_min_frac
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)
        sigma = theta / delta
        rho = 1.0 / sigma
        z = level.block_jacobi(r - level.apply(x))
        d = z / theta
        x = x + d
        for _ in range(self.degree - 1):
            z = level.block_jacobi(r - level.apply(x))
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
            x = x + d
            rho = rho_new
        return x

    def _coarse_solve(self, r: jax.Array) -> jax.Array:
        """Exact block-tridiagonal solve on (Lc, n2, 3) via the Thomas
        factors: forward y_l = r_l - G_{l-1}^T y_{l-1}, back
        x_l = Uinv_l y_l - G_l x_{l+1} (U symmetric -> O^T Uinv = G^T)."""
        Lc, n2, _ = r.shape
        rf = r.reshape(Lc, -1).astype(self.thomas_uinv.dtype)
        x = _thomas_solve(self.thomas_uinv, self.thomas_g, rf)
        return x.reshape(Lc, n2, 3).astype(r.dtype)

    def _vcycle(self, idx: int, r: jax.Array) -> jax.Array:
        if idx == len(self.levels):
            return self._coarse_solve(r)
        level = self.levels[idx]
        z = self._smooth(level, jnp.zeros_like(r), r)
        nxt = self.levels[idx + 1].op if idx + 1 < len(self.levels) else None
        L, n2, _ = r.shape
        rc = _restrict(r - level.apply(z), axes=(0,))
        if nxt is not None:
            Fc = nxt.free.astype(rc.dtype).reshape(rc.shape)
        else:
            Fc = self._coarse_free.astype(rc.dtype).reshape(rc.shape)
        rc = Fc * rc
        zc = self._vcycle(idx + 1, rc)
        Ff = level.op.free.astype(r.dtype).reshape(r.shape)
        z = z + Ff * _prolong(Fc * zc, axes=(0,))
        return self._smooth(level, z, r)

    # coarse free mask (for masking the restricted residual onto the
    # Thomas level) — set post-construction; treated as a leaf
    _coarse_free: jax.Array = None

    def __call__(self, r_flat: jax.Array) -> jax.Array:
        if self.levels:
            lv0 = self.levels[0].op
            Ln, n2 = lv0.n_layers, lv0.n2
        else:  # mesh already at Thomas size: M is the exact solve
            Ln, n2, _ = self._coarse_free.shape
        g = r_flat.reshape(Ln, n2, 3)
        return self._vcycle(0, g).reshape(r_flat.shape)


def _block_scatter_indices(quads: np.ndarray, n2: int) -> dict:
    """Host-once gather/scatter index arrays mapping per-quad Ke entries
    into the three distinct (3 n2, 3 n2) section blocks (S_bb, S_tt, O).
    Lets the device assemble the blocks from the tiny (Q2, 24, 24) kes
    instead of shipping ~9 MB dense blocks per level through the tunnel."""
    Q = quads.shape[0]
    loc = np.arange(12)  # local DOF within a 12-wide corner block
    grow = 3 * quads[:, loc // 3] + (loc % 3)  # (Q, 12) global section DOF
    out = {}
    for name, (ro, co) in (("bb", (0, 0)), ("tt", (12, 12)), ("o", (0, 12))):
        qi = np.broadcast_to(np.arange(Q)[:, None, None], (Q, 12, 12))
        ri = np.broadcast_to((ro + loc)[None, :, None], (Q, 12, 12))
        ci = np.broadcast_to((co + loc)[None, None, :], (Q, 12, 12))
        rr = np.broadcast_to(grow[:, :, None], (Q, 12, 12))
        cc = np.broadcast_to(grow[:, None, :], (Q, 12, 12))
        out[name] = tuple(
            jnp.asarray(np.ascontiguousarray(x.reshape(-1)), jnp.int32)
            for x in (qi, ri, ci, rr, cc)
        )
    return out


def _assemble_block(kes: jax.Array, idx, b: int) -> jax.Array:
    qi, ri, ci, rr, cc = idx
    vals = kes[qi, ri, ci]
    return jnp.zeros((b, b), kes.dtype).at[rr, cc].add(vals)


def _inv_newton(D: jax.Array, steps: int = 2) -> jax.Array:
    """Batched inverse: f32 LU seed + Newton refinement X <- X(2I - DX)
    at D's dtype.  On TPU the f32 LU residual is ~kappa * eps32; the
    MXU-cheap Newton steps push it to the working-precision floor
    (probed on-chip: ||I - DX||_inf 6.5e-6 raw -> 2.9e-6 refined at
    b=1536 in f32).  For f64 D the seed still comes from the f32 LU
    (TPU has no f64 factorization) and the refinement runs in emulated
    f64 — quadratic convergence needs kappa * eps32 < 1 per block, which
    holds for the individually well-conditioned layer/Schur blocks even
    on scenes whose CHAIN arithmetic needs f64 (see _build_thomas_dev)."""
    X = jnp.linalg.inv(D.astype(jnp.float32)).astype(D.dtype)
    I = jnp.eye(D.shape[-1], dtype=D.dtype)
    for _ in range(steps):
        DX = jnp.einsum("...ab,...bc->...ac", D, X, precision=_HIGHEST)
        X = jnp.einsum("...ab,...bc->...ac", X, 2.0 * I - DX, precision=_HIGHEST)
    return X


def _mask_block_dev(D: jax.Array, f: jax.Array) -> jax.Array:
    """Device twin of _mask_block, batched over leading dims of f."""
    I = jnp.eye(f.shape[-1], dtype=D.dtype)
    return D * f[..., :, None] * f[..., None, :] + I * (1.0 - f)[..., None, :]


def _rowsum_dev(P: jax.Array) -> jax.Array:
    """max_i sum_j |P_ij| over the last two axes, with the same 1e-3
    inflation as the host path (covers f32 HIGHEST evaluation error,
    <= ~b * eps32 ~ 1e-4 relative at b = 1536)."""
    return jnp.max(jnp.sum(jnp.abs(P), axis=-1), axis=-1) * 1.001


@jax.jit
def _build_level_dev(
    kes, idx_bb, idx_tt, idx_o,
    f_special, alpha_s,
    f_chk, f_prev, f_next, w_prev, w_next, alpha_c, minv_sel, w_gen,
):
    """One z-level's block data, entirely on device.

    Returns (minv_interior, minv_special, lam_max).  lam_max is the
    certified infinity-norm bound on rho(M^-1 A) computed FROM THE
    STORED f32 inverses (self-consistent: the bound covers exactly the
    matrices the smoother applies).  Unlike the host-f64 path, the
    diagonal term is not assumed to be exactly 1: the Newton-refined
    inverse's deviation ||X D_m - I||_inf is measured and added."""
    b = f_special.shape[1]
    S_bb = _assemble_block(kes, idx_bb, b)
    S_tt = _assemble_block(kes, idx_tt, b)
    O = _assemble_block(kes, idx_o, b)
    D_int = S_bb + S_tt
    I = jnp.eye(b, dtype=kes.dtype)

    minv_int = _inv_newton(D_int)  # all-free interior: mask is identity on D
    D_s = alpha_s[:, 0, None, None] * S_bb + alpha_s[:, 1, None, None] * S_tt
    minv_special = _inv_newton(_mask_block_dev(D_s, f_special))

    # --- certified lambda_max ---
    allm = jnp.concatenate([minv_int[None], minv_special], axis=0)
    Mc = allm[minv_sel]  # (n_c, b, b)
    D_c = alpha_c[:, 0, None, None] * S_bb + alpha_c[:, 1, None, None] * S_tt
    Dm_c = _mask_block_dev(D_c, f_chk)
    mm = lambda A, B: jnp.einsum("...ab,...bc->...ac", A, B, precision=_HIGHEST)
    diag_c = _rowsum_dev(mm(Mc, Dm_c) - I)
    Op_next = O[None] * f_chk[:, :, None] * f_next[:, None, :]
    Op_prev = jnp.swapaxes(O, 0, 1)[None] * f_chk[:, :, None] * f_prev[:, None, :]
    totals = (
        1.0 + diag_c
        + w_prev * _rowsum_dev(mm(Mc, Op_prev))
        + w_next * _rowsum_dev(mm(Mc, Op_next))
    )
    lam = jnp.max(totals)
    # generic interior layer (present unless every layer is special)
    gen = (
        1.0
        + _rowsum_dev(mm(minv_int, D_int) - I)
        + _rowsum_dev(mm(minv_int, O.T))
        + _rowsum_dev(mm(minv_int, O))
    )
    lam = jnp.maximum(lam, w_gen * gen)
    return minv_int, minv_special, lam


@jax.jit
def _build_thomas_dev(kes, idx_bb, idx_tt, idx_o, f_flat, alpha):
    """Block-tridiagonal (Thomas) factorization of the coarsest masked
    system as a lax.scan on device — the factors are born on the chip
    instead of being computed in host f64 and shipped (~235 MB at tube
    scale).  Same recurrence as the host path: G_l = Uinv_l O_l,
    U_{l+1} = D_{l+1} - O_l^T G_l.

    MUST run at (emulated) f64: the Schur complements of a slender
    extrusion lose their small beam-compliance part to cancellation in
    D - O^T G, and an all-f32 chain measured 30% error in G on a
    slender thin tube — a garbage "exact" coarse solve that DIVERGED
    the V-cycle (f32 storage of accurately-computed factors is fine;
    the host-f64 path has always stored f32).  Callers pass f64 inputs
    and cast the returned factors down."""
    b = f_flat.shape[1]
    S_bb = _assemble_block(kes, idx_bb, b)
    S_tt = _assemble_block(kes, idx_tt, b)
    O = _assemble_block(kes, idx_o, b)
    D = alpha[:, 0, None, None] * S_bb + alpha[:, 1, None, None] * S_tt
    Dm = _mask_block_dev(D, f_flat)  # (Lc, b, b)
    Om = O[None] * f_flat[:-1, :, None] * f_flat[1:, None, :]  # (Lc-1, b, b)
    mm = lambda A, B: jnp.einsum("ab,bc->ac", A, B, precision=_HIGHEST)

    uinv0 = _inv_newton(Dm[0])

    def step(uinv_prev, inp):
        D_l, Om_prev = inp
        G_prev = mm(uinv_prev, Om_prev)
        U = D_l - mm(Om_prev.T, G_prev)
        uinv_l = _inv_newton(U)
        return uinv_l, (uinv_l, G_prev)

    _, (uinv_rest, G) = jax.lax.scan(step, uinv0, (Dm[1:], Om))
    uinv = jnp.concatenate([uinv0[None], uinv_rest], axis=0)
    return uinv, G


def _integrate_section_kes(grid0: np.ndarray, quads: np.ndarray, h: float, material) -> np.ndarray:
    kes = np.empty((quads.shape[0], 24, 24))
    for q, quad in enumerate(quads):
        sec = grid0[quad, :2]
        corners = np.concatenate(
            [np.column_stack([sec, np.zeros(4)]), np.column_stack([sec, np.full(4, h)])]
        )
        kes[q] = hex8_el.stiffness_matrix_np(corners, material)
    return kes


def build_extruded_multigrid(
    scene,
    detected,
    *,
    degree: int = 2,
    thomas_layers: int = 17,
    max_levels: int = 10,
    dtype=jnp.float32,
    device_build: bool = True,
) -> ExtrudedMultigrid:
    """Build the z-semicoarsened hierarchy for an extruded scene.

    ``detected`` is ``infer_extruded(scene)`` output.  Coarsening halves
    the element-layer count while it is even and above
    ``thomas_layers - 1``; the final level is factored block-
    tridiagonally (exact solve).  Each level re-integrates the per-quad
    Ke at the doubled z spacing (anisotropic scaling — NOT the uniform
    2x of the voxel hierarchy).

    With ``device_build`` (default) every O(b^3) block operation —
    section-block assembly, masked-block inverses, the lambda_max bound
    products and the Thomas chain — runs on device in f32 (LU + Newton
    refinement, MXU matmuls at HIGHEST precision); the host does only
    the O(Q2) Ke integrations and mask bookkeeping, and the only
    transfers are the (Q2, 24, 24) kes + per-layer masks (~0.6 MB/level
    vs ~9 MB/block + ~235 MB of Thomas factors on the host path).
    Measured at tube scale (n2=512, 384 layers): hierarchy setup
    ~45 s -> seconds.  ``device_build=False`` keeps the all-host f64
    NumPy path (the oracle for tests).
    """
    quads, n2, L = detected
    quads = np.asarray(quads, np.int64)
    nodes = np.asarray(scene.nodes)
    grid = nodes.reshape(L, n2, 3)
    h0 = float(grid[1, 0, 2] - grid[0, 0, 2])
    free_full = np.asarray(1.0 - np.asarray(scene.fixed, np.float64)).reshape(L, n2, 3)
    inc_q, inc_c, inc_m = _section_incidence(quads, n2)
    inc = (jnp.asarray(inc_q), jnp.asarray(inc_c), jnp.asarray(inc_m))
    b = 3 * n2
    npdt = np.dtype(dtype)
    idx3 = _block_scatter_indices(quads, n2) if device_build else None

    def _alpha(l: int, Ln: int) -> tuple[float, float]:
        # (S_bb, S_tt) weights of layer l's diagonal block D_l
        return (0.0 if l == Ln - 1 else 1.0, 0.0 if l == 0 else 1.0)

    levels = []
    Lz = L - 1  # element layers
    h = h0
    free_np = free_full
    level_idx = 0
    while Lz > thomas_layers - 1 and Lz % 2 == 0 and level_idx < max_levels:
        kes = _integrate_section_kes(grid[0], quads, h, scene.material)
        Ln = Lz + 1
        f_flat = free_np.reshape(Ln, b)
        # group layers: interior-with-all-free vs everything else
        special = [
            l for l in range(Ln)
            if l == 0 or l == Ln - 1 or not np.all(f_flat[l] == 1.0)
        ]
        sp_map = dict(zip(special, range(len(special))))
        check = sorted(
            {c for s in special for c in (s - 1, s, s + 1)} & set(range(Ln))
        )

        if device_build:
            kes_d = jnp.asarray(np.asarray(kes, npdt))
            f_special = np.stack([f_flat[l] for l in special])
            alpha_s = np.array([_alpha(l, Ln) for l in special])
            zero = np.zeros(b)
            f_prev = np.stack([f_flat[l - 1] if l > 0 else zero for l in check])
            f_next = np.stack([f_flat[l + 1] if l < Ln - 1 else zero for l in check])
            minv_int_j, minv_special_j, lam_j = _build_level_dev(
                kes_d, idx3["bb"], idx3["tt"], idx3["o"],
                jnp.asarray(np.asarray(f_special, npdt)),
                jnp.asarray(np.asarray(alpha_s, npdt)),
                jnp.asarray(np.asarray(f_flat[check], npdt)),
                jnp.asarray(np.asarray(f_prev, npdt)),
                jnp.asarray(np.asarray(f_next, npdt)),
                jnp.asarray(np.array([1.0 if l > 0 else 0.0 for l in check], npdt)),
                jnp.asarray(np.array([1.0 if l < Ln - 1 else 0.0 for l in check], npdt)),
                jnp.asarray(np.array([_alpha(l, Ln) for l in check], npdt)),
                jnp.asarray(np.array([sp_map.get(l, -1) + 1 for l in check], np.int32)),
                jnp.asarray(1.0 if len(special) < Ln else 0.0, npdt),
            )
        else:
            # section blocks: S_bb (element above a node layer), S_tt
            # (below), O (coupling layer l -> l + 1)
            S_bb = _section_block_np(kes, quads, n2, slice(0, 12), slice(0, 12))
            S_tt = _section_block_np(kes, quads, n2, slice(12, 24), slice(12, 24))
            O = _section_block_np(kes, quads, n2, slice(0, 12), slice(12, 24))
            D_int = S_bb + S_tt
            minv_cache: dict = {}
            minv_int = np.linalg.inv(_mask_block(D_int, np.ones(b)))
            minvs = []
            for l in special:
                f = f_flat[l]
                first, last = l == 0, l == Ln - 1
                D_l = (S_bb if first else S_tt if last else D_int)
                key = (first, last, f.tobytes())
                if key not in minv_cache:
                    minv_cache[key] = np.linalg.inv(_mask_block(D_l, f))
                minvs.append(minv_cache[key])
            minv_special = (
                np.stack(minvs) if minvs else np.zeros((0, b, b))
            )

            # certified lambda_max of M^-1 A: per-layer infinity-norm row
            # sums 1 + ||Minv_l O_masked_prev^T||_inf +
            # ||Minv_l O_masked_next||_inf.  Generic interior layers
            # (all-free, all-free neighbors) share one bound; only special
            # layers and their neighbors are evaluated individually (each
            # costs a b^3 product).
            def _rowsum(minv, Omask):
                # f32 BLAS (2x the f64 rate on this host) + a 1e-3
                # inflation that dominates the f32 evaluation error
                # (<= ~b * eps32 ~ 2e-4 relative at b = 1536), keeping
                # the bound certified
                prod = np.asarray(minv, np.float32) @ np.asarray(Omask, np.float32)
                return float(np.max(np.sum(np.abs(prod), axis=1))) * 1.001

            generic_total = 1.0 + _rowsum(minv_int, O.T) + _rowsum(minv_int, O)
            lam = generic_total if len(special) < Ln else 1.0
            for l in check:
                f = f_flat[l]
                minv = minv_special[sp_map[l]] if l in sp_map else minv_int
                total = 1.0
                if l > 0:
                    total += _rowsum(minv, O.T * f[:, None] * f_flat[l - 1][None, :])
                if l < Ln - 1:
                    total += _rowsum(minv, O * f[:, None] * f_flat[l + 1][None, :])
                lam = max(lam, total)
            minv_int_j = jnp.asarray(np.asarray(minv_int, npdt))
            minv_special_j = jnp.asarray(np.asarray(minv_special, npdt))
            lam_j = jnp.asarray(lam, dtype)

        op_l = ExtrudedOperator(
            kes=jnp.asarray(np.asarray(kes, npdt)),
            quads=jnp.asarray(quads, jnp.int32),
            free=jnp.asarray(np.asarray(free_np.reshape(-1, 3), npdt)),
            inc_q=inc[0], inc_c=inc[1], inc_m=inc[2],
            n2=n2, n_layers=Ln,
        )
        levels.append(
            _ELevel(
                op=op_l,
                minv_interior=minv_int_j,
                special_idx=tuple(special),
                minv_special=minv_special_j,
                lam_max=lam_j,
            )
        )
        Lz //= 2
        h *= 2.0
        free_np = free_np[::2]
        level_idx += 1

    # ---- coarsest level: exact block-Thomas factorization (f64 host) ----
    Ln = Lz + 1
    if Ln > 64:
        raise ValueError(
            f"extruded multigrid stopped coarsening at {Ln} node layers "
            f"(> 64): pick an element-layer count divisible by 2 down to "
            f"<= {thomas_layers - 1} (e.g. a multiple of a power of two)"
        )
    kes = _integrate_section_kes(grid[0], quads, h, scene.material)
    f_flat = free_np.reshape(Ln, b)
    if device_build:
        # f64 inputs: the Thomas chain's Schur cancellation needs f64
        # arithmetic on slender extrusions (see _build_thomas_dev);
        # factors are stored at npdt like the host path's always were
        uinv64, G64 = _build_thomas_dev(
            jnp.asarray(np.asarray(kes, np.float64)),
            idx3["bb"], idx3["tt"], idx3["o"],
            jnp.asarray(np.asarray(f_flat, np.float64)),
            jnp.asarray(np.array([_alpha(l, Ln) for l in range(Ln)], np.float64)),
        )
        uinv_j = uinv64.astype(dtype)
        G_j = G64.astype(dtype)
    else:
        S_bb = _section_block_np(kes, quads, n2, slice(0, 12), slice(0, 12))
        S_tt = _section_block_np(kes, quads, n2, slice(12, 24), slice(12, 24))
        O = _section_block_np(kes, quads, n2, slice(0, 12), slice(12, 24))
        D_layers = []
        O_layers = []
        for l in range(Ln):
            first, last = l == 0, l == Ln - 1
            D_l = S_bb if first else S_tt if last else S_bb + S_tt
            D_layers.append(_mask_block(D_l, f_flat[l]))
            if l < Ln - 1:
                O_layers.append(O * f_flat[l][:, None] * f_flat[l + 1][None, :])
        uinv = np.empty((Ln, b, b))
        G = np.empty((Ln - 1, b, b))
        U = D_layers[0]
        uinv[0] = np.linalg.inv(U)
        for l in range(1, Ln):
            G[l - 1] = uinv[l - 1] @ O_layers[l - 1]
            U = D_layers[l] - O_layers[l - 1].T @ G[l - 1]
            uinv[l] = np.linalg.inv(U)
        # convert on the host first: handing jnp.asarray an f64 array
        # for an f32 target pays a double-size transfer plus an
        # on-device cast (measured ~9 s of the tube-scale setup)
        uinv_j = jnp.asarray(np.asarray(uinv, npdt))
        G_j = jnp.asarray(np.asarray(G, npdt))

    return ExtrudedMultigrid(
        levels=tuple(levels),
        thomas_uinv=uinv_j,
        thomas_g=G_j,
        degree=degree,
        _coarse_free=jnp.asarray(np.asarray(free_np.reshape(Ln, n2, 3), npdt)),
    )


# -- section-RBM coarse space (z-resolved) ------------------------------------
#
# The z-semicoarsened V-cycle handles z-smooth error exactly (Thomas) and
# section-local error via the line smoother; what it cannot see is error
# SMOOTH ALONG THE SECTION but arbitrary in z — the global shell-bending
# modes of a thin tube, which left the 591k bench at 61 FCG iterations vs
# the voxel path's ~11 (VERDICT.md r2 weak #7).  The fix is a second,
# z-RESOLVED coarse space: rigid-body modes per (node layer x section
# aggregate) — the classic "every cross-section moves rigidly" beam
# kinematics, 6*As dof per layer.  Its Galerkin matrix inherits the
# extruded operator's block-tridiagonal-in-z structure, so it is solved
# EXACTLY by the same block-Thomas machinery at (6 As)-wide blocks —
# no dense (6A, 6A) inverse, no aggregate-count cap.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SectionCoarse:
    """Exact solve in the per-layer section-RBM coarse space.

    Callable on flat (N, 3) residuals (any float dtype); the Thomas
    scan runs at the factors' STORED dtype — f32.  The factors are
    BUILT in f64 (the Schur chain of a slender extrusion is exactly the
    cancellation-critical computation that diverged the all-f32
    z-coarse build, see _build_thomas_dev) and then stored/applied at
    f32: an f64 emulated Thomas scan cost ~13 ms/iteration on-chip and
    erased the section-coarse win, while f32 STORAGE of
    accurately-computed factors matches the always-stable host path
    (docs/PERF.md round-3; ADVICE r3 doc fix).
    """

    agg: jax.Array          # (N,) int32 = layer * As + section aggregate
    xrel: jax.Array         # (N, 3) radius-normalized in-plane offsets
    thomas_uinv: jax.Array  # (L, 6 As, 6 As) built f64, stored f32
    thomas_g: jax.Array     # (L - 1, 6 As, 6 As) built f64, stored f32
    n_aggs: int = dataclasses.field(metadata=dict(static=True))
    n_layers: int = dataclasses.field(metadata=dict(static=True))

    def __call__(self, r: jax.Array) -> jax.Array:
        dt = r.dtype
        x = self.xrel.astype(dt)
        # restriction P^T r: translations sum r, rotations sum S(x)^T r
        rc = jnp.concatenate([r, jnp.cross(r, x)], axis=-1)  # (N, 6)
        rc = jax.ops.segment_sum(
            rc, self.agg, num_segments=self.n_layers * self.n_aggs
        )
        rf = rc.reshape(self.n_layers, -1).astype(self.thomas_uinv.dtype)
        zf = _thomas_solve(self.thomas_uinv, self.thomas_g, rf)
        zc = zf.reshape(-1, 6).astype(dt)[self.agg]
        return zc[:, :3] + jnp.cross(x, zc[:, 3:])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ComposedExtrudedPrecond:
    """Multiplicative composition: section-RBM coarse correction first,
    then the z-semicoarsened V-cycle on the updated residual.  Callable
    with the same signature as ExtrudedMultigrid (f32 in the production
    pair-space solver; the coarse Thomas still runs f64 internally).
    Multiplicative measured ~1.4x fewer FCG iterations than additive on
    a slender tube (36 vs 51); the extra residual apply reuses the
    V-cycle's own f32 fine-level operator."""

    mg: ExtrudedMultigrid
    sc: SectionCoarse

    def __call__(self, r: jax.Array) -> jax.Array:
        z = self.sc(r)
        if not self.mg.levels:  # mesh already at Thomas size: additive
            return z + self.mg(r)
        op32 = self.mg.levels[0].op
        shape = r.shape
        rm = r - op32.apply(z.reshape(-1, 3)).reshape(shape)
        return z + self.mg(rm)


def _aggregate_section_2d(xy: np.ndarray, target: int) -> tuple[np.ndarray, int]:
    """Geometric 2D binning of section nodes into ~``target`` cells
    (twolevel.aggregate_nodes is 3D; on a flat section its z-extent
    guard degenerates the grid to ONE aggregate, which silently turned
    the coarse space into a single rigid body — caught by oracle test)."""
    xy = np.asarray(xy, np.float64)
    lo = xy.min(axis=0)
    span = xy.max(axis=0) - lo
    span = np.where(span > 0, span, 1.0)
    h = float(np.sqrt(np.prod(span) / max(target, 1)))
    k = np.maximum(1, np.round(span / h)).astype(np.int64)
    ix = np.minimum((xy - lo) / (span / k), k - 1e-9).astype(np.int64)
    cell = ix[:, 0] * k[1] + ix[:, 1]
    _, agg = np.unique(cell, return_inverse=True)
    return agg.astype(np.int32), int(agg.max()) + 1


def build_section_coarse(
    scene,
    detected,
    *,
    target_section_aggregates: int = 16,
) -> SectionCoarse:
    """Build the per-layer section-RBM coarse space for an extruded scene.

    Host f64 construction, O(n2^2 (6 As) + L (6 As)^3) — a few seconds
    at tube scale: section aggregation (geometric binning of the 2D
    section, ops/twolevel.py machinery), the projected masked layer
    blocks Dc_l = (F P)^T D_l (F P) + P^T (1 - F) P, the projected
    coupling Oc_l, and the block-Thomas factorization of the resulting
    (L x 6 As)-block tridiagonal Galerkin matrix.  Only interior
    all-free layers share precomputed projections; layers touching
    constraints are projected individually.
    """
    from .twolevel import _skew, rigid_body_geometry

    quads_, n2, L = detected
    quads_ = np.asarray(quads_, np.int64)
    nodes = np.asarray(scene.nodes, np.float64).reshape(L, n2, 3)
    h0 = float(nodes[1, 0, 2] - nodes[0, 0, 2])
    sec = nodes[0].copy()
    sec[:, 2] = 0.0
    agg_s, As = _aggregate_section_2d(sec[:, :2], target_section_aggregates)
    xrel_s = rigid_body_geometry(sec, agg_s, As)  # (n2, 3), z column 0

    b = 3 * n2
    bc = 6 * As
    Ps = np.zeros((b, bc))
    rows = 3 * np.arange(n2)
    eye3 = np.eye(3)
    Sx = _skew(xrel_s)  # (n2, 3, 3)
    for i in range(n2):
        a = agg_s[i]
        Ps[3 * i : 3 * i + 3, 6 * a : 6 * a + 3] = eye3
        Ps[3 * i : 3 * i + 3, 6 * a + 3 : 6 * a + 6] = Sx[i]

    kes = _integrate_section_kes(nodes[0], quads_, h0, scene.material)
    S_bb = _section_block_np(kes, quads_, n2, slice(0, 12), slice(0, 12))
    S_tt = _section_block_np(kes, quads_, n2, slice(12, 24), slice(12, 24))
    O = _section_block_np(kes, quads_, n2, slice(0, 12), slice(12, 24))
    D_int = S_bb + S_tt
    free = np.asarray(1.0 - np.asarray(scene.fixed, np.float64)).reshape(L, b)

    Dc_int = Ps.T @ D_int @ Ps
    Oc_int = Ps.T @ O @ Ps

    Dc = np.empty((L, bc, bc))
    Oc = np.empty((L - 1, bc, bc))
    for l in range(L):
        f = free[l]
        first, last = l == 0, l == L - 1
        allfree = bool(np.all(f == 1.0))
        if allfree and not first and not last:
            Dc[l] = Dc_int
        else:
            D_l = S_bb if first else S_tt if last else D_int
            FP = f[:, None] * Ps
            Dc[l] = FP.T @ D_l @ FP + ((1.0 - f)[:, None] * Ps).T @ Ps
        if l < L - 1:
            fn = free[l + 1]
            if allfree and bool(np.all(fn == 1.0)):
                Oc[l] = Oc_int
            else:
                Oc[l] = (f[:, None] * Ps).T @ O @ (fn[:, None] * Ps)

    # Degenerate aggregates (collinear / too-few nodes) have exact null
    # rigid-body modes: P e = 0, detected from the per-aggregate 6x6
    # Gram of P.  Those directions get a stiff decoupling diagonal so
    # the factorization is safe — EXACT for the data, which has exactly
    # zero component there (P^T r lies in range(P^T) = null(P)^perp).
    # A blunt relative ridge is NOT acceptable here: 1e-10 x the max
    # diagonal of a stiffness-scale matrix is ~1.0 absolute, comparable
    # to the coarse spectrum's legit smallest eigenvalues — it measurably
    # damaged exactly the low modes the coarse space exists to correct
    # (caught by the dense-oracle test).
    gram = np.zeros((As, 6, 6))
    for i in range(n2):
        a = agg_s[i]
        Pn = np.concatenate([eye3, Sx[i]], axis=1)  # (3, 6)
        gram[a] += Pn.T @ Pn
    decouple = np.zeros((As, 6, 6))
    for a in range(As):
        w_eig, V = np.linalg.eigh(gram[a])
        null = w_eig < 1e-8 * max(float(w_eig[-1]), 1.0)
        if null.any():
            Vn = V[:, null]
            decouple[a] = Vn @ Vn.T
    if decouple.any():
        for l in range(L):
            scale = max(float(np.trace(Dc[l])) / bc, 1.0)
            for a in range(As):
                Dc[l, 6 * a : 6 * a + 6, 6 * a : 6 * a + 6] += (
                    scale * decouple[a]
                )

    uinv = np.empty((L, bc, bc))
    G = np.empty((L - 1, bc, bc))
    U = Dc[0]
    uinv[0] = np.linalg.inv(U)
    for l in range(1, L):
        G[l - 1] = uinv[l - 1] @ Oc[l - 1]
        U = Dc[l] - Oc[l - 1].T @ G[l - 1]
        uinv[l] = np.linalg.inv(U)

    lay = np.repeat(np.arange(L, dtype=np.int64), n2)
    agg3d = (lay * As + np.tile(agg_s, L)).astype(np.int32)
    xrel3d = np.tile(xrel_s, (L, 1))
    # factors BUILT in f64 (the Schur chain needs it — see
    # _build_thomas_dev) but STORED/applied at f32: the 385-step f64
    # emulated scan cost ~13 ms/iteration at tube scale and erased the
    # iteration win; the f32 substitution error is preconditioner-side
    # inexactness FCG absorbs (slender-tube stability pinned by test)
    return SectionCoarse(
        agg=jnp.asarray(agg3d),
        xrel=jnp.asarray(xrel3d, jnp.float32),
        thomas_uinv=jnp.asarray(uinv, jnp.float32),
        thomas_g=jnp.asarray(G, jnp.float32),
        n_aggs=As,
        n_layers=L,
    )
