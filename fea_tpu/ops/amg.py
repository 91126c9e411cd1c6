"""Arbitrary-topology scale path: node-major BCSR operator + multilevel
smoothed-aggregation (SA) multigrid (round-5, VERDICT r4 #3).

Two structural problems capped the genuine no-grid route (L-domains,
general hex meshes) at ~10-100x below the grid families:

1. **The apply.**  The element gather/scatter SpMV is traffic-bound —
   every application re-reads the (E, Q, 3, 8) geometry and pays a
   scatter-add over the incidence plan (~80 ms at 328k elements,
   docs/PERF.md "SpMV shoot-out").  Here the stiffness is ASSEMBLED once
   into node-major block-CSR: per node, a padded list of <= V neighbor
   nodes and their 3x3 coupling blocks,

       (K u)[n] = sum_v  W[n, v] @ u[nbr[n, v]],

   so the apply is ONE gather + one small einsum — no scatter, no
   per-element geometry traffic, ~27x less data touched per application
   (the same observation that makes the curvilinear stencil fast, made
   topology-free by carrying explicit neighbor indices).

2. **The preconditioner.**  The flat two-level RBM scheme
   (ops/twolevel.py) has a coarse space that grows with N; its dense
   coarse inverse and O(N)-size coarse work stop scaling.  Here the
   hierarchy is classic smoothed-aggregation AMG: geometric aggregation
   (reusing twolevel.aggregate_nodes), per-aggregate tentative
   prolongation from the rigid-body near-null space via normal-equation
   orthonormalization, Galerkin RAP coarse operators (again BCSR, block
   size 6), Chebyshev smoothing on every level, and a small dense
   coarsest inverse — iteration counts stay flat in N.  This is the
   reference's own ``# TODO iterative solver`` (/root/reference/
   fea.py:106) taken to its conclusion for meshes with no structure at
   all.

The solve wrapper (solve/unstructured.py::_solve_unstructured_amg) runs
the flagship architecture around it: pair-space double-f32 FCG with the
EFT BCSR apply (~2^-48 accuracy class), the SA V-cycle in f32, and host
exact-IEEE-f64 certification through the SAME assembled BCSR weights.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .df64 import _renorm, _two_sum, two_prod
from .multigrid import chebyshev_smooth

_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "BCSRHost",
    "BCSROperator",
    "BCSRPairOperator",
    "AMGPrecond",
    "assemble_bcsr",
    "build_amg",
    "bcsr_apply_np",
]


# -- host assembly -------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BCSRHost:
    """Host-side (exact IEEE f64) node-major block-sparse stiffness.

    ``nbr (N, V) int64`` neighbor node ids (padded entries point at node
    0 with an all-zero block, so no mask is needed in the apply);
    ``W (N, V, b, b) f64`` coupling blocks of the RAW (unmasked)
    operator.  The masked operator everything runs on is
    ``F A F + (1 - F)`` with F the free-DOF mask.
    """

    nbr: np.ndarray
    W: np.ndarray
    free: np.ndarray  # (N, b) f64 0/1
    min_detj: float = 1.0  # min element Jacobian det seen at assembly


def _reduce_triplets(rows, cols, vals, N):
    """Sum duplicate (row, col) block triplets; returns sorted-unique
    (rows_u, cols_u, sums)."""
    key = rows.astype(np.int64) * N + cols.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key = key[order]
    vals = vals[order]
    uniq, start = np.unique(key, return_index=True)
    sums = np.add.reduceat(vals, start, axis=0)
    return (uniq // N), (uniq % N), sums


def _pad_bcsr(rows_u, cols_u, sums, N, b):
    """Sorted-unique triplets -> padded (nbr (N, V), W (N, V, b, b))."""
    counts = np.bincount(rows_u, minlength=N)
    V = int(counts.max(initial=1))
    row_start = np.searchsorted(rows_u, np.arange(N))
    slot = np.arange(rows_u.size) - row_start[rows_u]
    nbr = np.zeros((N, V), np.int64)
    W = np.zeros((N, V, b, b))
    nbr[rows_u, slot] = cols_u
    W[rows_u, slot] = sums
    return nbr, W


def assemble_bcsr(nodes, elements, material, fixed) -> BCSRHost:
    """Assemble the hex8 stiffness into node-major BCSR on the host, in
    exact IEEE f64 (the same Ke integration the oracle paths use —
    ops/curvilinear._batched_ke_np; reference element:
    /root/reference/utils.py:127-239)."""
    from ..elements import hex8 as hex8_el
    from .curvilinear import _batched_ke_np

    nodes = np.asarray(nodes, np.float64)
    elements = np.asarray(elements)
    N = nodes.shape[0]
    # host detJ check data (the jit-safe stand-in for the reference's
    # ValueError, /root/reference/utils.py:212-215)
    X = nodes[elements]  # (E, 8, 3)
    D = np.asarray(hex8_el._D_QP, np.float64)
    detj = np.linalg.det(np.einsum("qda,ean->eqdn", D, X))
    min_detj = float(detj.min()) if detj.size else 1.0
    ke = _batched_ke_np(nodes, elements, material)  # (E, 24, 24)
    E = ke.shape[0]
    # (E, 8a, 8b, 3, 3) corner blocks
    blocks = ke.reshape(E, 8, 3, 8, 3).transpose(0, 1, 3, 2, 4)
    rows = np.repeat(elements, 8, axis=1).reshape(-1)  # (E*64,) node a
    cols = np.tile(elements, (1, 8)).reshape(-1)  # node b
    rows_u, cols_u, sums = _reduce_triplets(
        rows, cols, blocks.reshape(-1, 3, 3), N
    )
    nbr, W = _pad_bcsr(rows_u, cols_u, sums, N, 3)
    free = 1.0 - np.asarray(fixed, np.float64)
    return BCSRHost(nbr=nbr, W=W, free=free, min_detj=min_detj)


def bcsr_apply_np(h: BCSRHost, u: np.ndarray, *, masked: bool = True
                  ) -> np.ndarray:
    """Exact IEEE-f64 host apply (certification oracle).  u (N, b)."""
    u = np.asarray(u, np.float64)
    if masked:
        x = h.free * u
    else:
        x = u
    out = np.einsum("nvij,nvj->ni", h.W, x[h.nbr])
    if masked:
        return h.free * out + (1.0 - h.free) * u
    return out


# -- device operators ----------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSROperator:
    """Device node-major BCSR stiffness (any block size b).

    The apply is gather + product-reduce — no scatter anywhere; padded
    entries carry zero blocks, so no mask participates.

    Storage is the FLAT node-minor layout ``W2 (V*b*b, N)`` (row
    ``k = (v*b + j)*b + i`` holds entry W[n, v, i, j]) with ``nbrT
    (V, N)``: TPU tiles pad a 2D array's minor axes to (8, 128), so any
    array whose two minor dims include a size-3 axis can be re-tiled at
    8/3 x 128/3 = 42.7x padding — and XLA's layout assignment DOES pick
    such layouts for rematerialization copies of loop-invariant
    operands regardless of the input layout (measured twice at 554k
    DOF: two 7.13 GB HLO temps of a 171 MB (N,27,3,3) weight array,
    then again for its (27,3,3,N) transpose — OOM either way).  A flat
    (243, N) 2D array has no bad layout available: every retile costs
    <= ~1.3x.  Build from host row-major arrays with
    :meth:`from_row_major`.
    """

    nbrT: jax.Array  # (V, N) int32
    W2: jax.Array  # (V*b*b, N), row k = (v*b + j)*b + i
    free: jax.Array  # (N, b) 0/1, dtype = W2 dtype

    @staticmethod
    def from_row_major(nbr, W, free, *, dtype=jnp.float32) -> "BCSROperator":
        """(N, V) nbr + (N, V, b, b) W host arrays -> device operator."""
        W = np.asarray(W)
        N, V, b, _ = W.shape
        # (N, V, i, j) -> (V, j, i, N) -> flat rows k = (v*b + j)*b + i
        W2 = np.ascontiguousarray(W.transpose(1, 3, 2, 0)).reshape(V * b * b, N)
        return BCSROperator(
            nbrT=jnp.asarray(np.asarray(nbr).T, jnp.int32),
            W2=jnp.asarray(W2, dtype),
            free=jnp.asarray(free, dtype),
        )

    @property
    def n_dof(self) -> int:
        return self.free.shape[0] * self.free.shape[1]

    @property
    def dofs_per_node(self) -> int:
        return self.free.shape[1]

    def astype(self, dtype) -> "BCSROperator":
        return BCSROperator(
            nbrT=self.nbrT, W2=self.W2.astype(dtype),
            free=self.free.astype(dtype),
        )

    def apply_raw(self, u: jax.Array) -> jax.Array:
        b = self.free.shape[1]
        V = self.nbrT.shape[0]
        N = self.free.shape[0]
        uT = u.T  # (b, N)
        # b gathers of (V, N) from length-N vectors — 2D, N minor, no
        # small trailing dims anywhere
        g = jnp.stack([uT[j][self.nbrT] for j in range(b)], axis=1)  # (V, b, N)
        # broadcast-multiply + ONE reduction (the lowering class measured
        # sound on this toolchain; fused per-term accumulation chains
        # miscompile — ops/curvilinear.py::curv_apply_grid's lesson)
        prod = self.W2.astype(u.dtype).reshape(V * b, b, N) * g.reshape(
            V * b, 1, N
        )
        return prod.sum(axis=0).T  # (b, N) -> (N, b)

    def apply(self, u: jax.Array) -> jax.Array:
        F = self.free.astype(u.dtype)
        return F * self.apply_raw(F * u) + (1.0 - F) * u

    def diag_masked(self) -> jax.Array:
        # self block sits in slot v=0 (see build): d[n, i] = row i*(b+1)
        b = self.free.shape[1]
        d = self.W2[jnp.arange(b) * (b + 1)].T  # (N, b)
        F = self.free
        return F * d.astype(F.dtype) + (1.0 - F)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCSRPairOperator:
    """Masked BCSR apply on f32 (hi, lo) pairs at ~2^-48 accuracy — the
    ``pair_apply=True`` operator for ``fpcg_dd64_staged``.

    W is host-split into its exact f32 hi part plus the f64 remainder's
    f32 cast (Wh + Wl == W to f64); the apply accumulates the exact
    Dekker products of (Wh, state-hi) through a TwoSum chain over the
    (V x b) contraction terms and carries the first-order cross terms
    (Wh*lo, Wl*hi) in plain f32 — the ops/ddq EFT scheme on assembled
    weights instead of quadrature geometry (no scatter chain needed:
    BCSR has no scatter).

    Storage is the flat node-minor layout (see :class:`BCSROperator` —
    rematerialization copies of any 4D weight form with size-3 minor
    dims cost 42.7x padding, measured OOM at 554k DOF; the flat
    (V*b*b, N) 2D form caps every retile at ~1.3x and its in-loop
    block-column slices are contiguous row ranges).
    """

    nbrT: jax.Array  # (V, N) int32
    Wh2: jax.Array  # (V*b*b, N) f32, row k = (v*b + j)*b + i
    Wl2: jax.Array  # (V*b*b, N) f32
    free: jax.Array  # (N, b) f32 0/1

    def apply_raw(self, x):
        xh, xl = x  # (N, b) each
        V = self.nbrT.shape[0]
        b = xh.shape[1]
        xhT, xlT = xh.T, xl.T  # (b, N)
        gh = [xhT[j][self.nbrT] for j in range(b)]  # b x (V, N)
        gl = [xlT[j][self.nbrT] for j in range(b)]
        s = c = None
        for v in range(V):
            for j in range(b):
                r0 = (v * b + j) * b
                w_h = self.Wh2[r0 : r0 + b]  # (b, N) column j of block v
                w_l = self.Wl2[r0 : r0 + b]
                u_h = gh[j][v][None, :]  # (1, N)
                u_l = gl[j][v][None, :]
                p, e = two_prod(w_h, u_h)
                if s is None:
                    s, c = p, e
                else:
                    s, e2 = _two_sum(s, p)
                    c = c + (e + e2)
                c = c + (w_h * u_l + w_l * u_h)
        sh, sl = _renorm(s, c)  # (b, N)
        return sh.T, sl.T

    def apply(self, x):
        F = self.free
        xh, xl = x
        kh, kl = self.apply_raw((F * xh, F * xl))  # exact 0/1 masks
        G = 1.0 - F
        s, e = _two_sum(F * kh, G * xh)
        return _renorm(s, e + (F * kl + G * xl))


def _self_first(nbr, W, N):
    """Reorder each row so the self entry (col == row) sits in slot 0
    (diag_masked reads it there); every interior FE row has one."""
    rows = np.arange(N)
    is_self = nbr == rows[:, None]
    # rows without a self entry (impossible for FE meshes, but stay
    # safe): give slot 0 whatever is there
    has = is_self.any(axis=1)
    sidx = np.where(has, is_self.argmax(axis=1), 0)
    o = np.arange(nbr.shape[1])[None, :].repeat(N, axis=0)
    o[rows, sidx] = o[rows, 0]
    o[rows, 0] = sidx
    return np.take_along_axis(nbr, o, 1), np.take_along_axis(
        W, o[..., None, None], 1
    )


# -- smoothed-aggregation hierarchy -------------------------------------------


def _merge_tiny_aggregates(coords, agg, n_aggs, *, min_size):
    """Merge aggregates below ``min_size`` nodes into their nearest
    adequately-sized aggregate (by centroid) and compact ids.

    Geometric binning leaves tiny/singleton cells at irregular-domain
    corners (the L-domain produced size-1 aggregates); a near-empty
    aggregate's rigid-body Gram is near-singular, and its normalized
    tentative-P columns inject near-null coarse directions (measured
    cond(K_coarse) 3e14 -> FCG stall before this merge + the eig
    threshold fix)."""
    counts = np.bincount(agg, minlength=n_aggs)
    tiny = counts < min_size
    if not tiny.any() or (~tiny).sum() == 0:
        return agg, n_aggs
    centers = np.zeros((n_aggs, 3))
    np.add.at(centers, agg, np.asarray(coords, np.float64))
    centers /= np.maximum(counts, 1)[:, None]
    big_ids = np.nonzero(~tiny)[0]
    try:
        from scipy.spatial import cKDTree

        nearest = big_ids[cKDTree(centers[big_ids]).query(centers[tiny])[1]]
    except Exception:  # scipy-free fallback: chunked brute force
        nearest = np.empty(int(tiny.sum()), np.int64)
        tc = centers[tiny]
        for i0 in range(0, tc.shape[0], 1024):
            d = np.linalg.norm(
                tc[i0 : i0 + 1024, None, :] - centers[big_ids][None], axis=-1
            )
            nearest[i0 : i0 + 1024] = big_ids[d.argmin(axis=1)]
    remap = np.arange(n_aggs)
    remap[np.nonzero(tiny)[0]] = nearest
    new_ids, agg2 = np.unique(remap[agg], return_inverse=True)
    return agg2.astype(np.int32), int(new_ids.size)


def _tentative_P(agg, n_aggs, B, free):
    """Per-node tentative prolongation blocks from the near-null space.

    ``B (N, b, 6)`` near-null-space blocks (fine level: [I3 | S(xrel)]
    rigid-body modes), zeroed on fixed DOFs; per aggregate the 6 columns
    are orthonormalized by normal equations (G = B_a^T B_a, Q = B_a L^-T
    with G = L L^T) — zero-padded member rows stay exactly zero, unlike
    batched QR.  Near-singular modes (collinear/tiny aggregates) are
    DROPPED: their Q columns are zeroed and the coarse assembly pins the
    corresponding coarse DOF with an identity diagonal.

    Returns ``(P (N, b, 6), Bc (n_aggs, 6, 6), weak (n_aggs, 6) bool)``.
    """
    N, b, _ = B.shape
    Bf = B * free[:, :, None]  # fixed DOF rows leave the space
    # per-aggregate Gram: G_a = sum_{n in a} Bf[n]^T Bf[n]
    G = np.zeros((n_aggs, 6, 6))
    np.add.at(G, agg, np.einsum("nbi,nbj->nij", Bf, Bf))
    evals, evecs = np.linalg.eigh(G)  # ascending
    emax = np.maximum(evals[:, -1], 1e-300)
    # 1e-6 (not 1e-8): near-collinear/tiny aggregates produce
    # tiny-but-nonzero Gram modes whose normalized P columns inject
    # near-null coarse directions — measured cond(K_coarse) 3e14 on an
    # L-domain with singleton aggregates, which stalled FCG at 1e-3
    weak = evals < 1e-6 * emax[:, None]
    inv_sqrt = np.where(weak, 0.0, 1.0 / np.sqrt(np.where(weak, 1.0, evals)))
    # G^{-1/2} with weak modes projected out
    Ghalf_inv = np.einsum("aik,ak,ajk->aij", evecs, inv_sqrt, evecs)
    P = np.einsum("nbi,nij->nbj", Bf, Ghalf_inv[agg])
    # coarse near-null space: B = P Bc  =>  Bc = Q^T B_a = G^{1/2} (with
    # weak modes zeroed) expressed in the same column basis
    sqrtv = np.where(weak, 0.0, np.sqrt(np.maximum(evals, 0.0)))
    Bc = np.einsum("aik,ak,ajk->aij", evecs, sqrtv, evecs)
    return P, Bc, weak


def _galerkin_bcsr(nbr, W, free, P, agg, n_aggs, *, chunk=65536):
    """Coarse BCSR = P^T (F A F) P for a BCSR fine level.

    Processes node rows in chunks: each fine entry (n, v) with column
    m = nbr[n, v] contributes ``P[n]^T (F_n W F_m) P[m]`` to coarse pair
    (agg[n], agg[m]); triplets reduce per chunk and once more globally.
    """
    N = nbr.shape[0]
    rows_parts, cols_parts, vals_parts = [], [], []
    for s0 in range(0, N, chunk):
        s1 = min(s0 + chunk, N)
        nb = nbr[s0:s1]
        Wm = (
            W[s0:s1]
            * free[s0:s1, None, :, None]
            * free[nb][:, :, None, :]
        )
        Pm = P[nb]  # (C, V, b, 6)
        term = np.einsum("cbi,cvbd,cvdj->cvij", P[s0:s1], Wm, Pm)
        r = np.repeat(agg[s0 + np.arange(s1 - s0)], nb.shape[1])
        c = agg[nb].reshape(-1)
        ru, cu, su = _reduce_triplets(r, c, term.reshape(-1, 6, 6), n_aggs)
        rows_parts.append(ru)
        cols_parts.append(cu)
        vals_parts.append(su)
    ru, cu, su = _reduce_triplets(
        np.concatenate(rows_parts),
        np.concatenate(cols_parts),
        np.concatenate(vals_parts, axis=0),
        n_aggs,
    )
    return _pad_bcsr(ru, cu, su, n_aggs, 6)


def _gershgorin_bcsr(nbr, W, free):
    """(inv_diag (N, b), lam_max) of the Jacobi-scaled MASKED operator —
    certified row-sum bound (power iteration can under-estimate: the
    round-1 divergence lesson)."""
    N, V, b, _ = W.shape
    Wm = W * free[:, None, :, None] * free[nbr][:, :, None, :]
    rs = np.abs(Wm).sum(axis=(1, 3))  # (N, b) row sums of |entries|
    diag = np.zeros((N, b))
    rows = np.arange(N)
    is_self = nbr == rows[:, None]
    for v in range(V):
        sel = is_self[:, v]
        diag[sel] += np.einsum("nii->ni", Wm[sel, v])
    d_masked = np.where((free > 0) & (diag > 0), diag, 1.0)
    rs_masked = np.where(free > 0, rs, 1.0)
    lam = float(max(np.max(rs_masked / d_masked), 1.0))
    return 1.0 / d_masked, lam


def _dense_from_bcsr(nbr, W, free):
    """Masked dense matrix of the coarsest level."""
    N, V, b, _ = W.shape
    n = N * b
    K = np.zeros((n, n))
    for v in range(V):
        cols = nbr[:, v]
        blk = (
            W[:, v]
            * free[:, :, None]
            * free[cols][:, None, :]
        )
        for i in range(b):
            for j in range(b):
                np.add.at(K, (np.arange(N) * b + i, cols * b + j), blk[:, i, j])
    f = free.reshape(-1)
    K = f[:, None] * K * f[None, :]
    K[np.arange(n), np.arange(n)] += 1.0 - f
    return K


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _AMGLevel:
    op: BCSROperator  # masked f32 apply via .apply
    inv_diag: jax.Array  # (N, b) f32
    lam_max: jax.Array  # () f32
    # transfer to the NEXT (coarser) level; absent on the coarsest
    P: Optional[jax.Array]  # (N, b, 6) f32
    agg: Optional[jax.Array]  # (N,) int32
    n_aggs: int = dataclasses.field(metadata=dict(static=True), default=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AMGPrecond:
    """Multilevel SA V-cycle, callable on f32 (N, 3) residuals (the
    ``fpcg_dd64_staged`` precond contract)."""

    levels: tuple  # of _AMGLevel
    coarse_inv: jax.Array  # (nc, nc) f32
    degree: int = dataclasses.field(metadata=dict(static=True), default=2)
    lam_min_frac: float = dataclasses.field(
        metadata=dict(static=True), default=1.0 / 6.0
    )

    def _smooth(self, level, x, r):
        return chebyshev_smooth(
            level.op.apply, level.inv_diag, level.lam_max,
            self.lam_min_frac, self.degree, x, r,
        )

    def _restrict(self, level, r):
        # r_c[a] = sum_{n in a} P[n]^T r[n]
        contrib = jnp.einsum("nbi,nb->ni", level.P, r, precision=_HIGHEST)
        return jax.ops.segment_sum(
            contrib, level.agg, num_segments=level.n_aggs
        )

    def _prolong(self, level, zc):
        return jnp.einsum(
            "nbi,ni->nb", level.P, zc[level.agg], precision=_HIGHEST
        )

    def _vcycle(self, idx, r):
        level = self.levels[idx]
        if idx == len(self.levels) - 1:
            # f64 matmul (emulated on TPU — the coarsest level is tiny):
            # the coarse matrix carries the mesh's full conditioning and
            # an f32 inverse there is O(kappa * eps32) — garbage in
            # exactly the modes this level owns (the curvilinear
            # hierarchy's lesson, ops/curvilinear.py::CurvMultigridT)
            flat = r.reshape(-1).astype(jnp.float64)
            return (self.coarse_inv @ flat).astype(r.dtype).reshape(r.shape)
        z = self._smooth(level, jnp.zeros_like(r), r)
        rc = self._restrict(level, r - level.op.apply(z))
        coarse_free = self.levels[idx + 1].op.free
        zc = self._vcycle(idx + 1, coarse_free * rc)
        z = z + self._prolong(level, coarse_free * zc)
        return self._smooth(level, z, r)

    def __call__(self, r: jax.Array) -> jax.Array:
        return self._vcycle(0, r.astype(jnp.float32))


def build_amg(
    nodes,
    host: BCSRHost,
    *,
    degree: int = 2,
    nodes_per_aggregate: int = 32,
    max_coarse_dof: int = 4000,
    max_levels: int = 6,
    progress=None,
) -> AMGPrecond:
    """Build the SA hierarchy from a host BCSR level-0.

    Aggregation is geometric on per-level coordinates (fine: node
    positions; coarser: aggregate centroids), the near-null space is
    propagated through the tentative prolongations (B_{l+1} = G^{1/2}),
    and every level's smoother bound is a certified Gershgorin row sum.
    """
    from .twolevel import aggregate_nodes

    say = progress if progress is not None else (lambda s: None)
    nbr, W = _self_first(host.nbr, host.W, host.nbr.shape[0])
    free = host.free
    coords = np.asarray(nodes, np.float64)
    N, _, b, _ = W.shape

    # fine near-null space: rigid-body modes [I3 | S(xrel)] about a
    # global center, radius-normalized for conditioning
    center = coords.mean(axis=0)
    xrel = coords - center
    rad = max(float(np.linalg.norm(xrel, axis=1).max()), 1e-30)
    xrel = xrel / rad
    S = np.zeros((N, 3, 3))
    S[:, 0, 1], S[:, 0, 2] = -xrel[:, 2], xrel[:, 1]
    S[:, 1, 0], S[:, 1, 2] = xrel[:, 2], -xrel[:, 0]
    S[:, 2, 0], S[:, 2, 1] = -xrel[:, 1], xrel[:, 0]
    B = np.concatenate([np.broadcast_to(np.eye(3), (N, 3, 3)), S], axis=2)

    levels = []
    while True:
        n_dof = nbr.shape[0] * b
        inv_diag, lam = _gershgorin_bcsr(nbr, W, free)
        say(f"amg level {len(levels)}: {nbr.shape[0]} nodes x {b} dof, "
            f"V={nbr.shape[1]}, lam_max {lam:.2f}")
        dev_op = BCSROperator.from_row_major(nbr, W, free)
        lvl = dict(
            op=dev_op,
            inv_diag=jnp.asarray(inv_diag, jnp.float32),
            lam_max=jnp.asarray(lam, jnp.float32),
            P=None, agg=None, n_aggs=0,
        )
        if n_dof <= max_coarse_dof or len(levels) + 1 >= max_levels:
            levels.append(_AMGLevel(**lvl))
            break
        n_target = max(1, nbr.shape[0] // nodes_per_aggregate)
        agg, n_aggs = aggregate_nodes(coords, n_target)
        agg, n_aggs = _merge_tiny_aggregates(
            coords, agg, n_aggs,
            min_size=max(2, nodes_per_aggregate // 8),
        )
        if n_aggs >= nbr.shape[0]:  # aggregation stopped making progress
            levels.append(_AMGLevel(**lvl))
            break
        say(f"amg aggregate -> {n_aggs} aggregates")
        P, Bc, weak = _tentative_P(agg, n_aggs, B, free)
        nbr_c, W_c = _galerkin_bcsr(nbr, W, free, P, agg, n_aggs)
        nbr_c, W_c = _self_first(nbr_c, W_c, n_aggs)
        # coarse free mask: weak (dropped) modes are pinned
        free_c = np.where(weak, 0.0, 1.0)
        # pin weak coarse DOFs with unit diagonals (slot 0 = self)
        for k in range(6):
            sel = weak[:, k]
            W_c[sel, 0, k, k] = np.where(
                W_c[sel, 0, k, k] > 0, W_c[sel, 0, k, k], 1.0
            )
        lvl["P"] = jnp.asarray(P, jnp.float32)
        lvl["agg"] = jnp.asarray(agg, jnp.int32)
        lvl["n_aggs"] = int(n_aggs)
        levels.append(_AMGLevel(**lvl))
        # next level state
        counts = np.bincount(agg, minlength=n_aggs).astype(np.float64)
        centers = np.zeros((n_aggs, 3))
        np.add.at(centers, agg, coords)
        coords = centers / counts[:, None]
        nbr, W, free, B, b = nbr_c, W_c, free_c, Bc, 6

    say(f"amg coarsest dense inverse ({nbr.shape[0] * b} DOF)")
    K = _dense_from_bcsr(nbr, W, free)
    coarse_inv = np.linalg.inv(K)
    return AMGPrecond(
        levels=tuple(levels),
        coarse_inv=jnp.asarray(coarse_inv, jnp.float64),
        degree=degree,
    )


def split_bcsr_pair(host: BCSRHost) -> BCSRPairOperator:
    """Device pair operator from the host f64 weights (exact hi + f32
    remainder split)."""
    Wh = host.W.astype(np.float32)
    Wl = (host.W - Wh.astype(np.float64)).astype(np.float32)
    N, V, b, _ = host.W.shape

    def flat(a):  # (N, V, i, j) -> rows k = (v*b + j)*b + i
        return np.ascontiguousarray(a.transpose(1, 3, 2, 0)).reshape(
            V * b * b, N
        )

    return BCSRPairOperator(
        nbrT=jnp.asarray(host.nbr.T, jnp.int32),
        Wh2=jnp.asarray(flat(Wh)),
        Wl2=jnp.asarray(flat(Wl)),
        free=jnp.asarray(host.free, jnp.float32),
    )
