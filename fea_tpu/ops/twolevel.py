"""Two-level preconditioner for UNSTRUCTURED meshes: geometric node
aggregation + Galerkin coarse correction + nodal 3x3 block-Jacobi.

Why this exists: the voxel family has the stencil multigrid and the
extruded family the z-semicoarsened multigrid, but a general mesh fell
back to (block-)Jacobi-PCG whose iteration count grows like O(1/h) —
SURVEY.md §7 "Jacobi adequacy" ("plain Jacobi-PCG on elasticity can
need O(10^3) iterations at 1M DOF").  A coarse space restores global
error transport: iterations drop several-fold and grow far slower with
mesh size.  The reference has no preconditioner of any kind (dense
``np.linalg.solve``, /root/reference/fea.py:105).

TPU-first design decisions:

* Aggregates come from pure coordinate binning (host, O(N)) — works for
  any mesh, no graph partitioner dependency.
* The coarse space is RIGID-BODY MODES per aggregate (3 translations +
  3 rotations about the aggregate centroid, radius-normalized): the
  rotational modes are what carry bending error on slender structures —
  a translation-only space measured only a ~20% iteration cut where the
  RBM space cuts several-fold.  P_n = [I3 | S(xrel_n)] with S the
  cross-product matrix.
* The coarse matrix is the exact Galerkin product P^T A P of the MASKED
  operator — assembled element-by-element in fixed-size device chunks
  (one scatter-add per chunk, static shapes), never touching an
  (E, 24, 24) materialization of the whole mesh at once.  Aggregates
  whose nodes are collinear make a rotational mode null; a tiny ridge on
  the diagonal keeps the factorization safe (restriction lives in
  range(P^T) = null(P)^perp, so the ridge is never seen by the data).
* The coarse inverse is a DENSE (6A, 6A) matrix — applied as one MXU
  matmul per iteration (A ~ 512 -> a 3072^2 matvec, microseconds);
  factored once on the host in f64.
* The preconditioner is additive Schwarz: z = B^-1 r + P A_c^-1 P^T r
  with B the nodal 3x3 block diagonal — both terms SPD, so the sum is
  SPD and CG theory applies unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "TwoLevelChebPrecond",
    "TwoLevelPrecond",
    "aggregate_nodes",
    "build_two_level",
    "build_two_level_cheb",
    "jacobi_gershgorin",
    "rigid_body_geometry",
]


def aggregate_nodes(nodes: np.ndarray, target: int) -> tuple[np.ndarray, int]:
    """Geometric aggregation: bin nodes into ~``target`` bounding-box
    cells (cell counts per axis proportional to extent), compacted to
    contiguous aggregate ids.  Returns (agg (N,) int32, n_aggs)."""
    nodes = np.asarray(nodes, np.float64)
    lo = nodes.min(axis=0)
    span = nodes.max(axis=0) - lo
    span = np.where(span > 0, span, 1.0)
    # cells-per-axis ~ span / h with h chosen so prod(span/h) ~ target
    h = (np.prod(span) / max(target, 1)) ** (1.0 / 3.0)
    k = np.maximum(1, np.round(span / h)).astype(np.int64)
    ix = np.minimum((nodes - lo) / (span / k), k - 1e-9).astype(np.int64)
    cell = (ix[:, 0] * k[1] + ix[:, 1]) * k[2] + ix[:, 2]
    _, agg = np.unique(cell, return_inverse=True)
    return agg.astype(np.int32), int(agg.max()) + 1


def rigid_body_geometry(nodes: np.ndarray, agg: np.ndarray, n_aggs: int
                        ) -> np.ndarray:
    """Radius-normalized node offsets from their aggregate centroid,
    (N, 3) f64 — the rotational part of P_n = [I3 | S(xrel_n)]."""
    nodes = np.asarray(nodes, np.float64)
    counts = np.bincount(agg, minlength=n_aggs).astype(np.float64)
    centers = np.zeros((n_aggs, 3))
    np.add.at(centers, agg, nodes)
    centers /= counts[:, None]
    xrel = nodes - centers[agg]
    rad = np.zeros(n_aggs)
    np.maximum.at(rad, agg, np.linalg.norm(xrel, axis=1))
    rad = np.where(rad > 0, rad, 1.0)
    return xrel / rad[agg, None]


def _skew(v: np.ndarray) -> np.ndarray:
    """(N, 3) -> (N, 3, 3) cross-product matrices S(v) w = v x w."""
    z = np.zeros(v.shape[0])
    return np.stack([
        np.stack([z, -v[:, 2], v[:, 1]], axis=-1),
        np.stack([v[:, 2], z, -v[:, 0]], axis=-1),
        np.stack([-v[:, 1], v[:, 0], z], axis=-1),
    ], axis=-2)


@partial(jax.jit, donate_argnums=(0,))
def _accumulate_chunk(Ac, ke_chunk, free_e, P_e, rowcol):
    """Scatter one chunk of masked, RBM-projected element blocks into the
    dense coarse matrix.  ke_chunk (C, 24, 24); free_e (C, 8, 3) mask;
    P_e (C, 8, 3, 6) per-corner prolongation blocks; rowcol (C, 48) int32
    coarse-dof index per (corner, mode)."""
    C = ke_chunk.shape[0]
    f = free_e.reshape(C, 24)
    km = (f[:, :, None] * ke_chunk * f[:, None, :]).reshape(C, 8, 3, 8, 3)
    # two explicit batched matmuls (not one 3-operand einsum): bounds the
    # largest intermediate at (C, 8, 6, 8, 3) — the single einsum's
    # XLA:TPU lowering peaked ~19 GB HBM at chunk=8192 (emulated-f64
    # doubles every buffer) and killed the on-chip build
    t = jnp.einsum("caim,caibj->cambj", P_e, km, precision=_HIGHEST)
    kc = jnp.einsum("cambj,cbjn->cambn", t, P_e,
                    precision=_HIGHEST).reshape(C, 48, 48)
    rows = jnp.broadcast_to(rowcol[:, :, None], (C, 48, 48))
    cols = jnp.broadcast_to(rowcol[:, None, :], (C, 48, 48))
    return Ac.at[rows, cols].add(kc)


def _element_ke_chunk(op, sl) -> jax.Array:
    """(C, 24, 24) f64 element stiffnesses for ``elements[sl]``, by kind."""
    from ..elements import hex8 as hex8_el

    C = sl.stop - sl.start
    if op.kind == "hex8_matfree":
        geom = dataclasses.replace(
            op.geom,
            grads=op.geom.grads[sl].astype(jnp.float64),
            wdetj=op.geom.wdetj[sl].astype(jnp.float64),
        )
        return hex8_el.stiffness_from_geometry(geom, op.material)
    if op.kind == "uniform":
        return jnp.broadcast_to(op.ke.astype(jnp.float64), (C, 24, 24))
    return op.ke[sl].astype(jnp.float64)  # stored


def coarse_matrix(op, agg: np.ndarray, n_aggs: int, xrel: np.ndarray, *,
                  chunk: int | None = None, ridge: float = 1e-12) -> np.ndarray:
    """Exact Galerkin coarse matrix P^T A P (6A, 6A) f64 of the MASKED
    operator (A = F K F + (1-F) I), rigid-body-mode P (plus the ridge
    described in the module docstring)."""
    if chunk is None:
        # TPU: the 15.75 GB chip OOMed at 8192 (scatter index broadcasts
        # + emulated-f64 buffer doubling); 2048 peaks well under 5 GB
        chunk = 2048 if jax.default_backend() == "tpu" else 8192
    elements = np.asarray(op.elements)
    E = elements.shape[0]
    free_np = np.asarray(op.free, np.float64)
    n_c = 6 * n_aggs
    # per-node (3, 6) prolongation block [I3 | S(xrel)]
    P_node = np.concatenate(
        [np.broadcast_to(np.eye(3), (len(xrel), 3, 3)), _skew(xrel)], axis=-1
    )
    Ac = jnp.zeros((n_c, n_c), jnp.float64)
    agg_j = np.asarray(agg, np.int64)
    valid = None if op.valid is None else np.asarray(op.valid, np.float64)
    for start in range(0, E, chunk):
        sl = slice(start, min(start + chunk, E))
        ke_chunk = _element_ke_chunk(op, sl)
        if valid is not None:
            # padded element slots contribute zero stiffness (same
            # contract as operator.block_diag_raw / _element_apply)
            ke_chunk = ke_chunk * jnp.asarray(valid[sl])[:, None, None]
        el = elements[sl]
        free_e = jnp.asarray(free_np[el])  # (C, 8, 3)
        P_e = jnp.asarray(P_node[el])      # (C, 8, 3, 6)
        rc = (6 * agg_j[el][:, :, None] + np.arange(6)).reshape(-1, 48)
        Ac = _accumulate_chunk(
            Ac, ke_chunk, free_e, P_e, jnp.asarray(rc, jnp.int32)
        )
    Ac_np = np.array(Ac)  # writable host copy
    # P^T (1-F) P term (identity rows of the masked operator):
    # per-node 6x6 contribution sum_i P[n,i,:]^T (1-F)[n,i] P[n,i,:]
    Pt1P = np.zeros((n_aggs, 6, 6))
    contrib = np.einsum("nim,ni,nio->nmo", P_node, 1.0 - free_np, P_node)
    np.add.at(Pt1P, agg_j, contrib)
    idx = 6 * np.arange(n_aggs)[:, None] + np.arange(6)
    Ac_np[idx[:, :, None], idx[:, None, :]] += Pt1P
    # ridge: null rotational modes (collinear aggregates) get a positive
    # diagonal; data never has components there (range(P^T) ⟂ null(P))
    d = np.arange(n_c)
    scale = max(Ac_np[d, d].max(), 1.0)
    Ac_np[d, d] += ridge * scale
    empty = Ac_np[d, d] <= 0
    Ac_np[d[empty], d[empty]] = 1.0
    return Ac_np


def _coarse_correct(agg, xrel, ac_inv, n_aggs, r):
    """P A_c^-1 P^T r for the rigid-body-mode coarse space."""
    x = xrel.astype(r.dtype)
    # restriction P^T r: translations sum r, rotations sum S(x)^T r
    # = -x × r = r × x
    rc = jnp.concatenate([r, jnp.cross(r, x)], axis=-1)  # (N, 6)
    rc = jax.ops.segment_sum(rc, agg, num_segments=n_aggs)
    zc = jnp.dot(ac_inv.astype(r.dtype), rc.reshape(-1),
                 precision=_HIGHEST).reshape(n_aggs, 6)
    # prolongation P z_c: translation + S(x) rot = x × rot
    zca = zc[agg]
    return zca[:, :3] + jnp.cross(x, zca[:, 3:])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoLevelPrecond:
    """z = B^-1 r + P A_c^-1 P^T r — additive Schwarz of the nodal 3x3
    block-Jacobi and the exact coarse correction.  A jit-traversable
    pytree; call it as the ``precond`` of :func:`fea_tpu.solvers.cg.pcg`."""

    agg: jax.Array          # (N,) int32 aggregate id per node
    xrel: jax.Array         # (N, 3) radius-normalized centroid offsets
    binv: jax.Array         # (N, 3, 3) inverted masked diagonal blocks
    ac_inv: jax.Array       # (6A, 6A) dense coarse inverse
    n_aggs: int = dataclasses.field(metadata=dict(static=True))

    def __call__(self, r: jax.Array) -> jax.Array:
        z1 = jnp.einsum("nij,nj->ni", self.binv.astype(r.dtype), r,
                        precision=_HIGHEST)
        return z1 + _coarse_correct(
            self.agg, self.xrel, self.ac_inv, self.n_aggs, r
        )


def build_two_level(op, nodes, *, target_aggregates: int | None = None,
                    chunk: int | None = None) -> TwoLevelPrecond:
    """Build the two-level preconditioner for a (typically unstructured)
    operator.  O(E) chunked device assembly + one host f64 factorization
    of the (6A, 6A) coarse matrix (~10 s at A = 512 on this container).

    ``target_aggregates=None`` scales the coarse space with the mesh
    (n_nodes/40, clamped to [64, 1024]): measured iteration counts are
    near-mesh-independent when aggregates grow with the mesh but creep
    up at a fixed count (docs/PERF.md "Unstructured path"); the 1024 cap
    bounds the dense (6A, 6A) factorization at 6144^2."""
    if target_aggregates is None:
        n_nodes = int(np.asarray(nodes).shape[0])
        target_aggregates = min(1024, max(64, n_nodes // 40))
    agg, n_aggs = aggregate_nodes(np.asarray(nodes), target_aggregates)
    xrel = rigid_body_geometry(np.asarray(nodes), agg, n_aggs)
    Ac = coarse_matrix(op, agg, n_aggs, xrel, chunk=chunk)
    ac_inv = np.linalg.inv(Ac)
    return TwoLevelPrecond(
        agg=jnp.asarray(agg),
        xrel=jnp.asarray(xrel),
        binv=op.block_diag_inv_masked(),
        ac_inv=jnp.asarray(ac_inv),
        n_aggs=n_aggs,
    )


def jacobi_gershgorin(op, *, chunk: int = 8192) -> tuple[np.ndarray, float]:
    """Masked-operator Jacobi data with a CERTIFIED Chebyshev bound:
    returns ``(inv_diag (N, 3), lam_max)`` where
    ``lam_max >= lambda_max(D^-1 A)``.

    The bound is Gershgorin on the Jacobi-scaled masked operator,
    ``lambda_max <= max_i (sum_j |a_ij|) / a_ii``, with the row sums
    bounded entrywise by the triangle inequality over element
    contributions ``sum_e sum_{j free} |ke_e[i, j]|`` — computable in one
    chunked pass without assembling A.  Certified matters: power
    iteration UNDER-estimates lambda_max at fine meshes and a Chebyshev
    smoother run past the true spectrum diverges (the round-1 1M-DOF
    divergence — see ops/multigrid.py).
    """
    elements = np.asarray(op.elements)
    E = elements.shape[0]
    free = np.asarray(op.free, np.float64)  # (N, 3)
    N = free.shape[0]
    valid = None if op.valid is None else np.asarray(op.valid, np.float64)
    rs = np.zeros(3 * N)
    d = np.zeros(3 * N)
    dof = (3 * elements[:, :, None] + np.arange(3)).reshape(E, 24)
    for start in range(0, E, chunk):
        sl = slice(start, min(start + chunk, E))
        ke = np.asarray(_element_ke_chunk(op, sl), np.float64)
        if valid is not None:
            ke = ke * valid[sl][:, None, None]
        free_e = free.reshape(-1)[dof[sl]]  # (C, 24) column mask
        np.add.at(rs, dof[sl].reshape(-1),
                  (np.abs(ke) * free_e[:, None, :]).sum(-1).reshape(-1))
        np.add.at(d, dof[sl].reshape(-1),
                  np.diagonal(ke, axis1=1, axis2=2).reshape(-1))
    f = free.reshape(-1)
    d_masked = np.where((f > 0) & (d > 0), d, 1.0)
    rs_masked = np.where(f > 0, f * rs, 1.0)
    lam = float(max(np.max(rs_masked / d_masked), 1.0))
    return (1.0 / d_masked).reshape(N, 3), lam


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoLevelChebPrecond:
    """Chebyshev-smoothed MULTIPLICATIVE two-level preconditioner, all
    internal work in f32:

        y = Cheb_nu(0, r)                    pre-smooth
        y = y + P A_c^-1 P^T (r - A32 y)     exact RBM coarse correction
        z = Cheb_nu(y, r)                    post-smooth

    Versus the additive :class:`TwoLevelPrecond`: the smoother damps the
    high-frequency error the coarse space cannot see, and the
    multiplicative composition applies the coarse correction to the
    SMOOTHED residual — measured 2.5-4x fewer FCG iterations (see
    docs/PERF.md "Unstructured path").  Cost per application: 2*degree+1
    f32 operator applies (cheap: the f32 gather/scatter apply measured
    17.9 ms where the emulated-f64 one costs 259 ms at 55k elements).

    Meant as the ``precond`` of :func:`fea_tpu.solvers.cg.fpcg` — the
    f64 recurrence tracks the true residual while this does the
    bandwidth-heavy work in f32 (the flagship fpcg+multigrid
    architecture, applied to general meshes).  Symmetric V(nu,nu)
    composition with an SPD smoother keeps the preconditioner SPD;
    flexible (Polak-Ribiere) CG absorbs the f32 evaluation noise.
    """

    op32: object            # f32 StiffnessOperator (pytree)
    agg: jax.Array          # (N,) int32 aggregate id per node
    xrel: jax.Array         # (N, 3) radius-normalized centroid offsets
    inv_diag: jax.Array     # (N, 3) f32 1/diag of the masked operator
    lam_max: jax.Array      # () f32 certified Gershgorin bound
    ac_inv: jax.Array       # (6A, 6A) f32 dense coarse inverse
    n_aggs: int = dataclasses.field(metadata=dict(static=True))
    degree: int = dataclasses.field(metadata=dict(static=True), default=2)
    lam_min_frac: float = dataclasses.field(
        metadata=dict(static=True), default=1.0 / 6.0
    )

    def __call__(self, r: jax.Array) -> jax.Array:
        from .multigrid import chebyshev_smooth

        r32 = r.astype(jnp.float32)
        y = chebyshev_smooth(
            self.op32.apply, self.inv_diag, self.lam_max,
            self.lam_min_frac, self.degree, jnp.zeros_like(r32), r32,
        )
        y = y + _coarse_correct(
            self.agg, self.xrel, self.ac_inv, self.n_aggs,
            r32 - self.op32.apply(y),
        )
        return chebyshev_smooth(
            self.op32.apply, self.inv_diag, self.lam_max,
            self.lam_min_frac, self.degree, y, r32,
        )


def build_two_level_cheb(op, nodes, *, target_aggregates: int | None = None,
                         degree: int = 2, lam_min_frac: float = 1.0 / 6.0,
                         chunk: int | None = None) -> TwoLevelChebPrecond:
    """Build the Chebyshev-smoothed two-level preconditioner.  Same
    aggregation/coarse machinery as :func:`build_two_level`, plus the
    chunked Gershgorin pass for the certified smoother bound."""
    if target_aggregates is None:
        n_nodes = int(np.asarray(nodes).shape[0])
        target_aggregates = min(1024, max(64, n_nodes // 40))
    agg, n_aggs = aggregate_nodes(np.asarray(nodes), target_aggregates)
    xrel = rigid_body_geometry(np.asarray(nodes), agg, n_aggs)
    Ac = coarse_matrix(op, agg, n_aggs, xrel, chunk=chunk)
    ac_inv = np.linalg.inv(Ac)
    inv_diag, lam = jacobi_gershgorin(op)
    return TwoLevelChebPrecond(
        op32=op.astype(jnp.float32),
        agg=jnp.asarray(agg),
        xrel=jnp.asarray(xrel, jnp.float32),
        inv_diag=jnp.asarray(inv_diag, jnp.float32),
        lam_max=jnp.asarray(lam, jnp.float32),
        ac_inv=jnp.asarray(ac_inv, jnp.float32),
        n_aggs=n_aggs,
        degree=degree,
        lam_min_frac=lam_min_frac,
    )
