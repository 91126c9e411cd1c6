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


@partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("with_gg",))
def _accumulate_chunk(Ac, rs, d, ke_chunk, el, free_flat, xrel, agg,
                      with_gg=True):
    """One device pass per element chunk: scatter the masked,
    RBM-projected blocks into the dense coarse matrix AND accumulate the
    Gershgorin row sums / diagonal for the Chebyshev smoother bound.

    Everything per-chunk is DERIVED ON DEVICE from the int32 element
    slice ``el (C, 8)`` plus the resident ``free_flat (3N,)``,
    ``xrel (N, 3)``, ``agg (N,)`` — the earlier host-built
    per-chunk operands (P_e blocks, masks, index grids) uploaded ~4 MB
    per chunk through the axon tunnel (~300 MB at 256k elements), and
    the separate Gershgorin pass recomputed every Ke and pulled it to
    the host."""
    C = ke_chunk.shape[0]
    dof = (3 * el[:, :, None] + jnp.arange(3, dtype=el.dtype)).reshape(C, 24)
    f = free_flat[dof]  # (C, 24)
    km5 = (f[:, :, None] * ke_chunk * f[:, None, :]).reshape(C, 8, 3, 8, 3)
    # per-corner prolongation blocks [I3 | S(xrel)] built in-jit
    x = xrel[el]  # (C, 8, 3)
    z = jnp.zeros_like(x[..., 0])
    S = jnp.stack([
        jnp.stack([z, -x[..., 2], x[..., 1]], axis=-1),
        jnp.stack([x[..., 2], z, -x[..., 0]], axis=-1),
        jnp.stack([-x[..., 1], x[..., 0], z], axis=-1),
    ], axis=-2)  # (C, 8, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ke_chunk.dtype), S.shape)
    P_e = jnp.concatenate([eye, S], axis=-1)  # (C, 8, 3, 6)
    # two explicit batched matmuls (not one 3-operand einsum): bounds the
    # largest intermediate at (C, 8, 6, 8, 3) — the single einsum's
    # XLA:TPU lowering peaked ~19 GB HBM at chunk=8192 (emulated-f64
    # doubles every buffer) and killed the on-chip build
    t = jnp.einsum("caim,caibj->cambj", P_e, km5, precision=_HIGHEST)
    kc = jnp.einsum("cambj,cbjn->cambn", t, P_e,
                    precision=_HIGHEST).reshape(C, 48, 48)
    rowcol = (6 * agg[el][:, :, None]
              + jnp.arange(6, dtype=el.dtype)).reshape(C, 48)
    rows = jnp.broadcast_to(rowcol[:, :, None], (C, 48, 48))
    cols = jnp.broadcast_to(rowcol[:, None, :], (C, 48, 48))
    Ac = Ac.at[rows, cols].add(kc)
    if not with_gg:  # static: callers that discard the smoother data
        return Ac, rs, d  # skip the |ke| pass + scatters entirely
    # Gershgorin data of the MASKED operator: row sums bounded by the
    # triangle inequality over element |ke| with masked columns, diag
    # assembled exactly (see jacobi_gershgorin)
    rs_e = (jnp.abs(ke_chunk) * f[:, None, :]).sum(-1).reshape(-1)
    d_e = jnp.diagonal(ke_chunk, axis1=1, axis2=2).reshape(-1)
    return (
        Ac,
        rs.at[dof.reshape(-1)].add(rs_e),
        d.at[dof.reshape(-1)].add(d_e),
    )


def _element_ke_chunk(op, sl, dtype=jnp.float64) -> jax.Array:
    """(C, 24, 24) element stiffnesses for ``elements[sl]``, by kind."""
    from ..elements import hex8 as hex8_el

    C = sl.stop - sl.start
    if op.kind == "hex8_matfree":
        geom = dataclasses.replace(
            op.geom,
            grads=op.geom.grads[sl].astype(dtype),
            wdetj=op.geom.wdetj[sl].astype(dtype),
        )
        return hex8_el.stiffness_from_geometry(geom, op.material)
    if op.kind == "uniform":
        return jnp.broadcast_to(op.ke.astype(dtype), (C, 24, 24))
    return op.ke[sl].astype(dtype)  # stored


def coarse_matrix(op, agg: np.ndarray, n_aggs: int, xrel: np.ndarray, *,
                  chunk: int | None = None, ridge: float | None = None,
                  with_gershgorin: bool = False, dtype=jnp.float64):
    """Exact Galerkin coarse matrix P^T A P (6A, 6A) f64 of the MASKED
    operator (A = F K F + (1-F) I), rigid-body-mode P (plus the ridge
    described in the module docstring).

    ``with_gershgorin=True`` additionally returns ``(inv_diag (N, 3),
    lam_max)`` for the Chebyshev smoother — accumulated in the SAME
    device pass over the element Ke (the standalone
    :func:`jacobi_gershgorin` recomputes every Ke and pulls them to the
    host; merged, that second pass disappears).

    ``dtype=jnp.float32`` runs the whole device pass (Ke build, Galerkin
    contraction, scatters) in f32 — a severalfold build-time cut on TPU,
    where f64 is emulated.  Meant for consumers that use the result at
    f32 anyway (:class:`TwoLevelChebPrecond`): the coarse factorization
    still happens in host f64 on the f32-accumulated matrix, the ridge is
    floored above the f32 noise, and the Gershgorin bound is inflated by
    1e-3 — ~100x the accumulation error bound (~30 same-sign f32 adds per
    DOF row) — so it stays certified."""
    # normalize the dtype spec first (ADVICE r2): "float32",
    # np.float32, jnp.float32 must all hit the f32 safeguards below, and
    # anything below f32 (e.g. bfloat16) would skip them while still
    # accumulating at low precision — reject it outright.
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(
            f"coarse_matrix: build dtype must be float32 or float64, got "
            f"{dtype} (lower precisions would skip the f32 certification "
            "safeguards)"
        )
    f32_build = dtype != jnp.dtype(jnp.float64)
    if chunk is None:
        # TPU: the 15.75 GB chip OOMed at 8192 in f64 (scatter index
        # broadcasts + emulated-f64 buffer doubling); 2048 peaks well
        # under 5 GB.  The f32 build halves every buffer and drops the
        # emulation doubling, so 8192 fits comfortably.
        if jax.default_backend() == "tpu":
            chunk = 8192 if f32_build else 2048
        else:
            chunk = 8192
    # f32 accumulation noise (~eps * local magnitudes) sits far above the
    # default 1e-12 ridge; keep the null-rotational-mode protection above
    # the noise floor (data never has components there, see module
    # docstring, so legit modes only feel it at ~1e-7 relative).  An
    # EXPLICIT sub-floor ridge in f32 mode warns instead of silently
    # overriding (ADVICE r2): tests use ridge=0.0 as an exactness oracle,
    # which only the f64 build can honor.
    floor = 1e-7 if f32_build else 0.0
    if ridge is None:
        ridge = max(1e-12, floor)
    elif ridge < 0:
        # a negative ridge is a caller error in any dtype, not a noise-
        # floor clamp (ADVICE r3: the f32-floor warning misattributed it)
        raise ValueError(f"coarse_matrix: ridge must be >= 0, got {ridge:g}")
    elif ridge < floor:
        import warnings

        warnings.warn(
            f"coarse_matrix: ridge={ridge:g} is below the f32 build's "
            "accumulation noise floor; using 1e-7 (pass dtype=float64 "
            "for an exact-ridge build)",
            stacklevel=3,
        )
        ridge = floor
    elements = np.asarray(op.elements)
    E = elements.shape[0]
    free_np = np.asarray(op.free, np.float64)
    N = free_np.shape[0]
    n_c = 6 * n_aggs
    Ac = jnp.zeros((n_c, n_c), dtype)
    rs = jnp.zeros(3 * N, dtype)
    dg = jnp.zeros(3 * N, dtype)
    # resident once; per-chunk uploads are just the (C, 8) int32 slices
    free_dev = jnp.asarray(free_np.reshape(-1), dtype)
    xrel_dev = jnp.asarray(xrel, dtype)
    agg_dev = jnp.asarray(agg, jnp.int32)
    valid = None if op.valid is None else np.asarray(op.valid, np.float64)
    for start in range(0, E, chunk):
        sl = slice(start, min(start + chunk, E))
        ke_chunk = _element_ke_chunk(op, sl, dtype)
        if valid is not None:
            # padded element slots contribute zero stiffness (same
            # contract as operator.block_diag_raw / _element_apply)
            ke_chunk = ke_chunk * jnp.asarray(valid[sl], dtype)[:, None, None]
        Ac, rs, dg = _accumulate_chunk(
            Ac, rs, dg, ke_chunk,
            jnp.asarray(elements[sl], jnp.int32),
            free_dev, xrel_dev, agg_dev,
            with_gg=with_gershgorin,
        )
    Ac_np = np.array(Ac, np.float64)  # writable (and f64) host copy
    # P^T (1-F) P term (identity rows of the masked operator):
    # per-node 6x6 contribution sum_i P[n,i,:]^T (1-F)[n,i] P[n,i,:]
    P_node = np.concatenate(
        [np.broadcast_to(np.eye(3), (len(xrel), 3, 3)), _skew(xrel)], axis=-1
    )
    Pt1P = np.zeros((n_aggs, 6, 6))
    contrib = np.einsum("nim,ni,nio->nmo", P_node, 1.0 - free_np, P_node)
    np.add.at(Pt1P, np.asarray(agg, np.int64), contrib)
    idx = 6 * np.arange(n_aggs)[:, None] + np.arange(6)
    Ac_np[idx[:, :, None], idx[:, None, :]] += Pt1P
    # ridge: null rotational modes (collinear aggregates) get a positive
    # diagonal; data never has components there (range(P^T) ⟂ null(P))
    d = np.arange(n_c)
    scale = max(Ac_np[d, d].max(), 1.0)
    Ac_np[d, d] += ridge * scale
    empty = Ac_np[d, d] <= 0
    Ac_np[d[empty], d[empty]] = 1.0
    if not with_gershgorin:
        return Ac_np
    f = free_np.reshape(-1)
    d_np = np.asarray(dg, np.float64)
    rs_np = np.asarray(rs, np.float64)
    d_masked = np.where((f > 0) & (d_np > 0), d_np, 1.0)
    rs_masked = np.where(f > 0, f * rs_np, 1.0)
    lam = float(max(np.max(rs_masked / d_masked), 1.0))
    if f32_build:
        # certified despite f32 accumulation: the row sums are same-sign
        # adds (~24 terms/element x node valence), error bound well under
        # 1e-5 relative; inflate by 100x that.  An UNDER-estimated bound
        # diverges Chebyshev (round-1 1M-DOF incident, ops/multigrid.py)
        lam *= 1.001
    return Ac_np, (1.0 / d_masked).reshape(N, 3), lam


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


def _aggregate_setup(nodes, target_aggregates: int | None):
    """Shared coarse-space sizing + aggregation for both builders:
    ``None`` scales aggregates with the mesh (n_nodes/40, clamped to
    [64, 1024] — iteration counts are near-mesh-independent when the
    coarse space grows with the mesh, and the 1024 cap bounds the dense
    (6A, 6A) factorization at 6144^2)."""
    nodes = np.asarray(nodes)
    if target_aggregates is None:
        target_aggregates = min(1024, max(64, nodes.shape[0] // 40))
    agg, n_aggs = aggregate_nodes(nodes, target_aggregates)
    return agg, n_aggs, rigid_body_geometry(nodes, agg, n_aggs)


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
    agg, n_aggs, xrel = _aggregate_setup(nodes, target_aggregates)
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
                         chunk: int | None = None,
                         build_dtype=jnp.float32) -> TwoLevelChebPrecond:
    """Build the Chebyshev-smoothed two-level preconditioner.  Same
    aggregation/coarse machinery as :func:`build_two_level`, plus the
    chunked Gershgorin pass for the certified smoother bound.

    The device build pass runs at ``build_dtype`` — f32 by default, since
    every consumer in :class:`TwoLevelChebPrecond` is f32 anyway (smoother
    applies, coarse inverse, inv_diag): on TPU, where f64 is emulated,
    that cuts the dominant one-time cost of the general-mesh solve
    severalfold at identical iteration counts (see coarse_matrix's
    certification notes; pinned vs the f64 build by test)."""
    agg, n_aggs, xrel = _aggregate_setup(nodes, target_aggregates)
    # one device pass produces BOTH the Galerkin coarse matrix and the
    # certified smoother bound (pinned against the standalone
    # jacobi_gershgorin by test)
    Ac, inv_diag, lam = coarse_matrix(
        op, agg, n_aggs, xrel, chunk=chunk, with_gershgorin=True,
        dtype=build_dtype,
    )
    ac_inv = np.linalg.inv(Ac)
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
