"""8-node trilinear hexahedral solid element, batched for TPU.

Same formulation as the reference element (``/root/reference/utils.py:
127-239``): 2x2x2 Gauss quadrature, isotropic 3D elasticity, engineering
shear strain in Voigt order (xx, yy, zz, xy, yz, zx), node order bottom
face CCW then top face CCW — but computed for *all* elements at once from
dense ``(E, 8, 3)`` coordinate arrays, with three TPU-native departures:

  1. Shape-function natural gradients are a compile-time constant table
     ``D (8 qp, 3, 8 nodes)`` instead of being rebuilt per Gauss point
     (reference rebuilds them per element per qp, utils.py:159-207).
  2. The non-positive-Jacobian check cannot ``raise`` under jit
     (reference raises at utils.py:212-215); geometry precompute returns
     ``min_detj`` as a data-dependent error flag for the host to assert.
  3. A matrix-free ``apply_elements`` evaluates f_e = Ke @ u_e via the
     quadrature loop without ever forming Ke — sigma = lam tr(eps) I +
     2 mu eps at each qp — which is what the element-by-element CG
     operator rides (SURVEY.md §7 stage 3).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..materials import Material, elasticity_matrix, lame_parameters

# TPU f32 matmuls default to bf16 multiply passes; FEA operators need the
# full f32 contraction (3e-3 relative error measured otherwise).
_HIGHEST = jax.lax.Precision.HIGHEST

__all__ = [
    "CORNER_SIGNS",
    "natural_gradients",
    "Hex8Geometry",
    "precompute_geometry",
    "stiffness_matrices",
    "stiffness_matrix_np",
    "apply_elements",
    "diagonal",
    "centroid_strain_stress",
    "von_mises",
]

# Natural coordinates (xi, eta, zeta) of the 8 corners; row a is node a.
# Bottom face CCW then top face CCW (/root/reference/utils.py:352).
CORNER_SIGNS = np.array(
    [
        [-1, -1, -1],
        [+1, -1, -1],
        [+1, +1, -1],
        [-1, +1, -1],
        [-1, -1, +1],
        [+1, -1, +1],
        [+1, +1, +1],
        [-1, +1, +1],
    ],
    dtype=np.float64,
)

# 2x2x2 Gauss points: the corner pattern scaled to +-1/sqrt(3), weight 1.
_GAUSS_POINTS = CORNER_SIGNS / np.sqrt(3.0)


def natural_gradients(points: np.ndarray | None = None) -> np.ndarray:
    """dN_a/d(xi_d) evaluated at quadrature points: (Q, 3, 8) table.

    N_a(x) = (1/8) prod_d (1 + x_d * s_{a,d}), so
    dN_a/dx_d = (s_{a,d}/8) * prod_{d' != d} (1 + x_{d'} * s_{a,d'}).
    """
    pts = _GAUSS_POINTS if points is None else np.atleast_2d(points)
    Q = pts.shape[0]
    terms = 1.0 + pts[:, None, :] * CORNER_SIGNS[None, :, :]  # (Q, 8, 3)
    D = np.empty((Q, 3, 8), dtype=np.float64)
    for d in range(3):
        others = [d2 for d2 in range(3) if d2 != d]
        D[:, d, :] = CORNER_SIGNS[None, :, d] / 8.0 * terms[:, :, others[0]] * terms[:, :, others[1]]
    return D


_D_QP = natural_gradients()  # (8, 3, 8) at the Gauss points
_D_CENTROID = natural_gradients(np.zeros((1, 3)))  # (1, 3, 8) at xi = 0


def _det3(J: jax.Array) -> jax.Array:
    """Determinant of (..., 3, 3) via cofactor expansion (vectorizes on VPU)."""
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
        - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
        + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
    )


def _inv3(J: jax.Array, det: jax.Array) -> jax.Array:
    """Inverse of (..., 3, 3) via adjugate / det."""
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1],
                    J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2],
                    J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2],
                    J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0],
                    J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0],
                    J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1],
                    J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hex8Geometry:
    """Precomputed per-element quadrature geometry.

    grads:   (E, Q, 3, 8) global shape-function gradients J^-1 @ D
    wdetj:   (E, Q) quadrature weight * |J|  (weights are 1 for 2x2x2)
    min_detj: () scalar — the jit-safe replacement for the reference's
              ValueError on non-positive Jacobians (utils.py:212-215);
              host code asserts min_detj > 0 once per assembly.
    """

    grads: jax.Array
    wdetj: jax.Array
    min_detj: jax.Array


def precompute_geometry(nodes: jax.Array, elements: jax.Array, dtype=None) -> Hex8Geometry:
    """Integrate element geometry for all E elements at once.

    nodes (N, 3), elements (E, 8) -> Hex8Geometry.  Pure einsum: the whole
    mesh's Jacobians invert in one fused VPU pass, no Python loop.  Runs
    as ONE jitted program: eagerly it was ~25 per-op device dispatches,
    each exposed to an axon-tunnel stall (operator builds measured 68 s
    in a good window and 746-1024 s in wedged ones at 55k elements).
    """
    dtype = dtype or nodes.dtype
    return _precompute_geometry_jit(nodes, elements, jnp.dtype(dtype).name)


@partial(jax.jit, static_argnames=("dtype",))
def _precompute_geometry_jit(nodes, elements, dtype) -> Hex8Geometry:
    X = nodes[elements].astype(dtype)  # (E, 8, 3)
    D = jnp.asarray(_D_QP, dtype)  # (Q, 3, 8)
    # J[e, q, d, n] = d x_n / d xi_d
    J = jnp.einsum("qda,ean->eqdn", D, X, precision=_HIGHEST)
    detj = _det3(J)  # (E, Q)
    Jinv = _inv3(J, detj)
    G = jnp.einsum("eqdi,qia->eqda", Jinv, D, precision=_HIGHEST)  # (E, Q, 3, 8)
    return Hex8Geometry(grads=G, wdetj=detj, min_detj=jnp.min(detj))


def stiffness_matrices(nodes: jax.Array, elements: jax.Array, material: Material, dtype=None) -> jax.Array:
    """Explicit (E, 24, 24) stiffness batch — sum_q w detJ B^T C B.

    Matches the reference element to floating-point roundoff (golden
    tests use the unit cube with E=1000, nu=0 from utils.py:276).
    Used for small systems, the dense fallback solve, and oracles; the
    large-scale path never materializes these (see apply_elements).
    """
    geom = precompute_geometry(nodes, elements, dtype=dtype)
    return stiffness_from_geometry(geom, material)


@jax.jit
def stiffness_from_geometry(geom: Hex8Geometry, material: Material) -> jax.Array:
    # jitted for the same tunnel-dispatch reason as precompute_geometry:
    # chunked Ke consumers (ops/twolevel.py) call this once per chunk
    G, wdetj = geom.grads, geom.wdetj
    dtype = G.dtype
    C = elasticity_matrix(material, dtype=dtype)
    B = _strain_displacement(G)  # (E, Q, 6, 24)
    return jnp.einsum("eqia,ij,eqjb,eq->eab", B, C, B, wdetj, precision=_HIGHEST)


def stiffness_matrix_np(corners: "np.ndarray", material: Material) -> "np.ndarray":
    """Host NumPy (f64) stiffness of ONE hex8 element.

    O(1) build-time work (the structured operator and multigrid hierarchy
    need exactly one reference Ke): a jax dispatch here would pay a
    tiny-shape eager compile (~20 s per process on the tunneled TPU
    toolchain, measured) for microseconds of math.  Same quadrature and
    formulation as :func:`stiffness_matrices` (reference parity:
    /root/reference/utils.py:127-239), agreeing with the f64 jax path to
    ~1e-15 relative.
    """
    X = np.asarray(corners, np.float64)  # (8, 3)
    E = float(np.asarray(material.E))
    nu = float(np.asarray(material.nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = E / (2.0 * (1.0 + nu))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] = lam + 2.0 * mu
    C[np.arange(3, 6), np.arange(3, 6)] = mu
    D = _D_QP  # (Q, 3, 8)
    ke = np.zeros((24, 24))
    for q in range(D.shape[0]):
        J = D[q] @ X  # (3, 3)
        detj = np.linalg.det(J)
        G = np.linalg.solve(J, D[q])  # (3, 8) global gradients
        B = np.zeros((6, 8, 3))
        gx, gy, gz = G[0], G[1], G[2]
        B[0, :, 0] = gx
        B[1, :, 1] = gy
        B[2, :, 2] = gz
        B[3, :, 0] = gy
        B[3, :, 1] = gx
        B[4, :, 1] = gz
        B[4, :, 2] = gy
        B[5, :, 0] = gz
        B[5, :, 2] = gx
        Bq = B.reshape(6, 24)
        ke += detj * (Bq.T @ C @ Bq)
    return ke


def _strain_displacement(G: jax.Array) -> jax.Array:
    """Voigt strain-displacement matrices B (..., 6, 24) from gradients
    (..., 3, 8).  Voigt rows: xx, yy, zz, xy, yz, zx (engineering shear),
    matching /root/reference/utils.py:224-234."""
    shape = G.shape[:-2]
    B = jnp.zeros(shape + (6, 8, 3), G.dtype)
    gx, gy, gz = G[..., 0, :], G[..., 1, :], G[..., 2, :]
    B = B.at[..., 0, :, 0].set(gx)
    B = B.at[..., 1, :, 1].set(gy)
    B = B.at[..., 2, :, 2].set(gz)
    B = B.at[..., 3, :, 0].set(gy)
    B = B.at[..., 3, :, 1].set(gx)
    B = B.at[..., 4, :, 1].set(gz)
    B = B.at[..., 4, :, 2].set(gy)
    B = B.at[..., 5, :, 0].set(gz)
    B = B.at[..., 5, :, 2].set(gx)
    return B.reshape(shape + (6, 24))


def apply_elements(geom: Hex8Geometry, u_e: jax.Array, material: Material) -> jax.Array:
    """Matrix-free element force: f_e = Ke @ u_e without forming Ke.

    u_e (E, 8, 3) gathered element displacements -> f_e (E, 8, 3).

    Per quadrature point: displacement gradient H = G @ u_e, small-strain
    tensor eps = sym(H), Cauchy stress sigma = lam tr(eps) I + 2 mu eps,
    nodal forces f += w detJ * G^T sigma.  Identical result to B^T C B u
    but touches (E, Q, 3, 8) gradients instead of (E, 24, 24) matrices —
    3x fewer HBM bytes per SpMV, which is the whole game on TPU where the
    EBE operator is bandwidth-bound (SURVEY.md §7 stage 3).
    """
    lam, mu = lame_parameters(material)
    G, wdetj = geom.grads, geom.wdetj
    lam = jnp.asarray(lam, G.dtype)
    mu = jnp.asarray(mu, G.dtype)
    u_e = u_e.astype(G.dtype)

    # H[e,q,i,j] = d u_j / d x_i
    H = jnp.einsum("eqia,eaj->eqij", G, u_e, precision=_HIGHEST)
    eps = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
    sigma = 2.0 * mu[..., None, None, None, None] * eps
    sigma = sigma + (lam[..., None, None] * tr)[..., None, None] * jnp.eye(3, dtype=G.dtype)
    return jnp.einsum("eqia,eqij,eq->eaj", G, sigma, wdetj, precision=_HIGHEST)


def diagonal(geom: Hex8Geometry, material: Material) -> jax.Array:
    """Per-element stiffness diagonal (E, 8, 3) for the Jacobi preconditioner.

    Closed form of diag(B^T C B) for isotropic C:
      K[3a+j, 3a+j] = sum_q w detJ [ (lam + mu) G[j,a]^2 + mu |G[:,a]|^2 ]
    so the preconditioner costs one extra pass over the gradients instead
    of an (E,24,24) materialization.
    """
    lam, mu = lame_parameters(material)
    G, wdetj = geom.grads, geom.wdetj
    lam = jnp.asarray(lam, G.dtype)
    mu = jnp.asarray(mu, G.dtype)
    G2 = G * G  # (E, Q, 3, 8)
    norm2 = jnp.sum(G2, axis=-2, keepdims=True)  # (E, Q, 1, 8)
    per_qp = (lam + mu)[..., None, None] * G2 + mu[..., None, None] * norm2
    d = jnp.einsum("eqja,eq->eaj", per_qp, wdetj, precision=_HIGHEST)  # note (a, j) output order
    return d


def block_diagonal(geom: Hex8Geometry, material: Material) -> jax.Array:
    """Per-element nodal 3x3 stiffness diagonal blocks (E, 8, 3, 3).

    Same Lame-form closed form as :func:`diagonal`, kept off-diagonal:
      K[3a+i, 3a+j] = sum_q w detJ [ (lam + mu) G[i,a] G[j,a]
                                     + mu delta_ij |G[:,a]|^2 ]
    i.e. (lam + mu) M + mu tr(M) I with M_ij = sum_q wdetj G_i G_j —
    one extra gradient pass, never an (E, 24, 24) materialization.
    Feeds the block-Jacobi preconditioner for unstructured meshes
    (scalar Jacobi couples the x/y/z DOFs of a node not at all; the
    3x3 block captures the local Poisson coupling).
    """
    lam, mu = lame_parameters(material)
    G, wdetj = geom.grads, geom.wdetj
    lam = jnp.asarray(lam, G.dtype)
    mu = jnp.asarray(mu, G.dtype)
    M = jnp.einsum("eqia,eqja,eq->eaij", G, G, wdetj, precision=_HIGHEST)
    trM = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]  # (E, 8)
    eye = jnp.eye(3, dtype=G.dtype)
    return (
        (lam + mu)[..., None, None, None] * M
        + mu[..., None, None, None] * trM[..., None, None] * eye
    )


def centroid_strain_stress(nodes: jax.Array, elements: jax.Array, u: jax.Array, material: Material):
    """Element-centroid Voigt strain and stress, (E, 6) each.

    Post-processing the reference lacks for solids (it only recovers
    global reactions, /root/reference/fea.py:113); evaluated at xi = 0
    where the trilinear element's strain is most accurate.
    """
    dtype = u.dtype
    X = nodes[elements].astype(dtype)
    D0 = jnp.asarray(_D_CENTROID, dtype)  # (1, 3, 8)
    J = jnp.einsum("qda,ean->eqdn", D0, X, precision=_HIGHEST)
    detj = _det3(J)
    Jinv = _inv3(J, detj)
    G = jnp.einsum("eqdi,qia->eqda", Jinv, D0, precision=_HIGHEST)[:, 0]  # (E, 3, 8)
    u_e = u[elements]  # (E, 8, 3)
    H = jnp.einsum("eia,eaj->eij", G, u_e, precision=_HIGHEST)
    eps_t = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    eps = jnp.stack(
        [
            eps_t[:, 0, 0],
            eps_t[:, 1, 1],
            eps_t[:, 2, 2],
            2.0 * eps_t[:, 0, 1],
            2.0 * eps_t[:, 1, 2],
            2.0 * eps_t[:, 0, 2],
        ],
        axis=-1,
    )
    C = elasticity_matrix(material, dtype=dtype)
    sigma = eps @ C.T
    return eps, sigma


def von_mises(sigma_voigt: jax.Array) -> jax.Array:
    """Von Mises equivalent stress from (…, 6) Voigt stress."""
    sxx, syy, szz, sxy, syz, szx = (sigma_voigt[..., i] for i in range(6))
    return jnp.sqrt(
        0.5 * ((sxx - syy) ** 2 + (syy - szz) ** 2 + (szz - sxx) ** 2)
        + 3.0 * (sxy**2 + syz**2 + szx**2)
    )
