"""Double-f32 pair-space quadrature apply for general (unstructured) meshes.

The unstructured production route (`solve.py` auto >= 50k DOF) runs an
f64-true FCG recurrence whose per-iteration wall is ONE exact-f64
element apply — and on TPU "f64" is XLA's emulated double-f32, which
decomposes every op of the quadrature einsums into many f32 passes with
materialized intermediates (measured 259 ms vs 17.9 ms for the identical
f32 apply at 55k elements, and 1.2 s of the 1.71 s/iteration at 812k
DOF — docs/PERF.md "Unstructured path").

This module computes the SAME accuracy class (~2^-48 per operation —
error-free Dekker products, TwoSum accumulation over the contraction
axes, first-order cross terms, O(2^-96) terms dropped) directly on f32
``(hi, lo)`` pairs, with none of the emulation's materialization:

    gather pairs -> H = G u  (8-term EFT chain)
                 -> sigma = lam tr(eps) I + 2 mu eps  (pair algebra)
                 -> f = G^T (w detJ sigma)  (24-term EFT chain)
                 -> incidence-plan EFT scatter (TwoSum over the valence axis)

following the same EFT scheme that took the structured stencil's dd
apply 8.5x past XLA's f64 emulation (ops/pallas_stencil.py) — but in
pure XLA: the SpMV shoot-out showed index gather/scatter paths are
traffic-bound and Pallas ties XLA there, so the win is the arithmetic
representation, not the kernel language.

FMA-contraction rule (see ops/df64.py): only EXACT products feed
additions, so XLA:CPU's LLVM-level contraction cannot break the EFTs.

Reference analog: none — the reference's only apply is the dense
``K @ u`` (/root/reference/fea.py:113).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import assembly
from ..elements import hex8 as hex8_el
from ..materials import lame_parameters
from . import df64
from .df64 import _renorm, _two_sum, two_prod

__all__ = ["PairOperator", "build_pair_operator", "apply_elements_dd"]


def _pair_add_raw(s, c, p, e):
    """Accumulate the exact product (p, e) into the running (sum, comp)."""
    s, e2 = _two_sum(s, p)
    return s, c + (e + e2)


def apply_elements_dd(gh, gl, wh, wl, uh, ul, lam, mu):
    """Pair-space matrix-free element force: f_e ~= Ke @ u_e to ~2^-48.

    gh/gl: (E, Q, 3, npe) f32 pair of the f64 global shape-function
           gradients; wh/wl: (E, Q) pair of w*detJ; uh/ul: (E, npe, 3)
           pair of gathered element displacements; lam/mu f64 scalars.
    Returns (fh, fl) of shape (E, npe, 3).

    Same formulation as :func:`fea_tpu.elements.hex8.apply_elements`
    (sigma = lam tr(eps) I + 2 mu eps per quadrature point), with every
    contraction an unrolled TwoSum chain of exact Dekker products plus
    plain-f32 first-order cross terms (2^-48 tail).  Contraction axes
    are tiny (npe = 8 nodes, then Q*3 = 24), so unrolling stays one
    fused elementwise XLA loop — no (E, Q, 3, npe, 3) outer product is
    ever materialized (the f64 emulation's 30 GB-at-256k failure mode).
    """
    npe = gh.shape[-1]
    Q = gh.shape[1]
    f32 = jnp.float32

    # -- H[e,q,i,j] = sum_a G[e,q,i,a] u[e,a,j] ---------------------------
    s = c = None
    for a in range(npe):
        ga_h = gh[..., a][..., None]  # (E, Q, 3, 1)
        ga_l = gl[..., a][..., None]
        ua_h = uh[:, a][:, None, None, :]  # (E, 1, 1, 3)
        ua_l = ul[:, a][:, None, None, :]
        p, e = two_prod(ga_h, ua_h)  # broadcasts to (E, Q, 3, 3)
        if s is None:
            s, c = p, e
        else:
            s, c = _pair_add_raw(s, c, p, e)
        c = c + (ga_h * ua_l + ga_l * ua_h)
    Hh, Hl = _renorm(s, c)

    # -- eps = sym(H), tr(eps), sigma_w = wdetj (lam tr I + 2 mu eps) ----
    Th, Tl = jnp.swapaxes(Hh, -1, -2), jnp.swapaxes(Hl, -1, -2)
    sh, se = _two_sum(Hh, Th)
    eh, el = _renorm(sh, se + (Hl + Tl))
    half = f32(0.5)
    eh, el = eh * half, el * half  # exact (power of two)

    t, te = _two_sum(eh[..., 0, 0], eh[..., 1, 1])
    tc = te + (el[..., 0, 0] + el[..., 1, 1])
    t, te = _two_sum(t, eh[..., 2, 2])
    tc = tc + te + el[..., 2, 2]
    tr = _renorm(t, tc)  # (E, Q) pair

    sig = df64.scale(2.0 * mu, (eh, el))  # (E, Q, 3, 3)
    lt = df64.scale(lam, tr)  # (E, Q)
    eye = jnp.eye(3, dtype=f32)
    diag = (lt[0][..., None, None] * eye, lt[1][..., None, None] * eye)  # exact
    sg_h, sg_e = _two_sum(sig[0], diag[0])
    sg = _renorm(sg_h, sg_e + (sig[1] + diag[1]))
    sw = df64.mul(sg, (wh[..., None, None], wl[..., None, None]))

    # -- f[e,a,j] = sum_{q,i} G[e,q,i,a] sigma_w[e,q,i,j] -----------------
    s = c = None
    for q in range(Q):
        for i in range(3):
            g_h = gh[:, q, i, :, None]  # (E, npe, 1)
            g_l = gl[:, q, i, :, None]
            s_h = sw[0][:, q, i][:, None, :]  # (E, 1, 3)
            s_l = sw[1][:, q, i][:, None, :]
            p, e = two_prod(g_h, s_h)  # (E, npe, 3)
            if s is None:
                s, c = p, e
            else:
                s, c = _pair_add_raw(s, c, p, e)
            c = c + (g_h * s_l + g_l * s_h)
    return _renorm(s, c)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairOperator:
    """Masked stiffness operator applying on f32 pairs at ~2^-48 accuracy.

    The pair-space twin of ``StiffnessOperator.apply`` for the
    unstructured FCG loop: ``apply((xh, xl)) -> (fh, fl)`` computes
    A(x) = F . K(F . x) + (1 - F) . x with the element work in
    :func:`apply_elements_dd` and the scatter an EFT TwoSum chain over
    the incidence plan's static valence axis (a plain hi/lo segment sum
    would reintroduce eps_f32 * |f_e| uncompensated error — exactly the
    cancellation the pairs exist to preserve).
    """

    gh: jax.Array  # (E, Q, 3, npe) f32
    gl: jax.Array
    wh: jax.Array  # (E, Q) f32
    wl: jax.Array
    elements: jax.Array  # (E, npe) int32
    positions: jax.Array  # (ndof, V) int32 incidence plan
    pmask: jax.Array  # (ndof, V) f32 0/1
    free: jax.Array  # (N, dpn) f32 0/1
    lam: jax.Array  # f64 scalar
    mu: jax.Array  # f64 scalar
    chunk: Optional[int] = dataclasses.field(metadata=dict(static=True), default=None)

    @property
    def n_nodes(self) -> int:
        return self.free.shape[0]

    def _element_apply(self, uh, ul):
        E = uh.shape[0]
        chunk = self.chunk
        if chunk is None or E <= chunk:
            return apply_elements_dd(
                self.gh, self.gl, self.wh, self.wl, uh, ul, self.lam, self.mu
            )
        # lax.map over fixed-size chunks: one chunk of (E,Q,3,3)-pair
        # intermediates live at a time (same shape discipline as
        # StiffnessOperator._matfree_apply_chunked), remainder as a
        # static tail.
        K = E // chunk
        main = K * chunk

        def one(args):
            g_h, g_l, w_h, w_l, u_h, u_l = args
            return apply_elements_dd(g_h, g_l, w_h, w_l, u_h, u_l, self.lam, self.mu)

        def parts(x, lead):
            return x[:lead].reshape(K, chunk, *x.shape[1:])

        fh, fl = jax.lax.map(
            one,
            (
                parts(self.gh, main), parts(self.gl, main),
                parts(self.wh, main), parts(self.wl, main),
                parts(uh, main), parts(ul, main),
            ),
        )
        fh = fh.reshape(main, *uh.shape[1:])
        fl = fl.reshape(main, *uh.shape[1:])
        if main == E:
            return fh, fl
        th, tl_ = apply_elements_dd(
            self.gh[main:], self.gl[main:], self.wh[main:], self.wl[main:],
            uh[main:], ul[main:], self.lam, self.mu,
        )
        return (
            jnp.concatenate([fh, th], axis=0),
            jnp.concatenate([fl, tl_], axis=0),
        )

    def _scatter_pair(self, fh_flat, fl_flat):
        vh = fh_flat[self.positions] * self.pmask  # (ndof, V), exact 0/1 mask
        vl = fl_flat[self.positions] * self.pmask
        V = vh.shape[1]
        s, c = vh[:, 0], vl[:, 0]
        for j in range(1, V):
            s, e = _two_sum(s, vh[:, j])
            c = c + (e + vl[:, j])
        return _renorm(s, c)

    def apply_raw(self, x):
        """K @ x over all DOFs for a pair x = (xh, xl): pair in, pair out."""
        xh, xl = x
        uh = xh[self.elements]
        ul = xl[self.elements]
        fh, fl = self._element_apply(uh, ul)
        rh, rl = self._scatter_pair(fh.reshape(-1), fl.reshape(-1))
        shape = xh.shape
        return rh.reshape(shape), rl.reshape(shape)

    def apply(self, x):
        """Masked pair operator A(x) = F . K(F . x) + (1 - F) . x."""
        F = self.free
        xh, xl = x
        kh, kl = self.apply_raw((F * xh, F * xl))  # exact 0/1 masks
        G = 1.0 - F
        s, e = _two_sum(F * kh, G * xh)
        return _renorm(s, e + (F * kl + G * xl))


@jax.jit
def _split_geometry(grads64, wdetj64):
    return (*df64.split(grads64), *df64.split(wdetj64))


def build_pair_operator(
    op64, nodes=None, *, material=None, chunk: Optional[int] = None
) -> PairOperator:
    """PairOperator from an f64 StiffnessOperator (hex8 meshes).

    Reuses the operator's f64 geometry, material, and incidence plan
    when present; otherwise integrates geometry from ``nodes`` and takes
    ``material`` explicitly (required then — the 'uniform'
    congruent-element kind stores a baked Ke, not gradients/material).
    ``chunk``: element-chunk size for the apply; None = automatic
    (65536 on TPU above 128k elements, unchunked elsewhere — the pair
    apply's intermediates are (chunk, Q, 3, 3) f32 pairs, ~19 MB each
    at 65536).
    """
    if op64.elements.shape[1] != 8 or op64.dofs_per_node != 3:
        raise ValueError("PairOperator supports 8-node hex meshes (3 dof/node)")
    material = material if material is not None else op64.material
    if material is None:
        raise ValueError(
            f"operator kind {op64.kind!r} stores no material; pass material="
        )
    geom = op64.geom
    if geom is None:
        if nodes is None:
            raise ValueError(
                "operator has no per-element geometry (kind="
                f"{op64.kind!r}); pass nodes to integrate it"
            )
        geom = hex8_el.precompute_geometry(
            jnp.asarray(nodes, jnp.float64), op64.elements, dtype=jnp.float64
        )
    grads = geom.grads.astype(jnp.float64)
    wdetj = geom.wdetj.astype(jnp.float64)
    gh, gl, wh, wl = _split_geometry(grads, wdetj)

    plan = op64.plan
    if plan is None:
        plan = assembly.build_incidence_plan(
            np.asarray(op64.elements), op64.dofs_per_node, op64.n_nodes
        )
    lam, mu = lame_parameters(material)
    E = int(op64.elements.shape[0])
    if chunk is None and jax.default_backend() == "tpu" and E > 131_072:
        chunk = 65_536
    return PairOperator(
        gh=gh, gl=gl, wh=wh, wl=wl,
        elements=op64.elements,
        positions=plan.positions,
        pmask=plan.mask.astype(jnp.float32),
        free=op64.free.astype(jnp.float32),
        lam=jnp.asarray(lam, jnp.float64),
        mu=jnp.asarray(mu, jnp.float64),
        chunk=chunk,
    )
