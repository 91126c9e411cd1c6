"""The global stiffness operator — matrix-free, jit-compatible, maskable.

This is the framework's replacement for the reference's dense global K
(``/root/reference/fea.py:87-113``).  K is never materialized: an operator
application is

    gather u_e  ->  batched element apply  ->  incidence-plan scatter

which is O(E) memory instead of O(ndof^2) (SURVEY.md §5.7: the mechanism
that unlocks 1M DOF on one chip).

Boundary conditions are applied by *masking*, not index reduction
(reference reduces with np.ix_, fea.py:99-103, which would make shapes
data-dependent under jit): with F the 0/1 free-DOF mask and x_p the
prescribed values,

    A(x)  = F . K(F . x) + (1-F) . x          (constrained rows = identity)
    b     = F . (loads - K((1-F) . x_p)) + (1-F) . x_p

Solving A u = b yields exactly the reference's reduced solution on free
DOFs and u = x_p on constrained ones (proved by test_solver.py's
masking-vs-reduction equivalence test).

Three element-apply modes, selected at build time:

  * ``hex8_matfree``  — quadrature-level apply from precomputed gradients,
    3x fewer HBM bytes per SpMV than stored Ke (the default for hex8).
  * ``stored``        — batched (E, k, k) Ke matvec (beams, bars, small
    hex meshes; also the oracle for the matrix-free path).
  * ``uniform``       — a single shared (k, k) Ke when all elements are
    congruent (voxel meshes): the apply becomes one (E, k) @ (k, k)
    matmul on the MXU — a structural win the reference cannot see
    (SURVEY.md §7 stage 4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import assembly
from .elements import beam as beam_el
from .elements import hex8 as hex8_el
from .elements import truss as truss_el
from .materials import Material
from .scene import FAMILIES, Scene

__all__ = ["StiffnessOperator", "build_operator"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StiffnessOperator:
    """Matrix-free K with boundary-condition masking.

    Call :meth:`apply_raw` for K @ u over *all* DOFs (reaction recovery,
    reference parity with fea.py:113) and :meth:`apply` for the masked
    operator used inside CG.
    """

    elements: jax.Array  # (E, npe) int32
    free: jax.Array  # (N, dpn) compute dtype: 1.0 free, 0.0 fixed
    plan: Optional[assembly.IncidencePlan]
    kind: str = dataclasses.field(metadata=dict(static=True))
    # mode payloads (exactly one set per kind)
    geom: Optional[hex8_el.Hex8Geometry] = None
    material: Optional[Material] = None
    ke: Optional[jax.Array] = None  # (E, k, k) stored | (k, k) uniform
    # Optional (E,) 0/1 element validity — used when the element batch is
    # padded for sharding; padded slots contribute zero force/stiffness.
    valid: Optional[jax.Array] = None
    # Run the element apply through the Pallas element-on-lanes kernels
    # (ops/pallas_apply.py) instead of the XLA einsum/dot; 'stored' and
    # 'uniform' kinds only.  Interpreter mode is used off-TPU.
    use_pallas: bool = dataclasses.field(metadata=dict(static=True), default=False)
    pallas_interpret: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Element-chunk size for the matfree apply at wide dtypes; None =
    # automatic (TPU f64 only — see _matfree_chunk).  Tests override it
    # to pin chunked == unchunked.
    matfree_chunk: Optional[int] = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    @property
    def n_nodes(self) -> int:
        return self.free.shape[0]

    @property
    def dofs_per_node(self) -> int:
        return self.free.shape[1]

    @property
    def n_dof(self) -> int:
        return self.free.shape[0] * self.free.shape[1]

    def astype(self, dtype) -> "StiffnessOperator":
        """Same operator with float payloads cast to ``dtype``.

        Build at f64 and cast down for the low-precision half of the
        mixed-precision refinement solver; the f32 operator is then the
        correctly-rounded version of the f64 one."""
        cast = lambda a: None if a is None else a.astype(dtype)
        geom = self.geom
        if geom is not None:
            geom = dataclasses.replace(
                geom,
                grads=geom.grads.astype(dtype),
                wdetj=geom.wdetj.astype(dtype),
                min_detj=geom.min_detj.astype(dtype),
            )
        plan = self.plan
        if plan is not None:
            plan = dataclasses.replace(plan, mask=plan.mask.astype(dtype))
        return dataclasses.replace(
            self,
            free=self.free.astype(dtype),
            geom=geom,
            plan=plan,
            ke=cast(self.ke),
            valid=cast(self.valid),
        )

    # -- element-level apply ------------------------------------------------
    def _matfree_chunk_size(self, E: int, dtype) -> Optional[int]:
        """Element-chunk size for the quadrature-level apply, or None for
        one-shot.  TPU emulated-f64 einsums materialize the (E, Q, 3, 8, 3)
        outer product before reducing: at 256k elements the XLA compile
        demanded 30.4 GB of HBM (OOM on the 15.75 GB chip) where 55k fit.
        f32 needs no chunking (measured fine at 328k elements)."""
        if self.matfree_chunk is not None:
            return self.matfree_chunk if E > self.matfree_chunk else None
        if (
            jnp.dtype(dtype).itemsize >= 8
            and jax.default_backend() == "tpu"
            and E > 49_152
        ):
            return 32_768
        return None

    def _matfree_apply_chunked(self, u_e: jax.Array, chunk: int) -> jax.Array:
        """lax.map the element apply over fixed-size chunks (sequential,
        one chunk of intermediates live at a time; slices are views, so
        nothing is copied per call).  Remainder elements run as a static
        tail slice."""
        E = u_e.shape[0]
        K = E // chunk
        main = K * chunk
        G, W = self.geom.grads, self.geom.wdetj

        def one(args):
            u_c, g_c, w_c = args
            geom_c = dataclasses.replace(self.geom, grads=g_c, wdetj=w_c)
            return hex8_el.apply_elements(geom_c, u_c, self.material)

        f = jax.lax.map(
            one,
            (
                u_e[:main].reshape(K, chunk, *u_e.shape[1:]),
                G[:main].reshape(K, chunk, *G.shape[1:]),
                W[:main].reshape(K, chunk, *W.shape[1:]),
            ),
        ).reshape(main, *u_e.shape[1:])
        if main == E:
            return f
        geom_t = dataclasses.replace(self.geom, grads=G[main:], wdetj=W[main:])
        f_tail = hex8_el.apply_elements(geom_t, u_e[main:], self.material)
        return jnp.concatenate([f, f_tail], axis=0)

    def _element_apply(self, u_e: jax.Array) -> jax.Array:
        """(E, npe, dpn) -> (E, npe, dpn) element force contributions."""
        E, npe, dpn = u_e.shape
        if self.kind == "hex8_matfree":
            chunk = self._matfree_chunk_size(E, u_e.dtype)
            if chunk is not None:
                f = self._matfree_apply_chunked(u_e, chunk).reshape(E, npe * dpn)
            else:
                f = hex8_el.apply_elements(self.geom, u_e, self.material).reshape(E, npe * dpn)
        else:
            flat = u_e.reshape(E, npe * dpn)
            if self.kind == "uniform":
                if self.use_pallas:
                    from .ops.pallas_apply import batched_matvec_uniform

                    f = batched_matvec_uniform(self.ke, flat, interpret=self.pallas_interpret)
                else:
                    f = jnp.dot(flat, self.ke.T, precision=jax.lax.Precision.HIGHEST)
            elif self.kind == "stored":
                if self.use_pallas:
                    from .ops.pallas_apply import batched_matvec_stored

                    f = batched_matvec_stored(self.ke, flat, interpret=self.pallas_interpret)
                else:
                    f = jnp.einsum("eab,eb->ea", self.ke, flat, precision=jax.lax.Precision.HIGHEST)
            else:
                raise ValueError(f"unknown operator kind {self.kind!r}")
        # padding mask applies uniformly to every kind (padded slots must
        # contribute zero force regardless of the apply mode)
        if self.valid is not None:
            f = f * self.valid[:, None]
        return f.reshape(E, npe, dpn)

    # -- global applies -----------------------------------------------------
    def apply_raw(self, u: jax.Array) -> jax.Array:
        """K @ u over all DOFs, no masking.  u, result: (N, dpn)."""
        u_e = assembly.gather_element_dofs(u, self.elements)
        f_e = self._element_apply(u_e)
        if self.plan is not None:
            return self.plan.scatter_add(f_e.reshape(-1)).reshape(u.shape)
        return assembly.scatter_add_direct(f_e, self.elements, self.n_nodes)

    def apply(self, x: jax.Array) -> jax.Array:
        """Masked operator A(x) = F.K(F.x) + (1-F).x — SPD on free DOFs,
        identity on constrained ones."""
        F = self.free.astype(x.dtype)
        return F * self.apply_raw(F * x) + (1.0 - F) * x

    def rhs(self, loads: jax.Array, prescribed: jax.Array) -> jax.Array:
        """Right-hand side consistent with :meth:`apply` (see module doc)."""
        F = self.free.astype(loads.dtype)
        xp = (1.0 - F) * prescribed.astype(loads.dtype)
        return F * (loads - self.apply_raw(xp)) + xp

    # -- preconditioning ----------------------------------------------------
    def diag_raw(self) -> jax.Array:
        """Assembled diagonal of K, (N, dpn) — the Jacobi preconditioner."""
        E, npe = self.elements.shape
        dpn = self.dofs_per_node
        if self.kind == "hex8_matfree":
            d_e = hex8_el.diagonal(self.geom, self.material)
        elif self.kind == "uniform":
            d = jnp.diagonal(self.ke)
            d_e = jnp.broadcast_to(d, (E, npe * dpn)).reshape(E, npe, dpn)
        else:
            d_e = jnp.diagonal(self.ke, axis1=-2, axis2=-1).reshape(E, npe, dpn)
        if self.valid is not None:
            d_e = d_e * self.valid[:, None, None]
        if self.plan is not None:
            return self.plan.scatter_add(d_e.reshape(-1)).reshape(self.free.shape)
        return assembly.scatter_add_direct(d_e, self.elements, self.n_nodes)

    def block_diag_raw(self, *, chunk: Optional[int] = None) -> jax.Array:
        """Assembled nodal diagonal blocks of K, (N, dpn, dpn).

        Block-Jacobi data: scalar Jacobi ignores the x/y/z coupling of a
        node entirely (SURVEY.md §7 "Jacobi adequacy" names the per-node
        3x3 block as the next preconditioner); these blocks capture it at
        one extra element pass, no (E, 24, 24) materialization.
        """
        E, npe = self.elements.shape
        dpn = self.dofs_per_node
        if self.kind == "hex8_matfree":
            # chunk the gradient-outer-product einsum on TPU: at ~55k
            # elements the emulated-f64 (E, Q, 8, 3, 3) intermediate
            # peaked 16.2 GB HBM and OOMed the chip (all callers are
            # eager build steps, so a host loop is safe)
            if chunk is None:
                chunk = 16384 if jax.default_backend() == "tpu" else E
            if E > chunk:
                blocks = jnp.zeros(
                    (self.n_nodes, dpn * dpn), self.geom.grads.dtype
                )
                for start in range(0, E, chunk):
                    sl = slice(start, min(start + chunk, E))
                    geom_c = dataclasses.replace(
                        self.geom,
                        grads=self.geom.grads[sl],
                        wdetj=self.geom.wdetj[sl],
                    )
                    b_c = hex8_el.block_diagonal(geom_c, self.material)
                    if self.valid is not None:
                        b_c = b_c * self.valid[sl][:, None, None, None]
                    blocks = blocks + assembly.scatter_add_direct(
                        b_c.reshape(-1, npe, dpn * dpn),
                        self.elements[sl],
                        self.n_nodes,
                    )
                return blocks.reshape(self.n_nodes, dpn, dpn)
            b_e = hex8_el.block_diagonal(self.geom, self.material)
        elif self.kind == "uniform":
            k4 = self.ke.reshape(npe, dpn, npe, dpn)
            # corner-diagonal blocks ke[a,:,a,:] -> (npe, dpn, dpn)
            kb = jnp.moveaxis(jnp.diagonal(k4, axis1=0, axis2=2), -1, 0)
            b_e = jnp.broadcast_to(kb, (E, npe, dpn, dpn))
        else:  # stored (E, k, k)
            k5 = self.ke.reshape(E, npe, dpn, npe, dpn)
            b_e = jnp.moveaxis(jnp.diagonal(k5, axis1=1, axis2=3), -1, 1)
        if self.valid is not None:
            b_e = b_e * self.valid[:, None, None, None]
        blocks = assembly.scatter_add_direct(
            b_e.reshape(E, npe, dpn * dpn), self.elements, self.n_nodes
        )
        return blocks.reshape(self.n_nodes, dpn, dpn)

    def block_diag_inv_masked(self) -> jax.Array:
        """Inverted nodal diagonal blocks of the MASKED operator,
        (N, dpn, dpn): diag(F) B diag(F) + diag(1-F) per node — SPD by
        construction (principal submatrix of an SPD matrix, identity on
        fixed DOFs) — inverted in closed form (adjugate; TPU has no f64
        dense factorizations, and N tiny solves would not batch well).
        """
        B = self.block_diag_raw()
        F = self.free.astype(B.dtype)  # (N, dpn)
        dpn = self.dofs_per_node
        eye = jnp.eye(dpn, dtype=B.dtype)
        Bm = F[:, :, None] * B * F[:, None, :] + (1.0 - F)[:, :, None] * eye
        # isolated free DOFs (no attached element) leave a zero row even
        # after masking — regularize to identity like diag_masked does
        zero_diag = jnp.diagonal(Bm, axis1=-2, axis2=-1) <= 0
        Bm = jnp.where(
            zero_diag[:, :, None] | zero_diag[:, None, :],
            jnp.where(zero_diag[:, :, None] & (eye > 0), 1.0, 0.0),
            Bm,
        )
        if dpn == 3:
            det = (
                Bm[:, 0, 0] * (Bm[:, 1, 1] * Bm[:, 2, 2] - Bm[:, 1, 2] * Bm[:, 2, 1])
                - Bm[:, 0, 1] * (Bm[:, 1, 0] * Bm[:, 2, 2] - Bm[:, 1, 2] * Bm[:, 2, 0])
                + Bm[:, 0, 2] * (Bm[:, 1, 0] * Bm[:, 2, 1] - Bm[:, 1, 1] * Bm[:, 2, 0])
            )
            adj = jnp.stack([
                jnp.stack([
                    Bm[:, 1, 1] * Bm[:, 2, 2] - Bm[:, 1, 2] * Bm[:, 2, 1],
                    Bm[:, 0, 2] * Bm[:, 2, 1] - Bm[:, 0, 1] * Bm[:, 2, 2],
                    Bm[:, 0, 1] * Bm[:, 1, 2] - Bm[:, 0, 2] * Bm[:, 1, 1],
                ], axis=-1),
                jnp.stack([
                    Bm[:, 1, 2] * Bm[:, 2, 0] - Bm[:, 1, 0] * Bm[:, 2, 2],
                    Bm[:, 0, 0] * Bm[:, 2, 2] - Bm[:, 0, 2] * Bm[:, 2, 0],
                    Bm[:, 0, 2] * Bm[:, 1, 0] - Bm[:, 0, 0] * Bm[:, 1, 2],
                ], axis=-1),
                jnp.stack([
                    Bm[:, 1, 0] * Bm[:, 2, 1] - Bm[:, 1, 1] * Bm[:, 2, 0],
                    Bm[:, 0, 1] * Bm[:, 2, 0] - Bm[:, 0, 0] * Bm[:, 2, 1],
                    Bm[:, 0, 0] * Bm[:, 1, 1] - Bm[:, 0, 1] * Bm[:, 1, 0],
                ], axis=-1),
            ], axis=-2)
            return adj / det[:, None, None]
        if dpn == 2:
            det = Bm[:, 0, 0] * Bm[:, 1, 1] - Bm[:, 0, 1] * Bm[:, 1, 0]
            adj = jnp.stack([
                jnp.stack([Bm[:, 1, 1], -Bm[:, 0, 1]], axis=-1),
                jnp.stack([-Bm[:, 1, 0], Bm[:, 0, 0]], axis=-1),
            ], axis=-2)
            return adj / det[:, None, None]
        return jnp.linalg.inv(Bm)

    def diag_masked(self) -> jax.Array:
        """Diagonal of the masked operator: K's diagonal on free DOFs, 1 on
        fixed — guaranteed positive for a valid SPD system."""
        F = self.free
        return F * self.diag_raw() + (1.0 - F)

    # -- explicit matrices (small systems / oracles) -------------------------
    def element_matrices(self) -> jax.Array:
        """(E, k, k) explicit Ke batch, whatever the apply mode."""
        E, npe = self.elements.shape
        k = npe * self.dofs_per_node
        if self.kind == "hex8_matfree":
            return hex8_el.stiffness_from_geometry(self.geom, self.material)
        if self.kind == "uniform":
            return jnp.broadcast_to(self.ke, (E, k, k))
        return self.ke

    def dense(self) -> jax.Array:
        """Dense global K (ndof, ndof) — small systems only."""
        return assembly.assemble_dense(
            self.element_matrices(), self.elements, self.dofs_per_node, self.n_dof
        )


def _elements_congruent(nodes: np.ndarray, elements: np.ndarray, tol: float = 1e-9) -> bool:
    """True when every element is a translate of element 0 (voxel meshes)."""
    X = nodes[elements]  # (E, npe, dim)
    rel = X - X[:, :1, :]
    scale = max(float(np.max(np.abs(rel[0]))), 1e-30)
    return bool(np.max(np.abs(rel - rel[0])) <= tol * scale)


def build_operator(
    scene: Scene,
    dtype=jnp.float32,
    use_plan: bool = True,
    uniform: bool | str = "auto",
    use_pallas: bool = False,
) -> StiffnessOperator:
    """Construct the stiffness operator for a scene.

    Host-side setup (index plans, congruence detection) happens here, once
    per topology; everything the solver calls afterwards is jit-pure.

    ``use_pallas`` routes the 'stored'/'uniform' element applies through
    the Pallas element-on-lanes kernels (ops/pallas_apply.py).  Measured
    on the v5e chip (tools/spmv_bench.py, 2026-08-16, f32): XLA and
    Pallas are equal to 0.3% in both modes (uniform 79.7 vs 79.8 ms at
    327k elements; stored 10.33 vs 10.36 ms at 41k) — the apply_raw cost
    is dominated by the index gather/scatter, not the element compute, so
    the simpler XLA path stays the default.  (The structured stencil
    operator, which needs no indices at all, does the same SpMV in
    2.46 ms — use it whenever the mesh is a voxel box.)  Off-TPU the
    Pallas kernels run in interpreter mode (slow; correctness only).  The
    'hex8_matfree' kind has no Pallas variant and ignores the flag.
    """
    fam = FAMILIES[scene.family]
    elements_np = np.asarray(scene.elements)
    nodes_np = np.asarray(scene.nodes)
    plan = (
        assembly.build_incidence_plan(elements_np, fam.dofs_per_node, scene.n_nodes)
        if use_plan
        else None
    )
    free = scene.free_mask(dtype)
    nodes = scene.nodes.astype(dtype)
    pallas_kw = dict(use_pallas=use_pallas, pallas_interpret=jax.default_backend() != "tpu")

    if scene.family == "hex8":
        is_uniform = _elements_congruent(nodes_np, elements_np) if uniform == "auto" else bool(uniform)
        if is_uniform:
            # One reference element serves the whole mesh: integrate its Ke
            # once on the host at the widest *enabled* precision (f64 under
            # x64, else f32 — f64 literally cannot exist otherwise), then
            # cast to the operator dtype and ride the MXU.
            from .dtypes import x64_enabled

            wide = jnp.float64 if x64_enabled() else jnp.dtype(dtype)
            with jax.default_device(jax.devices("cpu")[0]):
                ke_np = np.asarray(
                    hex8_el.stiffness_matrices(
                        jnp.asarray(nodes_np[elements_np[0]], wide),
                        jnp.arange(8, dtype=jnp.int32)[None],
                        scene.material,
                        dtype=wide,
                    )[0]
                )
            return StiffnessOperator(
                elements=scene.elements, free=free, plan=plan, kind="uniform",
                ke=jnp.asarray(ke_np, dtype), **pallas_kw,
            )
        geom = hex8_el.precompute_geometry(nodes, scene.elements, dtype=dtype)
        return StiffnessOperator(
            elements=scene.elements,
            free=free,
            plan=plan,
            kind="hex8_matfree",
            geom=geom,
            material=scene.material,
        )

    if scene.family == "eb_beam":
        L_np = nodes_np.reshape(-1)[elements_np[:, 1]] - nodes_np.reshape(-1)[elements_np[:, 0]]
        if np.any(L_np <= 0):
            bad = int(np.argmax(L_np <= 0))
            raise ValueError(
                f"beam element {bad} has non-positive length {L_np[bad]:g}; "
                "node order per element must be (left, right)"
            )
        inertia = scene.section if scene.section is not None else 1.0
        ke = beam_el.stiffness_matrices(nodes, scene.elements, scene.material, inertia).astype(dtype)
        return StiffnessOperator(elements=scene.elements, free=free, plan=plan, kind="stored", ke=ke, **pallas_kw)

    if scene.family in ("bar2d", "bar3d"):
        if scene.section is None:
            raise ValueError("bar scenes require section = axial stiffness k per element")
        ke = truss_el.stiffness_matrices(nodes, scene.elements, scene.section).astype(dtype)
        return StiffnessOperator(elements=scene.elements, free=free, plan=plan, kind="stored", ke=ke, **pallas_kw)

    raise ValueError(f"unsupported family {scene.family!r}")
