"""Stencil-form stiffness operator for structured voxel meshes.

On a regular (nx, ny, nz) voxel grid every element shares one 24x24
reference Ke, and the node<->element maps are *compile-time slice
shifts* — so the element-by-element SpMV needs no index arrays at all:

    u grid (Z, Y, X, 3)
      -> u_e = concat of 8 corner-shifted slices      (nz, ny, nx, 24)
      -> f_e = u_e @ Ke^T        one large MXU matmul (nz*ny*nx, 24)@(24,24)
      -> f   = sum of 8 corner-shifted slice-adds     (Z, Y, X, 3)

Everything is dense, statically shaped, and fuses under XLA; there is no
scatter at any point.  This is the speed-of-light configuration for the
benchmark workload (SURVEY.md §7 stage 4: "regularity means one reference
Ke can serve all identical elements — a huge TPU win the reference can't
see") and is exactly equivalent to the unstructured operator on the same
mesh (tested in tests/test_structured.py).

Interface-compatible with StiffnessOperator (apply / apply_raw / rhs /
diag_masked / free / n_dof), so ``solve_operator`` accepts it unchanged.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..elements import hex8 as hex8_el
from ..materials import Material
from ..scene import Scene

__all__ = ["StructuredOperator", "build_structured_operator", "structured_scene"]

# Corner offsets (dz, dy, dx) in node-grid index space, in the element's
# local node order (bottom face CCW then top face CCW — matching
# mesh.extrude_quads / the reference's utils.py:352 convention with
# x fastest, y middle, z layer-major).
_CORNERS = (
    (0, 0, 0),
    (0, 0, 1),
    (0, 1, 1),
    (0, 1, 0),
    (1, 0, 0),
    (1, 0, 1),
    (1, 1, 1),
    (1, 1, 0),
)


def stencil_apply_grid(ke: jax.Array, g: jax.Array, dims: tuple[int, int, int]) -> jax.Array:
    """K @ u in grid space: g (Z, Y, X, 3) -> (Z, Y, X, 3).

    The core stencil kernel, shared by StructuredOperator and the
    multigrid levels: 8 corner slice-gathers, one (E, 24) @ (24, 24) MXU
    matmul, 8 corner slice-adds.
    """
    nx, ny, nz = dims
    u_e = jnp.concatenate(
        [
            jax.lax.slice(g, (dz, dy, dx, 0), (dz + nz, dy + ny, dx + nx, 3))
            for (dz, dy, dx) in _CORNERS
        ],
        axis=-1,
    )  # (nz, ny, nx, 24)
    f_e = jax.lax.dot_general(
        u_e.reshape(-1, 24),
        ke.astype(g.dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=g.dtype,
    ).reshape(nz, ny, nx, 24)
    f = jnp.zeros_like(g)
    for a, (dz, dy, dx) in enumerate(_CORNERS):
        f = jax.lax.dynamic_update_slice(
            f,
            jax.lax.dynamic_slice(f, (dz, dy, dx, 0), (nz, ny, nx, 3))
            + f_e[..., 3 * a : 3 * a + 3],
            (dz, dy, dx, 0),
        )
    return f


def stencil_diag_grid(ke: jax.Array, dims: tuple[int, int, int]) -> jax.Array:
    """Assembled stiffness diagonal in grid space, (Z, Y, X, 3)."""
    nx, ny, nz = dims
    kd = jnp.diagonal(ke)
    d = jnp.zeros((nz + 1, ny + 1, nx + 1, 3), ke.dtype)
    for a, (dz, dy, dx) in enumerate(_CORNERS):
        d = jax.lax.dynamic_update_slice(
            d,
            jax.lax.dynamic_slice(d, (dz, dy, dx, 0), (nz, ny, nx, 3))
            + kd[3 * a : 3 * a + 3],
            (dz, dy, dx, 0),
        )
    return d


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StructuredOperator:
    """Voxel-grid stiffness operator in stencil form."""

    ke: jax.Array  # (24, 24) shared reference element stiffness
    free: jax.Array  # (N, 3) free-DOF mask (flat node order)
    dims: tuple[int, int, int] = dataclasses.field(metadata=dict(static=True))  # (nx, ny, nz) elements

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        nx, ny, nz = self.dims
        return (nz + 1, ny + 1, nx + 1)

    @property
    def n_nodes(self) -> int:
        Z, Y, X = self.grid_shape
        return Z * Y * X

    @property
    def dofs_per_node(self) -> int:
        return 3

    @property
    def n_dof(self) -> int:
        return 3 * self.n_nodes

    geom = None  # host Jacobian check not needed: voxel detJ > 0 always

    def astype(self, dtype) -> "StructuredOperator":
        """Cast payloads (build at f64, cast down for mixed precision)."""
        return dataclasses.replace(
            self, ke=self.ke.astype(dtype), free=self.free.astype(dtype)
        )

    # -- stencil apply --------------------------------------------------------
    def _corner_slice(self, g: jax.Array, corner) -> jax.Array:
        nx, ny, nz = self.dims
        dz, dy, dx = corner
        return jax.lax.slice(
            g, (dz, dy, dx, 0), (dz + nz, dy + ny, dx + nx, g.shape[-1])
        )

    def apply_raw(self, u: jax.Array) -> jax.Array:
        """K @ u over all DOFs.  u (N, 3) flat -> (N, 3) flat."""
        nx, ny, nz = self.dims
        Z, Y, X = self.grid_shape
        g = u.reshape(Z, Y, X, 3)
        u_e = jnp.concatenate(
            [self._corner_slice(g, c) for c in _CORNERS], axis=-1
        )  # (nz, ny, nx, 24)
        f_e = jax.lax.dot_general(
            u_e.reshape(-1, 24),
            self.ke.astype(u.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=u.dtype,
        ).reshape(nz, ny, nx, 24)
        f = jnp.zeros((Z, Y, X, 3), u.dtype)
        for a, (dz, dy, dx) in enumerate(_CORNERS):
            f = jax.lax.dynamic_update_slice(
                f,
                jax.lax.dynamic_slice(f, (dz, dy, dx, 0), (nz, ny, nx, 3))
                + f_e[..., 3 * a : 3 * a + 3],
                (dz, dy, dx, 0),
            )
        return f.reshape(-1, 3)

    def apply(self, x: jax.Array) -> jax.Array:
        F = self.free.astype(x.dtype)
        return F * self.apply_raw(F * x) + (1.0 - F) * x

    def rhs(self, loads: jax.Array, prescribed: jax.Array) -> jax.Array:
        F = self.free.astype(loads.dtype)
        xp = (1.0 - F) * prescribed.astype(loads.dtype)
        return F * (loads - self.apply_raw(xp)) + xp

    def diag_raw(self) -> jax.Array:
        nx, ny, nz = self.dims
        Z, Y, X = self.grid_shape
        kd = jnp.diagonal(self.ke)  # (24,)
        d = jnp.zeros((Z, Y, X, 3), self.ke.dtype)
        for a, (dz, dy, dx) in enumerate(_CORNERS):
            d = jax.lax.dynamic_update_slice(
                d,
                jax.lax.dynamic_slice(d, (dz, dy, dx, 0), (nz, ny, nx, 3))
                + kd[3 * a : 3 * a + 3],
                (dz, dy, dx, 0),
            )
        return d.reshape(-1, 3)

    def diag_masked(self) -> jax.Array:
        F = self.free
        return F * self.diag_raw() + (1.0 - F)


def build_structured_operator(scene: Scene, dims: tuple[int, int, int], dtype=jnp.float32) -> StructuredOperator:
    """Operator for a voxel scene produced by ``mesh.box_hex_mesh(*dims, ...)``.

    Validates that the scene's connectivity really is the structured grid
    (cheap host check on a few elements) and integrates the single shared
    Ke from element 0.
    """
    nx, ny, nz = dims
    E = nx * ny * nz
    if scene.n_elements != E:
        raise ValueError(f"scene has {scene.n_elements} elements, dims imply {E}")
    ke = hex8_el.stiffness_matrices(
        scene.nodes.astype(dtype), scene.elements[:1], scene.material, dtype=dtype
    )[0]
    return StructuredOperator(ke=ke, free=scene.free_mask(dtype), dims=dims)


def structured_scene(
    nx: int,
    ny: int,
    nz: int,
    lx: float,
    ly: float,
    lz: float,
    material: Material,
    *,
    fix=None,
    loads=None,
    dtype=jnp.float32,
) -> tuple[Scene, tuple[int, int, int]]:
    """Convenience builder: voxel cantilever scene + dims for the
    structured operator.  ``fix``/``loads`` follow fea_tpu.make_scene; the
    default fixes the z==0 face (the reference demos' cantilever root,
    cubebeam.py:112-114)."""
    from .. import fix_where, make_scene
    from ..mesh import box_hex_mesh

    nodes, elements = box_hex_mesh(nx, ny, nz, lx, ly, lz)
    if fix is None:
        fix = fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    if loads is None:
        loads = np.zeros_like(nodes)
    scene = make_scene(nodes, elements, fix, loads, material, dtype=dtype)
    return scene, (nx, ny, nz)
