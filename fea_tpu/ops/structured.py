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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..elements import hex8 as hex8_el
from ..materials import Material
from ..scene import Scene

__all__ = ["StructuredOperator", "build_structured_operator", "structured_scene", "infer_box_dims"]

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
    ke = ke.astype(g.dtype)

    def corner_slice(arr, corner, width):
        dz, dy, dx = corner
        return jax.lax.slice(arr, (dz, dy, dx, 0), (dz + nz, dy + ny, dx + nx, width))

    # The 24-wide contraction runs as elementwise multiply-adds on the
    # VPU rather than a dot_general: a (E, 24) @ (24, 24) matmul wastes
    # >80% of the MXU and — measured on this toolchain — sends the TPU
    # compiler down a minutes-long layout path, while the f64 fallback
    # and this VPU form compile in seconds.  Contributions accumulate
    # corner-pair-wise: for target corner a and source corner b,
    # f[base + a] += u[base + b] @ Ke[3a:3a+3, 3b:3b+3]^T over the
    # element grid, realized as zero-padded adds (purely functional; a
    # read-modify-write dynamic_update_slice chain also compiles
    # pathologically slowly here).
    f = jnp.zeros_like(g)
    for a, ca in enumerate(_CORNERS):
        f_a = jnp.zeros((nz, ny, nx, 3), g.dtype)
        for b, cb in enumerate(_CORNERS):
            u_b = corner_slice(g, cb, 3)  # (nz, ny, nx, 3)
            kab = ke[3 * a : 3 * a + 3, 3 * b : 3 * b + 3]  # (3, 3)
            f_a = f_a + (
                u_b[..., 0, None] * kab[:, 0]
                + u_b[..., 1, None] * kab[:, 1]
                + u_b[..., 2, None] * kab[:, 2]
            )
        dz, dy, dx = ca
        f = f + jnp.pad(f_a, ((dz, 1 - dz), (dy, 1 - dy), (dx, 1 - dx), (0, 0)))
    return f


def stencil_apply_grid_scan(ke: jax.Array, g: jax.Array, dims: tuple[int, int, int]) -> jax.Array:
    """:func:`stencil_apply_grid` with the target-corner loop as a
    ``lax.scan`` — bit-different only in summation order, ~8x smaller
    HLO/executable.

    Why: the emulated-f64 certification apply's fully unrolled program
    weighs ~11 MB and executables stream to the chip at ~0.3-0.5 MB/s
    through the axon tunnel, so its upload alone cost ~20-30 s of every
    warm restart (docs/PERF.md "Compile-time behavior") — against ~ms of
    extra runtime from the scan's 8 dynamic read-modify-write passes.
    Used by the certification path (solve._t_true_residual); the hot
    V-cycle/solve applies keep the fused unrolled form.
    """
    nx, ny, nz = dims
    ke = ke.astype(g.dtype)
    # (a, b, 3, 3) corner-pair blocks, gathered by traced index in-scan
    kab = ke.reshape(8, 3, 8, 3).transpose(0, 2, 1, 3)
    corners = jnp.asarray(_CORNERS, jnp.int32)  # (8, 3) (dz, dy, dx)

    def corner_slice(arr, corner, width):
        dz, dy, dx = corner
        return jax.lax.slice(arr, (dz, dy, dx, 0), (dz + nz, dy + ny, dx + nx, width))

    # source-corner slices are a-independent: hoisted out of the scan
    u_bs = jnp.stack([corner_slice(g, cb, 3) for cb in _CORNERS])  # (8, nz, ny, nx, 3)

    def body(f, a):
        ka = kab[a]  # (8, 3, 3) — dynamic gather on the tiny table
        f_a = jnp.zeros((nz, ny, nx, 3), g.dtype)
        for b in range(8):
            u_b = u_bs[b]
            k = ka[b]
            f_a = f_a + (
                u_b[..., 0, None] * k[:, 0]
                + u_b[..., 1, None] * k[:, 1]
                + u_b[..., 2, None] * k[:, 2]
            )
        start = (corners[a, 0], corners[a, 1], corners[a, 2],
                 jnp.zeros((), jnp.int32))
        cur = jax.lax.dynamic_slice(f, start, (nz, ny, nx, 3))
        return jax.lax.dynamic_update_slice(f, cur + f_a, start), None

    f, _ = jax.lax.scan(body, jnp.zeros_like(g), jnp.arange(8))
    return f


def stencil_diag_grid(ke: jax.Array, dims: tuple[int, int, int]) -> jax.Array:
    """Assembled stiffness diagonal in grid space, (Z, Y, X, 3)."""
    nx, ny, nz = dims
    kd = jnp.diagonal(ke)
    d = jnp.zeros((nz + 1, ny + 1, nx + 1, 3), ke.dtype)
    for a, (dz, dy, dx) in enumerate(_CORNERS):
        block = jnp.broadcast_to(kd[3 * a : 3 * a + 3], (nz, ny, nx, 3))
        d = d + jnp.pad(block, ((dz, 1 - dz), (dy, 1 - dy), (dx, 1 - dx), (0, 0)))
    return d


# -- host-side (NumPy) twins of the stencil kernels ---------------------------
# Used at build time (multigrid hierarchy, lambda_max bounds, oracles):
# running these on the host keeps hierarchy construction free of device
# dispatches and of TPU numerics entirely.


def corner_table_np(per_row: np.ndarray) -> np.ndarray:
    """(3, 3, 3, 3) region table of assembled per-corner contributions.

    On a full voxel box the assembly of a shared per-element 24-vector
    is constant over the 27 boundary classes (min-face / interior /
    max-face per axis); entry [iz, iy, ix] is that class's 3-vector.
    """
    pr = np.asarray(per_row).reshape(8, 3)

    def exists(axis_class: int, corner_off: int) -> bool:
        # corner offset 0 needs an element above (fails on the max face);
        # offset 1 needs one below (fails on the min face)
        return not ((corner_off == 0 and axis_class == 2) or (corner_off == 1 and axis_class == 0))

    table = np.zeros((3, 3, 3, 3), pr.dtype)
    for iz in range(3):
        for iy in range(3):
            for ix in range(3):
                v = np.zeros(3, pr.dtype)
                for a, (az, ay, ax) in enumerate(_CORNERS):
                    if exists(iz, az) and exists(iy, ay) and exists(ix, ax):
                        v += pr[a]
                table[iz, iy, ix] = v
    return table


def fill_regions_np(table: np.ndarray, dims: tuple[int, int, int]) -> np.ndarray:
    """Broadcast a (3, 3, 3, 3) region table onto the (Z, Y, X, 3) grid —
    one full-grid write total."""
    nx, ny, nz = dims
    d = np.empty((nz + 1, ny + 1, nx + 1, 3), table.dtype)
    sl = {0: slice(0, 1), 1: slice(1, -1), 2: slice(-1, None)}
    for iz in range(3):
        for iy in range(3):
            for ix in range(3):
                d[sl[iz], sl[iy], sl[ix], :] = table[iz, iy, ix]
    return d


def corner_accumulate_np(per_row: np.ndarray, dims: tuple[int, int, int]) -> np.ndarray:
    """Assemble a per-element-row 24-vector into node-grid DOFs, (Z,Y,X,3).

    The NumPy twin of the pad-add in :func:`stencil_diag_grid`: every
    element adds ``per_row[3a:3a+3]`` into its corner ``a``; realized as
    a 27-region table fill (:func:`corner_table_np` +
    :func:`fill_regions_np`), which keeps hierarchy construction ~free
    even when re-run inside every benchmark repeat.
    """
    return fill_regions_np(corner_table_np(per_row), dims)


def stencil_diag_np(ke: np.ndarray, dims: tuple[int, int, int]) -> np.ndarray:
    """NumPy twin of :func:`stencil_diag_grid`."""
    return corner_accumulate_np(np.ascontiguousarray(np.diagonal(ke)), dims)


def stencil_apply_np(ke: np.ndarray, g: np.ndarray, dims: tuple[int, int, int]) -> np.ndarray:
    """NumPy twin of :func:`stencil_apply_grid` (f64 host oracle)."""
    nx, ny, nz = dims
    f = np.zeros_like(g)
    for a, ca in enumerate(_CORNERS):
        f_a = np.zeros((nz, ny, nx, 3), g.dtype)
        for b, cb in enumerate(_CORNERS):
            dz, dy, dx = cb
            u_b = g[dz : dz + nz, dy : dy + ny, dx : dx + nx, :]
            f_a += u_b @ ke[3 * a : 3 * a + 3, 3 * b : 3 * b + 3].T
        dz, dy, dx = ca
        f += np.pad(f_a, ((dz, 1 - dz), (dy, 1 - dy), (dx, 1 - dx), (0, 0)))
    return f


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
    def apply_raw(self, u: jax.Array) -> jax.Array:
        """K @ u over all DOFs.  u (N, 3) flat -> (N, 3) flat."""
        Z, Y, X = self.grid_shape
        g = u.reshape(Z, Y, X, 3)
        return stencil_apply_grid(self.ke, g, self.dims).reshape(-1, 3)

    def apply(self, x: jax.Array) -> jax.Array:
        F = self.free.astype(x.dtype)
        return F * self.apply_raw(F * x) + (1.0 - F) * x

    def rhs(self, loads: jax.Array, prescribed: jax.Array) -> jax.Array:
        F = self.free.astype(loads.dtype)
        xp = (1.0 - F) * prescribed.astype(loads.dtype)
        return F * (loads - self.apply_raw(xp)) + xp

    def diag_raw(self) -> jax.Array:
        return stencil_diag_grid(self.ke, self.dims).reshape(-1, 3)

    def diag_masked(self) -> jax.Array:
        F = self.free
        return F * self.diag_raw() + (1.0 - F)


def _expected_box_elements(nx: int, ny: int, nz: int) -> np.ndarray:
    """box_hex_mesh's connectivity by pure index arithmetic (no nodes)."""
    X, Yn = nx + 1, ny + 1
    i = np.arange(nx, dtype=np.int64)
    j = np.arange(ny, dtype=np.int64)
    k = np.arange(nz, dtype=np.int64)
    base = k[:, None, None] * (Yn * X) + j[None, :, None] * X + i[None, None, :]
    quad = np.stack([base, base + 1, base + X + 1, base + X], axis=-1)
    return np.concatenate([quad, quad + Yn * X], axis=-1).reshape(-1, 8)


def _validate_box_scene(scene: Scene, dims: tuple[int, int, int]) -> None:
    """Raise ValueError unless the scene IS a regular voxel box with
    box_hex_mesh ordering and ``dims`` elements per axis.

    O(N) arithmetic — no mesh regeneration, no (E, 8, 3) coordinate
    gathers (at 8M DOF those cost ~2 minutes of host time and dominated
    the benchmark's assembly stage).  Node positions are checked against
    the outer-product grid of the three axis coordinate vectors, which
    also certifies element congruence (uniform spacing per axis).
    """
    nx, ny, nz = dims
    E = nx * ny * nz
    if scene.n_elements != E:
        raise ValueError(f"scene has {scene.n_elements} elements, dims imply {E}")
    X, Yn, Zn = nx + 1, ny + 1, nz + 1
    if scene.n_nodes != X * Yn * Zn:
        raise ValueError(f"scene has {scene.n_nodes} nodes, dims imply {X * Yn * Zn}")
    if not np.array_equal(np.asarray(scene.elements), _expected_box_elements(nx, ny, nz)):
        raise ValueError(
            "scene connectivity does not match the structured voxel grid "
            f"implied by dims={dims}; the stencil operator requires the "
            "box_hex_mesh node/element ordering"
        )
    nodes = np.asarray(scene.nodes)
    # eps * max|coordinate| rounding (f32-built meshes) is noise, not geometry
    tol = 64.0 * float(np.finfo(nodes.dtype).eps) * max(float(np.max(np.abs(nodes))), 1e-30)
    xs = nodes[:X, 0]
    ys = nodes[: Yn * X : X, 1]
    zs = nodes[:: Yn * X, 2]
    for name, v in (("x", xs), ("y", ys), ("z", zs)):
        d = np.diff(v)
        if d.size == 0 or float(d.min()) <= 0 or float(np.ptp(d)) > 2 * tol:
            raise ValueError(
                f"structured operator requires uniform {name}-spacing "
                "(congruent voxel elements)"
            )
    grid = nodes.reshape(Zn, Yn, X, 3)
    ok = (
        float(np.max(np.abs(grid[..., 0] - xs[None, None, :]))) <= tol
        and float(np.max(np.abs(grid[..., 1] - ys[None, :, None]))) <= tol
        and float(np.max(np.abs(grid[..., 2] - zs[:, None, None]))) <= tol
    )
    if not ok:
        raise ValueError(
            "structured operator requires congruent voxel elements "
            "(node positions must form the regular axis-product grid)"
        )


def infer_box_dims(scene: Scene) -> Optional[tuple[int, int, int]]:
    """(nx, ny, nz) if the scene is a regular voxel box in box_hex_mesh
    ordering, else None.

    Host-side detection for ``solve(method='auto')``: infers the row
    lengths from where the x/y coordinates wrap, then runs the full O(N)
    validation, so arbitrary hex meshes fall back to the unstructured
    operator instead of silently mis-solving.
    """
    if scene.family != "hex8":
        return None
    nodes = np.asarray(scene.nodes)
    x = nodes[:, 0]
    dec = np.nonzero(x[1:] < x[:-1])[0]
    X = int(dec[0]) + 1 if dec.size else nodes.shape[0]
    if X < 2 or nodes.shape[0] % X:
        return None
    y = nodes[::X, 1]
    dec = np.nonzero(y[1:] < y[:-1])[0]
    Yn = int(dec[0]) + 1 if dec.size else y.shape[0]
    if Yn < 2 or nodes.shape[0] % (X * Yn):
        return None
    Zn = nodes.shape[0] // (X * Yn)
    if Zn < 2:
        return None
    dims = (X - 1, Yn - 1, Zn - 1)
    try:
        _validate_box_scene(scene, dims)
    except ValueError:
        return None
    return dims


def build_structured_operator(scene: Scene, dims: tuple[int, int, int], dtype=jnp.float32) -> StructuredOperator:
    """Operator for a voxel scene produced by ``mesh.box_hex_mesh(*dims, ...)``.

    Validates (O(N) arithmetic, see ``_validate_box_scene``) that the
    scene's connectivity IS the structured grid the stencil assumes and
    that all elements are congruent, then integrates the single shared Ke.
    """
    _validate_box_scene(scene, dims)
    # One-element integration in host NumPy f64: O(1) work, zero compiles
    # (a jax dispatch here costs a ~20 s tiny-shape eager compile per
    # process on the tunneled TPU backend, measured), rounded to the
    # requested dtype — at f32 this is the correctly-rounded f64 Ke.
    X0 = np.asarray(scene.nodes)[np.asarray(scene.elements[0])]  # (8, 3) host
    ke = hex8_el.stiffness_matrix_np(X0, scene.material).astype(dtype)
    return StructuredOperator(ke=jnp.asarray(ke), free=scene.free_mask(dtype), dims=dims)


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
