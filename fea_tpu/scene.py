"""Scene description — the framework's core data model.

Keeps the reference's array-oriented scene exactly (SURVEY.md §7 "Design
stance"): ``nodes (N,d)``, ``elements (E,npe)`` integer connectivity, a
per-DOF constraint mask (``/root/reference/fea.py:119-121`` uses a 0/1 int
mask, 1 = fixed), and nodal ``loads (N,dpn)`` — but as a registered pytree
dataclass so whole scenes jit, vmap (parameter sweeps) and shard.

Unlike the reference, constrained DOFs may carry *prescribed* nonzero
displacements, and the element family is explicit static metadata instead
of being implied by which script you ran.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .materials import Material

__all__ = ["ElementFamily", "FAMILIES", "Scene", "ndof", "dof_ids"]


@dataclasses.dataclass(frozen=True)
class ElementFamily:
    """Static description of an element formulation."""

    name: str
    nodes_per_element: int
    dofs_per_node: int

    @property
    def dofs_per_element(self) -> int:
        return self.nodes_per_element * self.dofs_per_node


FAMILIES: dict[str, ElementFamily] = {
    # 8-node trilinear hexahedron, 3 translational DOFs/node
    # (reference element: /root/reference/utils.py:127-239).
    "hex8": ElementFamily("hex8", 8, 3),
    # Euler-Bernoulli bending element, (w, theta) per node
    # (reference element: /root/reference/euler_bernoulli.py:22-39).
    "eb_beam": ElementFamily("eb_beam", 2, 2),
    # Pin-jointed axial bar in 2D / 3D
    # (reference element: /root/reference/truss.py:78-92).
    "bar2d": ElementFamily("bar2d", 2, 2),
    "bar3d": ElementFamily("bar3d", 2, 3),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """A complete analysis scene.

    Data leaves (traced): nodes, elements, fixed, loads, material,
    prescribed, section.  Static metadata: family.

    ``section`` carries family-specific scalars/arrays: for ``eb_beam``
    the second moment of area I (per element or scalar); for bars the
    axial stiffness k = EA/L0 inputs (area A, per element or scalar).
    """

    nodes: jax.Array  # (N, dim) float
    elements: jax.Array  # (E, npe) int
    fixed: jax.Array  # (N, dpn) bool — True = constrained
    loads: jax.Array  # (N, dpn) float — applied nodal loads
    material: Material
    family: str = dataclasses.field(metadata=dict(static=True), default="hex8")
    prescribed: Optional[jax.Array] = None  # (N, dpn) float, used where fixed
    section: Optional[jax.Array] = None  # family-specific section property

    @property
    def element_family(self) -> ElementFamily:
        return FAMILIES[self.family]

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[-2]

    @property
    def n_elements(self) -> int:
        return self.elements.shape[-2]

    @property
    def n_dof(self) -> int:
        return self.n_nodes * self.element_family.dofs_per_node

    def free_mask(self, dtype=jnp.float32) -> jax.Array:
        """1.0 on free DOFs, 0.0 on fixed — the masking counterpart of the
        reference's index *reduction* (/root/reference/fea.py:99-103),
        chosen because masking keeps shapes static under jit."""
        return 1.0 - self.fixed.astype(dtype)

    def prescribed_or_zero(self, dtype=jnp.float32) -> jax.Array:
        if self.prescribed is None:
            return jnp.zeros(self.fixed.shape, dtype)
        return self.prescribed.astype(dtype)


def make_scene(
    nodes,
    elements,
    fixed,
    loads,
    material: Material,
    family: str = "hex8",
    prescribed=None,
    section=None,
    dtype=jnp.float32,
) -> Scene:
    """Build a Scene from host arrays, normalizing dtypes/shapes.

    Accepts the reference's 0/1 int constraint masks
    (``/root/reference/fea.py:119-121``) as well as booleans.
    """
    fam = FAMILIES[family]
    nodes = jnp.asarray(nodes, dtype)
    elements = jnp.asarray(np.asarray(elements), jnp.int32)
    fixed = jnp.asarray(np.asarray(fixed) != 0)
    loads = jnp.asarray(loads, dtype)
    if elements.ndim != 2 or elements.shape[1] != fam.nodes_per_element:
        raise ValueError(
            f"elements must be (E, {fam.nodes_per_element}) for family {family}, got {elements.shape}"
        )
    if fixed.shape != (nodes.shape[0], fam.dofs_per_node):
        raise ValueError(
            f"fixed mask must be (N, {fam.dofs_per_node}), got {fixed.shape}"
        )
    if loads.shape != fixed.shape:
        raise ValueError(f"loads must match fixed mask shape {fixed.shape}, got {loads.shape}")
    if prescribed is not None:
        prescribed = jnp.asarray(prescribed, dtype)
    if section is not None:
        section = jnp.asarray(section, dtype)
    return Scene(
        nodes=nodes,
        elements=elements,
        fixed=fixed,
        loads=loads,
        material=material,
        family=family,
        prescribed=prescribed,
        section=section,
    )


def ndof(scene: Scene) -> int:
    return scene.n_dof


def dof_ids(elements: jax.Array, dofs_per_node: int) -> jax.Array:
    """Element-local → global DOF map, (E, npe*dpn).

    Same layout as the reference's ``i*dpn + j`` maps
    (``/root/reference/fea.py:93``, ``euler_bernoulli.py:44``), built by
    broadcasting instead of Python list comprehension.
    """
    E, npe = elements.shape
    base = elements.astype(jnp.int32)[:, :, None] * dofs_per_node  # (E, npe, 1)
    offs = jnp.arange(dofs_per_node, dtype=jnp.int32)[None, None, :]
    return (base + offs).reshape(E, npe * dofs_per_node)
