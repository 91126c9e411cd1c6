"""Post-processing: reactions, stresses, beam internal actions, checkpoints.

Covers the reference's post layer (SURVEY.md §2 P1/P2) and extends it:
the reference recovers only global reactions K @ u (fea.py:113) and beam
moment/shear; this module adds element strain/stress and von Mises
recovery for solids, and npz checkpointing of solved scenes (SURVEY.md
§5.4).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .elements import beam as beam_el
from .elements import hex8 as hex8_el
from .elements import truss as truss_el
from .scene import Scene

__all__ = [
    "reactions",
    "hex8_stress",
    "beam_moment_shear",
    "truss_member_forces",
    "save_solution",
    "load_solution",
]


def reactions(op, u):
    """K @ u over all DOFs (reference parity: /root/reference/fea.py:113)."""
    return op.apply_raw(u)


def hex8_stress(scene: Scene, u):
    """Element-centroid Voigt strain/stress and von Mises, for a hex8 scene.

    Returns (strain (E,6), stress (E,6), von_mises (E,))."""
    eps, sig = hex8_el.centroid_strain_stress(scene.nodes, scene.elements, u, scene.material)
    return eps, sig, hex8_el.von_mises(sig)


def beam_moment_shear(scene: Scene, u):
    """Per-element (M_left, M_right, V) for an eb_beam scene."""
    inertia = scene.section if scene.section is not None else 1.0
    return beam_el.moment_shear(scene.nodes, scene.elements, u, scene.material, inertia)


def truss_member_forces(scene: Scene, u):
    """Axial member forces (tension positive) for a bar scene."""
    return truss_el.member_forces(scene.nodes, scene.elements, u, scene.section)


def save_solution(path: str, scene: Scene, u, reactions_=None) -> None:
    """Checkpoint a solved scene as .npz (host-side)."""
    payload = dict(
        nodes=np.asarray(scene.nodes),
        elements=np.asarray(scene.elements),
        fixed=np.asarray(scene.fixed),
        loads=np.asarray(scene.loads),
        displacements=np.asarray(u),
        family=np.asarray(scene.family),
        E=np.asarray(scene.material.E),
        nu=np.asarray(scene.material.nu),
    )
    if reactions_ is not None:
        payload["reactions"] = np.asarray(reactions_)
    if scene.section is not None:
        payload["section"] = np.asarray(scene.section)
    np.savez_compressed(path, **payload)


def load_solution(path: str) -> dict:
    """Load a checkpoint back as a dict of arrays."""
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}
