"""Element formulations.

Each family module exposes batched, jit-compatible primitives:

  * ``stiffness_matrices(scene-like args) -> (E, k, k)`` explicit Ke batch
  * a matrix-free ``apply`` where the formulation admits one (hex8)
  * a ``diagonal`` extraction feeding the Jacobi preconditioner

The reference computes one Ke at a time inside serial Python loops
(``/root/reference/fea.py:89-97``); here every element integrates at once
on dense ``(E, npe, dim)`` arrays.
"""
from . import beam, hex8, truss  # noqa: F401

__all__ = ["hex8", "beam", "truss"]
