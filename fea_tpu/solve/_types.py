"""Solution record — the framework's counterpart of the reference
``solve()``'s ``(displacements, forces)`` return
(``/root/reference/fea.py:86-115``)."""
from __future__ import annotations

import dataclasses

import jax

from ..solvers.cg import SolveStats

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Solve result.

    ``reactions`` contract (ADVICE r4): K @ u over ALL DOFs (parity with
    the reference's ``fea.py:113``), as an ARRAY-LIKE — a jax Array on
    device-certified routes, a host ``np.ndarray`` when a host-IEEE
    certification tier produced it (the exact-f64 raw apply doubles as
    the reaction field there, and pushing ~20 MB/812k DOF back through
    the device link would cost more than every consumer, which reads
    reactions host-side anyway).  Consumers that need a device array
    should ``jnp.asarray(solution.reactions)``; NumPy consumers work
    with both unchanged.
    """

    displacements: jax.Array  # (N, dpn)
    reactions: jax.Array  # (N, dpn)
    stats: SolveStats


