"""Structured per-solve metrics (SURVEY.md §5.5).

Each solve can emit a :class:`SolveRecord` — n_dof, n_elements,
iterations, achieved residual, wall time, DOF/s — the unit of
observability that doubles as the benchmark harness feeding
BASELINE.md/bench.py.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

__all__ = ["SolveRecord", "record_solve", "records"]

records: list["SolveRecord"] = []


@dataclasses.dataclass
class SolveRecord:
    n_dof: int
    n_elements: int
    iterations: int
    relative_residual: float
    wall_time_s: float
    method: str = "cg"
    backend: str = ""
    extra: Optional[dict] = None

    @property
    def dof_per_s(self) -> float:
        return self.n_dof / self.wall_time_s if self.wall_time_s > 0 else float("inf")

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["dof_per_s"] = self.dof_per_s
        return json.dumps(d)


def record_solve(scene, stats, wall_time_s: float, method: str = "cg", **extra) -> SolveRecord:
    """Build, store, and return a record from a solved scene."""
    import jax

    rec = SolveRecord(
        n_dof=scene.n_dof,
        n_elements=scene.n_elements,
        iterations=int(stats.iterations),
        relative_residual=float(stats.relative_residual),
        wall_time_s=wall_time_s,
        method=method,
        backend=jax.default_backend(),
        extra=extra or None,
    )
    records.append(rec)
    return rec

