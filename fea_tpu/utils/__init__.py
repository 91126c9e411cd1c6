"""Observability utilities: structured solve records and profiling
(SURVEY.md §5.1/§5.5 — absent from the reference beyond prints)."""
from .metrics import SolveRecord, record_solve, records  # noqa: F401
from .profiling import Timer, trace  # noqa: F401

__all__ = ["SolveRecord", "record_solve", "records", "Timer", "trace"]
