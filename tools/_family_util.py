"""Shared harness for the per-family benchmark tools (round-5, VERDICT
r4 #1/#2): stage-timed heartbeats, a SIGALRM wall deadline, and a
PARTIAL-result JSON line on any failure — a family tool must never
vanish with nothing on stdout the way the round-4 curvilinear run did
(480 s timeout, one heartbeat, zero JSON).

Usage::

    st = Stages("curv", deadline_s=args.deadline_s)
    with st.stage("scene"):
        ...build scene...
    ...
    st.finish(dict(n_dof=..., dof_per_s=...))   # success JSON
    # on FamilyDeadline / exception: st.fail(exc) prints the partial
    # JSON (stages completed + timings + error) and exits rc=3

The SIGALRM deadline interrupts pure-Python waits between device calls;
a wedged native call (remote compile RPC) can only be bounded by the
parent's subprocess timeout — which is why the parent (bench.py) also
captures this tool's stderr tail into its record on timeout.
"""
from __future__ import annotations

import json
import signal
import sys
import time


class FamilyDeadline(Exception):
    pass


class Stages:
    def __init__(self, tag: str, deadline_s: float | None = None):
        self.tag = tag
        self.t0 = time.perf_counter()
        self.stage_s: dict[str, float] = {}
        self.current: str | None = None
        self.extra: dict = {}
        if deadline_s and deadline_s > 0 and hasattr(signal, "SIGALRM"):
            def _on_alarm(signum, frame):
                raise FamilyDeadline(
                    f"wall deadline {deadline_s:.0f}s hit in stage "
                    f"{self.current!r}"
                )

            signal.signal(signal.SIGALRM, _on_alarm)
            signal.alarm(int(deadline_s))

    def say(self, msg: str) -> None:
        print(
            f"[{self.tag} +{time.perf_counter() - self.t0:6.1f}s] {msg}",
            file=sys.stderr, flush=True,
        )

    def stage(self, name: str):
        return _StageCtx(self, name)

    def _emit(self, payload: dict) -> None:
        payload.setdefault("stage_s", {k: round(v, 2) for k, v in self.stage_s.items()})
        payload.setdefault("total_s", round(time.perf_counter() - self.t0, 2))
        payload.update(self.extra)
        print(json.dumps(payload), flush=True)

    def finish(self, payload: dict) -> None:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
        self._emit(payload)

    def fail(self, exc: BaseException, payload: dict | None = None) -> None:
        """Partial-result JSON + rc=3 — the parent records the stages
        that DID complete instead of an empty timeout."""
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)
        p = dict(payload or {})
        p["partial"] = True
        p["error"] = f"{type(exc).__name__}: {exc}"
        p["stage_reached"] = self.current
        self._emit(p)
        sys.exit(3)


class _StageCtx:
    def __init__(self, stages: Stages, name: str):
        self.stages, self.name = stages, name

    def __enter__(self):
        self.stages.current = self.name
        self.stages.say(f"stage {self.name}: start")
        self.t = time.perf_counter()
        return self

    def __exit__(self, et, ev, tb):
        dt = time.perf_counter() - self.t
        self.stages.stage_s[self.name] = dt
        if et is None:
            self.stages.say(f"stage {self.name}: {dt:.1f} s")
            self.stages.current = None
        return False
