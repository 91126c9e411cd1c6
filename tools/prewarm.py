"""Pre-warm the persistent compilation cache with the bench's programs.

Run this AFTER the final code change of a session (any edit that alters
a traced program's HLO invalidates its cache entry — the round-1 lesson:
the flagship entry in ``.jax_cache/`` predated the last commit, so the
next fresh process recompiled ~25 min).  It simply executes the bench
end-to-end at the default shape, which compiles and caches every staged
program; a subsequent ``python bench.py`` then reaches its JSON line in
seconds-to-a-minute.

    python tools/prewarm.py            # default bench shape
    python tools/prewarm.py --fused    # also the one-jit fused program
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, ".."))


def main() -> None:
    fused = "--fused" in sys.argv
    runs = [["--solver", "staged"]]
    if fused:
        runs.append(["--solver", "fused"])
    for extra in runs:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--repeats", "1"] + extra
        t0 = time.perf_counter()
        print(f"prewarm: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, cwd=REPO)
        print(
            f"prewarm: rc={proc.returncode} in {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        if proc.returncode != 0:
            sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
