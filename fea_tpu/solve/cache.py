"""In-process hierarchy build cache (round-4, VERDICT r3 #6)."""
from __future__ import annotations

from ..scene import Scene

# In-process build cache (round-4, VERDICT r3 #6): the curvilinear and
# extruded families pay 5-20 s of one-time hierarchy construction per
# OPERATOR, but `solve()` rebuilt per CALL — 25x the sub-second solve
# for the reference's actual workload (one mesh, many loads).  Entries
# key on the IDENTITY of the scene's defining arrays (nodes, elements,
# fixed) plus the material; strong references to the keyed arrays live
# in the entry, so ids cannot be recycled while cached and an `is`
# match is sound.  Two entries per family (LRU) bound device memory
# (~1 GB at 812k DOF).
_BUILD_CACHE: dict = {}
_BUILD_CACHE_MAX = 2


def _cached_build(kind: str, scene: Scene, builder):
    key_arrays = (scene.nodes, scene.elements, scene.fixed)
    mat = (float(scene.material.E), float(scene.material.nu))
    bucket = _BUILD_CACHE.setdefault(kind, [])
    for entry in bucket:
        if (
            all(a is b for a, b in zip(entry[0], key_arrays))
            and entry[1] == mat
        ):
            return entry[2]
    value = builder()
    bucket.append((key_arrays, mat, value))
    if len(bucket) > _BUILD_CACHE_MAX:
        bucket.pop(0)
    return value


