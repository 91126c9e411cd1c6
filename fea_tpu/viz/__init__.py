"""Host-side visualization, fed straight from device arrays.

Two backends, mirroring the reference's (SURVEY.md §2 V1-V4):

  * :mod:`fea_tpu.viz.mpl` — matplotlib 3D (nodes, element faces, force
    quivers, truss plots; reference utils.py:8-124, truss.py:27-75).
  * :mod:`fea_tpu.viz.pv` — pyvista/VTK unstructured-grid rendering with
    displacement-colored cells and deformed/undeformed overlays
    (reference utils.py:446-534, fea.py:134-146).  Import is gated:
    pyvista is an optional dependency and absent from TPU images.

Both consume plain arrays (``np.asarray(device_array)``), so there is no
framework coupling — the solve stays on device, the render on host.
"""
from . import mpl  # noqa: F401

try:  # optional: pyvista is not installed in TPU containers
    from . import pv  # noqa: F401

    HAS_PYVISTA = True
except ImportError:  # pragma: no cover
    HAS_PYVISTA = False

__all__ = ["mpl", "HAS_PYVISTA"]
