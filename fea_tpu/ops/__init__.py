"""TPU kernel layer: the framework's equivalent of a native/C++ tier
(SURVEY.md §2: the reference has no native components; the performance-
critical layer here is Pallas/XLA kernels).

  * :mod:`structured` — stencil-form stiffness operator for voxel meshes:
    no index arrays at all, gather/scatter are static slice-shifts and the
    element apply is one large MXU matmul.
  * :mod:`pallas_apply` — Pallas kernels for the batched element apply
    (element-on-lanes layout), with XLA fallbacks.
"""
from . import structured  # noqa: F401

__all__ = ["structured"]
