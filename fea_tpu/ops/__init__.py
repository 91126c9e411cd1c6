"""TPU kernel layer: the framework's equivalent of a native/C++ tier
(SURVEY.md §2: the reference has no native components; the performance-
critical layer here is Pallas/XLA kernels).

  * :mod:`structured` — stencil-form stiffness operator for voxel meshes:
    no index arrays at all, gather/scatter are static slice-shifts and the
    element apply is one large MXU matmul.
  * :mod:`pallas_apply` — Pallas kernels for the batched element apply
    (element-on-lanes layout), with XLA fallbacks.
  * :mod:`pallas_stencil` — fused stencil kernels in the component-major
    (3, Y, X, Z) layout: f32 apply and the double-f32 (error-free
    transformation) f64-accurate apply.
  * :mod:`transposed` — the whole solve pipeline (masked operator,
    multigrid V-cycle, FCG state) re-expressed in that layout so the
    fused kernels run without per-apply transposes.
"""
from . import structured  # noqa: F401

__all__ = ["structured"]
