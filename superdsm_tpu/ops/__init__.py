"""TPU-native low-level image operations.

This package holds the compute primitives the pipeline is built from:

- :mod:`~superdsm_tpu.ops.gaussian` — separable Gaussian filtering under XLA
  (replaces ``scipy.ndimage.gaussian_filter`` on the device path).
- :mod:`~superdsm_tpu.ops.edt` — Euclidean distance transforms (host exact
  via scipy; JAX separable lower-envelope variant for sharded images).
- :mod:`~superdsm_tpu.ops.watershed` — marker-based priority-flood watershed
  (native C++ with a pure-Python fallback; replaces
  ``skimage.segmentation.watershed``).
- :mod:`~superdsm_tpu.ops.morphology` — binary morphology with disk
  footprints (replaces ``skimage.morphology``).
- :mod:`~superdsm_tpu.ops.blobs` — determinant-of-Hessian blob detection in
  scale space for automatic object-scale estimation.
"""

from .gaussian import gaussian_filter, gaussian_kernel1d
from .morphology import disk, binary_dilation, binary_erosion, binary_fill_holes
from .watershed import watershed
