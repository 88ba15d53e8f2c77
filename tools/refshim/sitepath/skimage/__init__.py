"""Minimal stand-in for the slice of scikit-image the reference uses.

Scoped by a sweep of ``/root/reference/superdsm`` (io, util.view_as_windows,
morphology disk/binary ops, segmentation.watershed, measure.regionprops
eccentricity, draw.line/disk, feature.blob internals).  Implemented on
numpy/scipy/PIL with semantics matching scikit-image 0.18 where the
reference depends on them (erosion pads with 1, dilation with 0; watershed
is a FIFO-tiebroken priority flood with connectivity-1 structure).
"""

from . import io, util, morphology, segmentation, measure, draw, feature, transform  # noqa: F401
