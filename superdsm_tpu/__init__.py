"""superdsm_tpu — TPU-native globally optimal cell-nucleus segmentation.

A from-scratch JAX/XLA re-design with the capabilities of BMCV/SuperDSM
(superadditivity + deformable shape models; Kostrykin & Rohr, TPAMI 2023 and
ISBI 2024). The reference's one-process-per-region cvxopt/MKL architecture is
replaced by padded, bucketed, batched Newton solves compiled once per shape
bucket, fused XLA preprocessing, and a native C++ host runtime for the
branchy label-map operations.

Public surface (mirrors the reference package layout):

- :mod:`superdsm_tpu.pipeline` — staged pipeline with partial execution
- :mod:`superdsm_tpu.automation` — scale estimation + auto-configuration
- :mod:`superdsm_tpu.batch` — hierarchical ``task.json`` batch system + CLI
- :mod:`superdsm_tpu.render` / :mod:`superdsm_tpu.export` — visualization
"""

from .version import VERSION as __version__  # noqa: F401
from .pipeline import Pipeline, Stage, create_pipeline, create_default_pipeline  # noqa: F401
from .config import Config  # noqa: F401
from . import automation  # noqa: F401
from . import io  # noqa: F401
