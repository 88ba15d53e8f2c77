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

import os as _os

# Persistent XLA compilation cache: compiles of the padded bucket shapes are
# expensive (minutes per shape via remote-compile TPU tunnels), but stable
# across processes. Cached next to the package unless overridden.
if _os.environ.get('SDSM_DISABLE_COMPILATION_CACHE') != '1':
    try:
        import jax as _jax
        # scope the cache by platform: AOT artifacts are machine/backend
        # specific and must not be shared between CPU test runs and TPU runs
        _platform = _os.environ.get('JAX_PLATFORMS', 'default').split(',')[0] or 'default'
        _cache_dir = _os.environ.get(
            'SDSM_COMPILATION_CACHE',
            _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                          '.jax_cache', _platform))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

from .version import VERSION as __version__  # noqa: F401
from .pipeline import Pipeline, Stage, create_pipeline, create_default_pipeline  # noqa: F401
from .config import Config  # noqa: F401
from . import automation  # noqa: F401
from . import io  # noqa: F401
