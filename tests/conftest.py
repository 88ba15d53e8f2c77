"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment registers a remote-TPU PJRT plugin at interpreter startup
(``sitecustomize``); tests must not depend on that tunnel, so the platform is
forced to CPU *before any backend is initialized* and the host platform is
split into 8 virtual devices for multi-chip sharding tests.
"""

import os
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
# CPU executables must not be shared with the TPU runs' persistent cache
# (AOT artifacts are machine-feature specific)
os.environ.setdefault('SDSM_COMPILATION_CACHE',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '..', '.jax_cache_cpu'))

import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    """Warn (once, visibly) when the slow quality gates don't vouch for the
    current source tree — the fast suite cannot catch the decision-flip
    classes the slow lane protects against (VERDICT r4 item 7)."""
    try:
        from superdsm_tpu._gatestamp import staleness_message
        msg = staleness_message()
    except Exception:
        return
    if msg is not None:
        import warnings
        warnings.warn(f'[slow-gates] {msg}', stacklevel=1)
