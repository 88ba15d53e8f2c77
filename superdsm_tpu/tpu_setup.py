"""Accelerator platform detection and setup.

Counterpart of the reference's ``cpu_setup.py``
(``/root/reference/superdsm/cpu_setup.py:1-35``), which detects the CPU
vendor to work around MKL-on-AMD throttling. The analog here is detecting the
JAX platform/TPU generation (without initializing a backend, which is both
slow and sticky) and exporting it for debugging and reports.
"""

import os


def detect_platform():
    """Returns the configured JAX platform string without initializing it."""
    platform = os.environ.get('JAX_PLATFORMS', '')
    if platform:
        return platform.split(',')[0]
    return 'auto'


def tpu_generation():
    """Best-effort TPU generation (e.g. 'v5e'), or 'unknown'."""
    for key in ('PALLAS_AXON_TPU_GEN', 'TPU_ACCELERATOR_TYPE', 'TPU_TYPE'):
        value = os.environ.get(key)
        if value:
            return value.split(':')[0].split('-')[0]
    return 'unknown'


PLATFORM = detect_platform()
TPU_GENERATION = tpu_generation()
os.environ['SDSM_PLATFORM'] = PLATFORM
os.environ['SDSM_TPU_GENERATION'] = TPU_GENERATION
