"""Device mesh construction helpers."""

import os

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_batch=None, n_pixel=1, devices=None, axis_names=('batch', 'pixel')):
    """Builds a 2D ``(batch, pixel)`` mesh over the given devices.

    :param n_batch: Devices along the batch (data-parallel) axis; defaults to
        ``len(devices) // n_pixel``.
    :param n_pixel: Devices along the pixel (region-sharding) axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_batch is None:
        n_batch = len(devices) // n_pixel
    assert n_batch * n_pixel <= len(devices), \
        f'mesh {n_batch}x{n_pixel} needs more than {len(devices)} devices'
    dev_array = np.asarray(devices[:n_batch * n_pixel]).reshape(n_batch, n_pixel)
    return Mesh(dev_array, axis_names)


def default_mesh():
    """All local devices on the batch axis."""
    return make_mesh(n_pixel=1)


def parse_mesh_spec(spec):
    """Builds a mesh from a user spec string.

    Formats: ``"8"`` (8 devices on the batch axis), ``"batch:4"``,
    ``"batch:4,pixel:2"``. This is the user surface the reference's
    ``ray.init(num_cpus=...)`` knob maps to
    (``/root/reference/superdsm/batch.py:258-263``).
    """
    spec = str(spec).strip()
    if not spec:
        return None
    sizes = {'batch': None, 'pixel': 1}
    if spec.isdigit():
        sizes['batch'] = int(spec)
    else:
        for part in spec.split(','):
            axis, _, n = part.partition(':')
            axis = axis.strip()
            if axis not in sizes or not n.strip().isdigit():
                raise ValueError(f'invalid mesh spec {spec!r} '
                                 f"(expected e.g. '8', 'batch:4', "
                                 f"'batch:4,pixel:2')")
            sizes[axis] = int(n)
    return make_mesh(n_batch=sizes['batch'], n_pixel=sizes['pixel'])


_APPLIED_SPEC = None


def apply_env_mesh(out=None):
    """Installs the pipeline mesh requested via ``SUPERDSM_TPU_MESH`` (no-op
    when unset). Returns the mesh, or ``None``.

    Called by the batch CLI per task (after the task's ``environ`` block is
    applied, so task.json can set it) and by ``bench.py``. NOTE: mesh mode
    bypasses the AOT executable registry — serialized executables are
    specialized to the single-device placement — so the first dispatch of
    each bucket shape pays a full SPMD compile regardless of warmup
    (``superdsm_tpu/dsm/aot.py``).
    """
    global _APPLIED_SPEC
    spec = os.environ.get('SUPERDSM_TPU_MESH')
    if not spec:
        return None
    from ..dsm.batching import set_pipeline_mesh, get_pipeline_mesh
    from ..dsm import aot
    from ..output import get_output
    if spec == _APPLIED_SPEC:
        return get_pipeline_mesh()  # already installed (idempotent per task/thread)
    mesh = parse_mesh_spec(spec)
    _APPLIED_SPEC = spec
    set_pipeline_mesh(mesh)
    message = f'Pipeline mesh: {dict(mesh.shape)} over {mesh.size} devices'
    if aot.enabled():
        message += (' (note: mesh dispatches bypass the AOT executable '
                    'registry; each bucket shape compiles under SPMD '
                    'partitioning on first use)')
    get_output(out).write(message)
    return mesh
