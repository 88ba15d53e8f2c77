"""Multi-chip execution: device meshes and sharded batched solves.

The reference scales with a Ray task pool on one host
(``/root/reference/superdsm/batch.py:258-263``); here scaling is expressed
through ``jax.sharding`` over a device :class:`~jax.sharding.Mesh`:

- **batch axis** — independent convex programs (candidate objects) are
  sharded across devices; zero communication.
- **pixel axis** — very large regions (e.g. 4K mosaics) shard their pixels;
  per-shard gradient/Hessian contributions are combined with ``psum`` over
  ICI and the Newton update stays replicated.
"""

from .mesh import make_mesh, default_mesh  # noqa: F401
from .newton import make_sharded_poly_solver, make_sharded_dsm_solver  # noqa: F401
from .pipelined import process_images_pipelined  # noqa: F401
from .mosaic import process_mosaic, rasterize_mosaic_labels  # noqa: F401
from ..dsm.batching import set_pipeline_mesh, get_pipeline_mesh, device_scope  # noqa: F401
