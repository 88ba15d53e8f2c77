"""The DSM math core: convex energies and batched Newton solvers.

This package replaces the reference's per-region cvxopt interior-point solves
(``/root/reference/superdsm/dsm.py:253-491`` and
``/root/reference/superdsm/objects.py:321-412``) with padded, bucketed,
batched damped-Newton minimization compiled once per shape bucket and run on
TPU. The explicit block-Toeplitz deformation matrix (whose allocation the
reference throttles with a POSIX semaphore) is built on device directly from
pixel/grid coordinates.
"""

from .model import DeformableShapeModel
from .solver import solve_polynomial_batch, solve_dsm_batch, SolverResult
from .smooth import subsample_grid, smooth_matrix_params, build_smooth_matrix
