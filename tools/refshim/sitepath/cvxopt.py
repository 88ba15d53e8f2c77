"""Stand-in for the small slice of ``cvxopt`` the reference uses.

The reference wraps its convex energy into the cvxopt nonlinear solver
protocol (``/root/reference/superdsm/dsm.py:431-491``): the problem is
*unconstrained* smooth convex minimization, and ``cvxopt.solvers.cp`` is used
purely as a globally convergent Newton engine.  This shim implements that
protocol with an independent damped-Newton method (Cholesky + Levenberg
escalation + Armijo backtracking), so the unmodified reference pipeline can
run here and serve as an accuracy ground truth: for a convex problem, any
convergent solver reaches the same optimum.

Protocol (matching the cvxopt user guide "Problems with nonlinear
objectives", zero constraints):

* ``F()``            -> ``(0, x0)``
* ``F(x)``           -> ``(f, Df)``  with ``Df`` a 1 x n row
* ``F(x, z)``        -> ``(f, Df, H)`` with ``H = z[0] * hessian`` given as a
  dense matrix or an (effectively lower-triangular) sparse matrix -- the
  reference's MKL ``syrk`` gram returns a single triangle
  (``dsm.py:371``), mirroring real cvxopt which only reads one triangle.
"""

import numpy as np
import scipy.linalg
import scipy.sparse as _sp


def matrix(x, size=None, tc=None):
    a = np.asarray(x, dtype=float)
    if size is not None:
        a = a.reshape(size[1], size[0]).T
    elif a.ndim < 2:
        a = a.reshape(-1, 1)
    return a


def spmatrix(data, row, col, size=None, tc=None):
    data = np.asarray(data, dtype=float)
    row = np.asarray(row, dtype=int)
    col = np.asarray(col, dtype=int)
    if size is None:
        size = (row.max() + 1, col.max() + 1)
    return _sp.coo_matrix((data, (row, col)), shape=size)


def _symmetrize_from_lower(H):
    """The reference assembles H with only the lower triangle guaranteed
    populated (MKL syrk gram transposed, ``dsm.py:368-376``); real cvxopt
    reads the 'L' triangle in its KKT factorizations. Match that."""
    if _sp.issparse(H):
        H = H.toarray()
    H = np.asarray(H, dtype=float)
    L = np.tril(H)
    return L + L.T - np.diag(np.diag(L))


class _Solvers:
    def __init__(self):
        self.options = {}

    def cp(self, F, *args, **kwargs):
        maxiters = int(self.options.get('maxiters', 100))
        abstol = float(self.options.get('abstol', 1e-9))

        _, x0 = F()
        x = np.asarray(x0, dtype=float).reshape(-1)

        f, Df, H = F(matrix(x), [1.0])
        f = float(f)
        status = 'unknown'
        gap = np.inf

        for _ in range(maxiters):
            g = np.asarray(Df, dtype=float).reshape(-1)
            Hd = _symmetrize_from_lower(H)

            # Newton direction with Levenberg escalation on indefiniteness
            # (the energy is convex; H can be singular when the logistic
            # loss saturates, kappa == 0 -> dsm.py:361-363).
            lam = 0.0
            d = None
            for _try in range(12):
                try:
                    c, low = scipy.linalg.cho_factor(
                        Hd + lam * np.eye(Hd.shape[0]), lower=True)
                    d = scipy.linalg.cho_solve((c, low), -g)
                    break
                except scipy.linalg.LinAlgError:
                    lam = max(lam * 10.0, 1e-12 * (1.0 + np.trace(Hd)))
            if d is None or not np.all(np.isfinite(d)):
                break

            decrement = float(-g @ d)  # lambda^2 >= 0 for convex H
            gap = 0.5 * abs(decrement)
            if gap <= abstol * (1.0 + abs(f)):
                status = 'optimal'
                break

            # Armijo backtracking on f
            t = 1.0
            accepted = False
            for _bt in range(50):
                x_new = x + t * d
                f_new = float(F(matrix(x_new))[0])
                if np.isfinite(f_new) and f_new <= f + 1e-4 * t * (g @ d):
                    accepted = True
                    break
                t *= 0.5
            if not accepted:
                # No descent progress possible at machine precision.
                status = 'optimal' if gap <= 1e-6 * (1.0 + abs(f)) else 'unknown'
                break

            x = x_new
            f, Df, H = F(matrix(x), [1.0])
            f = float(f)
        else:
            status = 'unknown'

        return {
            'x': x.reshape(-1, 1),
            'status': status,
            'gap': gap,
            'relative gap': gap / max(1.0, abs(f)),
            'primal objective': f,
            'dual objective': f - gap,
            'primal slack': 0.0,
            'dual slack': 0.0,
            'primal infeasibility': 0.0,
            'dual infeasibility': float(np.linalg.norm(np.asarray(Df).reshape(-1))),
        }


solvers = _Solvers()
