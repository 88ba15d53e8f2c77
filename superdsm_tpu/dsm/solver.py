"""Batched damped-Newton minimization of the convex DSM energy ψ on TPU.

Replaces the reference's per-region cvxopt interior-point engine
(``/root/reference/superdsm/dsm.py:431-491``; the reference uses
``cvxopt.solvers.cp`` purely as a Newton engine on an *unconstrained* smooth
convex problem). The energy, gradient, and Hessian follow
``/root/reference/superdsm/dsm.py:253-385``:

    ψ(θ, ξ) = Σ_p w_p softplus(-y_p s_p) + α (Σ_k sqrt(ξ_k² + ε) - K sqrt(ε))
    s = Q θ + G ξ          (Q: second-order polynomial basis, G: smooth matrix)

All inputs are padded to static shapes: pixels carry a weight ``w ∈ {0,1}``
and deformation dimensions a mask ``kmask ∈ {0,1}``; padded dimensions get a
unit diagonal in the Hessian so the batched Cholesky stays positive definite.
Problems are solved simultaneously with a per-problem convergence freeze and
a whole-batch early exit. Since the surface is affine in the parameters, the
backtracking line search reuses one matvec for all candidate step sizes.
"""

import functools
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

#: Hard iteration caps (the reference instead relies on a 300 s SIGALRM
#: timeout per solve, ``/root/reference/superdsm/dsm.py:478-490``).
DEFAULT_MAXITER = 50
DEFAULT_TOL = 1e-5
LS_STEPS = 12  # candidate step sizes 2^0 .. 2^-(LS_STEPS-1)
ARMIJO_C = 1e-4


def _poly_basis(coords):
    """(..., 2) normalized coordinates -> (..., 6) basis features."""
    x1 = coords[..., 0]
    x2 = coords[..., 1]
    return jnp.stack([x1 * x1, x2 * x2, 2 * x1 * x2, 2 * x1, 2 * x2,
                      jnp.ones_like(x1)], axis=-1)


def _energy_from_surface(s, xi, yv, w, alpha, epsilon, kmask):
    """ψ given precomputed surface values ``s``. Shapes: s,yv,w: (P,); xi,kmask: (K,)."""
    t = yv * s
    data = jnp.sum(w * jax.nn.softplus(-t))
    if xi.shape[0] > 0:
        term2 = jnp.sqrt(xi * xi + epsilon)
        reg = alpha * jnp.sum(kmask * (term2 - jnp.sqrt(epsilon)))
        reg = jnp.maximum(reg, 0.0)
    else:
        reg = 0.0
    return data + reg


def _surface(params, Q, G, kmask):
    s = Q @ params[:6]
    if G is not None:
        s = s + jnp.dot(G, params[6:] * kmask, precision=HIGHEST)
    return s


def _features(Q, G):
    """Single feature matrix Bf = [Q | G] (G columns of padded dims are
    already zeroed by ``build_smooth_matrix``), precomputed once per solve so
    the Newton loop never re-materializes the (P, 6+K) tensor."""
    if G is None:
        return Q
    return jnp.concatenate([Q, G], axis=1)


def _reg_terms(params, alpha, epsilon, kmask):
    """Smooth-L1 deformation regularizer: value, gradient, Hessian diagonal."""
    n = params.shape[0]
    if n <= 6:
        z = jnp.zeros(n, params.dtype)
        return jnp.float32(0.0), z, z
    xi = params[6:]
    term2 = jnp.sqrt(xi * xi + epsilon)
    val = jnp.maximum(alpha * jnp.sum(kmask * (term2 - jnp.sqrt(epsilon))), 0.0)
    grad = jnp.concatenate([jnp.zeros(6, params.dtype),
                            alpha * (xi / term2) * kmask])
    hdiag = alpha * (1.0 / term2 - (xi * xi) / (term2 ** 3))
    hdiag = jnp.concatenate([jnp.zeros(6, params.dtype),
                             jnp.maximum(hdiag, 0.0) * kmask + (1.0 - kmask)])
    return val, grad, hdiag


def _grad_hess(params, s, Q, G, yv, w, alpha, epsilon, kmask):
    """Analytic gradient and Hessian of psi at ``params`` (reference form,
    used by the numerical tests; the Newton loop uses the fused
    feature-matrix version inside :func:`_newton_step`)."""
    t = yv * s
    sig = jax.nn.sigmoid(-t)
    term1 = -yv * sig * w
    kappa = w * yv * yv * sig * (1.0 - sig)
    Bf = _features(Q, G if G is None else G * kmask[None, :])
    g = jnp.dot(Bf.T, term1, precision=HIGHEST)
    H = jnp.einsum('pi,p,pj->ij', Bf, kappa, Bf, precision=HIGHEST)
    if params.shape[0] > 6:
        reg, reg_g, reg_h = _reg_terms(params, alpha, epsilon, kmask)
        g = (g + reg_g) * jnp.concatenate([jnp.ones(6, params.dtype), kmask])
        H = H + jnp.diag(reg_h)
    return g, H


MU_MIN = 1e-10
MU_MAX = 1e6

#: Newton systems larger than this solve by preconditioned CG instead of
#: Cholesky — TPU Cholesky is a sequential panel algorithm and dominates the
#: iteration cost at n ~ 500, while CG is pure batched matvecs. Probed on the
#: real bench chunks (tools/probe_direction_cost.py): batched Cholesky costs
#: 1.0 ms/iter at (16, 256) vs 0.37 for residual-based PCG, and the
#: direction solve is ~half the per-Newton-iteration cost — but CG at
#: n = 256 is a trajectory change for the dominant K=250 buckets, so the
#: cutover is env-tunable for measured experiments (SDSM_CHOL_MAX_N).
CHOLESKY_MAX_N = int(os.environ.get('SDSM_CHOL_MAX_N', '300'))
CG_MAX_ITERS = 64
CG_RTOL = 1e-5


def _pcg_solve(H, b, iters=CG_MAX_ITERS, rtol=CG_RTOL):
    """Jacobi-preconditioned conjugate gradients for one SPD system.

    Residual-based: iterates until ``||r|| <= rtol * ||b||`` or ``iters``
    steps (under vmap the loop runs until every lane converges, with
    converged lanes frozen). A slightly off Newton direction only costs
    extra damped-Newton iterations — the line search and the LM damping
    guard descent — but the quality gate in
    ``tests/test_solver.py::test_cg_direction_matches_cholesky`` pins the
    end-to-end effect to below the maxiter-sweep noise floor.
    """
    dinv = 1.0 / jnp.diagonal(H)
    x = b * dinv
    r = b - H @ x
    z = r * dinv
    p = z
    rz = jnp.dot(r, z)
    r2_stop = (rtol * rtol) * jnp.dot(b, b) + 1e-30

    def cond(state):
        i, x, r, p, rz = state
        return (i < iters) & (jnp.dot(r, r) > r2_stop)

    def body(state):
        i, x, r, p, rz = state
        Hp = H @ p
        a = rz / (jnp.dot(p, Hp) + 1e-30)
        x = x + a * p
        r = r - a * Hp
        z = r * dinv
        rz_new = jnp.dot(r, z)
        beta = rz_new / (rz + 1e-30)
        return i + 1, x, r, z + beta * p, rz_new

    _, x, r, p, rz = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rz))
    return x


def _data_grad_hess(Bf, s, yv, w):
    """Data-term gradient and Gauss-Newton Hessian (one problem, XLA path).

    The gram uses the same reduced-pass MXU precision as the fused Pallas
    kernel (see ``pallas_kernels.GRAM_PRECISION``); on CPU the precision
    hint is a no-op (always f32)."""
    from .pallas_kernels import GRAM_PRECISION
    t = yv * s
    sig = jax.nn.sigmoid(-t)
    term1 = -yv * sig * w
    kappa = w * yv * yv * sig * (1.0 - sig)
    g = jnp.dot(Bf.T, term1, precision=HIGHEST)
    H = jnp.einsum('pi,p,pj->ij', Bf, kappa, Bf, precision=GRAM_PRECISION)
    return g, H


def _newton_step(params, mu, s, f0, g, H, Bf, yv, w, alpha, epsilon, kmask, tol):
    """One Levenberg-Marquardt-damped Newton iteration.

    The Gauss-Newton Hessian of the logistic term is near-singular along
    directions whose pixels are well classified (kappa -> 0), so a fixed tiny
    damping plus Armijo backtracking converges only linearly there. ``mu`` is
    a per-problem relative damping factor: decreased after accepted steps,
    increased when no line-search step improves the energy. The surface ``s``
    and energy ``f0`` are carried between iterations (the surface is affine
    in the parameters); the data-term ``g``/``H`` come precomputed (fused
    Pallas kernel on TPU, XLA einsum otherwise).
    """
    n = params.shape[0]
    if n > 6:
        reg, reg_g, reg_h = _reg_terms(params, alpha, epsilon, kmask)
        g = (g + reg_g) * jnp.concatenate([jnp.ones(6, params.dtype), kmask])
        H = H + jnp.diag(reg_h)

    scale_h = jnp.trace(H) / n + 1e-12
    Hd = H + (mu * scale_h) * jnp.eye(n, dtype=H.dtype)
    if n > CHOLESKY_MAX_N:
        delta = -_pcg_solve(Hd, g)
    else:
        L, lower = jax.scipy.linalg.cho_factor(Hd)
        delta = -jax.scipy.linalg.cho_solve((L, lower), g)
    # guard against a failed factorization (NaNs): fall back to a tiny
    # gradient step
    bad = ~jnp.all(jnp.isfinite(delta))
    delta = jnp.where(bad, -g / (jnp.sqrt(jnp.sum(g * g)) + 1.0), delta)
    decrement = -jnp.dot(g, delta)  # lambda^2 >= 0 for the Newton step

    # line search: s is affine in params, so one matvec covers all steps
    u = jnp.dot(Bf, delta, precision=HIGHEST)
    steps = 0.5 ** jnp.arange(LS_STEPS, dtype=params.dtype)  # (S,)
    s_cand = s[:, None] + u[:, None] * steps[None, :]        # (P, S)
    t_cand = yv[:, None] * s_cand
    data_cand = jnp.sum(w[:, None] * jax.nn.softplus(-t_cand), axis=0)  # (S,)
    if n > 6:
        xi_cand = params[6:, None] + delta[6:, None] * steps[None, :]   # (K, S)
        term2c = jnp.sqrt(xi_cand * xi_cand + epsilon)
        reg_cand = alpha * jnp.sum(kmask[:, None] * (term2c - jnp.sqrt(epsilon)), axis=0)
        reg_cand = jnp.maximum(reg_cand, 0.0)
        f_cand = data_cand + reg_cand
    else:
        f_cand = data_cand

    armijo = f_cand <= f0 - ARMIJO_C * steps * decrement
    any_ok = jnp.any(armijo)
    first_ok = jnp.argmax(armijo)           # first (largest) passing step
    best = jnp.argmin(f_cand)               # fallback: best decrease
    pick = jnp.where(any_ok, first_ok, best)
    improved = f_cand[pick] < f0
    t_step = jnp.where(improved, steps[pick], 0.0)
    full_step = improved & (pick == 0)

    new_params = params + t_step * delta
    new_s = s + t_step * u
    new_f = jnp.where(improved, f_cand[pick], f0)

    # multiplicative scale sweep: for near-separable data the optimum drifts
    # toward ever-steeper surfaces (s <- c s with c > 1 keeps lowering the
    # logistic loss), which additive Newton steps chase only linearly ("the
    # creep"). The surface is linear in the parameters, so scaling all
    # parameters scales s exactly — one softplus pass evaluates a geometric
    # ladder of scales and jumps the creep in a handful of iterations.
    # NOTE (round 4, measured): extending the ladder exponentially (to 2^14)
    # does NOT pin down the separable-solve truncation point — the creep
    # alternates scale jumps with RESHAPING plateaus, so trajectories
    # truncate on different plateaus regardless (43.9 vs 1174 for one junk
    # singleton across batch shapes; the eager-trace asymptote is ~44 while
    # the big-ladder variant converged at 224). Separable/junk solves are
    # inherently trajectory-snapshots; their decision impact is bounded by
    # the decision quantization + the documented pinned-numerics policy
    # (superdsm_tpu/_stability.py), the same class the reference pins with
    # per-hostname goldens.
    scales = jnp.asarray([0.7, 1.0, 1.4, 2.0, 3.0, 4.5, 6.5, 9.0], params.dtype)
    t_sc = yv * new_s
    data_sc = jnp.sum(w[:, None] * jax.nn.softplus(-t_sc[:, None] * scales[None, :]),
                      axis=0)
    if n > 6:
        xi_sc = new_params[6:, None] * scales[None, :]
        term2sc = jnp.sqrt(xi_sc * xi_sc + epsilon)
        reg_sc = jnp.maximum(
            alpha * jnp.sum(kmask[:, None] * (term2sc - jnp.sqrt(epsilon)), axis=0), 0.0)
        f_sc = data_sc + reg_sc
    else:
        f_sc = data_sc
    pick_sc = jnp.argmin(f_sc)
    boost = (f_sc[pick_sc] < new_f) & jnp.isfinite(f_sc[pick_sc])
    c_best = jnp.where(boost, scales[pick_sc], 1.0)
    new_params = new_params * c_best
    new_s = new_s * c_best
    new_f = jnp.where(boost, f_sc[pick_sc], new_f)

    new_mu = jnp.where(full_step, jnp.maximum(mu * 0.25, MU_MIN),
                       jnp.where(improved, mu, jnp.minimum(mu * 8.0, MU_MAX)))
    # the Newton decrement only estimates the optimality gap when the system
    # is essentially undamped; under heavy damping delta (and hence the
    # decrement) shrinks regardless of the distance to the optimum.
    # A firing scale boost used to veto convergence outright, but on
    # near-separable data the boost keeps firing with geometrically decaying
    # gains (the creep's asymptote) and every solve ran to maxiter; instead,
    # an iteration only blocks convergence if it actually gained more than
    # the tolerance (step + boost combined).
    tiny_gain = (f0 - new_f) <= tol * (1.0 + jnp.abs(f0))
    converged = ((0.5 * decrement <= tol * (1.0 + jnp.abs(f0))) & (mu <= 1e-4)
                 & tiny_gain) | \
                ((~improved) & (mu >= MU_MAX) & tiny_gain)
    return new_params, new_s, new_f, converged, new_mu


def _lsq_init(Q, yv, w, margin=2.0, ridge=1e-6):
    """Closed-form elliptical initialization: ridge regression of the
    polynomial surface onto ``margin * sign(y)``. One batched 6x6 solve —
    practically free next to a Newton iteration — that starts the logistic
    minimization at a separating surface instead of zeros."""
    z = margin * jnp.sign(yv) * w
    A = jnp.einsum('bpi,bp,bpj->bij', Q, w, Q, precision=HIGHEST)
    A = A + ridge * jnp.trace(A, axis1=1, axis2=2)[:, None, None] * \
        jnp.eye(6, dtype=Q.dtype)[None]
    b = jnp.einsum('bpi,bp->bi', Q, z, precision=HIGHEST)
    theta = jnp.linalg.solve(A, b[..., None])[..., 0]
    return jnp.where(jnp.isfinite(theta), theta, 0.0)


def _better_of(Q, yv, w, theta_a, theta_b):
    """Per-problem pick of the lower-logistic-energy 6-parameter start."""
    def f_of(theta):
        s = jnp.einsum('bpi,bi->bp', Q, theta, precision=HIGHEST)
        return jnp.sum(w * jax.nn.softplus(-yv * s), axis=1)
    return jnp.where((f_of(theta_b) < f_of(theta_a))[:, None], theta_b, theta_a)


def _solve_batch_impl(params0, Q, G, yv, w, alpha, epsilon, kmask, maxiter, tol,
                      band_inputs=None):
    """Batch Newton driver: while_loop with per-problem freeze.

    :param band_inputs: optional ``(pix, sub, cutoff)`` raw coordinates
        enabling the banded gram kernel (see
        ``pallas_kernels.compute_band_blocks``); the band layout is fixed
        across Newton iterations (G never changes), so it is computed once
        here.
    """
    B = params0.shape[0]
    Bf = jax.vmap(_features, in_axes=(0, 0 if G is not None else None))(Q, G)
    step = jax.vmap(_newton_step,
                    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, 0, None))

    from .pallas_kernels import (fused_grad_hess_batched, pallas_available,
                                 HYBRID_ITERS, nband_for, compute_band_blocks,
                                 _tile_rows)
    n_total = params0.shape[1]
    use_pallas = (pallas_available() and n_total % 128 == 0
                  and Bf.shape[1] % 256 == 0)

    cb = fits = None
    if use_pallas and band_inputs is not None and nband_for(n_total) > 0:
        pix, sub, cutoff = band_inputs
        tp = _tile_rows(Bf.shape[1], n_total)
        if Bf.shape[1] % tp == 0:
            cb, fits = compute_band_blocks(
                pix[..., 0].astype(jnp.float32), w,
                sub[..., 0].astype(jnp.float32), kmask,
                float(cutoff), n_total, tp)

    def grad_hess_b(s, active, cheap=False):
        if use_pallas:
            return fused_grad_hess_batched(Bf, s, yv, w, cheap=cheap,
                                           cb=cb, fits=fits, active=active)
        return jax.vmap(_data_grad_hess)(Bf, s, yv, w)

    def cond(state):
        it, params, conv, fval, mu, s, it_lane = state
        return (it < maxiter) & (~jnp.all(conv))

    def body(state):
        it, params, conv, fval, mu, s, it_lane = state
        # frozen lanes skip the gram MXU/DMA work in the Pallas kernels;
        # their g/H come back zero, which only feeds the masked-out step
        # below (every downstream op is per-lane), so active-lane
        # trajectories are bitwise unchanged
        act = (~conv).astype(jnp.int32)
        if use_pallas and HYBRID_ITERS > 0:
            g_b, H_b = jax.lax.cond(it < HYBRID_ITERS,
                                    lambda s_: grad_hess_b(s_, act, cheap=True),
                                    lambda s_: grad_hess_b(s_, act),
                                    s)
        else:
            g_b, H_b = grad_hess_b(s, act)
        new_params, new_s, new_f, new_conv, new_mu = step(
            params, mu, s, fval, g_b, H_b, Bf, yv, w, alpha, epsilon, kmask, tol)
        params = jnp.where(conv[:, None], params, new_params)
        s = jnp.where(conv[:, None], s, new_s)
        fval = jnp.where(conv, fval, new_f)
        mu = jnp.where(conv, mu, new_mu)
        it_lane = jnp.where(conv, it_lane, it + 1)
        conv = conv | new_conv
        return it + 1, params, conv, fval, mu, s, it_lane

    s0 = jnp.einsum('bpi,bi->bp', Bf, params0, precision=HIGHEST)
    f0 = jax.vmap(_energy_from_surface, in_axes=(0, 0, 0, 0, 0, None, 0))(
        s0, params0[:, 6:], yv, w, alpha, epsilon, kmask)
    state = (jnp.int32(0), params0, jnp.zeros(B, bool), f0,
             jnp.full(B, 1e-6, params0.dtype), s0, jnp.zeros(B, jnp.int32))
    it, params, conv, fval, mu, s, it_lane = jax.lax.while_loop(
        cond, body, state)

    # exact final energies and surfaces at the solution
    s_final = jnp.einsum('bpi,bi->bp', Bf, params, precision=HIGHEST)
    f_final = jax.vmap(_energy_from_surface, in_axes=(0, 0, 0, 0, 0, None, 0))(
        s_final, params[:, 6:], yv, w, alpha, epsilon, kmask)
    return params, f_final, conv, it, s_final, it_lane


@functools.partial(jax.jit, static_argnames=('tol',))
def _solve_poly(params0, coords, yv, w, alpha, kmask6, maxiter, tol):
    Q = _poly_basis(coords)
    return _solve_batch_impl(params0, Q, None, yv, w, alpha, 1.0, kmask6, maxiter, tol)


@functools.partial(jax.jit, static_argnames=('tol', 'sigma', 'cutoff'))
def _solve_full(params0, coords, pix, sub, yv, w, alpha, epsilon, kmask,
                maxiter, tol, sigma, cutoff):
    from .smooth import build_smooth_matrix
    Q = _poly_basis(coords)
    G = jax.vmap(lambda p, sb, km: build_smooth_matrix(p, sb, sigma, cutoff, km))(pix, sub, kmask)
    return _solve_batch_impl(params0, Q, G, yv, w, alpha, epsilon, kmask, maxiter, tol,
                             band_inputs=(pix, sub, cutoff))


@dataclass
class SolverResult:
    """Batched solver output (host numpy arrays, padded shapes)."""
    params: np.ndarray      # (B, 6+K)
    energy: np.ndarray      # (B,)
    converged: np.ndarray   # (B,)
    iterations: int
    surface: np.ndarray     # (B, P) surface values at mask pixels


def solve_polynomial_batch(coords, yv, w, params0=None, alpha=0.0,
                           maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL):
    """Solves a batch of 6-parameter (elliptical) problems.

    :param coords: (B, P, 2) normalized pixel coordinates (padded).
    :param yv: (B, P) offset intensities.
    :param w: (B, P) pixel weights (0 = padding).
    :param params0: (B, 6) initialization (zeros by default).
    """
    coords = jnp.asarray(coords, jnp.float32)
    yv = jnp.asarray(yv, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    B = coords.shape[0]
    if params0 is None:
        params0 = jnp.zeros((B, 6), jnp.float32)
    else:
        params0 = jnp.asarray(params0, jnp.float32)
    alpha_arr = jnp.full((B,), alpha, jnp.float32)
    kmask0 = jnp.zeros((B, 0), jnp.float32)
    params, f, conv, it, s, _itl = _solve_poly(params0, coords, yv, w, alpha_arr,
                                               kmask0, int(maxiter), float(tol))
    return SolverResult(np.asarray(params), np.asarray(f), np.asarray(conv),
                        int(it), np.asarray(s))


def solve_dsm_batch(coords, pix, sub, kmask, yv, w, params0, alpha, epsilon,
                    sigma, cutoff, maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL):
    """Solves a batch of full DSM problems (6 + K parameters).

    :param coords: (B, P, 2) normalized pixel coordinates.
    :param pix: (B, P, 2) crop-local integer pixel coordinates (for G).
    :param sub: (B, K, 2) crop-local subsample-point coordinates.
    :param kmask: (B, K) 1 for valid subsample points.
    :param params0: (B, 6+K) initialization.
    :param sigma/cutoff: Gaussian smoothing params (static; shared per call).
    """
    params, f, conv, it, s, _itl = _solve_full(
        jnp.asarray(params0, jnp.float32), jnp.asarray(coords, jnp.float32),
        jnp.asarray(pix, jnp.float32), jnp.asarray(sub, jnp.float32),
        jnp.asarray(yv, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(alpha, jnp.float32), float(epsilon),
        jnp.asarray(kmask, jnp.float32),
        int(maxiter), float(tol), float(sigma), int(cutoff))
    return SolverResult(np.asarray(params), np.asarray(f), np.asarray(conv),
                        int(it), np.asarray(s))


# ---------------------------------------------------------------------------
# Packed entry points.
#
# Through remote-device tunnels every dispatch costs tens of milliseconds and
# host<->device bandwidth is scarce, so these programs move the *minimum*:
# int16 crop-local pixel coordinates, float16 intensities, and per-problem
# pixel counts travel in; normalized coordinates, the pixel-validity mask,
# and the polynomial basis are rebuilt on device; the foreground comes back
# as uint8 instead of a float32 surface. The elliptical initialization and
# the full DSM solve run in ONE program (one dispatch, one transfer of the
# shared tensors) instead of two phases.
# ---------------------------------------------------------------------------

def _unpack_inputs(pix, off, cnt, yq, yscale, denom):
    """Rebuilds float inputs from the packed transfer format: int16 pixel
    coordinates and int16-quantized intensities (yv = yq * yscale / 32767 —
    numpy float16 casts are scalar code on the host, int16 is SIMD, and the
    quantization error ~3e-5 of the per-problem range is far below float16)."""
    pixf = pix.astype(jnp.float32)
    coords = (pixf + off.astype(jnp.float32)[:, None, :]) * (1.0 / denom)[None, None, :]
    P = pix.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    w = (col < cnt[:, None]).astype(jnp.float32)
    yv = yq.astype(jnp.float32) * (yscale * (1.0 / 32767.0))[:, None]
    return pixf, coords, yv, w


#: Bit capacity of the packed-mask transfer buffer, as a multiple of the
#: pixel bucket: region masks fill 27-52% of their bounding box on real
#: nuclei data (measured ratios 1.9-3.7), so 4 bits of bbox area per mask
#: pixel cover every observed problem while the buffer stays 8x smaller
#: than the int16 coordinate pairs it replaces (pb/2 vs 4*pb bytes).
#: Problems whose bbox exceeds the capacity (pixel-subsampled oversized
#: regions) keep the coordinate-transfer path.
MASK_BITS_PER_PIXEL = 4


def _mask_to_pix(mb, wd, cnt, pb):
    """(B, pb//2) uint8 row-major bit-packed crop masks -> (B, pb, 2) int32
    crop-local pixel coordinates, exactly ``np.argwhere`` order.

    Inverse of the host's ``np.packbits`` (MSB-first). Rows beyond the
    per-problem pixel count ``cnt`` decode to (0, 0) — identical to the zero
    padding of the coordinate-transfer path, so both packed formats produce
    bitwise the same solver inputs. Replaces the dominant host->device
    transfer leaf (int16 coordinate pairs, 4 bytes/pixel) with 0.5
    bytes/pixel through the ~50 MB/s tunnel.

    The compaction (set-bit positions in order) runs as ONE ``lax.sort`` of
    a keyed iota — measured ~1 ms for (32, 65536) bits, vs ~18 ms for the
    ``jnp.nonzero(size=)`` lowering and ~8 ms for cumsum+scatter
    (tools history; the sort is the only variant that does not erase the
    transfer win)."""
    B, nbytes = mb.shape
    nbits = nbytes * 8
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first (packbits)
    bits = ((mb[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.bool_)
    bits = bits.reshape(B, nbits)
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, nbits), 1)
    keyed = jnp.where(bits, iota, jnp.int32(nbits))  # unset bits sort last
    idx = jax.lax.sort(keyed, dimension=1)[:, :pb]   # (B, pb)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, pb), 1)
    idx = jnp.where(slot < cnt[:, None], idx, 0)
    r = idx // wd[:, None]
    c = idx - r * wd[:, None]
    return jnp.stack([r, c], axis=-1)


def _unpack_inputs_mask(mb, wd, off, cnt, yq, yscale, denom):
    """Mask-transfer variant of :func:`_unpack_inputs` (same outputs)."""
    pb = yq.shape[1]
    pix = _mask_to_pix(mb, wd, cnt, pb)
    return _unpack_inputs(pix, off, cnt, yq, yscale, denom)


def _packbits_fg(fg_bool):
    """Packs a (B, P) boolean foreground into (B, P//8) uint8 on device
    (MSB-first, ``np.unpackbits`` layout). The fg mask is the largest fetch
    leaf of a solve round (P bytes/problem as uint8); through the ~50 MB/s
    remote tunnel the 8x cut is a direct latency win. Requires P % 8 == 0:
    every ``batching.P_BUCKETS`` entry is a multiple of 2048 (pallas row-tile
    alignment), which implies it — a non-multiple-of-8 bucket would fail the
    reshape below."""
    B, P = fg_bool.shape
    bits = fg_bool.reshape(B, P // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights[None, None, :]).sum(axis=-1, dtype=jnp.uint8)


def unpack_fg(fg_packed, n_pixels):
    """Host-side inverse of :func:`_packbits_fg` for one row: returns the
    first ``n_pixels`` mask values as bool."""
    return np.unpackbits(np.asarray(fg_packed), count=n_pixels).astype(bool)


def _solve_poly_core(coords, yv, w, params0, maxiter, tol):
    """Shared body of the packed 6-parameter programs; returns (params,
    energy, conv, bad, fg uint8, per-lane convergence iterations).

    ``bad`` mirrors the reference's fallback rule
    (``/root/reference/superdsm/objects.py:394-411``): a solve that ends
    non-finite or worse than the caller's initialization returns the
    initialization instead, and the caller reports status ``'fallback'``."""
    Q = _poly_basis(coords)
    B = coords.shape[0]
    kmask0 = jnp.zeros((B, 0), jnp.float32)
    alpha = jnp.zeros(B, jnp.float32)
    s_init = jnp.einsum('bpi,bi->bp', Q, params0, precision=HIGHEST)
    f_init = jnp.sum(w * jax.nn.softplus(-yv * s_init), axis=1)
    start = _better_of(Q, yv, w, params0, _lsq_init(Q, yv, w))
    params, f, conv, it, s, it_lane = _solve_batch_impl(start, Q, None, yv, w, alpha,
                                               1.0, kmask0, maxiter, tol)
    # like the reference, only a NON-converged solve that ended worse than
    # its initialization falls back (status 'unknown' gate, objects.py:404);
    # a converged one may exceed f_init by float32 recompute noise
    bad = ~jnp.isfinite(f) | (~conv & (f > f_init))
    params = jnp.where(bad[:, None], params0, params)
    f = jnp.where(bad, f_init, f)
    s = jnp.where(bad[:, None], s_init, s)
    fg = _packbits_fg((s > 0) & (w > 0))
    return params, f, conv, bad, fg, it_lane


@functools.partial(jax.jit, static_argnames=('tol',))
def _solve_poly_packed(pix, off, cnt, yq, yscale, denom, params0, maxiter, tol):
    """Packed 6-parameter solve over int16 coordinate-pair transfers."""
    _, coords, yv, w = _unpack_inputs(pix, off, cnt, yq, yscale, denom)
    return _solve_poly_core(coords, yv, w, params0, maxiter, tol)


@functools.partial(jax.jit, static_argnames=('tol',))
def _solve_poly_packed_mask(mb, wd, off, cnt, yq, yscale, denom, params0,
                            maxiter, tol):
    """Packed 6-parameter solve over bit-packed crop-mask transfers
    (:func:`_mask_to_pix`); outputs are bitwise those of
    :func:`_solve_poly_packed` — the rebuilt integer coordinates are
    identical."""
    _, coords, yv, w = _unpack_inputs_mask(mb, wd, off, cnt, yq, yscale, denom)
    return _solve_poly_core(coords, yv, w, params0, maxiter, tol)


def _solve_dsm_core(pixf, coords, yv, w, sub, kmask, warm, use_warm,
                    alpha, epsilon, maxiter, tol, sigma, cutoff):
    """Shared body of the packed combined elliptical + DSM programs.

    The full solve starts from the better of the elliptical solution and the
    optional warm start (parent solution from the generation loop).
    Returns (params, energy, energy_elliptical, conv, bad, fg uint8,
    per-lane convergence iterations), where
    ``bad`` marks problems whose solve ended non-finite or worse than the
    initialization — those rows are restored to the initialization on device,
    mirroring the reference's fallback semantics
    (``/root/reference/superdsm/objects.py:394-411``).
    """
    from .smooth import build_smooth_matrix
    B, P = pixf.shape[:2]
    K = sub.shape[1]
    Q = _poly_basis(coords)

    # The energy is convex (unique minimizer), so the elliptical phase only
    # buys a good starting point. Generation-loop batches are fully
    # warm-started from parent solutions; skip the 6-parameter solve entirely
    # for those (a real XLA conditional — only one branch executes).
    kmask0 = jnp.zeros((B, 0), jnp.float32)

    def _run_ell(_):
        p_ell, f_ell, _, _, _, _ = _solve_batch_impl(
            _lsq_init(Q, yv, w), Q, None, yv, w,
            jnp.zeros(B, jnp.float32), 1.0, kmask0, maxiter, tol)
        return p_ell, f_ell

    def _skip_ell(_):
        return jnp.zeros((B, 6), jnp.float32), jnp.full((B,), jnp.inf, jnp.float32)

    p_ell, f_ell = jax.lax.cond(jnp.all(use_warm), _skip_ell, _run_ell, None)

    G = jax.vmap(lambda p, sb, km: build_smooth_matrix(p, sb, sigma, cutoff, km))(
        pixf, sub.astype(jnp.float32), kmask)
    p_ell_full = jnp.concatenate([p_ell, jnp.zeros((B, K), jnp.float32)], axis=1)

    # pick the better initialization per problem
    Bf = jnp.concatenate([Q, G], axis=2)
    s_warm = jnp.einsum('bpi,bi->bp', Bf, warm, precision=HIGHEST)
    f_warm = jax.vmap(_energy_from_surface, in_axes=(0, 0, 0, 0, 0, None, 0))(
        s_warm, warm[:, 6:], yv, w, alpha, epsilon, kmask)
    # ~(f_ell < f_warm) instead of (f_warm < f_ell): when the warm energy is
    # NaN (numerically failed input) the warm start must still be the
    # restored initialization for the fallback path below
    take_warm = use_warm & ~(f_ell < f_warm)
    params0 = jnp.where(take_warm[:, None], warm, p_ell_full)

    # energy at the chosen initialization: f_warm for warm-started rows;
    # for elliptical starts the xi = 0 regularizer vanishes, so it equals the
    # elliptical-phase energy
    f_init = jnp.where(take_warm, f_warm, f_ell)

    # NOTE (measured, round 2): a two-phase variant that warm-started cold
    # solves from a 4x-pixel-subsampled solve (alpha scaled by 1/4) did NOT
    # reduce full-resolution iterations — the iteration count is dominated
    # by the logistic creep, which resumes at full resolution no matter how
    # good the start is — and the extra phase cost a net ~10%. Reverted.
    params, f, conv, it, s, it_lane = _solve_batch_impl(params0, Q, G, yv, w, alpha,
                                               epsilon, kmask, maxiter, tol,
                                               band_inputs=(pixf, sub, cutoff))
    # fallback only for non-converged-and-worse or non-finite solves,
    # mirroring the reference's 'unknown'-status gate (objects.py:404)
    bad = ~jnp.isfinite(f) | (~conv & (f > f_init))
    s_init = jnp.einsum('bpi,bi->bp', Bf, params0, precision=HIGHEST)
    params = jnp.where(bad[:, None], params0, params)
    f = jnp.where(bad, f_init, f)
    s = jnp.where(bad[:, None], s_init, s)
    fg = _packbits_fg((s > 0) & (w > 0))
    return params, f, f_ell, conv, bad, fg, it_lane


@functools.partial(jax.jit, static_argnames=('tol', 'sigma', 'cutoff'))
def _solve_dsm_packed(pix, off, cnt, yq, yscale, denom, sub, kmask, warm, use_warm,
                      alpha, epsilon, maxiter, tol, sigma, cutoff):
    """Packed combined elliptical + DSM solve over int16 coordinate pairs
    (one dispatch); see :func:`_solve_dsm_core`."""
    pixf, coords, yv, w = _unpack_inputs(pix, off, cnt, yq, yscale, denom)
    return _solve_dsm_core(pixf, coords, yv, w, sub, kmask, warm, use_warm,
                           alpha, epsilon, maxiter, tol, sigma, cutoff)


@functools.partial(jax.jit, static_argnames=('tol', 'sigma', 'cutoff'))
def _solve_dsm_packed_mask(mb, wd, off, cnt, yq, yscale, denom, sub, kmask,
                           warm, use_warm, alpha, epsilon, maxiter, tol,
                           sigma, cutoff):
    """Packed combined elliptical + DSM solve over bit-packed crop-mask
    transfers (:func:`_mask_to_pix`); outputs are bitwise those of
    :func:`_solve_dsm_packed` — the rebuilt integer coordinates are
    identical."""
    pixf, coords, yv, w = _unpack_inputs_mask(mb, wd, off, cnt, yq, yscale,
                                              denom)
    return _solve_dsm_core(pixf, coords, yv, w, sub, kmask, warm, use_warm,
                           alpha, epsilon, maxiter, tol, sigma, cutoff)


def _pack_poly_group(problems, img_shape, params0=None,
                     maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL, pb=None, Bp=None,
                     placer=None, use_mask=False):
    """Packs one bucket batch and dispatches the packed 6-parameter program
    WITHOUT fetching (async device outputs). ``placer`` optionally maps the
    packed arrays onto a device or mesh sharding (multi-chip routing);
    ``use_mask`` selects the bit-packed crop-mask transfer format (the
    caller guarantees every problem's bbox fits the mask buffer)."""
    OFF = np.zeros((Bp, 2), np.int32)
    CNT = np.zeros((Bp,), np.int32)
    YQ = np.zeros((Bp, pb), np.int16)
    YS = np.zeros((Bp,), np.float32)
    P0 = np.zeros((Bp, 6), np.float32)
    if use_mask:
        MB = np.zeros((Bp, (pb * MASK_BITS_PER_PIXEL) // 8), np.uint8)
        WD = np.ones((Bp,), np.int32)
    else:
        PIX = np.zeros((Bp, pb, 2), np.int16)
    for j, p in enumerate(problems):
        npix = p.n_pixels
        if use_mask:
            pm = p.packed_mask
            MB[j, :len(pm)] = pm
            WD[j] = p.crop_shape[1]
        else:
            PIX[j, :npix] = p.pts
        OFF[j] = p.offset
        CNT[j] = npix
        YQ[j, :npix] = p.yq
        YS[j] = p.yscale
        if params0 is not None and params0[j] is not None:
            P0[j] = params0[j][:6]
    denom = np.maximum(np.asarray(img_shape, np.float32) - 1.0, 1.0)
    from . import aot
    statics = (float(tol),)
    if use_mask:
        if placer is not None:
            MB, WD, OFF, CNT, YQ, YS, P0 = map(
                placer, (MB, WD, OFF, CNT, YQ, YS, P0))
            return _solve_poly_packed_mask(MB, WD, OFF, CNT, YQ, YS, denom,
                                           P0, int(maxiter), float(tol))
        return aot.dispatch('poly-m', pb, 0, Bp, statics,
                            _solve_poly_packed_mask,
                            (MB, WD, OFF, CNT, YQ, YS, denom, P0,
                             int(maxiter)) + statics)
    if placer is not None:
        PIX, OFF, CNT, YQ, YS, P0 = map(placer, (PIX, OFF, CNT, YQ, YS, P0))
        return _solve_poly_packed(PIX, OFF, CNT, YQ, YS, denom, P0,
                                  int(maxiter), float(tol))
    return aot.dispatch('poly', pb, 0, Bp, statics, _solve_poly_packed,
                        (PIX, OFF, CNT, YQ, YS, denom, P0,
                         int(maxiter)) + statics)


def pack_and_solve_poly(problems, img_shape, params0=None,
                        maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL, pb=None, Bp=None):
    """Host-side packing for :func:`_solve_poly_packed` over one bucket batch.

    :param problems: list of Problem-likes (``pts`` int, ``offset``, ``yv``).
    :return: list of ``(params, energy, converged, fg_bool)`` per problem.
    """
    out = _pack_poly_group(problems, img_shape, params0=params0,
                           maxiter=maxiter, tol=tol, pb=pb, Bp=Bp)
    params, f, conv, bad, fg, _it = jax.device_get(out)  # one host round trip
    return [(params[j], float(f[j]), bool(conv[j]) and not bool(bad[j]),
             unpack_fg(fg[j], problems[j].n_pixels)) for j in range(len(problems))]


@functools.partial(jax.jit, static_argnames=('sigma', 'cutoff'))
def _eval_fg_packed(pix, off, cnt, denom, sub, kmask, params, sigma, cutoff):
    """Evaluates ``s(x) > 0`` of a fitted surface at packed pixels (one
    chunk). Used to recover the full-resolution foreground of regions that
    were solved on a pixel subsample."""
    pixf = pix.astype(jnp.float32)
    coords = (pixf + off.astype(jnp.float32)[None, :]) * (1.0 / denom)[None, :]
    P = pix.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (P,), 0)
    w = (idx < cnt).astype(jnp.float32)
    Q = _poly_basis(coords)
    s = Q @ params[:6]
    if sub.shape[0] > 0:
        from .smooth import build_smooth_matrix
        G = build_smooth_matrix(pixf, sub.astype(jnp.float32), sigma, cutoff,
                                kmask)
        s = s + jnp.dot(G, params[6:] * kmask, precision=HIGHEST)
    return ((s > 0) & (w > 0)).astype(jnp.uint8)


def evaluate_foreground(problem, params, sigma, cutoff, chunk=524288):
    """Full-resolution foreground of ``problem`` from fitted ``params``,
    evaluated in pixel chunks on device (bounds the (P, K) smooth-matrix
    slice regardless of region size)."""
    from .batching import K_BUCKETS, _bucket
    npix, k = problem.n_pixels, problem.n_deform
    if k > 0 and np.isfinite(sigma):
        kb = _bucket(max(k, 1), K_BUCKETS[1:])
        SUB = np.full((kb, 2), -10 * (cutoff + 1), np.int16)
        SUB[:k] = problem.sub
        KM = np.zeros(kb, np.float32)
        KM[:k] = 1.0
        PAR = np.zeros(6 + kb, np.float32)
        PAR[:6] = params[:6]
        PAR[6:6 + k] = params[6:6 + k]
    else:
        kb = 0
        SUB = np.zeros((0, 2), np.int16)
        KM = np.zeros(0, np.float32)
        PAR = np.asarray(params[:6], np.float32)
    denom = np.maximum(np.asarray(problem.img_shape, np.float32) - 1.0, 1.0)
    off = np.asarray(problem.offset, np.int32)
    fg = np.zeros(npix, bool)
    pending = []
    for start in range(0, npix, chunk):
        n = min(chunk, npix - start)
        PIX = np.zeros((chunk, 2), np.int16)
        PIX[:n] = problem.pts[start:start + n]
        pending.append((start, n, _eval_fg_packed(
            PIX, off, np.int32(n), denom, SUB, KM, PAR,
            float(sigma) if np.isfinite(sigma) else 1.0, int(cutoff))))
    # one fetch for every dispatched chunk — per-chunk device_get would pay
    # one tunnel round trip per chunk (the single-fetch rule of
    # ``batching.solve_problems``)
    fetched = jax.device_get([out for _, _, out in pending])
    for (start, n, _), chunk_fg in zip(pending, fetched):
        fg[start:start + n] = np.asarray(chunk_fg)[:n].astype(bool)
    return fg


def solve_problem_traced(problem, alpha=0.5, epsilon=1.0, smooth_amount=10,
                         gaussian_shape_multiplier=2,
                         maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL):
    """Debug re-solve of ONE problem recording the energy after every Newton
    iteration (the replacement for the reference's per-object Ray worker logs,
    ``/root/reference/superdsm/objects.py:220-233``). Runs the batch solver at
    increasing iteration caps — the traced ``maxiter`` is a runtime value, so
    this reuses the already-compiled programs — and returns a dict with the
    energy trace, convergence flag, and solution stats.
    """
    from .batching import solve_problems
    from .smooth import smooth_matrix_params

    trace = []
    last = None
    for it in range(0, maxiter + 1, max(1, maxiter // 16)):
        res = solve_problems([problem], alpha=alpha, epsilon=epsilon,
                             smooth_amount=smooth_amount,
                             gaussian_shape_multiplier=gaussian_shape_multiplier,
                             maxiter=max(it, 1), tol=tol)[0]
        trace.append({'iterations': max(it, 1), 'energy': float(res.energy)})
        last = res
    return {
        'n_pixels': int(problem.n_pixels),
        'n_deform': int(problem.n_deform),
        'status': last.status,
        'energy': float(last.energy),
        'params': np.asarray(last.params).tolist(),
        'energy_trace': trace,
        'warm_started': problem.init_params is not None,
    }
