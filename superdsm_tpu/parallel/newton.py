"""Sharded batched Newton solves over a device mesh.

The solve of ``superdsm_tpu.dsm.solver`` distributed with ``shard_map``:
problems are sharded along the mesh ``batch`` axis (independent, no
communication), and each problem's pixels are sharded along the ``pixel``
axis — per-shard gradient and Gauss-Newton Hessian contributions are reduced
with ``psum`` over ICI and the (tiny) Newton system is solved replicated, so
parameters stay bit-identical across pixel shards. This is the scaling path
for regions too large for one chip (the 4K-mosaic configuration in
BASELINE.json), replacing nothing in the reference — it has no multi-device
story at all (single-host Ray, ``/root/reference/superdsm/batch.py:258-263``).

The deformation term is handled the same way: the smooth-matrix rows are
per-pixel (built on the fly from the replicated subsample points), so ``G``
shards with the pixels and only the 6+K-dim reductions cross the ICI.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # jax < 0.8
    from jax.experimental.shard_map import shard_map

from ..dsm.solver import (_poly_basis, _energy_from_surface, LS_STEPS,
                          ARMIJO_C, DEFAULT_MAXITER, DEFAULT_TOL,
                          MU_MIN, MU_MAX)
from ..dsm.smooth import build_smooth_matrix


def _local_contribs(params, Q, G, yv, w, kmask):
    """Per-pixel-shard surface, energy/grad/Hessian contributions."""
    n6 = params[:6]
    s = Q @ n6
    if G is not None:
        s = s + G @ (params[6:] * kmask)
        B = jnp.concatenate([Q, G], axis=1)
    else:
        B = Q
    t = yv * s
    sig = jax.nn.sigmoid(-t)
    data_loc = jnp.sum(w * jax.nn.softplus(-t))
    term1 = -yv * sig * w
    kappa = w * yv * yv * sig * (1.0 - sig)
    g_loc = B.T @ term1
    H_loc = B.T @ (B * kappa[:, None])
    return s, data_loc, g_loc, H_loc


def _reg_terms(params, alpha, epsilon, kmask):
    """Replicated smooth-L1 deformation regularizer: value, grad, Hessian diag."""
    if params.shape[0] <= 6:
        z = jnp.zeros(params.shape[0])
        return 0.0, z, z
    xi = params[6:]
    term2 = jnp.sqrt(xi * xi + epsilon)
    val = jnp.maximum(alpha * jnp.sum(kmask * (term2 - jnp.sqrt(epsilon))), 0.0)
    grad = jnp.concatenate([jnp.zeros(6), alpha * (xi / term2) * kmask])
    hdiag = alpha * (1.0 / term2 - (xi * xi) / (term2 ** 3))
    hdiag = jnp.concatenate([jnp.zeros(6), jnp.maximum(hdiag, 0.0) * kmask + (1.0 - kmask)])
    return val, grad, hdiag


def _sharded_newton(params0, Q, G, yv, w, alpha, epsilon, kmask,
                    maxiter, tol, pixel_axis):
    """Newton iteration for ONE problem whose pixel tensors are a local shard.

    All cross-shard reductions are ``psum`` over ``pixel_axis``; everything
    else is replicated arithmetic, keeping shards in lockstep.
    """
    n = params0.shape[0]

    def energy(params):
        s, data_loc, _, _ = _local_contribs(params, Q, G, yv, w, kmask)
        data = jax.lax.psum(data_loc, pixel_axis)
        reg, _, _ = _reg_terms(params, alpha, epsilon, kmask)
        return data + reg

    def body(state):
        it, params, conv, fval, mu = state
        s, data_loc, g_loc, H_loc = _local_contribs(params, Q, G, yv, w, kmask)
        f0 = jax.lax.psum(data_loc, pixel_axis)
        g = jax.lax.psum(g_loc, pixel_axis)
        H = jax.lax.psum(H_loc, pixel_axis)
        reg, reg_g, reg_h = _reg_terms(params, alpha, epsilon, kmask)
        f0 = f0 + reg
        g = g + reg_g
        H = H + jnp.diag(reg_h)

        # adaptive LM damping, mirroring dsm.solver._newton_step — a fixed
        # tiny damping stalls on the near-singular Gauss-Newton Hessian
        scale_h = jnp.trace(H) / n + 1e-12
        Hd = H + (mu * scale_h) * jnp.eye(n, dtype=H.dtype)
        L, lower = jax.scipy.linalg.cho_factor(Hd)
        delta = -jax.scipy.linalg.cho_solve((L, lower), g)
        bad = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(bad, -g / (jnp.sqrt(jnp.sum(g * g)) + 1.0), delta)
        decrement = -jnp.dot(g, delta)

        # line search: shared matvec, candidate energies psum-reduced
        u = Q @ delta[:6]
        if G is not None:
            u = u + G @ (delta[6:] * kmask)
        steps = 0.5 ** jnp.arange(LS_STEPS, dtype=params.dtype)
        s_cand = s[:, None] + u[:, None] * steps[None, :]
        t_cand = yv[:, None] * s_cand
        data_cand = jax.lax.psum(
            jnp.sum(w[:, None] * jax.nn.softplus(-t_cand), axis=0), pixel_axis)
        if n > 6:
            xi_c = params[6:, None] + delta[6:, None] * steps[None, :]
            term2c = jnp.sqrt(xi_c * xi_c + epsilon)
            reg_c = jnp.maximum(
                alpha * jnp.sum(kmask[:, None] * (term2c - jnp.sqrt(epsilon)), axis=0), 0.0)
            f_cand = data_cand + reg_c
        else:
            f_cand = data_cand

        armijo = f_cand <= f0 - ARMIJO_C * steps * decrement
        pick = jnp.where(jnp.any(armijo), jnp.argmax(armijo), jnp.argmin(f_cand))
        improved = f_cand[pick] < f0
        t_step = jnp.where(improved, steps[pick], 0.0)
        full_step = improved & (pick == 0)

        new_params = params + t_step * delta
        new_s = s + t_step * u
        new_f = jnp.where(improved, f_cand[pick], f0)

        # multiplicative scale sweep (see dsm.solver._newton_step): jumps the
        # near-separable "creep" mode geometrically; candidate energies are
        # psum-reduced like the line search
        scales = jnp.asarray([0.7, 1.0, 1.4, 2.0, 3.0, 4.5, 6.5, 9.0],
                             params.dtype)
        t_sc = yv * new_s
        data_sc = jax.lax.psum(
            jnp.sum(w[:, None] * jax.nn.softplus(-t_sc[:, None] * scales[None, :]),
                    axis=0), pixel_axis)
        if n > 6:
            xi_sc = new_params[6:, None] * scales[None, :]
            term2sc = jnp.sqrt(xi_sc * xi_sc + epsilon)
            reg_sc = jnp.maximum(
                alpha * jnp.sum(kmask[:, None] * (term2sc - jnp.sqrt(epsilon)),
                                axis=0), 0.0)
            f_sc = data_sc + reg_sc
        else:
            f_sc = data_sc
        pick_sc = jnp.argmin(f_sc)
        boost = (f_sc[pick_sc] < new_f) & jnp.isfinite(f_sc[pick_sc])
        c_best = jnp.where(boost, scales[pick_sc], 1.0)
        new_params = new_params * c_best
        new_f = jnp.where(boost, f_sc[pick_sc], new_f)

        new_mu = jnp.where(full_step, jnp.maximum(mu * 0.25, MU_MIN),
                           jnp.where(improved, mu, jnp.minimum(mu * 8.0, MU_MAX)))
        # the main solver's convergence rule: decrement-small at low damping,
        # or stuck at maximum damping — both only once the iteration's total
        # gain (step + boost) is below tolerance
        tiny_gain = (f0 - new_f) <= tol * (1.0 + jnp.abs(f0))
        new_conv = ((0.5 * decrement <= tol * (1.0 + jnp.abs(f0)))
                    & (mu <= 1e-4) & tiny_gain) | \
                   ((~improved) & (mu >= MU_MAX) & tiny_gain)
        params = jnp.where(conv, params, new_params)
        fval = jnp.where(conv, fval, new_f)
        mu = jnp.where(conv, mu, new_mu)
        return it + 1, params, conv | new_conv, fval, mu

    def cond(state):
        it, params, conv, fval, mu = state
        return (it < maxiter) & (~conv)

    state = (jnp.int32(0), params0, jnp.bool_(False), energy(params0),
             jnp.asarray(1e-6, params0.dtype))
    it, params, conv, fval, mu = jax.lax.while_loop(cond, body, state)
    return params, energy(params), conv


def make_sharded_poly_solver(mesh, maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL):
    """Returns a jitted solver of 6-parameter problems sharded over ``mesh``.

    Input shapes: ``coords (B, P, 2)``, ``yv (B, P)``, ``w (B, P)``,
    ``params0 (B, 6)``; ``B`` is sharded over the mesh 'batch' axis and ``P``
    over the 'pixel' axis. Returns ``(params, energy, converged)`` replicated
    over 'pixel' and sharded over 'batch'.
    """

    def local_fn(params0, coords, yv, w):
        Q = _poly_basis(coords)
        solve = lambda p0, q, y, ww: _sharded_newton(
            p0, q, None, y, ww, 0.0, 1.0, jnp.zeros((0,), q.dtype),
            maxiter, tol, 'pixel')
        params, f, conv = jax.vmap(solve)(params0, Q, yv, w)
        return params, f, conv

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P('batch', None), P('batch', 'pixel', None),
                  P('batch', 'pixel'), P('batch', 'pixel')),
        out_specs=(P('batch', None), P('batch'), P('batch')),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_dsm_solver(mesh, sigma, cutoff, epsilon=1.0,
                            maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL):
    """Returns a jitted solver of full DSM problems sharded over ``mesh``.

    Pixel coordinates ``pix (B, P, 2)`` shard with the pixels; the subsample
    points ``sub (B, K, 2)`` and deformation mask ``kmask (B, K)`` are
    replicated along the pixel axis, so each shard builds exactly the rows of
    the smooth matrix it owns.
    """

    def local_fn(params0, coords, pix, sub, kmask, yv, w, alpha):
        Q = _poly_basis(coords)

        def solve(p0, q, px, sb, km, y, ww, al):
            G = build_smooth_matrix(px, sb, sigma, cutoff, km)
            return _sharded_newton(p0, q, G, y, ww, al, epsilon, km,
                                   maxiter, tol, 'pixel')

        params, f, conv = jax.vmap(solve)(params0, Q, pix, sub, kmask, yv, w, alpha)
        return params, f, conv

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P('batch', None), P('batch', 'pixel', None),
                  P('batch', 'pixel', None), P('batch', None, None),
                  P('batch', None), P('batch', 'pixel'), P('batch', 'pixel'),
                  P('batch')),
        out_specs=(P('batch', None), P('batch'), P('batch')),
        check_vma=False)
    return jax.jit(sharded)
