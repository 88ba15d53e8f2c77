"""Probe: per-Newton-iteration cost of the direction solve on the real chip.

Times 50 chained iterations of (a) batched Cholesky solve at n<=300 and
(b) the batched Jacobi-PCG at n=512 — the two branches of
``solver._newton_step`` — against the gram kernel cost for scale. Chained in
one fori_loop so per-XLA-op overheads are measured the way the Newton
while_loop pays them.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import functools


def make_spd(B, n, seed=0, near_singular=True):
    rng = np.random.RandomState(seed)
    A = rng.randn(B, n, 32).astype(np.float32)
    H = np.einsum('bik,bjk->bij', A, A)  # rank-32: near-singular like GN
    if not near_singular:
        H = H + np.eye(n, dtype=np.float32) * 10.0
    tr = np.trace(H, axis1=1, axis2=2) / n
    H = H + (1e-6 * tr)[:, None, None] * np.eye(n, dtype=np.float32)
    g = rng.randn(B, n).astype(np.float32)
    return jnp.asarray(H), jnp.asarray(g)


@functools.partial(jax.jit, static_argnames=('iters', 'method'))
def chain(H, g, iters, method):
    from superdsm_tpu.dsm.solver import _pcg_solve

    def chol_one(Hb, gb):
        L, lower = jax.scipy.linalg.cho_factor(Hb)
        return jax.scipy.linalg.cho_solve((L, lower), gb)

    def body(i, x):
        gi = g + 1e-6 * x  # serialize iterations
        # H must depend on the carry, else XLA hoists the factorization out
        # of the loop (loop-invariant code motion) and only the solves time
        Hi = H + 1e-12 * (x[:, :, None] * x[:, None, :])
        if method == 'chol':
            return jax.vmap(chol_one)(Hi, gi)
        return jax.vmap(_pcg_solve)(Hi, gi)

    return jax.lax.fori_loop(0, iters, body, g)


def bench(B, n, method, iters=50, cond='near_singular'):
    H, g = make_spd(B, n, near_singular=(cond == 'near_singular'))
    out = chain(H, g, iters, method)
    jax.device_get(out[:1, :1])  # warm (compile + program load)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = chain(H, g, iters, method)
        jax.device_get(out[:1, :1])
        best = min(best, time.time() - t0)
    # subtract the 1-iteration run to remove the dispatch floor
    best1 = np.inf
    for _ in range(3):
        t0 = time.time()
        out = chain(H, g, 1, method)
        jax.device_get(out[:1, :1])
        best1 = min(best1, time.time() - t0)
    per = (best - best1) / (iters - 1)
    print(f'{method} B={B} n={n} cond={cond}: {per * 1000:.3f} ms/iter '
          f'(total {best:.3f}s, floor {best1:.3f}s)')


if __name__ == '__main__':
    bench(16, 128, 'chol')
    bench(16, 256, 'chol')
    bench(8, 512, 'chol')
    bench(8, 512, 'pcg')
    bench(8, 512, 'pcg', cond='well')
    bench(16, 256, 'pcg')
