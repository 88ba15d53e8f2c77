"""Probe: per-Newton-iteration cost of each _newton_step sub-block on the
real chip, chained in fori_loops with loop-variant inputs (so nothing
hoists). Shapes match the two dominant bench chunks."""

import sys
import os
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LS_STEPS = 12
HIGHEST = jax.lax.Precision.HIGHEST


def timed(fn, args, iters, label):
    out = fn(*args, iters)
    jax.device_get(np.asarray(out)[:1].ravel()[:1] if hasattr(out, 'shape') else out)
    best = np.inf
    best1 = np.inf
    for _ in range(3):
        t0 = time.time()
        jax.device_get(jnp.ravel(fn(*args, iters))[:1])
        best = min(best, time.time() - t0)
        t0 = time.time()
        jax.device_get(jnp.ravel(fn(*args, 1))[:1])
        best1 = min(best1, time.time() - t0)
    per = (best - best1) / (iters - 1)
    print(f'{label}: {per * 1000:.3f} ms/iter (tot {best:.3f} floor {best1:.3f})')


def main():
    for B, P, n in [(16, 12288, 256), (8, 16384, 512)]:
        rng = np.random.RandomState(0)
        Bf = jnp.asarray(rng.randn(B, P, n).astype(np.float32))
        s = jnp.asarray(rng.randn(B, P).astype(np.float32))
        yv = jnp.asarray(rng.randn(B, P).astype(np.float32))
        w = jnp.asarray((rng.rand(B, P) < 0.9).astype(np.float32))
        delta = jnp.asarray(rng.randn(B, n).astype(np.float32) * 0.01)
        kmask = jnp.asarray(np.ones((B, n - 6), np.float32))
        params = jnp.asarray(rng.randn(B, n).astype(np.float32) * 0.01)

        @functools.partial(jax.jit, static_argnames=('iters',))
        def matvec_chain(Bf, delta, s, iters):
            def body(i, acc):
                d = delta + 1e-9 * acc[:, :n]
                u = jnp.einsum('bpi,bi->bp', Bf, d, precision=HIGHEST)
                return acc + u[:, :n] * 0 + jnp.pad(u[:, :1], ((0, 0), (0, n - 1)))
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((B, n)))

        @functools.partial(jax.jit, static_argnames=('iters',))
        def ls_chain(s, yv, w, delta, params, kmask, iters):
            # line search energies + scale sweep, without the Bf matvec
            u = s * 0.5  # stand-in for Bf@delta (measured separately)
            steps = 0.5 ** jnp.arange(LS_STEPS, dtype=jnp.float32)
            scales = jnp.asarray([0.7, 1.0, 1.4, 2.0, 3.0, 4.5, 6.5, 9.0])

            def body(i, carry):
                s_c = s + carry[:, None] * 1e-9
                s_cand = s_c[:, :, None] + u[:, :, None] * steps[None, None, :]
                t_cand = yv[:, :, None] * s_cand
                data_cand = jnp.sum(w[:, :, None] * jax.nn.softplus(-t_cand), axis=1)
                xi_cand = params[:, 6:, None] + delta[:, 6:, None] * steps[None, None, :]
                term2c = jnp.sqrt(xi_cand * xi_cand + 1.0)
                reg_cand = 0.5 * jnp.sum(kmask[:, :, None] * (term2c - 1.0), axis=1)
                f_cand = data_cand + reg_cand
                t_sc = yv * s_c
                data_sc = jnp.sum(
                    w[:, :, None] * jax.nn.softplus(-t_sc[:, :, None] * scales[None, None, :]),
                    axis=1)
                return carry + f_cand[:, 0] * 1e-9 + data_sc[:, 0] * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.zeros(B))

        @functools.partial(jax.jit, static_argnames=('iters',))
        def hprep_chain(params, kmask, iters):
            # reg terms + H damping + diag + trace (n-sized ops)
            H0 = jnp.eye(n)[None] * 2.0 + jnp.ones((B, n, n)) * 0.01
            def body(i, carry):
                H = H0 + carry[:, None, None] * 1e-9
                scale_h = jnp.trace(H, axis1=1, axis2=2) / n + 1e-12
                Hd = H + (1e-6 * scale_h)[:, None, None] * jnp.eye(n)[None]
                return carry + Hd[:, 0, 0] * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.zeros(B))

        print(f'--- B={B} P={P} n={n}')
        timed(matvec_chain, (Bf, delta, s), 50, 'matvec(HIGHEST)')
        timed(ls_chain, (s, yv, w, delta, params, kmask), 50, 'linesearch+sweep')
        timed(hprep_chain, (params, kmask), 50, 'H prep (trace/damp)')


if __name__ == '__main__':
    main()
