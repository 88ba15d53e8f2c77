"""Pallas TPU kernels for the Newton inner loop.

The per-iteration hot op of the batched solver is: given the feature matrix
``Bf (P, n)``, the carried surface ``s`` and data ``yv, w``, compute the
logistic weights and both reductions

    term1 = -yv * sigmoid(-yv s) * w            (P,)
    kappa =  w  * yv^2 * sig * (1 - sig)        (P,)
    g     = Bf^T term1                          (n,)
    H     = Bf^T diag(kappa) Bf                 (n, n)

XLA evaluates this as separate passes over ``Bf`` (materializing the
kappa-scaled copy); this kernel streams each ``Bf`` tile through VMEM once,
computing the elementwise weights on the VPU and both reductions on the MXU,
accumulating ``g`` and ``H`` across the grid. ``n`` is a power of two by
bucket construction (``dsm.batching.K_BUCKETS``).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: MXU passes of the Gauss-Newton gram Bf^T diag(kappa) Bf — the dominant
#: FLOPs of a Newton iteration (P x n x n vs P x n for everything else).
#: MEASURED (round 2): reduced precision here is a false economy. 3 passes
#: (manual bf16 hi/lo operand split = ``Precision.HIGH`` semantics, ~1e-6
#: relative error — Mosaic does not lower HIGH directly, hence the manual
#: split) halves the MXU work per iteration, but the Gauss-Newton Hessian is
#: near-singular along well-classified directions and the LM damping floor
#: (1e-6 relative) is comparable to the 3-pass error: steps stop descending,
#: convergence stalls within the iteration budget, energies end higher, and
#: set-cover acceptance flips — bench images lost 2-5 of 28 objects
#: (fg IoU 0.82-0.93 vs 6-pass) and ran ~2x SLOWER end-to-end from the extra
#: stalled iterations. Plain 1-pass bf16 was already rejected in round 1.
#: Keep 6 (full f32); override with SDSM_GRAM_PASSES={1,3,6} for experiments.
GRAM_PASSES = int(os.environ.get('SDSM_GRAM_PASSES', '6'))
assert GRAM_PASSES in (1, 3, 6), GRAM_PASSES

#: The matching XLA precision for the non-Pallas (vmap) solver path.
GRAM_PRECISION = {1: jax.lax.Precision.DEFAULT,
                  3: jax.lax.Precision.HIGH,
                  6: jax.lax.Precision.HIGHEST}[GRAM_PASSES]


def _dot_rows_3pass(a, b):
    """``a^T b`` over the row (pixel) axis in 3 one-pass bf16 dots with f32
    accumulation: operands split as x = hi + lo (hi = bf16(x), lo =
    bf16(x - hi)), dropping only the lo*lo term (~2^-18 relative)."""
    dn = (((0,), (0,)), ((), ()))
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (jax.lax.dot_general(a_hi, b_hi, dn, preferred_element_type=f32)
            + jax.lax.dot_general(a_hi, b_lo, dn, preferred_element_type=f32)
            + jax.lax.dot_general(a_lo, b_hi, dn, preferred_element_type=f32))


def _gram_dot_full(a, b):
    """The gram dot at the configured precision (GRAM_PASSES)."""
    if GRAM_PASSES == 3:
        return _dot_rows_3pass(a, b)
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST if GRAM_PASSES == 6
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32)


def _gram_dot_1pass(a, b):
    """Single-pass bf16 gram dot (the hybrid-early-iterations experiment)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_grad_hess_kernel(gram_dot):
    """Kernel body shared by every gram precision — only the H dot differs."""
    def kernel(aux_ref, bf_ref, g_ref, h_ref):
        s = aux_ref[0, 0, :]
        yv = aux_ref[0, 1, :]
        w = aux_ref[0, 2, :]
        t = yv * s
        sig = jax.nn.sigmoid(-t)
        term1 = -yv * sig * w
        kappa = w * yv * yv * sig * (1.0 - sig)

        bf = bf_ref[0]                                   # (TP, n)
        gpart = jnp.dot(term1[None, :], bf, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)   # (1, n)
        hpart = gram_dot(bf * kappa[:, None], bf)             # (n, n)

        @pl.when(pl.program_id(1) == 0)
        def _():
            g_ref[0] = gpart
            h_ref[0] = hpart

        @pl.when(pl.program_id(1) > 0)
        def _():
            g_ref[0] = g_ref[0] + gpart
            h_ref[0] = h_ref[0] + hpart

    return kernel


_grad_hess_kernel = _make_grad_hess_kernel(_gram_dot_full)
_grad_hess_kernel_1pass = _make_grad_hess_kernel(_gram_dot_1pass)


def _tile_rows(P, n):
    """Row-tile size: keep the double-buffered Bf tile around 2 MB of VMEM."""
    budget = (1024 * 1024) // max(n * 4, 1)
    tp = max(256, min(2048, (budget // 256) * 256))
    while P % tp != 0:
        tp //= 2
        if tp < 8:
            return P
    return tp


def _batch_chunk(n):
    """Batch chunk so the kernel's output buffers stay well under VMEM
    (the AOT pipeline stages the whole custom-call output tuple there).
    Power of two, so power-of-two batches split into uniform shapes."""
    limit = max(1, (3 * 1024 * 1024) // ((n * n + n) * 4))
    bc = 1
    while bc * 2 <= limit:
        bc *= 2
    return bc


#: Early-iteration hybrid: run the first N Newton iterations with a 1-pass
#: bf16 gram (6x fewer MXU passes), then switch to the full-precision gram.
#: MEASURED (round 2): REJECTED as a default — fg IoU dropped to 0.971-0.988
#: (24/28 objects matched) at N=16 with no net speed win. Near-separable
#: solves truncate on the logistic creep rather than converging, so the
#: final energies/boundaries are a *trajectory snapshot*: any change to the
#: step sequence (gram precision, warm starts, iteration schedules) shifts
#: the snapshot materially even when each step still descends. Only
#: trajectory-preserving optimizations (transfer trimming, batching,
#: speculation) or conservative stopping-rule changes hold quality. Kept as
#: an env knob for experiments; 0 disables (default).
HYBRID_ITERS = int(os.environ.get('SDSM_GRAM_HYBRID_ITERS', '0'))


def _fused_grad_hess_call(Bf, aux, kernel=None):
    B, P, n = Bf.shape
    tp = _tile_rows(P, n)
    return pl.pallas_call(
        kernel or _grad_hess_kernel,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 3, tp), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, n), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        ),
    )(aux, Bf)


@functools.partial(jax.jit, static_argnames=('cheap',))
def fused_grad_hess_batched(Bf, s, yv, w, cheap=False):
    """Fused logistic gradient and Gauss-Newton Hessian, batched.

    The batch is a grid dimension (NOT vmap: a vmapped pallas_call allocates
    the whole batched output in VMEM). The batch is additionally chunked so
    each call's output buffers fit comfortably in VMEM.

    :param Bf: (B, P, n) feature matrices, n a multiple of 128.
    :param cheap: use the 1-pass bf16 gram (early hybrid iterations).
    :return: ``(g (B, n), H (B, n, n))`` float32.
    """
    B, P, n = Bf.shape
    kernel = _grad_hess_kernel_1pass if cheap else None
    aux = jnp.stack([s, yv, w], axis=1).astype(jnp.float32)  # (B, 3, P)
    Bf = Bf.astype(jnp.float32)
    bc = _batch_chunk(n)
    if bc >= B:
        g, H = _fused_grad_hess_call(Bf, aux, kernel)
        return g[:, 0, :], H
    gs, Hs = [], []
    for start in range(0, B, bc):
        end = min(start + bc, B)
        g, H = _fused_grad_hess_call(Bf[start:end], aux[start:end], kernel)
        gs.append(g[:, 0, :])
        Hs.append(H)
    return jnp.concatenate(gs, axis=0), jnp.concatenate(Hs, axis=0)


def pallas_available():
    """Whether the TPU Pallas path should be used (trace-time decision)."""
    import os
    if os.environ.get('SDSM_DISABLE_PALLAS') == '1':
        return False
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False
