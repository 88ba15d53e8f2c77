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
    """Kernel body shared by every gram precision — only the H dot differs.

    ``act_ref`` is the scalar-prefetched per-lane activity flag (see
    ``fused_grad_hess_batched``): Newton lanes freeze permanently once
    converged and their g/H are discarded by the solver's ``where`` masking,
    so a frozen lane skips the MXU passes entirely (its outputs stay the
    zero-init) — exactly trajectory-preserving for the lanes that matter."""
    def kernel(act_ref, aux_ref, bf_ref, g_ref, h_ref):
        b = pl.program_id(0)

        @pl.when(pl.program_id(1) == 0)
        def _():
            g_ref[0] = jnp.zeros_like(g_ref[0])
            h_ref[0] = jnp.zeros_like(h_ref[0])

        @pl.when(act_ref[b] != 0)
        def _():
            s = aux_ref[0, 0, :]
            yv = aux_ref[0, 1, :]
            w = aux_ref[0, 2, :]
            t = yv * s
            sig = jax.nn.sigmoid(-t)
            term1 = -yv * sig * w
            kappa = w * yv * yv * sig * (1.0 - sig)

            bf = bf_ref[0]                                   # (TP, n)
            gpart = jnp.dot(term1[None, :], bf,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)   # (1, n)
            hpart = gram_dot(bf * kappa[:, None], bf)             # (n, n)
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


#: Banded gram: exploit the spatial support of the deformation basis G.
#: ``build_smooth_matrix`` zeroes every entry beyond the ``cutoff`` chebyshev
#: radius, and both the mask pixels (``np.argwhere``) and the subsample grid
#: points are row-major sorted — so the pixels of one row tile touch a
#: CONTIGUOUS range of G columns (the sub points within ``cutoff`` image
#: rows). The dense kernel spends (P, n, n) MXU work per iteration mostly
#: multiplying exact zeros; the banded kernel computes only the 128-column
#: blocks that can be nonzero: block 0 (the always-dense Q columns plus the
#: first G columns) and NBAND consecutive blocks positioned per row tile via
#: scalar-prefetched block indices. Dropped products are exactly 0.0, so
#: every computed H entry sums the same nonzero terms as the dense kernel.
#: Set SDSM_GRAM_BANDED=0 to fall back to the dense kernel.
BANDED_GRAM = os.environ.get('SDSM_GRAM_BANDED', '1') == '1'

#: Number of movable 128-column band blocks per problem size n = 6 + K.
#: n = 512 regions are ~230 px wide: a row tile's band spans ~5 subsample
#: rows x ~22 points (~110 columns), so 2 blocks (256 columns) hold it with
#: alignment slack; n = 1024 regions are wider (~32 points/row), so 3.
#: n < 512 gains too little (block 0 already covers half the columns);
#: n = 2048 output buffers (16 MB) exceed the VMEM budget. Problems whose
#: band does not fit (checked on device) run the dense kernel via lax.cond.
_NBAND_BY_N = {512: 2, 1024: 3}


def nband_for(n):
    """Band-block count for problem size ``n`` (0 = banded unsupported)."""
    if not BANDED_GRAM:
        return 0
    return _NBAND_BY_N.get(n, 0)


#: Test hook: run pallas_call in interpret mode (CPU emulation).
_FORCE_INTERPRET = False

#: Triangle-blocked dense gram: H = Bf^T diag(kappa) Bf is symmetric, so only
#: the upper-triangle 128x128 block pairs need MXU passes — the lower blocks
#: are transposes (nbg(nbg+1)/2 of nbg^2 dots: 10/16 at n = 512, 36/64 at
#: n = 1024). The mirrored blocks match the straight dots to rounding (the
#: operand order of the kappa scaling swaps), the same backend-noise class as
#: the banded kernel's off-diagonal mirror. MEASURED (round 3, real chip,
#: (16, 32768, 512) — the cold-universe gem bucket): 10.3 -> 6.0 ms per gram
#: call (1.7x), g bitwise identical, max relative H deviation 1.2e-8.
#: Set SDSM_GRAM_TRI=0 to fall back to the full dense kernel.
TRI_GRAM = os.environ.get('SDSM_GRAM_TRI', '1') == '1'


def _make_block_gram_kernel(gram_dot, ngroups, banded):
    """Shared body of the triangle-blocked and banded gram kernels.

    Grid (B, P//tp); per tile, ``ngroups`` 128-column groups participate and
    H is computed as u <= v block pairs with the lower triangle mirrored by
    transpose (H is symmetric up to which operand carries kappa — the
    transposed blocks match the straight dots to rounding, the backend-noise
    class pinned by the validation harness). ``bidx`` maps loaded blocks to
    output block indices: identity for the triangle kernel, block 0 plus the
    scalar-prefetched band offset for the banded kernel. Outputs are stored
    in block layout — g (B, nbg, 1, 128), H (B, nbg, nbg, 128, 128) —
    because Mosaic supports dynamic indices on untiled leading dimensions,
    not dynamic lane-dim stores; the caller reshapes back.

    ``act_ref`` is the scalar-prefetched per-lane activity flag: frozen
    (converged) lanes skip all compute and keep the zero-init outputs (see
    ``fused_grad_hess_batched``)."""
    def kernel(act_ref, *args):
        if banded:
            cb_ref, args = args[0], args[1:]
        aux_ref = args[0]
        bf_blocks = args[1:1 + ngroups]
        g_ref, h_ref = args[1 + ngroups], args[2 + ngroups]
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            g_ref[0] = jnp.zeros_like(g_ref[0])
            h_ref[0] = jnp.zeros_like(h_ref[0])

        @pl.when(act_ref[b] != 0)
        def _():
            s = aux_ref[0, 0, :]
            yv = aux_ref[0, 1, :]
            w = aux_ref[0, 2, :]
            t = yv * s
            sig = jax.nn.sigmoid(-t)
            term1 = -yv * sig * w
            kappa = w * yv * yv * sig * (1.0 - sig)

            if banded:
                c0 = cb_ref[b, i]
                bidx = [0] + [c0 + k for k in range(ngroups - 1)]
            else:
                bidx = list(range(ngroups))
            blocks = [bf_blocks[u][0] for u in range(ngroups)]      # (tp, 128)
            scaled = [blk * kappa[:, None] for blk in blocks]
            for u in range(ngroups):
                gpart = jnp.dot(term1[None, :], blocks[u],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)  # (1, 128)
                g_ref[0, bidx[u]] = g_ref[0, bidx[u]] + gpart
                for v in range(u, ngroups):
                    hpart = gram_dot(scaled[u], blocks[v])           # (128, 128)
                    h_ref[0, bidx[u], bidx[v]] = \
                        h_ref[0, bidx[u], bidx[v]] + hpart
                    if v != u:
                        h_ref[0, bidx[v], bidx[u]] = \
                            h_ref[0, bidx[v], bidx[u]] + hpart.T
        return

    return kernel


def _make_tri_kernel(gram_dot, nbg):
    """Triangle-blocked dense gram kernel: all ``nbg`` column groups
    participate with identity block mapping."""
    return _make_block_gram_kernel(gram_dot, nbg, banded=False)


def _tri_grad_hess_call(Bf, aux, active, gram_dot=None):
    """Dispatches the triangle-blocked dense kernel; returns (g, H)."""
    B, P, n = Bf.shape
    nbg = n // 128
    tp = _tile_rows(P, n)
    kernel = _make_tri_kernel(gram_dot or _gram_dot_full, nbg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 3, tp), lambda b, i, act: (b, 0, i * act[b]),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, tp, 128),
                         functools.partial(
                             lambda k, b, i, act: (b, i * act[b], k), k),
                         memory_space=pltpu.VMEM)
            for k in range(nbg)
        ],
        out_specs=(
            pl.BlockSpec((1, nbg, 1, 128), lambda b, i, act: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbg, nbg, 128, 128),
                         lambda b, i, act: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    g_blk, h_blk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nbg, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nbg, nbg, 128, 128), jnp.float32),
        ),
        interpret=_FORCE_INTERPRET,
    )(active, aux, *([Bf] * nbg))
    g = g_blk.reshape(B, n)
    H = h_blk.transpose(0, 1, 3, 2, 4).reshape(B, n, n)
    return g, H


def _make_banded_kernel(gram_dot, nband, nbg):
    """Banded gram kernel: only ``nband + 1`` column groups participate
    (group 0 fixed, the rest at the scalar-prefetched block offset)."""
    return _make_block_gram_kernel(gram_dot, nband + 1, banded=True)


def _banded_grad_hess_call(Bf, aux, cb, active, nband, kernel):
    """Dispatches the banded kernel; returns block-layout (g, H)."""
    B, P, n = Bf.shape
    nbg = n // 128
    tp = _tile_rows(P, n)
    ngroups = nband + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 3, tp),
                         lambda b, i, act, cbr: (b, 0, i * act[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, 128),
                         lambda b, i, act, cbr: (b, i * act[b], 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, tp, 128),
                         functools.partial(
                             lambda k, b, i, act, cbr:
                             (b, i * act[b], cbr[b, i * act[b]] + k),
                             k),
                         memory_space=pltpu.VMEM)
            for k in range(nband)
        ],
        out_specs=(
            pl.BlockSpec((1, nbg, 1, 128),
                         lambda b, i, act, cbr: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nbg, nbg, 128, 128),
                         lambda b, i, act, cbr: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    g_blk, h_blk = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, nbg, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, nbg, nbg, 128, 128), jnp.float32),
        ),
        interpret=_FORCE_INTERPRET,
    )(active, cb, aux, *([Bf] * ngroups))
    g = g_blk.reshape(B, n)
    H = h_blk.transpose(0, 1, 3, 2, 4).reshape(B, n, n)
    return g, H


def compute_band_blocks(pix_rows, w, sub_rows, kmask, cutoff, n, tp):
    """Per-(problem, row-tile) band start block index and a global fit flag.

    :param pix_rows: (B, P) crop-local pixel row coordinates (float).
    :param w: (B, P) pixel weights (0 = padding; padded rows contribute
        exactly zero to g/H, so they are excluded from the band).
    :param sub_rows: (B, K) subsample-point row coordinates.
    :param kmask: (B, K) subsample validity (0 = padding; padded columns of
        G are zeroed, so they are excluded).
    :param cutoff: chebyshev support radius of the Gaussian basis.
    :return: ``(cb (B, T) int32, fits () bool)`` — band block start per tile,
        and whether EVERY tile's nonzero columns fit in
        ``[0, 128) U [cb * 128, (cb + nband) * 128)``.
    """
    nband = _NBAND_BY_N[n]
    B, P = pix_rows.shape
    K = sub_rows.shape[1]
    T = P // tp
    rows = pix_rows.reshape(B, T, tp)
    valid = (w > 0).reshape(B, T, tp)
    r_lo = jnp.min(jnp.where(valid, rows, jnp.inf), axis=2)      # (B, T)
    r_hi = jnp.max(jnp.where(valid, rows, -jnp.inf), axis=2)
    # active column range per tile by INDEX min/max (not counts): correct for
    # any sub ordering — an unsorted grid simply yields a wide band and
    # fits=False instead of silently uncovered columns
    srow = jnp.where(kmask > 0, sub_rows, jnp.inf)               # (B, K)
    in_band = ((srow[:, None, :] >= r_lo[:, :, None] - cutoff) &
               (srow[:, None, :] <= r_hi[:, :, None] + cutoff))  # (B, T, K)
    k_idx = jnp.arange(K, dtype=jnp.int32)
    band_min = jnp.min(jnp.where(in_band, k_idx[None, None, :], K), axis=2)
    band_max = jnp.max(jnp.where(in_band, k_idx[None, None, :], -1), axis=2)
    nbg = n // 128
    cb = jnp.clip((6 + band_min) // 128, 1, nbg - nband).astype(jnp.int32)
    # columns below 128 live in fixed group 0; the clamp only ever moves the
    # window DOWN (covering more), so the single failure mode is a band end
    # beyond the window
    fits = jnp.all((6 + band_max) < (cb + nband) * 128)
    return cb, fits


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


def _fused_grad_hess_call(Bf, aux, active, kernel=None):
    B, P, n = Bf.shape
    tp = _tile_rows(P, n)
    # frozen lanes pin their Bf block index to 0: consecutive grid steps with
    # an unchanged index elide the HBM->VMEM copy, so a frozen lane skips the
    # DMA traffic as well as the MXU passes
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, P // tp),
        in_specs=[
            pl.BlockSpec((1, 3, tp), lambda b, i, act: (b, 0, i * act[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, n), lambda b, i, act: (b, i * act[b], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n), lambda b, i, act: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b, i, act: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel or _grad_hess_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n, n), jnp.float32),
        ),
        interpret=_FORCE_INTERPRET,
    )(active, aux, Bf)


@functools.partial(jax.jit, static_argnames=('cheap',))
def fused_grad_hess_batched(Bf, s, yv, w, cheap=False, cb=None, fits=None,
                            active=None):
    """Fused logistic gradient and Gauss-Newton Hessian, batched.

    The batch is a grid dimension (NOT vmap: a vmapped pallas_call allocates
    the whole batched output in VMEM). The batch is additionally chunked so
    each call's output buffers fit comfortably in VMEM.

    :param Bf: (B, P, n) feature matrices, n a multiple of 128.
    :param cheap: use the 1-pass bf16 gram (early hybrid iterations).
    :param cb: optional (B, P // tile) band block starts (see
        :func:`compute_band_blocks`); with ``fits`` true, the banded kernel
        computes only the column blocks that can be nonzero.
    :param fits: traced scalar bool — every tile's band fits its window;
        otherwise the dense kernel runs (a real lax.cond, one branch
        executes).
    :param active: optional (B,) per-lane activity flag (1 = compute). The
        Newton driver freezes lanes permanently on convergence and discards
        their g/H, so frozen lanes skip the MXU passes and the Bf DMA and
        return zeros instead — chunk batches stop paying gram FLOPs for
        lanes that converged iterations before the slowest lane.
    :return: ``(g (B, n), H (B, n, n))`` float32.
    """
    B, P, n = Bf.shape
    kernel = _grad_hess_kernel_1pass if cheap else None
    aux = jnp.stack([s, yv, w], axis=1).astype(jnp.float32)  # (B, 3, P)
    Bf = Bf.astype(jnp.float32)
    if active is None:
        active = jnp.ones((B,), jnp.int32)
    else:
        active = active.astype(jnp.int32)
    nband = nband_for(n)
    use_banded = (cb is not None and fits is not None and nband > 0
                  and not cheap)
    # full-width gram when no band applies (and the fits=False branch of the
    # banded cond): triangle-blocked when the symmetry saves MXU passes.
    # Bounded at nbg <= 8 (n <= 1024): the kernel body unrolls
    # nbg(nbg+1)/2 block dots + mirrors, so n = 2048 would mean a 136-dot
    # Mosaic program — an unmeasured compile-time/VMEM class; the single-dot
    # dense kernel keeps covering it
    use_tri = TRI_GRAM and not cheap and n % 128 == 0 and 2 <= n // 128 <= 8
    if use_banded:
        banded_kernel = _make_banded_kernel(_gram_dot_full, nband, n // 128)

    def full_gram(Bf_c, aux_c, act_c):
        if use_tri:
            return _tri_grad_hess_call(Bf_c, aux_c, act_c)
        g, H = _fused_grad_hess_call(Bf_c, aux_c, act_c, kernel)
        return g[:, 0, :], H

    def one_chunk(Bf_c, aux_c, cb_c, act_c):
        if not use_banded:
            return full_gram(Bf_c, aux_c, act_c)
        return jax.lax.cond(
            fits,
            lambda args: _banded_grad_hess_call(args[0], args[1], args[2],
                                                args[3], nband, banded_kernel),
            lambda args: full_gram(args[0], args[1], args[3]),
            (Bf_c, aux_c, cb_c, act_c))

    bc = _batch_chunk(n)
    if bc >= B:
        return one_chunk(Bf, aux, cb, active)
    gs, Hs = [], []
    for start in range(0, B, bc):
        end = min(start + bc, B)
        g, H = one_chunk(Bf[start:end], aux[start:end],
                         None if cb is None else cb[start:end],
                         active[start:end])
        gs.append(g)
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
