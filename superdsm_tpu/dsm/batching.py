"""Padded, bucketed batching of per-region convex solves.

This is the TPU replacement for the reference's one-Ray-task-per-object
fan-out (``/root/reference/superdsm/objects.py:215-284``): candidate regions
of arbitrary size are packed into statically-shaped batches (pixel counts and
deformation dimensions padded to bucket sizes, batch padded with dummy
problems) so that each distinct shape compiles exactly once and hundreds of
convex programs run per device step.
"""

import math
import os as _os
import sys as _sys
import threading as _threading
import time as _time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

#: Set SDSM_SOLVE_TELEMETRY=1 to print per-call dispatch/fetch timings.
_TELEMETRY = _os.environ.get('SDSM_SOLVE_TELEMETRY') == '1'

#: Always-on device accounting (VERDICT r4 item 5: an MFU-style utilization
#: figure in the bench JSON). Accumulates per solve_problems call: the wall
#: time attributed to the device path (pack+dispatch+fetch, an UPPER bound —
#: it includes the ~43 ms/round tunnel latency and transfer time), the
#: per-lane Newton iterations actually executed, and an analytic estimate
#: of the solver FLOPs (see _estimate_chunk_flops). Snapshot via
#: device_accounting(); bench.py reports device_busy_frac and mfu_est.
_DEVICE_ACCT = {'wall_s': 0.0, 'flop_logical': 0.0, 'flop_hw': 0.0,
                'lane_iters': 0, 'calls': 0, 'canonical_lanes': 0}
_DEVICE_ACCT_LOCK = _threading.Lock()


def device_accounting():
    """A snapshot (dict copy) of the cumulative device-path accounting."""
    with _DEVICE_ACCT_LOCK:
        return dict(_DEVICE_ACCT)


def _estimate_chunk_flops(kind, pb, kb, lane_iters):
    """(logical, hardware) FLOP estimates for one dispatched chunk.

    Per lane-iteration model (documented in docs/scaling.md): the Gram
    matrix dominates — ``2 * P * n^2`` logical FLOPs with ``n = K + 6``
    model parameters — plus the Newton direction solve ``n^3 / 3``
    (batched Cholesky at n <= 256, PCG of similar cost above). Per lane:
    the deformation-basis build ``~10 * P * K`` (exp + polynomial terms).
    Frozen-lane kernel skips are already reflected in the fetched per-lane
    iteration counts. Hardware FLOPs scale the Gram part by the 6-pass
    float32 emulation the MXU actually executes (bf16 passes,
    SDSM_GRAM_PASSES=6); poly (deformation-free) solves are elementwise
    line searches, counted at their logical cost.
    """
    n = (6 if kind.startswith('poly') else kb + 6)
    iters = float(np.sum(lane_iters))
    gram = 2.0 * pb * n * n * iters
    direction = (n ** 3 / 3.0) * iters
    per_lane = 10.0 * pb * kb * len(lane_iters)
    logical = gram + direction + per_lane
    hw = (6.0 if not kind.startswith('poly') else 1.0) * gram \
        + direction + per_lane
    return logical, hw

from .solver import (solve_polynomial_batch, solve_dsm_batch, unpack_fg,
                     DEFAULT_MAXITER, DEFAULT_TOL)
from .smooth import prepare_deformation, smooth_matrix_params
from . import aot

#: Pixel-count buckets (padded shapes compile once each).
P_BUCKETS = [2048, 6144, 8192, 12288, 16384, 24576, 32768, 131072, 524288,
             2097152]
# The ladder is an ordinary performance knob: truncated lanes are
# re-solved at the FROZEN canonical shape (_CANONICAL_RESOLVE below), so
# repacks no longer move their chaotic energies (rounds 3-4 had to pin the
# ladder instead). SDSM_DROP_BUCKETS remains the A/B knob the stability
# gates use to exercise repacks; production keeps the full ladder.
if _os.environ.get('SDSM_DROP_BUCKETS'):
    _dropped = {int(x) for x in _os.environ['SDSM_DROP_BUCKETS'].split(',')
                if x.strip()}
    P_BUCKETS = [b for b in P_BUCKETS if b not in _dropped]
# 16384 splits what used to be a 4x jump (8192 -> 32768): on bench-like
# nuclei fields ~40% of the DSM solves have 8192 < P <= 16384 and were
# padded to 32768 — the padding rows are dead compute for the entire Newton
# loop, and padding is trajectory-preserving (padded pixels carry zero
# weight AND contribute exact 0.0 terms to the reductions, so results are
# bit-identical), making finer buckets a pure perf win. 6144/12288/24576
# continue the split: the measured bench distribution (158 dsm problems,
# P quantiles 10/50/90% = 3887/7540/12136) had padded/real = 1.52x on the
# pow2 ladder vs 1.31x with the 1.5x intermediate steps. All values are
# multiples of 2048 (pallas row-tile alignment for every K bucket).
#: Deformation-dimension buckets.
K_BUCKETS = [0, 26, 58, 122, 250, 506, 1018, 2042]  # 6+K = powers of two (tile-aligned)

#: Canonical re-solve of non-converged DSM lanes (VERDICT r4 item 2).
#: Measured (tools/probe_packing_invariance.py, real chip): a lane's solve
#: trajectory is bitwise independent of the OTHER lanes' data and of lane
#: order, but depends on the program shape (P bucket and batch B) — and
#: LM-stalling separable solves truncate CHAOTICALLY, so their energies
#: used to depend on the runtime bucket ladder and chunking. Re-solving
#: exactly those lanes in a FROZEN canonical shape (ladder below, fixed
#: B, elliptical-init branch forced, mesh bypassed) makes their energies a
#: pure function of the problem, which un-pins the production ladder and
#: chunking from the numerical contract. Converged lanes drift <= ~1e-4
#: under repacks (same probe) — absorbed by the dq() decision grid.
#: Truncated POLY lanes measured bitwise B-invariant (0.0 drift) and are
#: exempt. SDSM_CANONICAL_RESOLVE=0 disables (A/B knob).
_CANONICAL_RESOLVE = _os.environ.get('SDSM_CANONICAL_RESOLVE', '1') == '1'
#: FROZEN: never derive these from the runtime P_BUCKETS/K_BUCKETS — the
#: contract is that canonical energies survive ladder experiments.
_CANONICAL_P_LADDER = (2048, 6144, 8192, 12288, 16384, 24576, 32768,
                       131072, 524288, 2097152)
_CANONICAL_K_LADDER = (26, 58, 122, 250, 506, 1018, 2042)
#: B=1: canonical chunks carry NO padding lanes (padding at the big pixel
#: buckets measured ~40% of the canonical wave's device time), dispatches
#: are async so the per-dispatch overhead stays off the critical path, and
#: composition independence is trivial. One program per (P*, K*) either way.
_CANONICAL_B = 1
#: Tags of the lanes the last solve_problems call re-solved canonically
#: (test/debug aid; see tests/test_canonical_resolve.py).
_LAST_FLAGGED = []

#: Pixel count beyond which a region is solved on a uniform pixel subsample
#: (weights rescaled; see ``solve_problems``) — the feature matrix
#: [Q | G] of shape (P, 6+K) must stay within HBM.
P_SUBSAMPLE_TARGET = 524288

#: Largest admissible deformation dimension by region pixel count: caps the
#: (P, 6+K) feature matrix at ~1 GB. ``make_problem`` widens the subsample
#: stride until the grid fits (the reference instead lets G̃ grow without
#: bound and throttles concurrent allocations with a POSIX semaphore,
#: ``/root/reference/superdsm/_aux.py:63-96``).
def _k_limit(n_pixels):
    for pb, kl in [(8192, 2042), (32768, 2042), (131072, 1018),
                   (524288, 506)]:
        if n_pixels <= pb:
            return kl
    return 122
#: Batch-size cap per pixel bucket. Every compile costs minutes through
#: remote-compile tunnels, so the batch dimension is pinned: each (program,
#: P, K) combination admits exactly TWO shapes (B=1 for single-problem
#: rounds, B=cap otherwise) instead of a ladder of batch sizes. On CPU
#: (tests), padded batch compute is paid for real, so the caps stay small.
B_CAP_TPU = {2048: 64, 6144: 64, 8192: 64, 12288: 32, 16384: 32, 24576: 16,
             32768: 16, 131072: 8, 524288: 2, 2097152: 1}
B_CAP_CPU = {2048: 8, 6144: 8, 8192: 8, 12288: 4, 16384: 4, 24576: 4,
             32768: 4, 131072: 2, 524288: 1, 2097152: 1}
#: 6-parameter (deformation-free) programs are dispatch-bound, not
#: compute-bound: their caps are larger so a c2f round (including the
#: speculative split-tree solves) fits in one call.
B_CAP_POLY_TPU = {2048: 64, 6144: 64, 8192: 64, 12288: 64, 16384: 64,
                  24576: 64, 32768: 64, 131072: 8, 524288: 2, 2097152: 1}


def _on_cpu():
    import jax
    return jax.default_backend() == 'cpu'


def _b_cap(pb, kind='dsm'):
    if _on_cpu():
        return B_CAP_CPU[pb]
    return (B_CAP_POLY_TPU if kind == 'poly' else B_CAP_TPU)[pb]


# ---------------------------------------------------------------------------
# Multi-device routing. Two composable mechanisms:
#  * a process-wide pipeline mesh: every bucket batch is sharded over the
#    mesh 'batch' axis (candidate problems are independent, so XLA's SPMD
#    partitioner splits the packed Newton programs with no communication
#    beyond the tiny all-reduces of the batch-level early-exit conditions);
#  * a per-thread device scope: a host thread (e.g. one mosaic tile per
#    device) pins its solves to one device, so independent tiles run
#    concurrently across chips.
# ---------------------------------------------------------------------------

_PIPELINE_MESH = None
_THREAD_DEVICE = _threading.local()


def set_pipeline_mesh(mesh):
    """Routes all subsequent :func:`solve_problems` batches over ``mesh``'s
    'batch' axis (pass ``None`` to restore single-device operation)."""
    global _PIPELINE_MESH
    if mesh is not None:
        assert 'batch' in mesh.axis_names, "pipeline mesh needs a 'batch' axis"
    _PIPELINE_MESH = mesh


def get_pipeline_mesh():
    return _PIPELINE_MESH


class device_scope:
    """Context manager pinning this thread's solves to one device."""

    def __init__(self, device):
        self.device = device

    def __enter__(self):
        self._prev = getattr(_THREAD_DEVICE, 'device', None)
        _THREAD_DEVICE.device = self.device
        return self

    def __exit__(self, *exc):
        _THREAD_DEVICE.device = self._prev


class thread_device_assigner:
    """Round-robins ``devices`` onto EXECUTING THREADS (not job indices):
    thread pools pull jobs at different rates, so an index-based mapping can
    pin two in-flight jobs to the same chip while another sits idle. Each
    thread gets a sticky device on its first call; combine with
    :class:`device_scope` to pin that thread's solves."""

    def __init__(self, devices):
        self.devices = list(devices)
        self._lock = _threading.Lock()
        self._next = 0
        self._tls = _threading.local()

    def __call__(self):
        dev = getattr(self._tls, 'device', None)
        if dev is None:
            with self._lock:
                dev = self.devices[self._next % len(self.devices)]
                self._next += 1
            self._tls.device = dev
        return dev


def _mesh_batch_size(mesh):
    return int(mesh.shape['batch']) if mesh is not None else 1


def _make_placer():
    """Returns ``(placer, min_batch)``: a function mapping packed host arrays
    (leading batch dimension) onto devices, and the minimum padded batch size
    it requires. Placement order: thread device scope > pipeline mesh > None
    (jit default device)."""
    import jax
    device = getattr(_THREAD_DEVICE, 'device', None)
    if device is not None:
        if device == jax.devices()[0]:
            # pinning to the default device IS the default placement: skip
            # the explicit device_put so the dispatch can route through the
            # AOT executable registry (which warmup populated for exactly
            # this placement) — on a 1-chip host the pipelined path always
            # lands here
            return None, 1
        return (lambda arr: jax.device_put(arr, device)), 1
    mesh = _PIPELINE_MESH
    if mesh is not None and _mesh_batch_size(mesh) > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        def placer(arr):
            spec = PartitionSpec('batch', *([None] * (arr.ndim - 1)))
            return jax.device_put(arr, NamedSharding(mesh, spec))
        return placer, _mesh_batch_size(mesh)
    return None, 1


def _bucket(value, buckets):
    for b in buckets:
        if value <= b:
            return b
    raise ValueError(f'value {value} exceeds largest bucket {buckets[-1]}')


def _batch_shape(n_problems, pb, kind='dsm'):
    """Returns the padded batch size for ``n_problems`` problems of pixel
    bucket ``pb``: the smallest power of two >= n_problems, capped at the
    bucket's cap. Padding rows are dead compute for the whole Newton loop
    (they converge immediately but still occupy batch rows in every op), so
    a shape ladder beats the former two-shape (1, cap) scheme; the extra
    compiles are one-time via the persistent compilation cache."""
    return _pow2_ceil(min(n_problems, _b_cap(pb, kind)))


def _pow2_ceil(m):
    """Smallest power of two >= m (the ladder's padding rule — keep
    :func:`_batch_shape` and :func:`_dsm_chunk_sizes` in lockstep)."""
    b = 1
    while b < m:
        b *= 2
    return b


#: Minimum per-row gram work (pixels x (6+K)^2 MACs per iteration) for
#: splitting a group's tail chunk to be worth an extra launch: below this
#: the padded rows cost less than the ~30 ms per-call tunnel floor.
_SPLIT_MIN_WORK = 6e8


def _dsm_chunk_sizes(n, cap, pb, kb, min_b=1, on_cpu=None):
    """Chunk sizes for an ``n``-problem ``(pb, kb)`` DSM group.

    Full-cap chunks followed by the remainder. The remainder pads to a power
    of two (:func:`_batch_shape`), which can waste up to half the batch rows
    for the WHOLE Newton loop (e.g. 19 pads to 32). When the group's gram
    work is compute-bound rather than launch-bound, the remainder dispatches
    as TWO chunks — the largest power of two below it plus the padded rest
    (19 -> 16 + 4 = 20 padded rows) — reusing batch shapes the ladder
    already compiles. Trajectory-preserving: lanes freeze individually once
    converged (``solver._solve_batch_impl``), so batch composition never
    changes a problem's iterates. Disabled under a pipeline mesh
    (``min_b > 1``: every chunk pads to the mesh batch anyway) and on CPU
    shapes (the work gate), so the exact CPU goldens pin correctness.
    """
    sizes = []
    while n > cap:
        sizes.append(cap)
        n -= cap
    if n <= 0:
        return sizes

    padded = _pow2_ceil(n)
    # the explicit _on_cpu() guard (not just the work gate) pins the exact
    # CPU regression goldens against future B_CAP_CPU tuning: large CPU
    # shapes pass the work gate, and a CPU batch-composition change is only
    # ~1e-4-equal (test_chunk_composition_invariance)
    if on_cpu is None:
        on_cpu = _on_cpu()
    if (min_b == 1 and not on_cpu
            and pb * (6 + kb) ** 2 >= _SPLIT_MIN_WORK and padded > n):
        lo = padded // 2  # largest power of two below n (n is not a pow2)
        rest = n - lo
        saved = padded - (lo + _pow2_ceil(rest))
        if saved >= 4 and saved * 4 >= padded:
            sizes += [lo, rest]
            return sizes
    sizes.append(n)
    return sizes


def _shape_stats_path():
    """Platform-scoped sidecar of the persistent compile cache recording the
    (kind, P, K, B) program shapes actually dispatched, so warmup compiles
    only shapes seen in practice instead of the full bucket ladder."""
    import jax
    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        return None
    return _os.path.join(cache_dir, 'sdsm_shapes.json')


_RECORDED_SHAPES = set()

#: (kind, P, K, B) program shapes that have COMPLETED a device round in this
#: process. A round containing any shape outside this set pays the remote
#: program load + first dispatch, which the tunnel serializes server-side
#: (measured 111-1026 s for the warmup set depending on tunnel mood) — a
#: wall-clock deadline cannot distinguish that from a wedged tunnel, so the
#: ``cp_timeout`` guard only arms on rounds whose every program has already
#: run once (see :func:`solve_problems`).
_WARM_SHAPES = set()


def _record_shapes(entries):
    """Merges newly seen program shapes into the stats sidecar (best effort)."""
    import json
    new = set(entries) - _RECORDED_SHAPES
    if not new:
        return
    _RECORDED_SHAPES.update(new)
    path = _shape_stats_path()
    if path is None:
        return
    try:
        known = set()
        if _os.path.exists(path):
            with open(path) as fp:
                known = {tuple(e) for e in json.load(fp)}
        merged = known | _RECORDED_SHAPES
        if merged != known:
            _os.makedirs(_os.path.dirname(path), exist_ok=True)
            tmp = path + f'.tmp{_os.getpid()}'
            with open(tmp, 'w') as fp:
                json.dump(sorted(merged), fp)
            _os.replace(tmp, path)
    except OSError:
        pass


def _warmup_shapes(include_observed=False, include_large=False):
    """The shipped default shape list (observed on bench-like workloads);
    with ``include_observed`` also the shapes this machine has dispatched,
    and with ``include_large`` the shipped big-bucket programs
    (``warmup_shapes_large.json``: the 131072/524288-pixel shapes a real
    1024x1344 microscopy frame dispatches — VERDICT r4 item 1a). Large
    shapes are opt-in because their per-process server-side program loads
    are exactly the cost small-field workloads (bench) must not pay.

    The observed sidecar grows with every distinct workload (a single large
    mosaic adds its own bucket ladder), so it is opt-in: warming an
    unbounded union made warmup time REGRESS across rounds while priming
    shapes the current workload never uses."""
    import json
    shapes = set()
    here = _os.path.dirname(__file__)
    paths = [_os.path.join(here, 'warmup_shapes.json')] \
        + ([_os.path.join(here, 'warmup_shapes_large.json')]
           if include_large else []) \
        + ([_shape_stats_path()] if include_observed else [])
    for path in paths:
        if path and _os.path.exists(path):
            try:
                with open(path) as fp:
                    shapes |= {tuple(e) for e in json.load(fp)}
            except (OSError, ValueError):
                pass
    return shapes


def _warmup_job(kind, pb, kb, Bp, maxiter, tol, sigma, cutoff):
    """Returns ``(jitted_fn, args)`` for one warmup shape (dummy inputs).

    ``kind`` selects the program: ``poly``/``dsm`` take int16 coordinate
    pairs, ``poly-m``/``dsm-m`` the bit-packed mask transfers (the variant
    accelerator backends dispatch for every region whose bbox fits)."""
    from .solver import (_solve_poly_packed, _solve_dsm_packed,
                         _solve_poly_packed_mask, _solve_dsm_packed_mask,
                         MASK_BITS_PER_PIXEL)
    rng = np.random.RandomState(0)
    OFF = np.zeros((Bp, 2), np.int32)
    CNT = np.full(Bp, pb, np.int32)
    YQ = rng.randint(-32767, 32767, (Bp, pb)).astype(np.int16)
    YS = np.ones(Bp, np.float32)
    denom = np.array([63.0, 63.0], np.float32)
    if kind.endswith('-m'):
        nbits = pb * MASK_BITS_PER_PIXEL
        bits = np.zeros((Bp, nbits), np.uint8)
        bits[:, rng.choice(nbits, pb, replace=False)] = 1
        MB = np.packbits(bits, axis=1)
        WDT = np.full(Bp, 64, np.int32)
        head = (MB, WDT)
    else:
        head = (rng.randint(0, 50, (Bp, pb, 2)).astype(np.int16),)
    if kind.startswith('poly'):
        fn = _solve_poly_packed_mask if kind.endswith('-m') else _solve_poly_packed
        return fn, (*head, OFF, CNT, YQ, YS, denom,
                    np.zeros((Bp, 6), np.float32),
                    int(maxiter), float(tol))
    fn = _solve_dsm_packed_mask if kind.endswith('-m') else _solve_dsm_packed
    return fn, (*head, OFF, CNT, YQ, YS, denom,
                rng.randint(0, 50, (Bp, kb, 2)).astype(np.int16),
                np.ones((Bp, kb), np.float32),
                np.zeros((Bp, 6 + kb), np.float32),
                np.zeros(Bp, bool),
                np.full(Bp, 0.1, np.float32), 1.0,
                int(maxiter), float(tol), float(sigma),
                int(cutoff))


def warmup(shapes=None, maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL, sigma=4.0,
           cutoff=16, threads=8, compile_only=False, include_large=False):
    """Pre-compiles the solver programs for ``shapes`` — an iterable of
    ``(kind, P, K, B)`` tuples, defaulting to the shapes observed in practice
    (shipped ``warmup_shapes.json`` merged with this machine's dispatch
    history). Unlisted shapes compile lazily on first use and enter both the
    persistent compile cache and the local shape history.

    Round 1 warmed the full bucket ladder (~134 programs, 150-370 s
    warm-cache per process); the observed set is ~30 programs.

    Runs in two thread-pooled phases so the cost is attributable
    (VERDICT r2 item 2): phase 1 traces + compiles every program WITHOUT
    dispatching work (``fn.lower(...).compile()`` — with the persistent
    compile cache warm this is deserialization); phase 2 invokes each
    program once and fetches a tiny leaf, paying the remote program
    load + first dispatch through the device tunnel.  With
    ``compile_only`` phase 2 is skipped: programs then pay their device
    load lazily on first production dispatch — useful when the caller
    immediately runs a covering workload (bench.py's warm pass) and warming
    shapes that workload never dispatches would be dead tunnel time.

    :return: ``{'wall_s', 'compile_s', 'load_s', 'n_programs',
        'aot_deserialize_thread_s', 'compile_thread_s'}``.  ``compile_s``
        is the phase-1 wall time; the two ``*_thread_s`` fields split the
        summed thread time honestly between true XLA compiles and AOT
        sidecar ``deserialize_and_load`` (which includes the
        server-side program load through the tunnel — historically
        mislabeled as compile time).
    """
    from concurrent.futures import ThreadPoolExecutor
    if shapes is None:
        shapes = _warmup_shapes(include_large=include_large)
    # Entries are (kind, P, K, B) + statics. The statics are COMPILE-TIME
    # program parameters, so they are part of the production aot.dispatch
    # key (a workload with smooth_amount != the warmup default would
    # silently miss every registry entry otherwise). Legacy 4-tuples (the
    # pre-statics sidecar format and hand-written shape lists) get this
    # call's tol/sigma/cutoff arguments appended.
    def _normalize(shape):
        shape = tuple(shape)
        if len(shape) > 4:
            return shape
        kind = shape[0]
        return shape + ((float(tol),) if kind.startswith('poly')
                        else (float(tol), float(sigma), int(cutoff)))

    shapes = sorted({_normalize(s) for s in shapes})
    t_start = _time.time()

    def _job(shape, mi):
        kind, pb, kb, Bp = shape[:4]
        statics = shape[4:]
        if kind.startswith('poly'):
            return _warmup_job(kind, pb, kb, Bp, mi, statics[0], sigma, cutoff)
        return _warmup_job(kind, pb, kb, Bp, mi, *statics)

    def lower_one(shape):
        fn, args = _job(shape, maxiter)
        # registers an AOT executable (sidecar deserialization is 2.5-3x
        # faster than the warm-persistent-cache compile path); production
        # dispatch then routes through the same executable via aot.dispatch
        aot.acquire(*shape[:4], shape[4:], fn, args)
        if not aot.enabled():
            fn.lower(*args).compile()

    def run_one(shape):
        import jax
        # maxiter is a TRACED argument, so maxiter=1 exercises the SAME
        # program while paying ~maxiter times less dummy device compute —
        # measured: the "load" phase was dominated by the dummy executions
        # serializing on the one chip (50 Newton iterations at full batch),
        # not by program loading. Routed through the AOT registry so the
        # server-side program load is paid by the executable production
        # will actually call.
        fn, args = _job(shape, 1)
        outs = aot.dispatch(*shape[:4], shape[4:], fn, args)
        jax.device_get(outs[1][:1])  # tiny sync - block_until_ready is a
        #                              no-op through the axon tunnel
        _WARM_SHAPES.add(shape)

    aot_t0 = dict(aot.timings)
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(lower_one, shapes))
    t_compiled = _time.time()
    if not compile_only:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(run_one, shapes))
    t_done = _time.time()
    return {'wall_s': t_done - t_start,
            'compile_s': t_compiled - t_start,
            'load_s': 0.0 if compile_only else t_done - t_compiled,
            'aot_deserialize_thread_s': aot.timings['deserialize_s'] - aot_t0['deserialize_s'],
            'compile_thread_s': aot.timings['compile_s'] - aot_t0['compile_s'],
            'n_programs': len(shapes)}


@dataclass
class Problem:
    """One region-level convex program.

    :ivar pts: (P, 2) int16 crop-local pixel coordinates of the region mask
        (already in the packed transfer dtype, so batch packing is a memcpy).
    :ivar offset: (2,) crop offset within the full image.
    :ivar img_shape: full-image shape (coordinates are normalized by it).
    :ivar yv: (P,) offset image intensities at the pixels.
    :ivar sub: (K, 2) int32 subsample-point coordinates (empty = no
        deformations, the reference's NULL-matrix case).
    :ivar tag: caller-defined identifier.
    :ivar init_params: Optional (6 + K,) warm-start parameters aligned with
        ``sub`` (theta transfers between regions directly since coordinates
        are normalized by the full-image shape). Problems with a warm start
        skip the elliptical initialization pass; the LM solver is monotone,
        so the result can only improve on the warm start.
    """
    pts: np.ndarray
    offset: np.ndarray
    img_shape: tuple
    yv: np.ndarray
    sub: np.ndarray
    tag: object = None
    init_params: Optional[np.ndarray] = None
    #: Per-problem multiplier on the deformation weight alpha. Used by the
    #: pixel-subsampled solve of oversized regions: scaling the data term by
    #: 1/factor is equivalent to scaling alpha by 1/factor, which keeps the
    #: minimizer of the subsampled energy aligned with the full energy.
    alpha_scale: float = 1.0
    #: Crop (bbox) shape of the region mask; derived from the coordinate
    #: extent when not provided. Basis of the bit-packed mask transfer
    #: format (``solver._mask_to_pix``).
    crop_shape: Optional[tuple] = None

    @property
    def n_pixels(self):
        return len(self.pts)

    def _crop_shape(self):
        if self.crop_shape is None:
            # make_problem crops to the mask bbox, so the coordinate extent
            # IS the crop shape; hand-built problems may be looser, which
            # only makes the fit check conservative
            self.crop_shape = (int(self.pts[:, 0].max()) + 1,
                               int(self.pts[:, 1].max()) + 1)
        return self.crop_shape

    @property
    def crop_area(self):
        h, w = self._crop_shape()
        return h * w

    @property
    def packed_mask(self):
        """Row-major bit-packed region mask over the crop bbox (cached).
        ``np.unpackbits`` of it at the crop width reproduces ``pts`` exactly
        (``solver._mask_to_pix`` is the device-side inverse)."""
        pm = getattr(self, '_packed_mask', None)
        if pm is None:
            h, w = self._crop_shape()
            m = np.zeros(h * w, bool)
            m[self.pts[:, 0].astype(np.int64) * w + self.pts[:, 1]] = True
            pm = np.packbits(m)
            self._packed_mask = pm
        return pm

    def fits_mask(self, pb):
        """Whether the bit-packed mask transfer can carry this problem at
        pixel bucket ``pb`` (bbox bits within the buffer capacity, and
        ``pts`` in strictly increasing row-major order within the crop).

        The packed format collapses ``pts`` into a bitmask and the device
        decode rebuilds the coordinates argwhere-sorted, while ``yv``/
        ``init_params`` keep the given order — so a hand-built Problem with
        unsorted or duplicate points would silently pair pixels with other
        pixels' intensities. Such problems route to the explicit-coordinate
        path instead (identical results, larger transfer)."""
        from .solver import MASK_BITS_PER_PIXEL
        if self.crop_area > pb * MASK_BITS_PER_PIXEL:
            return False
        ok = getattr(self, '_pts_rowmajor', None)
        if ok is None:
            h, w = self._crop_shape()
            r, c = self.pts[:, 0].astype(np.int64), self.pts[:, 1].astype(np.int64)
            lin = r * w + c
            ok = bool((len(lin) == 0)
                      or (np.all(lin[1:] > lin[:-1])
                          and r[0] >= 0 and c.min() >= 0
                          and r[-1] < h and c.max() < w))
            self._pts_rowmajor = ok
        return ok

    @property
    def n_deform(self):
        return len(self.sub)

    @property
    def yscale(self):
        """Per-problem quantization scale max|yv| (cached)."""
        s = getattr(self, '_yscale', None)
        if s is None:
            s = float(np.abs(self.yv).max()) if len(self.yv) else 1.0
            s = s if s > 0 else 1.0
            self._yscale = s
        return s

    @property
    def yq(self):
        """int16-quantized intensities (yv ~ yq * yscale / 32767; cached).

        Non-finite intensities (numerically failed inputs, exercised by the
        fallback tests) quantize to 0 instead of tripping an invalid-cast
        warning; the solve of such a problem still ends in the device-side
        fallback path via its non-finite energy."""
        q = getattr(self, '_yq', None)
        if q is None:
            with np.errstate(invalid='ignore'):
                scaled = np.nan_to_num(self.yv * (32767.0 / self.yscale),
                                       nan=0.0, posinf=32767.0, neginf=-32767.0)
            q = np.round(scaled).astype(np.int16)
            self._yq = q
        return q

    def norm_coords(self):
        denom = np.maximum(np.asarray(self.img_shape, np.float32) - 1.0, 1.0)
        return (self.pts.astype(np.float32) + np.asarray(self.offset)[None, :]) / denom[None, :]


@dataclass
class ProblemResult:
    """Solution of one :class:`Problem` (unpadded)."""
    params: np.ndarray            # (6 + K,)
    energy: float
    status: str                   # 'optimal' or 'fallback'
    surface: Optional[np.ndarray]  # (P,) surface values (packed path: None)
    fg: Optional[np.ndarray] = None  # (P,) bool foreground at the mask pixels
    tag: object = None


def make_problem(region, img_shape=None, smooth_amount=np.inf,
                 gaussian_shape_multiplier=2, smooth_subsample=20, tag=None):
    """Builds a :class:`Problem` from an :class:`~superdsm_tpu.image.Image`
    region (full-frame or cropped; the mask selects the solve pixels).

    Mirrors the region semantics of ``Energy.__init__``
    (``/root/reference/superdsm/dsm.py:266-289``): pixels are the masked
    points, coordinates are normalized by the region model shape, and the
    deformation basis is the subsampled Gaussian matrix of the cropped mask.
    """
    from ..image import bbox as _bbox
    mask = region.mask
    if img_shape is None:
        img_shape = region.model.shape
    if not mask.any():
        raise ValueError('empty region mask')
    _, sel = _bbox(mask)
    mask_crop = mask[sel]
    pts = np.argwhere(mask_crop).astype(np.int16)
    offset = np.array([sel[0].start + (region.offset[0] if region.offset is not None else 0),
                       sel[1].start + (region.offset[1] if region.offset is not None else 0)],
                      np.int32)
    yv = region.model[sel][mask_crop].astype(np.float32)
    sub = prepare_deformation(mask_crop, smooth_amount, gaussian_shape_multiplier,
                              smooth_subsample)
    # adaptive stride guard: a huge region at the configured stride would
    # overflow the K buckets (and HBM); widen the stride until the grid fits
    stride = smooth_subsample
    while len(sub) > _k_limit(len(pts)):
        stride = int(math.ceil(stride * 1.5))
        sub = prepare_deformation(mask_crop, smooth_amount,
                                  gaussian_shape_multiplier, stride)
    return Problem(pts=pts, offset=offset, img_shape=tuple(img_shape), yv=yv,
                   sub=sub, tag=tag, crop_shape=tuple(mask_crop.shape))


class SolveTimeout(Exception):
    """A solve round exceeded its wall-clock deadline (wedged device/tunnel)."""


def _fetch_with_deadline(sel, timeout):
    """``jax.device_get(sel)`` bounded by ``timeout`` seconds.

    The TPU sits behind a remote tunnel; a wedged fetch would otherwise block
    forever (and, in the forked batch CLI, hang the whole task queue). The
    fetch runs on a daemon thread so an expired deadline abandons it — if the
    tunnel later recovers, the orphaned result is dropped."""
    import jax
    # reference semantics: cp_timeout <= 0 means DISABLED (the reference only
    # arms SIGALRM for timeout > 0, /root/reference/superdsm/dsm.py:484)
    if timeout is None or timeout <= 0:
        return jax.device_get(sel)
    box = {}

    def _run():
        try:
            box['value'] = jax.device_get(sel)
        except BaseException as error:  # propagate device errors to caller
            box['error'] = error

    thread = _threading.Thread(target=_run, daemon=True)
    thread.start()
    thread.join(timeout)
    if thread.is_alive():
        raise SolveTimeout(f'solve fetch exceeded {timeout:.0f}s deadline')
    if 'error' in box:
        raise box['error']
    return box['value']


def _host_energy_fg(p, params, alpha, epsilon, smooth_amount, cutoff):
    """Numpy evaluation of ψ and the foreground mask at ``params``.

    Used only on the wall-clock fallback path (the device cannot be fetched
    from); mirrors the device energy (``solver._energy_from_surface`` +
    ``smooth.build_smooth_matrix``) minus the int16 intensity quantization,
    which is irrelevant for a fallback estimate."""
    coords = p.norm_coords()
    x1, x2 = coords[:, 0].astype(np.float64), coords[:, 1].astype(np.float64)
    Q = np.stack([x1 * x1, x2 * x2, 2 * x1 * x2, 2 * x1, 2 * x2,
                  np.ones_like(x1)], axis=-1)
    params = np.zeros(6 + p.n_deform) if params is None else np.asarray(params, np.float64)
    s = Q @ params[:6]
    reg = 0.0
    k = p.n_deform
    if k and np.isfinite(smooth_amount) and len(params) >= 6 + k:
        xi = params[6:6 + k]
        # chunked over pixels: the dense (P, K) kernel block of an oversized
        # region would not fit host memory in one piece
        for lo in range(0, len(p.pts), 65536):
            hi = lo + 65536
            dr = p.pts[lo:hi, None, 0].astype(np.float64) - p.sub[None, :, 0]
            dc = p.pts[lo:hi, None, 1].astype(np.float64) - p.sub[None, :, 1]
            G = np.exp(-(dr * dr + dc * dc) / (2.0 * smooth_amount ** 2))
            G[(np.abs(dr) > cutoff) | (np.abs(dc) > cutoff)] = 0.0
            G /= np.maximum(G.sum(axis=1, keepdims=True), 1e-30)
            s[lo:hi] += G @ xi
        reg = alpha * p.alpha_scale * float(
            np.sum(np.sqrt(xi * xi + epsilon) - np.sqrt(epsilon)))
    data = float(np.sum(np.logaddexp(0.0, -p.yv.astype(np.float64) * s)))
    return data + max(reg, 0.0), s > 0


def _host_lsq_init(p, margin=2.0, ridge=1e-6):
    """Numpy mirror of ``solver._lsq_init`` for one problem: ridge regression
    of the polynomial surface onto ``margin * sign(y)``."""
    coords = p.norm_coords().astype(np.float64)
    x1, x2 = coords[:, 0], coords[:, 1]
    Q = np.stack([x1 * x1, x2 * x2, 2 * x1 * x2, 2 * x1, 2 * x2,
                  np.ones_like(x1)], axis=-1)
    z = margin * np.sign(p.yv.astype(np.float64))
    A = Q.T @ Q
    A = A + ridge * np.trace(A) * np.eye(6)
    theta = np.linalg.solve(A, Q.T @ z)
    return np.where(np.isfinite(theta), theta, 0.0).astype(np.float32)


def _fallback_results_after_timeout(problems, oversized, alpha, epsilon,
                                    smooth_amount, cutoff, fetch):
    """Builds 'fallback' :class:`ProblemResult` rows from the initializations
    after a :class:`SolveTimeout` — the host-side analog of the reference's
    SIGALRM → fall-back-to-initialization path
    (``/root/reference/superdsm/dsm.py:478-490``,
    ``objects.py:394-411``)."""
    results = []
    for i, p in enumerate(problems):
        factor, orig = oversized.get(i, (1.0, p))
        eval_p = orig if fetch != 'energy' else p
        params = p.init_params
        if params is None:
            # cold problems (first generation, c2f) have no warm start — the
            # device program would have started from the closed-form LSQ
            # ellipse (solver._lsq_init); zeros would mean an empty
            # foreground, collapsing quality instead of degrading it
            params = np.zeros(6 + p.n_deform, np.float32)
            params[:6] = _host_lsq_init(p)
        energy, fg = _host_energy_fg(eval_p, params, alpha, epsilon,
                                     smooth_amount, cutoff)
        if i in oversized and fetch == 'energy':
            energy *= factor
        results.append(ProblemResult(
            params=None if fetch == 'energy' else np.asarray(params, np.float32),
            energy=float(energy), status='fallback', surface=None,
            fg=None if fetch == 'energy' else fg, tag=p.tag))
    return results


def solve_problems(problems, alpha=0.5, epsilon=1.0, smooth_amount=10,
                   gaussian_shape_multiplier=2, init='elliptical',
                   maxiter=DEFAULT_MAXITER, tol=DEFAULT_TOL, out=None,
                   progress_line='Computing objects', fetch='full',
                   timeout=None):
    """Solves a list of :class:`Problem` in padded, bucketed batches.

    Problems without deformation dimensions run the packed 6-parameter
    program; all others run ONE packed program per (P, K) bucket that
    performs the elliptical initialization and the full DSM solve in a
    single dispatch, starting from the better of the elliptical solution
    and the optional warm start (cf. ``cvxprog``,
    ``/root/reference/superdsm/objects.py:361-412`` — the reference solves
    the two phases as separate cvxopt programs per object).

    :param fetch: ``'full'`` fetches parameters and foreground masks;
        ``'energy'`` fetches only energies and fallback flags (the c2f
        normalized-energy rounds need nothing else, and the per-pixel
        foreground masks dominate the host<->device transfer volume).
    :param timeout: wall-clock deadline (seconds) for the batched
        dispatch+fetch round; on expiry every problem in the round falls
        back to its initialization with status ``'fallback'`` and processing
        continues. Batched analog of the reference's per-solve SIGALRM
        ``cp_timeout`` (``/root/reference/superdsm/dsm.py:478-490``) — one
        round solves many problems but runs in seconds, so the same default
        (300 s) bounds a wedged tunnel without ever firing on healthy runs.
        The deadline arms only when every program shape in the round has
        completed a device round in this process (``_WARM_SHAPES``): a
        first-run round legitimately pays the server-serialized remote
        program load, which can take minutes and is indistinguishable from
        a wedge client-side.
    :return: list of :class:`ProblemResult`, aligned with ``problems``.
    """
    from .solver import _solve_dsm_packed
    results = [None] * len(problems)
    if len(problems) == 0:
        return results
    _t_start = _time.time()

    _, cutoff = smooth_matrix_params(smooth_amount, gaussian_shape_multiplier)
    img_shape = problems[0].img_shape
    # coordinates are normalized by ONE image shape per call — a silent
    # mix of shapes would mis-scale every problem after the first
    assert all(p.img_shape == img_shape for p in problems), \
        'solve_problems requires a uniform img_shape per call'
    denom = np.maximum(np.asarray(img_shape, np.float32) - 1.0, 1.0)

    # Regions beyond the largest pixel bucket are solved on a uniform pixel
    # subsample: scaling the data term by 1/factor equals scaling alpha by
    # 1/factor, so the minimizer tracks the full-region optimum and
    # ``factor * energy`` estimates the full-region energy. The returned
    # foreground is re-evaluated at EVERY mask pixel from the fitted surface
    # (chunked device program). The reference handles such regions by letting
    # G̃ grow without bound under a semaphore
    # (``/root/reference/superdsm/dsm.py:145-161``).
    problems = list(problems)
    oversized = {}
    for i, p in enumerate(problems):
        if p.n_pixels > P_BUCKETS[-1]:
            step = int(math.ceil(p.n_pixels / P_SUBSAMPLE_TARGET))
            pts_sub = np.ascontiguousarray(p.pts[::step])
            factor = p.n_pixels / float(len(pts_sub))
            problems[i] = Problem(
                pts=pts_sub, offset=p.offset, img_shape=p.img_shape,
                yv=np.ascontiguousarray(p.yv[::step]), sub=p.sub, tag=p.tag,
                init_params=p.init_params, alpha_scale=1.0 / factor)
            oversized[i] = (factor, p)

    poly_groups = {}
    dsm_groups = {}
    for i, p in enumerate(problems):
        pb = _bucket(p.n_pixels, P_BUCKETS)
        if p.n_deform == 0 or not np.isfinite(smooth_amount):
            poly_groups.setdefault(pb, []).append(i)
        else:
            kb = _bucket(max(p.n_deform, 1), K_BUCKETS[1:])
            dsm_groups.setdefault((pb, kb), []).append(i)

    # coalesce small K groups into the next-larger K group of the same pixel
    # bucket: each call pays ~0.2 s of fixed tunnel cost, which outweighs the
    # extra padded columns for small batches
    for (pb, kb) in sorted(dsm_groups.keys()):
        group = dsm_groups.get((pb, kb))
        if group is None or len(group) > _b_cap(pb) // 4:
            continue
        larger = [kb2 for (pb2, kb2) in dsm_groups if pb2 == pb and kb2 > kb]
        if larger:
            dsm_groups[(pb, min(larger))].extend(dsm_groups.pop((pb, kb)))

    # merge tiny leftover DSM groups into a larger (P, K) group: a couple of
    # rows padded up a pixel bucket is cheaper than one more per-call tunnel
    # floor (~30 ms)
    for (pb, kb) in sorted(dsm_groups.keys()):
        group = dsm_groups.get((pb, kb))
        if group is None or len(group) > 2:
            continue
        targets = [(pb2, kb2) for (pb2, kb2) in dsm_groups
                   if (pb2, kb2) != (pb, kb) and pb2 >= pb and kb2 >= kb]
        if targets:
            dsm_groups[min(targets)].extend(dsm_groups.pop((pb, kb)))

    # 6-parameter solves are dispatch-bound on accelerators: pad a
    # multi-bucket round up to ONE shared pixel bucket (<= 32768) so the
    # whole round is a single program launch
    if not _on_cpu() and len(poly_groups) > 1:
        eligible = sorted(pb for pb in poly_groups if pb <= 32768)
        if len(eligible) > 1:
            target = eligible[-1]
            for pb in eligible[:-1]:
                poly_groups[target] = poly_groups.pop(pb) + \
                    poly_groups.get(target, [])

    # dispatch every bucket group asynchronously, then fetch all results in
    # one host round trip — overlaps transfers with device compute and pays
    # the tunnel latency once instead of per group
    from .solver import _pack_poly_group
    placer, min_b = _make_placer()
    pending = []  # (kind, chunk, device outputs)
    dispatched_shapes = []
    # Transfer-format routing: on accelerator backends problems whose bbox
    # fits the bit-packed mask buffer (virtually all of them — measured
    # bbox/pixel ratios 1.9-3.7 vs capacity 4) ship as masks, 8x smaller
    # than coordinate pairs through the ~50 MB/s tunnel; the rest (typically
    # pixel-subsampled oversized regions) keep the coordinate path. The
    # rebuilt coordinates are identical, so results are bitwise unchanged.
    # CPU keeps the coordinate path: transfers are free there and the exact
    # CPU regression goldens stay pinned to one program structure.
    # SDSM_MASK_TRANSFERS=0 forces the coordinate path everywhere (A/B knob);
    # =1 forces the mask path even on CPU (the bench-scale mesh slow gate
    # exercises the production 'dsm-m'/'poly-m' kinds on the virtual mesh).
    _mask_env = _os.environ.get('SDSM_MASK_TRANSFERS')
    mask_capable = (_mask_env == '1') if _mask_env is not None \
        else not _on_cpu()

    def _variants(idxs, pb):
        if not mask_capable:
            return ((idxs, False),) if idxs else ()
        fit = [i for i in idxs if problems[i].fits_mask(pb)]
        nofit = [i for i in idxs if not problems[i].fits_mask(pb)]
        return tuple((lst, um) for lst, um in ((fit, True), (nofit, False))
                     if lst)

    for pb, idxs in sorted(poly_groups.items()):
        bmax = _b_cap(pb, 'poly')
        for vidxs, use_mask in _variants(idxs, pb):
            for chunk_start in range(0, len(vidxs), bmax):
                chunk = vidxs[chunk_start: chunk_start + bmax]
                Bp = max(_batch_shape(len(chunk), pb, 'poly'), min_b)
                dispatched_shapes.append(
                    ('poly-m' if use_mask else 'poly', pb, 0, Bp, float(tol)))
                inits = [problems[i].init_params for i in chunk]
                outs = _pack_poly_group([problems[i] for i in chunk], img_shape,
                                        params0=inits, maxiter=maxiter, tol=tol,
                                        pb=pb, Bp=Bp, placer=placer,
                                        use_mask=use_mask)
                pending.append(('poly-m' if use_mask else 'poly', chunk, outs))

    from .solver import (_solve_dsm_packed_mask, MASK_BITS_PER_PIXEL)

    def _dsm_chunk_arrays(chunk, pb, kb, Bp, use_mask, warm_tail_all):
        """Packs one dsm chunk into its device arrays (ONE construction for
        the production dispatch and the canonical re-solve — any divergence
        here would silently break the canonical-energy contract).

        ``warm_tail_all``: padding rows' USE_WARM value. Production passes
        True semantics (all-of-real — preserves the all-warm elliptical
        skip); the canonical re-solve passes False so the
        better-of(elliptical, warm) init path always runs, making each
        lane's trajectory independent of which other lanes share the
        canonical chunk (the elliptical skip is a chunk-global branch).
        """
        OFF = np.zeros((Bp, 2), np.int32)
        CNT = np.zeros((Bp,), np.int32)
        YQ = np.zeros((Bp, pb), np.int16)
        YS = np.zeros((Bp,), np.float32)
        SUB = np.full((Bp, kb, 2), -10 * (cutoff + 1), np.int16)
        KM = np.zeros((Bp, kb), np.float32)
        WARM = np.zeros((Bp, 6 + kb), np.float32)
        USE_WARM = np.zeros((Bp,), bool)
        if use_mask:
            MB = np.zeros((Bp, (pb * MASK_BITS_PER_PIXEL) // 8), np.uint8)
            WDT = np.ones((Bp,), np.int32)
        else:
            PIXa = np.zeros((Bp, pb, 2), np.int16)
        for j, i in enumerate(chunk):
            p = problems[i]
            npix, k = p.n_pixels, p.n_deform
            if use_mask:
                pm = p.packed_mask
                MB[j, :len(pm)] = pm
                WDT[j] = p.crop_shape[1]
            else:
                PIXa[j, :npix] = p.pts
            OFF[j] = p.offset
            CNT[j] = npix
            YQ[j, :npix] = p.yq
            YS[j] = p.yscale
            SUB[j, :k] = p.sub
            KM[j, :k] = 1.0
            if p.init_params is not None:
                WARM[j, :6 + k] = p.init_params
                USE_WARM[j] = True
        # padding rows (CNT=0, result unused) must not defeat the all-warm
        # elliptical skip inside _solve_dsm_packed
        if warm_tail_all:
            USE_WARM[len(chunk):] = USE_WARM[:len(chunk)].all()
        ALPHA = np.full(Bp, alpha, np.float32)
        for j, i in enumerate(chunk):
            ALPHA[j] *= problems[i].alpha_scale
        head = (MB, WDT) if use_mask else (PIXa,)
        return head + (OFF, CNT, YQ, YS, SUB, KM, WARM, USE_WARM, ALPHA)

    for (pb, kb), idxs in sorted(dsm_groups.items()):
        # cold problems first: warm-started lanes converge in far fewer
        # iterations and freeze individually, so sorting packs the warm
        # problems into their own tail chunk(s) — that dispatch stops at
        # the warm iteration count instead of being dragged to the cold
        # problems' cap, and an all-warm chunk also skips the elliptical
        # init phase inside ``_solve_dsm_packed``
        idxs.sort(key=lambda i: (problems[i].init_params is not None,
                                 problems[i].n_pixels))
        bmax = _b_cap(pb)
        for vidxs, use_mask in _variants(idxs, pb):
            chunk_start = 0
            for size in _dsm_chunk_sizes(len(vidxs), bmax, pb, kb, min_b):
                chunk = vidxs[chunk_start: chunk_start + size]
                chunk_start += size
                Bp = max(_batch_shape(len(chunk), pb), min_b)
                dispatched_shapes.append(
                    ('dsm-m' if use_mask else 'dsm', pb, kb, Bp,
                     float(tol), float(smooth_amount), int(cutoff)))
                arrays = _dsm_chunk_arrays(chunk, pb, kb, Bp, use_mask,
                                           warm_tail_all=True)
                statics = (float(tol), float(smooth_amount), int(cutoff))
                if placer is not None:
                    arrays = tuple(map(placer, arrays))
                if use_mask:
                    MB, WDT, rest = arrays[0], arrays[1], arrays[2:]
                    args = (MB, WDT) + rest[:4] + (denom,) + rest[4:] \
                        + (float(epsilon), int(maxiter)) + statics
                    if placer is None:
                        outs = aot.dispatch('dsm-m', pb, kb, Bp, statics,
                                            _solve_dsm_packed_mask, args)
                    else:
                        outs = _solve_dsm_packed_mask(*args)
                else:
                    PIXa, rest = arrays[0], arrays[1:]
                    args = (PIXa,) + rest[:4] + (denom,) + rest[4:] \
                        + (float(epsilon), int(maxiter)) + statics
                    if placer is None:
                        outs = aot.dispatch('dsm', pb, kb, Bp, statics,
                                            _solve_dsm_packed, args)
                    else:
                        outs = _solve_dsm_packed(*args)
                pending.append(('dsm-m' if use_mask else 'dsm', chunk, outs))
                if out is not None:
                    out.intermediate(
                        f'{progress_line}... dispatched '
                        f'{sum(len(c) for _, c, _ in pending)} / {len(problems)}')

    _record_shapes(dispatched_shapes)
    # arm the deadline only when every program in the round has completed a
    # run in this process: a first-run round legitimately pays the
    # server-serialized remote program load (minutes, tunnel-mood dependent),
    # which is indistinguishable from a wedge client-side — firing there
    # would silently degrade every problem to init-quality fallbacks
    if timeout is not None and any(s not in _WARM_SHAPES
                                   for s in dispatched_shapes):
        timeout = None
    import jax
    _t_fetch = _time.time()
    # fetch only the leaves the caller consumes — through a remote-device
    # tunnel every transferred byte (and every leaf round trip) is latency.
    # outs layouts: poly (params, f, conv, bad, fg, it_lane);
    #               dsm (params, f, f_ell, conv, bad, fg, it_lane).
    # ``conv``/``f_ell``/``it`` are device-side intermediates, fetched only
    # for telemetry.
    _idx = {'poly': dict(f=1, conv=2, bad=3, fg=4, it=5),
            'dsm': dict(f=1, conv=3, bad=4, fg=5, it=6)}

    def _ix(kind):  # pending kinds carry the transfer format ('dsm-m' etc.)
        return _idx['poly' if kind.startswith('poly') else 'dsm']

    if fetch == 'energy':
        sel = [(outs[ix['f']], outs[ix['bad']])
               for kind, _, outs in pending
               for ix in (_ix(kind),)]
    else:
        sel = [(outs[0], outs[ix['f']], outs[ix['bad']], outs[ix['fg']])
               for kind, _, outs in pending
               for ix in (_ix(kind),)]
    # iteration + convergence counters ride the same fetch (a second
    # device_get would cost another tunnel round trip and distort the
    # timing it reports); they are (B,) leaves — bytes, not milliseconds —
    # and feed the always-on device accounting and the canonical re-solve
    sel = (sel, [(outs[_ix(kind)['it']], outs[_ix(kind)['conv']])
                 for kind, _, outs in pending])
    try:
        fetched = _fetch_with_deadline(sel, timeout)
    except SolveTimeout:
        if out is not None:
            out.write(f'{progress_line}: deadline ({timeout:.0f}s) expired — '
                      f'{len(problems)} solve(s) fall back to initialization')
        return _fallback_results_after_timeout(
            problems, oversized, alpha, epsilon, smooth_amount, cutoff, fetch)
    except Exception:
        # an AOT registry executable can pass acquire-time validation yet
        # fail server-side at execution; dispatch is async, so that failure
        # surfaces here. Drop the round's registry entries and retry once —
        # the retry misses the registry and runs the plain jit path. A
        # failure unrelated to the registry reproduces on the retry and
        # propagates from there.
        if aot.drop(dispatched_shapes) == 0:
            raise
        if out is not None:
            out.write(f'{progress_line}: device round failed on an AOT '
                      f'executable — dropped, retrying via the jit path')
        retry_problems = list(problems)
        for i, (_factor, p_orig) in oversized.items():
            retry_problems[i] = p_orig
        return solve_problems(
            retry_problems, alpha=alpha, epsilon=epsilon,
            smooth_amount=smooth_amount,
            gaussian_shape_multiplier=gaussian_shape_multiplier,
            init=init, maxiter=maxiter, tol=tol, out=out,
            progress_line=progress_line, fetch=fetch, timeout=timeout)
    _WARM_SHAPES.update(dispatched_shapes)
    fetched, _its_conv = fetched
    _its = [it for it, _conv in _its_conv]
    _t_done = _time.time()
    _flop_l = _flop_h = 0.0
    _iters_total = 0
    for shape, ((kind, chunk, _), it) in zip(dispatched_shapes,
                                             zip(pending, _its)):
        lane_iters = np.asarray(it)[:len(chunk)]
        fl, fh = _estimate_chunk_flops(kind, shape[1], shape[2], lane_iters)
        _flop_l += fl
        _flop_h += fh
        _iters_total += int(np.sum(lane_iters))
    with _DEVICE_ACCT_LOCK:
        _DEVICE_ACCT['wall_s'] += _t_done - _t_start
        _DEVICE_ACCT['flop_logical'] += _flop_l
        _DEVICE_ACCT['flop_hw'] += _flop_h
        _DEVICE_ACCT['lane_iters'] += _iters_total
        _DEVICE_ACCT['calls'] += 1
    if _TELEMETRY:
        # per-lane convergence iterations: (kind, n_real, max over real
        # lanes, mean over real lanes). max/mean gap = gram FLOPs the
        # frozen-lane kernel skip recovers; padded lanes converge at ~1.
        shapes = [(kind, len(chunk),
                   int(np.max(np.asarray(it)[:len(chunk)])),
                   round(float(np.mean(np.asarray(it)[:len(chunk)])), 1))
                  for (kind, chunk, _), it in zip(pending, _its)]
        print(f'[solve_problems] n={len(problems)} calls={len(pending)} '
              f'dispatch={_t_fetch - _t_start:.3f}s fetch={_time.time() - _t_fetch:.3f}s '
              f'groups(kind,n,itmax,itmean)={shapes} '
              f'poly={sorted((pb, len(v)) for pb, v in poly_groups.items())} '
              f'dsm={sorted((k, len(v)) for k, v in dsm_groups.items())}',
              file=_sys.stderr, flush=True)
    for (kind, chunk, _), outs in zip(pending, fetched):
        if fetch == 'energy':
            f, bad = outs
            for j, i in enumerate(chunk):
                results[i] = ProblemResult(
                    params=None, energy=float(f[j]),
                    status='fallback' if bad[j] else 'optimal',
                    surface=None, fg=None, tag=problems[i].tag)
        elif kind.startswith('poly'):
            params, f, bad, fg = outs
            for j, i in enumerate(chunk):
                p = problems[i]
                results[i] = ProblemResult(
                    params=params[j], energy=float(f[j]),
                    status='fallback' if bad[j] else 'optimal',
                    surface=None, fg=unpack_fg(fg[j], p.n_pixels), tag=p.tag)
        else:
            params, f, bad, fg = outs
            for j, i in enumerate(chunk):
                p = problems[i]
                npix, k = p.n_pixels, p.n_deform
                results[i] = ProblemResult(
                    params=np.concatenate([params[j, :6], params[j, 6:6 + k]]),
                    energy=float(f[j]),
                    status='fallback' if bad[j] else 'optimal',
                    surface=None, fg=unpack_fg(fg[j], npix), tag=p.tag)

    # --- canonical re-solve of non-converged DSM lanes (see the
    # _CANONICAL_RESOLVE note at the top of the module). Truncated lanes'
    # energies are trajectory snapshots that depend on the program shape;
    # re-solving them at the FROZEN canonical shape makes them a pure
    # function of the problem, so production ladder/chunking changes stop
    # shifting discrete decisions. Composition/order independence is
    # measured (probe), so flagged lanes may share canonical chunks freely.
    flagged = []
    if _CANONICAL_RESOLVE:
        for (kind, chunk, _), (_it, conv) in zip(pending, _its_conv):
            if not kind.startswith('dsm'):
                continue  # truncated poly lanes measured bitwise B-invariant
            conv = np.asarray(conv)
            flagged += [i for j, i in enumerate(chunk)
                        if not conv[j] and i not in oversized]
    global _LAST_FLAGGED
    _LAST_FLAGGED = [problems[i].tag for i in flagged]  # test/debug aid
    if flagged:
        flagged.sort()
        t_canon = _time.time()
        canon_pending = []
        canon_shapes = []
        statics = (float(tol), float(smooth_amount), int(cutoff))
        groups = {}
        for i in flagged:
            p = problems[i]
            pc = _bucket(p.n_pixels, list(_CANONICAL_P_LADDER))
            kc = _bucket(max(p.n_deform, 1), list(_CANONICAL_K_LADDER))
            use_mask = mask_capable and p.fits_mask(pc)
            groups.setdefault((pc, kc, use_mask), []).append(i)
        for (pc, kc, use_mask), idxs in sorted(groups.items()):
            for cs in range(0, len(idxs), _CANONICAL_B):
                chunk = idxs[cs:cs + _CANONICAL_B]
                arrays = _dsm_chunk_arrays(chunk, pc, kc, _CANONICAL_B,
                                           use_mask, warm_tail_all=False)
                kind = 'dsm-m' if use_mask else 'dsm'
                if use_mask:
                    args = arrays[:6] + (denom,) + arrays[6:] \
                        + (float(epsilon), int(maxiter)) + statics
                    fn = _solve_dsm_packed_mask
                else:
                    args = arrays[:5] + (denom,) + arrays[5:] \
                        + (float(epsilon), int(maxiter)) + statics
                    fn = _solve_dsm_packed
                outs = aot.dispatch(kind, pc, kc, _CANONICAL_B, statics,
                                    fn, args)
                canon_pending.append((kind, chunk, outs))
                canon_shapes.append((kind, pc, kc, _CANONICAL_B) + statics)
        _record_shapes(canon_shapes)
        ix = _idx['dsm']
        if fetch == 'energy':
            sel2 = [(outs[ix['f']], outs[ix['bad']], outs[ix['it']])
                    for _, _, outs in canon_pending]
        else:
            sel2 = [(outs[0], outs[ix['f']], outs[ix['bad']],
                     outs[ix['fg']], outs[ix['it']])
                    for _, _, outs in canon_pending]
        timeout2 = None if any(s not in _WARM_SHAPES for s in canon_shapes) \
            else timeout
        try:
            fetched2 = _fetch_with_deadline(sel2, timeout2)
        except SolveTimeout:
            fetched2 = None
            if out is not None:
                out.write(f'{progress_line}: canonical re-solve deadline '
                          f'expired — {len(flagged)} lane(s) keep their '
                          f'batch-shape energies this round')
        except Exception:
            # same class as the production AOT-failure path: drop the
            # registry entries; the batch-shape results remain usable
            aot.drop(canon_shapes)
            fetched2 = None
            if out is not None:
                out.write(f'{progress_line}: canonical re-solve failed — '
                          f'{len(flagged)} lane(s) keep their batch-shape '
                          f'energies this round')
        if fetched2 is not None:
            _WARM_SHAPES.update(canon_shapes)
            _canon_flop_l = _canon_flop_h = 0.0
            _canon_iters = 0
            for (kind, chunk, _), outs2, shape in zip(canon_pending,
                                                      fetched2, canon_shapes):
                if fetch == 'energy':
                    f, bad, it = outs2
                    for j, i in enumerate(chunk):
                        results[i] = ProblemResult(
                            params=None, energy=float(f[j]),
                            status='fallback' if bad[j] else 'optimal',
                            surface=None, fg=None, tag=problems[i].tag)
                else:
                    params, f, bad, fg, it = outs2
                    for j, i in enumerate(chunk):
                        p = problems[i]
                        npix, k = p.n_pixels, p.n_deform
                        results[i] = ProblemResult(
                            params=np.concatenate([params[j, :6],
                                                   params[j, 6:6 + k]]),
                            energy=float(f[j]),
                            status='fallback' if bad[j] else 'optimal',
                            surface=None, fg=unpack_fg(fg[j], npix),
                            tag=p.tag)
                lane_iters = np.asarray(it)[:len(chunk)]
                fl, fh = _estimate_chunk_flops(kind, shape[1], shape[2],
                                               lane_iters)
                _canon_flop_l += fl
                _canon_flop_h += fh
                _canon_iters += int(np.sum(lane_iters))
            with _DEVICE_ACCT_LOCK:
                _DEVICE_ACCT['wall_s'] += _time.time() - t_canon
                _DEVICE_ACCT['flop_logical'] += _canon_flop_l
                _DEVICE_ACCT['flop_hw'] += _canon_flop_h
                _DEVICE_ACCT['lane_iters'] += _canon_iters
                _DEVICE_ACCT['canonical_lanes'] += len(flagged)
            if _TELEMETRY:
                print(f'[canonical] n={len(flagged)} '
                      f'calls={len(canon_pending)} '
                      f'groups={sorted((pc, kc, len(v)) for (pc, kc, _um), v in groups.items())} '
                      f'wall={_time.time() - t_canon:.3f}s',
                      file=_sys.stderr, flush=True)

    if oversized:
        from .solver import evaluate_foreground
        for i, (factor, orig) in oversized.items():
            res = results[i]
            res.energy = float(res.energy) * factor
            if fetch != 'energy':
                res.fg = evaluate_foreground(orig, res.params,
                                             float(smooth_amount), int(cutoff))

    return results
