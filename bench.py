"""Benchmark: full-pipeline seconds/image on a BBBC039-like synthetic field.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline", ...}``.

The reference publishes no absolute numbers (BASELINE.md); the north-star
target from BASELINE.json is "full BBBC039 image segmented in < 2 s p50 on
one v5e chip". BBBC039 images are 520x696 U2OS nuclei fields; without
dataset egress the benchmark uses a synthetic field of comparable size,
density, and clustering (touching nuclei force multi-atom clusters, which
exercise the generation loop — the dominant cost). ``vs_baseline`` is
``2.0 / median_seconds`` (>1 means faster than the target).

Warmup policy (VERDICT r3 item 4): the blocking cost before measurement is
kept minimal and honestly attributed. Phase 1 compiles every shipped solver
program WITHOUT dispatching (threaded; with warm AOT sidecars this is
seconds). Then one unmeasured pass over exactly the images that will be
measured pays the server-side program loads for exactly the shapes the
measurement will dispatch — shapes the bench never uses are never loaded.
``warmup_blocking_s`` reports what actually delayed the first measured rep.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_image(seed, H=520, W=696, n_nuclei=28, radius=16):
    """Synthetic fluorescence nuclei field with touching pairs."""
    rng = np.random.RandomState(seed)
    g = np.zeros((H, W), np.float32)
    rr, cc = np.indices((H, W))
    centers = []
    attempts = 0
    while len(centers) < n_nuclei and attempts < 2000:
        attempts += 1
        r0 = rng.randint(radius, H - radius)
        c0 = rng.randint(radius, W - radius)
        # allow some touching pairs (min separation 1.4 r instead of 2.5 r)
        if all((r0 - r) ** 2 + (c0 - c) ** 2 > (1.4 * radius) ** 2 for r, c in centers):
            centers.append((r0, c0))
    for (r0, c0) in centers:
        rad = radius * rng.uniform(0.8, 1.2)
        ecc = rng.uniform(0.8, 1.25)
        g += rng.uniform(0.7, 1.0) * np.exp(
            -(((rr - r0) / ecc) ** 2 + ((cc - c0) * ecc) ** 2) / (2 * (rad * 0.55) ** 2))
    g += rng.randn(H, W).astype(np.float32) * 0.02
    return g.astype(np.float32), len(centers)


def _run_cpu_proxy():
    """Tunnel-independent solver metric: full pipeline on the local CPU
    backend in a subprocess (see tools/cpu_proxy_bench.py). Stable to a few
    percent run-to-run, so solver regressions are detectable regardless of
    tunnel mood."""
    import subprocess
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          'tools', 'cpu_proxy_bench.py')],
            env=env, capture_output=True, text=True, timeout=900)
        for line in proc.stdout.splitlines():
            if line.startswith('{'):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError, OSError):
        pass
    return None


def _trim_spikes(times, rerun, factor=5.0, max_reruns=2):
    """Spike-robust latency population (VERDICT r3 item 5).

    The shared tunnel occasionally wedges ONE rep for ~10 s on unchanged
    code (BENCH_r03 latency reps carried a 10.54 s spike in the raw p50
    population). A rep exceeding ``factor`` x the population median is
    re-measured once via ``rerun(i)`` and the better of the two readings
    enters the trimmed population; the raw readings are kept for the raw
    metric. Returns ``(trimmed_times, n_spikes)``.
    """
    med = float(np.median(times))
    trimmed = list(times)
    n_spikes = 0
    for i, t in enumerate(times):
        if med > 0 and t > factor * med and n_spikes < max_reruns:
            n_spikes += 1
            trimmed[i] = min(t, rerun(i))
    return trimmed, n_spikes


class _TunnelWatchdog:
    """Abort path for an outright tunnel wedge.

    The TPU sits behind a shared remote tunnel that can wedge (observed: a
    tiny matmul round trip blocked > 2 min, warmup program loads blocked
    > 19 min with zero CPU progress). A blocked RPC is uninterruptible from
    Python, so a daemon timer emits a tunnel-independent CPU-proxy fallback
    line and exits 2 rather than hanging the driver forever.

    The timer is PROGRESS-BASED (ADVICE r3): :meth:`pet` re-arms the
    deadline after each completed phase/rep, so a legitimately slow
    cold-machine compile wave only needs each *step* to finish within the
    deadline, while a true wedge (no step completing) still fires.
    :meth:`complete` permanently disarms; the completion flag is checked
    under a lock immediately before the fallback line is printed, so a
    bench finishing while ``_fire`` is mid-flight can neither produce two
    JSON lines nor an exit(2) after the real result line.
    """

    def __init__(self, deadline_s):
        self._deadline = deadline_s
        self._lock = threading.Lock()
        self._completed = False
        self._timer = None
        # Generation counter (ADVICE r4): Timer.cancel() cannot stop a
        # timer whose callback already started, so _fire captures the
        # generation it was armed with and aborts if a pet() happened
        # since — a rep completing just as the deadline expires must not
        # exit(2) a progressing bench.
        self._generation = 0
        self.pet()

    def pet(self):
        with self._lock:
            if self._completed:
                return
            if self._timer is not None:
                self._timer.cancel()
            self._generation += 1
            self._timer = threading.Timer(
                self._deadline, self._fire, args=(self._generation,))
            self._timer.daemon = True
            self._timer.start()

    def complete(self):
        with self._lock:
            self._completed = True
            if self._timer is not None:
                self._timer.cancel()

    # backwards-compatible alias (old call sites used timer.cancel())
    cancel = complete

    def _fire(self, generation):
        with self._lock:
            if self._completed or generation != self._generation:
                return
        # The proxy run takes minutes — outside the lock, and guarded: a
        # failure here must still end in os._exit(2), never a silent dead
        # timer thread that resumes the hang (ADVICE r3 medium).
        try:
            proxy = _run_cpu_proxy()
            proxy_val = None if proxy is None \
                else proxy.get('cpu_proxy_sec_per_image')
        except Exception:
            proxy_val = None
        with self._lock:
            if self._completed or generation != self._generation:
                return  # bench progressed/finished while the proxy ran
            self._completed = True
        try:
            result = {
                'metric': 'cpu_proxy_sec_per_image_FALLBACK_tunnel_wedged',
                'value': -1.0 if proxy_val is None else round(proxy_val, 2),
                'unit': 's',
                # vs the first-recorded CPU-proxy figure (15.6 s/image,
                # round 3), since the 2 s TPU north star is not comparable
                # to a CPU run
                'vs_baseline': 0.0 if proxy_val is None
                    else round(15.6 / proxy_val, 3),
                'cpu_proxy_sec_per_image': proxy_val,
            }
            print(json.dumps(result), flush=True)
            print(f'# TPU tunnel wedged: no benchmark step completed within '
                  f'the {self._deadline:.0f}s deadline with the remote '
                  f'unresponsive; emitted the CPU-proxy fallback instead of '
                  f'hanging', file=sys.stderr, flush=True)
        except Exception:
            pass
        os._exit(2)


def _slow_gates_fresh():
    """True iff the slow-gate stamp vouches for exactly this source tree."""
    try:
        from superdsm_tpu._gatestamp import is_fresh, staleness_message
        fresh, _stamp = is_fresh()
        if not fresh:
            print(f'# {staleness_message()}', file=sys.stderr, flush=True)
        return fresh
    except Exception:
        return False


def _arm_tunnel_watchdog():
    deadline_s = float(os.environ.get('SDSM_BENCH_DEADLINE', 2700))
    if deadline_s <= 0:
        return None
    return _TunnelWatchdog(deadline_s)


def main():
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output

    watchdog = _arm_tunnel_watchdog()

    def pet():
        if watchdog is not None:
            watchdog.pet()

    # optional multi-chip surface (SUPERDSM_TPU_MESH, e.g. 'batch:4'); no-op
    # on the single-chip bench default
    from superdsm_tpu.parallel.mesh import apply_env_mesh
    apply_env_mesh()

    pipeline = create_default_pipeline()
    base_cfg = Config({'AF_scale': 12})
    out = get_output(None).derive(muted=True)

    n_images = int(os.environ.get('SDSM_BENCH_IMAGES', 7))
    n_throughput = max(n_images, 6)
    images = [make_image(seed) for seed in range(n_throughput)]

    # --- warmup (blocking): compile-only over the shipped shapes, then one
    # unmeasured pass over exactly the images measurement will use (pays the
    # tunnel-serialized program loads for exactly the dispatched shapes, and
    # absorbs the tunnel warm-in — first dispatches after a compile burst
    # run ~30-50% slow)
    from superdsm_tpu.dsm.batching import warmup
    t0 = time.time()
    warmup_stats = warmup(compile_only=True)
    pet()
    t_compiled = time.time()
    for g, _ in images:
        process_image(pipeline, base_cfg, g, out=out)
        pet()
    warmup_blocking_s = time.time() - t0
    warm_pass_s = time.time() - t_compiled
    warmup_detail = (
        f"program compile+deserialize {warmup_stats['wall_s']:.1f}s wall over "
        f"{warmup_stats['n_programs']} programs "
        f"(thread-s: XLA compile {warmup_stats['compile_thread_s']:.1f}, "
        f"AOT sidecar load {warmup_stats['aot_deserialize_thread_s']:.1f}), "
        f"warm pass {warm_pass_s:.1f}s over {len(images)} images")

    # --- latency: single image, sequential
    def measure(i):
        t0 = time.time()
        data, _, timings = process_image(pipeline, base_cfg, images[i][0], out=out)
        dt = time.time() - t0
        pet()
        return dt, data, timings

    from superdsm_tpu.dsm.batching import device_accounting
    acct0 = device_accounting()
    lat_times = []
    stage_acc = {}
    total_objects = 0
    for i in range(n_images):
        dt, data, timings = measure(i)
        lat_times.append(dt)
        total_objects += len(data['postprocessed_objects'])
        for name, t in timings.items():
            stage_acc[name] = stage_acc.get(name, 0.0) + t
    acct1 = device_accounting()
    # device utilization over the latency phase (VERDICT r4 item 5):
    # device-path wall (pack+dispatch+fetch incl. tunnel latency — an upper
    # bound on device-busy) over total wall, and estimated solver FLOPs vs
    # one v5e chip's bf16 peak (197 TFLOP/s); method in docs/scaling.md
    _dev_wall = acct1['wall_s'] - acct0['wall_s']
    _dev_flop_hw = acct1['flop_hw'] - acct0['flop_hw']
    device_busy_frac = _dev_wall / max(1e-9, sum(lat_times))
    mfu_est = _dev_flop_hw / max(1e-9, _dev_wall) / 197e12
    lat_trimmed, n_lat_spikes = _trim_spikes(lat_times,
                                             lambda i: measure(i)[0])
    stage_split = {name: round(t / n_images, 3)
                   for name, t in stage_acc.items()}

    # --- throughput: the batch-processing path overlaps host combinatorics
    # with device solves across images (superdsm_tpu.parallel.pipelined)
    from superdsm_tpu.parallel.pipelined import process_images_pipelined
    imgs = [g for g, _ in images]
    reps = []
    for _ in range(6):
        t0 = time.time()
        process_images_pipelined(create_default_pipeline, base_cfg, imgs,
                                 threads=3, out=out)
        reps.append((time.time() - t0) / n_throughput)
        pet()
    # The TPU sits behind a SHARED remote tunnel whose ambient load swings
    # measured times by >2x for identical code within hours (same-day
    # same-commit medians: 1.9 and 4.1 s/image). The first repetition absorbs
    # the post-warmup tunnel warm-in and is excluded; the HEADLINE is the
    # median of the remaining repetitions (a min-of-N headline cannot detect
    # a 20% regression under this variance — ADVICE r2), with the min
    # reported alongside as the dedicated-hardware capability estimate
    # (contention is strictly additive).
    steady = reps[1:]
    throughput = float(np.median(steady))
    throughput_min = float(np.min(steady))

    objects_per_image = total_objects / max(1, n_images)
    if watchdog is not None:
        watchdog.complete()
    cpu_proxy = _run_cpu_proxy()

    result = {
        'metric': 'bbbc039like_sec_per_image_batch',
        'value': round(throughput, 3),
        'unit': 's',
        'vs_baseline': round(2.0 / throughput, 3),
        'sec_per_image_min': round(throughput_min, 3),
        'sec_per_image_median': round(throughput, 3),
        'latency_p50': round(float(np.median(lat_times)), 3),
        'latency_p50_trimmed': round(float(np.median(lat_trimmed)), 3),
        'latency_spikes_rerun': n_lat_spikes,
        'objects_per_sec': round(objects_per_image / throughput, 2),
        'objects_per_image': round(objects_per_image, 1),
        'stage_split_latency_s': stage_split,
        'device_busy_frac': round(device_busy_frac, 3),
        'mfu_est': round(mfu_est, 4),
        'warmup_s': round(warmup_blocking_s, 1),
        'warmup_blocking_s': round(warmup_blocking_s, 1),
        # attribution: compile is client-side (seconds, AOT sidecars);
        # the warm pass is dominated by tunnel-serialized SERVER-side
        # program loads every fresh process pays on first dispatch —
        # not compile time (the historical mislabel), and not removable
        # client-side (measured: threads/AOT change nothing, CLAUDE.md)
        'warmup_compile_s': round(warmup_stats['wall_s'], 1),
        'warmup_warm_pass_s': round(warm_pass_s, 1),
        'cpu_proxy_sec_per_image': None if cpu_proxy is None
            else cpu_proxy['cpu_proxy_sec_per_image'],
        # do the slow quality gates (tools/run_slow_gates.py) vouch for
        # exactly this source tree? (VERDICT r4 item 7)
        'slow_gates_fresh': _slow_gates_fresh(),
    }
    print(json.dumps(result))
    print(f'# warmup blocking {warmup_blocking_s:.1f}s ({warmup_detail}); '
          f'latency p50 {np.median(lat_times):.2f}s '
          f'trimmed {np.median(lat_trimmed):.2f}s min {np.min(lat_times):.2f}s '
          f'{["%.2f" % t for t in lat_times]}; '
          f'throughput reps {["%.2f" % r for r in reps]} '
          f'(median-after-first {throughput:.2f}, min {throughput_min:.2f}); '
          f'stage split {stage_split}; '
          f'cpu proxy {cpu_proxy}; '
          f'objects/image ~{objects_per_image:.1f}', file=sys.stderr)


if __name__ == '__main__':
    main()
