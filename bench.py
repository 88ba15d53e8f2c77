"""Benchmark: full-pipeline seconds/image on a BBBC039-like synthetic field.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

The reference publishes no absolute numbers (BASELINE.md); the north-star
target from BASELINE.json is "full BBBC039 image segmented in < 2 s p50 on
one v5e chip". BBBC039 images are 520x696 U2OS nuclei fields; without
dataset egress the benchmark uses a synthetic field of comparable size,
density, and clustering (touching nuclei force multi-atom clusters, which
exercise the generation loop — the dominant cost). ``vs_baseline`` is
``2.0 / p50_seconds`` (>1 means faster than the target).
"""

import json
import os
import sys
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
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def _arm_tunnel_watchdog():
    """The TPU sits behind a shared remote tunnel that can wedge outright
    (observed: a tiny matmul round trip blocked > 2 min, warmup program
    loads blocked > 19 min with zero CPU progress). The benchmark has no
    other abort path — a blocked RPC is uninterruptible from Python — so a
    daemon timer emits a tunnel-independent CPU-proxy fallback line and
    exits rather than hanging the driver forever. Deadline is generous
    (default 2700 s) because a fresh machine legitimately pays a multi-minute
    cold compile + server-serialized program-load wave on the first run."""
    import threading
    deadline_s = float(os.environ.get('SDSM_BENCH_DEADLINE', 2700))
    if deadline_s <= 0:
        return None

    def fire():
        cpu_proxy = _run_cpu_proxy()
        proxy_val = None if cpu_proxy is None else cpu_proxy['cpu_proxy_sec_per_image']
        result = {
            'metric': 'cpu_proxy_sec_per_image_FALLBACK_tunnel_wedged',
            'value': -1.0 if proxy_val is None else round(proxy_val, 2),
            'unit': 's',
            # vs the first-recorded CPU-proxy figure (15.6 s/image, round 3),
            # since the 2 s TPU north star is not comparable to a CPU run
            'vs_baseline': 0.0 if proxy_val is None else round(15.6 / proxy_val, 3),
            'cpu_proxy_sec_per_image': proxy_val,
        }
        print(json.dumps(result), flush=True)
        print(f'# TPU tunnel wedged: benchmark exceeded the {deadline_s:.0f}s '
              f'deadline with the remote unresponsive; emitted the CPU-proxy '
              f'fallback instead of hanging', file=sys.stderr, flush=True)
        os._exit(2)

    timer = threading.Timer(deadline_s, fire)
    timer.daemon = True
    timer.start()
    return timer


def main():
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output

    watchdog = _arm_tunnel_watchdog()

    pipeline = create_default_pipeline()
    base_cfg = Config({'AF_scale': 12})
    out = get_output(None).derive(muted=True)

    n_images = int(os.environ.get('SDSM_BENCH_IMAGES', 7))
    # pre-compile the solver shape buckets (threaded), then run one warmup
    # image to cover the remaining programs (preprocessing, renders)
    from superdsm_tpu.dsm.batching import warmup
    t0 = time.time()
    warmup_stats = warmup()
    # two unmeasured images: the first covers lazily-compiled programs, the
    # second absorbs the tunnel's warm-in decay (first dispatches after a
    # compile burst run ~30-50% slow)
    for warm_seed in (999, 998):
        g_warm, _ = make_image(warm_seed)
        process_image(pipeline, base_cfg, g_warm, out=out)
    warmup_s = time.time() - t0
    warmup_detail = (f"solver compile {warmup_stats['compile_s']:.1f}s, "
                     f"device load+run {warmup_stats['load_s']:.1f}s over "
                     f"{warmup_stats['n_programs']} programs, "
                     f"warm images {warmup_s - warmup_stats['wall_s']:.1f}s")

    # latency: single image, sequential
    lat_times = []
    total_objects = 0
    for seed in range(n_images):
        g, n_true = make_image(seed)
        t0 = time.time()
        data, _, _ = process_image(pipeline, base_cfg, g, out=out)
        lat_times.append(time.time() - t0)
        total_objects += len(data['postprocessed_objects'])

    # throughput: the batch-processing path overlaps host combinatorics with
    # device solves across images (superdsm_tpu.parallel.pipelined)
    from superdsm_tpu.parallel.pipelined import process_images_pipelined
    from superdsm_tpu.pipeline import create_default_pipeline
    n_throughput = max(n_images, 6)
    images = [make_image(seed)[0] for seed in range(n_throughput)]
    reps = []
    for _ in range(6):
        t0 = time.time()
        process_images_pipelined(create_default_pipeline, base_cfg, images,
                                 threads=3, out=out)
        reps.append((time.time() - t0) / n_throughput)
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

    if watchdog is not None:
        watchdog.cancel()
    cpu_proxy = _run_cpu_proxy()

    result = {
        'metric': 'bbbc039like_sec_per_image_batch',
        'value': round(throughput, 3),
        'unit': 's',
        'vs_baseline': round(2.0 / throughput, 3),
        'sec_per_image_min': round(throughput_min, 3),
        'sec_per_image_median': round(throughput, 3),
        'latency_p50': round(float(np.median(lat_times)), 3),
        'warmup_s': round(warmup_s, 1),
        'cpu_proxy_sec_per_image': None if cpu_proxy is None
            else cpu_proxy['cpu_proxy_sec_per_image'],
    }
    print(json.dumps(result))
    print(f'# warmup {warmup_s:.1f}s ({warmup_detail}); '
          f'latency p50 {np.median(lat_times):.2f}s min {np.min(lat_times):.2f}s '
          f'{["%.2f" % t for t in lat_times]}; '
          f'throughput reps {["%.2f" % r for r in reps]} '
          f'(median-after-first {throughput:.2f}, min {throughput_min:.2f}); '
          f'cpu proxy {cpu_proxy}; '
          f'objects/image ~{total_objects / max(1, n_images):.1f}', file=sys.stderr)


if __name__ == '__main__':
    main()
