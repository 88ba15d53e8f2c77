"""4K mosaic timing: a dense 4096x4096 synthetic nuclei field segmented
tile-by-tile (parallel/mosaic.py), one chip. Reproduces the round-2 scaling
measurement (docs/scaling.md) on the current code.

    python tools/mosaic_bench.py [size] [threads_per_device]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_mosaic(size=4096, cell=96, radius=16, seed=0):
    """Deterministic dense field: one nucleus per jittered grid cell."""
    rng = np.random.RandomState(seed)
    g = np.zeros((size, size), np.float32)
    rr, cc = np.indices((size, size))
    n = 0
    for r0 in range(cell // 2, size - cell // 2, cell):
        for c0 in range(cell // 2, size - cell // 2, cell):
            r = r0 + rng.randint(-cell // 4, cell // 4 + 1)
            c = c0 + rng.randint(-cell // 4, cell // 4 + 1)
            rad = radius * rng.uniform(0.8, 1.2)
            ecc = rng.uniform(0.8, 1.25)
            lo_r, hi_r = max(0, r - 3 * radius), min(size, r + 3 * radius)
            lo_c, hi_c = max(0, c - 3 * radius), min(size, c + 3 * radius)
            block_r = rr[lo_r:hi_r, lo_c:hi_c]
            block_c = cc[lo_r:hi_r, lo_c:hi_c]
            g[lo_r:hi_r, lo_c:hi_c] += rng.uniform(0.7, 1.0) * np.exp(
                -(((block_r - r) / ecc) ** 2 + ((block_c - c) * ecc) ** 2)
                / (2 * (rad * 0.55) ** 2)).astype(np.float32)
            n += 1
    g += rng.randn(size, size).astype(np.float32) * 0.02
    return g, n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.parallel.mosaic import process_mosaic
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output
    from superdsm_tpu.dsm.batching import warmup

    warmup()
    g, n_true = make_mosaic(size)
    cfg = Config({'AF_scale': 12})
    out = get_output(None).derive(muted=True)
    t0 = time.time()
    objects, n_tiles = process_mosaic(create_default_pipeline, cfg, g, out=out,
                                      threads_per_device=threads)
    dt = time.time() - t0
    print(f'{size}x{size} mosaic: {len(objects)} objects '
          f'({n_true} planted) in {dt:.1f}s over {n_tiles} tiles '
          f'= {dt / n_tiles:.1f} s/tile ({threads} threads/device)')


if __name__ == '__main__':
    main()
