"""Profile one dense 1024x1024 mosaic tile end to end (one chip, warm).

CLAUDE.md round-3 dense-tile profile: per-tile cost is dominated by fixed
costs (gem device fetch, c2f host). This script isolates ONE tile from the
4K mosaic bench field and prints the per-stage wall clock plus the solver
telemetry, so device vs host and per-bucket costs are attributable.

    SDSM_SOLVE_TELEMETRY=1 python tools/profile_dense_tile.py [tile_row] [tile_col]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mosaic_bench import make_mosaic  # noqa: E402


def main():
    tr = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    tc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.dsm.batching import warmup

    warmup()
    g, _ = make_mosaic(4096)
    halo = 160
    r0, c0 = tr * 1024, tc * 1024
    sel = (slice(max(0, r0 - halo), min(4096, r0 + 1024 + halo)),
           slice(max(0, c0 - halo), min(4096, c0 + 1024 + halo)))
    tile = g[sel].copy()
    cfg = Config({'AF_scale': 12})

    pipeline = create_default_pipeline()
    for rep in range(3):
        t0 = time.time()
        # automation.process_image: the same entry point process_mosaic
        # uses — AF_scale expands into the scale-derived stage parameters
        # there (Pipeline.process_image would silently run hard defaults)
        data, _, timings = process_image(pipeline, cfg.copy(), tile)
        dt = time.time() - t0
        stages = {k: round(v, 2) for k, v in sorted(
            timings.items(), key=lambda kv: -kv[1])}
        print(f'rep {rep}: {dt:.2f}s total, '
              f'{len(data["postprocessed_objects"])} objects, '
              f'stages {stages}')


if __name__ == '__main__':
    main()
