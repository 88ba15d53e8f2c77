#!/usr/bin/env python
"""Tunnel-independent solver benchmark (VERDICT r2 item 3).

Runs the full default pipeline on fixed-seed synthetic nuclei fields using
the LOCAL CPU backend — no remote-TPU tunnel in the loop — so run-to-run
variance is a few percent and a genuine solver regression (more Newton
iterations, slower packing, extra rounds) moves the number reproducibly.
The images are smaller than the bench fields to keep the proxy under a
minute; every solver code path (c2f rounds, bucketed packed solves, warm
generations, postprocessing) still executes.

Prints one JSON line: {"cpu_proxy_sec_per_image": p50, "reps": [...]}.

Must run in a subprocess with a CPU-forced environment
(PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu); ``bench.py`` does this.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

# persistent CPU compile cache (same one the test suite uses) so the proxy
# measures execution, not XLA compilation
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      str(pathlib.Path(__file__).parents[1] / '.jax_cache_cpu'))


def main():
    import numpy as np
    from bench import make_image
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output

    pipeline = create_default_pipeline()
    base_cfg = Config({'AF_scale': 12})
    out = get_output(None).derive(muted=True)

    images = [make_image(seed, H=260, W=348, n_nuclei=8)[0] for seed in (0, 1, 2)]
    # warmup sweep: compiles (or cache-loads) every program
    for g in images:
        process_image(pipeline, base_cfg, g, out=out)

    # per-image cost varies legitimately across the fixed seeds, so the
    # repetition unit is a full sweep over all images (total / n), which is
    # stable run-to-run when executed serially
    reps = []
    for _ in range(3):
        t0 = time.time()
        for g in images:
            process_image(pipeline, base_cfg, g, out=out)
        reps.append((time.time() - t0) / len(images))
    print(json.dumps({
        'cpu_proxy_sec_per_image': round(float(np.median(reps)), 3),
        'reps': [round(r, 3) for r in reps],
    }))


if __name__ == '__main__':
    main()
