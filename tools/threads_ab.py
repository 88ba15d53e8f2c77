"""A/B the pipelined-throughput thread count on the real chip (same-session
comparison — tunnel mood makes cross-session numbers incomparable)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.parallel.pipelined import process_images_pipelined
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output
    from superdsm_tpu.dsm.batching import warmup

    warmup()
    cfg = Config({'AF_scale': 12})
    out = get_output(None).derive(muted=True)
    images = [bench.make_image(seed)[0] for seed in range(7)]
    # warm-in rep
    process_images_pipelined(create_default_pipeline, cfg, images,
                             threads=3, out=out)
    results = {}
    for threads in (2, 3, 4, 6, 3):  # repeat 3 to bracket tunnel drift
        reps = []
        for _ in range(2):
            t0 = time.time()
            process_images_pipelined(create_default_pipeline, cfg, images,
                                     threads=threads, out=out)
            reps.append((time.time() - t0) / len(images))
        results.setdefault(threads, []).extend(reps)
        print(f'threads={threads}: {["%.2f" % r for r in reps]} s/image')
    print({k: round(float(np.median(v)), 3) for k, v in results.items()})


if __name__ == '__main__':
    main()
