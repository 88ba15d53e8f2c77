#!/usr/bin/env python
"""Instrumented warm-latency measurement for the real 1024x1344 BBBC033
frame (VERDICT r4 item 1: warm run < 25 s with a stage split).

Method: one process; the big-bucket solver programs are warmed upfront
(``warmup(include_large=True)`` — the shipped ``warmup_shapes_large.json``
tier), one unmeasured pass absorbs the remaining per-process program loads
(preprocess/DoH shapes), then N measured reps report the per-phase split:
scale estimation (``create_config``), the four pipeline stages, and
rasterization. Prints one JSON line.

Usage::

    python tools/bbbc033_latency.py [--reps 3]
"""

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

INPUT_PNG = pathlib.Path(
    '/root/reference/tests/expected/render.normalize_image/bbbc033-z28.png')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import numpy as np
    import PIL.Image
    import superdsm_tpu.automation
    import superdsm_tpu.config
    import superdsm_tpu.pipeline
    import superdsm_tpu.render
    from superdsm_tpu.dsm.batching import warmup
    from superdsm_tpu.output import get_output

    g_raw = np.array(PIL.Image.open(INPUT_PNG)).astype(np.float64)
    out = get_output(None).derive(muted=True)
    pipeline = superdsm_tpu.pipeline.create_default_pipeline()

    t0 = time.time()
    stats = warmup(include_large=True, compile_only=True)
    warm_compile_s = time.time() - t0

    def run():
        t0 = time.time()
        cfg, scale = superdsm_tpu.automation.create_config(
            pipeline, superdsm_tpu.config.Config(), g_raw)
        t1 = time.time()
        data, _, timings = pipeline.process_image(g_raw, cfg=cfg, out=out)
        t2 = time.time()
        seg = superdsm_tpu.render.rasterize_labels(data)
        t3 = time.time()
        split = {'create_config': round(t1 - t0, 2)}
        split.update({k: round(v, 2) for k, v in timings.items()})
        split['rasterize'] = round(t3 - t2, 2)
        return t3 - t0, split, int(seg.max())

    t0 = time.time()
    _, _, n0 = run()  # unmeasured: per-process program loads
    warm_pass_s = time.time() - t0

    reps, splits = [], []
    for _ in range(args.reps):
        dt, split, n = run()
        assert n == n0, 'object count changed between reps'
        reps.append(round(dt, 2))
        splits.append(split)
    med = sorted(reps)[len(reps) // 2]
    print(json.dumps({
        'metric': 'bbbc033_warm_sec_per_frame',
        'value': med,
        'unit': 's',
        'reps': reps,
        'objects': n0,
        'stage_split_median_rep': splits[reps.index(med)],
        'warmup_compile_s': round(warm_compile_s, 1),
        'warm_pass_s': round(warm_pass_s, 1),
        'n_warm_programs': stats['n_programs'],
    }))


if __name__ == '__main__':
    main()
