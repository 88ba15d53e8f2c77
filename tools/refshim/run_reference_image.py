#!/usr/bin/env python
"""Run the UNMODIFIED reference implementation on ONE real grayscale image
(same-input comparison harness; generalizes ``run_reference_bbbc033.py``).

Shares the shim stack of ``run_reference.py`` (serial ray, damped-Newton
cvxopt, numpy/PIL skimage subset); see that module's docstring. Scale
estimation is pinned via ``--scale`` (the shim stack does not cover
skimage's integral-image blob internals), so the comparison isolates
everything downstream of scale estimation.

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/refshim/run_reference_image.py \
        <input.png> --scale 42.43 --out out-nih3t3
"""

import argparse
import json
import os
import pathlib
import sys
import time

os.environ.setdefault('MPLBACKEND', 'Agg')

HERE = pathlib.Path(__file__).parent
REPO = HERE.parents[1]
REFERENCE = pathlib.Path('/root/reference')

sys.path.insert(0, str(HERE / 'sitepath'))
sys.path.insert(1, str(REFERENCE))
sys.path.insert(2, str(REPO))

import numpy as np
import scipy.ndimage
import scipy.sparse

if not hasattr(np, 'infty'):
    np.infty = np.inf
if not hasattr(scipy.ndimage, 'morphology'):
    scipy.ndimage.morphology = scipy.ndimage

from run_reference import _patch_mkl, _redirect_stdout


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('input', type=pathlib.Path)
    parser.add_argument('--scale', type=float, required=True,
                        help='pinned AF_scale (see module docstring)')
    parser.add_argument('--out', default='out-image',
                        help='output dir name under tools/refshim/')
    args = parser.parse_args()

    import PIL.Image
    import superdsm.automation
    import superdsm.config
    import superdsm.pipeline
    import superdsm.render
    _patch_mkl()

    outdir = HERE / args.out
    (outdir / 'seg').mkdir(parents=True, exist_ok=True)
    (outdir / 'csv').mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(REPO / 'tests' / 'regression'))
    from validate import summarize_label_map, save_csv

    g_raw = np.array(PIL.Image.open(args.input)).astype(np.float64)
    name = args.input.name
    print(f'[refshim-image] input {name} {g_raw.shape}', file=sys.stderr,
          flush=True)

    pipeline = superdsm.pipeline.create_default_pipeline()
    base_cfg = superdsm.config.Config({'AF_scale': args.scale})
    t0 = time.time()
    log_path = outdir / 'log.txt'
    with open(log_path, 'w') as log, _redirect_stdout(log):
        data, cfg, _ = superdsm.automation.process_image(
            pipeline, base_cfg, g_raw)
        seg = superdsm.render.rasterize_labels(data)
    dt = time.time() - t0

    seg = seg.astype(np.uint16)
    PIL.Image.fromarray(seg).save(outdir / 'seg' / name)
    rows = summarize_label_map(seg)
    save_csv(outdir / 'csv' / f'{name}.csv', rows)
    with open(outdir / 'timings.json', 'w') as fp:
        json.dump({name: dt}, fp)
    print(f'[refshim-image] {seg.max()} objects in {dt:.1f}s',
          file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
