#!/usr/bin/env python
"""Run the UNMODIFIED reference implementation on the BBBC033 z=28 slice's
normalized rendering — the SAME input our pipeline's real-image regression
uses (``tests/regression/run_bbbc033.py``) — so the two implementations can
be compared on identical pixels, isolating solver/library differences from
the input-quantization differences against the shipped raw-input golden.

Shares the shim stack of ``run_reference.py`` (serial ray, damped-Newton
cvxopt, numpy/PIL skimage subset); see that module's docstring.

Outputs under ``tools/refshim/out-bbbc033/``:
  * ``seg/bbbc033-z28.png``      — uint16 label map
  * ``csv/bbbc033-z28.png.csv``  — (size, cx, cy) regression summary

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/refshim/run_reference_bbbc033.py
"""

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

INPUT_PNG = REFERENCE / 'tests/expected/render.normalize_image/bbbc033-z28.png'


def main():
    import PIL.Image
    import superdsm.automation
    import superdsm.config
    import superdsm.pipeline
    import superdsm.render
    _patch_mkl()

    outdir = HERE / 'out-bbbc033'
    (outdir / 'seg').mkdir(parents=True, exist_ok=True)
    (outdir / 'csv').mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(REPO / 'tests' / 'regression'))
    from validate import summarize_label_map, save_csv

    g_raw = np.array(PIL.Image.open(INPUT_PNG)).astype(np.float64)
    print(f'[refshim-bbbc033] input {g_raw.shape}', file=sys.stderr, flush=True)

    pipeline = superdsm.pipeline.create_default_pipeline()
    # The shim stack does not cover skimage's integral-image blob internals,
    # so scale estimation is pinned to the value our estimator computes on
    # this image (superdsm_tpu.automation._estimate_scale -> 39.2837...);
    # both implementations then run the identical auto-configuration, and
    # the comparison isolates everything downstream of scale estimation.
    base_cfg = superdsm.config.Config({'AF_scale': 39.28371006591931})
    t0 = time.time()
    log_path = outdir / 'log.txt'
    with open(log_path, 'w') as log, _redirect_stdout(log):
        data, cfg, _ = superdsm.automation.process_image(
            pipeline, base_cfg, g_raw)
        seg = superdsm.render.rasterize_labels(data)
    dt = time.time() - t0

    seg = seg.astype(np.uint16)
    PIL.Image.fromarray(seg).save(outdir / 'seg' / 'bbbc033-z28.png')
    rows = summarize_label_map(seg)
    save_csv(outdir / 'csv' / 'bbbc033-z28.png.csv', rows)
    with open(outdir / 'timings.json', 'w') as fp:
        json.dump({'bbbc033-z28': dt}, fp)
    print(f'[refshim-bbbc033] {seg.max()} objects in {dt:.1f}s',
          file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
