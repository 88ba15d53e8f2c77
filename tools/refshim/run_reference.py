#!/usr/bin/env python
"""Run the UNMODIFIED reference implementation (/root/reference/superdsm) on
the synthetic regression dataset, producing ground-truth label maps.

The reference's heavy dependencies are unavailable here (cvxopt, ray,
scikit-image, MKL), so this runner fronts them with the shims in
``tools/refshim/sitepath`` — a serial ray, an independent damped-Newton
``cvxopt.solvers.cp`` (the reference uses cvxopt purely as a Newton engine on
an unconstrained convex problem, ``/root/reference/superdsm/dsm.py:488``),
and a numpy/scipy scikit-image subset.  The reference *algorithm code* runs
unmodified; only the solver engine and library primitives are substituted,
which for a convex program yields the same optimum.

Outputs (under ``tools/refshim/out/``):
  * ``seg/img-N.png``  — uint16 label maps (reference ground truth)
  * ``csv/img-N.png.csv`` — (size, cx, cy) summaries in the regression format
  * ``timings.json``   — wall-clock per image

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/refshim/run_reference.py [--images 0 1 2 3]
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

# Shims first so they win over any site-packages remnants; then the reference.
sys.path.insert(0, str(HERE / 'sitepath'))
sys.path.insert(1, str(REFERENCE))
sys.path.insert(2, str(REPO))

import numpy as np
import scipy.ndimage
import scipy.sparse

# numpy>=2 / scipy>=1.15 compatibility for the pinned-deps reference
if not hasattr(np, 'infty'):
    np.infty = np.inf
if not hasattr(scipy.ndimage, 'morphology'):
    scipy.ndimage.morphology = scipy.ndimage  # render.py:435


def _patch_mkl():
    """Replace the reference's raising MKL stubs (superdsm/_mkl.py) with
    scipy equivalents. MKL syrk returns a single triangle of A @ A.T
    (consumed transposed at dsm.py:371), so gram returns the upper one."""
    import superdsm._mkl
    import superdsm.dsm

    def dot(a, b, **kwargs):
        return a @ b

    def gram(a, **kwargs):
        return scipy.sparse.triu(a @ a.T).tocsr()

    superdsm._mkl.dot = dot
    superdsm._mkl.gram = gram
    superdsm.dsm.mkl_dot = dot
    superdsm.dsm.mkl_gram = gram


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--images', type=int, nargs='*', default=None)
    parser.add_argument('--dataset', default='synthetic',
                        help='examples/data/<dataset> (synthetic, '
                             'synthetic-glare, synthetic-dim)')
    parser.add_argument('--outdir', default=None)
    args = parser.parse_args()
    if args.images is None:
        args.images = list(range(4 if args.dataset == 'synthetic' else 3))
    if args.outdir is None:
        args.outdir = str(HERE / ('out' if args.dataset == 'synthetic'
                                  else f'out-{args.dataset}'))

    import superdsm.automation
    import superdsm.config
    import superdsm.io
    import superdsm.pipeline
    import superdsm.render
    _patch_mkl()

    outdir = pathlib.Path(args.outdir)
    (outdir / 'seg').mkdir(parents=True, exist_ok=True)
    (outdir / 'csv').mkdir(parents=True, exist_ok=True)
    (outdir / 'log').mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(REPO / 'tests' / 'regression'))
    from validate import summarize_label_map, save_csv

    pipeline = superdsm.pipeline.create_default_pipeline()
    # Match examples/synthetic/{task.json,default/task.json}
    base_cfg = superdsm.config.Config({
        'AF_scale': 12,
        'global-energy-minimization': {'AF_beta': 1.5},
    })

    timings = {}
    for image_id in args.images:
        img_path = REPO / 'examples' / 'data' / args.dataset / f'img-{image_id}.png'
        g_raw = superdsm.io.imread(str(img_path))
        print(f'[refshim] img-{image_id}: {g_raw.shape} {g_raw.dtype}',
              file=sys.stderr, flush=True)

        log_path = outdir / 'log' / f'img-{image_id}.txt'
        t0 = time.time()
        with open(log_path, 'w') as log, _redirect_stdout(log):
            data, cfg, _ = superdsm.automation.process_image(
                pipeline, superdsm.config.Config(base_cfg), g_raw)
            seg = superdsm.render.rasterize_labels(data)
        dt = time.time() - t0
        timings[f'img-{image_id}'] = dt

        seg = seg.astype(np.uint16)
        import PIL.Image
        PIL.Image.fromarray(seg, mode='I;16').save(outdir / 'seg' / f'img-{image_id}.png')
        rows = summarize_label_map(seg)
        save_csv(outdir / 'csv' / f'img-{image_id}.png.csv', rows)
        print(f'[refshim] img-{image_id}: {seg.max()} objects in {dt:.1f}s',
              file=sys.stderr, flush=True)

    with open(outdir / 'timings.json', 'w') as fp:
        json.dump(timings, fp, indent=2)
    print('[refshim] done', file=sys.stderr)


class _redirect_stdout:
    def __init__(self, target):
        self.target = target

    def __enter__(self):
        self._old = sys.stdout
        sys.stdout = self.target

    def __exit__(self, *exc):
        sys.stdout = self._old


if __name__ == '__main__':
    main()
