#!/usr/bin/env python
"""Second real-image regression: an NIH3T3 fibroblast frame with heavy
glare (VERDICT r4 item 8 — exercises the saturated-spot/glare handling the
synthetic fields and the BBBC033 slice do not).

Input: ``tests/regression/data/nih3t3-glare.png`` — the grayscale panel
(columns 3:310) extracted from the reference's orphaned docs figure
``/root/reference/docs/source/glare_detection.png``: a real 410x307
NIH3T3 microscopy crop where 14.8% of the pixels are saturated (glare).
It is the only other real-image artifact recoverable from the reference
repository (audit in VALIDATION.md).

Truth (two checks; unlike BBBC033 there is no shipped golden label map for
this image, so the primary leg is the same-input reference comparison):

1. The UNMODIFIED reference's segmentation of the SAME pixels via the
   refshim (``tools/refshim/run_reference_image.py``), committed under
   ``tests/regression/expected/reference-nih3t3/``. Measured (2026-08-20,
   CPU): 5/5 objects matched at (3 px, 10%), fg Dice 0.9997.
2. Our committed goldens (self-regression, standard matcher).

Usage::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/regression/run_nih3t3.py [--update-expected]
"""

import argparse
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parents[2]
sys.path.insert(0, str(REPO))

INPUT_PNG = REPO / 'tests/regression/data/nih3t3-glare.png'
EXPECTED = REPO / 'tests/regression/expected/nih3t3'
REF_SEG_PNG = (REPO / 'tests/regression/expected/reference-nih3t3'
               / 'seg' / 'nih3t3-glare.png')


def segment(out=None):
    import PIL.Image
    import superdsm_tpu.automation
    import superdsm_tpu.config
    import superdsm_tpu.pipeline
    import superdsm_tpu.render
    from superdsm_tpu.output import get_output

    g_raw = np.array(PIL.Image.open(INPUT_PNG)).astype(np.float64)
    pipeline = superdsm_tpu.pipeline.create_default_pipeline()
    data, cfg, timings = superdsm_tpu.automation.process_image(
        pipeline, superdsm_tpu.config.Config(), g_raw,
        out=get_output(out).derive(muted=True))
    seg = superdsm_tpu.render.rasterize_labels(data)
    return seg.astype(np.uint16), timings


def compare(seg, update_expected=False):
    import PIL.Image
    from tests.regression.validate import (summarize_label_map, save_csv,
                                           match_rows, load_csv)
    errors = []
    actual_rows = summarize_label_map(seg)

    # same-input reference comparison: the refshim execution of the
    # UNMODIFIED reference on this exact PNG with the scale pinned to our
    # estimator's value (42.4264...), committed under reference-nih3t3/.
    if REF_SEG_PNG.exists():
        ref = np.array(PIL.Image.open(REF_SEG_PNG))
        ref_rows = summarize_label_map(ref)
        matched, spurious, missing = match_rows(actual_rows, ref_rows,
                                                center_tol=3.0, size_tol=0.1)
        a, b = seg > 0, ref > 0
        ref_dice = 2.0 * (a & b).sum() / max(1, a.sum() + b.sum())
        print(f'[nih3t3] vs reference on SAME input: {matched}/{len(ref_rows)} '
              f'matched, {len(spurious)} spurious, fg Dice {ref_dice:.4f}')
        # same one-boundary-object tolerance class as the BBBC033 gate
        if len(missing) > 1 or len(spurious) > 1:
            errors.append(f'[vs same-input reference] spurious={spurious} '
                          f'missing={missing}')
        if ref_dice < 0.975:
            errors.append(f'[vs same-input reference] fg Dice {ref_dice:.4f} '
                          f'< 0.975')
    else:
        errors.append(f'missing committed reference run at {REF_SEG_PNG} '
                      f'(tools/refshim/run_reference_image.py)')

    # self-regression vs committed goldens (tight tolerances: same code path)
    expected_file = EXPECTED / 'nih3t3-glare.csv'
    if update_expected:
        EXPECTED.mkdir(parents=True, exist_ok=True)
        save_csv(expected_file, actual_rows)
        print(f'[nih3t3] wrote {expected_file}')
    elif expected_file.exists():
        exp_rows = load_csv(expected_file)
        matched, spurious, missing = match_rows(actual_rows, exp_rows,
                                                center_tol=3.0, size_tol=0.1)
        print(f'[nih3t3] vs committed goldens: {matched}/{len(exp_rows)} matched')
        # Goldens are the accelerator snapshot; the CPU backend is a
        # different numerics stack (cf. run_bbbc033.py) and may flip one
        # boundary object.
        import jax
        allowed = 1 if jax.default_backend() == 'cpu' else 0
        if len(spurious) > allowed or len(missing) > allowed:
            errors.append(f'[self-regression] spurious={spurious} '
                          f'missing={missing} (allowed {allowed} on '
                          f'{jax.default_backend()})')
    else:
        errors.append(f'no committed goldens at {expected_file} '
                      f'(run with --update-expected)')
    return errors


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--update-expected', action='store_true')
    args = parser.parse_args()
    import time
    t0 = time.time()
    seg, timings = segment()
    print(f'[nih3t3] segmented in {time.time() - t0:.1f}s '
          f'({len(np.unique(seg)) - 1} objects); stage timings: '
          f'{ {k: round(v, 2) for k, v in timings.items()} }')
    errors = compare(seg, update_expected=args.update_expected)
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print('[nih3t3] regression passed.')


if __name__ == '__main__':
    main()
