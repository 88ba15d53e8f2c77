#!/usr/bin/env python
"""Dataset-level regression run on the synthetic example dataset.

Counterpart of the reference's per-dataset regression scripts
(``/root/reference/tests/regression/validate-*.sh`` +
``batch-validate.py``): generates the deterministic synthetic dataset, runs
the batch system on it, summarizes the label maps, and matches them against
the committed goldens with centroid/size tolerance (see ``validate.py`` —
the reference needs per-hostname goldens because it matches exactly).

    python tests/regression/run_synthetic.py [--update-expected]
"""

import argparse
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).parents[2]
sys.path.insert(0, str(REPO))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--update-expected', action='store_true')
    args = parser.parse_args()

    subprocess.run([sys.executable, str(REPO / 'examples/synthetic/generate.py')],
                   check=True)
    subprocess.run([sys.executable, '-m', 'superdsm_tpu.batch', str(REPO / 'examples'),
                    '--task-dir', 'synthetic/default', '--run', '--no-fork', '--force'],
                   check=True, cwd=str(REPO))

    from tests.regression.validate import validate
    seg_dir = REPO / 'examples/synthetic/default/seg'
    expected = REPO / 'tests/regression/expected/synthetic'
    with tempfile.TemporaryDirectory() as actual_csv:
        errors = validate(str(seg_dir), actual_csv, str(expected),
                          update_expected=args.update_expected,
                          center_tol=3.0, size_tol=0.1, max_unmatched=0)
    # parity against the goldens produced by the ACTUAL reference
    # implementation (tools/refshim/run_reference.py; see VALIDATION.md)
    ref_expected = REPO / 'tests/regression/expected/reference-synthetic'
    with tempfile.TemporaryDirectory() as actual_csv:
        errors += [f'[vs reference] {e}' for e in validate(
            str(seg_dir), actual_csv, str(ref_expected),
            update_expected=False, center_tol=3.0, size_tol=0.1,
            max_unmatched=0)]
    errors += score_against_reference(seg_dir, ref_expected / 'seg')
    if args.update_expected:
        print('Expected CSVs updated.')
        return
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print('All regression tests passed.')


def score_against_reference(seg_dir, ref_seg_dir, min_dice=0.97):
    """Dice/SEG of the repo's label maps against the committed label maps of
    the actual reference implementation (VALIDATION.md section 2)."""
    import numpy as np
    from superdsm_tpu.io import imread
    from superdsm_tpu.metrics import dice, seg_score
    errors, dices, segs = [], [], []
    for ref_path in sorted(pathlib.Path(ref_seg_dir).glob('*.png')):
        actual_path = pathlib.Path(seg_dir) / ref_path.name
        if not actual_path.exists():
            errors.append(f'[vs reference] missing label map {ref_path.name}')
            continue
        a = np.asarray(imread(str(actual_path), as_gray=False))
        r = np.asarray(imread(str(ref_path), as_gray=False))
        dices.append(dice(a, r))
        segs.append(seg_score(a, r))
    if dices:
        print(f'vs reference: mean Dice={np.mean(dices):.4f} '
              f'SEG={np.mean(segs):.4f} over {len(dices)} images')
        if np.mean(dices) < min_dice:
            errors.append(f'[vs reference] mean Dice {np.mean(dices):.4f} '
                          f'< {min_dice}')
    return errors


if __name__ == '__main__':
    main()
