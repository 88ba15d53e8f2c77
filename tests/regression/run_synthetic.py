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


#: (task dir, own-goldens dir, reference-goldens dir or None). The variants
#: mirror the reference's dataset families: glare (NIH3T3-like saturated
#: spots + illumination gradient), dim (GOWT1-like low contrast), and the
#: ISBI'24 greedy-pruning task over the base data (reference
#: ``examples/BBBC039/isbi24``).
TASKS = [
    ('synthetic/default', 'synthetic', 'reference-synthetic'),
    ('synthetic-glare/default', 'synthetic-glare', 'reference-synthetic-glare'),
    ('synthetic-dim/default', 'synthetic-dim', 'reference-synthetic-dim'),
    ('synthetic/isbi24', 'synthetic-isbi24', None),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--update-expected', action='store_true')
    parser.add_argument('--tasks', nargs='*', default=None,
                        help='subset of task dirs (default: all)')
    args = parser.parse_args()

    subprocess.run([sys.executable, str(REPO / 'examples/synthetic/generate.py')],
                   check=True)
    from tests.regression.validate import validate

    errors = []
    for task_dir, own, ref in TASKS:
        if args.tasks and task_dir not in args.tasks:
            continue
        subprocess.run([sys.executable, '-m', 'superdsm_tpu.batch',
                        str(REPO / 'examples'), '--task-dir', task_dir,
                        '--run', '--no-fork', '--force'],
                       check=True, cwd=str(REPO))
        seg_dir = REPO / 'examples' / task_dir / 'seg'
        expected = REPO / 'tests/regression/expected' / own
        with tempfile.TemporaryDirectory() as actual_csv:
            errors += [f'[{task_dir}] {e}' for e in validate(
                str(seg_dir), actual_csv, str(expected),
                update_expected=args.update_expected,
                center_tol=3.0, size_tol=0.1, max_unmatched=0)]
        # parity against the goldens produced by the ACTUAL reference
        # implementation (tools/refshim/run_reference.py; see VALIDATION.md)
        if ref is not None:
            ref_expected = REPO / 'tests/regression/expected' / ref
            if ref_expected.exists():
                with tempfile.TemporaryDirectory() as actual_csv:
                    errors += [f'[{task_dir} vs reference] {e}' for e in validate(
                        str(seg_dir), actual_csv, str(ref_expected),
                        update_expected=False, center_tol=3.0, size_tol=0.1,
                        max_unmatched=0)]
                errors += [f'[{task_dir}] {e}' for e in
                           score_against_reference(seg_dir, ref_expected / 'seg')]
            else:
                errors.append(f'[{task_dir}] reference goldens missing: '
                              f'{ref_expected}')
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
