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
    if args.update_expected:
        print('Expected CSVs updated.')
        return
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print('All regression tests passed.')


if __name__ == '__main__':
    main()
