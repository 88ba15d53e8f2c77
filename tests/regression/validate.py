"""Dataset-level regression validation by object size/centroid matching.

Counterpart of the reference's ``tests/regression/validate.py``
(``/root/reference/tests/regression/validate.py:27-88``), which summarizes
each label map to ``(object size, center X, center Y)`` rows and compares
them against expected CSVs *as exact sets* — forcing the reference to keep
per-hostname goldens, since results are BLAS/hardware-sensitive. Here the
comparison is tolerance-based greedy matching (centroid distance and relative
size), so one set of goldens serves every backend.

Usage::

    python tests/regression/validate.py <actual_seg_dir> <actual_csv_dir> <expected_csv_dir>
        [--update-expected] [--center-tol PX] [--size-tol FRAC] [--max-unmatched N]
"""

import argparse
import csv
import glob
import pathlib
import shutil
import sys

import numpy as np
import scipy.ndimage as ndi


def summarize_label_map(img):
    """Returns the ``(size, cx, cy)`` rows of a label map (background = 0)."""
    rows = []
    for label in sorted(frozenset(img.flatten()) - {0}):
        cc = (img == label)
        cy, cx = ndi.center_of_mass(cc)
        rows.append((int(cc.sum()), round(float(cx), 1), round(float(cy), 1)))
    rows.sort(key=lambda row: row[1:3])
    return rows


def match_rows(actual, expected, center_tol=3.0, size_tol=0.1):
    """Greedy one-to-one matching of summary rows within tolerances.

    :return: ``(matched_count, spurious_rows, missing_rows)``.
    """
    actual = list(actual)
    expected = list(expected)
    unmatched_expected = list(range(len(expected)))
    spurious = []
    for a in actual:
        best, best_d = None, np.inf
        for j in unmatched_expected:
            e = expected[j]
            d = np.hypot(a[1] - e[1], a[2] - e[2])
            if d <= center_tol and abs(a[0] - e[0]) <= size_tol * max(a[0], e[0]):
                if d < best_d:
                    best, best_d = j, d
        if best is None:
            spurious.append(a)
        else:
            unmatched_expected.remove(best)
    missing = [expected[j] for j in unmatched_expected]
    matched = len(actual) - len(spurious)
    return matched, spurious, missing


def load_csv(filepath):
    rows = []
    with open(filepath, 'r') as fp:
        reader = csv.reader(fp, delimiter=',', quoting=csv.QUOTE_ALL)
        for ridx, row in enumerate(reader):
            if ridx == 0:
                continue
            rows.append((int(float(row[0])), float(row[1]), float(row[2])))
    return rows


def save_csv(filepath, rows):
    with open(filepath, 'w', newline='') as fp:
        writer = csv.writer(fp, delimiter=',', quoting=csv.QUOTE_ALL)
        writer.writerows([['Object size', 'Center X', 'Center Y']]
                         + [[str(r[0]), str(r[1]), str(r[2])] for r in rows])


def validate(actual_seg, actual_csv, expected_csv, update_expected=False,
             center_tol=3.0, size_tol=0.1, max_unmatched=0):
    sys.path.insert(0, str(pathlib.Path(__file__).parents[2]))
    from superdsm_tpu.io import imread

    actual_seg_path = pathlib.Path(actual_seg)
    actual_csv_path = pathlib.Path(actual_csv)
    expected_csv_path = pathlib.Path(expected_csv)
    actual_csv_path.mkdir(parents=True, exist_ok=True)

    rows_by_filename = {}
    for filepath in sorted(glob.glob(str(actual_seg_path / '*.png'))):
        seg_filepath = pathlib.Path(filepath)
        img = np.asarray(imread(str(seg_filepath), as_gray=False))
        rows = summarize_label_map(img)
        save_csv(actual_csv_path / (seg_filepath.name + '.csv'), rows)
        rows_by_filename[seg_filepath.name] = rows

    if not rows_by_filename:
        return ['No label maps found']

    if update_expected:
        expected_csv_path.mkdir(parents=True, exist_ok=True)
        for filename in rows_by_filename:
            shutil.copy(str(actual_csv_path / (filename + '.csv')),
                        str(expected_csv_path / (filename + '.csv')))
        return []

    errors = []
    remaining = dict(rows_by_filename)
    for filepath in sorted(glob.glob(str(expected_csv_path / '*.csv'))):
        expected_filepath = pathlib.Path(filepath)
        seg_filename = expected_filepath.name[:-4]
        if seg_filename not in remaining:
            errors.append(f'Missing label map: "{seg_filename}"')
            continue
        actual_rows = remaining.pop(seg_filename)
        expected_rows = load_csv(expected_filepath)
        matched, spurious, missing = match_rows(actual_rows, expected_rows,
                                                center_tol, size_tol)
        if len(spurious) + len(missing) > max_unmatched:
            errors.append(f'{seg_filename}: {len(spurious)} spurious and '
                          f'{len(missing)} missing object(s) '
                          f'(matched {matched}/{len(expected_rows)})')
    for leftover in remaining:
        errors.append(f'Spurious label map: "{leftover}"')
    return errors


def main():
    parser = argparse.ArgumentParser(prog='Regression testing')
    parser.add_argument('actual_seg', help='Directory containing the actual label maps.')
    parser.add_argument('actual_csv', help='Directory for the actual CSV summaries.')
    parser.add_argument('expected_csv', help='Directory containing the expected CSV.')
    parser.add_argument('--update-expected', action='store_true')
    parser.add_argument('--center-tol', type=float, default=3.0)
    parser.add_argument('--size-tol', type=float, default=0.1)
    parser.add_argument('--max-unmatched', type=int, default=0)
    args = parser.parse_args()

    errors = validate(args.actual_seg, args.actual_csv, args.expected_csv,
                      args.update_expected, args.center_tol, args.size_tol,
                      args.max_unmatched)
    if errors:
        print('\n'.join(errors))
        sys.exit(1)
    print('All tests passed.')


if __name__ == '__main__':
    main()
