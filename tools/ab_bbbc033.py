#!/usr/bin/env python
"""BBBC033 recompile-stability A/B: segment the real slice under the current
env knobs and dump object summaries + label hash for diffing
(the real-image leg of the VERDICT r3 item 1 gate; the synthetic leg is
``tools/ab_decision_drift.py``).

Usage::

    python tools/ab_bbbc033.py out_a.json
    SDSM_DROP_BUCKETS=12288 python tools/ab_bbbc033.py out_b.json
    python tools/ab_bbbc033.py --diff out_a.json out_b.json
"""

import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(REPO))


def run():
    from tests.regression.run_bbbc033 import segment
    from tests.regression.validate import summarize_label_map
    seg, _ = segment()
    rows = summarize_label_map(seg)
    return {
        'n_objects': len(rows),
        'rows': sorted([int(s), round(float(cx), 2), round(float(cy), 2)]
                       for s, cx, cy in rows),
        'labels_sha1': hashlib.sha1(
            np.ascontiguousarray(seg.astype(np.int32))).hexdigest(),
    }


def diff(path_a, path_b):
    a = json.loads(pathlib.Path(path_a).read_text())
    b = json.loads(pathlib.Path(path_b).read_text())
    same_labels = a['labels_sha1'] == b['labels_sha1']
    print(f'n_objects: {a["n_objects"]} vs {b["n_objects"]}')
    print(f'labels_sha1: {"IDENTICAL" if same_labels else "DIFFER"}')
    ra = {tuple(r) for r in a['rows']}
    rb = {tuple(r) for r in b['rows']}
    for tag, only in (('a', ra - rb), ('b', rb - ra)):
        for row in sorted(only):
            print(f'  only in {tag}: size={row[0]} center=({row[1]},{row[2]})')
    return 0 if (a['n_objects'] == b['n_objects'] and same_labels) else 1


def main():
    if sys.argv[1] == '--diff':
        sys.exit(diff(sys.argv[2], sys.argv[3]))
    result = run()
    pathlib.Path(sys.argv[1]).write_text(json.dumps(result, indent=1))
    print(f'wrote {sys.argv[1]}: {result["n_objects"]} objects, '
          f'labels {result["labels_sha1"][:12]}')


if __name__ == '__main__':
    main()
