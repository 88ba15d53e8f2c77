#!/usr/bin/env python
"""Measure recompile-class drift in the discrete decision inputs.

VERDICT r3 item 1: every TPU recompile (gram kernel variant, transfer
format, bucket-ladder change) can flip one boundary object because the c2f
split accept and the gem selection thresholds compare energies that move
~1e-3 relative per recompile. This tool runs the full pipeline on the bench
image and dumps every decision-relevant quantity to JSON so two runs under
different env knobs can be diffed:

* the atoms map hash (c2f split decisions — identical hash means every
  split accept/reject matched),
* per-candidate gem energies keyed by footprint (drift magnitude),
* the selected cover, object count, and a label-map hash.

Usage::

    python tools/ab_decision_drift.py out_a.json                 # default knobs
    SDSM_GRAM_BANDED=0 python tools/ab_decision_drift.py out_b.json
    python tools/ab_decision_drift.py --diff out_a.json out_b.json
"""

import hashlib
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(REPO))


def run(seed=0):
    from bench import make_image
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output
    from superdsm_tpu.render import rasterize_labels

    out = get_output(None).derive(muted=True)
    g, _ = make_image(seed)
    data, _, _ = process_image(create_default_pipeline(),
                               Config({'AF_scale': 12}), g, out=out)

    def fp_key(obj):
        return ','.join(map(str, sorted(obj.footprint)))

    objects = sorted((c for c in data['objects'] if c.energy is not None),
                     key=fp_key)
    cover_fps = sorted(fp_key(c) for c in data['cover'].solution)
    labels = rasterize_labels(data)
    post_fps = sorted(fp_key(c.original) for c in data['postprocessed_objects'])
    return {
        'seed': seed,
        'atoms_sha1': hashlib.sha1(
            np.ascontiguousarray(data['atoms'].astype(np.int32))).hexdigest(),
        'object_energies': {fp_key(c): float(c.energy) for c in objects},
        'object_optimal': {fp_key(c): bool(c.is_optimal) for c in objects},
        'cover': cover_fps,
        'postprocessed': post_fps,
        'n_objects': len(post_fps),
        'labels_sha1': hashlib.sha1(
            np.ascontiguousarray(labels.astype(np.int32))).hexdigest(),
    }


def diff(path_a, path_b):
    a = json.loads(pathlib.Path(path_a).read_text())
    b = json.loads(pathlib.Path(path_b).read_text())
    exit_code = 0
    for field in ('object_energies',):
        ea, eb = a[field], b[field]
        shared = sorted(set(ea) & set(eb))
        only_a, only_b = set(ea) - set(eb), set(eb) - set(ea)
        rels = [abs(ea[k] - eb[k]) / max(1e-12, abs(ea[k]), abs(eb[k]))
                for k in shared if ea[k] is not None and eb[k] is not None]
        rels = np.array(rels) if rels else np.zeros(1)
        print(f'{field}: {len(shared)} shared, rel drift '
              f'mean {rels.mean():.2e} p95 {np.percentile(rels, 95):.2e} '
              f'max {rels.max():.2e}; only-in-a {len(only_a)}, '
              f'only-in-b {len(only_b)}')
        oa, ob = a.get('object_optimal', {}), b.get('object_optimal', {})
        flips = [k for k in shared if oa.get(k) != ob.get(k)]
        if flips:
            exit_code = 1
            print(f'  is_optimal flips: {flips}')
        if only_a or only_b:
            exit_code = 1
            for k in sorted(only_a)[:10]:
                print(f'  only in a: [{k}] = {ea[k]}')
            for k in sorted(only_b)[:10]:
                print(f'  only in b: [{k}] = {eb[k]}')
    for field in ('atoms_sha1', 'cover', 'postprocessed', 'n_objects',
                  'labels_sha1'):
        same = a[field] == b[field]
        print(f'{field}: {"IDENTICAL" if same else "DIFFER"}'
              + ('' if same else f'\n  a: {a[field]}\n  b: {b[field]}'))
        if not same:
            exit_code = 1
    return exit_code


def main():
    args = sys.argv[1:]
    if args and args[0] == '--diff':
        sys.exit(diff(args[1], args[2]))
    out_path = args[0] if args else 'drift.json'
    seed = int(args[1]) if len(args) > 1 else 0
    result = run(seed)
    pathlib.Path(out_path).write_text(json.dumps(result, indent=1))
    print(f'wrote {out_path}: {result["n_objects"]} objects, '
          f'labels {result["labels_sha1"][:12]}')


if __name__ == '__main__':
    main()
