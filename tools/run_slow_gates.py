#!/usr/bin/env python
"""Slow quality-gate lane (VERDICT r2 item 7).

Runs the gates that are too slow for the per-commit suite and FAILS if any
of them is skipped, so their docstring numbers stay enforced invariants:

* the CG-vs-Cholesky Newton-direction equivalence gate
  (``tests/test_solver.py::test_cg_direction_matches_cholesky``), and
* a maxiter-sweep IoU gate: the pipeline at the production Newton iteration
  cap must reproduce the near-exact (maxiter=120) foreground to IoU>=0.999
  on the synthetic bench field (the quality harness CLAUDE.md describes,
  here committed and runnable).

Usage (takes ~10-20 min on an idle CPU)::

    python tools/run_slow_gates.py
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).parents[1]


def run_pytest_gate():
    env = dict(os.environ, SDSM_SLOW_TESTS='1')
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/test_solver.py',
         'tests/test_parallel.py', '-q', '-k',
         'cg_direction_matches_cholesky or mesh_equivalence_bench_scale',
         '-rs'],
        cwd=str(REPO), env=env, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''
    print(f'[slow-gates] CG + bench-scale mesh gates: {tail}')
    if proc.returncode != 0:
        print(proc.stdout)
        return False
    if 'skipped' in tail:
        print('[slow-gates] FAIL: a gate was skipped')
        return False
    return True


def run_maxiter_iou_gate(min_iou=0.999):
    sys.path.insert(0, str(REPO))
    import numpy as np
    from bench import make_image
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output
    from superdsm_tpu.render import rasterize_labels

    out = get_output(None).derive(muted=True)
    g, _ = make_image(0, H=260, W=348, n_nuclei=10)
    segs = {}
    for maxiter in (50, 120):
        cfg = Config({'AF_scale': 12, 'dsm': {'newton_maxiter': maxiter}})
        data, _, _ = process_image(create_default_pipeline(), cfg, g, out=out)
        segs[maxiter] = rasterize_labels(data)
    a, b = segs[50] > 0, segs[120] > 0
    iou = (a & b).sum() / max(1, (a | b).sum())
    n50 = len(np.unique(segs[50])) - 1
    n120 = len(np.unique(segs[120])) - 1
    print(f'[slow-gates] maxiter sweep: fg IoU {iou:.4f} '
          f'objects {n50} vs {n120} (min_iou {min_iou})')
    return iou >= min_iou and n50 == n120


def run_bbbc033_gate():
    env = dict(os.environ, SDSM_SLOW_TESTS='1')
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/test_regression_bbbc033.py',
         '-q', '-rs'],
        cwd=str(REPO), env=env, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''
    print(f'[slow-gates] bbbc033 gate: {tail}')
    if proc.returncode != 0:
        print(proc.stdout)
        return False
    return 'skipped' not in tail


def run_nih3t3_gate():
    env = dict(os.environ, SDSM_SLOW_TESTS='1')
    proc = subprocess.run(
        [sys.executable, '-m', 'pytest', 'tests/test_regression_nih3t3.py',
         '-q', '-rs'],
        cwd=str(REPO), env=env, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''
    print(f'[slow-gates] nih3t3 gate: {tail}')
    if proc.returncode != 0:
        print(proc.stdout)
        return False
    return 'skipped' not in tail


def run_dataset_gate():
    """Auto-discovering real-dataset lane (VERDICT r3 item 6): runs every
    reference dataset whose images are present under ``examples/data/`` and
    scores the label maps against the reference's shipped expected CSVs.
    With no images present the harness validates nothing and says so — that
    is a clean skip (egress-blocked environments), not a failure."""
    proc = subprocess.run(
        [sys.executable, 'tests/regression/run_dataset.py'],
        cwd=str(REPO), capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ''
    print(f'[slow-gates] dataset gate: {tail}')
    if proc.returncode != 0:
        print(proc.stdout)
        return False
    return True


def main():
    ok = run_pytest_gate()
    ok = run_bbbc033_gate() and ok
    ok = run_nih3t3_gate() and ok
    ok = run_maxiter_iou_gate() and ok
    ok = run_dataset_gate() and ok
    if not ok:
        print('[slow-gates] FAILED')
        sys.exit(1)
    sys.path.insert(0, str(REPO))
    from superdsm_tpu._gatestamp import write_stamp, STAMP_PATH
    stamp = write_stamp(gates=['cg', 'mesh', 'bbbc033', 'nih3t3',
                               'maxiter_iou', 'dataset'])
    print(f'[slow-gates] all gates passed (0 skipped); stamp '
          f'{stamp["fingerprint"]} -> {STAMP_PATH}')


if __name__ == '__main__':
    main()
