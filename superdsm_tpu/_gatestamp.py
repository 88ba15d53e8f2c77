"""Slow-gate staleness stamp (VERDICT r4 item 7).

The slow quality gates (``tools/run_slow_gates.py``: CG equivalence,
bench-scale mesh, BBBC033 regression, maxiter IoU sweep, dataset lane) are
too slow for the per-commit suite and the hosting environment never executes
the scheduled CI lane — so "all gates green" used to depend on a human
remembering to run them after solver changes. This module closes that loop
in-repo: the gate runner writes a stamp containing a fingerprint of every
package source file, and both the fast suite (``tests/conftest.py``) and the
benchmark (``bench.py`` → ``slow_gates_fresh`` in the JSON) compare it to
HEAD's fingerprint and flag staleness.

Matches the scheduling intent of the reference's
``.github/workflows/regressiontests.yml`` in an environment without CI
executors.
"""

import hashlib
import json
import pathlib
import time

_PKG_ROOT = pathlib.Path(__file__).parent
#: Stamp lives next to the regression goldens it vouches for.
STAMP_PATH = _PKG_ROOT.parent / 'tests' / 'regression' / '.slow_gates_stamp.json'


def source_fingerprint():
    """SHA-1 over every package source file (``.py`` and native ``.cpp``).

    Deliberately broader than the AOT registry's dsm/ops fingerprint: the
    slow gates protect end-to-end *decisions*, which almost any package
    module can influence (stages, combinatorics, stability layer, native
    helpers). A byte-identical tree is the only state the stamp vouches for.
    """
    h = hashlib.sha1()
    for pattern in ('**/*.py', '**/*.cpp'):
        for p in sorted(_PKG_ROOT.glob(pattern)):
            h.update(str(p.relative_to(_PKG_ROOT)).encode())
            h.update(p.read_bytes())
    return h.hexdigest()[:16]


def write_stamp(gates=None):
    """Record a successful slow-gate run for the current source tree."""
    stamp = {
        'fingerprint': source_fingerprint(),
        'time': time.strftime('%Y-%m-%dT%H:%M:%S'),
        'gates': sorted(gates or []),
    }
    STAMP_PATH.parent.mkdir(parents=True, exist_ok=True)
    tmp = STAMP_PATH.with_suffix('.json.tmp')
    tmp.write_text(json.dumps(stamp, indent=1))
    tmp.replace(STAMP_PATH)
    return stamp


def read_stamp():
    try:
        return json.loads(STAMP_PATH.read_text())
    except (OSError, ValueError):
        return None


def is_fresh():
    """(fresh, stamp): fresh=True iff a stamp exists and its fingerprint
    matches the current source tree."""
    stamp = read_stamp()
    if stamp is None:
        return False, None
    return stamp.get('fingerprint') == source_fingerprint(), stamp


def staleness_message():
    """One-line human message, or None when the gates are fresh."""
    fresh, stamp = is_fresh()
    if fresh:
        return None
    if stamp is None:
        return ('slow gates have never been run for this tree — run '
                'tools/run_slow_gates.py')
    return (f'slow gates are STALE (last run {stamp.get("time", "?")} on a '
            f'different source tree) — run tools/run_slow_gates.py')
