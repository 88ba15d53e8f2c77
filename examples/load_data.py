#!/usr/bin/env python
"""Populate ``examples/data/`` with the six public microscopy datasets.

Counterpart of the reference loader (``/root/reference/examples/load_data.py``)
rebuilt on the standard library only (urllib instead of requests). Each entry
of ``MANIFEST`` names a public archive and which members of it become which
``examples/data/<DATASET>`` directory; the task trees under ``examples/``
reference these layouts via their ``img_pathpattern``.

Usage:
    python examples/load_data.py              # download + unpack everything
    python examples/load_data.py BBBC039     # just one dataset group
    python examples/load_data.py --verify    # offline: report which datasets
                                             # are present and complete

The environments this framework is benchmarked in have no network egress;
``--verify`` lets you confirm a layout that was rsync'ed in by other means.
"""

import argparse
import json
import pathlib
import shutil
import ssl
import sys
import tempfile
import urllib.request

ROOT = pathlib.Path(__file__).resolve().parent
DATA = ROOT / 'data'

#: archive URL -> list of (member path inside archive, destination under data/)
MANIFEST = {
    'GOWT1': dict(
        url='http://data.celltrackingchallenge.net/training-datasets/Fluo-N2DH-GOWT1.zip',
        members=[('Fluo-N2DH-GOWT1/01', 'GOWT1-1'),
                 ('Fluo-N2DH-GOWT1/02', 'GOWT1-2')],
    ),
    'U2OS+NIH3T3': dict(
        url='https://murphylab.web.cmu.edu/data/2009_ISBI_2DNuclei_code_data.tgz',
        members=[('data/images/dna-images/gnf', 'U2OS'),
                 ('data/images/dna-images/ic100', 'NIH3T3')],
        insecure=True,  # murphylab's TLS chain is broken; reference disables verify too
    ),
    'fibroblast-prolif': dict(
        url='https://bmcv.github.io/SuperDSM/fibroblast-prolif.tar.bz2',
        members=[('fibroblast-prolif/prolif', 'fibroblast/prolif')],
    ),
    'fibroblast-ss': dict(
        url='https://bmcv.github.io/SuperDSM/fibroblast-ss.tar.bz2',
        members=[('fibroblast-ss/ss', 'fibroblast/ss')],
    ),
    'BBBC039': dict(
        url='https://data.broadinstitute.org/bbbc/BBBC039/images.zip',
        members=[('images', 'BBBC039')],
    ),
}


def fetch_group(name, spec):
    url = spec['url']
    suffix = ''.join(pathlib.Path(url).suffixes)
    ctx = ssl._create_unverified_context() if spec.get('insecure') else None
    print(f'[{name}] downloading {url}')
    with tempfile.NamedTemporaryFile('wb', suffix=suffix) as archive:
        with urllib.request.urlopen(url, context=ctx) as resp:
            shutil.copyfileobj(resp, archive, length=10 * 1024 ** 2)
        archive.flush()
        with tempfile.TemporaryDirectory() as tmp:
            print(f'[{name}] unpacking')
            shutil.unpack_archive(archive.name, tmp)
            for member, dest in spec['members']:
                target = DATA / dest
                print(f'[{name}] -> {target}')
                target.parent.mkdir(parents=True, exist_ok=True)
                if target.exists():
                    shutil.rmtree(target)
                shutil.move(str(pathlib.Path(tmp) / member), str(target))


def expected_files(task_dir):
    """Yield the image paths a task tree's manifest resolves to."""
    spec = json.loads((task_dir / 'task.json').read_text())
    pattern = spec['img_pathpattern'].replace('{ROOTDIR}', str(task_dir)).replace(
        '{DIRNAME}', task_dir.name)
    for file_id in spec['file_ids']:
        yield pathlib.Path(pattern % file_id).resolve()


def verify():
    ok = True
    for task_dir in sorted(p.parent for p in ROOT.glob('*/task.json')):
        if task_dir.name.startswith('synthetic'):
            continue
        paths = list(expected_files(task_dir))
        missing = [p for p in paths if not p.is_file()]
        status = 'complete' if not missing else f'missing {len(missing)}/{len(paths)}'
        print(f'{task_dir.name:12s} {status}')
        if missing:
            ok = False
            for p in missing[:3]:
                print(f'             e.g. {p}')
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('groups', nargs='*', help=f'subset of {sorted(MANIFEST)}')
    ap.add_argument('--verify', action='store_true',
                    help='offline: check data/ against the task manifests')
    args = ap.parse_args(argv)
    if args.verify:
        return 0 if verify() else 1
    groups = args.groups or sorted(MANIFEST)
    unknown = [g for g in groups if g not in MANIFEST]
    if unknown:
        ap.error(f'unknown group(s) {unknown}; choose from {sorted(MANIFEST)}')
    for name in groups:
        fetch_group(name, MANIFEST[name])
    return 0


if __name__ == '__main__':
    sys.exit(main())
