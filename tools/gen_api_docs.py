#!/usr/bin/env python
"""Generate the API reference (``docs/api/*.md``) from docstrings.

The environment ships no sphinx/pdoc, so this is a dependency-free
generator: it imports every public ``superdsm_tpu`` module, walks its
public classes and functions with :mod:`inspect`, and writes one markdown
file per module plus an index. Mirrors the reference's per-module API docs
(``/root/reference/docs/source/superdsm.*.rst``) in repo-native form.

Usage (CPU env; regenerates everything in place)::

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_api_docs.py
"""

import importlib
import inspect
import pathlib
import sys
import textwrap

REPO = pathlib.Path(__file__).parents[1]
sys.path.insert(0, str(REPO))

OUT = REPO / 'docs' / 'api'

#: Public modules, in layer order (SURVEY.md §1). Private helpers
#: (`_aux`) and vendored-free internals are documented where exported.
MODULES = [
    'superdsm_tpu',
    'superdsm_tpu.image',
    'superdsm_tpu.io',
    'superdsm_tpu.config',
    'superdsm_tpu.output',
    'superdsm_tpu.pipeline',
    'superdsm_tpu.preprocess',
    'superdsm_tpu.dsmcfg',
    'superdsm_tpu.c2freganal',
    'superdsm_tpu.globalenergymin',
    'superdsm_tpu.postprocess',
    'superdsm_tpu.objects',
    'superdsm_tpu.atoms',
    'superdsm_tpu.minsetcover',
    'superdsm_tpu.maxsetpack',
    'superdsm_tpu.automation',
    'superdsm_tpu.batch',
    'superdsm_tpu.export',
    'superdsm_tpu.render',
    'superdsm_tpu.metrics',
    'superdsm_tpu.dsm',
    'superdsm_tpu.dsm.model',
    'superdsm_tpu.dsm.solver',
    'superdsm_tpu.dsm.smooth',
    'superdsm_tpu.dsm.batching',
    'superdsm_tpu.dsm.aot',
    'superdsm_tpu.dsm.pallas_kernels',
    'superdsm_tpu.ops',
    'superdsm_tpu.ops.gaussian',
    'superdsm_tpu.ops.blob',
    'superdsm_tpu.parallel',
    'superdsm_tpu.parallel.mesh',
    'superdsm_tpu.parallel.newton',
    'superdsm_tpu.parallel.mosaic',
    'superdsm_tpu.parallel.pipelined',
    'superdsm_tpu.native',
    'superdsm_tpu.tpu_setup',
    'superdsm_tpu.version',
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc(obj, indent=''):
    doc = inspect.getdoc(obj)
    if not doc:
        return ''
    return textwrap.indent(doc, indent) + '\n'


def _is_public(name):
    return not name.startswith('_')


def _document_class(cls, lines):
    lines.append(f'### class `{cls.__name__}{_sig(cls)}`\n')
    lines.append(_doc(cls))
    members = inspect.getmembers(cls)
    for name, member in members:
        if not _is_public(name):
            continue
        if inspect.isfunction(member) or inspect.ismethod(member):
            if member.__qualname__.split('.')[0] != cls.__name__:
                continue  # inherited
            lines.append(f'#### `{cls.__name__}.{name}{_sig(member)}`\n')
            lines.append(_doc(member))
        elif isinstance(member, property):
            lines.append(f'#### property `{cls.__name__}.{name}`\n')
            lines.append(_doc(member))


def document_module(modname):
    mod = importlib.import_module(modname)
    lines = [f'# `{modname}`\n']
    lines.append(_doc(mod))
    classes, functions, data = [], [], []
    for name, member in vars(mod).items():
        if not _is_public(name):
            continue
        owner = getattr(member, '__module__', None)
        if inspect.isclass(member) and owner == modname:
            classes.append(member)
        elif inspect.isfunction(member) and owner == modname:
            functions.append(member)
        elif not inspect.ismodule(member) and not callable(member) and \
                name.isupper():
            data.append((name, member))
    if data:
        lines.append('## Constants\n')
        for name, value in data:
            rep = repr(value)
            if len(rep) > 120:
                rep = rep[:117] + '...'
            lines.append(f'- `{name} = {rep}`')
        lines.append('')
    if classes:
        lines.append('## Classes\n')
        for cls in classes:
            _document_class(cls, lines)
    if functions:
        lines.append('## Functions\n')
        for fn in functions:
            lines.append(f'### `{fn.__name__}{_sig(fn)}`\n')
            lines.append(_doc(fn))
    return '\n'.join(lines).rstrip() + '\n'


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    index = ['# API reference\n',
             'Generated from docstrings by `tools/gen_api_docs.py` — '
             'regenerate after interface changes:\n',
             '```bash',
             'PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu '
             'python tools/gen_api_docs.py',
             '```\n']
    for modname in MODULES:
        try:
            text = document_module(modname)
        except Exception as error:
            print(f'SKIP {modname}: {type(error).__name__}: {error}')
            continue
        fname = modname.replace('.', '_') + '.md'
        (OUT / fname).write_text(text)
        mod = importlib.import_module(modname)
        first = (inspect.getdoc(mod) or '').split('\n')[0]
        index.append(f'- [`{modname}`]({fname}) — {first}')
        print(f'wrote {fname}')
    (OUT / 'index.md').write_text('\n'.join(index) + '\n')
    print(f'wrote index.md ({len(MODULES)} modules)')


if __name__ == '__main__':
    main()
