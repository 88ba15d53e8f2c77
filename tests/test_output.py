"""Tests for the hierarchical output system (reference ``tests/test_output.py``)."""

import io
import contextlib

from superdsm_tpu.output import get_output, Text


def test_get_output_factory():
    out = get_output(None)
    assert out is not None
    derived = out.derive(muted=True)
    assert derived.muted


def test_muted_output_writes_nothing(capsys):
    out = get_output(None).derive(muted=True)
    out.write('hello')
    out.intermediate('working...')
    captured = capsys.readouterr()
    assert captured.out == ''


def test_write_passthrough(capsys):
    out = get_output(None)
    out.write('a permanent line')
    captured = capsys.readouterr()
    assert 'a permanent line' in captured.out


def test_text_style():
    styled = Text.style('x', Text.BOLD)
    assert 'x' in styled and styled != 'x'


def test_margin():
    out = get_output(None).derive(margin=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.write('indented')
    assert buf.getvalue().startswith('  ')
