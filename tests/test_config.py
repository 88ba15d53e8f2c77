"""Tests for the '/'-namespaced Config (reference ``superdsm/config.py``)."""

import pytest

from superdsm_tpu.config import Config


def test_nested_set_get():
    cfg = Config()
    cfg['a/b/c'] = 5
    assert cfg['a/b/c'] == 5
    assert cfg.get('a/b/c', None) == 5
    assert cfg.get('a/b/missing', 42) == 42
    assert 'a/b/c' in cfg
    assert 'a/x' not in cfg


def test_set_default_and_update():
    cfg = Config()
    cfg.set_default('k', 1)
    cfg.set_default('k', 2)
    assert cfg['k'] == 1
    cfg.update('k', lambda v: v + 10)
    assert cfg['k'] == 11


def test_merge_and_derive():
    cfg = Config()
    cfg['a/b'] = 1
    cfg['a/c'] = 2
    derived = cfg.derive({'a': {'b': 7}, 'd': 9})
    assert derived['a/b'] == 7
    assert derived['a/c'] == 2
    assert derived['d'] == 9
    assert cfg['a/b'] == 1  # original untouched


def test_md5_stable_and_sensitive():
    cfg1 = Config({'x': 1, 'y': {'z': 2}})
    cfg2 = Config({'y': {'z': 2}, 'x': 1})
    cfg3 = Config({'x': 1, 'y': {'z': 3}})
    assert cfg1.md5.hexdigest() == cfg2.md5.hexdigest()
    assert cfg1.md5.hexdigest() != cfg3.md5.hexdigest()


def test_pop():
    cfg = Config({'a': {'b': 3}})
    assert cfg.pop('a/b', None) == 3
    assert cfg.get('a/b', 'gone') == 'gone'
