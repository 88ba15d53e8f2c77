"""Slow-gate staleness stamp (VERDICT r4 item 7)."""

import json

import superdsm_tpu._gatestamp as gs


def test_fingerprint_is_stable_and_source_sensitive(tmp_path, monkeypatch):
    fp1 = gs.source_fingerprint()
    fp2 = gs.source_fingerprint()
    assert fp1 == fp2
    # point the module at a fake package tree: fingerprint must track bytes
    monkeypatch.setattr(gs, '_PKG_ROOT', tmp_path)
    (tmp_path / 'a.py').write_text('x = 1\n')
    fp_a = gs.source_fingerprint()
    (tmp_path / 'a.py').write_text('x = 2\n')
    assert gs.source_fingerprint() != fp_a


def test_stamp_roundtrip_and_staleness(tmp_path, monkeypatch):
    monkeypatch.setattr(gs, 'STAMP_PATH', tmp_path / 'stamp.json')
    # no stamp: stale with a "never run" message
    fresh, stamp = gs.is_fresh()
    assert not fresh and stamp is None
    assert 'never been run' in gs.staleness_message()
    # write: fresh, message is None, gates recorded
    written = gs.write_stamp(gates=['bbbc033', 'cg'])
    fresh, stamp = gs.is_fresh()
    assert fresh and stamp['fingerprint'] == written['fingerprint']
    assert stamp['gates'] == ['bbbc033', 'cg']
    assert gs.staleness_message() is None
    # source change: stale with a "stale" message
    monkeypatch.setattr(gs, 'source_fingerprint', lambda: 'deadbeef')
    fresh, _ = gs.is_fresh()
    assert not fresh
    assert 'STALE' in gs.staleness_message()


def test_corrupt_stamp_is_stale(tmp_path, monkeypatch):
    monkeypatch.setattr(gs, 'STAMP_PATH', tmp_path / 'stamp.json')
    (tmp_path / 'stamp.json').write_text('{not json')
    fresh, stamp = gs.is_fresh()
    assert not fresh and stamp is None


def test_bench_reports_freshness(tmp_path, monkeypatch):
    import bench
    monkeypatch.setattr(gs, 'STAMP_PATH', tmp_path / 'stamp.json')
    assert bench._slow_gates_fresh() is False
    gs.write_stamp(gates=['all'])
    assert bench._slow_gates_fresh() is True
    # stamp JSON is valid on disk
    assert json.loads((tmp_path / 'stamp.json').read_text())['gates'] == ['all']
