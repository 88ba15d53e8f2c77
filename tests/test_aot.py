"""AOT executable registry (superdsm_tpu.dsm.aot).

The registry must serve the *same* executable the plain jit path runs:
outputs are compared elementwise-exact on the CPU backend, both for a
freshly compiled registration and for a sidecar (serialize → pickle →
deserialize_and_load) round trip in a clean registry.
"""

import contextlib

import numpy as np
import jax
import pytest

from superdsm_tpu.dsm import aot, batching


SHAPE = ('dsm', 2048, 122, 4)
POLY_SHAPE = ('poly-m', 2048, 0, 4)


@contextlib.contextmanager
def _scoped_cache_dir(path):
    old = jax.config.jax_compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', str(path))
    try:
        yield
    finally:
        jax.config.update('jax_compilation_cache_dir', old)


@pytest.fixture
def fresh_fingerprint(monkeypatch):
    monkeypatch.setattr(aot, '_FPRINT', None)


def _job(shape, maxiter=8):
    fn, args = batching._warmup_job(*shape, maxiter, batching.DEFAULT_TOL,
                                    4.0, 16)
    statics = ((batching.DEFAULT_TOL,) if shape[0].startswith('poly')
               else (batching.DEFAULT_TOL, 4.0, 16))
    return fn, args, statics


def _get(outs):
    return [np.asarray(x) for x in jax.device_get(outs)]


def test_dispatch_identical_to_jit(tmp_path, fresh_fingerprint):
    saved = dict(aot._REGISTRY)
    aot._REGISTRY.clear()
    try:
        with _scoped_cache_dir(tmp_path):
            for shape in (SHAPE, POLY_SHAPE):
                fn, args, statics = _job(shape)
                ref = _get(fn(*args))

                # miss: falls through to the jit path
                out_miss = _get(aot.dispatch(*shape, statics, fn, args))
                for a, b in zip(ref, out_miss):
                    np.testing.assert_array_equal(a, b)

                # fresh registration and dispatch
                aot.acquire(*shape, statics, fn, args)
                key = aot._key(*shape, statics)
                assert key in aot._REGISTRY
                out_hit = _get(aot.dispatch(*shape, statics, fn, args))
                for a, b in zip(ref, out_hit):
                    np.testing.assert_array_equal(a, b)

                sidecar = aot._sidecar_dir() / aot._fname(key)
                if aot._sidecars_ok():
                    # sidecar round trip: clean registry, acquire must
                    # deserialize (accelerator backends only — XLA:CPU AOT
                    # artifacts fail machine-feature validation at load)
                    assert sidecar.exists(), 'sidecar was not written'
                    aot._REGISTRY.clear()
                    aot.acquire(*shape, statics, fn, args)
                    assert key in aot._REGISTRY
                    out_loaded = _get(aot.dispatch(*shape, statics, fn,
                                                   args))
                    for a, b in zip(ref, out_loaded):
                        np.testing.assert_array_equal(a, b)
                else:
                    assert not sidecar.exists(), \
                        'sidecar written on a backend that cannot load it'
    finally:
        aot._REGISTRY.clear()
        aot._REGISTRY.update(saved)


def test_production_dispatch_hits_warmed_keys(tmp_path, fresh_fingerprint,
                                              monkeypatch):
    """End-to-end wiring: the keys ``warmup`` registers must be the keys the
    production dispatch sites look up (a silent mismatch would degrade every
    solve to the jit path), and the routed results must be identical.

    ``smooth_amount=6`` is deliberately NOT the warmup default (4): the
    statics are part of the dispatch key, so the recorded shape entries must
    carry them through to ``warmup`` — re-deriving them from warmup defaults
    would miss every non-default workload."""
    from superdsm_tpu.image import Image
    from superdsm_tpu.dsm.batching import make_problem, solve_problems

    H, W = 48, 48
    rr, cc = np.indices((H, W))
    lmask = ((rr > 8) & (rr < 40) & (cc > 8) & (cc < 24)) | \
            ((rr > 26) & (rr < 40) & (cc > 8) & (cc < 40))
    region = Image(model=lmask.astype(np.float32) - 0.5)

    def solve():
        prob = make_problem(region, smooth_amount=6, smooth_subsample=6)
        return solve_problems([prob], alpha=0.05, smooth_amount=6)[0]

    saved = dict(aot._REGISTRY)
    aot._REGISTRY.clear()
    try:
        with _scoped_cache_dir(tmp_path):
            # fresh shape recorder (order-independence: an earlier test may
            # have already solved and recorded this problem shape)
            monkeypatch.setattr(batching, '_RECORDED_SHAPES', set())
            ref = solve()
            shapes = sorted(batching._RECORDED_SHAPES)
            assert shapes, 'solve did not record its dispatched shapes'
            batching.warmup(shapes=shapes)
            assert aot._REGISTRY, 'warmup registered nothing'
            # capture AFTER warmup: its run_one phase dispatches through the
            # registry itself, which must not mask a production-key mismatch
            before = dict(aot.stats)
            res = solve()
            assert aot.stats['hits'] > before['hits'], \
                'production dispatch missed the warmed keys'
            assert aot.stats['misses'] == before['misses'], \
                'production dispatch missed the registry for some program'
        assert res.energy == ref.energy
        np.testing.assert_array_equal(res.fg, ref.fg)
        np.testing.assert_array_equal(res.params, ref.params)
    finally:
        aot._REGISTRY.clear()
        aot._REGISTRY.update(saved)


def test_fetch_failure_drops_registry_and_retries(tmp_path,
                                                  fresh_fingerprint,
                                                  monkeypatch):
    """Async executions fail at the FETCH, not at dispatch: the solve round
    must drop the round's registry entries and retry once through the jit
    path (identical results), instead of erroring the image."""
    from superdsm_tpu.image import Image
    from superdsm_tpu.dsm.batching import make_problem, solve_problems

    H, W = 48, 48
    rr, cc = np.indices((H, W))
    lmask = (rr > 8) & (rr < 40) & (cc > 8) & (cc < 30)
    region = Image(model=lmask.astype(np.float32) - 0.5)

    def solve():
        prob = make_problem(region, smooth_amount=4, smooth_subsample=6)
        return solve_problems([prob], alpha=0.05, smooth_amount=4)[0]

    saved = dict(aot._REGISTRY)
    aot._REGISTRY.clear()
    try:
        with _scoped_cache_dir(tmp_path):
            # fresh shape recorder: an earlier test that already solved this
            # problem shape would make the recorded-delta empty, leaving
            # nothing to warm (order-dependent flake)
            monkeypatch.setattr(batching, '_RECORDED_SHAPES', set())
            ref = solve()
            shapes = sorted(batching._RECORDED_SHAPES)
            batching.warmup(shapes=shapes)
            n_reg = len(aot._REGISTRY)
            assert n_reg > 0

            real_fetch = batching._fetch_with_deadline
            fails = {'n': 0}

            def poisoned(sel, timeout):
                if fails['n'] == 0:
                    fails['n'] += 1
                    raise RuntimeError('server-side executable failure')
                return real_fetch(sel, timeout)

            monkeypatch.setattr(batching, '_fetch_with_deadline', poisoned)
            res = solve()
            assert fails['n'] == 1, 'the poisoned fetch never ran'
            assert len(aot._REGISTRY) < n_reg, \
                'failing round did not drop its registry entries'
        assert res.energy == ref.energy
        np.testing.assert_array_equal(res.params, ref.params)

        # with nothing to drop (registry empty), the failure must propagate
        aot._REGISTRY.clear()
        fails['n'] = 0
        with pytest.raises(RuntimeError):
            solve()
    finally:
        aot._REGISTRY.clear()
        aot._REGISTRY.update(saved)


def test_fingerprint_scopes_sidecars(tmp_path, fresh_fingerprint,
                                     monkeypatch):
    import os
    with _scoped_cache_dir(tmp_path):
        d1 = aot._sidecar_dir(make=True)
        (d1 / 'dummy.pkl').write_bytes(b'x')
        # a knob that alters traced programs must change the fingerprint dir
        monkeypatch.setenv('SDSM_GRAM_PASSES', '3')
        monkeypatch.setattr(aot, '_FPRINT', None)
        d2 = aot._sidecar_dir(make=True)
        assert d1 != d2

        # pruning keeps the _KEEP_SIBLINGS most recent sibling dirs (so
        # alternating env-knob A/B runs keep each other's sidecars) and
        # removes older ones, once per process
        for i in range(aot._KEEP_SIBLINGS + 1):
            s = d2.parent / f'000000000000000{i}'
            s.mkdir()
            (s / 'dummy.pkl').write_bytes(b'x')
            ts = 1_000_000_000 + i
            os.utime(s, (ts, ts))
        os.utime(d2.parent / '0000000000000000', (1, 1))  # the oldest
        monkeypatch.setattr(aot, '_PRUNED', False)
        aot._sidecar_dir(make=True)
        assert not (d2.parent / '0000000000000000').exists(), \
            'oldest stale fingerprint dir not pruned'
        assert (d1 / 'dummy.pkl').exists(), \
            'recent sibling (A/B workflow) was wrongly pruned'


def test_warmup_compile_only_skips_device_phase(tmp_path, monkeypatch):
    """``warmup(compile_only=True)`` (the bench's blocking phase) registers
    executables without dispatching: no load phase, no warm-shape arming —
    the covering workload pays the first dispatch itself."""
    from superdsm_tpu.image import Image
    from superdsm_tpu.dsm.batching import make_problem, solve_problems

    H, W = 40, 40
    rr, cc = np.indices((H, W))
    region = Image(model=(((rr - 20) ** 2 + (cc - 20) ** 2) < 120)
                   .astype(np.float32) - 0.5)

    saved = dict(aot._REGISTRY)
    aot._REGISTRY.clear()
    try:
        with _scoped_cache_dir(tmp_path):
            monkeypatch.setattr(batching, '_RECORDED_SHAPES', set())
            monkeypatch.setattr(batching, '_WARM_SHAPES', set())
            prob = make_problem(region, smooth_amount=6, smooth_subsample=6)
            solve_problems([prob], alpha=0.05, smooth_amount=6)
            shapes = sorted(batching._RECORDED_SHAPES)
            assert shapes
            warm_before = set(batching._WARM_SHAPES)
            stats = batching.warmup(shapes=shapes, compile_only=True)
            assert stats['load_s'] == 0.0
            assert stats['n_programs'] == len(shapes)
            assert aot._REGISTRY, 'compile-only warmup registered nothing'
            # device phase skipped: warmup armed no additional warm shapes
            # (the production solve above already armed its own)
            assert batching._WARM_SHAPES == warm_before
    finally:
        aot._REGISTRY.clear()
        aot._REGISTRY.update(saved)
