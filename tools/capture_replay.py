"""Capture the packed solver inputs of a real bench image, replay them on
the TPU, and split the solve cost into transfer / fixed / per-iteration
components.

Synthetic microbenchmarks mislead here (random data LM-stalls, smooth blobs
converge instantly — CLAUDE.md round-3 notes), so this tool records the
EXACT packed arrays the pipeline dispatches (``capture``) and then times the
same programs with controlled ``maxiter`` (``replay``; maxiter is a traced
argument, so no recompiles):

    python tools/capture_replay.py capture   # runs bench seed 0, saves /tmp/sdsm_capture
    python tools/capture_replay.py replay    # prints the cost split table

Timings sync with a small ``jax.device_get`` (block_until_ready is a no-op
through the axon tunnel) and report min-of-N (tunnel contention is strictly
additive).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAPTURE_DIR = os.environ.get('SDSM_CAPTURE_DIR', '/tmp/sdsm_capture')

DSM_ARGS = ['pix', 'off', 'cnt', 'yq', 'yscale', 'denom', 'sub', 'kmask',
            'warm', 'use_warm', 'alpha', 'epsilon', 'maxiter', 'tol',
            'sigma', 'cutoff']
POLY_ARGS = ['pix', 'off', 'cnt', 'yq', 'yscale', 'denom', 'params0',
             'maxiter', 'tol']
DSM_M_ARGS = ['mb', 'wd'] + DSM_ARGS[1:]
POLY_M_ARGS = ['mb', 'wd'] + POLY_ARGS[1:]
ARGS_BY_KIND = {'dsm': DSM_ARGS, 'poly': POLY_ARGS,
                'dsm-m': DSM_M_ARGS, 'poly-m': POLY_M_ARGS}


def capture():
    os.makedirs(CAPTURE_DIR, exist_ok=True)
    for f in os.listdir(CAPTURE_DIR):
        os.unlink(os.path.join(CAPTURE_DIR, f))
    from superdsm_tpu.dsm import solver
    counter = {'n': 0}

    def wrap(orig, kind, names):
        def wrapped(*args):
            idx = counter['n']
            counter['n'] += 1
            arrs = {}
            scalars = {}
            for name, val in zip(names, args):
                if isinstance(val, np.ndarray):
                    arrs[name] = val
                else:
                    scalars[name] = float(val)
            np.savez_compressed(
                os.path.join(CAPTURE_DIR, f'{idx:03d}_{kind}.npz'),
                __scalars__=json.dumps(scalars), **arrs)
            return orig(*args)
        return wrapped

    solver._solve_dsm_packed = wrap(solver._solve_dsm_packed, 'dsm', DSM_ARGS)
    solver._solve_poly_packed = wrap(solver._solve_poly_packed, 'poly', POLY_ARGS)
    solver._solve_dsm_packed_mask = wrap(solver._solve_dsm_packed_mask, 'dsm-m', DSM_M_ARGS)
    solver._solve_poly_packed_mask = wrap(solver._solve_poly_packed_mask, 'poly-m', POLY_M_ARGS)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    t0 = time.time()
    if os.environ.get('SDSM_CAPTURE_IMAGE') == 'bbbc033':
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'tests', 'regression'))
        import run_bbbc033
        seg, timings = run_bbbc033.segment()
        n_objects = len(np.unique(seg)) - 1
    else:
        import bench
        from superdsm_tpu.pipeline import create_default_pipeline
        from superdsm_tpu.automation import process_image
        from superdsm_tpu.config import Config
        from superdsm_tpu.output import get_output
        pipeline = create_default_pipeline()
        cfg = Config({'AF_scale': 12})
        out = get_output(None).derive(muted=True)
        g, _ = bench.make_image(int(os.environ.get('SDSM_CAPTURE_SEED', 0)))
        data, _, timings = process_image(pipeline, cfg, g, out=out)
        n_objects = len(data['postprocessed_objects'])
    print(f'captured {counter["n"]} solver calls in {time.time() - t0:.1f}s; '
          f'{n_objects} objects; timings={timings}')


def _load_calls():
    calls = []
    for fname in sorted(os.listdir(CAPTURE_DIR)):
        if not fname.endswith('.npz'):
            continue
        kind = fname.split('_')[1].split('.')[0]
        with np.load(os.path.join(CAPTURE_DIR, fname)) as z:
            scalars = json.loads(str(z['__scalars__']))
            arrs = {k: z[k] for k in z.files if k != '__scalars__'}
        calls.append((fname, kind, arrs, scalars))
    return calls


def _args_for(kind, arrs, scalars, maxiter=None):
    names = ARGS_BY_KIND[kind]
    args = []
    for name in names:
        if name in arrs:
            args.append(arrs[name])
        elif name == 'maxiter':
            args.append(int(scalars['maxiter'] if maxiter is None else maxiter))
        else:
            args.append(scalars[name])
    return args


def _time_call(fn, args, sync_leaf=1, reps=3):
    """min-of-reps wall time of fn(*args) + small fetch sync."""
    import jax
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        outs = fn(*args)
        jax.device_get(outs[sync_leaf][:1])
        best = min(best, time.time() - t0)
    return best


def replay():
    import jax
    from superdsm_tpu.dsm import solver
    calls = _load_calls()
    print(f'{len(calls)} captured calls')
    total_by = {}
    for fname, kind, arrs, scalars in calls:
        fn = {'dsm': solver._solve_dsm_packed,
              'poly': solver._solve_poly_packed,
              'dsm-m': solver._solve_dsm_packed_mask,
              'poly-m': solver._solve_poly_packed_mask}[kind]
        B, P = (arrs['pix'].shape[:2] if 'pix' in arrs
                else (arrs['mb'].shape[0], arrs['yq'].shape[1]))
        K = arrs['sub'].shape[1] if kind.startswith('dsm') else 0
        n_warm = int(arrs['use_warm'].sum()) if kind.startswith('dsm') else 0
        nbytes = sum(a.nbytes for a in arrs.values())

        # transfer: device_put all arrays, synced by a tiny fetch
        args_host = _args_for(kind, arrs, scalars)
        t_put = np.inf
        for _ in range(3):
            t0 = time.time()
            placed = [jax.device_put(a) if isinstance(a, np.ndarray) else a
                      for a in args_host]
            jax.device_get(jax.numpy.asarray(placed[0])[0, 0])
            t_put = min(t_put, time.time() - t0)

        # warm the program + measure at several maxiter values with
        # pre-placed args (pure device compute + fetch latency)
        def at(mi):
            args = list(placed)
            args[ARGS_BY_KIND[kind].index('maxiter')] = mi
            return _time_call(fn, args)

        at(1)  # throwaway: first-run program load
        t0i = at(0)
        t1 = at(1)
        t5 = at(5)
        t_full = at(int(scalars['maxiter']))
        per_iter = (t5 - t1) / 4 if t5 > t1 else 0.0
        print(f'{fname}: B={B} P={P} K={K} warm={n_warm}/{B} '
              f'{nbytes / 1e6:.2f}MB | put={t_put:.3f} mi0={t0i:.3f} '
              f'mi1={t1:.3f} mi5={t5:.3f} full({int(scalars["maxiter"])})={t_full:.3f} '
              f'per_iter~{per_iter * 1000:.2f}ms')
        key = (kind, P, K)
        agg = total_by.setdefault(key, dict(put=0.0, fixed=0.0, full=0.0, n=0))
        agg['put'] += t_put
        agg['fixed'] += t0i
        agg['full'] += t_full
        agg['n'] += 1
    print('\nper-shape totals (s):')
    for key, agg in sorted(total_by.items()):
        print(f'  {key}: n={agg["n"]} put={agg["put"]:.3f} '
              f'fixed={agg["fixed"]:.3f} full={agg["full"]:.3f} '
              f'iter_part={agg["full"] - agg["fixed"]:.3f}')
    print(f'\nTOTALS: put={sum(a["put"] for a in total_by.values()):.3f} '
          f'fixed={sum(a["fixed"] for a in total_by.values()):.3f} '
          f'full={sum(a["full"] for a in total_by.values()):.3f}')


def outputs():
    """Fetches the full outputs of every captured call at its real maxiter
    and saves them (for A/B diffing across solver-config variants)."""
    import jax
    from superdsm_tpu.dsm import solver
    path = sys.argv[2]
    calls = _load_calls()
    dump = {}
    for fname, kind, arrs, scalars in calls:
        fn = {'dsm': solver._solve_dsm_packed,
              'poly': solver._solve_poly_packed,
              'dsm-m': solver._solve_dsm_packed_mask,
              'poly-m': solver._solve_poly_packed_mask}[kind]
        outs = jax.device_get(fn(*_args_for(kind, arrs, scalars)))
        for i, o in enumerate(outs):
            dump[f'{fname}:{i}'] = np.asarray(o)
    np.savez_compressed(path, **dump)
    print(f'saved {len(dump)} output leaves to {path}')


def diff():
    a = np.load(sys.argv[2])
    b = np.load(sys.argv[3])
    for key in a.files:
        x, y = a[key], b[key]
        if x.shape != y.shape:
            print(f'{key}: SHAPE {x.shape} vs {y.shape}')
            continue
        if np.array_equal(x, y):
            continue
        xf = x.astype(np.float64)
        yf = y.astype(np.float64)
        denom = np.maximum(np.abs(xf), 1e-30)
        rel = np.abs(xf - yf) / denom
        print(f'{key}: n_diff={np.sum(x != y)}/{x.size} '
              f'max_rel={np.nanmax(rel):.3g} mean_rel={np.nanmean(rel):.3g}')


if __name__ == '__main__':
    {'capture': capture, 'replay': replay,
     'outputs': outputs, 'diff': diff}[sys.argv[1]]()
