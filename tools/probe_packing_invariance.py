#!/usr/bin/env python
"""Which packing dimensions change a lane's solve trajectory on this
backend? (VERDICT r4 item 2 groundwork.)

Replays captured dsm chunks (``capture_replay.py capture``) under
controlled packing perturbations and reports, per variant, whether the
REAL lanes' energies and iteration counts stay bitwise identical:

* ``identity``  — same arrays again (sanity: must be identical)
* ``pad2B``     — batch padded to 2B with production padding rows
* ``compose``   — another real lane's data replaced (composition swap);
                  only the untouched lanes are compared
* ``permute``   — real lanes reversed (compared via the permutation)
* ``padP``      — pixel bucket padded to the next ladder bucket
                  (the SDSM_DROP_BUCKETS repack class, at lane level)

Usage::

    python tools/capture_replay.py capture      # once, on the TPU
    python tools/probe_packing_invariance.py [--max-calls 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capture_replay import _load_calls, _args_for, ARGS_BY_KIND


def _run(kind, args):
    import jax
    from superdsm_tpu.dsm import solver
    fn = {'dsm-m': solver._solve_dsm_packed_mask,
          'dsm': solver._solve_dsm_packed}[kind]
    outs = fn(*args)
    f, it = jax.device_get((outs[1], outs[6]))
    return np.asarray(f), np.asarray(it)


def _pad_rows(kind, names, args, extra, cutoff):
    out = []
    for name, val in zip(names, args):
        if not (isinstance(val, np.ndarray) and val.ndim >= 1):
            out.append(val)
            continue
        if name == 'denom':
            out.append(val)
            continue
        pad_shape = (extra,) + val.shape[1:]
        if name == 'wd':
            pad = np.ones(pad_shape, val.dtype)
        elif name == 'sub':
            pad = np.full(pad_shape, -10 * (cutoff + 1), val.dtype)
        elif name == 'use_warm':
            pad = np.full(pad_shape, bool(val.all()), val.dtype)
        elif name == 'alpha':
            pad = np.full(pad_shape, val[0], val.dtype)
        elif name == 'epsilon' and val.ndim:
            pad = np.full(pad_shape, val[0], val.dtype)
        else:
            pad = np.zeros(pad_shape, val.dtype)
        out.append(np.concatenate([val, pad], axis=0))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--max-calls', type=int, default=4)
    args_ns = parser.parse_args()

    from superdsm_tpu.dsm.batching import P_BUCKETS
    from superdsm_tpu.dsm.solver import MASK_BITS_PER_PIXEL

    calls = [c for c in _load_calls() if c[1] in ('dsm-m', 'dsm')]
    calls = calls[:args_ns.max_calls]
    if not calls:
        print('no captured dsm calls — run capture first')
        return

    for fname, kind, arrs, scalars in calls:
        names = ARGS_BY_KIND[kind]
        base_args = _args_for(kind, arrs, scalars)
        cutoff = int(scalars['cutoff'])
        cnt = arrs['cnt']
        real = np.nonzero(cnt > 0)[0]
        B = len(cnt)
        f0, it0 = _run(kind, base_args)
        n_stall = int((it0[real] >= int(scalars['maxiter'])).sum())
        print(f'\n{fname}: B={B} real={len(real)} P={arrs["yq"].shape[1]} '
              f'K={arrs["sub"].shape[1]} maxiter-lanes={n_stall}')

        def check(tag, variant_args, lane_map=None):
            f, it = _run(kind, variant_args)
            lanes = real if lane_map is None else lane_map
            src = real if lane_map is None else real
            fe = np.array_equal(f[lanes], f0[src])
            ite = np.array_equal(it[lanes], it0[src])
            max_rel = float(np.max(np.abs(
                (np.asarray(f[lanes], np.float64) - np.asarray(f0[src], np.float64))
                / np.maximum(1e-30, np.abs(f0[src]))))) if len(src) else 0.0
            print(f'  {tag:9s} energies_bitwise={fe} iters_equal={ite} '
                  f'max_rel_drift={max_rel:.2e}')
            return fe and ite

        # identity
        check('identity', [np.array(a) if isinstance(a, np.ndarray) else a
                           for a in base_args])
        # pad2B
        check('pad2B', _pad_rows(kind, names, base_args, B, cutoff))
        # compose: overwrite the LAST real lane with a copy of the first
        if len(real) >= 2:
            comp = [np.array(a) if isinstance(a, np.ndarray) else a
                    for a in base_args]
            i_src, i_dst = real[0], real[-1]
            for name, val in zip(names, comp):
                if isinstance(val, np.ndarray) and val.ndim >= 1 \
                        and name != 'denom':
                    val[i_dst] = val[i_src]
            untouched = real[:-1]
            f, it = _run(kind, comp)
            fe = np.array_equal(f[untouched], f0[untouched])
            ite = np.array_equal(it[untouched], it0[untouched])
            print(f'  {"compose":9s} energies_bitwise={fe} iters_equal={ite}')
        # permute: reverse ALL rows (padding included keeps shapes valid)
        perm = np.arange(B)[::-1]
        permuted = []
        for name, val in zip(names, base_args):
            if isinstance(val, np.ndarray) and val.ndim >= 1 and name != 'denom':
                permuted.append(np.array(val[perm]))
            else:
                permuted.append(val)
        f, it = _run(kind, permuted)
        fe = np.array_equal(f[perm[real]][np.argsort(real)] if False else f[B - 1 - real], f0[real])
        ite = np.array_equal(it[B - 1 - real], it0[real])
        print(f'  {"permute":9s} energies_bitwise={fe} iters_equal={ite}')
        # padP: next pixel bucket
        P = arrs['yq'].shape[1]
        bigger = [pb for pb in P_BUCKETS if pb > P]
        if bigger and kind == 'dsm-m':
            P2 = bigger[0]
            padded = []
            for name, val in zip(names, base_args):
                if name == 'yq':
                    ext = np.zeros((B, P2 - P), val.dtype)
                    padded.append(np.concatenate([val, ext], axis=1))
                elif name == 'mb':
                    nb2 = (P2 * MASK_BITS_PER_PIXEL) // 8
                    ext = np.zeros((B, nb2 - val.shape[1]), val.dtype)
                    padded.append(np.concatenate([val, ext], axis=1))
                else:
                    padded.append(val)
            check(f'padP{P2}', padded)


if __name__ == '__main__':
    main()
