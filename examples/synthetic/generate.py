#!/usr/bin/env python
"""Generates the self-contained synthetic example dataset.

The reference ships task trees for five public microscopy datasets and
downloads the data on demand (``/root/reference/examples/load_data.py``);
this environment has no network egress, so this example generates a
deterministic synthetic fluorescence dataset of comparable structure
(isolated and touching nuclei, intensity variation, noise) into
``examples/data/synthetic/``. The committed regression goldens in
``tests/regression/expected/synthetic/`` correspond to exactly this data.
"""

import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parents[2]))


def make_image(seed, H=360, W=480, n_nuclei=12, radius=16):
    rng = np.random.RandomState(seed)
    g = np.zeros((H, W), np.float32)
    rr, cc = np.indices((H, W))
    centers = []
    attempts = 0
    while len(centers) < n_nuclei and attempts < 2000:
        attempts += 1
        r0 = rng.randint(radius, H - radius)
        c0 = rng.randint(radius, W - radius)
        if all((r0 - r) ** 2 + (c0 - c) ** 2 > (1.4 * radius) ** 2 for r, c in centers):
            centers.append((r0, c0))
    for (r0, c0) in centers:
        rad = radius * rng.uniform(0.8, 1.2)
        ecc = rng.uniform(0.85, 1.2)
        g += rng.uniform(0.6, 1.0) * np.exp(
            -(((rr - r0) / ecc) ** 2 + ((cc - c0) * ecc) ** 2) / (2 * (rad * 0.55) ** 2))
    g += rng.randn(H, W).astype(np.float32) * 0.02
    return g


def main():
    from superdsm_tpu.io import imsave
    data_dir = pathlib.Path(__file__).parents[1] / 'data' / 'synthetic'
    data_dir.mkdir(parents=True, exist_ok=True)
    for seed in range(4):
        imsave(str(data_dir / f'img-{seed}.png'), make_image(seed), normalize=True)
    print(f'Wrote 4 images to {data_dir}')


if __name__ == '__main__':
    main()
