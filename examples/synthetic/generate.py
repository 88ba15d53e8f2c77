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
    """Returns ``(image, gt_labels)``. The RNG call sequence is IDENTICAL to
    the original generator (round 1), so the images — and hence all committed
    goldens — are bit-identical; the ground-truth instance labels are derived
    from the same draws (per-nucleus intensity contribution > 0.1, overlaps
    resolved by the strongest contributor; the threshold is calibrated to the
    REFERENCE implementation, not this repo — it maximizes the reference
    pipeline's Dice against the ground truth, 0.94)."""
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
    contrib = np.zeros((len(centers), H, W), np.float32)
    for k, (r0, c0) in enumerate(centers):
        rad = radius * rng.uniform(0.8, 1.2)
        ecc = rng.uniform(0.85, 1.2)
        contrib[k] = rng.uniform(0.6, 1.0) * np.exp(
            -(((rr - r0) / ecc) ** 2 + ((cc - c0) * ecc) ** 2) / (2 * (rad * 0.55) ** 2))
        g += contrib[k]
    g += rng.randn(H, W).astype(np.float32) * 0.02
    if len(centers):
        best = contrib.max(axis=0)
        labels = np.where(best > 0.1, contrib.argmax(axis=0) + 1, 0).astype(np.uint16)
    else:
        labels = np.zeros((H, W), np.uint16)
    return g, labels


def make_image_glare(seed, H=360, W=480, n_nuclei=9, radius=16, n_glare=3):
    """NIH3T3-like variant: nuclei plus small saturated autofluorescence
    glare spots and a background illumination gradient. Exercises the
    postprocessing glare filter (superlevel-set connectivity,
    ``/root/reference/superdsm/postprocess.py:269-286``) and the offset
    background estimation under uneven illumination."""
    g, labels = make_image(seed, H=H, W=W, n_nuclei=n_nuclei, radius=radius)
    rng = np.random.RandomState(seed + 1000)
    rr, cc = np.indices((H, W))
    # illumination gradient (up to +10% across the field)
    g = g + 0.2 * (cc / float(W)) * 0.5
    for _ in range(n_glare):
        r0 = rng.randint(10, H - 10)
        c0 = rng.randint(10, W - 10)
        srad = rng.uniform(2.5, 4.5)
        # steep, saturated profile: bright core with near-flat top
        spot = np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * srad ** 2)))
        g = g + 2.5 * np.minimum(spot * 1.5, 1.0)
    return g.astype(np.float32), labels


def make_image_dim(seed, H=360, W=480, n_nuclei=10, radius=15):
    """GOWT1-like variant: dim, low-contrast nuclei with strongly varied
    per-nucleus brightness (some nearly at the noise floor). Exercises the
    contrast filter and the normalized-energy thresholds on weak signals."""
    rng = np.random.RandomState(seed + 2000)
    g = np.zeros((H, W), np.float32)
    rr, cc = np.indices((H, W))
    centers = []
    attempts = 0
    while len(centers) < n_nuclei and attempts < 2000:
        attempts += 1
        r0 = rng.randint(radius, H - radius)
        c0 = rng.randint(radius, W - radius)
        if all((r0 - r) ** 2 + (c0 - c) ** 2 > (1.6 * radius) ** 2 for r, c in centers):
            centers.append((r0, c0))
    contrib = np.zeros((len(centers), H, W), np.float32)
    for k, (r0, c0) in enumerate(centers):
        rad = radius * rng.uniform(0.85, 1.15)
        # brightness spans 6x: 0.12 (near noise) to 0.7
        amp = rng.uniform(0.12, 0.7)
        contrib[k] = amp * np.exp(
            -(((rr - r0) ** 2 + (cc - c0) ** 2)) / (2 * (rad * 0.55) ** 2))
        g += contrib[k]
    g += rng.randn(H, W).astype(np.float32) * 0.02
    if len(centers):
        best = contrib.max(axis=0)
        labels = np.where(best > 0.05, contrib.argmax(axis=0) + 1, 0).astype(np.uint16)
    else:
        labels = np.zeros((H, W), np.uint16)
    return g.astype(np.float32), labels


DATASETS = {
    'synthetic': (make_image, 4),
    'synthetic-glare': (make_image_glare, 3),
    'synthetic-dim': (make_image_dim, 3),
}


def main():
    from superdsm_tpu.io import imsave
    for name, (maker, count) in DATASETS.items():
        data_dir = pathlib.Path(__file__).parents[1] / 'data' / name
        gt_dir = data_dir / 'gt'
        gt_dir.mkdir(parents=True, exist_ok=True)
        for seed in range(count):
            img, labels = maker(seed)
            imsave(str(data_dir / f'img-{seed}.png'), img, normalize=True)
            imsave(str(gt_dir / f'img-{seed}.png'), labels)
        print(f'Wrote {count} images + ground truth to {data_dir}')


if __name__ == '__main__':
    main()
