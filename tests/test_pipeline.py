"""End-to-end pipeline tests on synthetic images.

Replaces the reference's golden-image integration test
(``/root/reference/tests/test_render.py``) with a self-contained synthetic
fixture and tolerance-based assertions — the reference itself keeps
per-hostname goldens because exact outputs are backend-sensitive
(cf. SURVEY.md section 4).
"""

import numpy as np
import pytest

from superdsm_tpu.pipeline import create_default_pipeline, create_pipeline, Stage
from superdsm_tpu.config import Config


def synthetic_blobs(seed=0, H=120, W=120,
                    blobs=((40, 40, 14), (40, 66, 12), (90, 90, 14))):
    rng = np.random.RandomState(seed)
    rr, cc = np.indices((H, W))
    g = np.zeros((H, W), np.float32)
    for (r0, c0, rad) in blobs:
        g += np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * (rad * 0.7) ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.02
    return g


@pytest.fixture(scope='module')
def result():
    pipeline = create_default_pipeline()
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 6
    cfg['global-energy-minimization/beta'] = 0.5
    data, cfg_used, timings = pipeline.process_image(synthetic_blobs(), cfg)
    return data, cfg_used, timings


def test_three_blobs_segmented(result):
    data, _, _ = result
    objects = data['postprocessed_objects']
    assert len(objects) == 3
    centers = sorted((tuple((o.fg_offset + np.array(o.fg_fragment.shape) / 2).round())
                      for o in objects))
    expected = sorted([(40, 40), (40, 66), (90, 90)])
    for (r, c), (er, ec) in zip(centers, expected):
        assert abs(r - er) <= 4 and abs(c - ec) <= 4


def test_touching_blobs_split(result):
    """The two touching blobs must land in one cluster but two objects."""
    data, _, _ = result
    clusters = data['clusters']
    assert data['atoms'].max() >= 3
    # touching pair shares a cluster
    assert clusters[40, 40] == clusters[40, 66]
    assert clusters[40, 40] != clusters[90, 90]


def test_pipeline_outputs_present(result):
    data, _, timings = result
    for key in ('g_raw', 'y', 'dsm_cfg', 'y_mask', 'atoms', 'adjacencies',
                'seeds', 'clusters', 'y_img', 'cover', 'objects',
                'performance', 'postprocessed_objects'):
        assert key in data, key
    assert set(timings.keys()) == {'preprocess', 'dsm', 'c2f-region-analysis',
                                   'global-energy-minimization', 'postprocess'}


def test_partial_execution(result):
    data, _, _ = result
    pipeline = create_default_pipeline()
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 6
    cfg['global-energy-minimization/beta'] = 0.5
    partial, _, _ = pipeline.process_image(synthetic_blobs(), cfg,
                                           last_stage='c2f-region-analysis')
    assert 'atoms' in partial and 'cover' not in partial
    resumed, _, _ = pipeline.process_image(
        synthetic_blobs(), cfg, first_stage='global-energy-minimization', data=partial)
    assert len(resumed['postprocessed_objects']) == len(data['postprocessed_objects'])


def test_empty_image():
    pipeline = create_default_pipeline()
    data, _, _ = pipeline.process_image(
        np.random.RandomState(1).randn(60, 60).astype(np.float32) * 0.01 + 0.5,
        Config())
    assert data['postprocessed_objects'] == []


def test_create_pipeline_orders_stages():
    class A(Stage):
        def __init__(self):
            super().__init__('a', inputs=['g_raw'], outputs=['x'])

    class B(Stage):
        def __init__(self):
            super().__init__('b', inputs=['x'], outputs=['z'])

    pipeline = create_pipeline([B(), A()])
    assert [s.name for s in pipeline.stages] == ['a', 'b']

    class C(Stage):
        def __init__(self):
            super().__init__('c', inputs=['missing'], outputs=[])

    with pytest.raises(ValueError):
        create_pipeline([A(), C()])


def test_stage_disabled():
    pipeline = create_default_pipeline()
    cfg = Config()
    cfg['postprocess/enabled'] = False
    data, _, timings = pipeline.process_image(synthetic_blobs(), cfg)
    assert 'postprocessed_objects' not in data
    assert timings['postprocess'] == 0


def test_isbi24_pruning_matches_exact():
    """Both pruning modes must produce the same objects on an easy image."""
    cfg_base = {'c2f-region-analysis/min_atom_radius': 6,
                'global-energy-minimization/beta': 0.5}
    results = {}
    for mode in ('exact', 'isbi24'):
        pipeline = create_default_pipeline()
        cfg = Config()
        for key, value in cfg_base.items():
            cfg[key] = value
        cfg['global-energy-minimization/pruning'] = mode
        data, _, _ = pipeline.process_image(synthetic_blobs(), cfg)
        results[mode] = sorted(
            (tuple(o.fg_offset), int(o.fg_fragment.sum()))
            for o in data['postprocessed_objects'])
    assert results['exact'] == results['isbi24']


def test_warm_start_equivalence():
    """Warm-started generation candidates must not change the solution
    (the convex programs have unique optima)."""
    import superdsm_tpu.objects as OBJ
    pipeline = create_default_pipeline()
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 6
    cfg['global-energy-minimization/beta'] = 0.5
    data_warm, _, _ = pipeline.process_image(synthetic_blobs(), cfg)

    orig = OBJ._warm_start_params
    OBJ._warm_start_params = lambda obj, problem: None
    try:
        data_cold, _, _ = pipeline.process_image(synthetic_blobs(), cfg)
    finally:
        OBJ._warm_start_params = orig
    masks_warm = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                        for o in data_warm['postprocessed_objects'])
    masks_cold = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                        for o in data_cold['postprocessed_objects'])
    assert masks_warm == masks_cold


def test_three_atom_cluster_generations():
    """Three touching nuclei in a row: one cluster with >= 3 atoms exercises
    the generation loop (footprint growth, pruning, warm starts)."""
    rng = np.random.RandomState(2)
    H, W = 110, 160
    rr, cc = np.indices((H, W))
    g = np.zeros((H, W), np.float32)
    for c0 in (40, 80, 120):
        g += np.exp(-(((rr - 55) ** 2 + (cc - c0) ** 2) / (2 * 10.0 ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.02
    pipeline = create_default_pipeline()
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 5
    cfg['global-energy-minimization/beta'] = 0.5
    data, _, _ = pipeline.process_image(g, cfg)
    adjacencies = data['adjacencies']
    clusters = sorted(len(adjacencies.get_atoms_in_cluster(c))
                      for c in adjacencies.cluster_labels)
    assert clusters[-1] >= 3, clusters  # the row forms one multi-atom cluster
    objects = data['postprocessed_objects']
    assert len(objects) == 3
    centers = sorted(tuple((o.fg_offset + np.array(o.fg_fragment.shape) / 2).round())
                     for o in objects)
    for (r, c), ec in zip(centers, (40, 80, 120)):
        assert abs(r - 55) <= 4 and abs(c - ec) <= 4
    # the generation machinery must have computed candidates beyond singletons
    assert any(len(obj.footprint) > 1 for obj in data['objects'])


def test_accuracy_vs_reference_goldens():
    """End-to-end accuracy gate against the ACTUAL reference implementation:
    one synthetic image through automation + rasterization, matched against
    the committed goldens produced by running the unmodified reference
    (tools/refshim/run_reference.py; see VALIDATION.md)."""
    import pathlib
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.io import imread
    from superdsm_tpu.metrics import dice
    from superdsm_tpu.render import rasterize_labels

    repo = pathlib.Path(__file__).parents[1]
    img_path = repo / 'examples/data/synthetic/img-0.png'
    if not img_path.exists():
        import subprocess, sys
        subprocess.run([sys.executable,
                        str(repo / 'examples/synthetic/generate.py')], check=True)

    g_raw = imread(str(img_path))
    cfg = Config({'AF_scale': 12,
                  'global-energy-minimization': {'AF_beta': 1.5}})
    pipeline = create_default_pipeline()
    data, _, _ = process_image(pipeline, cfg, np.asarray(g_raw))
    seg = rasterize_labels(data)

    ref = np.asarray(imread(
        str(repo / 'tests/regression/expected/reference-synthetic/seg/img-0.png'),
        as_gray=False))
    assert seg.max() == ref.max() == 12  # same object count
    assert dice(seg, ref) > 0.97

    sys_path = str(repo / 'tests' / 'regression')
    import sys
    if sys_path not in sys.path:
        sys.path.insert(0, sys_path)
    from validate import summarize_label_map, load_csv, match_rows
    rows = summarize_label_map(seg)
    expected = load_csv(str(repo / 'tests/regression/expected/reference-synthetic/img-0.png.csv'))
    matched, spurious, missing = match_rows(rows, expected,
                                            center_tol=3.0, size_tol=0.1)
    assert not spurious and not missing, (spurious, missing)


def test_c2f_speculation_identical(monkeypatch):
    """Speculative pre-solving of the next split level must not change the
    c2f outputs — speculation only seeds the energy cache with masks the
    split loop would solve anyway (one device round earlier)."""
    import superdsm_tpu.c2freganal as c2f

    def run():
        pipeline = create_default_pipeline()
        cfg = Config()
        cfg['c2f-region-analysis/min_atom_radius'] = 6
        cfg['global-energy-minimization/beta'] = 0.5
        data, _, _ = pipeline.process_image(synthetic_blobs(), cfg)
        return data

    monkeypatch.setattr(c2f, '_SPECULATE', False)
    data_off = run()
    monkeypatch.setattr(c2f, '_SPECULATE', True)
    data_on = run()

    assert np.array_equal(data_on['atoms'], data_off['atoms'])
    assert np.array_equal(data_on['clusters'], data_off['clusters'])
    assert len(data_on['postprocessed_objects']) == \
        len(data_off['postprocessed_objects'])
    fp_on = sorted(tuple(sorted(o.original.footprint))
                   for o in data_on['postprocessed_objects'])
    fp_off = sorted(tuple(sorted(o.original.footprint))
                    for o in data_off['postprocessed_objects'])
    assert fp_on == fp_off


def test_nonfinite_pixels_sanitized():
    """Dead/hot camera pixels (NaN / inf) must not collapse the
    normalization and silently empty the segmentation."""
    g = synthetic_blobs()
    g_bad = g.copy()
    g_bad[5, 5] = np.nan
    g_bad[100, 100] = np.inf
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 6
    cfg['global-energy-minimization/beta'] = 0.5
    data, _, _ = create_default_pipeline().process_image(g_bad, cfg)
    assert len(data['postprocessed_objects']) == 3
