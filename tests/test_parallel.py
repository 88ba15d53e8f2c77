"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superdsm_tpu.parallel import make_mesh
from superdsm_tpu.parallel.newton import make_sharded_poly_solver, make_sharded_dsm_solver
from superdsm_tpu.dsm.solver import solve_polynomial_batch


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) >= 8, 'conftest should provide 8 virtual devices'
    return make_mesh(n_batch=4, n_pixel=2)


def _problems(B=8, H=16, W=32, seed=0):
    rng = np.random.RandomState(seed)
    rr, cc = np.indices((H, W))
    coords = np.stack([rr, cc], -1).reshape(-1, 2).astype(np.float32) \
        / np.array([H - 1, W - 1], np.float32)
    P = H * W
    C = np.tile(coords[None], (B, 1, 1))
    Y = np.zeros((B, P), np.float32)
    for b in range(B):
        r0, c0 = rng.randint(4, 12), rng.randint(8, 24)
        Y[b] = ((((rr - r0) ** 2 + (cc - c0) ** 2) < 25).astype(np.float32) - 0.5).reshape(-1)
        Y[b] += rng.randn(P).astype(np.float32) * 0.1
    return C, Y, np.ones((B, P), np.float32)


def test_sharded_poly_matches_single_device(mesh):
    C, Y, W = _problems()
    solver = make_sharded_poly_solver(mesh)
    params, f, conv = jax.block_until_ready(
        solver(jnp.zeros((8, 6), jnp.float32), C, Y, W))
    ref = solve_polynomial_batch(C, Y, W)
    np.testing.assert_allclose(np.asarray(f), ref.energy, rtol=1e-3, atol=1e-4)


def test_sharded_dsm_improves_on_elliptical(mesh):
    B = 8
    C, Y, W = _problems(B=B)
    H, Wd = 16, 32
    rr, cc = np.indices((H, Wd))
    pix = np.tile(np.stack([rr, cc], -1).reshape(-1, 2).astype(np.float32)[None],
                  (B, 1, 1))
    rng = np.random.RandomState(1)
    K = 8
    sub = rng.randint(0, 16, (B, K, 2)).astype(np.float32)
    km = np.ones((B, K), np.float32)
    poly = make_sharded_poly_solver(mesh)
    p_ell, f_ell, _ = poly(jnp.zeros((B, 6), jnp.float32), C, Y, W)
    dsm = make_sharded_dsm_solver(mesh, sigma=3.0, cutoff=12)
    p0 = jnp.concatenate([p_ell, jnp.zeros((B, K), jnp.float32)], axis=1)
    pd, fd, cd = jax.block_until_ready(
        dsm(p0, C, pix, sub, km, Y, W, jnp.full((B,), 0.1, jnp.float32)))
    assert (np.asarray(fd) <= np.asarray(f_ell) + 1e-3).all()


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    params, f, conv = jax.block_until_ready(jax.jit(fn)(*args))
    assert params.shape[0] == 4 and np.isfinite(np.asarray(f)).all()


def test_mosaic_processing():
    import numpy as np
    from superdsm_tpu.parallel.mosaic import process_mosaic, rasterize_mosaic_labels
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.config import Config

    rng = np.random.RandomState(0)
    H, W = 200, 320
    rr, cc = np.indices((H, W))
    centers = [(50, 50), (50, 200), (150, 100), (150, 270)]
    g = np.zeros((H, W), np.float32)
    for (r0, c0) in centers:
        g += np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * 9.0 ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.02

    cfg = Config({'AF_scale': 10})
    objects, n_tiles = process_mosaic(create_default_pipeline(), cfg, g,
                                      tile=(160, 160), halo=48)
    assert n_tiles == 4
    assert len(objects) == len(centers)
    labels = rasterize_mosaic_labels((H, W), objects)
    found = sorted(tuple(np.argwhere(labels == l).mean(0).round().astype(int))
                   for l in range(1, labels.max() + 1))
    for (fr, fc), (er, ec) in zip(found, sorted(centers)):
        assert abs(fr - er) <= 3 and abs(fc - ec) <= 3


def test_mosaic_threads_deterministic():
    """Tile pipelining (threads_per_device > 1) must not change outputs:
    tiles are independent and results are ordered by tile index."""
    import numpy as np
    from superdsm_tpu.parallel.mosaic import process_mosaic, rasterize_mosaic_labels
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.config import Config

    rng = np.random.RandomState(1)
    H, W = 200, 320
    rr, cc = np.indices((H, W))
    g = np.zeros((H, W), np.float32)
    for (r0, c0) in [(50, 50), (50, 200), (150, 100), (150, 270)]:
        g += np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * 9.0 ** 2)))
    g += rng.randn(H, W).astype(np.float32) * 0.02

    cfg = Config({'AF_scale': 10})
    # speculation off in BOTH runs: the overlapping path disables it, and the
    # comparison should isolate threading (speculation identity is covered by
    # test_c2f_speculation_identical)
    cfg['c2f-region-analysis/speculate'] = False
    labels = []
    for threads in (1, 2):
        objects, _ = process_mosaic(create_default_pipeline(), cfg, g,
                                    tile=(160, 160), halo=48,
                                    threads_per_device=threads)
        labels.append(rasterize_mosaic_labels((H, W), objects))
    assert np.array_equal(labels[0], labels[1])


def test_mosaic_halo_guard_warns_on_truncation():
    """A kept object whose extent approaches the halo (or whose mask is
    clipped by the tile crop) must warn loudly instead of silently
    truncating (VERDICT r2 item 8)."""
    import warnings
    import numpy as np
    from superdsm_tpu.parallel.mosaic import process_mosaic
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.config import Config

    rng = np.random.RandomState(0)
    H, W = 160, 160
    rr, cc = np.indices((H, W))
    # one blob with diameter ~ 40 px, processed with halo=24 -> extent >= 0.8*halo
    g = np.exp(-(((rr - 80) ** 2 + (cc - 80) ** 2) / (2 * 12.0 ** 2))).astype(np.float32)
    g += rng.randn(H, W).astype(np.float32) * 0.02

    cfg = Config({'AF_scale': 10})
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        objects, n_tiles = process_mosaic(create_default_pipeline(), cfg, g,
                                          tile=(80, 80), halo=24)
    assert n_tiles == 4
    halo_warnings = [w for w in caught if issubclass(w.category, RuntimeWarning)
                     and 'halo' in str(w.message)]
    assert halo_warnings, 'truncation-risk object did not warn'


def test_pipelined_matches_sequential():
    from superdsm_tpu.parallel.pipelined import process_images_pipelined
    from superdsm_tpu.config import Config
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from tests.test_pipeline import synthetic_blobs

    images = [synthetic_blobs(seed) for seed in (0, 1)]
    cfg = Config()
    cfg['AF_scale'] = 10
    cfg['global-energy-minimization/beta'] = 0.5
    results = process_images_pipelined(create_default_pipeline, cfg, images, threads=2)
    pipe = create_default_pipeline()
    for img, data in zip(images, results):
        # same entry point sequentially (pipelined uses auto-configuration)
        ref, _, _ = process_image(pipe, cfg.copy(), img)
        got = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                     for o in data['postprocessed_objects'])
        want = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                      for o in ref['postprocessed_objects'])
        assert got == want


def test_pipeline_mesh_equivalence():
    """The production pipeline must produce equivalent results whether
    solve_problems runs single-device or sharded over the 8-device mesh
    batch axis (VERDICT item 4: multi-chip in the pipeline, not a demo).

    Equivalence is up to the backend-noise class (VALIDATION.md): the
    SPMD-partitioned program's per-device codegen (local batch 1) differs
    from the single-device program (local batch B), and the creep-truncated
    Newton trajectories snapshot that drift — measured: energies shift
    ~0.1%, one boundary pixel of 14400 flips. Bit-exactness held at the
    pre-2026-08-18 bucket shapes by codegen luck (forcing the single-device
    batch to the mesh's padded size reproduces the single-device result, so
    the drift is partitioned-codegen, not batch padding). Object identity,
    per-object masks (IoU), and energies are pinned tightly instead."""
    import numpy as np
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.config import Config
    from superdsm_tpu.dsm.batching import set_pipeline_mesh
    from superdsm_tpu.render import rasterize_labels
    from superdsm_tpu.parallel import make_mesh

    rng = np.random.RandomState(0)
    rr, cc = np.indices((120, 120))
    g = sum(np.exp(-(((rr - r0) ** 2 + (cc - c0) ** 2) / (2 * (rad * 0.7) ** 2)))
            for r0, c0, rad in [(40, 40, 14), (40, 66, 12), (90, 90, 14)])
    g = (g + rng.randn(120, 120) * 0.02).astype(np.float32)
    cfg = Config()
    cfg['c2f-region-analysis/min_atom_radius'] = 6
    cfg['global-energy-minimization/beta'] = 0.5

    data1, _, _ = create_default_pipeline().process_image(g, cfg)
    seg1 = rasterize_labels(data1)

    set_pipeline_mesh(make_mesh(n_batch=8, n_pixel=1))
    try:
        data8, _, _ = create_default_pipeline().process_image(g, cfg)
    finally:
        set_pipeline_mesh(None)
    seg8 = rasterize_labels(data8)

    assert len(data1['postprocessed_objects']) == len(data8['postprocessed_objects']) == 3
    # same label geometry up to the backend-noise class: every object
    # overlaps its counterpart at IoU >= 0.99 and at most a few boundary
    # pixels differ in total
    assert (seg1 > 0).sum() > 0
    assert int((seg1 != seg8).sum()) <= 10
    for label in range(1, seg1.max() + 1):
        m1 = seg1 == label
        # match by majority overlap (labels may permute)
        label8 = np.bincount(seg8[m1]).argmax()
        assert label8 > 0
        m8 = seg8 == label8
        iou = (m1 & m8).sum() / (m1 | m8).sum()
        assert iou >= 0.99, (label, iou)
    e1 = np.sort([float(o.energy) for o in data1['objects']])
    e8 = np.sort([float(o.energy) for o in data8['objects']])
    np.testing.assert_allclose(e1, e8, rtol=5e-3)


def test_rasterize_mosaic_labels_overlapping_bboxes():
    """A later object's bounding box overlapping an earlier object's mask
    must not erase the earlier object (fill_foreground assigns the whole
    bbox; the mosaic rasterizer must write only masked pixels)."""
    import numpy as np
    from superdsm_tpu.parallel.mosaic import MosaicObject, rasterize_mosaic_labels

    class Obj:
        def __init__(self, off, frag):
            self.fg_offset = np.asarray(off)
            self.fg_fragment = frag

    # two diagonal L-shaped objects with interlocking bounding boxes
    frag_a = np.zeros((6, 6), bool)
    frag_a[:, :2] = True           # vertical bar at cols 0-1
    frag_b = np.zeros((6, 6), bool)
    frag_b[:, 4:] = True           # vertical bar at cols 4-5
    a = MosaicObject(Obj((0, 0), frag_a), (0, 0))
    b = MosaicObject(Obj((0, 3), frag_b), (0, 0))  # bbox covers cols 3-8

    # b's bbox (cols 3-8) does NOT cover a's pixels here; shift so it does:
    b2 = MosaicObject(Obj((0, 0), frag_b), (0, 0))  # bbox cols 0-5 covers a
    labels = rasterize_mosaic_labels((8, 10), [a, b2])
    assert (labels[:6, :2] == 1).all()   # object a intact
    assert (labels[:6, 4:6] == 2).all()  # object b present
    labels2 = rasterize_mosaic_labels((8, 10), [a, b])
    assert (labels2[:6, :2] == 1).all()
    assert (labels2[:6, 7:9] == 2).all()


def test_pipelined_stream_across_devices():
    """Image-level data parallelism: pipelined workers pin distinct devices
    (one image per chip) and produce the same results as the shared-device
    stream."""
    import jax
    import numpy as np
    from superdsm_tpu.parallel.pipelined import process_images_pipelined
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.config import Config

    rng = np.random.RandomState(0)
    rr, cc = np.indices((100, 100))
    images = []
    for i in range(4):
        g = np.exp(-(((rr - 40 - 3 * i) ** 2 + (cc - 50) ** 2) / (2 * 9.0 ** 2)))
        images.append((g + rng.randn(100, 100).astype(np.float32) * 0.01)
                      .astype(np.float32))
    cfg = Config({'AF_scale': 9})

    shared = process_images_pipelined(create_default_pipeline, cfg, images,
                                      threads=2)
    devices = jax.devices()[:4]
    assert len(devices) == 4  # conftest provides 8 virtual CPU devices
    per_chip = process_images_pipelined(create_default_pipeline, cfg, images,
                                        threads=4, devices=devices)
    for a, b in zip(shared, per_chip):
        ma = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                    for o in a['postprocessed_objects'])
        mb = sorted((tuple(o.fg_offset), int(o.fg_fragment.sum()))
                    for o in b['postprocessed_objects'])
        assert ma == mb


def test_mask_program_shards_over_pipeline_mesh():
    """The bit-packed mask program (the production TPU transfer format) is
    SPMD-shardable over the mesh batch axis: the sort-based compaction is
    per-lane, so the partitioner splits it with no cross-device traffic.
    Equivalence is up to the SPMD backend-noise class pinned by
    ``test_pipeline_mesh_equivalence``: the partitioned codegen (local
    batch 1) rounds differently from the single-device program, and the
    creep-truncated trajectories snapshot that drift (measured here:
    energies ~2e-7 rel, params ~1e-3 rel, foreground/flags identical)."""
    from jax.sharding import NamedSharding, PartitionSpec
    from superdsm_tpu.dsm import solver
    from superdsm_tpu.dsm.batching import make_problem
    from superdsm_tpu.image import Image

    mesh = make_mesh(n_batch=8, n_pixel=1)
    rng = np.random.RandomState(5)
    B, pb = 8, 512
    nbytes = (pb * solver.MASK_BITS_PER_PIXEL) // 8
    MB = np.zeros((B, nbytes), np.uint8)
    WD = np.ones(B, np.int32)
    CNT = np.zeros(B, np.int32)
    YQ = np.zeros((B, pb), np.int16)
    YS = np.ones(B, np.float32)
    OFF = np.zeros((B, 2), np.int32)
    H, W = 24, 40
    for j in range(B):
        rr, cc = np.indices((H, W))
        m = ((rr - rng.randint(8, 16)) ** 2 + (cc - rng.randint(10, 30)) ** 2) < 40
        img = rng.rand(H, W).astype(np.float32) - 0.4
        p = make_problem(Image(model=img, mask=m), img_shape=(H, W),
                         smooth_amount=np.inf)
        pm = p.packed_mask
        MB[j, :len(pm)] = pm
        WD[j] = p.crop_shape[1]
        CNT[j] = p.n_pixels
        YQ[j, :p.n_pixels] = p.yq
        YS[j] = p.yscale
        OFF[j] = p.offset
    denom = np.array([H - 1.0, W - 1.0], np.float32)
    P0 = np.zeros((B, 6), np.float32)

    args = (MB, WD, OFF, CNT, YQ, YS, denom, P0, 30, 1e-5)
    base = jax.device_get(solver._solve_poly_packed_mask(*args))

    def place(a):
        a = np.asarray(a)
        if a.ndim == 0 or a.shape[0] != B:
            return a
        spec = PartitionSpec('batch', *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    sharded_args = tuple(place(a) if isinstance(a, np.ndarray) else a
                         for a in args)
    sharded = jax.device_get(solver._solve_poly_packed_mask(*sharded_args))
    b_params, b_f, b_conv, b_bad, b_fg, b_it = map(np.asarray, base)
    s_params, s_f, s_conv, s_bad, s_fg, s_it = map(np.asarray, sharded)
    np.testing.assert_allclose(s_f, b_f, rtol=1e-4, atol=1e-5)
    assert np.array_equal(s_conv, b_conv)
    assert np.array_equal(s_bad, b_bad)
    assert np.array_equal(s_fg, b_fg)


def test_parse_mesh_spec_and_env_apply(monkeypatch):
    """The user surface for multi-chip (VERDICT r3 item 2b): mesh specs
    parse, install via SUPERDSM_TPU_MESH, and uninstall cleanly."""
    import superdsm_tpu.parallel.mesh as pm
    from superdsm_tpu.dsm.batching import get_pipeline_mesh, set_pipeline_mesh

    assert dict(pm.parse_mesh_spec('8').shape) == {'batch': 8, 'pixel': 1}
    assert dict(pm.parse_mesh_spec('batch:4').shape) == {'batch': 4, 'pixel': 1}
    assert dict(pm.parse_mesh_spec('batch:4,pixel:2').shape) == \
        {'batch': 4, 'pixel': 2}
    assert pm.parse_mesh_spec('') is None
    with pytest.raises(ValueError):
        pm.parse_mesh_spec('bogus:2')

    monkeypatch.setenv('SUPERDSM_TPU_MESH', 'batch:8')
    monkeypatch.setattr(pm, '_APPLIED_SPEC', None)
    try:
        mesh = pm.apply_env_mesh()
        assert dict(mesh.shape) == {'batch': 8, 'pixel': 1}
        assert get_pipeline_mesh() is mesh
        # idempotent: a second call (another task/thread) reuses the install
        assert pm.apply_env_mesh() is mesh
    finally:
        set_pipeline_mesh(None)
        pm._APPLIED_SPEC = None


def test_batch_cli_mesh_flag_rejects_bad_spec(tmp_path):
    """--mesh validates eagerly with a parser error (no half-run task)."""
    from superdsm_tpu.batch import run_cli
    with pytest.raises(SystemExit):
        run_cli([str(tmp_path), '--mesh', 'nonsense'])


@pytest.mark.skipif(os.environ.get('SDSM_SLOW_TESTS') != '1',
                    reason='two full bench-scale pipeline runs; '
                           'run via tools/run_slow_gates.py')
def test_pipeline_mesh_equivalence_bench_scale(monkeypatch):
    """Mesh-vs-single equivalence at REALISTIC scale (VERDICT r3 item 2a):
    the bench-sized synthetic field (520x696, ~28 nuclei, multi-atom
    clusters) through the FULL production pipeline (automation + scale
    estimation) at mesh None vs batch:8, with the production TPU transfer
    format forced on (SDSM_MASK_TRANSFERS=1) so the 'dsm-m'/'poly-m'
    program kinds shard — not the 120x120 three-object toy.

    Equivalence bar: batch padding to the mesh minimum and SPMD-partitioned
    codegen shift the creep-truncated trajectories (the recompile-drift
    class measured by tools/ab_decision_drift.py: converged-class energies
    ~1e-3 rel; SEPARABLE junk/background solves are chaotic — measured
    43.9 vs 1174 for one junk singleton across batch shapes, solver.py
    scale-sweep note). Real-object decisions are pinned exactly; ONE
    junk-class flip (a postprocess energy discard of a high-energy
    background object straddling max_norm_energy) is tolerated — the same
    class the reference absorbs with per-hostname goldens."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_image
    from superdsm_tpu.pipeline import create_default_pipeline
    from superdsm_tpu.automation import process_image
    from superdsm_tpu.config import Config
    from superdsm_tpu.output import get_output
    from superdsm_tpu.render import rasterize_labels
    from superdsm_tpu.dsm.batching import set_pipeline_mesh

    monkeypatch.setenv('SDSM_MASK_TRANSFERS', '1')
    out = get_output(None).derive(muted=True)
    g, _ = make_image(0)

    data1, _, _ = process_image(create_default_pipeline(),
                                Config({'AF_scale': 12}), g, out=out)
    seg1 = rasterize_labels(data1)

    set_pipeline_mesh(make_mesh(n_batch=8, n_pixel=1))
    try:
        data8, _, _ = process_image(create_default_pipeline(),
                                    Config({'AF_scale': 12}), g, out=out)
    finally:
        set_pipeline_mesh(None)
    seg8 = rasterize_labels(data8)

    n1 = len(data1['postprocessed_objects'])
    n8 = len(data8['postprocessed_objects'])
    assert abs(n1 - n8) <= 1 and n1 >= 20, (n1, n8)

    a, b = seg1 > 0, seg8 > 0
    fg_iou = (a & b).sum() / max(1, (a | b).sum())
    # one flipped junk object is a few percent of the total foreground
    # (measured 0.946 with the flip present, ~0.99 without)
    assert fg_iou >= 0.92, fg_iou
    # Measured IoU structure (2026-08-20): the ~5 LM-stalling solves
    # (high-energy ambiguous fits; the chaotic class) have IoU 0.79-0.95
    # and one may flip its postprocess discard entirely; the remaining
    # objects sit at IoU >= 0.95.
    ious = []
    for label in range(1, seg1.max() + 1):
        m1 = seg1 == label
        if not m1.any():
            continue
        label8 = np.bincount(seg8[m1]).argmax()
        m8 = seg8 == label8
        ious.append((m1 & m8).sum() / (m1 | m8).sum() if label8 > 0 else 0.0)
    ious = np.asarray(ious)
    assert (ious < 0.5).sum() <= 1, ious[ious < 0.5]     # at most the one flip
    assert (ious < 0.9).sum() <= 5, sorted(ious[ious < 0.9])
    assert float(np.median(ious)) >= 0.95, float(np.median(ious))

    # the candidate sets must agree in size (same atoms/universes/candidate
    # structure); energies themselves are NOT pinned — rank-pairing breaks
    # down once one chaotic-class solve reorders the sorted list
    e1 = [float(o.energy) for o in data1['objects'] if o.energy is not None]
    e8 = [float(o.energy) for o in data8['objects'] if o.energy is not None]
    assert len(e1) == len(e8)
