"""Host/device-overlapped processing of image streams.

A single image alternates between host phases (watersheds, combinatorics,
packing) and device phases (batched solves); each leaves the other side
idle. Processing a stream with a small thread pool overlaps image i's host
work with image j's device work — numpy/scipy release the GIL in their hot
loops and JAX releases it while blocking on the device, so two or three
Python threads suffice to keep both sides busy. Each thread uses its own
pipeline instance (stage callbacks and per-image caches are not shared);
the jit executable caches are process-wide and thread-safe.

This is the throughput path for batch processing (the reference instead
runs one Ray worker pool per task, ``/root/reference/superdsm/batch.py:261``).
"""

from concurrent.futures import ThreadPoolExecutor

from ..output import get_output


def process_images_pipelined(pipeline_factory, base_cfg, images, threads=2,
                             process_image=None, out=None, devices=None):
    """Segments a list of images with host/device overlap.

    :param pipeline_factory: Zero-arg callable creating a fresh pipeline per
        worker thread.
    :param base_cfg: Hyperparameters (copied per image).
    :param images: Iterable of raw images.
    :param threads: Worker threads (2-3 per device is enough; more adds GIL
        contention).
    :param process_image: Override for the per-image entry point; defaults to
        :func:`superdsm_tpu.automation.process_image`.
    :param devices: Optional list of devices for image-level data
        parallelism on a multi-chip host: worker threads round-robin onto
        the devices (each thread pins its solves with
        :class:`~superdsm_tpu.dsm.batching.device_scope`), so N chips
        process N images concurrently. With the default ``None`` all
        threads share the jit default device (single-chip host/device
        overlap).
    :return: List of pipeline ``data`` dicts, aligned with ``images``.
    """
    from ..automation import process_image as _process_image
    from ..dsm.batching import device_scope, thread_device_assigner
    run_one = process_image or _process_image
    out = get_output(out)

    import threading
    local = threading.local()
    assigner = thread_device_assigner(devices) if devices else None

    def worker(args):
        idx, img = args
        if not hasattr(local, 'pipeline'):
            local.pipeline = pipeline_factory()
            local.device = assigner() if assigner else None
        cfg = base_cfg.copy()
        # split-tree speculation wins latency by spending extra device
        # compute; with several images overlapping the device is already
        # saturated, so the extra compute only costs throughput (~4%
        # measured) — turn it off unless the caller pinned it
        cfg.set_default('c2f-region-analysis/speculate', False)
        muted = out.derive(muted=True)
        if local.device is not None:
            with device_scope(local.device):
                data, _, _ = run_one(local.pipeline, cfg, img, out=muted)
        else:
            data, _, _ = run_one(local.pipeline, cfg, img, out=muted)
        return idx, data

    results = [None] * len(images)
    with ThreadPoolExecutor(max_workers=threads) as pool:
        for idx, data in pool.map(worker, enumerate(images)):
            results[idx] = data
            out.intermediate(f'Processed {idx + 1} / {len(images)} images')
    return results
