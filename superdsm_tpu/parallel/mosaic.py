"""Tiled processing of large stitched mosaics.

The reference caps its memory/compute through per-cluster decomposition but
still preprocesses whole frames; a 4K+ stitched mosaic exceeds what a single
pipeline invocation should hold. Here the mosaic is split into overlapping
tiles, each tile runs the standard pipeline (reusing the same compiled bucket
shapes), and objects are kept iff their centroid falls into the tile's core
region — a halo of ``halo`` pixels guarantees every object is seen whole by
the tile that owns its centroid, so the union over tiles is exact for
objects with diameter < ``halo``.

Tiles are independent: on a multi-chip system they map onto the mesh batch
axis (one tile per chip via per-tile pipeline invocations from host
threads); on one chip they run sequentially with warm caches.
"""

import numpy as np

from ..config import Config
from ..output import get_output
from ..objects import BaseObject


class MosaicObject(BaseObject):
    """A postprocessed object translated into mosaic coordinates."""

    def __init__(self, original, offset):
        self.original = original
        self.fg_fragment = original.fg_fragment
        self.fg_offset = np.asarray(original.fg_offset) + np.asarray(offset)


def _tile_grid(shape, tile, halo):
    """Yields ``(core_slice, padded_slice)`` pairs covering ``shape``."""
    H, W = shape
    th, tw = tile
    for r0 in range(0, H, th):
        for c0 in range(0, W, tw):
            r1, c1 = min(r0 + th, H), min(c0 + tw, W)
            pr0, pc0 = max(0, r0 - halo), max(0, c0 - halo)
            pr1, pc1 = min(H, r1 + halo), min(W, c1 + halo)
            yield (np.s_[r0:r1, c0:c1], np.s_[pr0:pr1, pc0:pc1])


def process_mosaic(pipeline, cfg, g_raw, tile=(1024, 1024), halo=160, out=None):
    """Segments a large mosaic tile by tile.

    :param pipeline: A :class:`~superdsm_tpu.pipeline.Pipeline`.
    :param cfg: Hyperparameters (applied per tile; set ``AF_scale`` to skip
        per-tile scale estimation and keep tiles consistent).
    :param g_raw: The mosaic image.
    :param tile: Core tile shape.
    :param halo: Overlap margin; must exceed the largest object diameter.
    :return: ``(objects, tiles_processed)`` — :class:`MosaicObject` list in
        mosaic coordinates.
    """
    from ..automation import process_image

    out = get_output(out)
    g_raw = np.asarray(g_raw)
    objects = []
    tiles = list(_tile_grid(g_raw.shape, tile, halo))
    for tile_idx, (core_sel, pad_sel) in enumerate(tiles):
        out.intermediate(f'Mosaic tile {tile_idx + 1} / {len(tiles)}...')
        tile_img = g_raw[pad_sel]
        tile_cfg = cfg.copy() if isinstance(cfg, Config) else Config(cfg)
        data, _, _ = process_image(pipeline, tile_cfg, tile_img,
                                   out=out.derive(muted=True))
        pad_off = np.array([pad_sel[0].start, pad_sel[1].start])
        for obj in data['postprocessed_objects']:
            center = pad_off + np.asarray(obj.fg_offset) + \
                np.array(obj.fg_fragment.shape) / 2.0
            if (core_sel[0].start <= center[0] < core_sel[0].stop and
                    core_sel[1].start <= center[1] < core_sel[1].stop):
                objects.append(MosaicObject(obj, pad_off))
    out.write(f'Mosaic: {len(objects)} objects from {len(tiles)} tiles')
    return objects, len(tiles)


def rasterize_mosaic_labels(shape, objects):
    """Label map of mosaic objects (later objects win on rare overlaps)."""
    result = np.zeros(shape, np.int32)
    for label, obj in enumerate(objects, 1):
        obj.fill_foreground(result, label)
    return result
