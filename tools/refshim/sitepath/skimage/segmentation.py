"""Priority-flood watershed matching skimage.segmentation.watershed semantics
(connectivity-1 structure by default, FIFO tie-break by insertion age,
optional mask). Pure numpy + heapq; fast enough for the validation images.
"""

import heapq

import numpy as np
import scipy.ndimage as ndi


def watershed(image, markers=None, connectivity=1, offset=None, mask=None,
              compactness=0, watershed_line=False):
    image = np.asarray(image, dtype=np.float64)
    assert image.ndim == 2, 'refshim watershed supports 2D only'
    if markers is None or np.isscalar(markers):
        raise NotImplementedError('refshim watershed requires a marker array')
    markers = np.asarray(markers)
    if mask is None:
        mask = np.ones(image.shape, bool)
    else:
        mask = np.asarray(mask, bool)

    if np.isscalar(connectivity):
        structure = ndi.generate_binary_structure(image.ndim, connectivity)
    else:
        structure = np.asarray(connectivity, bool)
    offsets = [tuple(d) for d in (np.argwhere(structure) - 1)
               if tuple(d) != (0, 0)]

    output = np.where(mask, markers, 0).astype(np.int64)
    H, W = image.shape
    heap = []
    age = 0
    seeds = np.argwhere(output != 0)
    for r, c in seeds:
        heapq.heappush(heap, (image[r, c], age, int(r), int(c)))
        age += 1

    while heap:
        _, _, r, c = heapq.heappop(heap)
        label = output[r, c]
        for dr, dc in offsets:
            rr, cc = r + dr, c + dc
            if 0 <= rr < H and 0 <= cc < W and mask[rr, cc] and output[rr, cc] == 0:
                output[rr, cc] = label
                heapq.heappush(heap, (image[rr, cc], age, rr, cc))
                age += 1

    return output
