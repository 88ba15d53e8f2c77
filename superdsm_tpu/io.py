"""Image file I/O.

Counterpart of the reference's ``superdsm/io.py``
(``/root/reference/superdsm/io.py:5-72``), built on Pillow instead of
scikit-image (which is not available in this environment). Supports PNG and
TIFF, grayscale conversion, and normalized uint8/uint16 export.
"""

import numpy as np
from PIL import Image as _PILImage


def imread(filepath, as_gray=True):
    """Loads an image from ``filepath`` (PNG/TIF/TIFF).

    Multi-page TIFFs are returned as a 3D array (pages first). Color images
    are converted to grayscale when ``as_gray`` (luminance weighting as in
    skimage's ``rgb2gray``).
    """
    filepath = str(filepath)
    suffix = filepath.lower().rsplit('.', 1)[-1]
    if suffix not in ('png', 'jpg', 'jpeg', 'tif', 'tiff'):
        raise ValueError(f'unknown file extension: .{suffix}')
    with _PILImage.open(filepath) as im:
        frames = []
        n_frames = getattr(im, 'n_frames', 1)
        for idx in range(n_frames):
            im.seek(idx)
            arr = np.asarray(im)
            if as_gray and arr.ndim == 3:
                arr = arr[..., :3].astype(np.float64) @ np.array([0.2125, 0.7154, 0.0721])
            frames.append(arr)
    img = frames[0] if len(frames) == 1 else np.stack(frames)
    return img


def imsave(filepath, img, shape=None, antialias=True, normalize=True):
    """Saves image ``img`` to ``filepath``.

    Float images are normalized to the full ``uint8`` range when ``normalize``
    is set (mirroring ``/root/reference/superdsm/io.py:5-33``); integer and
    boolean images are written as-is. ``shape`` optionally resizes the output.
    """
    img = np.asarray(img)
    if img.dtype == bool:
        img = img.astype(np.uint8) * 255
    elif np.issubdtype(img.dtype, np.floating):
        if normalize:
            lo, hi = float(img.min()), float(img.max())
            span = (hi - lo) if hi > lo else 1.0
            img = (255 * (img - lo) / span).round()
        img = img.clip(0, 255).astype(np.uint8)
    elif img.dtype not in (np.uint8, np.uint16, np.int32):
        img = img.astype(np.int32)
    pil = _PILImage.fromarray(img)
    if shape is not None:
        resample = _PILImage.LANCZOS if antialias else _PILImage.NEAREST
        pil = pil.resize((int(shape[1]), int(shape[0])), resample=resample)
    pil.save(str(filepath))
