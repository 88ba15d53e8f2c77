import numpy as np
import PIL.Image


def imread(filepath, as_gray=False, plugin=None, **kwargs):
    img = PIL.Image.open(filepath)
    arr = np.asarray(img)
    if as_gray and arr.ndim == 3:
        arr = arr[..., :3].astype(np.float64)
        # ITU-R 601-2 luma, matching skimage.color.rgb2gray weights
        arr = arr @ np.array([0.2125, 0.7154, 0.0721])
        if np.issubdtype(np.asarray(img).dtype, np.integer):
            arr = arr / 255.0
    return arr


def imsave(filepath, img, **kwargs):
    arr = np.asarray(img)
    if arr.dtype == np.uint16:
        PIL.Image.fromarray(arr, mode='I;16').save(filepath)
    else:
        PIL.Image.fromarray(arr).save(filepath)
