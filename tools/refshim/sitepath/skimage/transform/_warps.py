import numpy as np
import scipy.ndimage as ndi


def resize(image, output_shape, order=0, anti_aliasing=False,
           anti_aliasing_sigma=None, mode='reflect', **kwargs):
    image = np.asarray(image, dtype=float)
    factors = np.array(image.shape, float) / np.array(output_shape, float)
    if anti_aliasing:
        sigma = anti_aliasing_sigma
        if sigma is None:
            sigma = np.maximum(0, (factors - 1) / 2)
        image = ndi.gaussian_filter(image, sigma, mode=mode)
    zoom = 1.0 / factors
    return ndi.zoom(image, zoom, order=order, mode=mode, grid_mode=True)
