import numpy as np
import scipy.ndimage as ndi


def disk(radius, dtype=np.uint8):
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L)
    return ((X ** 2 + Y ** 2) <= radius ** 2).astype(dtype)


def binary_dilation(image, footprint=None, **kwargs):
    if footprint is None:
        footprint = ndi.generate_binary_structure(image.ndim, 1)
    # skimage pads with 0 for dilation
    return ndi.binary_dilation(image, structure=np.asarray(footprint, bool),
                               border_value=0)


def binary_erosion(image, footprint=None, **kwargs):
    if footprint is None:
        footprint = ndi.generate_binary_structure(image.ndim, 1)
    # skimage pads with 1 for erosion (border pixels are not eroded away)
    return ndi.binary_erosion(image, structure=np.asarray(footprint, bool),
                              border_value=1)


def erosion(image, footprint=None, **kwargs):
    if footprint is None:
        footprint = ndi.generate_binary_structure(image.ndim, 1)
    return ndi.grey_erosion(image, footprint=np.asarray(footprint, bool))


def dilation(image, footprint=None, **kwargs):
    if footprint is None:
        footprint = ndi.generate_binary_structure(image.ndim, 1)
    return ndi.grey_dilation(image, footprint=np.asarray(footprint, bool))
