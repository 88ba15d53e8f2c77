import numpy as np


class _RegionProps:
    def __init__(self, coords):
        self._coords = coords

    @property
    def eccentricity(self):
        """Eccentricity of the ellipse with the same second central moments,
        matching skimage.measure.regionprops."""
        pts = self._coords.astype(np.float64)
        mu = pts - pts.mean(axis=0)
        mu20 = np.mean(mu[:, 0] ** 2) + 1.0 / 12.0
        mu02 = np.mean(mu[:, 1] ** 2) + 1.0 / 12.0
        mu11 = np.mean(mu[:, 0] * mu[:, 1])
        common = np.sqrt(4 * mu11 ** 2 + (mu20 - mu02) ** 2)
        l1 = (mu20 + mu02 + common) / 2.0
        l2 = (mu20 + mu02 - common) / 2.0
        if l1 <= 0:
            return 0.0
        return float(np.sqrt(1.0 - max(l2, 0.0) / l1))

    @property
    def area(self):
        return len(self._coords)


def regionprops(label_image, **kwargs):
    label_image = np.asarray(label_image)
    props = []
    for label in np.unique(label_image):
        if label <= 0:
            continue
        props.append(_RegionProps(np.argwhere(label_image == label)))
    return props
