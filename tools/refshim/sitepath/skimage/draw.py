import numpy as np


def line(r0, c0, r1, c1):
    n = int(max(abs(r1 - r0), abs(c1 - c0))) + 1
    rr = np.round(np.linspace(r0, r1, n)).astype(np.intp)
    cc = np.round(np.linspace(c0, c1, n)).astype(np.intp)
    return rr, cc


def disk(center, radius, shape=None):
    r0, c0 = center
    L = np.arange(int(np.floor(-radius)), int(np.ceil(radius)) + 1)
    X, Y = np.meshgrid(L, L, indexing='ij')
    sel = (X ** 2 + Y ** 2) <= radius ** 2
    rr = (X[sel] + int(round(r0))).astype(np.intp)
    cc = (Y[sel] + int(round(c0))).astype(np.intp)
    if shape is not None:
        keep = (rr >= 0) & (rr < shape[0]) & (cc >= 0) & (cc < shape[1])
        rr, cc = rr[keep], cc[keep]
    return rr, cc
