import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def view_as_windows(arr_in, window_shape, step=1):
    if np.isscalar(window_shape):
        window_shape = (int(window_shape),) * arr_in.ndim
    if np.isscalar(step):
        step = (int(step),) * arr_in.ndim
    view = sliding_window_view(arr_in, window_shape)
    return view[tuple(slice(None, None, s) for s in step)]
