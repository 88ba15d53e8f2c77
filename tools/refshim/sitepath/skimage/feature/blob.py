"""The reference's scale estimation (automation.py:13-68) reaches into
skimage.feature.blob internals. Validation runs pin ``AF_scale`` so this is
never called; fail loudly if it is."""


def _unavailable(*args, **kwargs):
    raise NotImplementedError(
        'refshim: skimage.feature.blob internals are not shimmed; '
        'set AF_scale in the config to skip scale estimation')


check_nD = _unavailable
img_as_float = _unavailable
integral_image = _unavailable
_hessian_matrix_det = _unavailable
peak_local_max = _unavailable
_prune_blobs = _unavailable
