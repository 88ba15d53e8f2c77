from . import _warps  # noqa: F401
