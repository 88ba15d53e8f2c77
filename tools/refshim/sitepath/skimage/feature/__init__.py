from . import blob  # noqa: F401
