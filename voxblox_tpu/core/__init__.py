from . import grid, hash, layer  # noqa: F401
