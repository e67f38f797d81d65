from . import raycast, tsdf  # noqa: F401
