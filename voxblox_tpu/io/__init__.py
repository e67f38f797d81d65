from . import layer_io, npz_io, ply  # noqa: F401
