from . import objects, world  # noqa: F401
