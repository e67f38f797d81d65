from . import esdf_relax  # noqa: F401
