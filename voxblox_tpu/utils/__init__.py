from . import camera, color_maps, evaluation, lie, planning, timing  # noqa: F401
