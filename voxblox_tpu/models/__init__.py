from .maps import EsdfMap, OccupancyMap, TsdfMap  # noqa: F401
