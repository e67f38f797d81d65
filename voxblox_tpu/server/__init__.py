from .mapper import EsdfServer, IntensityServer, SimulationServer, TsdfServer  # noqa: F401
