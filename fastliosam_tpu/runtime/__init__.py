from .engine import SlamEngine, EngineConfig, GpsFix, KeyframeStore  # noqa: F401
