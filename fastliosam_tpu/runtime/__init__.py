from .engine import SlamEngine, EngineConfig, GpsFix, KeyframeStore  # noqa: F401
from .persistence import (  # noqa: F401
    save_results,
    save_checkpoint,
    load_checkpoint,
)
