from .timing import StageTimer, colorize  # noqa: F401
