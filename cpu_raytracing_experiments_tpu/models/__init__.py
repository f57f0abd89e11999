from . import presets  # noqa: F401
