"""TPU-native wavefront path tracer — a ground-up JAX/XLA/Pallas rebuild of
the capabilities of Borx25/CPU-Raytracing-experiments (see SURVEY.md)."""
from .render.api import Renderer, render_image  # noqa: F401
from .scene import builders  # noqa: F401
from .utils.config import RendererPolicy  # noqa: F401

__version__ = "0.1.0"
