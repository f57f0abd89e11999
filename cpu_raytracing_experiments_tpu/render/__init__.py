from .api import Renderer, render_image  # noqa: F401
