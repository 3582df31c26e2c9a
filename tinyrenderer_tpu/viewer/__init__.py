"""Browser-based viewer/editor front-end (the winit window + egui panel
replacement for headless TPU hosts)."""

from .server import ViewerServer  # noqa: F401
