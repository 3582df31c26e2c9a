"""tinyrenderer_tpu — a TPU-native rendering engine (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of geri1245/TinyRenderer (Rust +
wgpu) designed for TPU hardware: the per-frame render graph is one jitted
XLA program over static-capacity scene arrays; rasterization is a tiled
visibility-buffer Pallas kernel; shading/post passes are fused elementwise
pixel maps; multi-chip scaling shards the pixel-tile grid over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .config import RenderConfig  # noqa: F401
