"""Live kernel reload — the shader hot-recompile analog.

The reference stores each pipeline's WGSL path + mtime and rebuilds the
pipeline when the file changes, trapping validation errors in an error
scope so the old pipeline keeps running (src/pipelines/shader_compiler.rs:30-56,
src/app.rs:345-349). Here the "shaders" are the Python kernel modules under
``tinyrenderer_tpu/ops``: a reload re-imports every module whose source
file changed and invalidates the jitted-frame caches so the next frame
re-traces through the new code. Errors are caught and reported; the old
modules (and the old compiled frames) keep working.

Like the reference, recompilation stops at the first failing module
(src/world_renderer.rs:374-377).
"""

from __future__ import annotations

import importlib
import logging
import os
from dataclasses import dataclass, field
from typing import List

log = logging.getLogger(__name__)

# Reload order respects intra-package dependencies (raster is imported as a
# module by shadows; resolve/shading/post/env/sampling are siblings).
_KERNEL_MODULES = (
    "tinyrenderer_tpu.ops.raster",
    "tinyrenderer_tpu.ops.sampling",
    "tinyrenderer_tpu.ops.resolve",
    "tinyrenderer_tpu.ops.shading",
    "tinyrenderer_tpu.ops.shadows",
    "tinyrenderer_tpu.ops.env",
    "tinyrenderer_tpu.ops.post",
)


@dataclass
class ReloadResult:
    """ShaderCompilationResult analog."""

    reloaded: List[str] = field(default_factory=list)
    error: str = ""

    @property
    def ok(self) -> bool:
        return not self.error

    @property
    def changed(self) -> bool:
        return bool(self.reloaded)


class KernelReloader:
    def __init__(self, modules=_KERNEL_MODULES):
        self.modules = modules
        self._mtimes: dict[str, float] = {}
        for name in self.modules:
            p = self._path(name)
            if p:
                self._mtimes[name] = os.path.getmtime(p)

    @staticmethod
    def _path(name: str) -> str:
        import sys
        mod = sys.modules.get(name)
        if mod is None:
            mod = importlib.import_module(name)
        return getattr(mod, "__file__", "")

    def reload_if_changed(self) -> ReloadResult:
        """Reload every kernel module with a newer mtime; stop at the first
        failure (matching src/world_renderer.rs:374-377)."""
        result = ReloadResult()
        import sys
        for name in self.modules:
            p = self._path(name)
            if not p or not os.path.exists(p):
                continue
            mtime = os.path.getmtime(p)
            if mtime <= self._mtimes.get(name, 0.0):
                continue
            try:
                importlib.reload(sys.modules[name])
                self._mtimes[name] = mtime
                result.reloaded.append(name)
            except Exception as e:  # keep the old module running
                result.error = f"{name}: {e}"
                log.error("kernel reload failed: %s", result.error)
                return result
        return result


def invalidate_compiled_frames() -> None:
    """Drop all cached jitted frame functions so the next render re-traces
    through the freshly reloaded kernel modules."""
    from . import frame as framelib
    framelib.compiled_frame.cache_clear()
    try:
        from ..parallel import sharded
        sharded.compiled_sharded_frame.cache_clear()
    except ImportError:
        pass
