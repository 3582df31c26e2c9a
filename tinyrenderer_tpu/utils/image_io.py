"""Image output helpers (the swapchain/present + screenshot analog)."""

from __future__ import annotations

import numpy as np


def save_png(path: str, img: np.ndarray) -> None:
    """img: (H, W, 3|4) uint8 or float in [0,1]."""
    from PIL import Image
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
    mode = "RGBA" if a.shape[-1] == 4 else "RGB"
    Image.fromarray(a, mode).save(path)


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W, 3|4) uint8 to PNG bytes (viewer frame streaming).

    Uses the native encoder (native/asset_loader.cpp tr_encode_png: Sub
    filter + zlib level 1 — PIL cost 26-350 ms per 1080p frame, a per-
    frame host bottleneck for the viewer); falls back to PIL when the
    native library is unavailable."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)

    from ..assets import native
    out = native.encode_png(a)
    if out is not None:
        return out

    import io

    from PIL import Image
    mode = "RGBA" if a.shape[-1] == 4 else "RGB"
    buf = io.BytesIO()
    # compress_level=1: frame streaming favors latency over size
    Image.fromarray(a, mode).save(buf, format="PNG", compress_level=1)
    return buf.getvalue()


def save_pfm_like_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))
