"""Headless render CLI: ``python -m tinyrenderer_tpu --level x.lvl --out y.png``.

Renders one frame of a level (or the procedural demo scene) to a PNG —
the screenshot/offline-render path.
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    ap = argparse.ArgumentParser(description="render a level to PNG")
    ap.add_argument("--level", default="",
                    help=".lvl file (default: procedural demo scene)")
    ap.add_argument("--out", default="frame.png")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--exposure", type=float, default=1.0)
    ap.add_argument("--tone", type=int, default=1, choices=[0, 1, 2, 3])
    ap.add_argument("--skybox", default="", help="equirect .hdr for the environment")
    ap.add_argument("--stats", action="store_true", help="print frame stats")
    ap.add_argument("--cpu", action="store_true",
                    help="render on the CPU backend (TPU-less dev; the "
                         "JAX_PLATFORMS env var is pre-empted by the "
                         "environment's axon platform, so this must be a "
                         "flag applied before the first jax op)")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import os

    import numpy as np

    from .config import RenderConfig
    from .render import frame as framelib
    from .render.engine import Engine
    from .scene import demo
    from .utils import image_io

    cfg = RenderConfig(width=args.width, height=args.height)
    kwargs = dict(skybox_path=args.skybox or None)
    if args.level and os.path.exists(args.level):
        eng = Engine(cfg=cfg, level_path=args.level, **kwargs)
    else:
        eng = Engine.from_world(
            demo.build_demo_world(),
            camera=demo.build_demo_camera(args.width, args.height),
            cfg=cfg, **kwargs)
    eng.set_param(framelib.PARAM_EXPOSURE, args.exposure)
    eng.set_param(framelib.PARAM_TONE_TYPE, float(args.tone))

    out = eng.run_frame()
    image_io.save_png(args.out, np.asarray(out.sdr))
    print(f"wrote {args.out} ({eng.cfg.width}x{eng.cfg.height}, "
          f"{eng.last_frame_ms:.2f} ms dispatch)")
    if args.stats:
        pick = np.asarray(out.pick_id)
        print(f"visible objects: {len([i for i in np.unique(pick) if i > 0])}, "
              f"geometry coverage: {(pick > 0).mean():.1%}, "
              f"triangles: {eng._pack.counts['triangles']}")


if __name__ == "__main__":
    main()
