"""Entry point: ``python -m tinyrenderer_tpu.viewer`` — the main.rs analog.

Opens the engine on a level (or the procedural demo scene) and serves the
interactive editor at http://localhost:8000/.
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    ap = argparse.ArgumentParser(description="tinyrenderer_tpu viewer")
    ap.add_argument("--level", default="/root/reference/levels/test.lvl",
                    help=".lvl file to load (falls back to the demo scene)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--no-pallas", action="store_true",
                    help="use the jnp fallback rasterizer")
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

    from ..config import RenderConfig
    from ..editor.session import EditorApp
    from ..render.engine import Engine
    from ..scene import demo
    from .server import ViewerServer

    cfg = RenderConfig(width=args.width, height=args.height,
                       use_pallas=not args.no_pallas)
    if os.path.exists(args.level):
        engine = Engine(cfg=cfg, level_path=args.level)
    else:
        engine = Engine.from_world(
            demo.build_demo_world(),
            camera=demo.build_demo_camera(args.width, args.height), cfg=cfg)

    server = ViewerServer(EditorApp(engine), host=args.host, port=args.port)
    print(f"viewer: http://{args.host}:{server.port}/")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
