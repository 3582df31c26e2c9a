"""Render an orbiting-camera turntable sequence (PNG frames + optional GIF).

The offline-animation analog of the reference's interactive fly-around:
exercises the full frame pipeline across many camera poses in one process.

Usage:
    python tools/orbit.py --level levels/demo.lvl --frames 24 --out /tmp/orbit
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", default="levels/demo.lvl")
    ap.add_argument("--out", default="/tmp/orbit")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--radius", type=float, default=16.0)
    ap.add_argument("--elevation", type=float, default=8.0)
    ap.add_argument("--gif", action="store_true", help="also write orbit.gif")
    args = ap.parse_args()

    import numpy as np

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo
    from tinyrenderer_tpu.utils import image_io

    cfg = RenderConfig(width=args.width, height=args.height)
    if os.path.exists(args.level):
        eng = Engine(cfg=cfg, level_path=args.level)
    else:
        eng = Engine.from_world(demo.build_demo_world(),
                                camera=demo.build_demo_camera(args.width,
                                                              args.height),
                                cfg=cfg)
    os.makedirs(args.out, exist_ok=True)

    images = []
    t0 = time.time()
    for i in range(args.frames):
        a = 2.0 * math.pi * i / args.frames
        eng.camera.position = np.array(
            [args.radius * math.cos(a), args.elevation,
             args.radius * math.sin(a)], np.float32)
        eng.camera.look_at(np.zeros(3, np.float32))
        out = eng.run_frame(1.0 / 30.0)
        img = np.asarray(out.sdr)
        path = os.path.join(args.out, f"frame_{i:04d}.png")
        image_io.save_png(path, img)
        images.append(img)
        print(f"frame {i + 1}/{args.frames}", flush=True)
    dt = time.time() - t0
    print(f"rendered {args.frames} frames in {dt:.1f}s "
          f"({dt / args.frames * 1e3:.1f} ms/frame wall incl. host IO)")

    if args.gif:
        from PIL import Image
        pil = [Image.fromarray(im, "RGB") for im in images]
        gif = os.path.join(args.out, "orbit.gif")
        pil[0].save(gif, save_all=True, append_images=pil[1:],
                    duration=83, loop=0)
        print("wrote", gif)


if __name__ == "__main__":
    main()
