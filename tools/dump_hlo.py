"""Dump the optimized HLO of the compiled headline frame and summarize a
named fusion's computation (to map trace_top's `fusion.N` entries back to
source ops).

    python tools/dump_hlo.py [--op fusion.8] [--out /tmp/hlo_frame.txt]

Compiles on CPU? No — the optimized HLO must come from the TPU backend
(fusion decisions are backend-specific), so this compiles for the live
device (cached after the first run).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", action="append", default=[])
    ap.add_argument("--out", default="/tmp/hlo_frame.txt")
    ap.add_argument("--scene", default="test")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.render.engine import Engine

    if args.scene != "test":
        import bench
        eng = bench.build_engine(highpoly=(args.scene == "highpoly"),
                                 stress=(args.scene == "stress"))
    else:
        eng = Engine(cfg=RenderConfig(width=1920, height=1080),
                     level_path="/root/reference/levels/test.lvl")
    eng.update(0.0)
    eng._drain_actions()
    out = eng.run_frame(0.0)
    np.asarray(out.sdr)  # settle
    env = eng._ensure_env()
    cfg = eng.cfg
    scene = eng._pack.scene
    pool = eng._packer.pool_for(cfg)
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    atlas = eng._atlas

    fn = framelib.compiled_frame(cfg)
    lowered = jax.jit(lambda *a: fn(*a)).lower(
        scene, pool, lights, cam0, eng.params, env, atlas)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)")

    for opname in args.op:
        # find the fusion instruction and its computation body
        pat = re.compile(rf'%?{re.escape(opname)}\b')
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if pat.search(ln) and ("= fusion" in ln or "fusion(" in ln
                                   or " = " in ln and opname + " = " in ln):
                print(f"\n=== {opname} instruction ===")
                print(ln[:2000])
                m = re.search(r'calls=([%\w.\-]+)', ln)
                if m:
                    comp = m.group(1).lstrip("%")
                    print(f"--- computation {comp} ---")
                    cpat = re.compile(rf'^%?{re.escape(comp)}\s')
                    j = next((k for k, l2 in enumerate(lines)
                              if cpat.match(l2.strip())), None)
                    if j is not None:
                        depth = 0
                        for l2 in lines[j:j + 400]:
                            print(l2[:400])
                            depth += l2.count("{") - l2.count("}")
                            if depth <= 0 and "{" in "".join(lines[j:j + 1]):
                                pass
                            if l2.strip() == "}":
                                break
                break


if __name__ == "__main__":
    main()
