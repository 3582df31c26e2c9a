"""Generate the embedded default IBL (tinyrenderer_tpu/assets/default_ibl.npz).

The reference ships a pre-baked diffuse irradiance map via include_bytes so
startup needs no bake (src/diffuse_irradiance_renderer.rs:23,59-68). Our
analog: the baked irradiance cube for the procedural sky, checked into the
package and loaded at engine startup (Engine._load_or_bake_irradiance).

Re-run after changing the procedural sky or the bake math:
    python tools/gen_default_ibl.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from tinyrenderer_tpu.assets import hdr as hdrlib
    from tinyrenderer_tpu.ops import env as envops

    eq = hdrlib.procedural_sky()
    # the irradiance integral is fully converged from a 256^2-per-face env
    cube = envops.equirect_to_cubemap(np.asarray(eq), 256, gamma_decode=False)
    irr = np.asarray(envops.bake_irradiance(cube, 64), np.float16)
    out = os.path.join(os.path.dirname(__file__), "..", "tinyrenderer_tpu",
                       "assets", "default_ibl.npz")
    np.savez_compressed(out, irradiance=irr)
    print(f"wrote {os.path.abspath(out)} ({os.path.getsize(out)} bytes), "
          f"shape {irr.shape}")


if __name__ == "__main__":
    main()
