"""Golden-image regression tests.

Renders small deterministic scenes on the CPU backend and compares against
checked-in snapshots (tests/goldens/*.png) — the pixel-parity harness the
reference never had (SURVEY.md §4). Regenerate after an intentional visual
change with:

    python -m pytest tests/test_golden.py --regen-goldens
"""

import os

import numpy as np
import pytest

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.render.engine import Engine
from tinyrenderer_tpu.scene import demo

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CFG = RenderConfig(
    width=256, height=128, tile_h=16, tile_w=128, bin_capacity=160,
    shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
    env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
    max_vertices=8192, max_triangles=4096, max_instances=64,
    use_pallas=False, enable_ssr=False,
)


def _render(scene_name: str) -> np.ndarray:
    if scene_name == "demo":
        eng = Engine.from_world(demo.build_demo_world(n_cubes=9),
                                camera=demo.build_demo_camera(CFG.width, CFG.height),
                                cfg=CFG)
    elif scene_name == "demo_textured":
        # exercises the textured-material path (block-compacted sampling,
        # default texture slots) end to end
        eng = Engine.from_world(demo.build_demo_world(n_cubes=9,
                                                      textured_every=2),
                                camera=demo.build_demo_camera(CFG.width, CFG.height),
                                cfg=CFG)
    elif scene_name == "test_lvl":
        path = "/root/reference/levels/test.lvl"
        if not os.path.exists(path):
            pytest.skip("reference level unavailable")
        eng = Engine(cfg=CFG, level_path=path)
    else:
        raise ValueError(scene_name)
    return np.asarray(eng.run_frame(0.0).sdr)


def _compare_or_regen(name: str, img: np.ndarray, request) -> None:
    from PIL import Image
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if request.config.getoption("--regen-goldens") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(img, "RGB").save(path)
        if not request.config.getoption("--regen-goldens"):
            pytest.skip(f"golden {name} created; re-run to compare")
        return
    golden = np.asarray(Image.open(path)).astype(np.int16)
    d = np.abs(img.astype(np.int16) - golden).max(axis=-1)
    # tolerate tiny fused-arithmetic drift: <=2 LSB everywhere on 99.5%+
    frac_bad = (d > 2).mean()
    assert frac_bad < 0.005, (
        f"{name}: {100 * frac_bad:.2f}% pixels differ by >2 LSB "
        f"(max diff {d.max()})")


@pytest.mark.parametrize("scene", ["demo", "demo_textured", "test_lvl"])
def test_golden(scene, request):
    _compare_or_regen(scene, _render(scene), request)
