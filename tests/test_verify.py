"""Edge-aware golden comparator (utils/verify.py) — the gate behind the
on-chip verification in bench.py. These tests prove the gate is
*sensitive*: a seeded fault in a flat region (the signature of a Mosaic
regression in sampling/shading/shadows) fails, while realistic edge
drift (depth-race flips on silhouettes, 1-px shadow-boundary shifts)
passes."""

import numpy as np

from tinyrenderer_tpu.utils.verify import edge_aware_compare, edge_mask


def _scene():
    """Synthetic golden: two flat regions + an object with a pick id."""
    rng = np.random.default_rng(5)
    golden = np.full((128, 256, 3), 80, np.uint8)
    golden[:, 128:] = 140                      # vertical luminance edge
    golden[40:90, 60:110] = 200                # a bright object
    pick = np.zeros((128, 256), np.int32)
    pick[40:90, 60:110] = 7
    noise = rng.integers(-1, 2, size=golden.shape)
    img = np.clip(golden.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    return golden, pick, img


def test_identical_and_lsb_noise_pass():
    golden, pick, img = _scene()
    assert edge_aware_compare(golden, golden, pick)["status"] == "pass"
    assert edge_aware_compare(img, golden, pick)["status"] == "pass"


def test_edge_drift_passes():
    """One-pixel silhouette/shadow-boundary shifts are expected drift."""
    golden, pick, img = _scene()
    drift = img.copy()
    drift[40:90, 110] = 200                    # object edge grows 1 px
    drift[:, 128] = 80                         # luminance edge shifts 1 px
    assert edge_aware_compare(drift, golden, pick)["status"] == "pass"


def test_flat_region_fault_fails():
    """A seeded fault away from any edge (e.g. a Mosaic bug zeroing a
    sampled block) must FAIL even though it is a tiny pixel fraction."""
    golden, pick, img = _scene()
    fault = img.copy()
    fault[100:108, 20:36] = 0                  # one dead 8x16 block
    r = edge_aware_compare(fault, golden, pick)
    assert r["status"] == "FAIL"
    assert r["offedge_clusters"] > 0


def test_shifted_shadow_gate_fault_fails():
    """A systematic multi-pixel shift of a flat-region boundary (wrongly
    computed shadow gate) fails: the moved band is off the golden's
    edge mask."""
    golden, pick, img = _scene()
    fault = img.copy()
    fault[:, 120:128] = 140                    # boundary moved 8 px left
    assert edge_aware_compare(fault, golden, pick)["status"] == "FAIL"


def test_edge_mask_covers_pick_and_gradient():
    golden, pick, _ = _scene()
    m = edge_mask(golden, pick)
    assert m[64, 128] and m[64, 127]           # luminance edge (dilated)
    assert m[40, 80]                           # object silhouette
    assert not m[10, 10]                       # flat interior
