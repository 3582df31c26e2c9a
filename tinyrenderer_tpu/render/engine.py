"""Engine: the App/WorldRenderer orchestration layer (src/app.rs +
src/world_renderer.rs) rebuilt around the jitted frame function.

Per-frame flow mirrors App::run_frame (src/app.rs:286-300):
``update(dt)`` consumes GUI/param edits and the world dirty list (repacking
device arrays only when something changed), drains deferred RenderingActions
(env-map generation / irradiance bake / IBL dump, src/actions.rs), then
``render()`` executes the single compiled XLA program and ``on_end_frame``
clears the dirty list.

Capacity growth: if a pack exceeds the compiled envelope, the config grows
to the next bucket and the frame function recompiles — the reference's
grow-by-reallocating (src/light_render_data.rs:145-152) at whole-frame scope.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..assets import hdr as hdrlib
from ..scene import level_io
from ..scene.camera import Camera
from ..scene.world import World
from ..utils import async_fetch
from ..utils.notify import Notifier
from . import frame as framelib
from . import reload as reloadlib
from .scene_gpu import CapacityError, ScenePacker

log = logging.getLogger(__name__)

_cache_enabled = False


def enable_persistent_compile_cache(path: str = "") -> None:
    """Persist XLA compilations across processes so repeated CLI/viewer/
    bench launches skip the 30s+ first-frame compile. Safe to call often."""
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    cache_dir = path or os.environ.get(
        "TINYRENDERER_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tinyrenderer_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception as e:  # never fatal
        log.debug("compile cache unavailable: %s", e)


class RenderingAction:
    """src/actions.rs."""

    GENERATE_CUBEMAP = "GenerateCubeMapFromEquirectangular"
    BAKE_IRRADIANCE = "BakeDiffuseIrradianceMap"
    SAVE_IRRADIANCE = "SaveDiffuseIrradianceMapToFile"


class Engine:
    def __init__(self, cfg: Optional[config.RenderConfig] = None,
                 level_path: Optional[str] = None,
                 asset_search_paths: tuple[str, ...] = (".", "/root/reference"),
                 skybox_path: Optional[str] = None,
                 ibl_cache_path: Optional[str] = None):
        enable_persistent_compile_cache()
        self.cfg = cfg or config.RenderConfig()
        self.asset_search_paths = asset_search_paths
        self.world = World()
        self.camera = Camera.new_default(self.cfg.width, self.cfg.height)
        self.params = framelib.default_params()
        self._packer = ScenePacker(self.cfg, asset_search_paths)
        self._pack = None
        self._needs_pack = True
        self._actions: list[str] = []
        self._env: Optional[framelib.EnvGPU] = None
        self._equirect = None
        self._skybox_path = skybox_path
        self._ibl_cache_path = ibl_cache_path
        self.frame_index = 0
        self.last_output: Optional[framelib.FrameOutput] = None
        self.notifier = Notifier()
        self._reloader = reloadlib.KernelReloader()
        self.last_frame_ms = 0.0
        self._overflow_inflight: list = []
        self._under_count: dict = {}  # shrink-hysteresis counters
        self._settled = False  # capacities verified against this scene
        self._atlas = None  # cached shadow atlas (scene/light-dependent)
        self._shadow_big_need = 0  # shadow pass's big-tri need (shrink floor)

        if level_path is not None:
            self.load_level(level_path)

        # Startup parity with App::new (src/app.rs:106): enqueue the env bake.
        self.add_action(RenderingAction.GENERATE_CUBEMAP)

    @property
    def cfg(self) -> config.RenderConfig:
        return self._cfg

    @cfg.setter
    def cfg(self, value: config.RenderConfig) -> None:
        # ANY envelope change (resolution, presets, capacity grow/shrink,
        # light counts) re-arms the synchronous first-frame settle in
        # render(): guessed capacities must be re-verified before a frame
        # under the new config is handed out.
        if getattr(self, "_cfg", None) != value:
            self._settled = False
        self._cfg = value

    @classmethod
    def from_world(cls, world: World, camera: Optional[Camera] = None,
                   cfg: Optional[config.RenderConfig] = None,
                   **kwargs) -> "Engine":
        """Build an engine around a programmatically constructed world
        (demo/bench scenes) instead of a .lvl file."""
        eng = cls(cfg=cfg, **kwargs)
        eng.world = world
        if camera is not None:
            eng.camera = camera
            eng.camera.resize(eng.cfg.width, eng.cfg.height)
        eng._needs_pack = True
        return eng

    # -- level IO ----------------------------------------------------------

    def load_level(self, path: str) -> None:
        level = level_io.load_level(path)
        self.world = level.world
        self.camera = level.camera
        self.camera.resize(self.cfg.width, self.cfg.height)
        self._needs_pack = True

    def save_level(self, path: str) -> None:
        level_io.save_level(path, self.world, self.camera)

    # -- environment --------------------------------------------------------

    def _get_equirect(self):
        if self._equirect is None:
            if self._skybox_path and os.path.exists(self._skybox_path):
                self._equirect = jnp.asarray(hdrlib.load_hdr(self._skybox_path))
                self._equirect_is_file = True
            else:
                self._equirect = jnp.asarray(hdrlib.procedural_sky())
                self._equirect_is_file = False
        return self._equirect

    def _ensure_env(self) -> framelib.EnvGPU:
        if self._env is None:
            eq = self._get_equirect()
            # gamma-decode only file-loaded HDRs, like the bake shader does
            # for the radiant-loaded image; the procedural sky is linear.
            cube = framelib.bake_env_cubemap(eq, self.cfg.env_size,
                                             gamma_decode=self._equirect_is_file)
            irr = self._load_or_bake_irradiance(cube)
            from ..ops import sampling as samplinglib
            self._env = framelib.EnvGPU(
                env_cube=cube, irradiance=irr,
                irradiance_sh=framelib.project_irradiance_sh(irr),
                sky_rgbe=jax.jit(samplinglib.encode_rgbe_windowed)(cube))
        return self._env

    def _load_or_bake_irradiance(self, cube) -> jnp.ndarray:
        s = self.cfg.irradiance_size
        p = self._ibl_cache_path
        if p and os.path.exists(p):
            # raw float16 RGBA face-major dump, the output_ibl.data analog
            # (src/diffuse_irradiance_renderer.rs:155-162)
            raw = np.fromfile(p, np.float16)
            if raw.size == 6 * s * s * 4:
                return jnp.asarray(raw.reshape(6, s, s, 4)[..., :3].astype(np.float32))
            log.warning("IBL cache %s has wrong size; rebaking", p)
        if self._skybox_path is None:
            # embedded pre-baked irradiance for the default procedural sky —
            # startup needs no bake, like the reference's include_bytes map
            # (src/diffuse_irradiance_renderer.rs:23,59-68). Regenerate with
            # tools/gen_default_ibl.py.
            emb = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets", "default_ibl.npz")
            if os.path.exists(emb):
                irr = np.load(emb)["irradiance"].astype(np.float32)
                if irr.shape[1] != s:  # irradiance is ultra-smooth: resize
                    import jax
                    irr = np.asarray(jax.image.resize(
                        jnp.asarray(irr), (6, s, s, 3), method="bilinear"))
                return jnp.asarray(irr)
        t0 = time.time()
        irr = framelib.bake_irradiance(cube, s)
        irr.block_until_ready()
        log.info("irradiance bake: %.2fs", time.time() - t0)
        if p:
            self.write_ibl_to_file(p, irr)
        return irr

    def write_ibl_to_file(self, path: str, irr=None) -> None:
        """Keyboard-I IBL dump (src/app.rs:231-235)."""
        if irr is None:
            if self._env is None:
                return
            irr = self._env.irradiance
        a = np.asarray(irr)
        rgba = np.concatenate([a, np.ones((*a.shape[:-1], 1), np.float32)], axis=-1)
        rgba.astype(np.float16).tofile(path)

    def set_skybox(self, path: Optional[str]) -> None:
        """Swap the environment HDR (the GUI skybox file picker,
        src/gui.rs:539-553 + GlobalWorldSettings.sykbox_path) and re-bake."""
        self._skybox_path = path
        self._equirect = None
        self._env = None

    # -- actions -------------------------------------------------------------

    def add_action(self, action: str) -> None:
        self._actions.append(action)

    def _drain_actions(self) -> None:
        for action in self._actions:
            if action == RenderingAction.GENERATE_CUBEMAP:
                self._env = None  # rebake lazily
            elif action == RenderingAction.BAKE_IRRADIANCE:
                if self._env is not None:
                    irr = framelib.bake_irradiance(self._env.env_cube,
                                                   self.cfg.irradiance_size)
                    self._env = self._env._replace(
                        irradiance=irr,
                        irradiance_sh=framelib.project_irradiance_sh(irr))
            elif action == RenderingAction.SAVE_IRRADIANCE:
                self.write_ibl_to_file(self._ibl_cache_path or "output_ibl.data")
        self._actions.clear()

    # -- live kernel reload (shader hot-recompile analog) ----------------------

    def recompile_kernels(self) -> reloadlib.ReloadResult:
        """Ctrl+R / GUI "Recompile shaders" (src/app.rs:330-349): reload
        changed kernel modules, invalidate compiled frames, re-enqueue the
        environment bakes if the env kernels changed
        (src/world_renderer.rs:382-399)."""
        result = self._reloader.reload_if_changed()
        if not result.ok:
            self.notifier.push(f"Kernel reload failed: {result.error}", "error")
            return result
        if result.changed:
            reloadlib.invalidate_compiled_frames()
            if any(m.endswith(".env") for m in result.reloaded):
                self.add_action(RenderingAction.GENERATE_CUBEMAP)
                self.add_action(RenderingAction.BAKE_IRRADIANCE)
            self.notifier.push(
                f"Reloaded kernels: {', '.join(m.rsplit('.', 1)[-1] for m in result.reloaded)}")
        else:
            self.notifier.push("Kernels up to date")
        return result

    # -- params (GlobalGPUParams analog) --------------------------------------

    def set_param(self, index: int, value: float) -> None:
        self.params = self.params.at[index].set(value)

    # -- frame lifecycle -------------------------------------------------------

    def update(self, delta_seconds: float = 0.0) -> None:
        self.camera.update(delta_seconds)
        if self.world.dirty_objects:
            self._needs_pack = True
        if self._needs_pack:
            self._repack()

    def _repack(self) -> None:
        self._atlas = None  # scene/lights changed -> shadow maps stale
        # The packer's texture pool is sized at construction; a runtime
        # config change to the pool envelope (e.g. the viewer's parity
        # preset setting texture_size=1024/mip_levels=10) must rebuild it,
        # or the preset silently keeps sampling the old pyramid.
        p = self._packer.pool
        if (p.size != self.cfg.texture_size or p.levels != self.cfg.mip_levels
                or p.capacity != self.cfg.max_textures):
            self._packer = ScenePacker(self.cfg, self.asset_search_paths)
        try:
            self._pack = self._packer.pack(self.world)
        except CapacityError as e:
            c = e.counts
            log.info("growing capacities for %s", c)
            self.cfg = self.cfg.grown_for(
                c["instances"], c["vertices"], c["triangles"], c["materials"],
                c["point_lights"], c["directional_lights"], c["textures"],
                c.get("forward_triangles", 0),
                c.get("unique_vertices", 0))
            self._packer = ScenePacker(self.cfg, self.asset_search_paths)
            self._pack = self._packer.pack(self.world)
        # light-count changes alter the static shadow-view count;
        # forward-triangle presence toggles the overlay pass
        c = self._pack.counts
        has_fwd = c.get("forward_triangles", 0) > 0
        any_tex = c.get("textured_materials", 1) > 0
        if (c["point_lights"] != self.cfg.num_point_lights
                or c["directional_lights"] != self.cfg.num_directional_lights
                or has_fwd != self.cfg.has_forward
                or any_tex != self.cfg.any_textured):
            self.cfg = replace(self.cfg,
                               num_point_lights=c["point_lights"],
                               num_directional_lights=c["directional_lights"],
                               has_forward=has_fwd,
                               any_textured=any_tex)
            self._pack = None
            self._repack()
            return
        self._needs_pack = False

    def render(self) -> framelib.FrameOutput:
        """One frame, correct by construction.

        The first frame after a scene/config change renders with *guessed*
        compacted-pass capacities; any block beyond a capacity would ship
        unshaded (black). Steady-state frames poll the occupancy monitors
        asynchronously (never blocking the loop), but an unsettled frame
        is fetched **synchronously** and re-rendered until nothing grows —
        so a fresh Engine's very first frame (the headless CLI, a
        screenshot) is already right, at the one-time cost of the monitor
        fetch + the grown-capacity retrace it would have paid a few frames
        later anyway."""
        out = self._render_once()
        for _ in range(4):  # growth converges: capacity >= observed want
            if self._settled or not self._settle_sync():
                self._settled = True
                break
            out = self._render_once()
        return out

    def _render_once(self) -> framelib.FrameOutput:
        if self._pack is None or self._needs_pack:
            self._repack()
        self._drain_actions()
        env = self._ensure_env()  # skybox needs it even with IBL disabled
        fn = framelib.compiled_frame(self.cfg)
        cam_raw = jnp.asarray(self.camera.to_raw())
        t0 = time.perf_counter()
        if (self._atlas is None and self.cfg.enable_shadows
                and self.cfg.num_shadow_views > 0):
            # shadow maps depend only on scene+lights: render once, reuse
            # every frame until the next scene edit
            self._atlas, shadow_ovf, s_big = \
                framelib.compiled_shadow_atlas(self.cfg)(
                    self._pack.scene, self._pack.lights)
            self._queue_overflow(("shadow", "binsbig"),
                                 jnp.stack([shadow_ovf, s_big]))
        out = fn(self._pack.scene,
                 self._packer.pool_for(self.cfg),
                 self._pack.lights, cam_raw, self.params, env, self._atlas)
        # dispatch wall time; the FPS-label analog (src/gui.rs:513-516)
        self.last_frame_ms = (time.perf_counter() - t0) * 1e3
        self.last_output = out
        self.frame_index += 1
        # The per-frame 'shadow' occupancy (out.shadow_overflow) is a
        # constant-0 sentinel whenever the atlas is precomputed — which is
        # every engine frame, since the block above always renders it
        # before dispatch. Feeding the sentinel to the shrink hysteresis
        # would oscillate any grown shadow_bin_capacity (shrink ->
        # undersized atlas -> regrow, every SHRINK_AFTER frames), so the
        # per-frame stack excludes 'shadow'; the atlas-time
        # _queue_overflow above reports the real occupancy.
        self._queue_overflow(
            ("bins", "binsbig", "tex", "fwdtex", "shadowblk", "skyblk",
             "stream"),
            jnp.stack([out.bin_overflow, out.big_overflow,
                       out.tex_overflow[0], out.tex_overflow[1],
                       out.shadow_blocks, out.sky_blocks,
                       out.stream_overflow]))
        if self._settled:
            self._check_overflow()
        return out

    # consecutive under-occupancy frames before a capacity shrinks
    SHRINK_AFTER = 120

    def _capacity_floor(self, field: str) -> int:
        """Never shrink below the dataclass default for the field."""
        return getattr(config.RenderConfig(), field)

    def _tex_block_count(self) -> int:
        """Total (8, bw) screen blocks of the frame the tex monitor
        describes (the internal low-res frame under render_scale_pct) —
        the dense-sampling threshold for tex_block_capacity growth."""
        from ..ops import compact

        cfg = self.cfg
        if cfg.render_scale_pct != 100:
            pct = cfg.render_scale_pct
            cfg = replace(cfg, render_scale_pct=100,
                          width=max(cfg.tile_w, (cfg.width * pct) // 100),
                          height=max(cfg.tile_h, (cfg.height * pct) // 100))
        dims = compact.block_dims(cfg.padded_height, cfg.padded_width)
        if dims is None:
            return 0
        bh, bw = dims
        return (cfg.padded_height // bh) * (cfg.padded_width // bw)

    # capacity monitors: (kind, config field, toast label)
    _OVERFLOW_KINDS = {
        "bins": ("bin_capacity", "Raster bin overflow"),
        "binsbig": ("bin_big_capacity", "Big-triangle list overflow"),
        "shadow": ("shadow_bin_capacity", "Shadow bin overflow"),
        "tex": ("tex_block_capacity", "Textured-block overflow"),
        "fwdtex": ("fwd_tile_capacity", "Forward overlay tile overflow"),
        "shadowblk": ("shadow_block_capacity",
                      "Shadow boundary-block overflow"),
        "skyblk": ("sky_block_capacity", "Sky background-block overflow"),
        "stream": ("stream_capacity", "Raster stream overflow"),
    }

    def _queue_overflow(self, kinds: tuple, values) -> None:
        """kinds: monitor names; values: (len(kinds),) i32 device array.
        All of a frame's monitors ride ONE stacked array -> one readback,
        submitted to the shared background fetch thread
        (utils/async_fetch): over the remote tunnel ``is_ready`` never
        turns true in a fetch-free loop and a synchronous fetch costs a
        ~50-200 ms round-trip — the old every-8th-frame forced fetch was
        the editor round-trip's biggest per-frame stall."""
        self._overflow_inflight.append(
            (kinds, async_fetch.submit_fetch(values)))

    def _check_overflow(self, wait: bool = False) -> None:
        """Capacity monitors: if a raster tile (main/forward or shadow view)
        wanted more triangles than its bin envelope, triangles were dropped —
        grow that capacity for the next frame (grow-by-reallocating at
        raster scope, like src/light_render_data.rs:145-152 for lights).
        Fetches complete on the background thread; the frame loop only
        applies finished ones (never blocks). If fetches fall behind the
        frame rate, queued-but-unstarted ones are dropped — newer frames
        re-report the same monitors. ``wait`` blocks on each fetch
        (deterministic tests; keeps shrink accounting, unlike
        drain_monitors/_settle_sync)."""
        while self._overflow_inflight:
            kinds, head = self._overflow_inflight[0]
            if wait and not head.cancelled():
                head.result()
            if not head.done():
                if len(self._overflow_inflight) >= 4:
                    # bound the backlog: cancel fetches that never started
                    futs = async_fetch.drop_pending(
                        [f for _, f in self._overflow_inflight])
                    kept = set(id(f) for f in futs)
                    self._overflow_inflight = [
                        (k, f) for k, f in self._overflow_inflight
                        if id(f) in kept]
                break
            self._overflow_inflight.pop(0)
            if head.cancelled():
                continue
            if self._apply_monitor_values(kinds, head.result()):
                return

    def _settle_sync(self) -> bool:
        """Force-fetch every queued monitor NOW; True if a capacity grew.
        Shrink accounting is skipped: a settling frame is not evidence of
        sustained under-occupancy."""
        while self._overflow_inflight:
            kinds, head = self._overflow_inflight.pop(0)
            if head.cancelled():
                continue
            if self._apply_monitor_values(kinds, head.result(),
                                          shrink=False):
                return True
        return False

    def drain_monitors(self) -> None:
        """Block until every queued monitor fetch has been applied
        (benches/tools that must not time a pre-growth envelope)."""
        while self._overflow_inflight:
            if self._settle_sync():
                continue

    def _apply_monitor_values(self, kinds, vals, shrink: bool = True) -> bool:
        """Grow/shrink capacities from one fetched monitor stack.
        Returns True when the config changed (remaining queued monitors
        describe the old envelope and were dropped)."""
        # All values in one stack describe the same envelope, and an
        # overflow count is a valid lower bound on the needed capacity
        # regardless of the other fields — grow every overflowed field in
        # ONE config change (one retrace), not one per frame.
        grown = {}
        # stacks containing 'shadow' come from an atlas render (the only
        # queue site that reports it); their big-triangle count is the
        # SHADOW pass's need, which per-frame camera-raster monitors never
        # see — remember it as a shrink floor so a capacity grown for the
        # shadow pass doesn't thrash (shrink on 120 low camera frames ->
        # truncated atlas on the next edit -> regrow -> retrace, forever)
        from_atlas = "shadow" in kinds
        for kind, v in zip(kinds, vals):
                v = int(v)
                if from_atlas and kind == "binsbig":
                    self._shadow_big_need = max(v, 1)
                field, label = self._OVERFLOW_KINDS[kind]
                cap = getattr(self.cfg, field)
                if cap <= 0:
                    continue  # monitor disabled (dense path by request)
                if v > cap:
                    if kind in ("tex", "fwdtex", "shadowblk", "skyblk"):
                        # finer buckets than pow2: the compacted gather
                        # count scales with the capacity, so overshooting
                        # to the next power of two (e.g. 1351 -> 2048 =
                        # dense) wastes the whole saving; 12.5% headroom
                        # rounded to 256 blocks
                        new_cap = -(-int(v * 1.125) // 256) * 256
                        if kind == "tex":
                            # high occupancy: the block-compaction round
                            # trip (to_blocks/plan/scatter relayouts,
                            # ~3.6 ms at 1080p) costs more than the extra
                            # gather rows it saves — measured dense 24.5
                            # vs compacted 29.6 ms on test.lvl's 75%
                            # textured screen. Grow straight to the block
                            # count: sample_pool_compacted goes dense at
                            # capacity >= n_blocks (zero overhead), and
                            # the shrink hysteresis re-compacts if
                            # occupancy falls.
                            nb = self._tex_block_count()
                            if nb and new_cap >= nb // 2:
                                new_cap = nb
                    else:
                        new_cap = 1 << (v - 1).bit_length()
                    log.info("%s %d > %d; growing %s to %d",
                             label, v, cap, field, new_cap)
                    self.notifier.push(
                        f"{label} ({v}); capacity grown to {new_cap}",
                        "warning")
                    grown[field] = new_cap
                    # the cached atlas is stale only if the SHADOW pass
                    # itself overflowed; a camera-raster binsbig overflow
                    # leaves the (complete) atlas valid
                    if kind == "shadow" or (kind == "binsbig" and from_atlas):
                        self._atlas = None  # re-render with grown capacity
                    continue
                # shrink with hysteresis: a transient big scene must not
                # degrade compacted-pass cost forever (the compacted gather
                # count scales with the capacity). After SHRINK_AFTER
                # consecutive frames under 40% occupancy, re-bucket to the
                # observed value — never below the config-default floor.
                floor = self._capacity_floor(field)
                if kind == "binsbig":
                    # never shrink below what the shadow pass last needed
                    need = getattr(self, "_shadow_big_need", 0)
                    floor = max(floor, 1 << max(need - 1, 1).bit_length())
                if shrink and cap > floor and v < int(cap * 0.4):
                    n = self._under_count.get(kind, 0) + 1
                    if n >= self.SHRINK_AFTER:
                        if kind in ("tex", "fwdtex", "shadowblk", "skyblk"):
                            new_cap = max(floor,
                                          -(-max(v, 1) * 2 // 256) * 256)
                        else:
                            new_cap = max(floor,
                                          1 << max(2 * v - 1, 1).bit_length())
                        if new_cap < cap:
                            log.info("%s %d << %d; shrinking %s to %d",
                                     label, v, cap, field, new_cap)
                            grown[field] = new_cap
                            if kind == "shadow":
                                self._atlas = None
                            continue
                        n = 0
                    self._under_count[kind] = n
                elif shrink:
                    self._under_count[kind] = 0
        if grown:
            self.cfg = replace(self.cfg, **grown)
            # config changed: older queued monitors describe the old
            # envelope — drop them
            self._overflow_inflight.clear()
            self._under_count.clear()
            return True
        return False

    def on_end_frame(self) -> None:
        self.world.on_end_frame()

    def run_frame(self, delta_seconds: float = 0.0) -> framelib.FrameOutput:
        """update -> render -> on_end_frame (src/app.rs:286-300)."""
        self.update(delta_seconds)
        out = self.render()
        self.on_end_frame()
        return out

    def present_numpy(self) -> np.ndarray:
        """Fetch the last SDR frame to host (the swapchain copy analog)."""
        if self.last_output is None:
            self.run_frame()
        return np.asarray(self.last_output.sdr)

    # -- resize (src/app.rs:131-137) -------------------------------------------

    def resize(self, width: int, height: int) -> None:
        if width == self.cfg.width and height == self.cfg.height:
            return
        self.cfg = replace(self.cfg, width=width, height=height)
        self.camera.resize(width, height)
        self._needs_pack = True
