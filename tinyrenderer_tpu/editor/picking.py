"""Asynchronous object-pick readback.

The reference renders an R32Uint object-id texture, copies it to a mappable
buffer every frame and polls ``map_async`` completions through a VecDeque —
selection reads data 1-2 frames old (src/object_picker.rs:50-52,110-124).

TPU-native version: the pick-id map is already an output of the jitted
frame (emitted by the same raster pass, so depth equality with the GBuffer
is exact by construction — the idiomatic fix for pick.wgsl's @invariant
trick, SURVEY.md §7.3). JAX dispatch is async; we keep a deque of in-flight
device arrays and only ``device_get`` one once its computation has
finished, preserving the reference's N-frame-latency, never-blocking
behavior.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import numpy as np


class PickReadbackManager:
    """src/object_picker.rs ObjectPickManager, minus the extra GPU pass."""

    def __init__(self, max_in_flight: int = 3):
        self._in_flight: deque[jax.Array] = deque()
        self._latest: Optional[np.ndarray] = None
        self.max_in_flight = max_in_flight

    def on_end_frame(self, pick_id: jax.Array) -> None:
        """Enqueue this frame's device pick map (the copy+map_async analog,
        src/object_picker.rs:126-140)."""
        self._in_flight.append(pick_id)
        # never hold more than max_in_flight: force-complete the oldest
        while len(self._in_flight) > self.max_in_flight:
            self._latest = np.asarray(self._in_flight.popleft())

    def update(self) -> None:
        """Poll completions (src/object_picker.rs:110-124): drain every
        in-flight map whose device computation already finished."""
        while self._in_flight and self._is_ready(self._in_flight[0]):
            self._latest = np.asarray(self._in_flight.popleft())

    @staticmethod
    def _is_ready(arr: jax.Array) -> bool:
        try:
            return arr.is_ready()
        except AttributeError:  # older jax / non-array
            return True

    def flush(self) -> None:
        """Block until every in-flight readback has landed (tests/headless
        tools; the interactive loop should use update() instead)."""
        while self._in_flight:
            self._latest = np.asarray(self._in_flight.popleft())

    def get_object_id_at(self, x: float, y: float) -> int:
        """Object id under the cursor from the last completed readback;
        0 = no object (src/world.rs:47). Out-of-bounds -> 0."""
        if self._latest is None:
            return 0
        h, w = self._latest.shape
        xi, yi = int(x), int(y)
        if 0 <= xi < w and 0 <= yi < h:
            return int(self._latest[yi, xi])
        return 0

    @property
    def latest(self) -> Optional[np.ndarray]:
        return self._latest
