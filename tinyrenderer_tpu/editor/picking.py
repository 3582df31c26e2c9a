"""Asynchronous object-pick readback.

The reference renders an R32Uint object-id texture, copies it to a mappable
buffer every frame and polls ``map_async`` completions through a VecDeque —
selection reads data 1-2 frames old (src/object_picker.rs:50-52,110-124).

TPU-native version: the pick-id map is already an output of the jitted
frame (emitted by the same raster pass, so depth equality with the GBuffer
is exact by construction — the idiomatic fix for pick.wgsl's @invariant
trick, SURVEY.md §7.3). The device→host copy runs on the shared background
fetch thread (utils/async_fetch): over the remote-TPU tunnel ``is_ready``
never turns true in a fetch-free loop, and the old force-complete fallback
synchronously pulled a full-resolution id map through the tunnel EVERY
frame once the deque filled — measured ~180 ms/frame of the editor
round-trip. The frame loop now never blocks; selection still reads data a
few frames old, exactly the reference's latency model.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np

from ..utils import async_fetch


class PickReadbackManager:
    """src/object_picker.rs ObjectPickManager, minus the extra GPU pass."""

    def __init__(self, max_in_flight: int = 3):
        self._in_flight: deque = deque()   # Futures of np.ndarray
        self._latest: Optional[np.ndarray] = None
        self.max_in_flight = max_in_flight

    def on_end_frame(self, pick_id) -> None:
        """Enqueue this frame's device pick map (the copy+map_async analog,
        src/object_picker.rs:126-140). If the fetch worker is backlogged,
        queued-but-unstarted fetches are dropped in favor of this newer
        frame (the cursor wants the freshest completed map, not a backlog
        replay)."""
        self._in_flight.append(async_fetch.submit_fetch(pick_id))
        if len(self._in_flight) > self.max_in_flight:
            self._in_flight = deque(
                async_fetch.drop_pending(list(self._in_flight)))
            # still over cap (all running/done): drop the oldest result
            while len(self._in_flight) > self.max_in_flight:
                f = self._in_flight.popleft()
                if f.done() and not f.cancelled():
                    self._latest = f.result()

    def update(self) -> None:
        """Drain every completed fetch (src/object_picker.rs:110-124)."""
        while self._in_flight and self._in_flight[0].done():
            f = self._in_flight.popleft()
            if not f.cancelled():
                self._latest = f.result()

    def flush(self) -> None:
        """Block until every in-flight readback has landed (tests/headless
        tools; the interactive loop should use update() instead)."""
        while self._in_flight:
            f = self._in_flight.popleft()
            if not f.cancelled():
                self._latest = f.result()

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
