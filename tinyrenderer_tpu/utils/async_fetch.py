"""Background device→host fetches.

Over the remote-TPU tunnel neither ``block_until_ready`` nor ``is_ready``
behave (CLAUDE.md): an async readback queue polled with ``is_ready`` never
drains, and a synchronous ``np.asarray`` stalls the frame loop for a full
network round-trip (~50-200 ms). The engine therefore routes every
device→host readback that is not needed THIS frame — capacity-monitor
scalars, the editor's pick-id maps — through one worker thread: the frame
loop submits and keeps rendering; results are applied whenever their
future completes. The device fetch releases the GIL (network/DMA wait),
so the worker costs the loop nothing.

This is the TPU analog of the reference's ``map_async`` + poll pattern
(src/pollable_gpu_buffer.rs:25-54) with the poll replaced by a thread,
because the tunnel gives us no working completion signal to poll.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np

_EXECUTOR: ThreadPoolExecutor | None = None


def _executor() -> ThreadPoolExecutor:
    global _EXECUTOR
    if _EXECUTOR is None:
        _EXECUTOR = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="tr-fetch")
    return _EXECUTOR


def submit_fetch(device_array) -> Future:
    """Fetch ``device_array`` to a np.ndarray on the worker thread."""
    return _executor().submit(np.asarray, device_array)


def drop_pending(futures: list) -> list:
    """Cancel-and-drop futures that have not started; keep the rest.
    Bounds the worker's backlog when fetches are slower than the loop."""
    kept = []
    for f in futures:
        if f.done() or not f.cancel():
            kept.append(f)
    return kept
