"""Multi-chip parallel rendering (dp × sp device mesh)."""

from .sharded import (  # noqa: F401
    ShardedFrameOutput,
    compiled_sharded_frame,
    make_mesh,
    render_frame_sharded,
    render_shadow_atlas_sharded,
    sharded_config,
)
