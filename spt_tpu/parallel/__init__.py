"""Multi-chip scaling: pixel-axis sharding over a device mesh."""

from spt_tpu.parallel.sharding import (make_mesh, shard_pixels,
                                        sharded_frame_step,
                                        sharded_frame_step_dyn)

__all__ = ["make_mesh", "shard_pixels", "sharded_frame_step",
           "sharded_frame_step_dyn"]
