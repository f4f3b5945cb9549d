"""Explicit progressive-render state + checkpoint/resume.

The reference's only persistent cross-frame state is the progressive
accumulation buffer and frame counter, reset on camera motion (GLRenderer.cpp:
19,145-161 on CPU; accum + frame_index_ on GPU, OptixBackend.cpp:1540-1543,
1606-1609) — and it offers no way to save a long render.  Making (accum,
sample_count, frame_index) an explicit pytree gives checkpoint/resume for
free (SURVEY.md §5 checkpoint/resume note).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RenderState(NamedTuple):
    """Accumulated linear HDR radiance (the float4 accum buffer,
    OptixBackend.cpp:1429-1434, split into sums + count)."""

    accum: jnp.ndarray         # (N, 3) float32 linear radiance sums
    sample_count: jnp.ndarray  # () float32 accumulated samples per pixel
    frame_index: jnp.ndarray   # () int32 — RNG epoch

    @property
    def num_pixels(self) -> int:
        return self.accum.shape[0]


def init_state(num_pixels: int) -> RenderState:
    return RenderState(
        accum=jnp.zeros((num_pixels, 3), jnp.float32),
        sample_count=jnp.zeros((), jnp.float32),
        frame_index=jnp.zeros((), jnp.int32),
    )


def reset(state: RenderState) -> RenderState:
    """Accumulation reset on camera motion (GLRenderer.cpp:154-161) — the
    frame index keeps advancing so the RNG stream never repeats."""
    return RenderState(
        accum=jnp.zeros_like(state.accum),
        sample_count=jnp.zeros_like(state.sample_count),
        frame_index=state.frame_index,
    )


def accumulate(state: RenderState, radiance: jnp.ndarray, spp: float) -> RenderState:
    """Fold one frame's (N, 3) mean radiance (of `spp` samples) into the sums."""
    return RenderState(
        accum=state.accum + radiance * spp,
        sample_count=state.sample_count + spp,
        frame_index=state.frame_index + 1,
    )


def save_checkpoint(path: str, state: RenderState) -> None:
    # Write through an open handle: np.savez appends ".npz" when given a bare
    # path, which would break the save->load round trip for other extensions.
    with open(path, "wb") as f:
        np.savez(
            f,
            accum=np.asarray(state.accum),
            sample_count=np.asarray(state.sample_count),
            frame_index=np.asarray(state.frame_index),
        )


def load_checkpoint(path: str) -> RenderState:
    data = np.load(path)
    return RenderState(
        accum=jnp.asarray(data["accum"]),
        sample_count=jnp.asarray(data["sample_count"]),
        frame_index=jnp.asarray(data["frame_index"]),
    )
