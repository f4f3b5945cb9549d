"""Persistent compilation cache.

Where the first-frame time goes (measured, 256x192 default scene, v5e):
the XLA compile of the frame program is ~1.6 s; the remaining ~60-100 s is
the Mosaic kernel compile, which under the axon remote-compile runtime
happens lazily at first *execution* and rides a compile relay.  The JAX
persistent cache stores the XLA executable (including the serialized kernel
module); once both it and the relay's own kernel cache are warm, a fresh
process reaches frame 1 in ~2 s for a previously-rendered configuration.

Enabled by default on the product surfaces (CLI, bench) via
:func:`enable_default_cache`.  Opt out with SPT_TPU_NO_CACHE=1 — round 1
observed multi-minute stalls on what should have been cache hits under an
earlier relay deployment (not reproducible at round 2; measurements above).
Override the location with SPT_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get(
        "SPT_TPU_CACHE_DIR", os.path.expanduser("~/.cache/spt_tpu_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_default_cache() -> None:
    """Product-surface default: persistent cache on unless opted out."""
    if os.environ.get("SPT_TPU_NO_CACHE"):
        return
    enable_compilation_cache()
