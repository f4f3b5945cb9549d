"""Persistent compilation cache.

The fused Pallas bounce kernel takes minutes of (remote) Mosaic compile per
configuration; the JAX persistent cache can amortize that across processes.

NOT enabled by default: on the axon remote-compile TPU environment the
persistent cache was observed to interact pathologically with the compile
relay (multi-minute stalls on what should be cache hits).  Opt in explicitly
where the environment supports it.
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
