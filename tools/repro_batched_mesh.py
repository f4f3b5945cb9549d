"""Minimal repro for the axon batched-mesh-program failure (VERDICT r2 #3).

Round-2 symptom: jitting k frames of a mesh (accel) scene into one program
(lax.fori_loop over the frame step, engine/renderer._frame_step_k) made the
axon TPU client fail when the executable ran a SECOND time.  Two variants
were seen: a Rust panic ("index out of bounds: the len is 32 but the index
is 32" in loaded_executable_execute) with donated inputs — fixed by not
donating — and a backend InvalidArgument on re-execution without donation,
which round 2 worked around by disabling render_frames for accel scenes.

Run ON THE TPU from the repo root:
    python -m tools.repro_batched_mesh [k] [executions]
Exit 0 = batched mesh programs re-execute fine (the gate can come off).

--mixed reproduces the OTHER failure (round-4, still live on 08-19):
run the single-step mesh program first, then the static-k chain program
in the same process — the chain's SECOND execution fails with
InvalidArgument.  The synthetic two-program ladder
(tools/repro_mixed_programs.py: XLA / Pallas / Pallas+DMA / Pallas+DMA
with a multi-MB operand) all PASSES, so the trigger needs real-renderer
program scale or structure.  The product no longer hits it at all: the
Renderer runs every chain length through ONE dynamic-k executable
(renderer._jitted_step_dyn), so two mesh programs never coexist.
"""
import sys
import time

import numpy as np

from spt_tpu.utils.cache import enable_default_cache

enable_default_cache()

from spt_tpu.camera import Camera
from spt_tpu.config import RenderConfig
from spt_tpu.engine.renderer import Renderer, _jitted_step_k
from spt_tpu.io.gltf import bounding_box, load_gltf


def main():
    args = [a for a in sys.argv[1:] if a != "--mixed"]
    mixed = "--mixed" in sys.argv[1:]
    k = int(args[0]) if args else 16
    execs = int(args[1]) if len(args) > 1 else 4
    W, H = 512, 384
    desc = load_gltf(
        "/root/reference/assets/models/rattan_dining_chair/scene.gltf"
    )
    lo, hi = bounding_box(desc)
    center = (lo + hi) / 2
    extent = float(np.linalg.norm(hi - lo))
    cfg = RenderConfig(width=W, height=H, spp=1, max_depth=4)
    cam = Camera(position=center + np.array([0.0, 0.35, 1.1]) * extent,
                 target=center, fov_degrees=60.0, aspect_ratio=W / H)
    r = Renderer(desc, cfg, camera=cam)

    step_k = _jitted_step_k(cfg, k)
    if mixed:
        # the abort trigger: one single-step program execution first (use
        # the static single-step program, not the renderer's dynamic one)
        from spt_tpu.engine.renderer import _jitted_step

        r.state, r.last_stats = _jitted_step(cfg)(
            r.scene, r.env, r.lights, r.camera.rays(), r.state
        )
        print("single-step ok,",
              float(np.asarray(r.state.accum[:1]).sum()), flush=True)
    for i in range(execs):
        t0 = time.perf_counter()
        r.state, r.last_stats = step_k(
            r.scene, r.env, r.lights, r.camera.rays(), r.state
        )
        s = float(np.asarray(r.state.accum[:1]).sum())
        dt = time.perf_counter() - t0
        print(f"execution {i}: ok, {dt * 1e3:.1f} ms total "
              f"({dt / k * 1e3:.1f} ms/frame), accum[0]={s:.4f}", flush=True)
    assert float(r.state.sample_count) == cfg.spp * k * execs
    print("batched mesh program re-executes cleanly")


if __name__ == "__main__":
    main()
