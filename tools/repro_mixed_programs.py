"""Narrow the axon mixed-program abort to its minimal trigger.

Observed failure (engine/renderer.render_frames docstring): a process that
executes the single-step mesh program and THEN a k-frame batched program
over the same fused Pallas kernels gets an InvalidArgument from the axon
client on the later program's execute.  One program alone — either one —
re-executes cleanly (tools/repro_batched_mesh.py).

This script runs a ladder of synthetic two-program children, each in its
own subprocess (an abort must not kill the ladder), from plain XLA up to
Pallas-with-DMA-scratch, and prints PASS/FAIL per rung:

  xla        two distinct jnp programs, interleaved re-execution
  pallas     two wrappers of one Pallas kernel (VMEM only, no DMA)
  dma        two wrappers of one Pallas kernel with HBM->VMEM async-copy
             scratch (single call vs fori_loop chain) — the renderer's shape
  dma-big    same, with a multi-MB HBM operand (the renderer's scale)

Run ON THE TPU: PYTHONPATH=.:/root/.axon_site python tools/repro_mixed_programs.py
Exit 0 = no rung aborts (the renderer workaround can come off).
"""
import os
import subprocess
import sys

CHILD = r"""
import sys
import jax, jax.numpy as jnp
import numpy as np

RUNG = sys.argv[1]
N = 1 << 20


def _pallas_fn(dma: bool, big: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = 4096 if big else 64  # big: 4096*128*4B = 2 MB streamed operand

    def kernel(x_hbm, o_ref, scratch, sem):
        def body(i, acc):
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 8, 8)], scratch,
                                       sem)
            cp.start()
            cp.wait()
            return acc + jnp.sum(scratch[...])
        acc = jax.lax.fori_loop(0, rows // 8, body, jnp.float32(0.0))
        o_ref[0, 0] = acc

    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(x)[0, 0]

    def run_novmem(x):  # no DMA: whole operand as one VMEM block
        def k2(x_ref, o_ref):
            o_ref[0, 0] = jnp.sum(x_ref[...])
        return pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
        )(x)[0, 0]

    x = jnp.ones((rows, 128), jnp.float32)
    fn = run if dma else run_novmem
    p_single = jax.jit(lambda a: fn(a) + 1.0)
    p_chain = jax.jit(
        lambda a: jax.lax.fori_loop(0, 16, lambda i, c: c + fn(a), 0.0))
    return x, p_single, p_chain


if RUNG == "xla":
    x = jnp.arange(N, dtype=jnp.float32)
    p_single = jax.jit(lambda a: jnp.sum(a * 2.0))
    p_chain = jax.jit(
        lambda a: jax.lax.fori_loop(0, 16, lambda i, c: c + jnp.sum(a), 0.0))
elif RUNG == "pallas":
    x, p_single, p_chain = _pallas_fn(dma=False, big=False)
elif RUNG == "dma":
    x, p_single, p_chain = _pallas_fn(dma=True, big=False)
elif RUNG == "dma-big":
    x, p_single, p_chain = _pallas_fn(dma=True, big=True)
else:
    raise SystemExit(f"unknown rung {RUNG}")

# the renderer's failing sequence: single-step program first, then the
# batched program, then BOTH again (the abort hits a re-execution)
for i, p in enumerate((p_single, p_chain, p_single, p_chain, p_chain)):
    v = float(np.asarray(p(x)))
    print(f"exec {i} ({'chain' if p is p_chain else 'single'}): {v:.1f}",
          flush=True)
print("OK", flush=True)
"""

RUNGS = sys.argv[1:] or ["xla", "pallas", "dma", "dma-big"]
failures = 0
for rung in RUNGS:
    out = subprocess.run([sys.executable, "-c", CHILD, rung],
                         env=dict(os.environ), capture_output=True,
                         text=True, timeout=900)
    ok = out.returncode == 0 and "OK" in out.stdout
    print(f"{rung:>8}: {'PASS' if ok else 'FAIL'}")
    if not ok:
        failures += 1
        tail = (out.stdout + out.stderr)[-1200:]
        print("  --- child tail ---")
        for line in tail.splitlines():
            print(f"  {line}")
sys.exit(1 if failures else 0)
