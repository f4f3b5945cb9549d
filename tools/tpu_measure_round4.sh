#!/bin/bash
# Round-4 TPU measurement sequence — run when the axon tunnel is back.
# Usage (from /root/repo):  bash tools/tpu_measure_round4.sh [outfile]
# Each step is independently time-bounded and appends to the log, so a
# mid-sequence worker fault loses one step, not the run.  Steps run in
# SEPARATE processes (distinct large mesh programs in one process can
# abort the axon client).
set -u
OUT="${1:-/tmp/round4_measure.log}"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon
cd /root/repo

step() {
  echo "=== $1 (start $(date +%H:%M:%S)) ===" | tee -a "$OUT"
  shift
  timeout 1800 "$@" 2>&1 | tail -40 | tee -a "$OUT"
  echo "=== exit $? ===" | tee -a "$OUT"
}

# 1. the headline round-4 capability: instanced vs streamed bigmesh
step "bigmesh instanced"            python bench.py --scene bigmesh
SPT_INSTANCED=0 step "bigmesh streamed (A/B)" python bench.py --scene bigmesh
# 2. the env fetch A/B on the hdr config (packed ships default-OFF after
#    the 08-19 measurement: 98.3 packed vs 102.0 four-take Mrays/s e2e)
step "hdr 4-take env (default)"     python bench.py --scene hdr
SPT_ENV_PACKED=1 step "hdr packed env (A/B)"  python bench.py --scene hdr
step "env packed micro"             python benchmarks/env_packed_ab.py
# 3. the texture-resolution trade on the chair (256^2 default vs the old
#    128^2): the round-3 16.31 Mrays/s chair number was at 128^2
step "gltf 256^2 tex (default)"     python bench.py --scene gltf
SPT_TEX_BUDGET=131072 step "gltf 128^2 tex (A/B)" python bench.py --scene gltf
# 4. regression check on the other configs
step "bench --all"                  python bench.py --all
# 4. the per-lane traversal spike (VERDICT r3 #3)
step "per-lane spike"               python tools/spike_perlane.py
# 5. the mixed-program abort ladder (VERDICT r3 #7)
step "mixed-program ladder"         python tools/repro_mixed_programs.py

echo "DONE $(date)" | tee -a "$OUT"
