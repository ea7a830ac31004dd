#!/bin/bash
# Sequential TPU measurement sweep: run once when the chip is reachable.
#
# Each step is its own process (the TPU worker can crash under heavy eigh
# and recovers on the next process start) and they run strictly one at a
# time — only ONE process may hold the TPU.
#
# Usage: bash benchmarks/run_tpu_sweep.sh [logfile]
set -u
cd "$(dirname "$0")/.."
# The package is not pip-installed; scripts under benchmarks/ need the repo
# root importable.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${1:-/tmp/tpu_sweep.log}
step() {
  echo "=== [$(date -u +%H:%M:%S)] $1" | tee -a "$LOG"
  shift
  timeout 3000 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" | tee -a "$LOG"
}

step "backend + kernel capability probes" python -c "
import jax
print('backend:', jax.default_backend(), jax.devices())
from kronfluence_tpu.utils.platform import pallas_works, is_tpu_backend
print('is_tpu_backend:', is_tpu_backend())
print('pallas_works:', pallas_works())
from kronfluence_tpu.ops.pallas.syrk import syrk_works
print('syrk_works:', syrk_works())
from kronfluence_tpu.ops.pallas.jacobi import jacobi_works
print('jacobi_compiled_works:', jacobi_works())
"

step "micro_syrk" python benchmarks/micro_syrk.py
step "micro_eigh dc (accuracy)" python benchmarks/micro_eigh.py dc --accuracy
step "micro_eigh auto (qdwh baseline)" python benchmarks/micro_eigh.py auto
step "micro_conv" python benchmarks/micro_conv.py
step "llama-scale factors on TPU" env KRON_LLAMA_SCALE=1 python -m pytest \
  tests/test_llama_scale.py -x -q -k tpu
step "bench quick" env KRON_BENCH_QUICK=1 python bench.py
step "bench quick fp8 query storage, block 112" env KRON_BENCH_QUICK=1 \
  KRON_BENCH_QUERY_STORAGE=float8_e4m3fn KRON_BENCH_QUERY_ACC=14 \
  KRON_BENCH_FIDELITY=1 python bench.py

echo "SWEEP DONE — inspect $LOG, then decide solver defaults before the full bench." | tee -a "$LOG"
