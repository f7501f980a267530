#!/bin/bash
# Hermetic CPU runner for the parity tools (PARITY.md "Measurement
# conditions"): `python -S` skips site processing so the axon sitecustomize
# cannot register the tunneled TPU plugin; the env is scrubbed of every
# TPU/axon/JAX var; torch/numpy run single-threaded (multi-threaded torch
# reduction order alone adds an O(1e-3) cosine haze, see PARITY.md round 3);
# `-O` strips asserts (the reference asserts f32 inputs, which the f64
# referee must bypass — tools/parity_grad.py:318-320).
#
# Usage: tools/run_hermetic_cpu.sh tools/parity_grad.py --points 2048 ...
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PURELIB="$(python -c 'import sysconfig; print(sysconfig.get_path("purelib"))')"
KEEP="$(python -c 'import os; print(os.pathsep.join(p for p in os.environ.get("PYTHONPATH","").split(os.pathsep) if p and "axon_site" not in p))')"
exec env -i HOME="$HOME" PATH="$PATH" TMPDIR="${TMPDIR:-/tmp}" \
  PYTHONPATH="$REPO:$PURELIB:$KEEP" \
  JAX_PLATFORMS=cpu \
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 OPENBLAS_NUM_THREADS=1 \
  CT_PORTABLE_IMPL="${CT_PORTABLE_IMPL:-}" \
  python -S -O "$@"
