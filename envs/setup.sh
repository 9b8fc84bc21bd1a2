#!/usr/bin/env bash
# Environment setup (role parity with the reference's envs/ scripts).
#
# TPU hosts ship jax with the TPU runtime preinstalled; this script covers a
# fresh CPU/dev machine. No conda requirement — plain venv.
set -euo pipefail

PYTHON=${PYTHON:-python3}
VENV=${VENV:-.venv}

$PYTHON -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"

pip install --upgrade pip
# CPU jax by default; on TPU hosts install the matching jax[tpu] wheel instead
pip install "jax[cpu]" numpy pandas pyyaml matplotlib pytest torch
pip install -e .

# native CSV ingest (optional; the loader falls back to pandas without it)
make -C native || echo "[setup] native build skipped (no toolchain)"

echo "[setup] done. Run: make test"
