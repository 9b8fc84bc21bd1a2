#!/usr/bin/env bash
# Launch JupyterLab against the st-dadk-tpu environment (parity with the
# reference's envs/jupyter/start_jupyter_lab.sh; its SLURM/ssh-tunnel
# plumbing is out of scope here — on a TPU VM you port-forward with gcloud).
#
#   ./envs/jupyter/start_jupyter_lab.sh [-p PORT]
#
# Remote use:  gcloud compute tpus tpu-vm ssh <vm> -- -L 8888:localhost:8888
set -euo pipefail

PORT=8888
while [[ $# -gt 0 ]]; do
  case "$1" in
    -p|--port) PORT="$2"; shift 2 ;;
    *) echo "usage: $0 [-p PORT]" >&2; exit 2 ;;
  esac
done

command -v jupyter >/dev/null \
  || { echo "jupyter not installed (pip install jupyterlab)" >&2; exit 1; }

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
cd "$REPO"
exec jupyter lab --no-browser --ip=127.0.0.1 --port="$PORT"
