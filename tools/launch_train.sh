#!/usr/bin/env bash
# Multi-host training launch (reference dist_train.sh counterpart).
#
# On TPU pods, one python process per host drives all local chips; JAX
# discovers peers through the TPU runtime (no torch.distributed.launch).
# For GCE TPU VMs run this same command on every worker (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`).
#
#   ./tools/launch_train.sh CONFIG INFO_PKL DATA_ROOT [extra args...]
set -euo pipefail
CONFIG=$1; INFO=$2; ROOT=$3; shift 3
exec python "$(dirname "$0")/train.py" --multihost \
    --config "$CONFIG" --info-pkl "$INFO" --data-root "$ROOT" "$@"
