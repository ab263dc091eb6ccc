#!/usr/bin/env bash
# Multi-host evaluation launch (reference dist_test.sh counterpart).
# Each host evaluates its `idx % process_count` shard
# (parallel/eval.shard_indices); results merge via shard files.
#
#   ./tools/launch_test.sh CONFIG CKPT INFO_PKL DATA_ROOT [extra args...]
set -euo pipefail
CONFIG=$1; CKPT=$2; INFO=$3; ROOT=$4; shift 4
exec python "$(dirname "$0")/test.py" \
    --config "$CONFIG" --checkpoint "$CKPT" \
    --info-pkl "$INFO" --data-root "$ROOT" --eval "$@"
