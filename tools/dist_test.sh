#!/usr/bin/env bash
# Multi-host evaluation launcher (reference: tools/dist_test.sh, which wraps
# torch.distributed.launch; here one JAX process per host joins the global
# mesh and eval/runner.py shards the val set per process — see
# docs/DISTRIBUTED.md).
#
# Run once per host:
#   COORDINATOR=host0:8476 NUM_HOSTS=2 HOST_ID=0 tools/dist_test.sh \
#       --data-root data/av2 --checkpoint work_dirs/far3d
set -euo pipefail

: "${COORDINATOR:?set COORDINATOR=host:port (host 0's address)}"
: "${NUM_HOSTS:?set NUM_HOSTS}"
: "${HOST_ID:?set HOST_ID (0..NUM_HOSTS-1)}"

export FAR3D_COORDINATOR="$COORDINATOR"
export FAR3D_NUM_PROCESSES="$NUM_HOSTS"
export FAR3D_PROCESS_ID="$HOST_ID"

exec python "$(dirname "$0")/test.py" "$@"
