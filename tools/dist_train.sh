#!/usr/bin/env bash
# Multi-host training launcher (reference: tools/multi_dist_train.sh:5-38,
# which wraps torch.distributed.launch over NCCL; here one JAX process per
# host joins a global device mesh over ICI/DCN).
#
# On Cloud TPU pods you normally don't need this script at all — run
#   python tools/train.py ...
# on every host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`);
# jax.distributed auto-detects the pod topology.
#
# On a generic cluster, run this once per host:
#   COORDINATOR=host0:8476 NUM_HOSTS=2 HOST_ID=0 tools/dist_train.sh \
#       --data-root data/av2 --work-dir work_dirs/far3d
#   COORDINATOR=host0:8476 NUM_HOSTS=2 HOST_ID=1 tools/dist_train.sh ...
set -euo pipefail

: "${COORDINATOR:?set COORDINATOR=host:port (host 0's address)}"
: "${NUM_HOSTS:?set NUM_HOSTS}"
: "${HOST_ID:?set HOST_ID (0..NUM_HOSTS-1)}"

export FAR3D_COORDINATOR="$COORDINATOR"
export FAR3D_NUM_PROCESSES="$NUM_HOSTS"
export FAR3D_PROCESS_ID="$HOST_ID"

exec python "$(dirname "$0")/train.py" "$@"
