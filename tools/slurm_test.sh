#!/usr/bin/env bash
# Slurm evaluation launcher (reference: tools/slurm_test.sh). One task per
# host; jax.distributed auto-detects the Slurm environment inside
# far3d_tpu.parallel.mesh, and eval/runner.py shards the val set per process
# with rank-0 metric aggregation.
#
#   tools/slurm_test.sh <partition> <job-name> [test.py args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
shift 2
NODES=${NODES:-2}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}

srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --nodes="${NODES}" \
    --ntasks="${NODES}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" "$@"
