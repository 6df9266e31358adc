#!/usr/bin/env bash
# Slurm launcher (reference: tools/slurm_train.sh). One task per host;
# jax.distributed auto-detects the Slurm environment (SLURM_NTASKS,
# SLURM_PROCID, SLURM_STEP_NODELIST) inside far3d_tpu.parallel.mesh.
#
#   tools/slurm_train.sh <partition> <job-name> <work-dir> [train.py args...]
set -euo pipefail

PARTITION=$1
JOB_NAME=$2
WORK_DIR=$3
shift 3
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
    python -u "$(dirname "$0")/train.py" --work-dir="${WORK_DIR}" "$@"
