#!/usr/bin/env bash
# Multi-host launcher shim (replaces the reference's tools/run_dist_slurm.sh
# NCCL bootstrap). Each task runs the same command; JAX discovers the pod
# topology itself on TPU pod slices, and reftr_tpu.core.distributed falls
# back to Slurm env vars (SLURM_PROCID / SLURM_NTASKS / node list) off-TPU.
#
# usage: run_slurm.sh <job-name> <ntasks> <partition> -- <python args...>
set -x
JOB_NAME=$1
NTASKS=$2
PARTITION=$3
shift 3
[ "$1" = "--" ] && shift

srun --job-name="${JOB_NAME}" \
     --partition="${PARTITION}" \
     --ntasks="${NTASKS}" \
     --ntasks-per-node=1 \
     --kill-on-bad-exit=1 \
     python -u -m reftr_tpu.cli.main "$@"
