#!/usr/bin/env bash
# Single/multi-node launcher wrapper (reference tools/run_dist_launch.sh:
# run_dist_launch.sh NPROC CONFIG ... -> tools/launch.py fan-out). Here:
#
#   run_dist_launch.sh <nproc_per_node> -- <training command...>
#
# extra topology via env: NNODES, NODE_RANK, COORD_ADDR, COORD_PORT.
set -e
NPROC=$1
shift
[ "$1" = "--" ] && shift
exec python -m reftr_tpu.tools.launch \
    --nproc_per_node "${NPROC}" \
    --nnodes "${NNODES:-1}" \
    --node_rank "${NODE_RANK:-0}" \
    --coordinator_address "${COORD_ADDR:-127.0.0.1}" \
    --coordinator_port "${COORD_PORT:-29500}" \
    -- "$@"
