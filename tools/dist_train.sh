#!/usr/bin/env bash
# Multi-host launcher (replaces the reference's torch.distributed.launch +
# NCCL, tools/dist_train.sh). JAX initializes the mesh from these env vars;
# each host runs the same command:
#
#   JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
#     bash tools/dist_train.sh <config> [args...]
#
# On Cloud TPU pods, plain `python tools/train.py` suffices (jax.distributed
# auto-detects the slice).
CONFIG=$1
shift
python tools/train.py "$CONFIG" "$@"
