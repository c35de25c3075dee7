#!/usr/bin/env bash
# Single-host TPU training (all local chips driven by one process — the
# reference's dist_train.sh torch.distributed.launch equivalent is a no-op
# here: jax addresses every local chip from one process).
set -e
CFG=$1
shift
python tools/train.py --cfg_file "$CFG" "$@"
