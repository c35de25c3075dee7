#!/usr/bin/env bash
# Multi-host TPU-pod training under SLURM: one task per host.
# jax.distributed.initialize derives coordinator/rank from SLURM_* variables
# (dfu3d_tpu/parallel/distributed.py), replacing the reference's scontrol-based
# MASTER_ADDR plumbing (slurm_train.sh).
#   sbatch --ntasks-per-node=1 --nodes=N tools/scripts/slurm_train_tpu.sh CFG ...
set -e
CFG=$1
shift
srun python tools/train.py --cfg_file "$CFG" "$@"
