#!/usr/bin/env bash
# Multi-host TPU pod-slice launcher — the reference's SLURM story
# (train.sbatch: 1 node / 1 GPU) mapped to TPU pods: the same command runs
# on EVERY host of the slice; jax.distributed.initialize() discovers the
# topology from the TPU runtime metadata, envs shard per host over DCN, and
# the learner's gradient psum rides ICI.
#
# Single host (or CPU debug with a virtual mesh):
#   scripts/train_pod.sh --env sim --updates 100
# Pod slice (run via your pod launcher on all hosts, e.g.
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="cd repo && scripts/train_pod.sh ..."):
set -euo pipefail
cd "$(dirname "$0")/.."

exec python -m balatro_gym_tpu.train.cli --distributed "$@"
