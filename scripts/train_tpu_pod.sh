#!/usr/bin/env bash
# Launch yogo training on every host of a TPU pod slice (the TPU-native
# analog of the reference's SLURM multi-GPU submit scripts,
# reference: scripts/submit_cmd_multi_gpu.sh).
#
# Usage: gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#            --command="bash scripts/train_tpu_pod.sh dataset.yml [extra args]"
#
# jax.distributed autodetects coordinator/process ids on TPU pods; the
# per-host loader shards by (process_index, process_count) automatically.
set -euo pipefail
DATASET_DEFN="$1"; shift || true
python -m yogo_tpu train "$DATASET_DEFN" "$@"
