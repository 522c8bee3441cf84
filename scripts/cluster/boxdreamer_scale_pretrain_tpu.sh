#!/bin/bash
# Pretraining recipe on a TPU pod — the reference's
# scripts/tools/cluster/boxdreamer_scale_pretrain.sh:1-139 (Objaverse +
# OnePose pretrain from scratch) on top of the topology-detecting
# train_tpu.sh launcher. Run on every pod worker (see train_tpu.sh header
# for the COORDINATOR/NUM_PROCESSES/PROCESS_ID wiring).
set -e
cd "$(dirname "$0")/../.."

EXP_NAME="${EXP_NAME:-boxdreamer_scale_pretrain}" \
exec ./scripts/cluster/train_tpu.sh \
    use_pretrained=False \
    pretrain_name="boxdreamer_scale_pretrain" \
    datamodule.train_datasets="[Objaverse, OnePose]" \
    datamodule.val_datasets="[LINEMOD]" \
    "$@"
