#!/bin/bash
# Finetuning recipe on a TPU pod — the reference's
# scripts/tools/cluster/boxdreamer_scale_ft.sh:1-135 (resume from the
# pretrain run's weights) on top of the topology-detecting train_tpu.sh
# launcher. Run on every pod worker (see train_tpu.sh header for the
# COORDINATOR/NUM_PROCESSES/PROCESS_ID wiring).
set -e
cd "$(dirname "$0")/../.."

EXP_NAME="${EXP_NAME:-boxdreamer_scale_ft}" \
exec ./scripts/cluster/train_tpu.sh \
    use_pretrained=True \
    pretrain_name="${PRETRAIN_NAME:-boxdreamer_scale_pretrain}" \
    "$@"
