#!/bin/bash
# TPU training launcher — the TPU-native equivalent of the reference's GPU
# cluster scripts (scripts/tools/cluster/boxdreamer_scale_{ft,pretrain}.sh):
# detect the accelerator topology, scale the batch size to the hardware,
# and launch run.py with the right overrides.
#
# Single host:   ./scripts/cluster/train_tpu.sh [EXTRA_OVERRIDES...]
# TPU pod (one process per host, run on every worker, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command=...):
#   COORDINATOR=<host0-ip>:8476 NUM_PROCESSES=<hosts> PROCESS_ID=<worker-id> \
#     ./scripts/cluster/train_tpu.sh
# (jax.distributed is initialized from these variables by
#  boxdreamer_tpu/parallel/distributed.py when distributed.enable=true.)

set -e

EXP_NAME="${EXP_NAME:-boxdreamer_tpu_scale}"
CONFIG_NAME="${CONFIG_NAME:-train.yaml}"
COOR="${COOR:-object}"
IMAGE_SIZE=224
PATCH_SIZE=14
PER_CHIP_BATCH="${PER_CHIP_BATCH:-}"

CURRENT_PATH=$(pwd)
echo "Current directory: $CURRENT_PATH"

# ======================================
# 1. Detect TPU topology (chips, generation, HBM) — the TPU analogue of the
#    reference's nvidia-smi GPU-count/name/memory probing.
# ======================================
read -r CHIP_COUNT DEVICE_KIND <<EOF2
$(python - <<'PY'
import jax
devs = jax.devices()
print(len(devs), devs[0].device_kind.replace(" ", "_") if devs else "none")
PY
)
EOF2
echo "Chips detected: $CHIP_COUNT ($DEVICE_KIND)"

# Per-chip batch size by generation (HBM-driven, like the reference's
# per-GPU-model batch scaling). Override with PER_CHIP_BATCH.
if [ -z "$PER_CHIP_BATCH" ]; then
    case "$DEVICE_KIND" in
        *v5_lite*|*v5litepod*|*v5e*) PER_CHIP_BATCH=28 ;;  # 16 GB HBM
        *v4*)                        PER_CHIP_BATCH=56 ;;  # 32 GB HBM
        *v5p*|*v6*)                  PER_CHIP_BATCH=96 ;;  # 95/144 GB HBM
        *)                           PER_CHIP_BATCH=16 ;;
    esac
fi
BATCH_SIZE=$((PER_CHIP_BATCH * CHIP_COUNT))
echo "Batch size: $BATCH_SIZE ($PER_CHIP_BATCH/chip x $CHIP_COUNT chips)"

CPU_COUNT=$(nproc)
WORKERS_NUM=$((BATCH_SIZE < CPU_COUNT ? BATCH_SIZE : CPU_COUNT))
echo "Loader workers: $WORKERS_NUM"

# ======================================
# 2. Multi-host (pod) wiring — the NCCL env vars of the reference become
#    jax.distributed coordinator settings, consumed by
#    boxdreamer_tpu/parallel/distributed.initialize() at CLI startup.
# ======================================
if [ -n "$COORDINATOR" ]; then
    export JAX_COORDINATOR_ADDRESS="$COORDINATOR"
    export JAX_NUM_PROCESSES="${NUM_PROCESSES:?set NUM_PROCESSES}"
    export JAX_PROCESS_ID="${PROCESS_ID:?set PROCESS_ID}"
    echo "Pod mode: process $PROCESS_ID/$NUM_PROCESSES via $COORDINATOR"
fi

# ======================================
# 3. Launch
# ======================================
TRAIN_CMD=(
    python run.py
    --config-name="$CONFIG_NAME"
    exp_name="$EXP_NAME"
    coordinate="$COOR"
    bbox_representation="heatmap"
    datamodule.batch_size="$BATCH_SIZE"
    datamodule.num_workers="$WORKERS_NUM"
    image_size="$IMAGE_SIZE"
    patch_size="$PATCH_SIZE"
    model.modules.use_rgb=True
    model.modules.decoder.num_decoder_layers=12
    "$@"
)

echo "Executing: ${TRAIN_CMD[*]}"
"${TRAIN_CMD[@]}"
echo "Training completed successfully."
