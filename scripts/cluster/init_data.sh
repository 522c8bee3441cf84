#!/bin/bash
# Workspace bootstrap: symlink datasets + output dirs into the repo layout
# (reference scripts/tools/cluster/init.sh:1-120). Run from the repo root.
#
#   STORAGE_PATH=/mnt/disks/datasets OUTPUT_PATH=/mnt/disks/output \
#     ./scripts/cluster/init_data.sh

set -e

storage_path="${STORAGE_PATH:-/input_ssd/datasets}"
output_path="${OUTPUT_PATH:-$HOME/output/boxdreamer_tpu}"

link() {  # link NAME TARGET
    if [ ! -L "$1" ] && [ ! -d "$1" ]; then
        ln -s "$2" "$1"
        echo "Symbolic link created: $1 -> $2"
    else
        echo "Already exists: $1"
    fi
}

mkdir -p data && cd data
link lm "$storage_path/linemod_onepose/lm_full"
link onepose "$storage_path/onepose"
link ycbv "$storage_path/ycbv"
link lmo "$storage_path/lmo"
cd ..

mkdir -p "$output_path/models" "$output_path/logs"
link models "$output_path/models"
link logs "$output_path/logs"

mkdir -p data/objaverse && cd data/objaverse
link bbox_3d "$output_path/objaverse_bbox3d"
link renders "$output_path/objaverse_renders"
cd ../..

echo "Workspace initialized (datasets from $storage_path, outputs in $output_path)."
