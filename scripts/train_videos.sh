#!/usr/bin/env bash
# Batch launcher: run the full pipeline for each video dataset in sequence.
# Twin of reference train.sh (an sbatch wrapper over 9 videos, one GPU each,
# train.sh:13-19) — on TPU the multi-scene mesh (parallel/multi_scene.py)
# can also train several videos in ONE process; this script is the simple
# sequential fallback for single-chip runs.
#
# Usage: scripts/train_videos.sh <datasets_root> <outputs_root> [extra flags...]
set -euo pipefail

ROOT=${1:?datasets root}
OUT=${2:?outputs root}
shift 2

# the reference's 9 videos (4 EPIC-KITCHENS + 5 HOI4D, train.sh:13-14)
VIDEOS=${VIDEOS:-"P03_03 P17_01 P18_06 P32_01 Video1 Video2 Video3 Video4 Video5"}

for v in $VIDEOS; do
  if [ -d "$ROOT/$v" ]; then
    echo "=== training $v ==="
    python -m egogaussian_tpu.cli.train -s "$ROOT/$v" -m "$OUT/$v" --resume "$@"
  else
    echo "skipping $v (not found under $ROOT)"
  fi
done
