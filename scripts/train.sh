#!/usr/bin/env bash
# Headline MLSP pipeline (parity with reference PointDA/train.sh):
# full SSL recipe on each PointDA pair, then SPST self-training.
set -euo pipefail

SRC=${1:-shapenet}
TRGT=${2:-scannet}
OUT=${3:-./experiments}

python -m mlsp_tpu.cli trainer \
    --exp_name "MLSP_${SRC}_${TRGT}" --out_path "$OUT" \
    --src_dataset "$SRC" --trgt_dataset "$TRGT" \
    --Density_normal_viainput True --Normal_ondef True --Density_ondef True \
    --DefRec_weight 0.5 --Density_weight 0.05 \
    "${@:4}"

python -m mlsp_tpu.cli spst \
    --exp_name "SPST_${SRC}_${TRGT}" --out_path "$OUT" \
    --src_dataset "$SRC" --trgt_dataset "$TRGT" \
    --model_file "$OUT/MLSP_${SRC}_${TRGT}/model.ckpt" \
    --threshold 1.5492 --rounds 2 --epochs 20 \
    "${@:4}"
