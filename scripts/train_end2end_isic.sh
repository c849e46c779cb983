#!/usr/bin/env bash
# Analog of reference scripts/train_end2end_isic.sh: 40-shot ISIC regime
# (jaccard loss, fake_trans photometric postprocess).
exec python -m semantic_segmentation_tpu.train.train_end2end \
    --preset=end2end_isic "$@"
