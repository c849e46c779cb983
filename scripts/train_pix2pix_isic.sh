#!/usr/bin/env bash
# Analog of reference scripts/train_pix2pix_isic.sh (output_nc 3 on ISIC2018).
exec python -m semantic_segmentation_tpu.train.train_pix2pix \
    --preset=pix2pix_isic "$@"
