#!/usr/bin/env bash
# Analog of reference scripts/train_pix2pix_lung.sh: stage-1 pix2pix
# pre-training on JSRT (200 epochs x 80 images, batch 2).
exec python -m semantic_segmentation_tpu.train.train_pix2pix \
    --preset=pix2pix_jsrt "$@"
