#!/usr/bin/env bash
# Analog of reference scripts/train_pix2pix_isic.sh.
exec python -m semantic_segmentation_tpu.train.train_pix2pix \
    --preset=pix2pix_jsrt --data.dataset=isic "$@"
