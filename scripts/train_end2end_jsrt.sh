#!/usr/bin/env bash
# Analog of reference scripts/train_end2end_jsrt.sh: end-to-end bilevel
# GenSeg on the 9-shot JSRT regime. Flags: --data.dataroot=<JSRT dir>,
# --run.pretrained_pix2pix=<stage-1 ckpt dir>. All reference
# hyperparameters live in the end2end_jsrt preset (core/config.py).
exec python -m semantic_segmentation_tpu.train.train_end2end \
    --preset=end2end_jsrt "$@"
