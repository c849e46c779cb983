#!/usr/bin/env bash
# Analog of reference scripts/test_isic.sh: ISIC test split + PH2/DermIS OOD.
exec python -m semantic_segmentation_tpu.train.test_seg \
    --data.dataset=isic "$@"
