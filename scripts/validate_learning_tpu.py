"""Learning-dynamics validation on the real TPU: run the flagship end-to-end
bilevel program at the reference regime (256^2, batch 2, 9-shot) on synthetic
JSRT-shaped data and confirm the segmentation Dice climbs. Writes a summary
JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_segmentation_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()

from semantic_segmentation_tpu.core.config import parse_config  # noqa: E402
from semantic_segmentation_tpu.train.train_end2end import train  # noqa: E402


def main():
    # the SHIPPED flagship preset (hypergrad='decay_only' — trajectory-
    # identical to darts under the reference wiring, tested)
    cfg = parse_config([], preset="end2end_jsrt")
    cfg.data.synthetic = True
    cfg.data.image_size = 256
    cfg.data.n_train = 7
    cfg.data.n_val = 2
    cfg.data.n_test = 8
    cfg.engine.valid_step = 25
    cfg.run.final_checkpoint = False   # skip the ~1GB tunnel pull
    cfg.run.save_dir = "/tmp/genseg_validate"
    cfg.run.name = "validate-e2e"
    iters = int(os.environ.get("VALIDATE_ITERS", "400"))
    t0 = time.time()
    state, results = train(cfg, train_iters=iters)
    results["iters"] = iters
    results["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
