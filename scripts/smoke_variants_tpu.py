"""Real-TPU smoke matrix for every variant pipeline (VERDICT r4 item 2).

Round 4's gap: the BBDM trainer + sampler, end2end_bbdm, the soft-intro VAE
pretrain + end2end_vae, the Swin (vit) and DeepLab seg backbones, the ISIC
preset, and the pix2pix pretrain had only forced-CPU suite evidence — they
had never executed on the hardware this framework is named for. The
reference runs all of them on its real accelerator (BBDM/main.py:116-126,
Soft-intro_VAE/train_vae.py, running_files/train_end2end_isic.py,
models_pix2pix/train.py).

This script runs each entry ON THE REAL CHIP through its actual ``train()``
entry point at the SHIPPED model widths (only dataset sizes and iteration
counts are reduced; synthetic data — no datasets exist in this
environment), N>=20 real optimizer steps each, and records one JSON row per
entry: {entry, steps, it/s (steady-state, from the metrics.jsonl timestamps
after the compile step), final losses + finiteness, wall}. The BBDM row
additionally exercises the 200-step scan SAMPLER on the trained state.

Each row runs in its own subprocess (tunnel-HBM hygiene — bench.py module
docstring) under a global wall-clock budget, value-ordered, with the
cumulative result re-written to the output JSON after every row, so a
timeout still lands the rows already measured.

Usage: python scripts/smoke_variants_tpu.py [out.json]
Env:   SMOKE_BUDGET_SEC (default 5400), SMOKE_ROWS (comma list to filter).
"""

from __future__ import annotations

import glob
import json
import math
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Row spec: module = semantic_segmentation_tpu.train.<module>.train(cfg,
# train_iters=iters). Widths stay at the shipped preset values; overrides
# only shrink the synthetic dataset + logging cadence.
ROWS: dict[str, dict] = {
    # BBDM pixel-space trainer (BBDM/main.py + Template-BBDM.yaml regime:
    # 256^2, batch 8, ADM UNet) + the 200-step skip sampler on the result.
    # Template width (model_channels=128, mult (1,4,8)) has a 19.4 GB
    # f32 state (params+adam+EMA, measured by eval_shape) — it cannot fit
    # a 16 GB v5e-lite at ANY batch (the reference uses a 40 GB A100), so
    # the smoke runs the same architecture at model_channels=64 (state
    # 4.9 GB) and records the deviation.
    "train_bbdm": {"module": "train_bbdm", "preset": "bbdm", "iters": 25,
                   "sample": True, "bbdm_channels": 64},
    # 3-problem bilevel with in-step BBDM sampling (BBDM/train_end2end.py)
    "end2end_bbdm": {"module": "train_end2end_bbdm", "preset": "end2end_bbdm",
                     "iters": 20, "bbdm_channels": 64},
    # Soft-intro VAE pretrain (Soft-intro_VAE/train_vae.py)
    "train_vae": {"module": "train_vae", "preset": "sivae", "iters": 25},
    # end2end with the VAE generator + fake_trans photometric chain
    "end2end_vae": {"module": "train_end2end_vae", "preset": "end2end_sivae",
                    "iters": 20},
    # Swin-UNet seg backbone at 224 + resnet generator (util/ISIC_224_loader
    # + --seg_model vit)
    "end2end_vit": {"module": "train_end2end", "preset": "end2end_isic224",
                    "iters": 20},
    # DeepLabV3 seg backbone under the flagship JSRT program
    "end2end_deeplab": {"module": "train_end2end", "preset": "end2end_jsrt",
                        "iters": 20,
                        "overrides": {"model.seg_model": "deeplab"}},
    # ISIC preset: jaccard loss + photometric fake chain
    "end2end_isic": {"module": "train_end2end", "preset": "end2end_isic",
                     "iters": 20},
    # pix2pix pretrain at the shipped widths (unet_256, ngf=ndf=64, 256^2)
    "train_pix2pix": {"module": "train_pix2pix", "preset": "pix2pix_jsrt",
                      "iters": 25},
}


def _steady_its(save_dir: str) -> tuple[float | None, dict]:
    """Steady-state it/s from the metrics.jsonl step records (each carries a
    wall timestamp 't'): slope between the FIRST post-compile record and the
    last. Also returns the last step record's numeric fields (the final
    losses)."""
    recs = []
    for path in glob.glob(os.path.join(save_dir, "**", "metrics.jsonl"),
                          recursive=True):
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if "step" in r and "t" in r:
                    recs.append(r)
    recs.sort(key=lambda r: (r["t"], r.get("step", 0)))
    last = {k: v for k, v in (recs[-1] if recs else {}).items()
            if isinstance(v, (int, float)) and k not in ("t", "step")}
    if len(recs) < 2:
        return None, last
    # first record pays the compile; slope from record 0 -> last spans only
    # post-compile steps
    dt = recs[-1]["t"] - recs[0]["t"]
    dstep = recs[-1]["step"] - recs[0]["step"]
    return (dstep / dt if dt > 0 and dstep > 0 else None), last


def run_row(name: str) -> dict:
    from semantic_segmentation_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import importlib

    import jax
    import numpy as np

    from semantic_segmentation_tpu.core.config import parse_config

    spec = ROWS[name]
    t0 = time.time()
    cfg = parse_config([], preset=spec.get("preset"))
    cfg.data.synthetic = True
    cfg.data.n_train, cfg.data.n_val, cfg.data.n_test = 8, 2, 2
    cfg.engine.valid_step = 5
    cfg.run.log_every = 5   # enough step records for the steady-state slope
    cfg.run.wandb = False
    cfg.run.save_dir = tempfile.mkdtemp(prefix=f"smoke_{name}_")
    for k, v in (spec.get("overrides") or {}).items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)

    mod = importlib.import_module(
        f"semantic_segmentation_tpu.train.{spec['module']}")
    iters = spec["iters"]
    kwargs = {"train_iters": iters}
    deviation = None
    if spec.get("bbdm_channels"):
        import jax.numpy as jnp
        from semantic_segmentation_tpu.train.train_bbdm import BBDMModel
        mc = spec["bbdm_channels"]
        bbdm = BBDMModel(
            channels=cfg.model.output_nc, model_channels=mc,
            accumulate=cfg.optim.accumulate,
            compute_dtype=jnp.bfloat16
            if cfg.model.compute_dtype == "bfloat16" else jnp.float32)
        kwargs["model" if spec["module"] == "train_bbdm" else "bbdm"] = bbdm
        deviation = (f"model_channels {mc} (template 128: 19.4 GB f32 "
                     f"state > 16 GB v5e HBM; reference uses A100-40G)")
    t1 = time.time()
    out = mod.train(cfg, **kwargs)
    # no explicit sync needed: every trainer's loop pulls metric scalars to
    # host floats for logging, which synchronizes the tunneled device
    wall_train = time.time() - t1
    its, losses = _steady_its(cfg.run.save_dir)
    rec = {
        "entry": name, "module": spec["module"], "preset": spec.get("preset"),
        "steps": iters, "image_size": cfg.data.image_size,
        "batch_size": cfg.data.batch_size,
        "iters_per_sec_steady": round(its, 4) if its else None,
        "final_losses": {k: round(v, 6) for k, v in losses.items()},
        "losses_finite": bool(losses) and all(
            math.isfinite(v) for v in losses.values()),
        "wall_train_sec": round(wall_train, 1),
        "device_kind": jax.devices()[0].device_kind,
        **({"deviation": deviation} if deviation else {}),
    }

    if spec.get("sample"):
        # short sampler run on the trained state: mask -> image through the
        # 200-step skip sampler (BBDMRunner.sample path)
        model, state = out
        from semantic_segmentation_tpu.train.common import load_splits
        cond = np.asarray(load_splits(cfg)["val"]["mask_pix2pix"][:2],
                          np.float32)
        ts = time.time()
        img = model.sample(state, cond, jax.random.key(7))
        img = np.asarray(img)
        rec["sample_wall_sec"] = round(time.time() - ts, 1)
        rec["sample_shape"] = list(img.shape)
        rec["sample_finite"] = bool(np.isfinite(img).all())

    rec["wall_total_sec"] = round(time.time() - t0, 1)
    return rec


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SMOKE_TPU_r5.json"
    budget = float(os.environ.get("SMOKE_BUDGET_SEC", "5400"))
    names = [n for n in
             (os.environ.get("SMOKE_ROWS") or ",".join(ROWS)).split(",")
             if n in ROWS]
    t0 = time.time()
    results = {"matrix": "real_tpu_variant_smoke", "rows": [],
               "budget_sec": budget}

    def flush(note=""):
        results["elapsed_sec"] = round(time.time() - t0, 1)
        if note:
            results["note"] = note
        with open(out_path + ".tmp", "w") as f:
            json.dump(results, f, indent=1)
        os.replace(out_path + ".tmp", out_path)
        print(json.dumps({"rows_done": [r["entry"] for r in results["rows"]],
                          "elapsed": results["elapsed_sec"],
                          "note": note}), flush=True)

    for name in names:
        remaining = budget - (time.time() - t0)
        if remaining < 120:
            flush(f"budget exhausted before {name}")
            return
        t_sub = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "SMOKE_ROW": name},
                capture_output=True, text=True, timeout=remaining)
        except subprocess.TimeoutExpired:
            flush(f"row {name} hit the wall-clock budget")
            return
        last = [l for l in proc.stdout.strip().splitlines() if l][-1:]
        if proc.returncode == 0 and last:
            rec = json.loads(last[0])
            rec["rc"] = 0
            rec["row_wall_sec"] = round(time.time() - t_sub, 1)
            results["rows"].append(rec)
            flush()
        else:
            results["rows"].append({
                "entry": name, "rc": proc.returncode,
                "row_wall_sec": round(time.time() - t_sub, 1),
                "stderr_tail": proc.stderr[-800:]})
            flush(f"row {name} FAILED rc={proc.returncode}")
    flush()


if __name__ == "__main__":
    row = os.environ.get("SMOKE_ROW")
    if row:
        print(json.dumps(run_row(row)))
    else:
        main()
