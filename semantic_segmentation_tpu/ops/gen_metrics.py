"""Generative-quality evaluation — the BBDM/evaluation and GenSeg-3D
util/evaluation.py capabilities:

- FID (``BBDM/evaluation/FID.py``): Frechet distance between Gaussian fits of
  feature sets, with a pluggable feature extractor. The reference uses
  pytorch-fid's InceptionV3-pool3; offline TPU runs can port those weights
  (utils/torch_port.py) or use any embedding network — the Frechet math here
  is extractor-agnostic and matches pytorch_fid.fid_score numerics.
- LPIPS (``BBDM/evaluation/LPIPS.py``): normalized-feature distance with
  learned linear weights; requires ported AlexNet/VGG weights, with a
  documented fallback to plain normalized-feature L2 over a provided
  extractor.
- sample diversity (``BBDM/evaluation/diversity.py``): pixel std over
  repeated samples per condition.
- volume metrics (``GenSeg-3D/util/evaluation.py``): masked MAE / MSE / PSNR
  / SSIM between generated and real volumes, written to CSV (the reference
  writes an Excel sheet).
"""

from __future__ import annotations

import csv

import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """d^2 = |mu1 - mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (pytorch_fid)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_features(feats_a: np.ndarray, feats_b: np.ndarray):
    mu1, s1 = feats_a.mean(0), np.cov(feats_a, rowvar=False)
    mu2, s2 = feats_b.mean(0), np.cov(feats_b, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def lpips_distance(feats_a: list, feats_b: list, lin_weights: list | None = None):
    """Sum over layers of mean((w * (norm(fa) - norm(fb)))^2). ``feats_*``
    are lists of (N, H, W, C) layer activations; ``lin_weights`` the learned
    per-channel weights (ported), else uniform."""
    total = 0.0
    for li, (fa, fb) in enumerate(zip(feats_a, feats_b)):
        na = fa / (np.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        nb = fb / (np.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        if lin_weights is not None:
            d = d * lin_weights[li].reshape(1, 1, 1, -1)
        total += d.sum(axis=-1).mean(axis=(1, 2))
    return total


def inception_features(inception_vars: tuple, images: np.ndarray,
                       batch_size: int = 16) -> np.ndarray:
    """pool3 features (N, 2048) from NHWC images in [0, 1]. ``inception_vars``
    = (params, batch_stats) from utils.torch_port.port_inception_v3."""
    import jax
    from semantic_segmentation_tpu.models.extractors import InceptionV3Pool3
    params, stats = inception_vars
    net = InceptionV3Pool3()
    fwd = jax.jit(lambda x: net.apply({"params": params,
                                       "batch_stats": stats}, x))
    out = [np.asarray(fwd(images[i:i + batch_size]))
           for i in range(0, len(images), batch_size)]
    return np.concatenate(out, 0)


def fid(inception_vars: tuple, images_a: np.ndarray, images_b: np.ndarray,
        batch_size: int = 16) -> float:
    """End-to-end FID between two NHWC [0,1] image sets — the
    pytorch_fid.fid_score capability (BBDM/evaluation/FID.py:11-17)."""
    fa = inception_features(inception_vars, images_a, batch_size)
    fb = inception_features(inception_vars, images_b, batch_size)
    return fid_from_features(fa, fb)


def lpips(alex_params, lin_weights, images_a, images_b,
          batch_size: int = 16) -> np.ndarray:
    """LPIPS(alex) per pair — BBDM/evaluation/LPIPS.py:10-30. Inputs NHWC in
    [0, 1]; returns (N,). Weights from utils.torch_port.port_alexnet_lpips."""
    import jax
    from semantic_segmentation_tpu.models.extractors import lpips_alex
    fwd = jax.jit(lambda a, b: lpips_alex(alex_params, lin_weights, a, b))
    out = [np.asarray(fwd(images_a[i:i + batch_size],
                          images_b[i:i + batch_size]))
           for i in range(0, len(images_a), batch_size)]
    return np.concatenate(out, 0)


def sample_diversity(samples: np.ndarray):
    """diversity.py: mean pixel std over repeated samples per condition.
    samples shape (n_conditions, n_samples, H, W, C)."""
    return float(np.mean(np.std(samples, axis=1)))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         k1: float = 0.01, k2: float = 0.03, win: int = 7):
    """Simple windowed SSIM (uniform window) for volume/image QA."""
    from numpy.lib.stride_tricks import sliding_window_view
    pad = win // 2
    axes = tuple(range(a.ndim))
    aw = sliding_window_view(a, (win,) * a.ndim)
    bw = sliding_window_view(b, (win,) * b.ndim)
    wa = tuple(range(a.ndim, 2 * a.ndim))
    mu_a, mu_b = aw.mean(axis=wa), bw.mean(axis=wa)
    var_a, var_b = aw.var(axis=wa), bw.var(axis=wa)
    cov = (aw * bw).mean(axis=wa) - mu_a * mu_b
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / \
        ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    del axes, pad
    return float(s.mean())


def volume_metrics(fake: np.ndarray, real: np.ndarray,
                   mask: np.ndarray | None = None):
    """ExcelEvaluate-style metrics (GenSeg-3D/util/evaluation.py:7-99)."""
    if mask is not None:
        sel = mask.astype(bool)
        f, r = fake[sel], real[sel]
    else:
        f, r = fake.ravel(), real.ravel()
    mae = float(np.mean(np.abs(f - r)))
    mse = float(np.mean((f - r) ** 2))
    rng = float(real.max() - real.min()) or 1.0
    psnr = float(10.0 * np.log10(rng ** 2 / mse)) if mse > 0 else float("inf")
    return {"mae": mae, "mse": mse, "psnr": psnr,
            "ssim": ssim(fake.squeeze(), real.squeeze())}


def write_metrics_csv(rows: list[dict], path: str):
    """CSV stand-in for the reference's Excel sheet writer."""
    if not rows:
        return
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
