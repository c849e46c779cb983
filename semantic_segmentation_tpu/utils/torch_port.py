"""Pretrained-weight porting: torch state_dicts -> flax param/batch-stats
trees (SURVEY.md §7 hard part 4 — the reference leans on torch.hub /
timm / torchvision checkpoints: deeplab/deeplabv3.py:8, swin_unet load_from,
VGG16 in Soft-intro_VAE/loss.py, LPIPS/Inception in BBDM/evaluation).

Primitives convert the layout differences (torch OIHW conv -> HWIO; torch
ConvTranspose IOHW -> our forward-equivalent flipped HWIO; Linear (out, in)
-> (in, out); BatchNorm weight/bias/running stats -> scale/bias/mean/var),
plus a concrete porter for the reference U-Net layout as the worked example.
torch itself (CPU) is only imported inside these helpers.
"""

from __future__ import annotations

import numpy as np


def load_state_dict(path: str) -> dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv (O, I, *k) -> HWIO (*k, I, O)."""
    nsp = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nsp)) + (1, 0))


def convert_conv_transpose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, *k) -> our forward-equivalent kernel:
    spatially flipped, (*k, I, O)."""
    nsp = w.ndim - 2
    w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * nsp]
    return np.ascontiguousarray(
        np.transpose(w, tuple(range(2, 2 + nsp)) + (0, 1)))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return np.transpose(w)


def port_batchnorm(sd: dict, prefix: str):
    """-> ({'scale','bias'}, {'mean','var'})."""
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def port_unet_milesial(sd: dict):
    """Port the reference U-Net (unet/unet_model.py naming: inc/down1..4/
    up1..4/outc with DoubleConv indices) into our models/unet.py tree.
    Accepts a raw ``torch.save(net.state_dict())`` .pkl/.pth file's dict."""
    params: dict = {}
    stats: dict = {}

    def double_conv(src_prefix):
        p, s = {}, {}
        for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
            p[f"conv{i}"] = {"kernel": convert_conv(
                sd[f"{src_prefix}.{ci}.weight"])}
            bn_p, bn_s = port_batchnorm(sd, f"{src_prefix}.{bi}")
            p[f"bn{i}"] = bn_p
            s[f"bn{i}"] = bn_s
        return p, s

    params["inc"], stats["inc"] = double_conv("inc.double_conv")
    for i in range(1, 5):
        # Down wraps its DoubleConv as a submodule
        p, s = double_conv(f"down{i}.maxpool_conv.1.double_conv")
        params[f"down{i}"] = {"DoubleConv_0": p}
        stats[f"down{i}"] = {"DoubleConv_0": s}
        p, s = {}, {}
        up = f"up{i}"
        if f"{up}.up.weight" in sd:  # transpose-conv variant
            p["TorchConvTranspose_0"] = {
                "kernel": convert_conv_transpose(sd[f"{up}.up.weight"]),
                "bias": sd[f"{up}.up.bias"],
            }
        dc_p, dc_s = {}, {}
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            dc_p[f"conv{j}"] = {"kernel": convert_conv(
                sd[f"{up}.conv.double_conv.{ci}.weight"])}
            bn_p, bn_s = port_batchnorm(sd, f"{up}.conv.double_conv.{bi}")
            dc_p[f"bn{j}"] = bn_p
            dc_s[f"bn{j}"] = bn_s
        p["DoubleConv_0"] = dc_p
        s["DoubleConv_0"] = dc_s
        params[up], stats[up] = p, s
    params["outc"] = {"kernel": convert_conv(sd["outc.conv.weight"]),
                      "bias": sd["outc.conv.bias"]}
    return params, stats
