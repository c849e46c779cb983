"""Model zoo: segmentation backbones and generative families.

Mirrors the reference's model surface (SURVEY.md §2): U-Net
(``unet/unet_model.py``), DeepLabV3, Swin-UNet, UNet3D; Pix2Pix generator /
PatchGAN discriminator with DARTS cells; BBDM diffusion; Soft-intro VAE.

``create_seg_model(name, ...)`` replaces the reference's reflection-based
factory (``models_pix2pix/__init__.py:25-67``, ``--seg_model`` dispatch at
``train_end2end_jsrt.py:61-64``) with an explicit registry.
"""

from __future__ import annotations

from typing import Any


def create_seg_model(name: str, n_channels: int, n_classes: int, **kw: Any):
    name = name.lower()
    if name == "unet":
        from semantic_segmentation_tpu.models.unet import UNet
        return UNet(n_channels=n_channels, n_classes=n_classes, **kw)
    if name == "deeplab":
        from semantic_segmentation_tpu.models.deeplab import DeepLabV3
        return DeepLabV3(n_channels=n_channels, n_classes=n_classes, **kw)
    if name == "deeplabv2":
        from semantic_segmentation_tpu.models.deeplab import DeepLabV2
        return DeepLabV2(n_channels=n_channels, n_classes=n_classes, **kw)
    if name in ("vit", "swin", "swin_unet"):
        from semantic_segmentation_tpu.models.swin_unet import SwinUnet
        return SwinUnet(n_channels=n_channels, n_classes=n_classes, **kw)
    if name == "unet3d":
        from semantic_segmentation_tpu.models.unet3d import UNet3D
        return UNet3D(in_channels=n_channels, num_classes=n_classes, **kw)
    raise ValueError(f"unknown segmentation model: {name}")
