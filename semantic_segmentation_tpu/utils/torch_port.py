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


def port_vgg16_features(sd: dict):
    """torchvision ``vgg16().features`` state_dict -> models/vgg.py
    VGG16Features params (conv layers up to relu5_3; torch feature indices
    0,2,5,7,10,12,14,17,19,21,24,26,28)."""
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for i, ti in enumerate(torch_idx):
        params[f"conv{i}"] = {
            "kernel": convert_conv(sd[f"features.{ti}.weight"]
                                   if f"features.{ti}.weight" in sd
                                   else sd[f"{ti}.weight"]),
            "bias": sd.get(f"features.{ti}.bias", sd.get(f"{ti}.bias")),
        }
    return params


def port_vgg_lpips(sd_lpips: dict):
    """taming LPIPS(vgg) checkpoint lins (``lin{i}.model.1.weight``, shapes
    (1, C, 1, 1) for C in 64/128/256/512/512) -> list of per-channel vectors
    for models/vgg.py vgg_lpips."""
    lins = []
    for i in range(5):
        key = (f"lin{i}.model.1.weight" if f"lin{i}.model.1.weight" in sd_lpips
               else f"lins.{i}.model.1.weight")
        lins.append(np.asarray(sd_lpips[key]).reshape(-1))
    return lins


def port_vqgan(sd: dict):
    """taming/BBDM VQModel checkpoint -> (params, {}) for
    models/diffusion/vqgan.py VQModel (Template-LBBDM f4/f8/f16 first
    stages; BBDM/model/VQGAN/vqgan.py + taming model.py naming).

    Mapping: encoder.down.{i}.block.{j} -> encoder/down{i}_block{j};
    encoder.down.{i}.downsample.conv -> encoder/down{i}_conv;
    mid.block_1/attn_1/block_2 -> mid_block1/mid_attn/mid_block2 (attn
    q/k/v/proj_out are 1x1 convs -> Dense); decoder.up.{i}.block.{j} ->
    decoder/up{i}_block{j} (taming's up list is insert(0,...)-built, so
    indices already align); quantize.embedding.weight direct. Loss-scope
    keys (``loss.*`` — LPIPS/discriminator) are skipped."""
    params: dict = {"encoder": {}, "decoder": {}, "quantize": {},
                    "quant_conv": {}, "post_quant_conv": {}}

    def put(where, name, leaf, value):
        where.setdefault(name, {})[leaf] = value

    def conv(v):
        return convert_conv(v)

    def block_dest(side, kind, parts):
        # parts like ['down','0','block','1','conv1','weight']
        li, bi = int(parts[1]), int(parts[3])
        return params[side].setdefault(f"{kind}{li}_block{bi}", {}), parts[4:]

    for k, v in sd.items():
        if k.startswith("loss."):
            continue
        parts = k.split(".")
        side = parts[0]
        if side in ("quant_conv", "post_quant_conv"):
            put(params, side, "kernel" if parts[1] == "weight" else "bias",
                conv(v) if parts[1] == "weight" else v)
            continue
        if side == "quantize":
            params["quantize"]["embedding"] = v
            continue
        if side not in ("encoder", "decoder"):
            continue
        rest = parts[1:]
        if rest[0] in ("conv_in", "conv_out"):
            put(params[side], rest[0],
                "kernel" if rest[1] == "weight" else "bias",
                conv(v) if rest[1] == "weight" else v)
        elif rest[0] == "norm_out":
            put(params[side], "norm_out",
                "scale" if rest[1] == "weight" else "bias", v)
        elif rest[0] == "mid":
            name = {"block_1": "mid_block1", "attn_1": "mid_attn",
                    "block_2": "mid_block2"}[rest[1]]
            node = params[side].setdefault(name, {})
            sub, leaf = rest[2], rest[3]
            if rest[1] == "attn_1" and sub in ("q", "k", "v", "proj_out"):
                if leaf == "weight":  # 1x1 conv -> Dense (I, O)
                    put(node, sub, "kernel",
                        np.transpose(np.asarray(v)[:, :, 0, 0]))
                else:
                    put(node, sub, "bias", v)
            elif sub.startswith("norm"):
                put(node, sub, "scale" if leaf == "weight" else "bias", v)
            else:
                put(node, sub, "kernel" if leaf == "weight" else "bias",
                    conv(v) if leaf == "weight" else v)
        elif rest[0] in ("down", "up"):
            if rest[2] == "block":
                node, tail = block_dest(side, rest[0], rest)
                sub, leaf = tail[0], tail[1]
                if sub.startswith("norm"):
                    put(node, sub, "scale" if leaf == "weight" else "bias", v)
                else:
                    put(node, sub, "kernel" if leaf == "weight" else "bias",
                        conv(v) if leaf == "weight" else v)
            else:  # downsample/upsample conv
                li = int(rest[1])
                put(params[side], f"{rest[0]}{li}_conv",
                    "kernel" if rest[-1] == "weight" else "bias",
                    conv(v) if rest[-1] == "weight" else v)
    return params, {}


def port_swin_tiny(sd: dict, depths=(2, 2, 2, 2), depths_decoder=(1, 2, 2, 2)):
    """timm/microsoft ``swin_tiny_patch4_window7_224`` state_dict -> our
    models/swin_unet.py params, replicating the reference's ``load_from``
    (swin_unet/vision_transformer.py:54+): encoder weights load directly and
    are ALSO copied into the mirrored decoder stage (``layers.{i}`` ->
    ``layers_up.{3-i}``). Heads/skip projections stay randomly initialized
    (the reference's non-matching keys are likewise skipped)."""
    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def block(prefix):
        return {
            "norm1": ln(f"{prefix}.norm1"),
            "attn": {
                "qkv": {"kernel": convert_linear(sd[f"{prefix}.attn.qkv.weight"]),
                        "bias": sd[f"{prefix}.attn.qkv.bias"]},
                "proj": {"kernel": convert_linear(sd[f"{prefix}.attn.proj.weight"]),
                         "bias": sd[f"{prefix}.attn.proj.bias"]},
                "rel_pos_bias": sd[f"{prefix}.attn.relative_position_bias_table"],
            },
            "norm2": ln(f"{prefix}.norm2"),
            "mlp_fc1": {"kernel": convert_linear(sd[f"{prefix}.mlp.fc1.weight"]),
                        "bias": sd[f"{prefix}.mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": convert_linear(sd[f"{prefix}.mlp.fc2.weight"]),
                        "bias": sd[f"{prefix}.mlp.fc2.bias"]},
        }

    params: dict = {
        "patch_embed": {"kernel": convert_conv(sd["patch_embed.proj.weight"]),
                        "bias": sd["patch_embed.proj.bias"]},
        "embed_norm": ln("patch_embed.norm"),
    }
    nl = len(depths)
    for li in range(nl):
        for bi in range(depths[li]):
            b = block(f"layers.{li}.blocks.{bi}")
            # flatten to our module names (attn is a submodule)
            params[f"enc{li}_blk{bi}"] = {
                "norm1": b["norm1"], "norm2": b["norm2"],
                "mlp_fc1": b["mlp_fc1"], "mlp_fc2": b["mlp_fc2"],
                "attn": b["attn"],
            }
        if li < nl - 1:
            params[f"merge{li}"] = {
                "norm": ln(f"layers.{li}.downsample.norm"),
                "reduction": {"kernel": convert_linear(
                    sd[f"layers.{li}.downsample.reduction.weight"])},
            }
    # decoder mirror (load_from's layers_up remap): our decoder stage li
    # (== layers_up[li+1]) receives encoder layer nl-2-li's blocks
    for li in range(nl - 1):
        src = nl - 2 - li
        for dbi in range(depths_decoder[nl - 2 - li]):
            sbi = min(dbi, depths[src] - 1)
            params[f"dec{li}_blk{dbi}"] = params[f"enc{src}_blk{sbi}"]
    if "norm.weight" in sd:
        params["bottleneck_norm"] = ln("norm")
    return params


def _set_path(tree: dict, parts, leaf_name, value):
    node = tree
    for p in parts:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def port_inception_v3(sd: dict):
    """pytorch-fid / torchvision ``inception_v3`` state_dict ->
    (params, batch_stats) for models/extractors.py InceptionV3Pool3
    (BBDM/evaluation/FID.py:11-17 uses this network via pytorch_fid).
    Module names match the checkpoint ('Mixed_5b.branch1x1.conv' ...), so the
    port is mechanical: convs transpose OIHW->HWIO, BNs split into
    scale/bias + mean/var. fc / AuxLogits keys are ignored (pool3 head)."""
    params: dict = {}
    stats: dict = {}
    for k, v in sd.items():
        if k.startswith(("fc.", "AuxLogits.")):
            continue
        parts = k.split(".")
        leaf = parts[-1]
        if parts[-2] == "conv" and leaf == "weight":
            _set_path(params, parts[:-1], "kernel", convert_conv(v))
        elif parts[-2] == "bn":
            if leaf == "weight":
                _set_path(params, parts[:-1], "scale", v)
            elif leaf == "bias":
                _set_path(params, parts[:-1], "bias", v)
            elif leaf == "running_mean":
                _set_path(stats, parts[:-1], "mean", v)
            elif leaf == "running_var":
                _set_path(stats, parts[:-1], "var", v)
    return params, stats


def port_alexnet_lpips(sd_alex: dict, sd_lpips: dict | None = None):
    """torchvision ``alexnet`` (features.0/3/6/8/10 convs) -> AlexNetFeatures
    params, plus the lpips 'alex' linear weights (``lin{i}.model.1.weight``,
    shape (1, C, 1, 1)) -> list of per-channel vectors
    (BBDM/evaluation/LPIPS.py:10-30). With no lpips checkpoint the lins
    default to uniform 1/C (documented fallback)."""
    conv_idx = [0, 3, 6, 8, 10]
    widths = [64, 192, 384, 256, 256]
    params = {}
    for i, ti in enumerate(conv_idx):
        params[f"conv{i}"] = {
            "kernel": convert_conv(sd_alex[f"features.{ti}.weight"]),
            "bias": sd_alex[f"features.{ti}.bias"],
        }
    if sd_lpips is None:
        lins = [np.full((w,), 1.0 / w, np.float32) for w in widths]
    else:
        lins = []
        for i in range(5):
            key = (f"lin{i}.model.1.weight" if f"lin{i}.model.1.weight"
                   in sd_lpips else f"lins.{i}.model.1.weight")
            lins.append(np.asarray(sd_lpips[key]).reshape(-1))
    return params, lins


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


def _port_resnet_stages(sd: dict, prefix: str, layers):
    """Shared torch-ResNet -> flax-backbone body (stem conv1/bn1 +
    layer{L}.{B}.conv{1,2,3}|bn{1,2,3}|downsample.{0,1}) used by
    port_deeplabv2, port_deeplabv3, and port_resnet50_backbone — the naming
    is identical across the reference's deeplabv2 backbone and torchvision's
    resnet50 (dilations are architectural, not stored)."""
    bb_p, bb_s = {}, {}
    bb_p["stem"] = {"kernel": convert_conv(sd[f"{prefix}conv1.weight"])}
    bb_p["stem_bn"], bb_s["stem_bn"] = port_batchnorm(sd, f"{prefix}bn1")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            src = f"{prefix}layer{li + 1}.{bi}"
            dst_p, dst_s = {}, {}
            for ci in (1, 2, 3):
                dst_p[f"conv{ci}"] = {
                    "kernel": convert_conv(sd[f"{src}.conv{ci}.weight"])}
                dst_p[f"bn{ci}"], dst_s[f"bn{ci}"] = port_batchnorm(
                    sd, f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                dst_p["down_conv"] = {
                    "kernel": convert_conv(sd[f"{src}.downsample.0.weight"])}
                dst_p["down_bn"], dst_s["down_bn"] = port_batchnorm(
                    sd, f"{src}.downsample.1")
            bb_p[f"layer{li + 1}_{bi}"] = dst_p
            bb_s[f"layer{li + 1}_{bi}"] = dst_s
    return bb_p, bb_s


def port_deeplabv2(sd: dict, layers=(3, 4, 23)):
    """Port a DeepLabV2 state_dict (the reference's ``deeplabv2/`` naming:
    ``backbone.conv1/bn1/layer{L}.{B}.conv{1,2,3}|bn{1,2,3}|downsample.{0,1}``
    + ``classifier.conv2d_list.{i}``, deeplab_v2.py:13-89,
    backbone/resnet.py:53-120) into our models/deeplab.DeepLabV2 tree.
    ``layers`` = blocks for stages 1-3 (layer4 is always the 3-block MG unit).
    -> (params, batch_stats)."""
    bb_p, bb_s = _port_resnet_stages(sd, "backbone.", tuple(layers) + (3,))
    cls_p = {}
    for i in range(4):
        cls_p[f"conv{i}"] = {
            "kernel": convert_conv(sd[f"classifier.conv2d_list.{i}.weight"]),
            "bias": sd[f"classifier.conv2d_list.{i}.bias"]}
    return ({"backbone": bb_p, "classifier": cls_p}, {"backbone": bb_s})


def _infer_resnet_layers(sd: dict, prefix: str) -> tuple:
    """Block counts per stage, read off the state_dict keys themselves (so
    checkpoints for any Bottleneck-ResNet depth port without a layers arg)."""
    return tuple(
        1 + max(int(k[len(f"{prefix}layer{li}."):].split(".")[0])
                for k in sd if k.startswith(f"{prefix}layer{li}."))
        for li in (1, 2, 3, 4))


def port_resnet50_backbone(sd: dict, layers=None):
    """torchvision ImageNet ``resnet50()`` state_dict (conv1/bn1/layer1..4,
    fc ignored) -> (params, batch_stats) for models/deeplab.ResNet50Backbone.

    This is what the reference's ``--seg_model deeplab`` actually starts
    from: ``deeplabv3_resnet50(num_classes=..., weights=None)``
    (deeplab/deeplabv3.py:8) leaves the torchvision-0.14 builder's
    ``weights_backbone=ResNet50_Weights.IMAGENET1K_V1`` default in force —
    pretrained backbone, fresh head."""
    sd = _strip_module(sd)
    if layers is None:
        layers = _infer_resnet_layers(sd, "")
    return _port_resnet_stages(sd, "", layers)


def port_deeplabv3(sd: dict, layers=None, n_classes: int | None = None):
    """Full torchvision ``deeplabv3_resnet50`` state_dict ->
    (params, batch_stats) for models/deeplab.DeepLabV3.

    Naming (torchvision 0.14 segmentation.deeplabv3): the backbone keeps
    resnet names under ``backbone.`` (IntermediateLayerGetter);
    ``classifier`` is DeepLabHead = Sequential(ASPP, Conv2d 3x3, BN, ReLU,
    Conv2d 1x1), where ASPP.convs.0 = 1x1+BN, convs.1-3 = dilated 3x3+BN
    (rates 12/24/36), convs.4 = image pooling (conv at .1, BN at .2), and
    ``project`` the post-concat 1x1+BN. ``aux_classifier.*`` (present in
    COCO-pretrained checkpoints, aux_loss=True) is ignored. If ``n_classes``
    is given and the checkpoint's final 1x1 has a different class count, the
    final classifier is dropped (returned params lack ``classifier``; merge
    over a fresh init) — the reference's num_classes=1 rebuild does the same
    by constructing a fresh head."""
    sd = _strip_module(sd)
    if layers is None:
        layers = _infer_resnet_layers(sd, "backbone.")
    bb_p, bb_s = _port_resnet_stages(sd, "backbone.", layers)
    aspp_p, aspp_s = {}, {}
    aspp_p["b0_conv"] = {
        "kernel": convert_conv(sd["classifier.0.convs.0.0.weight"])}
    aspp_p["b0_bn"], aspp_s["b0_bn"] = port_batchnorm(
        sd, "classifier.0.convs.0.1")
    for i in (1, 2, 3):
        aspp_p[f"b{i}_conv"] = {
            "kernel": convert_conv(sd[f"classifier.0.convs.{i}.0.weight"])}
        aspp_p[f"b{i}_bn"], aspp_s[f"b{i}_bn"] = port_batchnorm(
            sd, f"classifier.0.convs.{i}.1")
    aspp_p["pool_conv"] = {
        "kernel": convert_conv(sd["classifier.0.convs.4.1.weight"])}
    aspp_p["pool_bn"], aspp_s["pool_bn"] = port_batchnorm(
        sd, "classifier.0.convs.4.2")
    aspp_p["proj_conv"] = {
        "kernel": convert_conv(sd["classifier.0.project.0.weight"])}
    aspp_p["proj_bn"], aspp_s["proj_bn"] = port_batchnorm(
        sd, "classifier.0.project.1")
    head_bn_p, head_bn_s = port_batchnorm(sd, "classifier.2")
    params = {"backbone": bb_p, "aspp": aspp_p,
              "head_conv": {"kernel": convert_conv(sd["classifier.1.weight"])},
              "head_bn": head_bn_p}
    ckpt_classes = sd["classifier.4.weight"].shape[0]
    if n_classes is None or ckpt_classes == n_classes:
        params["classifier"] = {
            "kernel": convert_conv(sd["classifier.4.weight"]),
            "bias": sd["classifier.4.bias"]}
    stats = {"backbone": bb_s, "aspp": aspp_s, "head_bn": head_bn_s}
    return params, stats


def _strip_module(sd: dict) -> dict:
    """save_model checkpoints the DataParallel wrapper (pix2pix_model.py:
    168-173 + init_net's DataParallel at networks.py:120), so saved keys
    carry a leading ``module.``."""
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in sd.items()}
    return sd


def port_pix2pix_generator(sd: dict, num_downs: int = 8):
    """Reference ``UnetGenerator`` (unet_256) state_dict ->
    (params, batch_stats) for ``models.pix2pix.networks.UnetGenerator``.

    The torch module tree is the recursive UnetSkipConnectionBlock
    (networks.py:553-617): each block is one nn.Sequential named ``model``
    whose indices depend on the block kind —
      outermost : 0=downconv 1=submodule 2=uprelu 3=Cell_upconv 4=Tanh
      middle    : 0=lrelu 1=downconv 2=downnorm 3=submodule 4=uprelu
                  5=Cell_upconv 6=upnorm (7=Dropout when used)
      innermost : 0=lrelu 1=downconv 2=uprelu 3=Cell_upconv 4=upnorm
    and each Cell_upconv holds its three ConvTranspose2d candidates at
    ``._ops._ops.{i}.op`` in PRIMITIVES_upconv order k=4,6,8
    (architecture_pix2pix/operations.py:4-40). Depth d here = nesting depth
    (d=0 outermost), matching our ``down{d}``/``up{d}``/``*_bn{d}`` names.
    """
    sd = _strip_module(sd)
    params: dict = {}
    stats: dict = {}
    base = "model.model."
    for d in range(num_downs):
        outermost, innermost = d == 0, d == num_downs - 1
        if outermost:
            down_i, up_i, norm_d, norm_u, sub_i = 0, 3, None, None, 1
        elif innermost:
            down_i, up_i, norm_d, norm_u, sub_i = 1, 3, None, 4, None
        else:
            down_i, up_i, norm_d, norm_u, sub_i = 1, 5, 2, 6, 3
        dk = f"{base}{down_i}"
        p = {"kernel": convert_conv(sd[f"{dk}.weight"])}
        if f"{dk}.bias" in sd:
            p["bias"] = sd[f"{dk}.bias"]
        params[f"down{d}"] = p
        if norm_d is not None:
            bp, bs = port_batchnorm(sd, f"{base}{norm_d}")
            params[f"down_bn{d}"], stats[f"down_bn{d}"] = bp, bs
        up: dict = {}
        for i, k in enumerate((4, 6, 8)):
            ok = f"{base}{up_i}._ops._ops.{i}.op"
            up[f"kernel_{k}"] = convert_conv_transpose(sd[f"{ok}.weight"])
            if f"{ok}.bias" in sd:
                up[f"bias_{k}"] = sd[f"{ok}.bias"]
        params[f"up{d}"] = up
        if norm_u is not None:
            bp, bs = port_batchnorm(sd, f"{base}{norm_u}")
            params[f"up_bn{d}"], stats[f"up_bn{d}"] = bp, bs
        if sub_i is not None:
            base = f"{base}{sub_i}.model."
    return params, stats


def port_pix2pix_discriminator(sd: dict, n_layers: int = 3):
    """Reference ``NLayerDiscriminator`` state_dict -> (params, batch_stats)
    for ``models.pix2pix.networks.NLayerDiscriminator`` (flat Sequential,
    networks.py:620-665: conv0 at 0, then [conv, norm, lrelu] triplets, head
    last)."""
    sd = _strip_module(sd)
    params = {"conv0": {"kernel": convert_conv(sd["model.0.weight"]),
                        "bias": sd["model.0.bias"]}}
    stats: dict = {}
    idx = 2
    for n in range(1, n_layers + 1):
        p = {"kernel": convert_conv(sd[f"model.{idx}.weight"])}
        if f"model.{idx}.bias" in sd:
            p["bias"] = sd[f"model.{idx}.bias"]
        params[f"conv{n}"] = p
        bp, bs = port_batchnorm(sd, f"model.{idx + 1}")
        params[f"bn{n}"], stats[f"bn{n}"] = bp, bs
        idx += 3
    params["head"] = {"kernel": convert_conv(sd[f"model.{idx}.weight"]),
                      "bias": sd[f"model.{idx}.bias"]}
    return params, stats


# ---------------------------------------------------------------------------
# --run.seg_pretrained: one entry point for "start the seg net from the same
# weights the reference does" (torch.hub / timm checkpoints, SURVEY.md §2.5
# pretrained-weight row). Detects the checkpoint family by key shape and
# returns partial (params, stats) trees to overlay on a fresh init.
# ---------------------------------------------------------------------------

def overlay_pytree(init_tree, ported_tree):
    """Recursively overlay ``ported_tree``'s leaves (as f32 jnp arrays) onto
    ``init_tree``; subtrees absent from the port keep their fresh init (the
    reference's strict=False-style partial load, e.g. a fresh num_classes=1
    head over a COCO-21-class checkpoint)."""
    import jax.numpy as jnp
    if not isinstance(ported_tree, dict):
        return jnp.asarray(np.asarray(ported_tree), jnp.float32)
    out = dict(init_tree) if isinstance(init_tree, dict) else {}
    for k, v in ported_tree.items():
        out[k] = overlay_pytree(out.get(k, {}), v)
    return out


def port_seg_checkpoint(seg_model: str, sd: dict, n_classes: int = 1):
    """Dispatch a torch segmentation checkpoint to the right porter.

    seg_model 'deeplab' accepts either a full torchvision
    ``deeplabv3_resnet50`` state_dict (``backbone.*`` + ``classifier.*``) or
    an ImageNet ``resnet50`` state_dict (backbone-only overlay — what
    deeplab/deeplabv3.py:8 starts from via the builder's weights_backbone
    default); 'vit' a swin-tiny checkpoint (timm files wrap it as
    ``{'model': ...}``, the reference unwraps at vision_transformer.py:58);
    'unet' the reference unet/ state_dict; 'deeplabv2' the deeplabv2/ one.
    -> (params_overlay, stats_overlay)."""
    sd = _strip_module(sd)
    if seg_model == "deeplab":
        if "classifier.0.convs.0.0.weight" in sd:
            return port_deeplabv3(sd, n_classes=n_classes)
        if "conv1.weight" in sd:
            p, s = port_resnet50_backbone(sd)
            return {"backbone": p}, {"backbone": s}
        raise KeyError("unrecognized deeplab checkpoint naming "
                       "(need torchvision deeplabv3_resnet50 or resnet50 keys)")
    if seg_model == "vit":
        if "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        return port_swin_tiny(sd), {}
    if seg_model == "unet":
        return port_unet_milesial(sd)
    if seg_model == "deeplabv2":
        return port_deeplabv2(sd)
    raise NotImplementedError(f"seg_pretrained for seg_model={seg_model!r}")
