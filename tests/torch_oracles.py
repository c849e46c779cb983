"""Hand-built raw-torch reference oracles for PROGRAM-level parity tests.

These re-state the reference architectures/training programs (cited below)
in plain torch so trajectories can be compared step-by-step against our
jitted implementations with identical weights and batches. betty/torchvision
are not installed; everything here is written from the architecture spec —
it is test oracle code, not a vendored copy.

- TorchMixedUp      models_pix2pix/networks.py:486-511 (Cell_upconv: softmax-
                    weighted sum of ConvTranspose2d k4s2p1 / k6s2p2 / k8s2p3)
- TorchUnetGenerator networks.py:514-617 (recursive skip U-Net, every up is
                    a mixed cell; BN on interior downs/ups; tanh head)
- TorchNLayerD      networks.py:620-665 (70x70 PatchGAN)
- torch_optimize_parameters  pix2pix_model.py:102-143 (D step w/ detached
                    fake, then G step against the updated D)
- TorchMilesialUNet unet/unet_model.py + unet/unet_parts.py naming-exact
                    (so utils.torch_port.port_unet_milesial round-trips)
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# weight transport: our flax trees -> torch modules
# ---------------------------------------------------------------------------

def conv_to_torch(k: np.ndarray) -> torch.Tensor:
    """flax HWIO -> torch OIHW."""
    return torch.tensor(np.transpose(np.asarray(k), (3, 2, 0, 1)).copy())


def convtranspose_to_torch(k: np.ndarray) -> torch.Tensor:
    """our forward-equivalent (k,k,I,O) kernel -> torch ConvTranspose2d
    (I,O,k,k) (inverse of utils.torch_port.convert_conv_transpose)."""
    w = np.transpose(np.asarray(k), (2, 3, 0, 1))
    return torch.tensor(w[:, :, ::-1, ::-1].copy())


def load_bn(bn: nn.BatchNorm2d, params: dict, stats: dict):
    bn.weight.data = torch.tensor(np.asarray(params["scale"]))
    bn.bias.data = torch.tensor(np.asarray(params["bias"]))
    bn.running_mean.data = torch.tensor(np.asarray(stats["mean"]))
    bn.running_var.data = torch.tensor(np.asarray(stats["var"]))


# ---------------------------------------------------------------------------
# Pix2Pix generator / discriminator
# ---------------------------------------------------------------------------

class TorchMixedUp(nn.Module):
    """Explicit 3-branch Cell_upconv: sum_i w_i * CT_i(x)."""

    def __init__(self, c_in, c_out, bias=True):
        super().__init__()
        self.ops = nn.ModuleList([
            nn.ConvTranspose2d(c_in, c_out, k, stride=2, padding=p, bias=bias)
            for k, p in ((4, 1), (6, 2), (8, 3))])

    def forward(self, x, w):
        return sum(wi * op(x) for wi, op in zip(w, self.ops))


class TorchUnetGenerator(nn.Module):
    """Iterative restatement of our flax UnetGenerator (which itself mirrors
    networks.py:514-617): per depth d, down = Conv(4,2,1); BN on interior
    downs; recursive body; ReLU -> mixed up (arch row nd-1-d) -> tanh at d=0
    else BN (+dropout on ngf*8 interiors) and skip concat."""

    def __init__(self, input_nc=1, output_nc=1, num_downs=5, ngf=8,
                 use_dropout=False):
        super().__init__()
        self.nd, self.ngf, self.output_nc = num_downs, ngf, output_nc
        nd = num_downs
        inner = [min(ngf * 2 ** d, ngf * 8) for d in range(nd)]
        self.downs = nn.ModuleList()
        self.down_bns = nn.ModuleDict()
        self.ups = nn.ModuleList()
        self.up_bns = nn.ModuleDict()
        for d in range(nd):
            cin = input_nc if d == 0 else inner[d - 1]
            self.downs.append(nn.Conv2d(cin, inner[d], 4, 2, 1, bias=False))
            if 0 < d < nd - 1:
                self.down_bns[str(d)] = nn.BatchNorm2d(inner[d],
                                                       momentum=0.1, eps=1e-5)
            up_in = inner[d] + (ngf * min(2 ** d, 8) if d < nd - 1 else 0)
            out_ch = output_nc if d == 0 else ngf * min(2 ** (d - 1), 8)
            self.ups.append(TorchMixedUp(up_in, out_ch,
                                         bias=True if d == 0 else False))
            if d > 0:
                self.up_bns[str(d)] = nn.BatchNorm2d(out_ch, momentum=0.1,
                                                     eps=1e-5)
        assert not use_dropout or num_downs <= 5, \
            "oracle omits dropout (parity tests run nd<=5 where it is inert)"

    def forward(self, x, arch):
        nd = self.nd

        def block(h, d):
            skip = h
            if d > 0:
                h = F.leaky_relu(h, 0.2)
            h = self.downs[d](h)
            if 0 < d < nd - 1:
                h = self.down_bns[str(d)](h)
            if d < nd - 1:
                h = block(h, d + 1)
            h = F.relu(h)
            w = torch.softmax(arch[nd - 1 - d], dim=-1)
            h = self.ups[d](h, w)
            if d == 0:
                return torch.tanh(h)
            h = self.up_bns[str(d)](h)
            return torch.cat([skip, h], dim=1)

        return block(x, 0)

    def load_flax(self, params, stats):
        for d in range(self.nd):
            self.downs[d].weight.data = conv_to_torch(params[f"down{d}"]["kernel"])
            if 0 < d < self.nd - 1:
                load_bn(self.down_bns[str(d)], params[f"down_bn{d}"],
                        stats[f"down_bn{d}"])
            up = params[f"up{d}"]
            for i, k in enumerate((4, 6, 8)):
                self.ups[d].ops[i].weight.data = convtranspose_to_torch(
                    up[f"kernel_{k}"])
                if self.ups[d].ops[i].bias is not None:
                    self.ups[d].ops[i].bias.data = torch.tensor(
                        np.asarray(up[f"bias_{k}"]))
            if d > 0:
                load_bn(self.up_bns[str(d)], params[f"up_bn{d}"],
                        stats[f"up_bn{d}"])


class TorchNLayerD(nn.Module):
    """networks.py:620-665 restated to mirror our flax NLayerDiscriminator."""

    def __init__(self, input_nc=2, ndf=8, n_layers=3):
        super().__init__()
        self.n_layers = n_layers
        self.convs = nn.ModuleList(
            [nn.Conv2d(input_nc, ndf, 4, 2, 1, bias=True)])
        self.bns = nn.ModuleDict()
        nf = ndf
        for n in range(1, n_layers):
            nf_out = ndf * min(2 ** n, 8)
            self.convs.append(nn.Conv2d(nf, nf_out, 4, 2, 1, bias=False))
            self.bns[str(n)] = nn.BatchNorm2d(nf_out, momentum=0.1, eps=1e-5)
            nf = nf_out
        nf_out = ndf * min(2 ** n_layers, 8)
        self.convs.append(nn.Conv2d(nf, nf_out, 4, 1, 1, bias=False))
        self.bns[str(n_layers)] = nn.BatchNorm2d(nf_out, momentum=0.1,
                                                 eps=1e-5)
        self.head = nn.Conv2d(nf_out, 1, 4, 1, 1, bias=True)

    def forward(self, x):
        h = F.leaky_relu(self.convs[0](x), 0.2)
        for n in range(1, self.n_layers + 1):
            h = F.leaky_relu(self.bns[str(n)](self.convs[n](h)), 0.2)
        return self.head(h)

    def load_flax(self, params, stats):
        def load_conv(mod, p):
            mod.weight.data = conv_to_torch(p["kernel"])
            if "bias" in p:
                mod.bias.data = torch.tensor(np.asarray(p["bias"]))
        load_conv(self.convs[0], params["conv0"])
        for n in range(1, self.n_layers + 1):
            load_conv(self.convs[n], params[f"conv{n}"])
            load_bn(self.bns[str(n)], params[f"bn{n}"], stats[f"bn{n}"])
        load_conv(self.head, params["head"])


def torch_optimize_parameters(g_forward, D, opt_g, opt_d, mask, image,
                              lambda_l1=100.0):
    """pix2pix_model.py:102-143: forward; D step (fake detached);
    G step against the updated D. ``g_forward(mask)`` closes over the
    generator and its arch weights. Returns (loss_D, loss_G)."""
    bce = nn.BCEWithLogitsLoss()
    fake = g_forward(mask)
    # D step
    opt_d.zero_grad()
    pred_fake = D(torch.cat([mask, fake.detach()], dim=1))
    pred_real = D(torch.cat([mask, image], dim=1))
    loss_d = 0.5 * (bce(pred_fake, torch.zeros_like(pred_fake)) +
                    bce(pred_real, torch.ones_like(pred_real)))
    loss_d.backward()
    opt_d.step()
    # G step (D frozen by not stepping opt_d; grads to D params are
    # discarded by zero_grad on the next iteration, like set_requires_grad)
    opt_g.zero_grad()
    pred_fake2 = D(torch.cat([mask, fake], dim=1))
    loss_g = bce(pred_fake2, torch.ones_like(pred_fake2)) + \
        lambda_l1 * F.l1_loss(fake, image)
    loss_g.backward()
    opt_g.step()
    return float(loss_d.detach()), float(loss_g.detach())


# ---------------------------------------------------------------------------
# Segmentation U-Net with the reference's exact module names
# ---------------------------------------------------------------------------

class _TDoubleConv(nn.Module):
    def __init__(self, c_in, c_out, mid=None):
        super().__init__()
        mid = mid or c_out
        self.double_conv = nn.Sequential(
            nn.Conv2d(c_in, mid, 3, padding=1, bias=False),
            nn.BatchNorm2d(mid), nn.ReLU(inplace=True),
            nn.Conv2d(mid, c_out, 3, padding=1, bias=False),
            nn.BatchNorm2d(c_out), nn.ReLU(inplace=True))

    def forward(self, x):
        return self.double_conv(x)


class _TDown(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.maxpool_conv = nn.Sequential(nn.MaxPool2d(2),
                                          _TDoubleConv(c_in, c_out))

    def forward(self, x):
        return self.maxpool_conv(x)


class _TUp(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.up = nn.ConvTranspose2d(c_in, c_in // 2, kernel_size=2, stride=2)
        self.conv = _TDoubleConv(c_in, c_out)

    def forward(self, x, skip):
        x = self.up(x)
        dy = skip.size(2) - x.size(2)
        dx = skip.size(3) - x.size(3)
        x = F.pad(x, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv(torch.cat([skip, x], dim=1))


class _TOutConv(nn.Module):
    def __init__(self, c_in, n_classes):
        super().__init__()
        self.conv = nn.Conv2d(c_in, n_classes, kernel_size=1)

    def forward(self, x):
        return self.conv(x)


class TorchMilesialUNet(nn.Module):
    """unet/unet_model.py:7-37 with base width f (transpose-conv ups)."""

    def __init__(self, n_channels=1, n_classes=1, f=8):
        super().__init__()
        self.inc = _TDoubleConv(n_channels, f)
        self.down1 = _TDown(f, f * 2)
        self.down2 = _TDown(f * 2, f * 4)
        self.down3 = _TDown(f * 4, f * 8)
        self.down4 = _TDown(f * 8, f * 16)
        self.up1 = _TUp(f * 16, f * 8)
        self.up2 = _TUp(f * 8, f * 4)
        self.up3 = _TUp(f * 4, f * 2)
        self.up4 = _TUp(f * 2, f)
        self.outc = _TOutConv(f, n_classes)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        y = self.up1(x5, x4)
        y = self.up2(y, x3)
        y = self.up3(y, x2)
        y = self.up4(y, x1)
        return self.outc(y)


def torch_dice_loss(pred_sigmoid, target, eps=1e-6):
    """util/dice_score.py:5-28 (reduce_batch_first=True): flatten batch."""
    p = pred_sigmoid.reshape(-1)
    t = target.reshape(-1)
    inter = 2.0 * (p * t).sum()
    sets = p.sum() + t.sum()
    sets = torch.where(sets == 0, inter, sets)
    return 1.0 - (inter + eps) / (sets + eps)


# ---------------------------------------------------------------------------
# FID / LPIPS extractor oracles
# ---------------------------------------------------------------------------

class TorchAlexLPIPS(nn.Module):
    """lpips 'alex' restated: torchvision AlexNet.features layout + the
    LPIPS forward (scaling layer, relu1-5 taps, channel-unit-normalize,
    per-channel lin weights, spatial mean, layer sum)."""

    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2))
        self.taps = (1, 4, 7, 9, 11)

    def _feats(self, x):
        out, h = [], x
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in self.taps:
                out.append(h)
        return out

    def lpips(self, a, b, lins):
        """a, b NCHW in [0,1]; lins: list of 5 per-channel vectors."""
        def prep(x):
            return (2.0 * x - 1.0 - self.SHIFT) / self.SCALE
        fa, fb = self._feats(prep(a)), self._feats(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            w = torch.tensor(np.asarray(lins[i])).view(1, -1, 1, 1)
            total = total + ((na - nb) ** 2 * w).sum(1).mean(dim=(1, 2))
        return total


class TorchBasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = nn.BatchNorm2d(c_out, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchInceptionA(nn.Module):
    """pytorch-fid FIDInceptionA: avg pool excludes padding."""

    def __init__(self, c_in, pool_features):
        super().__init__()
        self.branch1x1 = TorchBasicConv2d(c_in, 64, kernel_size=1)
        self.branch5x5_1 = TorchBasicConv2d(c_in, 48, kernel_size=1)
        self.branch5x5_2 = TorchBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TorchBasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = TorchBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TorchBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TorchBasicConv2d(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


# ---------------------------------------------------------------------------
# VQGAN oracle (taming checkpoint naming) + vqperceptual loss restatement
# ---------------------------------------------------------------------------

def _gn_groups(c):
    if c % 32 == 0:
        return 32
    return max(g for g in range(1, min(32, c) + 1) if c % g == 0)


def _tgn(c):
    return nn.GroupNorm(_gn_groups(c), c, eps=1e-6)


class _TVQResBlock(nn.Module):
    def __init__(self, c_in, c_out):
        super().__init__()
        self.norm1 = _tgn(c_in)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, 1, 1)
        self.norm2 = _tgn(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1)
        if c_in != c_out:
            self.nin_shortcut = nn.Conv2d(c_in, c_out, 1)
        self.c_in, self.c_out = c_in, c_out

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.c_in != self.c_out:
            x = self.nin_shortcut(x)
        return x + h


class _TVQAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = _tgn(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.norm(x)
        q = self.q(y).reshape(b, c, h * w)
        k = self.k(y).reshape(b, c, h * w)
        v = self.v(y).reshape(b, c, h * w)
        attn = torch.softmax(torch.einsum("bci,bcj->bij", q, k) * c ** -0.5,
                             dim=2)
        out = torch.einsum("bcj,bij->bci", v, attn).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _Holder(nn.Module):
    pass


class TorchTamingVQGAN(nn.Module):
    """Tiny taming VQModel with checkpoint-exact module names
    (BBDM/model/VQGAN/model.py Encoder/Decoder + quantize.py
    VectorQuantizer2 legacy loss)."""

    def __init__(self, ch=8, ch_mult=(1, 2), nrb=1, z=3, n_embed=16,
                 out_ch=1):
        super().__init__()
        self.nrb, self.ch_mult = nrb, ch_mult
        enc = _Holder()
        enc.conv_in = nn.Conv2d(out_ch, ch, 3, 1, 1)
        enc.down = nn.ModuleList()
        c = ch
        for li, m in enumerate(ch_mult):
            lvl = _Holder()
            lvl.block = nn.ModuleList()
            for _ in range(nrb):
                lvl.block.append(_TVQResBlock(c, ch * m))
                c = ch * m
            if li < len(ch_mult) - 1:
                ds = _Holder()
                ds.conv = nn.Conv2d(c, c, 3, 2, 0)
                lvl.downsample = ds
            enc.down.append(lvl)
        mid = _Holder()
        mid.block_1 = _TVQResBlock(c, c)
        mid.attn_1 = _TVQAttn(c)
        mid.block_2 = _TVQResBlock(c, c)
        enc.mid = mid
        enc.norm_out = _tgn(c)
        enc.conv_out = nn.Conv2d(c, z, 3, 1, 1)
        self.encoder = enc

        self.quant_conv = nn.Conv2d(z, z, 1)
        self.quantize = _Holder()
        self.quantize.embedding = nn.Embedding(n_embed, z)
        self.quantize.embedding.weight.data.uniform_(-2.0 / n_embed,
                                                     2.0 / n_embed)
        self.post_quant_conv = nn.Conv2d(z, z, 1)

        dec = _Holder()
        cd = ch * ch_mult[-1]
        dec.conv_in = nn.Conv2d(z, cd, 3, 1, 1)
        midd = _Holder()
        midd.block_1 = _TVQResBlock(cd, cd)
        midd.attn_1 = _TVQAttn(cd)
        midd.block_2 = _TVQResBlock(cd, cd)
        dec.mid = midd
        levels = [None] * len(ch_mult)
        cc = cd
        for li in reversed(range(len(ch_mult))):  # taming insert(0, ...) order
            lvl = _Holder()
            lvl.block = nn.ModuleList()
            for _ in range(nrb + 1):
                lvl.block.append(_TVQResBlock(cc, ch * ch_mult[li]))
                cc = ch * ch_mult[li]
            if li > 0:
                us = _Holder()
                us.conv = nn.Conv2d(cc, cc, 3, 1, 1)
                lvl.upsample = us
            levels[li] = lvl
        dec.up = nn.ModuleList(levels)
        dec.norm_out = _tgn(cc)
        dec.conv_out = nn.Conv2d(cc, out_ch, 3, 1, 1)
        self.decoder = dec

    def encode(self, x):
        h = self.encoder.conv_in(x)
        for li, lvl in enumerate(self.encoder.down):
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "downsample"):
                h = F.pad(h, (0, 1, 0, 1))
                h = lvl.downsample.conv(h)
        h = self.encoder.mid.block_2(self.encoder.mid.attn_1(
            self.encoder.mid.block_1(h)))
        h = F.silu(self.encoder.norm_out(h))
        return self.quant_conv(self.encoder.conv_out(h))

    def quantize_z(self, z, beta=0.25):
        emb = self.quantize.embedding.weight
        flat = z.permute(0, 2, 3, 1).reshape(-1, z.shape[1])
        d = (flat.pow(2).sum(1, keepdim=True) - 2 * flat @ emb.t()
             + emb.pow(2).sum(1)[None])
        idx = d.argmin(1)
        z_q = emb[idx].reshape(z.shape[0], z.shape[2], z.shape[3],
                               z.shape[1]).permute(0, 3, 1, 2)
        loss = torch.mean((z_q.detach() - z) ** 2) + \
            beta * torch.mean((z_q - z.detach()) ** 2)
        z_q = z + (z_q - z).detach()
        return z_q, loss

    def decode(self, z_q):
        h = self.decoder.conv_in(self.post_quant_conv(z_q))
        h = self.decoder.mid.block_2(self.decoder.mid.attn_1(
            self.decoder.mid.block_1(h)))
        for li in reversed(range(len(self.ch_mult))):
            lvl = self.decoder.up[li]
            for blk in lvl.block:
                h = blk(h)
            if li > 0:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = lvl.upsample.conv(h)
        h = F.silu(self.decoder.norm_out(h))
        return self.decoder.conv_out(h)

    def forward(self, x):
        z = self.encode(x)
        z_q, qloss = self.quantize_z(z)
        return self.decode(z_q), qloss


def torch_vq_ae_loss(model, disc, x, step, disc_start, codebook_weight=1.0,
                     disc_weight=1.0, disc_factor=1.0):
    """vqperceptual.py optimizer_idx==0 restated (perceptual_weight=0):
    nll + adaptive d_weight * adopt_weight * g_loss + cb * qloss.
    Returns (loss, d_weight, nll, g_loss, qloss)."""
    recon, qloss = model(x)
    nll = torch.abs(x - recon).mean()
    logits_fake = disc(recon)
    g_loss = -logits_fake.mean()
    last = model.decoder.conv_out.weight
    nll_g = torch.autograd.grad(nll, last, retain_graph=True)[0]
    g_g = torch.autograd.grad(g_loss, last, retain_graph=True)[0]
    d_weight = (nll_g.norm() / (g_g.norm() + 1e-4)).clamp(0, 1e4).detach() \
        * disc_weight
    factor = disc_factor if step >= disc_start else 0.0
    loss = nll + d_weight * factor * g_loss + codebook_weight * qloss
    return (float(loss.detach()), float(d_weight), float(nll.detach()),
            float(g_loss.detach()), float(qloss.detach()))


class _TV2Bottleneck(nn.Module):
    """deeplabv2/backbone/resnet.py:13-50 bottleneck (stride+dilation on the
    3x3; BatchNorm2d per the reference's sync_bn=False branch)."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               dilation=dilation, padding=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + r)


class _TV2ResNet(nn.Module):
    """deeplabv2/backbone/resnet.py:53-131 (stem hardcodes the raw input
    channel count; layer4 is the (1,2,4) multi-grid unit)."""

    def __init__(self, n_channels, layers, output_stride):
        super().__init__()
        strides, dils = ((1, 2, 2, 1), (1, 1, 1, 2)) if output_stride == 16 \
            else ((1, 2, 1, 1), (1, 1, 2, 4))
        self.conv1 = nn.Conv2d(n_channels, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64

        def stage(planes, blocks, stride, dilation, mg=None):
            nonlocal inplanes
            mods, dn = [], None
            if stride != 1 or inplanes != planes * 4:
                dn = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            grids = mg or (1,) * blocks
            mods.append(_TV2Bottleneck(inplanes, planes, stride,
                                       grids[0] * dilation, dn))
            inplanes = planes * 4
            for g in grids[1:]:
                mods.append(_TV2Bottleneck(inplanes, planes, 1, g * dilation))
            return nn.Sequential(*mods)

        self.layer1 = stage(64, layers[0], strides[0], dils[0])
        self.layer2 = stage(128, layers[1], strides[1], dils[1])
        self.layer3 = stage(256, layers[2], strides[2], dils[2])
        self.layer4 = stage(512, 3, strides[3], dils[3], mg=(1, 2, 4))

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for l in (self.layer1, self.layer2, self.layer3, self.layer4):
            h = l(h)
        return h


class _TV2Classifier(nn.Module):
    """deeplabv2/deeplab_v2.py:73-89 — sum of dilated 3x3 convs."""

    def __init__(self, n_classes, rates=(6, 12, 18, 24)):
        super().__init__()
        self.conv2d_list = nn.ModuleList(
            nn.Conv2d(2048, n_classes, 3, padding=r, dilation=r, bias=True)
            for r in rates)
        for m in self.conv2d_list:
            m.weight.data.normal_(0, 0.01)

    def forward(self, x):
        out = self.conv2d_list[0](x)
        for m in self.conv2d_list[1:]:
            out = out + m(x)
        return out


class TorchDeepLabV2(nn.Module):
    """deeplabv2/deeplab_v2.py:13-34, naming-exact so
    utils.torch_port.port_deeplabv2 round-trips its state_dict."""

    def __init__(self, n_channels=1, n_classes=1, layers=(3, 4, 23),
                 output_stride=16):
        super().__init__()
        self.backbone = _TV2ResNet(n_channels, layers, output_stride)
        self.classifier = _TV2Classifier(n_classes)

    def forward(self, x):
        h = self.classifier(self.backbone(x))
        return nn.functional.interpolate(h, size=x.shape[2:], mode="bilinear",
                                         align_corners=True)


class _TV3ResNet(nn.Module):
    """torchvision resnet.ResNet(Bottleneck, layers,
    replace_stride_with_dilation=[False, True, True]) restated naming-exact
    (the backbone of ``deeplabv3_resnet50``, deeplab/deeplabv3.py:8).
    torchvision's ``_make_layer`` hands the FIRST block of a dilated stage
    the *previous* dilation (layer3.0 dil 1, layer4.0 dil 2) and strides the
    3x3; the bottleneck body is identical to _TV2Bottleneck."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2, dilate=True)
        self.layer4 = self._make_layer(512, layers[3], stride=2, dilate=True)

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))
        mods = [_TV2Bottleneck(self.inplanes, planes, stride,
                               previous_dilation, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(_TV2Bottleneck(self.inplanes, planes, 1,
                                       self.dilation))
        return nn.Sequential(*mods)

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(h))))


class _TV3ASPPPooling(nn.Sequential):
    """torchvision deeplabv3.ASPPPooling: global pool -> 1x1 -> BN -> ReLU,
    bilinearly broadcast back (align_corners=False)."""

    def __init__(self, in_ch, out_ch):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(in_ch, out_ch, 1, bias=False),
                         nn.BatchNorm2d(out_ch), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        for mod in self:
            x = mod(x)
        return F.interpolate(x, size=size, mode="bilinear",
                             align_corners=False)


class _TV3ASPP(nn.Module):
    """torchvision deeplabv3.ASPP: convs.0 = 1x1+BN+ReLU, convs.1-3 = dilated
    3x3 at rates (12, 24, 36), convs.4 = pooling branch; project = 1x1+BN+
    ReLU+Dropout(0.5) over the concat."""

    def __init__(self, in_ch, rates=(12, 24, 36), out_ch=256):
        super().__init__()
        mods = [nn.Sequential(nn.Conv2d(in_ch, out_ch, 1, bias=False),
                              nn.BatchNorm2d(out_ch), nn.ReLU())]
        for r in rates:
            mods.append(nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r,
                          bias=False),
                nn.BatchNorm2d(out_ch), nn.ReLU()))
        mods.append(_TV3ASPPPooling(in_ch, out_ch))
        self.convs = nn.ModuleList(mods)
        self.project = nn.Sequential(
            nn.Conv2d(len(mods) * out_ch, out_ch, 1, bias=False),
            nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5))

    def forward(self, x):
        return self.project(torch.cat([c(x) for c in self.convs], dim=1))


class TorchDeepLabV3(nn.Module):
    """torchvision 0.14 ``deeplabv3_resnet50`` restated naming-exact
    (backbone.* via IntermediateLayerGetter keeps resnet names; classifier =
    DeepLabHead Sequential(ASPP, 3x3 conv, BN, ReLU, 1x1)), wrapped with the
    reference's grayscale->3ch expand (deeplab/deeplabv3.py:11-15). No
    aux_classifier: weights=None leaves aux_loss False."""

    def __init__(self, n_classes=1, layers=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = _TV3ResNet(layers)
        self.classifier = nn.Sequential(
            _TV3ASPP(2048), nn.Conv2d(256, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(), nn.Conv2d(256, n_classes, 1))

    def forward(self, x):
        if x.shape[1] == 1:
            x = x.expand(-1, 3, -1, -1)
        h = self.classifier(self.backbone(x))
        return F.interpolate(h, size=x.shape[-2:], mode="bilinear",
                             align_corners=False)


class TorchBridgeOracle:
    """BrownianBridgeModel.py:42-221 restated: the m_t/variance schedule and
    linear skip-sampling table (register_schedule :42-79), q_sample (:128-146),
    p_losses with explicit t/noise (:98-126), predict_x0 (:148-161), and the
    ancestral p_sample loop (:171-221). ``denoise(x_t, t, context)`` is a
    caller-supplied torch callable."""

    def __init__(self, denoise, T=100, sample_step=10, objective="grad",
                 loss_type="l1", max_var=1.0, eta=0.0):
        self.denoise = denoise
        self.objective, self.loss_type, self.eta = objective, loss_type, eta
        m_t = np.linspace(0.001, 0.999, T)
        var = 2.0 * (m_t - m_t ** 2) * max_var
        midsteps = np.arange(T - 1, 1,
                             -((T - 1) / (sample_step - 2))).astype(np.int64)
        self.steps = np.concatenate([midsteps, [1, 0]])
        self.m_t = torch.tensor(m_t, dtype=torch.float32)
        self.var_t = torch.tensor(var, dtype=torch.float32)

    def _ext(self, table, t):
        return table[t].reshape(-1, 1, 1, 1)

    def q_sample(self, x0, y, t, noise):
        m_t, var_t = self._ext(self.m_t, t), self._ext(self.var_t, t)
        sigma_t = torch.sqrt(var_t)
        if self.objective == "grad":
            objective = m_t * (y - x0) + sigma_t * noise
        elif self.objective == "ysubx":
            objective = y - x0
        else:
            objective = noise
        return (1.0 - m_t) * x0 + m_t * y + sigma_t * noise, objective

    def predict_x0(self, x_t, y, t, objective_recon):
        if self.objective == "grad":
            return x_t - objective_recon
        if self.objective == "ysubx":
            return y - objective_recon
        m_t, var_t = self._ext(self.m_t, t), self._ext(self.var_t, t)
        return (x_t - m_t * y - torch.sqrt(var_t) * objective_recon) / (1.0 - m_t)

    def p_losses(self, x0, y, t, noise):
        x_t, objective = self.q_sample(x0, y, t, noise)
        objective_recon = self.denoise(x_t, t, y)
        if self.loss_type == "l1":
            recloss = (objective - objective_recon).abs().mean()
        else:
            recloss = torch.mean((objective - objective_recon) ** 2)
        x0_recon = self.predict_x0(x_t, y, t, objective_recon)
        return recloss, x0_recon

    @torch.no_grad()
    def p_sample_loop(self, y, clip_denoised=True):
        img = y
        for i in range(len(self.steps)):
            b = y.shape[0]
            t = torch.full((b,), int(self.steps[i]), dtype=torch.long)
            objective_recon = self.denoise(img, t, y)
            x0_recon = self.predict_x0(img, y, t, objective_recon)
            if clip_denoised:
                x0_recon = x0_recon.clamp(-1.0, 1.0)
            if int(self.steps[i]) == 0:
                img = x0_recon
                continue
            n_t = torch.full((b,), int(self.steps[i + 1]), dtype=torch.long)
            m_t, m_nt = self._ext(self.m_t, t), self._ext(self.m_t, n_t)
            var_t, var_nt = self._ext(self.var_t, t), self._ext(self.var_t, n_t)
            sigma2_t = (var_t - var_nt * (1.0 - m_t) ** 2 /
                        (1.0 - m_nt) ** 2) * var_nt / var_t
            sigma_t = torch.sqrt(sigma2_t) * self.eta
            noise = torch.randn_like(img)
            mean = (1.0 - m_nt) * x0_recon + m_nt * y + \
                torch.sqrt((var_nt - sigma2_t) / var_t) * \
                (img - (1.0 - m_t) * x0_recon - m_t * y)
            img = mean + sigma_t * noise
        return img


# ---------------------------------------------------------------------------
# Soft-intro VAE family (Soft-intro_VAE/models.py, UNet.py, train_vae.py)
# ---------------------------------------------------------------------------

class TorchMixedS1(nn.Module):
    """Explicit 3-branch stride-1 Cell_conv (kernels 3/5/7): sum_i w_i *
    conv_i(x) — the unfused restatement of ops/nas.MixedConv
    (equivalence of fused vs 3-branch is tested in test_nas.py)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.ops = nn.ModuleList([
            nn.Conv2d(c_in, c_out, k, 1, (k - 1) // 2, bias=False)
            for k in (3, 5, 7)])

    def forward(self, x, w):
        return sum(wi * op(x) for wi, op in zip(w, self.ops))

    def load_flax(self, params):
        for op, k in zip(self.ops, (3, 5, 7)):
            op.weight.data = conv_to_torch(params[f"kernel_{k}"])


class TorchSIVAEBasicBlock(nn.Module):
    """models/vae/sivae._BasicBlock: conv1 (mixed if stride 1, plain strided
    otherwise), bn, relu, conv2 (mixed), bn, 1x1 downsample shortcut."""

    def __init__(self, c_in, planes, stride, cell_base):
        super().__init__()
        self.stride, self.cell_base = stride, cell_base
        if stride == 1:
            self.conv1 = TorchMixedS1(c_in, planes)
        else:
            self.conv1 = nn.Conv2d(c_in, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes, momentum=0.1, eps=1e-5)
        self.conv2 = TorchMixedS1(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes, momentum=0.1, eps=1e-5)
        self.down = None
        if stride != 1 or c_in != planes:
            self.down = nn.Conv2d(c_in, planes, 1, stride, bias=False)
            self.down_bn = nn.BatchNorm2d(planes, momentum=0.1, eps=1e-5)

    def forward(self, x, arch_sm):
        ci = self.cell_base
        if self.stride == 1:
            h = self.conv1(x, arch_sm[ci])
            cell2 = ci + 1
        else:
            h = self.conv1(x)
            cell2 = ci
        h = F.relu(self.bn1(h))
        h = self.bn2(self.conv2(h, arch_sm[cell2]))
        idn = x if self.down is None else self.down_bn(self.down(x))
        return F.relu(h + idn)

    def load_flax(self, p, s):
        if self.stride == 1:
            self.conv1.load_flax(p["conv1"])
        else:
            self.conv1.weight.data = conv_to_torch(p["conv1"]["kernel"])
        load_bn(self.bn1, p["bn1"], s["bn1"])
        self.conv2.load_flax(p["conv2"])
        load_bn(self.bn2, p["bn2"], s["bn2"])
        if self.down is not None:
            self.down.weight.data = conv_to_torch(p["down_conv"]["kernel"])
            load_bn(self.down_bn, p["down_bn"], s["down_bn"])


class TorchSIVAEEncoder(nn.Module):
    """models/vae/sivae.ResNet18Encoder (reference models.py:80-126): stem
    conv7 s2, maxpool3 s2 p1, 6 basic blocks with 10 mixed cells, avg-pool,
    fc mu / fc logvar."""

    BLOCKS = (("l1b0", 64, 64, 1, 0), ("l1b1", 64, 64, 1, 2),
              ("l2b0", 64, 128, 2, 4), ("l2b1", 128, 128, 1, 5),
              ("l3b0", 128, 256, 2, 7), ("l3b1", 256, 256, 1, 8))

    def __init__(self, latent_dim=8):
        super().__init__()
        self.stem = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.stem_bn = nn.BatchNorm2d(64, momentum=0.1, eps=1e-5)
        self.blocks = nn.ModuleDict({
            name: TorchSIVAEBasicBlock(cin, planes, stride, cell)
            for name, cin, planes, stride, cell in self.BLOCKS})
        self.fc_mu = nn.Linear(256, latent_dim)
        self.fc_logvar = nn.Linear(256, latent_dim)

    def forward(self, x, arch):
        arch_sm = torch.softmax(arch, dim=-1)
        h = F.relu(self.stem_bn(self.stem(x)))
        h = F.max_pool2d(h, 3, 2, 1)
        for name, *_ in self.BLOCKS:
            h = self.blocks[name](h, arch_sm)
        k = min(8, h.shape[-1])
        h = F.avg_pool2d(h, k).flatten(1)
        return self.fc_mu(h), self.fc_logvar(h)

    def load_flax(self, params, stats):
        self.stem.weight.data = conv_to_torch(params["stem"]["kernel"])
        load_bn(self.stem_bn, params["stem_bn"], stats["stem_bn"])
        for name, *_ in self.BLOCKS:
            self.blocks[name].load_flax(params[name], stats.get(name, {}))
        for fc, nm in ((self.fc_mu, "fc_mu"), (self.fc_logvar, "fc_logvar")):
            fc.weight.data = torch.tensor(
                np.asarray(params[nm]["kernel"]).T.copy())
            fc.bias.data = torch.tensor(np.asarray(params[nm]["bias"]))


class TorchGUnetAddInput(nn.Module):
    """models/vae/sivae.GUnetAddInput (reference UNet.py G_Unet_add_input):
    z broadcast-concat at input, 4x4 s2 downs (bias=True), bilinear-up +
    reflect-pad 3x3 convs, tanh head."""

    def __init__(self, input_nc=3, output_nc=3, nz=8, num_downs=5, ngf=8,
                 norm="instance"):
        super().__init__()
        self.nz, self.nd, self.norm = nz, num_downs, norm
        # the SIVAE config builds the decoder with norm='instance'
        # (InstanceNorm2d(affine=False), Utilities.get_norm_layer:195-207)
        mk_norm = (lambda c: nn.InstanceNorm2d(c, affine=False)) \
            if norm == "instance" else \
            (lambda c: nn.BatchNorm2d(c, momentum=0.1, eps=1e-5))
        nd, inner = num_downs, [min(ngf * 2 ** d, ngf * 8)
                                for d in range(num_downs)]
        outer = [output_nc] + [min(ngf * 2 ** (d - 1), ngf * 8)
                               for d in range(1, nd)]
        self.downs = nn.ModuleList()
        self.down_bns = nn.ModuleDict()
        self.ups = nn.ModuleList()
        self.up_bns = nn.ModuleDict()
        for d in range(nd):
            cin = (input_nc + nz) if d == 0 else inner[d - 1]
            self.downs.append(nn.Conv2d(cin, inner[d], 4, 2, 1, bias=True))
            if 0 < d < nd - 1:
                self.down_bns[str(d)] = mk_norm(inner[d])
            up_in = inner[d] + (inner[d] if d < nd - 1 else 0)
            self.ups.append(nn.Conv2d(up_in, outer[d], 3, 1, 0, bias=True))
            if d > 0:
                self.up_bns[str(d)] = mk_norm(outer[d])

    def forward(self, x, z):
        nd = self.nd
        zi = z[:, :, None, None].expand(-1, -1, x.shape[2], x.shape[3])
        h0 = torch.cat([x, zi], dim=1)

        def block(h, d):
            skip = h
            if d > 0:
                h = F.leaky_relu(h, 0.2)
            h = self.downs[d](h)
            if 0 < d < nd - 1:
                h = self.down_bns[str(d)](h)
            if d < nd - 1:
                h = block(h, d + 1)
            h = F.relu(h)
            h = F.interpolate(h, scale_factor=2, mode="bilinear",
                              align_corners=False)
            h = F.pad(h, (1, 1, 1, 1), mode="reflect")
            h = self.ups[d](h)
            if d == 0:
                return torch.tanh(h)
            h = self.up_bns[str(d)](h)
            return torch.cat([skip, h], dim=1)

        return block(h0, 0)

    def load_flax(self, params, stats):
        for d in range(self.nd):
            self.downs[d].weight.data = conv_to_torch(
                params[f"down{d}"]["kernel"])
            self.downs[d].bias.data = torch.tensor(
                np.asarray(params[f"down{d}"]["bias"]))
            if 0 < d < self.nd - 1 and self.norm != "instance":
                load_bn(self.down_bns[str(d)], params[f"down_bn{d}"],
                        stats[f"down_bn{d}"])
            self.ups[d].weight.data = conv_to_torch(params[f"up{d}"]["kernel"])
            self.ups[d].bias.data = torch.tensor(
                np.asarray(params[f"up{d}"]["bias"]))
            if d > 0 and self.norm != "instance":
                load_bn(self.up_bns[str(d)], params[f"up_bn{d}"],
                        stats[f"up_bn{d}"])


def torch_calc_rec(x, rec, reduction):
    """loss.py calc_reconstruction_loss (mse): per-sample sum of squares."""
    err = (rec.flatten(1) - x.flatten(1)).pow(2).sum(dim=1)
    return {"sum": err.sum(), "mean": err.mean(), "none": err}[reduction]


def torch_calc_kl(logvar, mu, reduce):
    kl = -0.5 * (1 + logvar - mu.pow(2) - logvar.exp()).sum(dim=1)
    return {"sum": kl.sum(), "mean": kl.mean(), "none": kl}[reduce]


def torch_soft_intro_step(E, Dec, arch, opt_e, opt_d, a, b, noise,
                          eps_e, eps_f, eps_r, hp, scale):
    """train/train_vae.SIVAETrainer.soft_intro_step (reference
    Soft-intro_VAE/train_vae.py soft-intro phase) restated in torch with the
    SAME injected gaussian draws. Returns (lossE, lossD, loss_rec, loss_kl).
    """

    def rep(mu, logvar, eps):
        return mu + torch.exp(0.5 * logvar) * eps

    # ===== encoder step (decoder frozen) =====
    opt_e.zero_grad()
    for p in Dec.parameters():
        p.requires_grad_(False)
    fake = Dec(a, noise)
    mu, logvar = E(b, arch)
    z = rep(mu, logvar, eps_e)
    rec = Dec(a, z)
    loss_rec = torch_calc_rec(b, rec, "mean")
    real_kl = torch_calc_kl(logvar, mu, "mean")
    fmu, flv = E(fake.detach(), arch)
    rmu, rlv = E(rec.detach(), arch)
    zf = rep(fmu, flv, eps_f)
    zr = rep(rmu, rlv, eps_r)
    rec_fake = Dec(a, zf)
    rec_rec = Dec(a, zr)
    fake_kl = torch_calc_kl(flv, fmu, "none")
    rec_kl = torch_calc_kl(rlv, rmu, "none")
    l_fake_rec = torch_calc_rec(fake, rec_fake, "none")
    l_rec_rec = torch_calc_rec(rec, rec_rec, "none")
    exp_fake = torch.exp(torch.clamp(
        -2 * scale * (hp.beta_rec * l_fake_rec + hp.beta_neg * fake_kl),
        -50, 50)).mean()
    exp_rec = torch.exp(torch.clamp(
        -2 * scale * (hp.beta_rec * l_rec_rec + hp.beta_neg * rec_kl),
        -50, 50)).mean()
    lossE = scale * (hp.beta_rec * loss_rec + hp.beta_kl * real_kl) + \
        0.25 * (exp_fake + exp_rec)
    lossE.backward()
    opt_e.step()
    for p in Dec.parameters():
        p.requires_grad_(True)

    # ===== decoder step (encoder frozen) =====
    opt_d.zero_grad()
    for p in E.parameters():
        p.requires_grad_(False)
    fake = Dec(a, noise)
    mu, logvar = E(b, arch)
    z = rep(mu, logvar, eps_e).detach()
    rec = Dec(a, z)
    loss_rec2 = torch_calc_rec(b, rec, "mean")
    rmu, rlv = E(rec, arch)
    fmu, flv = E(fake, arch)
    zr = rep(rmu, rlv, eps_f).detach()   # ld uses kd1 for zr, kd2 for zf
    zf = rep(fmu, flv, eps_r).detach()
    rec_rec = Dec(a, zr)
    rec_fake = Dec(a, zf)
    l_rr = torch_calc_rec(rec.detach(), rec_rec, "mean")
    l_rf = torch_calc_rec(fake.detach(), rec_fake, "mean")
    fake_kl = torch_calc_kl(flv, fmu, "mean")
    rec_kl = torch_calc_kl(rlv, rmu, "mean")
    lossD = scale * (hp.beta_rec * loss_rec2 +
                     0.5 * hp.beta_kl * (fake_kl + rec_kl) +
                     hp.gamma_r * 0.5 * hp.beta_rec * (l_rr + l_rf))
    lossD.backward()
    opt_d.step()
    for p in E.parameters():
        p.requires_grad_(True)
    return (float(lossE.detach()), float(lossD.detach()),
            float(loss_rec.detach()), float(real_kl.detach()))
