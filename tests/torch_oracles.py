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
