"""Reference pix2pix checkpoint porters: naming-exact torch oracles.

The torch modules below restate the REFERENCE's module tree exactly as the
checkpoints name it — the recursive UnetSkipConnectionBlock Sequentials
(models_pix2pix/networks.py:553-617) with Cell_upconv's `_ops._ops.{i}.op`
candidates (architecture_pix2pix/operations.py:4-40) and the flat PatchGAN
Sequential (networks.py:620-665) — so `state_dict()` keys match what
`Pix2PixModel.save_model` (pix2pix_model.py:168-173) writes, including the
DataParallel `module.` prefix.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from semantic_segmentation_tpu.models.pix2pix.networks import (
    NLayerDiscriminator, UnetGenerator)
from semantic_segmentation_tpu.utils.torch_port import (
    port_pix2pix_discriminator, port_pix2pix_generator)


class _Op(nn.Module):
    def __init__(self, cin, cout, k, p, bias):
        super().__init__()
        self.op = nn.ConvTranspose2d(cin, cout, k, 2, p, bias=bias)

    def forward(self, x):
        return self.op(x)


class _MixedOp(nn.Module):
    def __init__(self, cin, cout, bias):
        super().__init__()
        self._ops = nn.ModuleList([_Op(cin, cout, 4, 1, bias),
                                   _Op(cin, cout, 6, 2, bias),
                                   _Op(cin, cout, 8, 3, bias)])

    def forward(self, x, w):
        return sum(wi * op(x) for wi, op in zip(w, self._ops))


class _Cell(nn.Module):
    def __init__(self, cin, cout, bias, li, arch):
        super().__init__()
        self._ops = _MixedOp(cin, cout, bias)
        self._li, self._arch = li, arch

    def forward(self, x):
        return self._ops(x, torch.softmax(self._arch[self._li], -1))


class _Block(nn.Module):
    def __init__(self, outer_nc, inner_nc, arch, input_nc=None, li=None,
                 submodule=None, outermost=False, innermost=False,
                 use_dropout=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = nn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=False)
        downrelu = nn.LeakyReLU(0.2, True)
        downnorm = nn.BatchNorm2d(inner_nc)
        uprelu = nn.ReLU(True)
        upnorm = nn.BatchNorm2d(outer_nc)
        if outermost:
            upconv = _Cell(inner_nc * 2, outer_nc, True, li, arch)
            model = [downconv, submodule, uprelu, upconv, nn.Tanh()]
        elif innermost:
            upconv = _Cell(inner_nc, outer_nc, False, li, arch)
            model = [downrelu, downconv, uprelu, upconv, upnorm]
        else:
            upconv = _Cell(inner_nc * 2, outer_nc, False, li, arch)
            model = [downrelu, downconv, downnorm, submodule, uprelu, upconv,
                     upnorm]
            if use_dropout:
                model = model + [nn.Dropout(0.5)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


class RefUnetG(nn.Module):
    def __init__(self, input_nc, output_nc, num_downs, ngf, arch):
        super().__init__()
        block = _Block(ngf * 8, ngf * 8, arch, li=0, innermost=True)
        li = 1
        for _ in range(num_downs - 5):
            block = _Block(ngf * 8, ngf * 8, arch, li=li, submodule=block)
            li += 1
        for mult in (4, 2, 1):
            block = _Block(ngf * mult, ngf * mult * 2, arch, li=li,
                           submodule=block)
            li += 1
        self.model = _Block(output_nc, ngf, arch, input_nc=input_nc, li=li,
                            submodule=block, outermost=True)

    def forward(self, x):
        return self.model(x)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.05
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = torch.randn(m.running_mean.shape,
                                              generator=g) * 0.1
            m.running_var.data = 0.5 + torch.rand(m.running_var.shape,
                                                  generator=g)


def test_port_pix2pix_generator_forward_equivalence():
    nd, ngf = 5, 8
    arch = torch.randn(nd, 3, generator=torch.Generator().manual_seed(7))
    tG = RefUnetG(1, 1, nd, ngf, arch)
    _randomize(tG, 11)
    tG.eval()
    # save_model writes the DataParallel-wrapped state_dict
    sd = {"module." + k: v.detach().numpy()
          for k, v in tG.state_dict().items()}
    params, stats = port_pix2pix_generator(sd, num_downs=nd)

    ours = UnetGenerator(output_nc=1, num_downs=nd, ngf=ngf,
                         use_dropout=False, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    y = ours.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                   jnp.asarray(arch.numpy()), train=False)
    with torch.no_grad():
        yt = tG(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(y)[..., 0],
                               yt.numpy()[:, 0], rtol=1e-4, atol=2e-5)


def test_port_pix2pix_discriminator_forward_equivalence():
    ndf, n_layers = 8, 3
    seq = [nn.Conv2d(2, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    nf_prev = 1
    for n in range(1, n_layers):
        nf = min(2 ** n, 8)
        seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1, bias=False),
                nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True)]
        nf_prev = nf
    nf = min(2 ** n_layers, 8)
    seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1, bias=False),
            nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf * nf, 1, 4, 1, 1)]

    class RefD(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*seq)

        def forward(self, x):
            return self.model(x)

    tD = RefD()
    _randomize(tD, 13)
    tD.eval()
    sd = {k: v.detach().numpy() for k, v in tD.state_dict().items()}
    params, stats = port_pix2pix_discriminator(sd, n_layers=n_layers)

    ours = NLayerDiscriminator(ndf=ndf, n_layers=n_layers, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 32, 32, 2)).astype(np.float32)
    y = ours.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                   train=False)
    with torch.no_grad():
        yt = tD(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(y)[..., 0], yt.numpy()[:, 0],
                               rtol=1e-4, atol=2e-5)


def test_reference_pkl_plugs_into_pretrained_pix2pix(tmp_path):
    """A reference user's stage-1 `.pkl` checkpoints load directly through
    train_pix2pix.load_model (the --run.pretrained_pix2pix path), ported on
    the fly."""
    import os

    from semantic_segmentation_tpu.models.pix2pix.model import Pix2Pix
    from semantic_segmentation_tpu.train.train_pix2pix import load_model

    model = Pix2Pix(input_nc=1, output_nc=1, ngf=8, ndf=8, netG="unet_32",
                    use_dropout=False, compute_dtype=jnp.float32)
    state = model.init(jax.random.key(0), image_size=32)
    arch = torch.tensor(np.asarray(jax.device_get(state.arch["upconv"])))

    tG = RefUnetG(1, 1, 5, 8, arch)
    _randomize(tG, 21)
    tG.eval()
    torch.save({"module." + k: v for k, v in tG.state_dict().items()},
               os.path.join(str(tmp_path), "pix2pix_generator.pkl"))
    # minimal naming-exact D state_dict via the same builder used above
    ndf, n_layers = 8, 3
    seq = [nn.Conv2d(2, ndf, 4, 2, 1), nn.LeakyReLU(0.2, True)]
    nf_prev = 1
    for n in range(1, n_layers):
        nf = min(2 ** n, 8)
        seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1, bias=False),
                nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True)]
        nf_prev = nf
    nf = min(2 ** n_layers, 8)
    seq += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1, bias=False),
            nn.BatchNorm2d(ndf * nf), nn.LeakyReLU(0.2, True),
            nn.Conv2d(ndf * nf, 1, 4, 1, 1)]
    tD = nn.Sequential(*seq)
    _randomize(tD, 22)
    torch.save({"module.model." + k: v for k, v in tD.state_dict().items()},
               os.path.join(str(tmp_path), "pix2pix_discriminator.pkl"))

    state = load_model(state, str(tmp_path))
    rng = np.random.default_rng(9)
    mask = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    fake = model.generate(state, jnp.asarray(mask))
    with torch.no_grad():
        ft = tG(torch.tensor(np.transpose(mask, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(fake)[..., 0], ft.numpy()[:, 0],
                               rtol=1e-4, atol=2e-5)


def test_reference_unet_pkl_evaluates_through_test_seg(tmp_path):
    """test_lung.py:67 analog: a reference-trained torch UNet state_dict
    (.pkl) evaluates directly via --run.model_file (ported on the fly)."""
    import os

    from semantic_segmentation_tpu.core.config import parse_config
    from semantic_segmentation_tpu.train.test_seg import run
    from tests.torch_oracles import TorchMilesialUNet

    tunet = TorchMilesialUNet(1, 1, f=8)
    pkl = os.path.join(str(tmp_path), "unet_jsrt.pkl")
    torch.save(tunet.state_dict(), pkl)

    cfg = parse_config([])
    cfg.data.synthetic = True
    cfg.data.image_size = 32
    cfg.data.n_train = 2
    cfg.data.n_val = 2
    cfg.data.n_test = 2
    cfg.data.batch_size = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.base_features = 8
    cfg.run.save_dir = str(tmp_path)
    cfg.run.name = "tseg"
    results = run(cfg, model_file=pkl)
    assert np.isfinite(results["test_dice"])


def test_instance_norm_patchgan_matches_torch():
    """--norm instance (get_norm_layer, networks.py:23-41): InstanceNorm2d
    (affine=False, no running stats) + biased convs. Our _norm must actually
    dispatch to instance normalization, not silently stay BatchNorm."""
    ndf, n_layers = 8, 3
    ours = NLayerDiscriminator(ndf=ndf, n_layers=n_layers, norm="instance",
                               dtype=jnp.float32)
    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 32, 32, 2)).astype(np.float32)
    variables = ours.init(jax.random.key(0), jnp.asarray(x), train=False)
    params = variables["params"]
    assert "bn1" not in params  # instance norm is parameter-free

    from tests.torch_oracles import conv_to_torch
    convs = [nn.Conv2d(2, ndf, 4, 2, 1)]
    nf_prev = 1
    norms = []
    for n in range(1, n_layers + 1):
        nf = min(2 ** n, 8)
        convs.append(nn.Conv2d(ndf * nf_prev, ndf * nf, 4,
                               2 if n < n_layers else 1, 1, bias=True))
        norms.append(nn.InstanceNorm2d(ndf * nf, affine=False))
        nf_prev = nf
    head = nn.Conv2d(ndf * nf_prev, 1, 4, 1, 1)
    for i, c in enumerate(convs):
        p = params[f"conv{i}"]
        c.weight.data = conv_to_torch(np.asarray(p["kernel"]))
        c.bias.data = torch.tensor(np.asarray(p["bias"]))
    head.weight.data = conv_to_torch(np.asarray(params["head"]["kernel"]))
    head.bias.data = torch.tensor(np.asarray(params["head"]["bias"]))

    h = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        h = torch.nn.functional.leaky_relu(convs[0](h), 0.2)
        for c, nrm in zip(convs[1:], norms):
            h = torch.nn.functional.leaky_relu(nrm(c(h)), 0.2)
        yt = head(h)
    y = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y)[..., 0], yt.numpy()[:, 0],
                               rtol=2e-4, atol=2e-5)
