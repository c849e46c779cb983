"""Configuration system: one typed dataclass tree + CLI overrides.

Replaces the reference's four coexisting config systems (SURVEY.md §5): the
two-stage argparse ``options/`` package, the yacs Swin config, BBDM's
YAML->namespace, and the hydra tree — with a single source of truth whose
defaults reproduce the reference's canonical flag sets
(``scripts/train_end2end_jsrt.sh`` etc.).

CLI: ``--section.field=value`` overrides any leaf (parsed with the field's
type); ``--preset=name`` applies a named preset first.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any


@dataclass
class DataConfig:
    """Dataset locations and regime (train_end2end_jsrt.py:78-97)."""
    dataroot: str = "../data/JSRT"
    dataset: str = "jsrt"            # jsrt | isic | isic224 | breast | ...
    ood_roots: tuple = ()            # out-of-domain eval dirs
    mask_suffix: str = ""            # SZ uses '_mask', PH2 '_lesion'
    image_size: int = 256
    n_train: int = 7
    n_val: int = 2
    n_test: int = 72
    batch_size: int = 2
    synthetic: bool = False          # synthetic data (tests/bench)


@dataclass
class ModelConfig:
    """Generator/discriminator/segnet choices (options/base_options.py:28-38,
    train_end2end_jsrt.py:61-64)."""
    seg_model: str = "unet"      # unet | deeplab | deeplabv2 | vit(swin) | unet3d
    netG: str = "unet_256"
    netD: str = "basic"
    ngf: int = 64
    ndf: int = 64
    n_layers_D: int = 3
    norm: str = "batch"
    no_dropout: bool = False
    # init_net's --init_type/--init_gain (models_pix2pix/networks.py:73-122):
    # normal | xavier | kaiming | orthogonal, applied to G/D at construction
    init_type: str = "normal"
    init_gain: float = 0.02
    input_nc: int = 1
    output_nc: int = 1
    classes: int = 1
    bilinear: bool = False
    base_features: int = 64          # U-Net width (64 = reference)
    # Swin-UNet stochastic depth (swin_tiny_patch4_window7_224_lite.yaml:4
    # DROP_PATH_RATE; applied per block at reference :209-210, :662-664)
    drop_path_rate: float = 0.2
    # --use-checkpoint (train_options.py:87): remat transformer blocks
    use_checkpoint: bool = False
    # Rematerialize the heavy sub-model applies (netG generator + seg net)
    # inside the end2end problem losses: activations are recomputed in the
    # backward instead of stored, trading ~one extra forward for the
    # activation HBM — the lever that fits batch 16/32 in 16 GB for the
    # capacity regime (jax.checkpoint; the working version of the
    # reference's broken unet_model.py:39-49 use_checkpointing flag,
    # applied engine-wide).
    remat: bool = False
    compute_dtype: str = "bfloat16"  # AMP analogue; 'float32' to disable
    # phase-packed ConvTranspose lowering (ops/conv.py): s^nd x the MXU
    # output-lane utilization where C_out <= 128 (shape-dispatched; see the
    # measured A/B table in conv_transpose_nd); same math to
    # accumulation-order rounding. Default ON since the real-v5e A/B.
    convt_packed: bool = True
    # per-tap matmul lowering for the k4-s2 down-convs where it measured
    # 1.6-2.2x faster on v5e (ops/conv.down_conv4 shape dispatch; see
    # scripts/bench_conv_down.py). Default set by the end-to-end engine A/B
    # (scripts/ab_lowerings.py).
    tapmm_down: bool = False


@dataclass
class OptimConfig:
    """Learning rates & optimizer settings (scripts/train_end2end_jsrt.sh,
    train_options.py:26-33, pix2pix_model.py:75-82,
    train_end2end_jsrt.py:70-73, :324)."""
    lr: float = 2e-6                 # G/D Adam lr (end2end); pretrain 2e-5
    beta1: float = 0.5
    arch_lr: float = 1e-6
    arch_weight_decay: float = 1e-5  # end2end arch Adam (jsrt:324)
    unet_lr: float = 1e-4            # RMSprop
    unet_weight_decay: float = 1e-8
    unet_momentum: float = 0.9
    gan_mode: str = "vanilla"        # pix2pix default (pix2pix_model.py:36)
    lambda_L1: float = 100.0
    loss_lambda: float = 1.0         # weight of fake-image seg loss
    lr_policy: str = "linear"
    n_epochs: int = 10000            # pretrain scripts pass --n_epochs 10000
    epoch_count: int = 1
    n_epochs_decay: int = 100
    lr_decay_iters: int = 50
    plateau_patience: int = 5        # ReduceLROnPlateau(max, patience=5)
    plateau_factor: float = 0.1
    accumulate: int = 1              # BBDM accumulate_grad_batches


@dataclass
class EngineConfig:
    """Bilevel engine settings (train_end2end_jsrt.py:289-295)."""
    train_iters: int = 5000
    unroll_steps: int = 1
    valid_step: int = 10             # display_freq * unroll_steps
    roll_back: bool = True
    hypergrad: str = "darts"         # darts (reference parity) | unroll (exact) | none
    darts_epsilon: float = 0.01      # finite-difference r / ||v||
    detach_fakes: bool = True        # reference detaches G(fakes) in unet step
    fake_postprocess: str = "uint8_chain"  # uint8_chain (parity) | photometric (ISIC fake_trans) | minmax (differentiable)
    # darts children of the arch problem (Betty u2l edges). NOTE: the
    # reference-parity default is STRUCTURALLY ZERO (see engine/bilevel.py
    # module docstring) — both reference wirings are too.
    arch_children: tuple = ("netG",)


@dataclass
class RunConfig:
    """Checkpointing / logging / parallelism."""
    save_dir: str = "./checkpoints"
    name: str = "end2end-JSRT-9-unet"
    pretrained_pix2pix: str = ""     # stage-1 G/D checkpoint dir ('' = fresh)
    final_checkpoint: bool = True    # serialize full engine state at the end
    resume: bool = False             # restore latest engine checkpoint
                                     # (--continue_train analogue, plus
                                     # preemption-safe resume the reference
                                     # lacks)
    seed: int = 0
    log_every: int = 10
    save_every: int = 0              # 0 = only best-val
    topk_checkpoints: int = 3        # BBDM top-k-by-val-loss retention
    sample_only: bool = False        # BBDM main.py WITHOUT -t: restore the
                                     # latest checkpoint, sample_to_eval +
                                     # diversity/FID/LPIPS scoring, no train
    seg_pretrained: str = ""         # torch checkpoint to start the seg net
                                     # from: torchvision deeplabv3_resnet50 /
                                     # ImageNet resnet50 (backbone overlay) /
                                     # swin-tiny / reference unet state_dict,
                                     # ported on the fly (the reference's
                                     # torch.hub weights_backbone default +
                                     # swin load_from analogue)
    model_file: str = ""             # test_seg: explicit checkpoint file
                                     # (--model_dir analogue, test_lung.py:67);
                                     # .msgpack, or a torch .pkl/.pth ported
                                     # on the fly
    export_path: str = ""            # export_seg: artifact output ('' =
                                     # <save_dir>/<name>/serving.jaxexp)
    export_platforms: str = ""       # comma list lowered into the artifact
                                     # (e.g. 'cpu,tpu'); '' = current backend
    export_batch: int = 0            # 0 = symbolic batch dim (one artifact,
                                     # any batch size); >0 pins it
    export_allow_fresh: bool = False  # export_seg: permit serializing a
                                      # fresh random init (otherwise an
                                      # unresolved checkpoint is an error)
    wandb: bool = False
    wandb_project: str = "end2end-JSRT"
    profile_dir: str = ""            # jax.profiler trace dir ('' = off)
    data_axis: int = 1               # data-parallel mesh size: 1 = off,
                                     # 0 = all visible devices, n = first n
                                     # (batch_size must divide the mesh size)
    multihost: bool = False          # call jax.distributed.initialize() at
                                     # entry (multi-process DDP analogue,
                                     # BBDM/main.py:70-87; mesh then spans
                                     # hosts over DCN)
    coordinator: str = ""            # explicit jax.distributed args for
    num_processes: int = 0           # launchers outside TPU/Slurm/OMPI
    process_id: int = -1             # auto-detection (e.g. the local
                                     # 2-process harness scripts/
                                     # multiprocess_dp.py); '' / 0 / -1 =
                                     # let JAX auto-detect
    spatial_axis: int = 1            # 3D spatial-parallel mesh size (volume
                                     # depth sharded over chips; XLA inserts
                                     # the conv halo exchanges): 1 = off,
                                     # 0 = all devices — parallel/spatial.py
    amp: bool = True                 # kept for CLI familiarity


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def to_dict(self):
        return dataclasses.asdict(self)

    def to_json(self):
        return json.dumps(self.to_dict(), indent=2, default=str)


PRESETS: dict[str, dict[str, Any]] = {
    # scripts/train_end2end_jsrt.sh. hypergrad=decay_only skips the darts
    # computation that is PROVABLY zero under this wiring — plus the
    # pre-arch unroll that rollback would discard (engine/bilevel.py) —
    # trajectory IDENTICAL to the full darts mode (tests/test_engine.py)
    # and measured 2.1x faster on v5e (8.0 -> 16.5 it/s). Pass
    # --engine.hypergrad=darts to burn the same FLOPs the reference does.
    "end2end_jsrt": {"engine.hypergrad": "decay_only"},
    # scripts/train_pix2pix_lung.sh (200 epochs x 80 imgs, lr 2e-5)
    "pix2pix_jsrt": {"optim.lr": 2e-5, "engine.train_iters": 8000,
                     "data.n_train": 80, "data.n_val": 20, "data.n_test": 0,
                     "run.name": "pix2pix-JSRT"},
    # ColorizationModel (models_pix2pix/colorization_model.py): pix2pix
    # L -> ab in Lab space; dataset_mode=colorization sets input_nc=1 /
    # output_nc=2 (:12-13)
    # scripts/train_pix2pix_isic.sh: same run at output_nc 3 on ISIC2018
    # (the launcher's running_files/train_pix2pix.py does not exist in the
    # reference — train_pix2pix_isic.py is the live analog)
    "pix2pix_isic": {"optim.lr": 2e-5, "engine.train_iters": 8000,
                     "data.dataset": "isic", "data.n_train": 80,
                     "data.n_val": 20, "data.n_test": 0,
                     "model.output_nc": 3, "run.name": "pix2pix-ISIC"},
    "pix2pix_colorization": {"data.dataset": "pix2pix_colorization",
                             "model.input_nc": 1, "model.output_nc": 2,
                             "optim.lr": 2e-4,  # boilerplate pix2pix default
                             "run.name": "pix2pix-colorization"},
    # scripts/train_end2end_isic.sh: 40 labeled (32+8), 594 test, jaccard loss
    "end2end_isic": {"data.dataset": "isic", "data.n_train": 32,
                     "data.n_val": 8, "data.n_test": 594,
                     # ISIC postprocesses fakes with the fake_trans
                     # photometric chain, not the JSRT equalize+gamma chain
                     # (train_end2end_isic.py:178-183, applied :264)
                     "engine.fake_postprocess": "photometric",
                     "engine.hypergrad": "decay_only",  # same structural zero
                     "run.name": "end2end-ISIC-40-unet"},
    # Swin-UNet ISIC variant (util/ISIC_224_loader.py + --seg_model vit):
    # 224 inputs; resnet generator (any-size) instead of the 256-only unet G
    "end2end_isic224": {"data.dataset": "isic224", "data.image_size": 224,
                        "data.n_train": 32, "data.n_val": 8,
                        "data.n_test": 594, "model.seg_model": "vit",
                        "model.netG": "resnet_9blocks",
                        "engine.fake_postprocess": "photometric",
                        "run.name": "end2end-ISIC224-swin"},
    # LIVE architecture search (beyond reference parity — the reference's
    # darts wiring is structurally zero, engine/bilevel.py docstring): exact
    # unrolled hypergradient through the generator into the arch variables.
    "end2end_nas": {"engine.hypergrad": "unroll",
                    "engine.detach_fakes": False,
                    "engine.fake_postprocess": "minmax",
                    "run.name": "end2end-JSRT-9-nas"},
    # GenSeg-3D/train_end2end.sh: hippocampus 98 volumes, 78/20.
    # Same structural zero as 2D (outer loss touches only the unet, fakes
    # detached, u2l edge = netG) -> decay_only elides the dead darts term
    # and the rollback-discarded unroll, ~2x (tests/test_end2end.py::
    # test_structural_zero_darts_in_all_bilevel_programs).
    "end2end_3d": {"data.n_train": 68, "data.n_val": 10, "data.n_test": 20,
                   "data.batch_size": 1,  # 3D reference default
                                          # (GenSeg-3D/options/base_options.py:47)
                   # the 3D pipeline defaults to --norm instance
                   # (base_options.py:36), unlike the 2D 'batch' default
                   "model.norm": "instance",
                   "optim.lr": 2e-4, "engine.hypergrad": "decay_only",
                   "run.name": "end2end-3d"},
    # BBDM Template-BBDM.yaml regime (pixel space)
    "bbdm": {"data.batch_size": 8, "engine.train_iters": 400000,
             "engine.valid_step": 50, "run.name": "bbdm"},
    "end2end_bbdm": {"optim.loss_lambda": 0.0,  # BBDM/train_end2end.py:278
                     # same structural zero (sampled fakes detached,
                     # outer loss = unet val loss)
                     "engine.hypergrad": "decay_only",
                     "run.name": "end2end-bbdm"},
    # Soft-intro_VAE regime (ISIC-style splits)
    "sivae": {"data.dataset": "isic", "data.n_train": 32, "data.n_val": 8,
              "data.n_test": 594, "run.name": "sivae"},
    "end2end_sivae": {"data.dataset": "isic", "data.n_train": 32,
                      "data.n_val": 8, "data.n_test": 594,
                      # same structural zero as the other bilevel programs
                      "engine.hypergrad": "decay_only",
                      "run.name": "end2end-sivae"},
}


def _set_by_path(cfg: Config, path: str, raw: str | Any):
    obj: Any = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    f = {f.name: f for f in fields(obj)}[leaf]
    if isinstance(raw, str):
        t = f.type if isinstance(f.type, type) else type(getattr(obj, leaf))
        if t is bool or isinstance(getattr(obj, leaf), bool):
            value: Any = raw.lower() in ("1", "true", "yes")
        elif t is tuple or isinstance(getattr(obj, leaf), tuple):
            value = tuple(x for x in raw.split(",") if x)
        else:
            value = type(getattr(obj, leaf))(raw)
    else:
        value = raw
    setattr(obj, leaf, value)


def parse_config(argv: list[str] | None = None, preset: str | None = None) -> Config:
    """Build a Config from ``--a.b=c`` style CLI args (and optional preset)."""
    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = Config()
    # preset can come positionally via --preset=
    rest = []
    for a in argv:
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
        else:
            rest.append(a)
    if preset:
        for k, v in PRESETS[preset].items():
            _set_by_path(cfg, k, v)
    for a in rest:
        if not a.startswith("--") or "=" not in a:
            raise SystemExit(f"unrecognized argument {a!r}; use --a.b=c")
        k, v = a[2:].split("=", 1)
        _set_by_path(cfg, k, v)
    # build-time lowering switch — every entry point funnels through here,
    # so this is the single application site (a process-global compilation
    # choice, not training state)
    from semantic_segmentation_tpu.ops.conv import (use_packed_transpose,
                                                    use_tapmm_down)
    use_packed_transpose(cfg.model.convt_packed)
    use_tapmm_down(cfg.model.tapmm_down)
    return cfg
