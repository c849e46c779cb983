"""GenSeg-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for medical image
segmentation in ultra-low-data regimes.

Re-designed from scratch with the capabilities of the reference PyTorch/CUDA
research framework ``importZL/semantic_segmentation`` (GenSeg): a conditional
mask-to-image generative model (Pix2Pix / BBDM diffusion / Soft-intro VAE), a
PatchGAN discriminator, a segmentation network (U-Net / DeepLabV3 / Swin-UNet /
UNet3D), and DARTS-style architecture weights trained jointly as a multilevel
(bilevel) optimization problem.

Everything imperative in the reference (four interacting optimizers, Betty
hypergradients, in-loop CPU augmentation) is re-expressed here as pure
functions over explicit state pytrees, jit-compiled into fused TPU steps, and
scaled over `jax.sharding.Mesh` device meshes.

Subpackages
-----------
- ``ops``:       losses, image ops, augmentation, NAS mixed convolutions,
                 Pallas kernels.
- ``models``:    segmentation networks and generative model families.
- ``engine``:    the native bilevel (multilevel) optimization engine
                 replacing Betty.
- ``data``:      host-side decode + device-side pipelines for the datasets.
- ``parallel``:  mesh construction and sharded train-step wrappers.
- ``train``:     entry points mirroring the reference's running_files/.
- ``core``:      config, RNG, checkpointing, metrics/logging, profiling.
"""

__version__ = "0.1.0"
